"""Stochastic progressive photon mapping, TPU wavefront form.

Reference: integrators/src/sppm.rs (:127 render, :378 visible points, :573
grid insert, :656 photon pass, :857 pixel update). The reference's four
thread pools + Mutex grid cells + CAS AtomicFloat deposits (SURVEY P4/P5)
become three jitted wavefront passes per iteration with DETERMINISTIC
scatter-adds (SURVEY sect. 5.2 — races replaced by segment-sum semantics):

  1. camera pass  — one path per pixel to the first diffuse hit: visible
     point SoA [Npix] (+ NEE direct light accumulated separately)
  2. photon pass  — sample_le from lights, random walk; each deposit looks
     up the 27 neighbor grid cells of a SORTED visible-point array (argsort
     by cell id replaces the hash grid + mutex cells) and scatter-adds phi
     to in-radius visible points
  3. update pass  — per-pixel radius/flux shrink (trivially vectorized)
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from pbrt_tpu.core import math as vm
from pbrt_tpu.core.math import normalize, dot
from pbrt_tpu.samplers import SamplerSpec, sample_dim, sample_2d
from pbrt_tpu.samplers.hashing import hash3, hash4, u32_to_float, U32
from pbrt_tpu.materials import compute_lobes
from pbrt_tpu.materials import bsdf as B
from pbrt_tpu import lights as LT
from pbrt_tpu.scene.intersect import intersect
from pbrt_tpu.integrators.common import camera_rays, sample_one_light, bounce_base
from pbrt_tpu.film import develop, FilmSpec
from pbrt_tpu.utils.options import OPTIONS

MAX_PER_CELL = 16  # visible points examined per neighbor cell; deposits
                   # past this are COUNTED as grid_overflow (no silent bias:
                   # SURVEY "no silent caps")


def render_sppm(cs, options=None, verbose=False):
    options = options or OPTIONS
    from pbrt_tpu.render import _sample_pixels
    p = cs.integrator_params
    n_iterations = int(p.get("numiterations", p.get("iterations", [64]))[0])
    if options.quick:
        n_iterations = max(4, n_iterations // 8)
    max_depth = int(p.get("maxdepth", [5])[0])
    photons_per_iter = int(p.get("photonsperiteration", [-1])[0])
    init_radius = float(p.get("radius", [1.0])[0])
    if options.sppm_radius > 0:
        init_radius = options.sppm_radius

    px, py = _sample_pixels(cs)
    n_pix = len(px)
    if photons_per_iter <= 0:
        photons_per_iter = n_pix
    px = jnp.asarray(px)
    py = jnp.asarray(py)

    # per-pixel SPPM state (sppm.rs SPPMPixel)
    radius = jnp.full((n_pix,), init_radius, jnp.float32)
    ld_sum = jnp.zeros((n_pix, 3), jnp.float32)   # direct + emitted
    tau = jnp.zeros((n_pix, 3), jnp.float32)      # accumulated flux
    n_photons = jnp.zeros((n_pix,), jnp.float32)  # SPPM "N"

    step = jax.jit(functools.partial(_sppm_iteration, cs, max_depth,
                                     photons_per_iter))
    overflow_total = 0.0
    for it in range(n_iterations):
        radius, ld_sum, tau, n_photons, ovf = step(px, py, jnp.int32(it),
                                                   radius, ld_sum, tau,
                                                   n_photons)
        overflow_total += float(ovf)
        if verbose and (it + 1) % 8 == 0:
            print(f"  sppm iteration {it+1}/{n_iterations}")
    from pbrt_tpu.utils.stats import STATS
    STATS.report_counter("SPPM/Grid cell overflows (deposits skipped)", overflow_total)
    if overflow_total > 0:
        print(f"warning: SPPM grid overflow — {overflow_total:.0f} deposits "
              f"skipped past MAX_PER_CELL={MAX_PER_CELL}; raise it or lower "
              "the initial radius")

    # final estimate (sppm.rs write_sppm_image): direct/ld averaged over
    # iterations + photon term tau / (N_total * pi r^2)
    n_total = n_iterations * photons_per_iter
    L = ld_sum / n_iterations + tau / (n_total * np.pi * jnp.maximum(radius, 1e-9)[:, None] ** 2)
    x0, x1, y0, y1 = cs.film.pixel_bounds
    W, H = cs.film.cropped_resolution
    img = jnp.zeros((H, W, 3), jnp.float32)
    ix = jnp.clip(px - x0, 0, W - 1)
    iy = jnp.clip(py - y0, 0, H - 1)
    img = img.at[iy, ix].set(L)
    return np.asarray(jnp.maximum(img * cs.film.scale, 0.0))


def _sppm_iteration(cs, max_depth, n_photons_iter, px, py, it, radius,
                    ld_sum, tau, n_photons):
    data = cs.data
    flags = cs.flags
    n_pix = px.shape[0]
    spec = cs.sampler

    # ---------------- camera pass: find visible points ----------------
    rays, ray_w, p_film = camera_rays(cs, px, py, jnp.full((n_pix,), it, jnp.int32))
    o, d = rays.o, rays.d
    beta = jnp.ones((n_pix, 3), jnp.float32)
    active = jnp.ones((n_pix,), bool)
    ld = jnp.zeros((n_pix, 3), jnp.float32)
    vp_valid = jnp.zeros((n_pix,), bool)
    vp_p = jnp.zeros((n_pix, 3), jnp.float32)
    vp_wo = jnp.zeros((n_pix, 3), jnp.float32)
    vp_beta = jnp.zeros((n_pix, 3), jnp.float32)
    vp_lobes = B.Lobes.zeros(n_pix)
    vp_frame = None
    sidx = jnp.full((n_pix,), it, jnp.int32)
    specular_bounce = jnp.ones((n_pix,), bool)

    si_keep = None
    for bounce in range(max_depth):
        base = bounce_base(bounce)
        dn = normalize(d)
        si = intersect(data, flags, o, dn, jnp.full((n_pix,), vm.INF))
        if flags.has_infinite:
            esc = active & ~si.valid & specular_bounce
            ld = ld + jnp.where(esc[:, None],
                                beta * LT.le_escaped(data.lights, dn), 0.0)
        if flags.has_area_lights:
            hit_l = active & si.valid & (si.area_light >= 0) & specular_bounce
            le = LT.le_area(data.lights, si.area_light, si.ng, si.wo)
            ld = ld + jnp.where(hit_l[:, None], beta * le, 0.0)
        active = active & si.valid

        u_mix = sample_dim(spec, px, py, sidx, base + 0)
        lobes = compute_lobes(data.mats, data.tex, si.material, si.uv, si.p,
                              u_mix, flags.has_tex_slot,
                              tex_kinds=flags.tex_kinds)
        # NEE at every bounce (sppm accumulates direct light separately)
        u_sel = sample_dim(spec, px, py, sidx, base + 1)
        u_light = sample_2d(spec, px, py, sidx, base + 2)
        ldb = sample_one_light(cs, si, lobes, active, u_sel, u_light)
        ld = ld + jnp.where(active[:, None], beta * ldb, 0.0)

        # diffuse/glossy -> record visible point and stop; specular continues
        is_diffuse = ~B.black(lobes.kd) | ~B.black(lobes.ks) | ~B.black(lobes.rd_blend)
        newly = active & is_diffuse & ~vp_valid
        vp_valid = vp_valid | newly
        vp_p = jnp.where(newly[:, None], si.p, vp_p)
        vp_wo = jnp.where(newly[:, None], si.wo, vp_wo)
        vp_beta = jnp.where(newly[:, None], beta, vp_beta)
        vp_lobes = jax.tree.map(
            lambda a, b: jnp.where(newly.reshape((-1,) + (1,) * (a.ndim - 1)), b, a),
            vp_lobes, lobes)
        if si_keep is None:
            si_keep = si
        else:
            si_keep = jax.tree.map(
                lambda a, b: jnp.where(newly.reshape((-1,) + (1,) * (b.ndim - 1)), b, a),
                si_keep, si)
        active = active & ~newly

        # specular continuation
        u_lobe = sample_dim(spec, px, py, sidx, base + 4)
        u_dir = sample_2d(spec, px, py, sidx, base + 5)
        wo_local = si.world_to_local(si.wo)
        bs = B.bsdf_sample(lobes, wo_local, u_lobe, u_dir, data.fourier if flags.has_fourier else None)
        wi_world = si.local_to_world(bs.wi)
        ok = active & bs.is_specular & (bs.pdf > 0) & ~B.black(bs.f)
        beta = jnp.where(ok[:, None],
                         beta * bs.f * (vm.absdot(wi_world, si.ns)
                                        / jnp.maximum(bs.pdf, 1e-12))[:, None], beta)
        active = ok
        specular_bounce = bs.is_specular
        o = si.spawn_origin(wi_world)
        d = wi_world

    # ---------------- grid build: sort visible points by cell ----------------
    cell_size = jnp.max(jnp.where(vp_valid, radius, 0.0)) * 2.0 + 1e-6
    grid_res = 64
    lo = data.world_center - data.world_radius
    cell_of = lambda p: jnp.clip(((p - lo) / cell_size).astype(jnp.int32), 0, 1 << 20)

    def cell_id(c):
        return (c[..., 0] & 1023) * 1048576 + (c[..., 1] & 1023) * 1024 + (c[..., 2] & 1023)

    vp_cell = jnp.where(vp_valid, cell_id(cell_of(vp_p)), jnp.int32(0x7FFFFFFF))
    order = jnp.argsort(vp_cell)
    sorted_cell = vp_cell[order]

    # ---------------- photon pass ----------------
    n_ph = n_photons_iter
    phi = jnp.zeros((n_pix, 3), jnp.float32)
    m_count = jnp.zeros((n_pix,), jnp.float32)
    overflow = jnp.zeros((), jnp.float32)

    ph_idx = jnp.arange(n_ph, dtype=jnp.int32)
    itu = it.astype(U32) if hasattr(it, "astype") else U32(it)
    hkey = hash3(ph_idx.astype(U32), itu, U32(0x9E37))

    def hdim(salt):
        return u32_to_float(hash3(hkey, U32(salt), itu))

    def hdim2(salt):
        return jnp.stack([hdim(salt), hdim(salt + 1)], -1)

    u_sel = hdim(1)
    light_idx, pmf, _ = data.light_distr.sample_discrete(u_sel)
    le = LT.sample_le(data.lights, data, light_idx, hdim2(2), hdim2(4),
                      data.world_center, data.world_radius)
    pdf_total = jnp.maximum(le.pdf_pos * le.pdf_dir * pmf, 1e-12)
    ph_beta = le.le * (vm.absdot(le.n_light, normalize(le.d)) / pdf_total)[:, None]
    ph_o = le.o
    ph_d = le.d
    ph_active = ~B.black(ph_beta) & (pmf > 0)

    for bounce in range(max_depth):
        dn = normalize(ph_d)
        si = intersect(data, flags, ph_o, dn, jnp.full((n_ph,), vm.INF))
        ph_active = ph_active & si.valid
        u_mix = hdim(100 + bounce * 16)
        lobes = compute_lobes(data.mats, data.tex, si.material, si.uv, si.p,
                              u_mix, flags.has_tex_slot,
                              tex_kinds=flags.tex_kinds)

        if bounce > 0:
            # deposit at non-specular hits into nearby visible points
            phi, m_count, overflow = _deposit(
                si.p, ph_beta, ph_active, dn,
                vp_p, vp_wo, vp_valid, vp_lobes, si_keep,
                radius, sorted_cell, order, cell_of, cell_id,
                phi, m_count, overflow)
        # scatter
        u_lobe = hdim(101 + bounce * 16)
        u_dir = hdim2(102 + bounce * 16)
        wo_local = si.world_to_local(si.wo)
        bs = B.bsdf_sample(lobes, wo_local, u_lobe, u_dir, data.fourier if flags.has_fourier else None)
        wi_world = si.local_to_world(bs.wi)
        ok = ph_active & (bs.pdf > 0) & ~B.black(bs.f)
        new_beta = ph_beta * bs.f * (vm.absdot(wi_world, si.ns)
                                     / jnp.maximum(bs.pdf, 1e-12))[:, None]
        # RR on photon weight (sppm.rs photon RR)
        q = jnp.clip(1.0 - vm.max_component(new_beta) / jnp.maximum(vm.max_component(ph_beta), 1e-12), 0.0, 0.95)
        u_rr = hdim(103 + bounce * 16)
        survive = u_rr >= q
        ph_beta = jnp.where((ok & survive)[:, None], new_beta / jnp.maximum(1 - q, 1e-6)[:, None], ph_beta)
        ph_active = ok & survive
        ph_o = si.spawn_origin(wi_world)
        ph_d = wi_world

    # ---------------- pixel update (sppm.rs update_pixels) ----------------
    gamma = 2.0 / 3.0
    has_m = m_count > 0
    n_new = n_photons + gamma * m_count
    r_new = jnp.where(has_m, radius * jnp.sqrt(n_new / jnp.maximum(n_photons + m_count, 1e-9)), radius)
    tau_new = jnp.where(has_m[:, None],
                        (tau + vp_beta * phi) * (r_new * r_new / jnp.maximum(radius * radius, 1e-12))[:, None],
                        tau)
    return (r_new, ld_sum + ld, tau_new, jnp.where(has_m, n_new, n_photons),
            overflow)


def _deposit(ph_p, ph_beta, ph_active, ph_dir, vp_p, vp_wo, vp_valid, vp_lobes,
             si_keep, radius, sorted_cell, order, cell_of, cell_id, phi,
             m_count, overflow):
    """Photon -> visible point deposits through the sorted-cell index.

    The gather BSDF at each visible point is the FULL bsdf_f(wo, -photon
    dir) (sppm.rs :709 uses the stored BSDF): the slot loop runs inside a
    fori_loop over the 27 neighbor cells, so the graph carries
    MAX_PER_CELL bsdf_f instantiations, not 27x that. Photons that find a
    cell with more than MAX_PER_CELL visible points count the excess into
    `overflow` (reported as a stat; a nonzero value means raise
    MAX_PER_CELL) instead of silently dropping energy.
    """
    n_pix = vp_p.shape[0]
    pc = cell_of(ph_p)
    vp_ns = si_keep.ns
    vp_ss = si_keep.ss
    vp_ts = si_keep.ts

    def cell_body(ci, carry):
        phi, m_count, overflow = carry
        dx = ci % 3 - 1
        dy = (ci // 3) % 3 - 1
        dz = ci // 9 - 1
        nc = pc + jnp.stack([dx, dy, dz]).astype(jnp.int32)
        cid = cell_id(nc)
        start = jnp.searchsorted(sorted_cell, cid, side="left")
        for k in range(MAX_PER_CELL):
            slot = jnp.clip(start + k, 0, n_pix - 1)
            in_cell = sorted_cell[slot] == cid
            vp = order[slot]
            dist2 = vm.length_squared(vp_p[vp] - ph_p)
            same_side = dot(vp_ns[vp], -ph_dir) * dot(vp_ns[vp], vp_wo[vp]) > 0.0
            ok = ph_active & in_cell & vp_valid[vp] & (dist2 <= radius[vp] ** 2) & same_side
            # full gather BSDF in the VP's shading frame
            vpl = jax.tree.map(lambda a: a[vp], vp_lobes)
            wo_l = jnp.stack([dot(vp_wo[vp], vp_ss[vp]),
                              dot(vp_wo[vp], vp_ts[vp]),
                              dot(vp_wo[vp], vp_ns[vp])], -1)
            wi_l = jnp.stack([dot(-ph_dir, vp_ss[vp]),
                              dot(-ph_dir, vp_ts[vp]),
                              dot(-ph_dir, vp_ns[vp])], -1)
            f = B.bsdf_f(vpl, wo_l, wi_l, None)
            contrib = jnp.where(ok[:, None], f * ph_beta, 0.0)
            idx = jnp.where(ok, vp, n_pix)
            phi = phi.at[idx].add(contrib, mode="drop")
            m_count = m_count.at[idx].add(ok.astype(jnp.float32), mode="drop")
        # overflow probe: an entry past the last examined slot still in-cell
        slot = jnp.clip(start + MAX_PER_CELL, 0, n_pix - 1)
        spill = ph_active & (sorted_cell[slot] == cid) & \
            vp_valid[order[slot]]
        overflow = overflow + jnp.sum(spill.astype(jnp.float32))
        return phi, m_count, overflow

    phi, m_count, overflow = jax.lax.fori_loop(0, 27, cell_body,
                                               (phi, m_count, overflow))
    return phi, m_count, overflow
