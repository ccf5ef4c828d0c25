"""Bidirectional path tracing, wavefront form.

Reference: integrators/src/bdpt/ (mod.rs: generate_camera_subpath :452,
generate_light_subpath :510, random_walk :588, mis_weight :765,
connect_bdpt :927; vertex.rs Vertex abstraction).

TPU re-design: subpaths are SoA vertex ARRAYS [N, DEPTH] built by the same
statically-unrolled wavefront walk as path.py; every (s,t) connection
strategy is evaluated for the whole wavefront (masked by per-lane subpath
lengths) and deposits either into the pixel's sample (t>=2) or as film
splats (t==1, film.add_splats — the reference's film.add_splat :347). MIS
weights use the standard pdf-ratio product over the stored forward/reverse
densities with the reference's remap0 convention.

Scope notes: t==1 camera re-projection supports the perspective camera —
at parity with the reference, whose we/pdf_we/sample_wi panic
"NOT IMPLEMENTED" for orthographic/environment/realistic cameras
(cameras/src/orthographic_camera.rs:183, environment_camera.rs:69,
realistic_camera.rs:661). Escaped camera rays become infinite-light
endpoints with the reference's at-infinity density rules
(vertex.rs:329-362): solid-angle ratios at the env junction, positional
1/(pi r^2) density for regeneration shifts. Per-strategy debug films via
render_bdpt_debug (bdpt/mod.rs bdpt_dXX_sYY_tZZ dumps).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from pbrt_tpu.core import math as vm
from pbrt_tpu.core.math import dot, normalize
from pbrt_tpu.samplers import sample_dim, sample_2d
from pbrt_tpu.materials import compute_lobes
from pbrt_tpu.materials import bsdf as B
from pbrt_tpu import lights as LT
from pbrt_tpu import media as MD
from pbrt_tpu.samplers.hashing import hash4, U32
from pbrt_tpu.scene.intersect import intersect, intersect_p
from pbrt_tpu.integrators.common import camera_rays
from pbrt_tpu.film import FilmState, add_samples, add_splats, develop
from pbrt_tpu.utils.options import OPTIONS

# sampler dimension layout for BDPT: camera dims 0-4, then per camera bounce
# 8 dims starting at 5, then light path dims starting at 5 + 8*MAXD
CAM_BASE = 5
VERTEX_FIELDS = 8


class VertexSoA(NamedTuple):
    """[N, D] per-vertex arrays. type: 0 none, 1 camera, 2 light, 3 surface."""
    vtype: jnp.ndarray
    p: jnp.ndarray          # [N,D,3]
    ng: jnp.ndarray         # [N,D,3]
    ns: jnp.ndarray
    ss: jnp.ndarray         # shading frame for bsdf eval
    ts: jnp.ndarray
    uv: jnp.ndarray         # [N,D,2]
    beta: jnp.ndarray       # [N,D,3]
    pdf_fwd: jnp.ndarray    # [N,D] area density from previous vertex
    pdf_rev: jnp.ndarray    # [N,D]
    delta: jnp.ndarray      # [N,D] bool (specular connection-impossible)
    material: jnp.ndarray   # [N,D]
    light: jnp.ndarray      # [N,D] area light id at the vertex (-1)
    mat_umix: jnp.ndarray   # [N,D] mix-material random (replay lobes)
    # media (bdpt/mod.rs random_walk :611-633, vertex.rs :96-101): a
    # medium-scattered vertex stores is_med=True with zeroed frames (the
    # zero normal makes every cosine factor collapse to 1 — see
    # _convert_density / _cos_or_one); `medium` is the ambient medium id
    # AT the vertex (surface or medium), used for connection Tr.
    is_med: jnp.ndarray = None     # [N,D] bool
    medium: jnp.ndarray = None     # [N,D] i32


def _lobes_at(cs, v: VertexSoA, k):
    """Recompute lobes at vertex k (cheaper than storing 18 lobe arrays)."""
    return compute_lobes(cs.data.mats, cs.data.tex, v.material[:, k],
                         v.uv[:, k], v.p[:, k], v.mat_umix[:, k],
                         cs.flags.has_tex_slot)


def _f_at(cs, v: VertexSoA, k, wo_w, wi_w):
    lobes = _lobes_at(cs, v, k)
    wo_l = jnp.stack([dot(wo_w, v.ss[:, k]), dot(wo_w, v.ts[:, k]), dot(wo_w, v.ns[:, k])], -1)
    wi_l = jnp.stack([dot(wi_w, v.ss[:, k]), dot(wi_w, v.ts[:, k]), dot(wi_w, v.ns[:, k])], -1)
    ftab = cs.data.fourier if cs.flags.has_fourier else None
    f = B.bsdf_f(lobes, wo_l, wi_l, ftab)
    pf = B.bsdf_pdf(lobes, wo_l, wi_l, ftab)
    pr = B.bsdf_pdf(lobes, wi_l, wo_l, ftab)
    if cs.flags.n_media > 0:
        # medium vertex: f == pdf == the HG phase (vertex.rs Vertex::f for
        # VertexType::Medium; HG is symmetric so fwd == rev)
        is_m = v.is_med[:, k]
        g = cs.data.media.params[jnp.maximum(v.medium[:, k], 0)][:, 0]
        ph = MD.hg_p(dot(wo_w, wi_w), g)
        f = jnp.where(is_m[:, None], ph[:, None], f)
        pf = jnp.where(is_m, ph, pf)
        pr = jnp.where(is_m, ph, pr)
    return f, pf, pr


def _convert_density(pdf_sa, from_p, to_p, to_ng):
    """Solid-angle pdf at from -> area density at to (vertex.rs
    convert_density). Medium vertices store a ZERO normal and get the
    reference's cosine-free conversion."""
    w = to_p - from_p
    d2 = jnp.maximum(vm.length_squared(w), 1e-12)
    wn = w * jax.lax.rsqrt(d2)[..., None]
    return pdf_sa * _cos_or_one(to_ng, wn) / d2


def _cos_or_one(nvec, w):
    """|cos| against a surface normal; 1 for the zero normal a medium
    vertex stores (no geometric cosine at a volume scatter point)."""
    return jnp.where(vm.length_squared(nvec) > 0.0, vm.absdot(nvec, w), 1.0)


def _walk(cs, o, d, beta0, pdf_dir0, max_depth, px, py, sidx, dim_base, mode,
          sampler_fn=None, time=None, med0=None):
    """Random walk storing a VertexSoA of up to max_depth vertices.

    mode: "camera" | "light" (radiance vs importance transport; the only
    transport-mode asymmetry we carry is the shading-normal correction).
    sampler_fn: optional dim -> [N] override (MLT drives the walk from a
    primary-sample-space vector; the dim ranges ARE the reference's
    camera/light sample streams, mlt/mod.rs:109-147).
    Returns VertexSoA [N, max_depth].
    """
    data, flags, spec = cs.data, cs.flags, cs.sampler
    if sampler_fn is None:
        dim1 = lambda dim: sample_dim(spec, px, py, sidx, dim)
        dim2 = lambda dim: sample_2d(spec, px, py, sidx, dim)
    else:
        dim1 = sampler_fn
        dim2 = lambda dim: jnp.stack([sampler_fn(dim), sampler_fn(dim + 1)], -1)
    n = o.shape[0]
    D = max_depth

    def zeros(shape, dt=jnp.float32):
        return jnp.zeros(shape, dt)

    v = VertexSoA(zeros((n, D), jnp.int32), zeros((n, D, 3)), zeros((n, D, 3)),
                  zeros((n, D, 3)), zeros((n, D, 3)), zeros((n, D, 3)),
                  zeros((n, D, 2)), zeros((n, D, 3)), zeros((n, D)),
                  zeros((n, D)), zeros((n, D), bool), zeros((n, D), jnp.int32) - 1,
                  zeros((n, D), jnp.int32) - 1, zeros((n, D)),
                  zeros((n, D), bool), zeros((n, D), jnp.int32) - 1)

    # ambient medium per lane: the camera subpath starts in the camera
    # medium, the light subpath in the sampled light's declared-scope
    # medium (med0; bdpt/mod.rs:611-633 threads each endpoint's medium
    # interface through the walks)
    if med0 is None:
        cur_med = jnp.broadcast_to(jnp.asarray(data.camera_medium,
                                               jnp.int32), (n,))
    else:
        cur_med = jnp.broadcast_to(med0, (n,)).astype(jnp.int32)
    pxu, pyu, su = px.astype(U32), py.astype(U32), sidx.astype(U32)

    beta = beta0
    active = jnp.ones((n,), bool) & ~B.black(beta0)
    pdf_fwd_sa = pdf_dir0
    prev_p = o
    prev_delta = jnp.zeros((n,), bool)

    # escape record (camera mode): a ray that leaves the scene terminates
    # the walk at an infinite-light endpoint (vertex.rs infinite-light
    # vertices); the s=0 env strategy and its MIS competitors need the
    # carried throughput, direction, SA density and depth of that event
    esc_valid = jnp.zeros((n,), bool)
    esc_beta = jnp.zeros((n, 3), jnp.float32)
    esc_dir = jnp.zeros((n, 3), jnp.float32)
    esc_pdf_sa = jnp.zeros((n,), jnp.float32)
    esc_k = jnp.zeros((n,), jnp.int32)
    esc_spec = jnp.zeros((n,), bool)

    for k in range(D):
        base = dim_base + 8 * k
        dn = normalize(d)
        si = intersect(data, flags, o, dn, jnp.full((n,), vm.INF), time=time)
        if flags.n_media > 0:
            # sample a medium interaction on the segment (random_walk
            # :611-633). Grid-media tracking draws from the pixel-keyed
            # hash stream; homogeneous media use sampler dims base+1,2 so
            # MLT's primary-sample-space replay stays exact.
            ka = hash4(pxu, pyu, su, U32(0xBD10 + 2 * k))
            kb = hash4(pxu, pyu, su, U32(0xBD11 + 2 * k))
            u_med = dim2(base + 1)
            t_seg = jnp.where(si.valid, si.t, jnp.full((n,), vm.INF))
            ms = MD.sample_medium(data.media, cur_med, o, dn, t_seg, ka, kb,
                                  u_med, any_grid=flags.any_grid_media)
            in_med = active & ms.sampled_medium
            beta = jnp.where(active[:, None], beta * ms.weight, beta)
        else:
            in_med = jnp.zeros((n,), bool)
        hit = active & si.valid & ~in_med
        esc_new = active & ~si.valid & ~in_med & ~esc_valid
        esc_beta = jnp.where(esc_new[:, None], beta, esc_beta)
        esc_dir = jnp.where(esc_new[:, None], dn, esc_dir)
        esc_pdf_sa = jnp.where(esc_new, pdf_fwd_sa, esc_pdf_sa)
        esc_k = jnp.where(esc_new, k, esc_k)
        esc_spec = jnp.where(esc_new, prev_delta, esc_spec)
        esc_valid = esc_valid | esc_new
        u_mix = dim1(base + 0)

        stored = hit | in_med
        if flags.n_media > 0:
            vp = jnp.where(in_med[:, None], ms.p, si.p)
            zf = jnp.zeros((n, 3), jnp.float32)
            vng = jnp.where(in_med[:, None], zf, si.ng)
            vns = jnp.where(in_med[:, None], zf, si.ns)
            vss = jnp.where(in_med[:, None], zf, si.ss)
            vts = jnp.where(in_med[:, None], zf, si.ts)
        else:
            vp, vng, vns, vss, vts = si.p, si.ng, si.ns, si.ss, si.ts
        pdf_fwd_area = _convert_density(pdf_fwd_sa, prev_p, vp, vng)
        v = v._replace(
            vtype=v.vtype.at[:, k].set(jnp.where(stored, 3, 0)),
            p=v.p.at[:, k].set(vp), ng=v.ng.at[:, k].set(vng),
            ns=v.ns.at[:, k].set(vns), ss=v.ss.at[:, k].set(vss),
            ts=v.ts.at[:, k].set(vts), uv=v.uv.at[:, k].set(si.uv),
            beta=v.beta.at[:, k].set(jnp.where(stored[:, None], beta, 0.0)),
            pdf_fwd=v.pdf_fwd.at[:, k].set(jnp.where(stored, pdf_fwd_area, 0.0)),
            delta=v.delta.at[:, k].set(prev_delta & stored),
            material=v.material.at[:, k].set(jnp.where(hit, si.material, -1)),
            light=v.light.at[:, k].set(jnp.where(hit, si.area_light, -1)),
            mat_umix=v.mat_umix.at[:, k].set(u_mix),
            is_med=v.is_med.at[:, k].set(in_med),
            medium=v.medium.at[:, k].set(jnp.where(stored, cur_med, -1)))
        active = stored
        if k == D - 1:
            break

        lobes = compute_lobes(data.mats, data.tex, si.material, si.uv, si.p,
                              u_mix, flags.has_tex_slot,
                              tex_kinds=flags.tex_kinds)
        u_lobe = dim1(base + 4)
        u_dir = dim2(base + 5)
        wo_local = si.world_to_local(si.wo)
        bs = B.bsdf_sample(lobes, wo_local, u_lobe, u_dir, data.fourier if flags.has_fourier else None)
        wi_world = si.local_to_world(bs.wi)
        cos_w = vm.absdot(wi_world, si.ns)
        ok_surf = (bs.pdf > 0) & ~B.black(bs.f)
        correction = 1.0
        if mode == "light":
            # shading-normal correction for importance transport
            num = vm.absdot(si.wo, si.ns) * vm.absdot(wi_world, si.ng)
            den = jnp.maximum(vm.absdot(si.wo, si.ng) * vm.absdot(wi_world, si.ns), 1e-9)
            correction = num / den
        bmul_surf = bs.f * (cos_w * correction
                            / jnp.maximum(bs.pdf, 1e-12))[:, None]
        wi_l2 = si.world_to_local(wi_world)
        pdf_rev_surf = B.bsdf_pdf(lobes, wi_l2, wo_local, data.fourier if flags.has_fourier else None)
        if flags.n_media > 0:
            # medium lanes scatter by Henyey-Greenstein: f/pdf == 1, HG is
            # symmetric so the reverse pdf equals the forward one
            g_cur = data.media.params[jnp.maximum(cur_med, 0)][:, 0]
            wi_med, p_med = MD.hg_sample(-dn, g_cur, u_dir)
            wi_world = jnp.where(in_med[:, None], wi_med, wi_world)
            ok = active & jnp.where(in_med, p_med > 0, ok_surf)
            beta = jnp.where((ok & ~in_med)[:, None], beta * bmul_surf, beta)
            pdf_rev_sa = jnp.where(in_med, p_med, pdf_rev_surf)
            prev_delta = jnp.where(in_med, False, bs.is_specular)
            pdf_fwd_sa = jnp.where(in_med, p_med,
                                   jnp.where(bs.is_specular, 0.0, bs.pdf))
            # crossing a transmissive boundary swaps the ambient medium
            pm = data.prim_medium[jnp.maximum(si.prim, 0)]
            entering = dot(wi_world, si.ng) < 0.0
            crossed = hit & bs.is_transmission & ok
            cur_med = jnp.where(crossed,
                                jnp.where(entering, pm[:, 0], pm[:, 1]),
                                cur_med)
            o = jnp.where(in_med[:, None], vp, si.spawn_origin(wi_world))
        else:
            ok = active & ok_surf
            beta = jnp.where(ok[:, None], beta * bmul_surf, beta)
            pdf_rev_sa = pdf_rev_surf
            prev_delta = bs.is_specular
            pdf_fwd_sa = jnp.where(bs.is_specular, 0.0, bs.pdf)
            o = si.spawn_origin(wi_world)
        v = v._replace(pdf_rev=v.pdf_rev.at[:, k].set(
            jnp.where(ok, pdf_rev_sa, 0.0)))
        prev_p = vp if flags.n_media > 0 else si.p
        active = ok
        d = wi_world

    esc = dict(valid=esc_valid, beta=esc_beta, dir=esc_dir,
               pdf_sa=esc_pdf_sa, k=esc_k, spec=esc_spec)
    return v, esc


def _length(v: VertexSoA):
    return jnp.sum((v.vtype > 0).astype(jnp.int32), axis=1)


def render_bdpt(cs, options=None, verbose=False):
    """Full BDPT render driver (bdpt/mod.rs render :262)."""
    options = options or OPTIONS
    from pbrt_tpu.render import _sample_pixels
    p = cs.integrator_params
    max_depth = int(p.get("maxdepth", [5])[0])
    D = max_depth + 1

    px_all, py_all = _sample_pixels(cs)
    n_pix = len(px_all)
    spp = cs.sampler.rounded_spp()
    if options.quick:
        spp = max(1, spp // 4)
    table = cs.film.filter_table()

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(film, s, cnt_acc):
        px = jnp.asarray(px_all)
        py = jnp.asarray(py_all)
        sidx = jnp.full((n_pix,), s, jnp.int32)
        L, p_film, splat_p, splat_v, cnt = _bdpt_sample(cs, px, py, sidx, D,
                                                        with_stats=True)
        film = add_samples(cs.film, film, p_film, L, table=table)
        film = add_splats(cs.film, film, splat_p, splat_v)
        cnt_acc = jax.tree.map(lambda a, b: a + b, cnt_acc, cnt)
        return film, cnt_acc

    import time as _time
    from pbrt_tpu.utils.stats import (STATS, device_counters_zero,
                                      merge_device_counters)
    t0 = _time.time()
    film = FilmState.zeros(cs.film)
    cnt_acc = device_counters_zero()
    for s in range(spp):
        film, cnt_acc = step(film, jnp.int32(s), cnt_acc)
        if verbose:
            print(f"  bdpt spp {s+1}/{spp}")
    img = np.asarray(develop(cs.film, film, splat_scale=1.0 / spp))
    merge_device_counters(STATS, jax.tree.map(float, cnt_acc))
    STATS.report_distribution("Performance/BDPT render seconds",
                              _time.time() - t0)
    return img


def render_bdpt_debug(cs, out_dir, options=None, verbose=False):
    """Write one PNG per (s,t) strategy: bdpt_d{depth}_s{S}_t{T}.png
    (the reference's per-strategy debug films, bdpt/mod.rs)."""
    import os
    from pbrt_tpu.io.image_io import write_png
    options = options or OPTIONS
    p = cs.integrator_params
    max_depth = int(p.get("maxdepth", [5])[0])
    D = max_depth + 1
    from pbrt_tpu.render import _sample_pixels
    px_all, py_all = _sample_pixels(cs)
    spp = max(1, cs.sampler.rounded_spp() // (4 if options.quick else 1))
    table = cs.film.filter_table()
    os.makedirs(out_dir, exist_ok=True)
    pairs = [(0, t) for t in range(2, D + 2)] + \
            [(1, t) for t in range(2, D + 2)] + \
            [(s, t) for s in range(2, D + 1) for t in range(2, D + 2)
             if s + t <= D + 2] + \
            [(s, 1) for s in range(2, D + 1)]
    for st in pairs:
        @jax.jit
        def step(film, s, st=st):
            px = jnp.asarray(px_all)
            py = jnp.asarray(py_all)
            sidx = jnp.full((len(px_all),), s, jnp.int32)
            L, p_film, sp_p, sp_v = _bdpt_sample(cs, px, py, sidx, D,
                                                 st_filter=st)
            film = add_samples(cs.film, film, p_film, L, table=table)
            return add_splats(cs.film, film, sp_p, sp_v)
        film = FilmState.zeros(cs.film)
        for s in range(spp):
            film = step(film, jnp.int32(s))
        img = np.asarray(develop(cs.film, film, splat_scale=1.0 / spp))
        name = f"bdpt_d{max_depth}_s{st[0]:02d}_t{st[1]:02d}.png"
        write_png(os.path.join(out_dir, name), img)
        if verbose:
            print(f"  wrote {name}")


def _bdpt_sample(cs, px, py, sidx, D, strategies=("s0", "s1", "gen", "t1"),
                 st_filter=None, sampler_fn=None, p_film_override=None,
                 st_select=None, with_stats=False):
    """One BDPT sample for each pixel: returns (L, p_film, splat_p, splat_v).

    st_filter: optional static (s, t) pair — keep only that strategy's
    contribution (per-strategy debug films, bdpt/mod.rs bdpt_dXX_sYY_tZZ).
    sampler_fn / p_film_override: drive everything from a primary-sample-
    space vector (the MLT-over-BDPT target, mlt/mod.rs l()).
    st_select: optional (s_lane [N], t_lane [N]) — each lane contributes
    ONLY its own (s,t) strategy, UNWEIGHTED by strategy count (the MLT
    target evaluates one strategy per mutation; the caller multiplies by
    n_strategies). Returns (L_t2 [N,3] pixel-sample part, p_film,
    splat_p, splat_v) where t=1 contributions ride the splat outputs with
    one row per lane."""

    def keep(s, t):
        return st_filter is None or (s, t) == st_filter

    def st_mask(s, t, n):
        if st_select is None:
            return jnp.ones((n,), bool)
        return (st_select[0] == s) & (st_select[1] == t)
    data, flags, spec = cs.data, cs.flags, cs.sampler
    n = px.shape[0]

    # ---- camera subpath ----
    if p_film_override is None:
        rays, ray_w, p_film = camera_rays(cs, px, py, sidx)
    else:
        from pbrt_tpu.cameras import CameraSamples, generate_rays
        p_film = p_film_override
        u_lens = jnp.stack([sampler_fn(2), sampler_fn(3)], -1)
        u_time = sampler_fn(4)
        rays, ray_w = generate_rays(cs.camera,
                                    CameraSamples(p_film, u_lens, u_time))
    cam_o = rays.o
    # animated instances: evaluate every subpath/connection intersect at the
    # camera sample's time (r3 advisor: bdpt/mlt/sppm traced at t=0)
    if flags.n_instances > 0:
        time = (sampler_fn(4) if sampler_fn is not None
                else sample_dim(spec, px, py, sidx, 4))
    else:
        time = None
    pdf_cam_dir = camera_pdf_we_dir(cs, cam_o, cam_o + normalize(rays.d))
    cam_v, cam_esc = _walk(cs, rays.o, normalize(rays.d), jnp.ones((n, 3)),
                           pdf_cam_dir, D, px, py, sidx, CAM_BASE, "camera",
                           sampler_fn=sampler_fn, time=time)

    if sampler_fn is None:
        dim1 = lambda dim: sample_dim(spec, px, py, sidx, dim)
        dim2 = lambda dim: sample_2d(spec, px, py, sidx, dim)
    else:
        dim1 = sampler_fn
        dim2 = lambda dim: jnp.stack([sampler_fn(dim), sampler_fn(dim + 1)], -1)

    # ---- light subpath ----
    lbase = CAM_BASE + 8 * D
    u_sel = dim1(lbase + 0)
    light_idx, pmf, _ = data.light_distr.sample_discrete(u_sel)
    u_pos = dim2(lbase + 1)
    u_dir = dim2(lbase + 3)
    le = LT.sample_le(data.lights, data, light_idx, u_pos, u_dir,
                      data.world_center, data.world_radius)
    pdf0 = jnp.maximum(le.pdf_pos * pmf, 1e-12)
    beta_l0 = le.le * (vm.absdot(le.n_light, normalize(le.d))
                       / jnp.maximum(pdf0 * le.pdf_dir, 1e-12))[:, None]
    light_med = data.lights.medium[jnp.maximum(light_idx, 0)] \
        if data.lights.medium is not None else None
    light_v, _ = _walk(cs, le.o, normalize(le.d), beta_l0, le.pdf_dir, D - 1,
                       px, py, sidx, lbase + 5, "light", sampler_fn=sampler_fn,
                       time=time, med0=light_med)

    n_cam = _length(cam_v)
    n_light = _length(light_v)
    # hash streams for connection-visibility transmittance walks
    conn_hashes = (px.astype(U32), py.astype(U32), sidx.astype(U32))

    # device counters (utils/stats.py; the reference declares bdpt stats
    # in integrators/src/bdpt/mod.rs — zero-radiance paths etc.)
    from pbrt_tpu.utils.stats import device_counters_zero
    cnt = device_counters_zero()
    cnt["camera_rays"] = cnt["camera_rays"] + jnp.float32(n)
    cnt["bounce_rays"] = cnt["bounce_rays"] + jnp.sum(
        n_cam.astype(jnp.float32) + n_light.astype(jnp.float32))
    cnt["valid_hits"] = cnt["valid_hits"] + jnp.sum(n_cam.astype(jnp.float32))

    L = jnp.zeros((n, 3), jnp.float32)
    splat_parts = []
    sel_raster = p_film   # select mode: t=1 lanes override with their raster

    # Index convention: cam_v/light_v store only SURFACE vertices. Strategy
    # (s, t) in the reference counts endpoint vertices too: t surfaces on the
    # camera side live at kt = t-2 (t=2 = camera + first surface), s surfaces
    # on the light side at ks = s-2 (s=1 = the sampled light point itself).

    # ---- s = 0, infinite lights: camera path escapes the scene ----
    # (vertex.rs:329-362 — an escaped ray becomes a light vertex at
    # infinity; its strategies compete with NEE picking the env direction)
    if flags.has_infinite and "s0" in strategies:
        le_esc = LT.le_escaped(data.lights, cam_esc["dir"])
        for k in range(D):
            if not keep(0, k + 2):
                continue
            ok = cam_esc["valid"] & (cam_esc["k"] == k) & st_mask(0, k + 2, n)
            w = _mis_weight_s0_inf(cs, cam_v, k, cam_esc)
            L = L + jnp.where(ok[:, None],
                              cam_esc["beta"] * le_esc * w[:, None], 0.0)

    # ---- s = 0: camera path hits a light directly ----
    for t in (range(2, D + 2) if "s0" in strategies else []):
        k = t - 2
        if k >= D:
            break
        vt = cam_v.vtype[:, k] > 0
        is_light = cam_v.light[:, k] >= 0
        ok = vt & is_light & (n_cam >= k + 1) & st_mask(0, t, n)
        prev = cam_o if k == 0 else cam_v.p[:, k - 1]
        wo = normalize(prev - cam_v.p[:, k])
        if not keep(0, t):
            continue
        le_v = LT.le_area(data.lights, cam_v.light[:, k], cam_v.ng[:, k], wo)
        w = _mis_weight_s0(cs, cam_v, k, cam_o)
        L = L + jnp.where(ok[:, None], cam_v.beta[:, k] * le_v * w[:, None], 0.0)

    # ---- s = 1 and s >= 2 connections for each t >= 2 ----
    for t in range(2, D + 2):
        kt = t - 2
        if kt >= D:
            break
        cam_ok = (cam_v.vtype[:, kt] > 0) & ~cam_v.delta[:, kt] & (n_cam >= kt + 1)

        # s=1: sample a light point (like NEE) and connect
        sbase = CAM_BASE + 8 * D + 5 + 8 * (D - 1) + 4 * t
        u_l = dim2(sbase)
        u_sel1 = dim1(sbase + 2)
        li1, pmf1, _ = data.light_distr.sample_discrete(u_sel1)
        ls = LT.sample_li(data.lights, data, li1, cam_v.p[:, kt], u_l,
                          data.world_center, data.world_radius)
        f_c, pdf_c_fwd, pdf_c_rev = _f_at(cs, cam_v, kt,
                                          _wo_of(cam_v, cam_o, kt), ls.wi)
        g_cos = _cos_or_one(cam_v.ns[:, kt], ls.wi)
        occ, tr1 = _occluded(cs, cam_v.p[:, kt], cam_v.ng[:, kt], ls.p_light,
                             ls.wi, medium=cam_v.medium[:, kt], time=time,
                             hashes=conn_hashes, keys=0x7000 + 16 * t)
        contrib1 = cam_v.beta[:, kt] * f_c * ls.li * tr1 * (g_cos / jnp.maximum(ls.pdf * pmf1, 1e-12))[:, None]
        cnt["shadow_rays"] = cnt["shadow_rays"] + jnp.sum(
            cam_ok.astype(jnp.float32))
        ok1 = cam_ok & (ls.pdf > 0) & ~B.black(contrib1) & ~occ & st_mask(1, t, n)
        w1 = _mis_weight_s1(cs, cam_v, kt, ls, li1, cam_o, pdf_c_fwd, pdf_c_rev)
        if "s1" in strategies and keep(1, t):
            L = L + jnp.where(ok1[:, None], contrib1 * w1[:, None], 0.0)

        # s>=2: connect to light subpath vertices
        for s in (range(2, D + 1) if "gen" in strategies else []):
            ks = s - 2
            if ks >= D - 1 or s + t > D + 2 or not keep(s, t):
                continue
            l_ok = (light_v.vtype[:, ks] > 0) & ~light_v.delta[:, ks] & (n_light >= ks + 1)
            d_c2l = light_v.p[:, ks] - cam_v.p[:, kt]
            dist2 = jnp.maximum(vm.length_squared(d_c2l), 1e-12)
            wi = d_c2l * jax.lax.rsqrt(dist2)[:, None]
            f_cam, pc_f, pc_r = _f_at(cs, cam_v, kt, _wo_of(cam_v, cam_o, kt), wi)
            f_li, pl_f, pl_r = _f_at(cs, light_v, ks, _wo_of(light_v, None, ks, le.o), -wi)
            G = _cos_or_one(cam_v.ns[:, kt], wi) * _cos_or_one(light_v.ns[:, ks], wi) / dist2
            occ2, tr2 = _occluded(cs, cam_v.p[:, kt], cam_v.ng[:, kt],
                                  light_v.p[:, ks], wi,
                                  medium=cam_v.medium[:, kt], time=time,
                                  hashes=conn_hashes,
                                  keys=0x7800 + 64 * t + 8 * s)
            contrib = cam_v.beta[:, kt] * f_cam * f_li * light_v.beta[:, ks] * tr2 * G[:, None]
            ok2 = cam_ok & l_ok & ~B.black(contrib) & ~occ2 & st_mask(s, t, n)
            w2 = _mis_weight_general(cs, cam_v, light_v, kt, ks, light_idx,
                                     le, pc_f, pc_r, pl_f, pl_r)
            L = L + jnp.where(ok2[:, None], contrib * w2[:, None], 0.0)

    # ---- t = 1: connect light subpath to the camera (splats) ----
    # choose the longest valid light vertex chain; splat each s>=2 strategy.
    if cs.camera.kind == "perspective" and "t1" in strategies:
        for s in range(2, D + 1):
            ks = s - 2
            if ks >= D - 1 or not keep(s, 1):
                continue
            ok = (light_v.vtype[:, ks] > 0) & ~light_v.delta[:, ks] & (n_light >= ks + 1)
            p_v = light_v.p[:, ks]
            imp, p_raster, on_film = _camera_importance(cs, cam_o, p_v)
            wi = normalize(cam_o - p_v)
            f_l, pl_f1, pl_r1 = _f_at(cs, light_v, ks, _wo_of(light_v, None, ks, le.o), wi)
            dist2 = jnp.maximum(vm.length_squared(cam_o - p_v), 1e-12)
            # camera sample_wi pdf = dist^2 / cos -> beta_cam = We*cos/dist^2
            cam_dirv = normalize(jnp.asarray(cs.camera.cam_to_world.start.m)[:3, :3]
                                 @ jnp.array([0.0, 0, 1.0]))
            cos_cam = jnp.maximum(dot(-wi, cam_dirv), 1e-6)
            beta_cam = imp * cos_cam / dist2
            G_l = _cos_or_one(light_v.ns[:, ks], wi)
            occ3, tr3 = _occluded(cs, p_v, light_v.ng[:, ks], cam_o, wi,
                                  medium=light_v.medium[:, ks], time=time,
                                  hashes=conn_hashes, keys=0xA000 + 8 * s)
            contrib = light_v.beta[:, ks] * f_l * tr3 * (beta_cam * G_l)[:, None]
            okc = ok & on_film & ~B.black(contrib) & ~occ3 & st_mask(s, 1, n)
            we_dir = camera_pdf_we_dir(cs, cam_o, p_v)
            wmis = _mis_weight_t1(cs, light_v, ks, light_idx, le, we_dir,
                                  pl_r1, cam_o)
            if st_select is not None:
                L = L + jnp.where(okc[:, None], contrib * wmis[:, None], 0.0)
                sel_raster = jnp.where(okc[:, None], p_raster, sel_raster)
            else:
                splat_parts.append((jnp.where(okc[:, None], p_raster, 0.0),
                                    jnp.where(okc[:, None],
                                              contrib * wmis[:, None], 0.0)))

    if st_select is not None:
        return L, sel_raster, None, None
    if with_stats:
        pass  # cnt returned below
    if splat_parts:
        splat_p = jnp.concatenate([sp for sp, _ in splat_parts])
        splat_v = jnp.concatenate([sv for _, sv in splat_parts])
    else:
        splat_p = jnp.zeros((n, 2), jnp.float32)
        splat_v = jnp.zeros((n, 3), jnp.float32)
    if with_stats:
        return L, p_film, splat_p, splat_v, cnt
    return L, p_film, splat_p, splat_v


def _wo_of(v: VertexSoA, origin, k, origin0=None):
    """Direction from vertex k toward the previous path vertex."""
    if k == 0:
        prev = origin if origin is not None else origin0
    else:
        prev = v.p[:, k - 1]
    return normalize(prev - v.p[:, k])


def _occluded(cs, p_from, ng_from, p_to, w, medium=None, time=None,
              hashes=None, keys=0):
    """(occluded [N] bool, tr [N,3]) for a connection segment.

    Media scenes walk the full multi-segment intersect_tr (scene.rs:106 /
    visibility_tester.rs tr): null-material medium interfaces on the
    connection are CROSSED with per-segment transmittance, so connections
    through e.g. a medium-filled shell survive (they used to be treated
    as occluded — r4 scope cut). Vacuum scenes keep the cheap binary
    intersect_p."""
    o = vm.offset_ray_origin(p_from, jnp.full_like(p_from, 1e-4), ng_from, w)
    to = p_to - o
    dist = vm.length(to)
    sd = to / jnp.maximum(dist, 1e-12)[:, None]
    if cs.flags.n_media > 0 and hashes is not None:
        from pbrt_tpu.integrators.volpath import intersect_tr
        med = medium if medium is not None else jnp.broadcast_to(
            jnp.asarray(cs.data.camera_medium, jnp.int32), o.shape[:1])
        tr, occ = intersect_tr(cs.data, cs.flags, med, o, sd, dist,
                               keys, hashes)
        return occ, tr
    occ = intersect_p(cs.data, cs.flags, o, sd, dist * (1 - 1e-3), time=time)
    if medium is not None and cs.flags.n_media > 0:
        zk = jnp.zeros(o.shape[:1], U32)
        tr = MD.transmittance(cs.data.media, medium, o, sd, dist,
                              zk, zk + 1, any_grid=cs.flags.any_grid_media)
    else:
        tr = jnp.ones(o.shape[:1] + (3,), jnp.float32)
    return occ, tr


def _camera_importance(cs, cam_o, p):
    """Perspective camera We: importance + raster position of point p
    (core/src/camera.rs we)."""
    spec = cs.camera
    c2w = spec.cam_to_world.interpolate(jnp.float32(0.0))
    w2c3 = jnp.asarray(np.linalg.inv(np.asarray(spec.cam_to_world.start.m, np.float64)).astype(np.float32))
    pc = p @ w2c3[:3, :3].T + w2c3[:3, 3]
    behind = pc[:, 2] <= 1e-6
    # full homogeneous camera->raster (the perspective divide lives in the
    # matrix's w row — applying it as affine drops the projection)
    c2r = jnp.asarray(spec.camera_to_raster)
    num = pc @ c2r[:3, :3].T + c2r[:3, 3]
    wdiv = pc @ c2r[3, :3].T + c2r[3, 3]
    rast = num / jnp.where(jnp.abs(wdiv[:, None]) < 1e-9, 1e-9, wdiv[:, None])
    resx, resy = spec.resolution
    on = ~behind & (rast[:, 0] >= 0) & (rast[:, 0] < resx) & \
        (rast[:, 1] >= 0) & (rast[:, 1] < resy)
    # importance: 1/(A * cos^4 theta) (camera.rs we)
    dvec = normalize(p - cam_o)
    cam_dir = normalize((jnp.asarray(spec.cam_to_world.start.m)[:3, :3] @ jnp.array([0.0, 0, 1.0])))
    cos_t = jnp.maximum(dot(dvec, cam_dir), 1e-6)
    A = spec.screen_area
    imp = 1.0 / (A * cos_t ** 4)
    return jnp.where(on, imp, 0.0), rast[:, :2], on


# ---------------------------------------------------------------------------
# MIS weights — full pdf-ratio products over stored forward/reverse
# densities (bdpt/mod.rs mis_weight :765, remap0 convention). For each
# connection (s,t) the weight is 1/(1 + sum_cam + sum_light) where each sum
# walks the respective subpath accumulating ri = p_reverse/p_forward in AREA
# measure — exactly the reference's formulation, with the junction vertices'
# reverse densities recomputed for the actual connection direction.
# Delta-direction endpoints (point/spot/distant) and infinite lights carry
# delta flags so their impossible competitor strategies drop out.
# ---------------------------------------------------------------------------

def _remap0(x):
    return jnp.where(x > 0.0, x, 1.0)


def _true(n):
    return jnp.ones((n,), bool)


def _cam_side_sum(cam_v, kt, p_gen_kt_area, pdf_rev_at_kt_sa):
    """Sum of ri products over strategies that shift the junction down the
    camera subpath (toward the camera)."""
    n = cam_v.vtype.shape[0]
    r = _remap0(p_gen_kt_area) / _remap0(cam_v.pdf_fwd[:, kt])
    below = ~cam_v.delta[:, kt - 1] if kt > 0 else _true(n)
    total = jnp.where(~cam_v.delta[:, kt] & below, r, 0.0)
    prev_sa = pdf_rev_at_kt_sa
    for j in range(kt - 1, -1, -1):
        p_back = _convert_density(prev_sa, cam_v.p[:, j + 1], cam_v.p[:, j],
                                  cam_v.ng[:, j])
        r = r * _remap0(p_back) / _remap0(cam_v.pdf_fwd[:, j])
        below = ~cam_v.delta[:, j - 1] if j > 0 else _true(n)
        total = total + jnp.where(~cam_v.delta[:, j] & below, r, 0.0)
        prev_sa = cam_v.pdf_rev[:, j]
    return total


def _emitter_info(cs, light_idx):
    """Returns (pdf_pos_area x pmf, hittable, connectible):
    hittable   — the camera path can intersect the emitter (s'=0 exists)
    connectible — NEE can target the emitter (s'=1 exists); everything but
    delta-DIRECTION lights (distant), matching Vertex::IsConnectible."""
    li = jnp.maximum(light_idx, 0)
    kind = cs.data.lights.kind[li]
    pmf = cs.data.light_distr.discrete_pdf(li)
    area = jnp.maximum(cs.data.lights.params[li][:, 4], 1e-9)
    pdf_pos = jnp.where(kind == LT.L_AREA, pmf / area, pmf)
    hittable = (kind == LT.L_AREA) | (kind == LT.L_INFINITE)
    connectible = kind != LT.L_DISTANT
    return pdf_pos, hittable, connectible


def _emission_dir_pdf_sa(cs, light_idx, n_light_v, w):
    """SA density of the emitter sampling emission direction w.

    Per kind (the reference's pdf_le directional parts):
      area        cosine-hemisphere around the emitter normal (diffuse.rs)
      spot        uniform cone of the total angle (spot.rs)
      projection  uniform cone of the fov cone (projection.rs pdf_le)
      point/gonio uniform sphere (point.rs / goniometric.rs)
      infinite    env-map importance density over directions (infinite.rs —
                  equal to its pdf_li for the reversed direction)
      distant     delta direction (density 0; its competitor strategies are
                  gated off via the connectible flag)
    """
    li = jnp.maximum(light_idx, 0)
    kind = cs.data.lights.kind[li]
    cos_l = vm.absdot(n_light_v, w)
    pdf_area_l = cos_l * (1.0 / np.pi)
    pdf_point = jnp.full_like(cos_l, 1.0 / (4.0 * np.pi))
    cone = cs.data.lights.params[li][:, 6]
    pdf_cone = 1.0 / (2.0 * np.pi * jnp.maximum(1.0 - cone, 1e-6))
    # infinite: directional density = pdf_li of the reversed direction
    pdf_inf = LT.pdf_li(cs.data.lights, cs.data, li, w * 0.0, -w,
                        jnp.ones_like(cos_l), jnp.ones_like(cos_l),
                        cs.data.world_radius)
    pdf = jnp.where(kind == LT.L_AREA, pdf_area_l,
                    jnp.where((kind == LT.L_SPOT) | (kind == LT.L_PROJECTION),
                              pdf_cone,
                              jnp.where(kind == LT.L_INFINITE, pdf_inf,
                                        jnp.where(kind == LT.L_DISTANT,
                                                  jnp.zeros_like(cos_l),
                                                  pdf_point))))
    return pdf


def _light_side_sum(cs, light_v, ks, light_idx, le, p_gen_ks_area,
                    pdf_rev_at_ks_sa):
    """Sum of ri products shifting the junction down the light subpath, ending
    at the emitter vertex (the s'=0 strategy)."""
    n = light_v.vtype.shape[0]
    pdf_pos, hittable, connectible = _emitter_info(cs, light_idx)
    r = _remap0(p_gen_ks_area) / _remap0(light_v.pdf_fwd[:, ks])
    below = ~light_v.delta[:, ks - 1] if ks > 0 else connectible
    total = jnp.where(~light_v.delta[:, ks] & below, r, 0.0)
    prev_sa = pdf_rev_at_ks_sa
    for j in range(ks - 1, -1, -1):
        p_back = _convert_density(prev_sa, light_v.p[:, j + 1], light_v.p[:, j],
                                  light_v.ng[:, j])
        r = r * _remap0(p_back) / _remap0(light_v.pdf_fwd[:, j])
        below = ~light_v.delta[:, j - 1] if j > 0 else connectible
        total = total + jnp.where(~light_v.delta[:, j] & below, r, 0.0)
        prev_sa = light_v.pdf_rev[:, j]
    # emitter vertex: regenerated from light_v[0] (strategy s'=0 — the camera
    # path hits the emitter; only for hittable lights)
    p_back_em = _convert_density(prev_sa, light_v.p[:, 0], le.o, le.n_light)
    r = r * _remap0(p_back_em) / _remap0(pdf_pos)
    total = total + jnp.where(hittable, r, 0.0)
    return total


def _mis_weight_s0(cs, cam_v, k, cam_o):
    """s=0: pure camera path hits an emitter at surface index k."""
    n = cam_v.vtype.shape[0]
    if k == 0:
        return jnp.ones((n,), jnp.float32)
    light = cam_v.light[:, k]
    pdf_pos, hittable, connectible = _emitter_info(cs, light)
    # strategy (s'=1, t'=t-1): light point sampled directly
    r = _remap0(pdf_pos) / _remap0(cam_v.pdf_fwd[:, k])
    total = jnp.where(~cam_v.delta[:, k - 1], r, 0.0)
    # deeper shifts: emission-direction density at the hit vertex
    wo = normalize(cam_v.p[:, k - 1] - cam_v.p[:, k])
    em_sa = _emission_dir_pdf_sa(cs, light, cam_v.ng[:, k], wo)
    prev_sa = em_sa
    for j in range(k - 1, -1, -1):
        p_back = _convert_density(prev_sa, cam_v.p[:, j + 1], cam_v.p[:, j],
                                  cam_v.ng[:, j])
        r = r * _remap0(p_back) / _remap0(cam_v.pdf_fwd[:, j])
        below = ~cam_v.delta[:, j - 1] if j > 0 else _true(n)
        total = total + jnp.where(~cam_v.delta[:, j] & below, r, 0.0)
        prev_sa = cam_v.pdf_rev[:, j]
    return 1.0 / (1.0 + total)


def _mis_weight_s0_inf(cs, cam_v, k, esc):
    """s=0 weight for a camera path that ESCAPED to the infinite light(s)
    after k surface vertices (vertex.rs infinite-light endpoints).

    The env endpoint lives at infinity: densities at it stay in solid
    angle (no area conversion), and the density of the env generating a
    scene point is the positional 1/(pi*r^2) (infinite.rs pdf_le)."""
    n = cam_v.vtype.shape[0]
    if k == 0:
        return jnp.ones((n,), jnp.float32)   # s+t==2: single strategy
    from pbrt_tpu.integrators.common import infinite_pdf_for_dir
    # s'=1 competitor: NEE at the last surface picks this env direction —
    # both densities in solid angle along the same segment
    nee_sa = infinite_pdf_for_dir(cs, esc["dir"], cam_v.p[:, k - 1])
    r = _remap0(nee_sa) / _remap0(esc["pdf_sa"])
    total = jnp.where(~cam_v.delta[:, k - 1] & ~esc["spec"], r, 0.0)
    # deeper shifts: env regenerates the last surface vertex with the
    # positional area density, then the standard reverse-pdf chain
    p_back = jnp.broadcast_to(_infinite_pos_pdf_area(cs), (n,))
    prev_is_area = True
    prev_sa = None
    for j in range(k - 1, -1, -1):
        if prev_is_area:
            pb = p_back
            prev_is_area = False
        else:
            pb = _convert_density(prev_sa, cam_v.p[:, j + 1], cam_v.p[:, j],
                                  cam_v.ng[:, j])
        r = r * _remap0(pb) / _remap0(cam_v.pdf_fwd[:, j])
        below = ~cam_v.delta[:, j - 1] if j > 0 else _true(n)
        total = total + jnp.where(~cam_v.delta[:, j] & below, r, 0.0)
        prev_sa = cam_v.pdf_rev[:, j]
    return 1.0 / (1.0 + total)


def _mis_weight_s1(cs, cam_v, kt, ls, light_idx, cam_o, pdf_c_fwd, pdf_c_rev):
    """s=1: NEE-style connection at camera surface kt to a sampled light
    point. Competitors: hitting the light (s'=0) + deeper camera shifts.

    The s'=0 ratio compares the BSDF's density of continuing into the light
    against the NEE density; both are solid-angle densities along the SAME
    segment, so their area-measure conversion factors cancel and the ratio
    can be taken in solid angle directly."""
    pmf = cs.data.light_distr.discrete_pdf(jnp.maximum(light_idx, 0))
    pdf_pos, hittable, connectible = _emitter_info(cs, light_idx)
    r_light = _remap0(pdf_c_fwd) / _remap0(ls.pdf * pmf)
    sum_light = jnp.where(hittable, r_light, 0.0)
    # camera-side: the light emits toward kt and the junction shifts down.
    # ls.n_light is the true emitter geometric normal (sampled triangle for
    # area lights); infinite lights use their positional area density
    # directly (vertex.rs infinite-light handling: the endpoint lives at
    # infinity so no solid-angle->area conversion happens).
    em_sa = _emission_dir_pdf_sa(cs, light_idx, ls.n_light, -ls.wi)
    p_gen_kt = _convert_density(em_sa, ls.p_light, cam_v.p[:, kt], cam_v.ng[:, kt])
    kind = cs.data.lights.kind[jnp.maximum(light_idx, 0)]
    p_inf_area = _infinite_pos_pdf_area(cs)
    p_gen_kt = jnp.where(kind == LT.L_INFINITE, p_inf_area, p_gen_kt)
    sum_cam = _cam_side_sum(cam_v, kt, p_gen_kt, pdf_c_rev)
    return 1.0 / (1.0 + sum_cam + sum_light)


def _infinite_pos_pdf_area(cs):
    """Area density of an infinite light generating a point on a surface:
    1 / (pi * world_radius^2) (infinite.rs pdf_le positional part)."""
    r = cs.data.world_radius
    return 1.0 / (np.pi * r * r)


def _mis_weight_t1(cs, light_v, ks, light_idx, le, pdf_we_dir_sa, pl_rev_sa,
                   cam_o):
    """t=1: light subpath splatted to the camera. Competitors: the camera
    extending to the light vertex (t'=2) + deeper light-side shifts."""
    p_gen_ks = _convert_density(pdf_we_dir_sa, cam_o, light_v.p[:, ks],
                                light_v.ng[:, ks])
    total = _light_side_sum(cs, light_v, ks, light_idx, le, p_gen_ks, pl_rev_sa)
    return 1.0 / (1.0 + total)


def _mis_weight_general(cs, cam_v, light_v, kt, ks, light_idx, le,
                        pc_f, pc_r, pl_f, pl_r):
    """General (s>=2, t>=2) connection between camera surface kt and light
    surface ks."""
    wi = normalize(light_v.p[:, ks] - cam_v.p[:, kt])
    p_gen_kt = _convert_density(pl_f, light_v.p[:, ks], cam_v.p[:, kt],
                                cam_v.ng[:, kt])
    sum_cam = _cam_side_sum(cam_v, kt, p_gen_kt, pc_r)
    p_gen_ks = _convert_density(pc_f, cam_v.p[:, kt], light_v.p[:, ks],
                                light_v.ng[:, ks])
    sum_light = _light_side_sum(cs, light_v, ks, light_idx, le, p_gen_ks, pl_r)
    return 1.0 / (1.0 + sum_cam + sum_light)


def camera_pdf_we_dir(cs, cam_o, p):
    """SA density of the perspective camera sampling a ray toward p
    (camera.rs pdf_we)."""
    spec = cs.camera
    dvec = normalize(p - cam_o)
    cam_dir = normalize(jnp.asarray(spec.cam_to_world.start.m)[:3, :3] @ jnp.array([0.0, 0, 1.0]))
    cos_t = jnp.maximum(dot(dvec, cam_dir), 1e-6)
    return 1.0 / (spec.screen_area * cos_t ** 3)
