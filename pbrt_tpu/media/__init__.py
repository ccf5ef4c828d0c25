"""Participating media: homogeneous + grid-density, Henyey-Greenstein phase.

Reference: media/src/{homogeneous,grid}.rs over the Medium trait
(core/src/medium/mod.rs:19: tr + sample) and the HG phase function
(core/src/medium/henyey_greenstein.rs).

TPU re-design: one medium SoA table; grids live in a single flat density
array with per-medium (offset, nx, ny, nz). Homogeneous sampling is the
closed-form channel-MIS estimator. Grid transmittance/sampling uses RATIO
TRACKING with a fixed iteration budget (the reference's unbounded delta
tracking loop becomes a static unroll with live-lane masks — same estimator,
lockstep control flow).

Medium params layout (med_params[:, 8]):
  [0] g   [1] grid offset   [2:5] nx, ny, nz   [5] max_density (grid)
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from pbrt_tpu.core import math as vm
from pbrt_tpu.core.math import vec3, dot, normalize, PI, INV_4PI
from pbrt_tpu.samplers.hashing import hash3, u32_to_float

M_HOMOGENEOUS, M_GRID = 0, 1
# delta/ratio tracking runs UNBOUNDED like the reference's walk
# (media/src/grid.rs:160-213): a lax.while_loop over unrolled
# TRACKING_UNROLL-step blocks continues until every lane escapes or
# scatters, so dense/large grids stay unbiased (r4 missing #3 replaced a
# fixed 64-step budget that overestimated transmittance once the expected
# step count sigma_bar * t exceeded it). TRACKING_MAX_BLOCKS is a runaway
# roof (~16k steps), far above any physical majorant walk.
TRACKING_UNROLL = 8
TRACKING_MAX_BLOCKS = 2048


class MediumTable(NamedTuple):
    kind: jnp.ndarray       # [Md]
    sigma_a: jnp.ndarray    # [Md,3]
    sigma_s: jnp.ndarray    # [Md,3]
    params: jnp.ndarray     # [Md,8]
    w2m: jnp.ndarray        # [Md,4,4]
    density: jnp.ndarray    # [total] flat grid densities

    @property
    def n_media(self):
        return self.kind.shape[0]


def compile_media(media_decls: dict):
    """host: {name: (kind, ParamSet, l2w)} -> (MediumTable, name->id)."""
    names = sorted(media_decls.keys())
    Md = max(len(names), 1)
    kind = np.zeros(Md, np.int32)
    sigma_a = np.tile(np.asarray([[1.0, 1.0, 1.0]], np.float32), (Md, 1))
    sigma_s = np.tile(np.asarray([[1.0, 1.0, 1.0]], np.float32), (Md, 1))
    params = np.zeros((Md, 8), np.float32)
    w2m = np.tile(np.eye(4, dtype=np.float32), (Md, 1, 1))
    density_parts = []
    total = 0
    name_to_id = {}
    for i, name in enumerate(names):
        mkind, ps, l2w = media_decls[name]
        name_to_id[name] = i
        scale = ps.find_one_float("scale", 1.0)
        sigma_a[i] = ps.find_one_rgb("sigma_a", [1.0, 1.0, 1.0]) * scale
        sigma_s[i] = ps.find_one_rgb("sigma_s", [1.0, 1.0, 1.0]) * scale
        params[i, 0] = ps.find_one_float("g", 0.0)
        if mkind == "heterogeneous" or (mkind == "grid") or "density" in ps:
            kind[i] = M_GRID
            d = ps.find_floats("density")
            nx = ps.find_one_int("nx", 1)
            ny = ps.find_one_int("ny", 1)
            nz = ps.find_one_int("nz", 1)
            if d is None:
                d = np.ones(nx * ny * nz, np.float32)
            params[i, 1] = total
            params[i, 2:5] = [nx, ny, nz]
            params[i, 5] = float(d.max())
            density_parts.append(d.astype(np.float32))
            total += d.size
            # medium-to-world = l2w x (p0,p1 box); world-to-medium maps the
            # grid into [0,1]^3
            p0 = ps.find_one_rgb("p0", [0, 0, 0])
            p1 = ps.find_one_rgb("p1", [1, 1, 1])
            from pbrt_tpu.core.transform import Transform, translate, scale as tscale
            m2w = Transform(l2w) * translate(p0) * tscale(np.maximum(p1 - p0, 1e-9))
            w2m[i] = m2w.m_inv
        else:
            kind[i] = M_HOMOGENEOUS
    density = np.concatenate(density_parts) if density_parts else np.zeros(1, np.float32)
    # any_grid computed host-side: reading it back off the device would
    # poison the axon tunnel's dispatch latency (accel/bvh.py HostBVH note)
    any_grid = bool((kind == 1).any())
    return MediumTable(jnp.asarray(kind), jnp.asarray(sigma_a), jnp.asarray(sigma_s),
                       jnp.asarray(params), jnp.asarray(w2m),
                       jnp.asarray(density)), name_to_id, any_grid


# ---------------------------------------------------------------------------
# Henyey-Greenstein phase function
# ---------------------------------------------------------------------------

def hg_p(cos_theta, g):
    denom = 1.0 + g * g + 2.0 * g * cos_theta
    return INV_4PI * (1.0 - g * g) / jnp.maximum(denom * jnp.sqrt(jnp.maximum(denom, 1e-9)), 1e-9)


def hg_sample(wo, g, u2):
    """Sample wi ~ HG around -wo; returns (wi, pdf=p)."""
    g_safe = jnp.where(jnp.abs(g) < 1e-3, 1e-3 * jnp.sign(g + 1e-9), g)
    sq = (1.0 - g_safe * g_safe) / (1.0 + g_safe - 2.0 * g_safe * u2[..., 0])
    cos_theta = -(1.0 + g_safe * g_safe - sq * sq) / (2.0 * g_safe)
    cos_theta = jnp.where(jnp.abs(g) < 1e-3, 1.0 - 2.0 * u2[..., 0], cos_theta)
    sin_theta = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_theta * cos_theta))
    phi = 2.0 * PI * u2[..., 1]
    v1, v2 = vm.coordinate_system(normalize(wo))
    wi = vm.spherical_direction_in(sin_theta, cos_theta, phi, v1, v2, normalize(wo))
    return wi, hg_p(cos_theta, g)


# ---------------------------------------------------------------------------
# density lookup + sampling
# ---------------------------------------------------------------------------

def _grid_density(med: MediumTable, mid, p_world):
    """Trilinear density of per-lane medium mid at world p."""
    w2m = med.w2m[mid]
    pm = jnp.einsum("nij,nj->ni", w2m[:, :3, :3], p_world) + w2m[:, :3, 3]
    pr = med.params[mid]
    nx = pr[:, 2].astype(jnp.int32)
    ny = pr[:, 3].astype(jnp.int32)
    nz = pr[:, 4].astype(jnp.int32)
    off = pr[:, 1].astype(jnp.int32)
    gx = pm[:, 0] * nx.astype(jnp.float32) - 0.5
    gy = pm[:, 1] * ny.astype(jnp.float32) - 0.5
    gz = pm[:, 2] * nz.astype(jnp.float32) - 0.5
    x0 = jnp.floor(gx).astype(jnp.int32)
    y0 = jnp.floor(gy).astype(jnp.int32)
    z0 = jnp.floor(gz).astype(jnp.int32)
    fx, fy, fz = gx - x0, gy - y0, gz - z0

    def dv(xi, yi, zi):
        inb = (xi >= 0) & (xi < nx) & (yi >= 0) & (yi < ny) & (zi >= 0) & (zi < nz)
        idx = off + (zi * ny + yi) * nx + xi
        idx = jnp.clip(idx, 0, med.density.shape[0] - 1)
        return jnp.where(inb, med.density[idx], 0.0)

    d00 = vm.lerp(fx, dv(x0, y0, z0), dv(x0 + 1, y0, z0))
    d10 = vm.lerp(fx, dv(x0, y0 + 1, z0), dv(x0 + 1, y0 + 1, z0))
    d01 = vm.lerp(fx, dv(x0, y0, z0 + 1), dv(x0 + 1, y0, z0 + 1))
    d11 = vm.lerp(fx, dv(x0, y0 + 1, z0 + 1), dv(x0 + 1, y0 + 1, z0 + 1))
    inside = jnp.all((pm >= 0.0) & (pm <= 1.0), axis=-1)
    val = vm.lerp(fz, vm.lerp(fy, d00, d10), vm.lerp(fy, d01, d11))
    return jnp.where(inside, val, 0.0)


class MediumSample(NamedTuple):
    sampled_medium: jnp.ndarray  # [N] bool — scattered inside the medium
    t: jnp.ndarray               # [N] scatter distance
    p: jnp.ndarray               # [N,3]
    weight: jnp.ndarray          # [N,3] beta multiplier (either case)


def sample_medium(med: MediumTable, mid, o, d, t_surf, key_a, key_b, u,
                  any_grid: bool = True):
    """Sample a medium interaction along [0, t_surf) for lanes with mid >= 0.

    u: [N,2] (channel select, distance). key_a/key_b: extra u32 lanes for the
    ratio-tracking hash stream. Mirrors HomogeneousMedium::sample and
    GridDensityMedium::sample (media/src/*.rs).
    """
    n = o.shape[0]
    has = mid >= 0
    m = jnp.maximum(mid, 0)
    kind = med.kind[m]
    sa = med.sigma_a[m]
    ss = med.sigma_s[m]
    st = sa + ss
    g_unused = med.params[m][:, 0]

    # ---- homogeneous (closed-form spectral MIS) ----
    ch = jnp.clip((u[:, 0] * 3).astype(jnp.int32), 0, 2)
    st_ch = jnp.take_along_axis(st, ch[:, None], -1)[:, 0]
    dist = -jnp.log(jnp.maximum(1.0 - u[:, 1], 1e-38)) / jnp.maximum(st_ch, 1e-12)
    t_h = jnp.minimum(dist, t_surf)
    inside_h = (dist < t_surf) & (st_ch > 0.0)
    tr_h = jnp.exp(-st * jnp.minimum(t_h, 1e6)[:, None])
    dens_h = jnp.where(inside_h[:, None], st * tr_h, tr_h)
    pdf_h = jnp.maximum(jnp.mean(dens_h, -1), 1e-12)
    w_h = jnp.where(inside_h[:, None], tr_h * ss / pdf_h[:, None], tr_h / pdf_h[:, None])

    if not any_grid:
        inside = inside_h & has
        w = jnp.where(has[:, None], w_h, 1.0)
        t = t_h
        p = o + d * t[:, None]
        return MediumSample(inside, t, p, w)

    # ---- grid: ratio/delta tracking with static unroll ----
    pr = med.params[m]
    max_d = jnp.maximum(pr[:, 5], 1e-9)
    st_mean = jnp.mean(st, -1)
    sigma_bar = max_d * st_mean
    inv_sbar = 1.0 / jnp.maximum(sigma_bar, 1e-12)
    import jax

    def track_block(carry):
        step0, t_cur, done, scat = carry
        for k in range(TRACKING_UNROLL):
            step = step0 + jnp.uint32(k)
            u1 = u32_to_float(hash3(key_a, key_b, 2 * step))
            u2_ = u32_to_float(hash3(key_a, key_b, 2 * step + 1))
            t_cur = jnp.where(done, t_cur,
                              t_cur - jnp.log(jnp.maximum(1.0 - u1, 1e-38))
                              * inv_sbar)
            past = t_cur >= t_surf
            p_here = o + d * t_cur[:, None]
            dens = _grid_density(med, m, p_here)
            real = u2_ < (dens / max_d)
            newly_scat = ~done & ~past & real
            scat = scat | newly_scat
            done = done | past | newly_scat
        return step0 + jnp.uint32(TRACKING_UNROLL), t_cur, done, scat

    roof = jnp.uint32(TRACKING_UNROLL * TRACKING_MAX_BLOCKS)
    init = (jnp.uint32(0), jnp.zeros(n, jnp.float32),
            jnp.zeros(n, bool), jnp.zeros(n, bool))
    _, t_cur, done, scat = jax.lax.while_loop(
        lambda c: jnp.any(~c[2]) & (c[0] < roof), track_block, init)
    t_g = jnp.minimum(t_cur, t_surf)
    # delta-tracking weights: scatter -> sigma_s/sigma_t, pass -> 1
    w_g = jnp.where(scat[:, None], ss / jnp.maximum(st, 1e-9), jnp.ones((n, 3)))
    inside_g = scat

    is_grid = kind == M_GRID
    inside = jnp.where(is_grid, inside_g, inside_h) & has
    t = jnp.where(is_grid, t_g, t_h)
    w = jnp.where(is_grid[:, None], w_g, w_h)
    w = jnp.where(has[:, None], w, 1.0)
    p = o + d * t[:, None]
    return MediumSample(inside, t, p, w)


def transmittance(med: MediumTable, mid, o, d, t_far, key_a, key_b,
                  any_grid: bool = True):
    """Tr along a (shadow) segment for per-lane medium mid (-1 = vacuum)."""
    n = o.shape[0]
    has = mid >= 0
    m = jnp.maximum(mid, 0)
    kind = med.kind[m]
    st = med.sigma_a[m] + med.sigma_s[m]
    tr_h = jnp.exp(-st * jnp.minimum(t_far, 1e6)[:, None])
    if not any_grid:
        return jnp.where(has[:, None], tr_h, 1.0)
    # grid: ratio tracking
    pr = med.params[m]
    max_d = jnp.maximum(pr[:, 5], 1e-9)
    st_mean = jnp.mean(st, -1)
    sigma_bar = max_d * st_mean
    inv_sbar = 1.0 / jnp.maximum(sigma_bar, 1e-12)
    import jax

    def tr_block(carry):
        step0, t_cur, tr_g, done = carry
        for k in range(TRACKING_UNROLL):
            step = step0 + jnp.uint32(k)
            u1 = u32_to_float(hash3(key_a, key_b,
                                    jnp.uint32(0x5000) + 2 * step))
            t_cur = jnp.where(done, t_cur,
                              t_cur - jnp.log(jnp.maximum(1.0 - u1, 1e-38))
                              * inv_sbar)
            past = t_cur >= t_far
            done2 = done | past
            dens = _grid_density(med, m, o + d * t_cur[:, None])
            ratio = 1.0 - dens / max_d
            tr_g = jnp.where(done2, tr_g, tr_g * jnp.maximum(ratio, 0.0))
            # ratio tracking self-terminates when a lane's running weight
            # hits zero (a real-particle collision): keeps the union walk
            # short in dense grids
            done = done2 | (tr_g <= 0.0)
        return step0 + jnp.uint32(TRACKING_UNROLL), t_cur, tr_g, done

    roof = jnp.uint32(TRACKING_UNROLL * TRACKING_MAX_BLOCKS)
    init = (jnp.uint32(0), jnp.zeros(n, jnp.float32),
            jnp.ones(n, jnp.float32), jnp.zeros(n, bool))
    _, t_cur, tr_g, done = jax.lax.while_loop(
        lambda c: jnp.any(~c[3]) & (c[0] < roof), tr_block, init)
    is_grid = kind == M_GRID
    tr = jnp.where(is_grid[:, None], tr_g[:, None] * jnp.ones((1, 3)), tr_h)
    return jnp.where(has[:, None], tr, 1.0)
