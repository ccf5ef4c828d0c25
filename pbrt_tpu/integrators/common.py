"""Shared integrator machinery: camera rays, NEE with MIS, light selection.

Reference: core/src/integrator/common.rs (uniform_sample_one_light,
estimate_direct with power-heuristic MIS) and sampler_integrator.rs camera
sample flow. All functions are wavefront-vectorized and dimension-indexed
statically (the stateless-sampler contract, see pbrt_tpu/samplers).

Static sampler dimension layout:
  0,1 film jitter | 2,3 lens | 4 time
  per bounce b (base = 5 + 16*b):
    +0 mix-material select | +1 light select | +2,3 light sample
    +4 bsdf lobe select    | +5,6 bsdf direction | +7 russian roulette
    +8 bssrdf channel      | +9 bssrdf radius    | +10 bssrdf azimuth
"""
from __future__ import annotations

import jax.numpy as jnp

from pbrt_tpu.core import math as vm
from pbrt_tpu.core.math import dot, normalize
from pbrt_tpu.core.sampling import power_heuristic
from pbrt_tpu.samplers import sample_dim, sample_2d
from pbrt_tpu.cameras import CameraSamples, generate_rays
from pbrt_tpu.materials import compute_lobes
from pbrt_tpu.materials import bsdf as B
from pbrt_tpu import lights as LT
from pbrt_tpu.lights.distrib import spatial_sample_discrete, spatial_pdf
from pbrt_tpu.scene.intersect import intersect, intersect_p

CAMERA_DIMS = 5
BOUNCE_DIMS = 16


def bounce_base(bounce: int) -> int:
    return CAMERA_DIMS + BOUNCE_DIMS * bounce


def camera_rays(cs, px, py, sample_idx, spp_for_diff=1):
    """Generate primary rays for pixels (px, py) at sample_idx."""
    spec = cs.sampler
    u_film = sample_2d(spec, px, py, sample_idx, 0)
    p_film = jnp.stack([px.astype(jnp.float32) + u_film[:, 0],
                        py.astype(jnp.float32) + u_film[:, 1]], -1)
    u_lens = sample_2d(spec, px, py, sample_idx, 2)
    u_time = sample_dim(spec, px, py, sample_idx, 4)
    rays, w = generate_rays(cs.camera, CameraSamples(p_film, u_lens, u_time))
    if rays.rx_o is not None and spp_for_diff > 1:
        rays = rays.scaled_differentials(1.0 / jnp.sqrt(jnp.float32(spp_for_diff)))
    return rays, w, p_film


def select_light(cs, p, u_sel):
    """Pick a light per lane: (light_idx, pmf, u_remap).

    Strategy per core/src/light_distrib/mod.rs create_light_sample_distribution:
    "power" (default here), "uniform", or "spatial" (voxel grid, distrib.py).
    """
    flags = cs.flags
    data = cs.data
    if flags.light_strategy == "spatial" and data.light_spatial is not None:
        return spatial_sample_discrete(data.light_spatial, p, u_sel)
    if flags.light_strategy == "uniform":
        nl = flags.n_lights
        idx = jnp.minimum((u_sel * nl).astype(jnp.int32), nl - 1)
        pmf = jnp.full(u_sel.shape, 1.0 / nl, jnp.float32)
        return idx, pmf, jnp.minimum(u_sel * nl - idx.astype(jnp.float32), 0.99999994)
    return data.light_distr.sample_discrete(u_sel)


def select_light_pdf(cs, p, light_idx):
    """PMF that select_light at p would pick light_idx."""
    flags = cs.flags
    data = cs.data
    safe = jnp.maximum(light_idx, 0)
    if flags.light_strategy == "spatial" and data.light_spatial is not None:
        return spatial_pdf(data.light_spatial, p, safe)
    if flags.light_strategy == "uniform":
        return jnp.full(safe.shape, 1.0 / flags.n_lights, jnp.float32)
    return data.light_distr.discrete_pdf(safe)


def prepare_one_light(cs, si, lobes, active, u_sel, u_light):
    """NEE light-sample half WITHOUT the occlusion trace.

    Returns (ld [N,3] candidate contribution, o_sh, d_sh, dist [N],
    contributes [N] bool). The caller traces the shadow ray — either
    standalone (sample_one_light) or merged with the bounce's next-ray
    traversal (path integrator's intersect_pair launch)."""
    data = cs.data
    flags = cs.flags
    n = si.p.shape[0]
    ftab = data.fourier if flags.has_fourier else None
    if flags.n_lights == 0:
        z = jnp.zeros((n,), jnp.float32)
        up = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], jnp.float32), (n, 3))
        cc = 60 if flags.spectral else 3
        return (jnp.zeros((n, cc), jnp.float32), si.p, up, z,
                jnp.zeros((n,), bool))
    light_idx, pmf, _ = select_light(cs, si.p, u_sel)
    ls = LT.sample_li(data.lights, data, light_idx, si.p, u_light,
                      data.world_center, data.world_radius)
    if flags.spectral:
        from pbrt_tpu.core.spectrum import rgb_to_spectrum
        ls = ls._replace(li=rgb_to_spectrum(ls.li))
    wi_local = si.world_to_local(ls.wi)
    wo_local = si.world_to_local(si.wo)
    fams = cs.flags.bsdf_fams
    f = B.bsdf_f(lobes, wo_local, wi_local, ftab,
                 fams=fams) * vm.absdot(ls.wi, si.ns)[:, None]
    contributes = active & (ls.pdf > 0.0) & ~B.black(f) & ~B.black(ls.li) & (pmf > 0.0)

    # shadow ray geometry (VisibilityTester::unoccluded, visibility_tester.rs)
    o = si.spawn_origin(ls.wi)
    to_l = ls.p_light - o
    dist = vm.length(to_l)
    sd = to_l / jnp.maximum(dist, 1e-12)[:, None]

    # MIS: delta lights skip the heuristic (estimate_direct)
    pdf_b = B.bsdf_pdf(lobes, wo_local, wi_local, ftab, fams=fams)
    w_l = jnp.where(ls.is_delta, 1.0, power_heuristic(1.0, ls.pdf * pmf, 1.0, pdf_b))
    denom = jnp.maximum(ls.pdf * pmf, 1e-12)
    ld = f * ls.li * (w_l / denom)[:, None]
    ld = jnp.where(contributes[:, None], ld, 0.0)
    return ld, o, sd, dist * (1.0 - 1e-3), contributes


def sample_one_light(cs, si, lobes, active, u_sel, u_light):
    """NEE with MIS light-sample half (integrator/common.rs:90,150).

    Returns Ld [N,3] (unweighted by beta)."""
    if cs.flags.n_lights == 0:
        return jnp.zeros((si.p.shape[0], 60 if cs.flags.spectral else 3),
                         jnp.float32)
    ld, o, sd, dist, contributes = prepare_one_light(cs, si, lobes, active,
                                                     u_sel, u_light)
    occluded = intersect_p(cs.data, cs.flags, o, sd, dist)
    return jnp.where((contributes & ~occluded)[:, None], ld, 0.0)


def light_pdf_for_dir(cs, prev_p, wi, si_next, light_idx):
    """pdf (solid angle x selection pmf) that NEE would have generated
    direction wi hitting light light_idx — the bsdf-half MIS weight input."""
    data = cs.data
    hit_cos = vm.absdot(si_next.ng, si_next.wo)
    pdf = LT.pdf_li(data.lights, data, light_idx, prev_p, wi,
                    si_next.t, hit_cos, data.world_radius)
    pmf = select_light_pdf(cs, prev_p, light_idx)
    return pdf * pmf


def infinite_pdf_for_dir(cs, wi, prev_p=None):
    """Combined pdf of NEE picking any infinite light and sampling wi.

    prev_p: shading point the NEE would have been run from (needed for the
    spatial strategy's position-dependent pmf; ignored otherwise)."""
    data = cs.data
    n = wi.shape[0]
    total = jnp.zeros((n,), jnp.float32)
    # the infinite subset is known at build (flags.infinite_light_ids):
    # graph size no longer scales with the scene's total light count
    for li in cs.flags.infinite_light_ids:
        idx = jnp.full((n,), li, jnp.int32)
        pdf = LT.pdf_li(data.lights, data, idx, wi * 0.0, wi,
                        jnp.ones((n,)), jnp.ones((n,)), data.world_radius)
        if prev_p is not None:
            pmf = select_light_pdf(cs, prev_p, jnp.full((n,), li))
        else:
            pmf = data.light_distr.discrete_pdf(jnp.full((n,), li))
        total = total + pdf * pmf
    return total
