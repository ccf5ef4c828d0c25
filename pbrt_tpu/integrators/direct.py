"""Direct-lighting integrator (UniformSampleAll / UniformSampleOne).

Reference: integrators/src/direct_lighting.rs (:27,100,110). Same wavefront
skeleton as whitted but with MIS direct lighting and specular recursion.
"""
from __future__ import annotations

import jax.numpy as jnp

from pbrt_tpu.core import math as vm
from pbrt_tpu.core.math import normalize
from pbrt_tpu.core.sampling import power_heuristic
from pbrt_tpu.samplers import sample_dim, sample_2d
from pbrt_tpu.materials import compute_lobes
from pbrt_tpu.materials import bsdf as B
from pbrt_tpu import lights as LT
from pbrt_tpu.scene.intersect import intersect, intersect_p
from pbrt_tpu.integrators.common import (bounce_base, camera_rays,
                                         sample_one_light)


def li_direct(cs, px, py, sample_idx, max_depth: int = 5, strategy: str = "all",
              with_stats: bool = False):
    spec = cs.sampler
    data = cs.data
    flags = cs.flags
    n = px.shape[0]

    rays, ray_w, p_film = camera_rays(cs, px, py, sample_idx,
                                      spp_for_diff=spec.rounded_spp())
    o, d = rays.o, rays.d
    C = 60 if flags.spectral else 3
    L = jnp.zeros((n, C), jnp.float32)
    beta = jnp.ones((n, C), jnp.float32)
    active = jnp.ones((n,), bool)

    from pbrt_tpu.utils.stats import device_counters_zero
    cnt = device_counters_zero()
    cnt["camera_rays"] = cnt["camera_rays"] + jnp.float32(n)

    for bounce in range(max_depth + 1):
        base = bounce_base(bounce)
        si = intersect(data, flags, o, normalize(d), jnp.full((n,), vm.INF))
        cnt["valid_hits"] = cnt["valid_hits"] + jnp.sum(
            (active & si.valid).astype(jnp.float32))
        if flags.has_infinite:
            esc = active & ~si.valid
            le_inf = LT.le_escaped(data.lights, normalize(d))
            if flags.spectral:
                from pbrt_tpu.core.spectrum import rgb_to_spectrum
                le_inf = rgb_to_spectrum(le_inf)
            L = L + jnp.where(esc[:, None], beta * le_inf, 0.0)
        if flags.has_area_lights:
            hit_l = active & si.valid & (si.area_light >= 0)
            le = LT.le_area(data.lights, si.area_light, si.ng, si.wo)
            if flags.spectral:
                from pbrt_tpu.core.spectrum import rgb_to_spectrum
                le = rgb_to_spectrum(le)
            L = L + jnp.where(hit_l[:, None], beta * le, 0.0)
        active = active & si.valid
        if bounce == max_depth:
            break

        u_mix = sample_dim(spec, px, py, sample_idx, base + 0)
        lobes = compute_lobes(data.mats, data.tex, si.material, si.uv, si.p,
                              u_mix, flags.has_tex_slot,
                              tex_kinds=flags.tex_kinds)
        if flags.spectral:
            from pbrt_tpu.materials import lift_lobes
            lobes = lift_lobes(lobes)
        u_sel = sample_dim(spec, px, py, sample_idx, base + 1)
        u_light = sample_2d(spec, px, py, sample_idx, base + 2)

        if strategy == "one":
            cnt["shadow_rays"] = cnt["shadow_rays"] + jnp.sum(
                active.astype(jnp.float32))
            ld = sample_one_light(cs, si, lobes, active, u_sel, u_light)
            L = L + jnp.where(active[:, None], beta * ld, 0.0)
        else:
            # uniform-sample-all: loop lights, no selection pmf
            wo_local = si.world_to_local(si.wo)
            for li in range(flags.n_lights):
                idx = jnp.full((n,), li, jnp.int32)
                ls = LT.sample_li(data.lights, data, idx, si.p, u_light,
                                  data.world_center, data.world_radius)
                wi_local = si.world_to_local(ls.wi)
                f = B.bsdf_f(lobes, wo_local, wi_local, data.fourier if flags.has_fourier else None) * vm.absdot(ls.wi, si.ns)[:, None]
                if flags.spectral:
                    from pbrt_tpu.core.spectrum import rgb_to_spectrum
                    ls = ls._replace(li=rgb_to_spectrum(ls.li))
                ok = active & (ls.pdf > 0) & ~B.black(f) & ~B.black(ls.li)
                so = si.spawn_origin(ls.wi)
                to_l = ls.p_light - so
                dist = vm.length(to_l)
                sd = to_l / jnp.maximum(dist, 1e-12)[:, None]
                cnt["shadow_rays"] = cnt["shadow_rays"] + jnp.sum(
                    ok.astype(jnp.float32))
                occ = intersect_p(data, flags, so, sd, dist * (1 - 1e-3))
                pdf_b = B.bsdf_pdf(lobes, wo_local, wi_local, data.fourier if flags.has_fourier else None)
                w = jnp.where(ls.is_delta, 1.0,
                              power_heuristic(1.0, ls.pdf, 1.0, pdf_b))
                contrib = f * ls.li * (w / jnp.maximum(ls.pdf, 1e-12))[:, None]
                L = L + jnp.where((ok & ~occ)[:, None], beta * contrib, 0.0)

        # specular continuation (direct_lighting.rs specular reflect/transmit)
        u_lobe = sample_dim(spec, px, py, sample_idx, base + 4)
        u_dir = sample_2d(spec, px, py, sample_idx, base + 5)
        wo_local = si.world_to_local(si.wo)
        bs = B.bsdf_sample(lobes, wo_local, u_lobe, u_dir, data.fourier if flags.has_fourier else None)
        wi_world = si.local_to_world(bs.wi)
        cos_w = vm.absdot(wi_world, si.ns)
        ok = active & bs.is_specular & (bs.pdf > 0) & ~B.black(bs.f)
        beta = jnp.where(ok[:, None],
                         beta * bs.f * (cos_w / jnp.maximum(bs.pdf, 1e-12))[:, None],
                         beta)
        active = ok
        cnt["bounce_rays"] = cnt["bounce_rays"] + jnp.sum(
            ok.astype(jnp.float32))
        o = si.spawn_origin(wi_world)
        d = wi_world

    if flags.spectral:
        from pbrt_tpu.core.spectrum import spectrum_to_rgb
        L = spectrum_to_rgb(L)
    if with_stats:
        return L, p_film, ray_w, cnt
    return L, p_film, ray_w
