"""Volumetric path tracer: path.py + participating media.

Reference: integrators/src/volpath.rs (:38,102,112 — per-segment
medium.sample, phase-function sampling, handle_media NEE). Wavefront
re-design: a per-lane `cur_medium` id rides the bounce loop; each bounce
first samples a medium interaction on the segment (closed-form homogeneous /
ratio-tracked grid, media/), then medium lanes scatter by Henyey-Greenstein
while surface lanes run the standard material/NEE/BSDF pipeline. Null
("none") materials are medium-interface crossings: the lane passes through
and swaps its medium (costs one bounce slot of the static unroll — the
wavefront analog of the reference's not-counting null hits).

Medium random decisions draw from the auxiliary counter-hash stream (keyed
pixel/sample/bounce) rather than sampler dimensions, keeping BOUNCE_DIMS
fixed across integrators.
"""
from __future__ import annotations

import jax.numpy as jnp

from pbrt_tpu.core import math as vm
from pbrt_tpu.core.math import dot, normalize
from pbrt_tpu.core.sampling import power_heuristic
from pbrt_tpu.samplers import sample_dim, sample_2d
from pbrt_tpu.samplers.hashing import hash4, u32_to_float, U32
from pbrt_tpu.materials import compute_lobes
from pbrt_tpu.materials import bsdf as B
from pbrt_tpu import lights as LT
from pbrt_tpu import media as MD
from pbrt_tpu.scene.intersect import intersect, intersect_p
from pbrt_tpu.integrators.common import (bounce_base, camera_rays,
                                         light_pdf_for_dir, select_light,
                                         infinite_pdf_for_dir)


TR_SEGMENTS = 4  # shadow-ray medium-boundary crossings (reference: unbounded)


def intersect_tr(data, flags, cur_medium, o, d, dist, keys, hashes):
    """Multi-segment shadow-ray transmittance walk.

    Reference: core/src/scene.rs:106 Scene::intersect_tr +
    light/visibility_tester.rs tr(): repeatedly intersect toward the light;
    a surface with a real material occludes, a null-material medium
    interface is crossed (swapping the lane's medium) while per-segment
    transmittance accumulates. Wavefront form: TR_SEGMENTS statically
    unrolled rounds of closest-hit + masked medium swap; lanes that still
    face an uncrossed boundary after the budget are conservatively
    occluded (no light leaks).

    Returns (tr [N,3], occluded [N]).
    """
    n = o.shape[0]
    tr = jnp.ones((n, 3), jnp.float32)
    occluded = jnp.zeros((n,), bool)
    walking = jnp.ones((n,), bool)
    remaining = dist
    medium = cur_medium
    pxu, pyu, su = hashes
    for k in range(TR_SEGMENTS):
        si = intersect(data, flags, o, d, remaining * (1.0 - 1e-3))
        hit = walking & si.valid
        mat_none = data.mats.kind[jnp.maximum(si.material, 0)] == 12  # M_NONE
        is_null = (si.material < 0) | mat_none
        occluded = occluded | (hit & ~is_null)
        seg = jnp.where(hit, si.t, remaining)
        if flags.n_media > 0:
            ka = hash4(pxu, pyu, su, U32(keys + 2 * k))
            kb = hash4(pxu, pyu, su, U32(keys + 2 * k + 1))
            t_seg = MD.transmittance(data.media, medium, o, d, seg, ka, kb,
                                     any_grid=flags.any_grid_media)
            tr = jnp.where(walking[:, None], tr * t_seg, tr)
        # cross null interfaces: swap medium, restart from the boundary
        passing = hit & is_null & ~occluded
        entering = dot(d, si.ng) < 0.0
        pm = data.prim_medium[jnp.maximum(si.prim, 0)]
        medium = jnp.where(passing, jnp.where(entering, pm[:, 0], pm[:, 1]), medium)
        o = jnp.where(passing[:, None], si.spawn_origin(d), o)
        remaining = jnp.where(passing, jnp.maximum(remaining - si.t, 0.0), remaining)
        walking = passing
    occluded = occluded | walking  # budget exhausted: no leaks
    return tr, occluded


def li_volpath(cs, px, py, sample_idx, max_depth: int = 5,
               rr_threshold: float = 1.0, with_stats: bool = False):
    spec = cs.sampler
    data = cs.data
    flags = cs.flags
    n = px.shape[0]
    pxu = px.astype(U32)
    pyu = py.astype(U32)
    su = sample_idx.astype(U32)

    rays, ray_w, p_film = camera_rays(cs, px, py, sample_idx,
                                      spp_for_diff=spec.rounded_spp())
    o, d = rays.o, rays.d

    L = jnp.zeros((n, 3), jnp.float32)
    beta = jnp.ones((n, 3), jnp.float32)
    active = jnp.ones((n,), bool)
    specular_bounce = jnp.ones((n,), bool)
    prev_bsdf_pdf = jnp.zeros((n,), jnp.float32)
    prev_p = o
    eta_scale = jnp.ones((n,), jnp.float32)
    cur_medium = jnp.broadcast_to(jnp.asarray(data.camera_medium, jnp.int32), (n,))

    from pbrt_tpu.utils.stats import device_counters_zero
    cnt = device_counters_zero()
    cnt["camera_rays"] = cnt["camera_rays"] + jnp.float32(n)

    def med_keys(bounce, salt):
        a = hash4(pxu, pyu, su, U32(0xB0 + bounce))
        b = hash4(pxu, pyu, su, U32(0xC0 + bounce * 7 + salt))
        return a, b

    for bounce in range(max_depth + 1):
        base = bounce_base(bounce)
        dn = normalize(d)
        si = intersect(data, flags, o, dn, jnp.full((n,), vm.INF))

        # ---- medium interaction on this segment ----
        if flags.n_media > 0:
            ka, kb = med_keys(bounce, 0)
            u_med = jnp.stack([u32_to_float(hash4(pxu, pyu, su, U32(0xD1 + bounce))),
                               u32_to_float(hash4(pxu, pyu, su, U32(0xE2 + bounce)))], -1)
            ms = MD.sample_medium(data.media, cur_medium, o, dn, si.t, ka, kb, u_med,
                                  any_grid=flags.any_grid_media)
            in_medium = active & ms.sampled_medium
            beta = jnp.where(active[:, None], beta * ms.weight, beta)
        else:
            in_medium = jnp.zeros((n,), bool)

        # ---- emitted on surface lanes (not medium-scattered) ----
        surf_lane = active & ~in_medium
        if flags.has_infinite:
            esc = surf_lane & ~si.valid
            le_inf = LT.le_escaped(data.lights, dn)
            if bounce == 0:
                w = jnp.ones((n,), jnp.float32)
            else:
                pdf_inf = infinite_pdf_for_dir(cs, dn, prev_p)
                w = jnp.where(specular_bounce, 1.0,
                              power_heuristic(1.0, prev_bsdf_pdf, 1.0, pdf_inf))
            L = L + jnp.where(esc[:, None], beta * le_inf * w[:, None], 0.0)
        if flags.has_area_lights:
            hit_l = surf_lane & si.valid & (si.area_light >= 0)
            le = LT.le_area(data.lights, si.area_light, si.ng, si.wo)
            if bounce == 0:
                w = jnp.ones((n,), jnp.float32)
            else:
                pdf_l = light_pdf_for_dir(cs, prev_p, dn, si, si.area_light)
                w = jnp.where(specular_bounce, 1.0,
                              power_heuristic(1.0, prev_bsdf_pdf, 1.0, pdf_l))
            L = L + jnp.where(hit_l[:, None], beta * le * w[:, None], 0.0)

        active = in_medium | (surf_lane & si.valid)
        cnt["valid_hits"] = cnt["valid_hits"] + jnp.sum(
            active.astype(jnp.float32))
        if bounce == max_depth:
            break

        # ---- null material pass-through: swap medium, continue ----
        mat_none = data.mats.kind[jnp.maximum(si.material, 0)] == 12  # M_NONE
        is_null = surf_lane & si.valid & ((si.material < 0) | mat_none)
        entering = dot(dn, si.ng) < 0.0
        pm = data.prim_medium[jnp.maximum(si.prim, 0)]
        new_med = jnp.where(entering, pm[:, 0], pm[:, 1])
        cur_medium = jnp.where(is_null, new_med, cur_medium)

        # ---- NEE ----
        u_sel = sample_dim(spec, px, py, sample_idx, base + 1)
        u_light = sample_2d(spec, px, py, sample_idx, base + 2)
        if flags.n_lights > 0:
            ref_p = jnp.where(in_medium[:, None], ms.p, si.p) if flags.n_media > 0 else si.p
            light_idx, pmf, _ = select_light(cs, ref_p, u_sel)
            ls = LT.sample_li(data.lights, data, light_idx, ref_p, u_light,
                              data.world_center, data.world_radius)
            # scatter term: phase fn (medium) or bsdf*cos (surface)
            g = data.media.params[jnp.maximum(cur_medium, 0)][:, 0] if flags.n_media > 0 else jnp.zeros(n)
            p_phase = MD.hg_p(dot(-dn, ls.wi), g)
            u_mix = sample_dim(spec, px, py, sample_idx, base + 0)
            lobes = compute_lobes(data.mats, data.tex, si.material, si.uv, si.p,
                                  u_mix, flags.has_tex_slot,
                              tex_kinds=flags.tex_kinds)
            wi_local = si.world_to_local(ls.wi)
            wo_local = si.world_to_local(si.wo)
            f_surf = B.bsdf_f(lobes, wo_local, wi_local, data.fourier if flags.has_fourier else None) * vm.absdot(ls.wi, si.ns)[:, None]
            pdf_b_surf = B.bsdf_pdf(lobes, wo_local, wi_local, data.fourier if flags.has_fourier else None)
            f = jnp.where(in_medium[:, None], p_phase[:, None], f_surf)
            pdf_b = jnp.where(in_medium, p_phase, pdf_b_surf)

            cnt["shadow_rays"] = cnt["shadow_rays"] + jnp.sum(
                (active & ~is_null).astype(jnp.float32))
            nee_ok = active & (ls.pdf > 0) & ~B.black(f) & ~B.black(ls.li) & (pmf > 0) & ~is_null
            so = jnp.where(in_medium[:, None], ref_p, si.spawn_origin(ls.wi))
            to_l = ls.p_light - so
            dist = vm.length(to_l)
            sd = to_l / jnp.maximum(dist, 1e-12)[:, None]
            if flags.n_media > 0:
                # shadow ray: full intersect_tr walk through null interfaces
                # (scene.rs:106 / visibility_tester.rs tr())
                tr, occ = intersect_tr(data, flags, cur_medium, so, sd, dist,
                                       0xA100 + bounce * 16, (pxu, pyu, su))
            else:
                occ = intersect_p(data, flags, so, sd, dist * (1 - 1e-3))
                tr = jnp.ones((n, 3), jnp.float32)
            w_l = jnp.where(ls.is_delta, 1.0,
                            power_heuristic(1.0, ls.pdf * pmf, 1.0, pdf_b))
            ld = f * ls.li * tr * (w_l / jnp.maximum(ls.pdf * pmf, 1e-12))[:, None]
            L = L + jnp.where((nee_ok & ~occ)[:, None], beta * ld, 0.0)
        else:
            u_mix = sample_dim(spec, px, py, sample_idx, base + 0)
            lobes = compute_lobes(data.mats, data.tex, si.material, si.uv, si.p,
                                  u_mix, flags.has_tex_slot,
                              tex_kinds=flags.tex_kinds)

        # ---- direction sampling: phase (medium) / bsdf (surface) ----
        u_lobe = sample_dim(spec, px, py, sample_idx, base + 4)
        u_dir = sample_2d(spec, px, py, sample_idx, base + 5)
        # medium: HG sample
        g = data.media.params[jnp.maximum(cur_medium, 0)][:, 0] if flags.n_media > 0 else jnp.zeros(n)
        wi_med, p_med = MD.hg_sample(-dn, g, u_dir)
        # surface: bsdf sample
        wo_local = si.world_to_local(si.wo)
        bs = B.bsdf_sample(lobes, wo_local, u_lobe, u_dir, data.fourier if flags.has_fourier else None)
        wi_surf = si.local_to_world(bs.wi)
        cos_w = vm.absdot(wi_surf, si.ns)
        ok_surf = (bs.pdf > 0) & ~B.black(bs.f)
        beta_surf = bs.f * (cos_w / jnp.maximum(bs.pdf, 1e-12))[:, None]

        wi = jnp.where(in_medium[:, None], wi_med,
                       jnp.where(is_null[:, None], dn, wi_surf))
        # medium scatter: f/pdf = 1 (phase == pdf); null: passthrough beta 1
        bmul = jnp.where((in_medium | is_null)[:, None], 1.0, beta_surf)
        ok = jnp.where(in_medium | is_null, jnp.ones(n, bool), ok_surf)
        beta = jnp.where((active & ok)[:, None], beta * bmul, beta)
        active = active & ok
        cnt["bounce_rays"] = cnt["bounce_rays"] + jnp.sum(
            active.astype(jnp.float32))
        specular_bounce = jnp.where(in_medium | is_null,
                                    jnp.where(is_null, specular_bounce, jnp.zeros(n, bool)),
                                    bs.is_specular)
        prev_bsdf_pdf = jnp.where(in_medium, p_med,
                                  jnp.where(is_null, prev_bsdf_pdf, bs.pdf))
        eta_scale = eta_scale * jnp.where(in_medium | is_null, 1.0, bs.eta_scale)
        # update medium on real transmission through medium-interface surfaces
        crossed = (~in_medium) & si.valid & (jnp.where(is_null, True, bs.is_transmission))
        entering2 = dot(wi, si.ng) < 0.0
        new_med2 = jnp.where(entering2, pm[:, 0], pm[:, 1])
        cur_medium = jnp.where(crossed & active, new_med2, cur_medium)
        prev_p = jnp.where(in_medium[:, None], (ms.p if flags.n_media > 0 else si.p), si.p)
        o = jnp.where(in_medium[:, None], (ms.p if flags.n_media > 0 else si.p),
                      si.spawn_origin(wi))
        d = wi

        # ---- Russian roulette ----
        if bounce > 3:
            rr_beta = vm.max_component(beta * eta_scale[:, None])
            u_rr = sample_dim(spec, px, py, sample_idx, base + 7)
            q = jnp.maximum(0.05, 1.0 - rr_beta)
            do_rr = rr_beta < rr_threshold
            survive = ~do_rr | (u_rr >= q)
            beta = jnp.where((do_rr & survive)[:, None],
                             beta / jnp.maximum(1.0 - q, 1e-6)[:, None], beta)
            cnt["paths_terminated_rr"] = cnt["paths_terminated_rr"] + jnp.sum(
                (active & ~survive).astype(jnp.float32))
            active = active & survive

    if with_stats:
        return L, p_film, ray_w, cnt
    return L, p_film, ray_w
