"""Light tables + wavefront sampling/eval.

Reference: lights/src/{point,spot,projection,goniometric,distant,diffuse,
infinite}.rs over the Light trait (core/src/light/mod.rs:105). TPU re-design:
one SoA table; sample_li / pdf_li evaluate every kind's (cheap) formula for
the whole wavefront and mask-select — no per-lane dispatch. Area lights
reference scene geometry (mesh triangle ranges with an area CDF, or a
quadric) and importance-sample it. Env maps use Distribution2D inversion.

params layout [L, 12]:
  POINT:   [0:3] world pos
  SPOT:    [0:3] pos, [3:6] dir(world), [6] cos_total, [7] cos_falloff
  PROJECTION: like spot + image id in [8] (screen window fov in [6])
  GONIO:   [0:3] pos, image id [8]
  DISTANT: [3:6] w_light (direction TO the light, world)
  AREA:    [0] is_mesh, [1] quad idx, [2] tri_start, [3] tri_count,
           [4] total_area, [5] two_sided, [6] cdf offset
  INFINITE:[8] image id (-1 = constant)
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from pbrt_tpu.core import math as vm
from pbrt_tpu.core.math import vec3, dot, cross, normalize, PI, INV_4PI
from pbrt_tpu.core.sampling import (uniform_sample_sphere, uniform_sample_cone,
                                    uniform_cone_pdf, uniform_sample_triangle,
                                    Distribution2D)

L_POINT, L_SPOT, L_PROJECTION, L_GONIO, L_DISTANT, L_AREA, L_INFINITE = range(7)
KIND_IDS = {"point": L_POINT, "spot": L_SPOT, "projection": L_PROJECTION,
            "goniometric": L_GONIO, "distant": L_DISTANT, "area": L_AREA,
            "infinite": L_INFINITE, "exinfinite": L_INFINITE}

DELTA_KINDS = (L_POINT, L_SPOT, L_PROJECTION, L_GONIO, L_DISTANT)


class LightTable(NamedTuple):
    kind: jnp.ndarray      # [L]
    L: jnp.ndarray         # [L,3] radiance/intensity (pre-scaled)
    params: jnp.ndarray    # [L,12]
    l2w: jnp.ndarray       # [L,4,4]
    w2l: jnp.ndarray       # [L,4,4]
    tri_cdf: jnp.ndarray   # [C] concatenated per-light triangle area CDFs
    tri_area: jnp.ndarray  # [C] per-triangle areas (same layout)
    # env map importance (one per scene for now; id in params[8]) — the
    # Distribution2D pieces (core/src/sampling/distribution_2d.rs analog)
    env_cond_func: jnp.ndarray   # [H, W]
    env_cond_cdf: jnp.ndarray    # [H, W+1]
    env_cond_int: jnp.ndarray    # [H]
    env_marg_func: jnp.ndarray   # [H]
    env_marg_cdf: jnp.ndarray    # [H+1]
    env_marg_int: jnp.ndarray    # scalar
    env_image: jnp.ndarray       # [H, W, 3] equirect radiance (1x1 if none)
    # light-sampling geometry: per-emitter triangles, concatenated across
    # lights in the same order as tri_cdf (mesh emitters copy their scene
    # triangles; quadric emitters are tessellated at build —
    # shapes/quadrics.py tessellate_quadric). params[2] offsets into these.
    ltri_p0: jnp.ndarray   # [C,3]
    ltri_p1: jnp.ndarray   # [C,3]
    ltri_p2: jnp.ndarray   # [C,3]
    # projection/goniometric image maps (lights/src/projection.rs:296,
    # goniometric.rs): per-light 64x64 RGB atlas, id in params[8]
    # ([1,1,1,3] placeholder when the scene has none)
    limg: jnp.ndarray      # [K,64,64,3]
    # declared-scope medium id per light (-1 vacuum): the BDPT light
    # subpath starts its walk in THIS medium (bdpt/mod.rs:611-633 threads
    # each endpoint's medium interface through the walks)
    medium: jnp.ndarray = None   # [L] int32

    @property
    def n_lights(self):
        return self.kind.shape[0]


class LiSample(NamedTuple):
    wi: jnp.ndarray        # [N,3]
    li: jnp.ndarray        # [N,3]
    pdf: jnp.ndarray       # [N] solid-angle pdf
    p_light: jnp.ndarray   # [N,3] point for the shadow ray
    is_delta: jnp.ndarray  # [N] bool
    n_light: jnp.ndarray   # [N,3] emitter geometric normal at p_light
                           # (area lights: sampled triangle normal; other
                           # kinds: -wi — BDPT s=1 MIS needs the real one)


def _spot_falloff(cos_w, cos_total, cos_falloff):
    d = jnp.clip((cos_w - cos_total) / jnp.maximum(cos_falloff - cos_total, 1e-6), 0.0, 1.0)
    return jnp.where(cos_w < cos_total, 0.0,
                     jnp.where(cos_w > cos_falloff, 1.0, (d * d) * (d * d)))


def sample_li(lights: LightTable, scene, light_idx, ref_p, u2,
              world_center, world_radius) -> LiSample:
    """Sample incident direction from per-lane light `light_idx` [N].

    scene: SceneData (for area-light geometry). Masked multi-kind evaluation.
    """
    n = ref_p.shape[0]
    li_idx = jnp.maximum(light_idx, 0)
    kind = vm.gather_rows(lights.kind, li_idx)
    Lv = vm.gather_rows(lights.L, li_idx)
    pr = vm.gather_rows(lights.params, li_idx)

    # ---- point-family (point/spot/projection/gonio) ----
    pos = pr[:, 0:3]
    to_l = pos - ref_p
    d2 = jnp.maximum(vm.length_squared(to_l), 1e-12)
    wi_point = to_l * jax.lax.rsqrt(d2)[:, None]
    li_point = Lv / d2[:, None]
    # spot falloff
    sdir = pr[:, 3:6]
    cos_w = dot(-wi_point, sdir)
    fall = _spot_falloff(cos_w, pr[:, 6], pr[:, 7])
    li_point = jnp.where((kind == L_SPOT)[:, None], li_point * fall[:, None], li_point)
    if lights.limg.shape[1] > 1:
        li_point = li_point * _map_modulation(lights, kind, pr, li_idx, -wi_point)

    # ---- distant ----
    w_light = pr[:, 3:6]
    wi_dist = w_light
    p_dist = ref_p + w_light * (2.0 * world_radius)
    li_dist = Lv

    # ---- area ----
    area_s = _sample_area(lights, scene, li_idx, ref_p, u2)

    # ---- infinite ----
    inf_s = _sample_infinite(lights, li_idx, ref_p, u2, world_radius)

    is_point_fam = (kind == L_POINT) | (kind == L_SPOT) | (kind == L_PROJECTION) | (kind == L_GONIO)
    is_dist = kind == L_DISTANT
    is_area = kind == L_AREA
    is_inf = kind == L_INFINITE

    wi = jnp.where(is_point_fam[:, None], wi_point,
                   jnp.where(is_dist[:, None], wi_dist,
                             jnp.where(is_area[:, None], area_s.wi, inf_s.wi)))
    li = jnp.where(is_point_fam[:, None], li_point,
                   jnp.where(is_dist[:, None], li_dist,
                             jnp.where(is_area[:, None], area_s.li, inf_s.li)))
    pdf = jnp.where(is_point_fam | is_dist, 1.0,
                    jnp.where(is_area, area_s.pdf, inf_s.pdf))
    p_l = jnp.where(is_point_fam[:, None], pos,
                    jnp.where(is_dist[:, None], p_dist,
                              jnp.where(is_area[:, None], area_s.p_light, inf_s.p_light)))
    is_delta = is_point_fam | is_dist
    pdf = jnp.where(light_idx < 0, 0.0, pdf)
    n_l = jnp.where(is_area[:, None], area_s.n_light, -wi)
    return LiSample(wi, li, pdf, p_l, is_delta, n_l)


def _sample_area(lights, scene, li_idx, ref_p, u2) -> LiSample:
    """Diffuse area light sampling (lights/src/diffuse.rs sample_li):
    mesh lights pick a triangle by area CDF then uniform-sample it."""
    n = ref_p.shape[0]
    pr = vm.gather_rows(lights.params, li_idx)
    tri_start = pr[:, 2].astype(jnp.int32)
    tri_count = jnp.maximum(pr[:, 3].astype(jnp.int32), 1)
    cdf_off = pr[:, 6].astype(jnp.int32)
    total_area = jnp.maximum(pr[:, 4], 1e-12)
    two_sided = pr[:, 5] > 0.5

    # select triangle: binary search over the light's CDF window. CDF rows
    # are normalized per light; window length varies -> use a fixed number of
    # bisection steps over the max window (log2(C)+1 covers any count).
    C = lights.tri_cdf.shape[0]
    u0 = u2[:, 0]
    lo = jnp.zeros((n,), jnp.int32)
    hi = tri_count
    steps = max(1, int(np.ceil(np.log2(max(C, 2)))) + 1)
    for _ in range(steps):
        mid = (lo + hi) // 2
        cv = vm.gather_rows(lights.tri_cdf, jnp.clip(cdf_off + mid, 0, C - 1))
        go_right = cv <= u0
        lo = jnp.where(go_right, jnp.minimum(mid + 1, tri_count), lo)
        hi = jnp.where(go_right, hi, mid)
    k = jnp.clip(lo, 0, tri_count - 1)
    tri = jnp.clip(tri_start + k, 0, lights.ltri_p0.shape[0] - 1)
    # remap u0 within the selected triangle's CDF span
    c_lo = jnp.where(k > 0, vm.gather_rows(lights.tri_cdf, jnp.clip(cdf_off + k - 1, 0, C - 1)), 0.0)
    c_hi = vm.gather_rows(lights.tri_cdf, jnp.clip(cdf_off + k, 0, C - 1))
    u0r = jnp.clip((u0 - c_lo) / jnp.maximum(c_hi - c_lo, 1e-9), 0.0, vm.ONE_MINUS_EPSILON)
    uu = jnp.stack([u0r, u2[:, 1]], -1)
    b = uniform_sample_triangle(uu)
    p0 = vm.gather_rows(lights.ltri_p0, tri)
    p1 = vm.gather_rows(lights.ltri_p1, tri)
    p2 = vm.gather_rows(lights.ltri_p2, tri)
    p = b[:, 0:1] * p0 + b[:, 1:2] * p1 + (1.0 - b[:, 0:1] - b[:, 1:2]) * p2
    ng = cross(p1 - p0, p2 - p0)
    area2 = vm.length(ng)
    ng = ng / jnp.maximum(area2, 1e-12)[:, None]

    to_ref = ref_p - p
    d2 = jnp.maximum(vm.length_squared(to_ref), 1e-12)
    wi = -to_ref * jax.lax.rsqrt(d2)[:, None]
    cos_l = dot(ng, -wi)
    emits = jnp.where(two_sided, jnp.abs(cos_l) > 1e-7, cos_l > 1e-7)
    # area pdf -> solid angle pdf
    pdf = d2 / jnp.maximum(jnp.abs(cos_l), 1e-9) / total_area
    Lv = vm.gather_rows(lights.L, li_idx)
    li = jnp.where(emits[:, None], Lv, 0.0)
    pdf = jnp.where(emits, pdf, 0.0)
    return LiSample(wi, li, pdf, p, jnp.zeros((n,), bool), ng)


def _sample_infinite(lights, li_idx, ref_p, u2, world_radius) -> LiSample:
    n = ref_p.shape[0]
    pr = vm.gather_rows(lights.params, li_idx)
    img_id = pr[:, 8].astype(jnp.int32)
    has_map = img_id >= 0
    H, W = lights.env_image.shape[0], lights.env_image.shape[1]
    if H > 1:
        d2 = Distribution2D(lights.env_cond_func, lights.env_cond_cdf,
                            lights.env_cond_int, lights.env_marg_func,
                            lights.env_marg_cdf, lights.env_marg_int)
        uv, map_pdf = d2.sample_continuous(u2)
        theta = uv[:, 1] * PI
        phi = uv[:, 0] * 2.0 * PI
        sin_t = jnp.sin(theta)
        w_l = vec3(sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), jnp.cos(theta))
        # light-to-world rotation
        l2w = vm.gather_rows(lights.l2w, li_idx)
        wi_map = jnp.einsum("nij,nj->ni", l2w[:, :3, :3], w_l)
        pdf_map = jnp.where(sin_t > 1e-7, map_pdf / (2.0 * PI * PI * jnp.maximum(sin_t, 1e-7)), 0.0)
        ix = jnp.clip((uv[:, 0] * W).astype(jnp.int32), 0, W - 1)
        iy = jnp.clip((uv[:, 1] * H).astype(jnp.int32), 0, H - 1)
        li_map = lights.env_image.reshape(H * W, 3)[iy * W + ix] * vm.gather_rows(lights.L, li_idx)
    else:
        wi_map = jnp.zeros((n, 3), jnp.float32)
        pdf_map = jnp.zeros((n,), jnp.float32)
        li_map = jnp.zeros((n, 3), jnp.float32)
    # constant: uniform sphere
    wi_c = uniform_sample_sphere(u2)
    pdf_c = jnp.full((n,), INV_4PI, jnp.float32)
    li_c = vm.gather_rows(lights.L, li_idx)
    wi = jnp.where(has_map[:, None], wi_map, wi_c)
    pdf = jnp.where(has_map, pdf_map, pdf_c)
    li = jnp.where(has_map[:, None], li_map, li_c)
    p_l = ref_p + wi * (2.0 * world_radius)
    return LiSample(wi, li, pdf, p_l, jnp.zeros((n,), bool), -wi)


def pdf_li(lights: LightTable, scene, light_idx, ref_p, wi, hit_t, hit_cos,
           world_radius):
    """Solid-angle pdf that sample_li would have produced direction wi toward
    per-lane light light_idx; used for BSDF-sampling MIS. For area lights the
    caller provides the actual hit (hit_t, |cos| at light) from intersection."""
    li_idx = jnp.maximum(light_idx, 0)
    kind = vm.gather_rows(lights.kind, li_idx)
    pr = vm.gather_rows(lights.params, li_idx)
    total_area = jnp.maximum(pr[:, 4], 1e-12)
    d2 = hit_t * hit_t
    pdf_area = d2 / jnp.maximum(hit_cos, 1e-9) / total_area
    # infinite
    H, W = lights.env_image.shape[0], lights.env_image.shape[1]
    w2l = vm.gather_rows(lights.w2l, li_idx)
    w_l = jnp.einsum("nij,nj->ni", w2l[:, :3, :3], wi)
    theta = vm.spherical_theta(w_l)
    phi = vm.spherical_phi(w_l)
    sin_t = jnp.sin(theta)
    if H > 1:
        iu = jnp.clip((phi / (2 * PI) * W).astype(jnp.int32), 0, W - 1)
        iv = jnp.clip((theta / PI * H).astype(jnp.int32), 0, H - 1)
        f = lights.env_cond_func.reshape(-1)[iv * W + iu]
        pdf_map = jnp.where(sin_t > 1e-7,
                            f / jnp.maximum(lights.env_marg_int, 1e-12)
                            / (2.0 * PI * PI * jnp.maximum(sin_t, 1e-7)),
                            0.0)
    else:
        pdf_map = jnp.zeros_like(theta)
    has_map = pr[:, 8] >= 0
    pdf_inf = jnp.where(has_map, pdf_map, INV_4PI)
    return jnp.where(kind == L_AREA, pdf_area,
                     jnp.where(kind == L_INFINITE, pdf_inf, 0.0))


def le_escaped(lights: LightTable, rd):
    """Sum of infinite-light radiance along escaped directions rd [N,3]
    (infinite.rs le)."""
    n = rd.shape[0]
    total = jnp.zeros((n, 3), jnp.float32)
    H, W = lights.env_image.shape[0], lights.env_image.shape[1]
    for li in range(lights.n_lights):
        # static unroll over lights: only infinite ones contribute
        def body(li):
            kindv = lights.kind[li]
            pr = lights.params[li]
            if H > 1:
                w_l = rd @ lights.w2l[li][:3, :3].T
                theta = vm.spherical_theta(w_l)
                phi = vm.spherical_phi(w_l)
                iu = jnp.clip((phi / (2 * PI) * W).astype(jnp.int32), 0, W - 1)
                iv = jnp.clip((theta / PI * H).astype(jnp.int32), 0, H - 1)
                mapped = lights.env_image.reshape(H * W, 3)[iv * W + iu] * lights.L[li]
            else:
                mapped = jnp.zeros((n, 3), jnp.float32)
            const = jnp.broadcast_to(lights.L[li], (n, 3))
            val = jnp.where(pr[8] >= 0, mapped, const)
            return jnp.where(kindv == L_INFINITE, val, 0.0)
        total = total + body(li)
    return total


def le_area(lights: LightTable, light_idx, ng, wo):
    """Emitted radiance of an intersected area light (diffuse.rs l())."""
    li_idx = jnp.maximum(light_idx, 0)
    two_sided = vm.gather_rows(lights.params, li_idx)[:, 5] > 0.5
    front = dot(ng, wo) > 0.0
    ok = (light_idx >= 0) & (two_sided | front)
    return jnp.where(ok[:, None], vm.gather_rows(lights.L, li_idx), 0.0)


def light_power(kind, L_rgb, params, world_radius, env_mean=1.0):
    """Host-side approximate power for the selection distribution
    (core/src/light power + light_distrib power strategy)."""
    y = float(np.dot(L_rgb, [0.212671, 0.715160, 0.072169]))
    if kind == L_POINT:
        return 4.0 * np.pi * y
    if kind == L_SPOT:
        return 2.0 * np.pi * (1.0 - 0.5 * (params[6] + params[7])) * y
    if kind in (L_PROJECTION, L_GONIO):
        return 4.0 * np.pi * y
    if kind == L_DISTANT:
        return np.pi * world_radius * world_radius * y
    if kind == L_AREA:
        return params[4] * np.pi * y * (2.0 if params[5] > 0.5 else 1.0)
    if kind == L_INFINITE:
        return np.pi * world_radius * world_radius * y * env_mean
    return y


# ---------------------------------------------------------------------------
# emission sampling (sample_le) — photon/BDPT light subpath starts
# (core/src/light/mod.rs:144 sample_le per kind)
# ---------------------------------------------------------------------------

class LeSample(NamedTuple):
    o: jnp.ndarray         # [N,3] ray origin
    d: jnp.ndarray         # [N,3] ray dir
    n_light: jnp.ndarray   # [N,3] light normal (for cos term)
    le: jnp.ndarray        # [N,3]
    pdf_pos: jnp.ndarray   # [N]
    pdf_dir: jnp.ndarray   # [N]


def _map_modulation(lights, kind, pr, li_idx, dir_world):
    """Projection/goniometric image-map modulation of a point-family light's
    emission along world-space direction dir_world (light -> receiver).

    Reference: projection.rs projection(), goniometric.rs scale(). Used by
    BOTH sample_li (NEE) and sample_le (light subpaths, BDPT/SPPM) so the
    two transport directions agree on mapped lights. Projection directions
    outside the frustum window emit nothing.
    """
    imgid = pr[:, 8].astype(jnp.int32)
    w2l = vm.gather_rows(lights.w2l, li_idx)
    dl = normalize(jnp.einsum("nij,nj->ni", w2l[:, :3, :3], dir_world))
    dxl, dyl, dzl = dl[:, 0], dl[:, 1], dl[:, 2]
    tanh = jnp.maximum(pr[:, 7], 1e-6)
    # projection screen window follows the source map aspect (params[9] =
    # h/w, set at build; 0 means unset -> square)
    aspect = jnp.where(pr[:, 9] > 0, pr[:, 9], 1.0)
    zs = jnp.where(jnp.abs(dzl) > 1e-6, dzl, 1e-6)
    s = dxl / (zs * tanh) * 0.5 + 0.5
    t = dyl / (zs * tanh * aspect) * 0.5 + 0.5
    inside = (dzl > 0) & (s >= 0) & (s <= 1) & (t >= 0) & (t <= 1)
    theta = jnp.arccos(jnp.clip(dzl, -1.0, 1.0))
    phi = jnp.arctan2(dyl, dxl)
    phi = jnp.where(phi < 0, phi + 2.0 * jnp.pi, phi)
    is_proj = kind == L_PROJECTION
    u_ = jnp.where(is_proj, s, phi / (2.0 * jnp.pi))
    v_ = jnp.where(is_proj, t, theta / jnp.pi)
    K, Hh, Ww = lights.limg.shape[:3]
    ix = jnp.clip((u_ * Ww).astype(jnp.int32), 0, Ww - 1)
    iy = jnp.clip((v_ * Hh).astype(jnp.int32), 0, Hh - 1)
    mval = lights.limg.reshape(K * Hh * Ww, 3)[
        (jnp.clip(imgid, 0, K - 1) * Hh + iy) * Ww + ix]
    has = imgid >= 0
    return jnp.where((is_proj & has)[:, None],
                     jnp.where(inside[:, None], mval, 0.0),
                     jnp.where(((kind == L_GONIO) & has)[:, None], mval, 1.0))


def sample_le(lights: LightTable, scene, light_idx, u1, u2,
              world_center, world_radius) -> LeSample:
    """Sample an emitted ray from per-lane light light_idx.

    u1, u2: [N,2] random pairs (position, direction).
    """
    n = u1.shape[0]
    li_idx = jnp.maximum(light_idx, 0)
    kind = vm.gather_rows(lights.kind, li_idx)
    Lv = vm.gather_rows(lights.L, li_idx)
    pr = vm.gather_rows(lights.params, li_idx)

    # point family: origin at light, uniform sphere dir (spot: cone)
    pos = pr[:, 0:3]
    d_pt = uniform_sample_sphere(u1)
    pdf_dir_pt = jnp.full((n,), INV_4PI)
    # spot: sample inside the cone around its axis
    sdir = pr[:, 3:6]
    cos_total = pr[:, 6]
    d_cone_local = uniform_sample_cone(u1, cos_total)
    v1s, v2s = vm.coordinate_system(normalize(jnp.where((kind == L_SPOT)[:, None], sdir, jnp.array([0.0, 0, 1.0]))))
    d_spot = d_cone_local[:, 0:1] * v1s + d_cone_local[:, 1:2] * v2s + d_cone_local[:, 2:3] * normalize(sdir)
    is_spot = kind == L_SPOT
    d_point = jnp.where(is_spot[:, None], d_spot, d_pt)
    pdf_dir_point = jnp.where(is_spot, uniform_cone_pdf(cos_total), pdf_dir_pt)
    fall = _spot_falloff(dot(d_point, sdir), pr[:, 6], pr[:, 7])
    le_point = jnp.where(is_spot[:, None], Lv * fall[:, None], Lv)
    # projection/gonio image-map modulation on EMITTED rays too (ADVICE r2:
    # sample_li applied the map but sample_le did not, so BDPT/SPPM light
    # subpaths disagreed with NEE on mapped lights)
    if lights.limg.shape[1] > 1:
        le_point = le_point * _map_modulation(lights, kind, pr, li_idx, d_point)

    # distant: disk of world radius perpendicular to direction
    w_l = pr[:, 3:6]          # direction TO light
    v1, v2 = vm.coordinate_system(normalize(-w_l + 1e-12))
    from pbrt_tpu.core.sampling import concentric_sample_disk
    cd = concentric_sample_disk(u1)
    p_disk = world_center + world_radius * (cd[:, 0:1] * v1 + cd[:, 1:2] * v2)
    o_dist = p_disk + w_l * world_radius
    pdf_pos_dist = 1.0 / (PI * world_radius * world_radius)

    # area: point on emitter, cosine hemisphere around normal
    area_p, area_ng, area_pdf_pos = _area_point(lights, scene, li_idx, u1)
    from pbrt_tpu.core.sampling import cosine_sample_hemisphere, cosine_hemisphere_pdf
    hl = cosine_sample_hemisphere(u2)
    av1, av2 = vm.coordinate_system(area_ng)
    d_area = hl[:, 0:1] * av1 + hl[:, 1:2] * av2 + hl[:, 2:3] * area_ng
    two_sided = pr[:, 5] > 0.5
    flip = two_sided & (u2[:, 0] < 0.5)  # crude two-sided handling
    d_area = jnp.where(flip[:, None], -d_area, d_area)
    pdf_dir_area = cosine_hemisphere_pdf(jnp.abs(hl[:, 2]))

    # infinite: direction from env importance (or uniform), origin on disk
    inf = _sample_infinite(lights, li_idx,
                           jnp.broadcast_to(world_center, (n, 3)), u2, world_radius)
    d_inf = -inf.wi
    iv1, iv2 = vm.coordinate_system(normalize(d_inf))
    p_inf = world_center + world_radius * (-d_inf + cd[:, 0:1] * iv1 + cd[:, 1:2] * iv2)

    is_point_fam = (kind == L_POINT) | (kind == L_SPOT) | (kind == L_PROJECTION) | (kind == L_GONIO)
    is_dist = kind == L_DISTANT
    is_area = kind == L_AREA
    is_inf = kind == L_INFINITE

    o = jnp.where(is_point_fam[:, None], pos,
                  jnp.where(is_dist[:, None], o_dist,
                            jnp.where(is_area[:, None], area_p, p_inf)))
    d = jnp.where(is_point_fam[:, None], d_point,
                  jnp.where(is_dist[:, None], -w_l,
                            jnp.where(is_area[:, None], d_area, d_inf)))
    nl = jnp.where(is_area[:, None], jnp.where(flip[:, None], -area_ng, area_ng),
                   normalize(d))
    le = jnp.where(is_point_fam[:, None], le_point,
                   jnp.where(is_inf[:, None], inf.li, Lv))
    pdf_pos = jnp.where(is_point_fam, 1.0,
                        jnp.where(is_area, area_pdf_pos, pdf_pos_dist))
    pdf_dir = jnp.where(is_point_fam, pdf_dir_point,
                        jnp.where(is_dist, 1.0,
                                  jnp.where(is_area, pdf_dir_area, inf.pdf)))
    return LeSample(o + nl * 1e-4, d, nl, le, pdf_pos, jnp.maximum(pdf_dir, 1e-12))


def _area_point(lights, scene, li_idx, u2):
    """Uniform point on an area light's emitter surface.
    Returns (p [N,3], ng [N,3], pdf_area [N])."""
    n = u2.shape[0]
    pr = vm.gather_rows(lights.params, li_idx)
    tri_start = pr[:, 2].astype(jnp.int32)
    tri_count = jnp.maximum(pr[:, 3].astype(jnp.int32), 1)
    cdf_off = pr[:, 6].astype(jnp.int32)
    total_area = jnp.maximum(pr[:, 4], 1e-12)
    C = lights.tri_cdf.shape[0]
    u0 = u2[:, 0]
    lo = jnp.zeros((n,), jnp.int32)
    hi = tri_count
    steps = max(1, int(np.ceil(np.log2(max(C, 2)))) + 1)
    for _ in range(steps):
        mid = (lo + hi) // 2
        cv = vm.gather_rows(lights.tri_cdf, jnp.clip(cdf_off + mid, 0, C - 1))
        go_right = cv <= u0
        lo = jnp.where(go_right, jnp.minimum(mid + 1, tri_count), lo)
        hi = jnp.where(go_right, hi, mid)
    k = jnp.clip(lo, 0, tri_count - 1)
    tri = jnp.clip(tri_start + k, 0, lights.ltri_p0.shape[0] - 1)
    c_lo = jnp.where(k > 0, vm.gather_rows(lights.tri_cdf, jnp.clip(cdf_off + k - 1, 0, C - 1)), 0.0)
    c_hi = vm.gather_rows(lights.tri_cdf, jnp.clip(cdf_off + k, 0, C - 1))
    u0r = jnp.clip((u0 - c_lo) / jnp.maximum(c_hi - c_lo, 1e-9), 0.0, vm.ONE_MINUS_EPSILON)
    b = uniform_sample_triangle(jnp.stack([u0r, u2[:, 1]], -1))
    p0 = vm.gather_rows(lights.ltri_p0, tri)
    p1 = vm.gather_rows(lights.ltri_p1, tri)
    p2 = vm.gather_rows(lights.ltri_p2, tri)
    p = b[:, 0:1] * p0 + b[:, 1:2] * p1 + (1.0 - b[:, 0:1] - b[:, 1:2]) * p2
    ngr = cross(p1 - p0, p2 - p0)
    ng = ngr / jnp.maximum(vm.length(ngr), 1e-12)[:, None]
    return p, ng, 1.0 / total_area
