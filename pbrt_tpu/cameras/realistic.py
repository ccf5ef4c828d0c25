"""Realistic camera: full lens-system simulation.

Reference: cameras/src/realistic_camera.rs (:33-127) — spherical lens
elements loaded from a lens table, thick-lens autofocus, exit-pupil bounds,
film rays traced element-by-element with Snell refraction.

TPU re-design: the element loop is a STATIC unroll (lens systems have
10-20 interfaces), each step branch-free over the whole wavefront; the exit
pupil is precomputed host-side by tracing vectorized ray grids.

Lens table rows (front->rear): curvature_radius(mm), thickness(mm), eta,
aperture_diameter(mm); radius 0 = aperture stop. Default prescription: the
classic 50mm double-Gauss design (public lens-design data).
"""
from __future__ import annotations

import dataclasses
import os

import numpy as np
import jax.numpy as jnp

from pbrt_tpu.core.math import vec3, normalize, dot
from pbrt_tpu.core.ray import Rays
from pbrt_tpu.core.sampling import concentric_sample_disk

# classic 50mm double-Gauss prescription (radius, thickness, eta, diameter) mm
DGAUSS_50MM = np.array([
    [58.950, 7.520, 1.670, 50.4],
    [169.660, 0.240, 1.000, 50.4],
    [38.550, 8.050, 1.670, 46.0],
    [81.540, 6.550, 1.699, 40.0],
    [25.500, 11.410, 1.000, 36.0],
    [0.0, 9.000, 0.000, 34.2],
    [-28.990, 2.360, 1.603, 34.0],
    [81.540, 12.130, 1.658, 40.0],
    [-40.770, 0.380, 1.000, 40.0],
    [874.130, 6.440, 1.717, 46.0],
    [-79.460, 72.228, 1.000, 46.0],
], np.float64)


def load_lens_system(params: dict) -> np.ndarray:
    """[n, 4] rows (curvature_radius_m, thickness_m, eta, aperture_radius_m),
    front -> rear, with the aperture clamped by "aperturediameter"."""
    fname = params.get("lensfile", [""])[0] if "lensfile" in params else ""
    table = None
    if fname:
        try:
            rows = []
            with open(fname) as f:
                for line in f:
                    line = line.split("#")[0].strip()
                    if line:
                        rows.append([float(x) for x in line.split()])
            table = np.asarray(rows, np.float64)
        except OSError:
            table = None
    if table is None:
        table = DGAUSS_50MM.copy()
    lens = np.zeros_like(table)
    lens[:, 0] = table[:, 0] * 1e-3
    lens[:, 1] = table[:, 1] * 1e-3
    lens[:, 2] = np.where(table[:, 2] == 0.0, 0.0, table[:, 2])
    lens[:, 3] = table[:, 3] * 1e-3 / 2.0
    ap = params.get("aperturediameter")
    if ap is not None:
        for i in range(len(lens)):
            if lens[i, 0] == 0.0:
                lens[i, 3] = min(lens[i, 3], float(ap[0]) * 1e-3 / 2.0)
    return lens


def _rear_z(lens):
    return -float(lens[:, 1].sum())  # front vertex at z=-(sum thickness)? see below


def trace_from_film(lens, o, d):
    """Trace rays from film space (film at z=0, lens toward -z, scene beyond).

    o, d: [N,3] jnp arrays. Returns (ok [N], o_out, d_out) in camera space
    where +z faces the scene (realistic_camera.rs trace_lenses_from_film).
    """
    element_z = 0.0
    ok = jnp.ones(o.shape[:1], bool)
    # iterate rear -> front
    for i in range(len(lens) - 1, -1, -1):
        radius, thickness, eta, ap_r = (float(lens[i, j]) for j in range(4))
        element_z -= thickness
        is_stop = radius == 0.0
        if is_stop:
            t = (element_z - o[:, 2]) / jnp.where(jnp.abs(d[:, 2]) < 1e-12, 1e-12, d[:, 2])
        else:
            z_center = element_z + radius
            oc = o - jnp.array([0.0, 0.0, z_center])
            a = jnp.sum(d * d, -1)
            b = 2.0 * jnp.sum(oc * d, -1)
            c = jnp.sum(oc * oc, -1) - radius * radius
            disc = b * b - 4 * a * c
            has = disc >= 0.0
            sq = jnp.sqrt(jnp.maximum(disc, 0.0))
            q = jnp.where(b < 0, -0.5 * (b - sq), -0.5 * (b + sq))
            t0 = q / jnp.where(a == 0, 1e-12, a)
            t1 = c / jnp.where(q == 0, 1e-12, q)
            # pbrt: use closer/farther depending on ray direction & curvature
            use_closer = (d[:, 2] > 0.0) ^ (radius < 0.0)
            t = jnp.where(use_closer, jnp.minimum(t0, t1), jnp.maximum(t0, t1))
            ok = ok & has & (t > 0.0)
        p = o + d * t[:, None]
        r2 = p[:, 0] ** 2 + p[:, 1] ** 2
        ok = ok & (r2 <= ap_r * ap_r)
        if not is_stop:
            z_center = element_z + radius
            n = normalize(p - jnp.array([0.0, 0.0, z_center]))
            n = jnp.where((jnp.sum(n * -d, -1) < 0.0)[:, None], -n, n)
            eta_i = eta if eta != 0 else 1.0
            eta_t = float(lens[i - 1, 2]) if i > 0 and lens[i - 1, 2] != 0 else 1.0
            ratio = eta_i / eta_t if eta_t != 0 else eta_i
            # refract -d about n
            wi = -normalize(d)
            cos_i = jnp.sum(n * wi, -1)
            sin2_t = ratio * ratio * jnp.maximum(0.0, 1.0 - cos_i * cos_i)
            tir = sin2_t >= 1.0
            cos_t = jnp.sqrt(jnp.maximum(1.0 - sin2_t, 0.0))
            wt = ratio * (-wi) + (ratio * cos_i - cos_t)[:, None] * n
            ok = ok & ~tir
            d = normalize(wt)
        o = p
    # to camera space: pbrt flips z (camera looks down +z)
    o_cam = o * jnp.array([1.0, 1.0, -1.0])
    d_cam = normalize(d * jnp.array([1.0, 1.0, -1.0]))
    return ok, o_cam, d_cam


def _focus_thick_lens(lens, focus_distance):
    """Adjust rear gap so the plane at focus_distance images onto the film
    (realistic_camera.rs focus_thick_lens). Host, numpy+jnp."""
    # trace a paraxial ray from the scene side to find cardinal points
    total = lens[:, 1].sum()
    front_z = -total
    rear_ap = float(lens[-1, 3])

    def cardinal(from_scene: bool):
        x = 0.001 * float(lens[:, 3].max())
        if from_scene:
            o = np.array([[x, 0.0, front_z - 1.0]])
            d = np.array([[0.0, 0.0, 1.0]])
            lens_t = lens
            ok, o2, d2 = _trace_from_scene_np(lens, o, d)
        else:
            o = np.array([[x, 0.0, 1.0]])
            d = np.array([[0.0, 0.0, -1.0]])
            ok, o2, d2 = _trace_from_film_np(lens, o, d)
        if not ok[0]:
            return None, None
        # principal plane: where the ray crosses height x again; focal point:
        # where it crosses the axis
        tf = -o2[0, 0] / d2[0, 0] if abs(d2[0, 0]) > 1e-12 else 0.0
        fz = o2[0, 2] + tf * d2[0, 2]
        tp = (x - o2[0, 0]) / d2[0, 0] if abs(d2[0, 0]) > 1e-12 else 0.0
        pz = o2[0, 2] + tp * d2[0, 2]
        return fz, pz

    # iterative focus (replaces the reference's closed-form thick-lens
    # solve with a bisection on the rear gap — same fixed point): adjust the
    # film-to-rear-element distance until an off-axis film ray crosses the
    # optical axis at focus_distance
    lens2 = lens.copy()
    lo_gap, hi_gap = 1e-4, 0.3
    for _ in range(40):
        mid = 0.5 * (lo_gap + hi_gap)
        lens2[-1, 1] = mid
        # trace ray from film center toward rear element edge
        o = np.array([[0.0, 0.0, 0.0]])
        d = normalize_np(np.array([[rear_ap * 0.25, 0.0, -(mid + 1e-4)]]))
        ok, o2, d2 = _trace_from_film_np(lens2, o, d)
        if not ok[0]:
            hi_gap = mid
            continue
        # where does it cross the axis in camera space (+z)?
        t_axis = -o2[0, 0] / d2[0, 0] if abs(d2[0, 0]) > 1e-12 else 1e9
        z_cross = o2[0, 2] + t_axis * d2[0, 2]
        if z_cross > focus_distance:
            lo_gap = mid
        else:
            hi_gap = mid
    lens2[-1, 1] = 0.5 * (lo_gap + hi_gap)
    return lens2


def normalize_np(v):
    return v / np.maximum(np.linalg.norm(v, axis=-1, keepdims=True), 1e-12)


def _trace_from_film_np(lens, o, d):
    ok, oc, dc = trace_from_film(lens, jnp.asarray(o, jnp.float32),
                                 jnp.asarray(d, jnp.float32))
    return np.asarray(ok), np.asarray(oc, np.float64), np.asarray(dc, np.float64)


def _trace_from_scene_np(lens, o, d):
    # reverse the element order and flip z to reuse film tracing
    rev = lens[::-1].copy()
    # thickness semantics shift by one when reversed; adequate for the
    # paraxial cardinal-point estimate used here
    o2 = np.asarray(o).copy()
    o2[:, 2] = -o2[:, 2]
    d2 = np.asarray(d).copy()
    d2[:, 2] = -d2[:, 2]
    return _trace_from_film_np(rev, o2, d2)


def focus_lens_system(spec, resolution, screen_window):
    """Autofocus + exit-pupil precompute; returns updated CameraSpec."""
    import dataclasses as dc
    lens = _focus_thick_lens(spec.lens_elements, spec.focal_distance)
    # exit pupil bounds per radial position (64 bins, realistic_camera.rs
    # compute_exit_pupil_bounds)
    film_diag = 0.035
    rear_ap = float(lens[-1, 3])
    rear_z = -float(lens[-1, 1])
    n_bins = 32
    bounds = np.zeros((n_bins, 4), np.float32)  # x0, x1, y0, y1 on rear disk
    rng = np.random.default_rng(0)
    for b in range(n_bins):
        r0 = b / n_bins * film_diag / 2.0
        r1 = (b + 1) / n_bins * film_diag / 2.0
        n = 512
        fx = rng.uniform(r0, r1, n)
        lx = rng.uniform(-1.5 * rear_ap, 1.5 * rear_ap, (n, 2))
        o = np.stack([fx, np.zeros(n), np.zeros(n)], -1)
        d = np.stack([lx[:, 0] - fx, lx[:, 1], np.full(n, rear_z)], -1)
        ok, _, _ = _trace_from_film_np(lens, o, normalize_np(d))
        if ok.any():
            sel = lx[ok]
            pad = 0.1 * rear_ap
            bounds[b] = [sel[:, 0].min() - pad, sel[:, 0].max() + pad,
                         sel[:, 1].min() - pad, sel[:, 1].max() + pad]
        else:
            bounds[b] = [-rear_ap, rear_ap, -rear_ap, rear_ap]
    object.__setattr__(spec, "lens_elements", lens)
    # stash pupil bounds on the frozen dataclass
    object.__setattr__(spec, "_exit_pupil", bounds)
    object.__setattr__(spec, "_film_diag", film_diag)
    return spec


def realistic_rays(spec, cs):
    """Wavefront ray generation (realistic_camera.rs generate_ray)."""
    lens = spec.lens_elements
    bounds = getattr(spec, "_exit_pupil")
    film_diag = getattr(spec, "_film_diag", 0.035)
    resx, resy = spec.resolution
    n = cs.p_film.shape[0]
    # film point: map raster to physical film (centered, y flipped)
    aspect = resy / resx
    film_w = film_diag / np.sqrt(1.0 + aspect * aspect)
    film_h = film_w * aspect
    sx = (cs.p_film[:, 0] / resx - 0.5) * film_w
    sy = -(cs.p_film[:, 1] / resy - 0.5) * film_h
    # pbrt films are inverted through the lens: rotate 180deg
    px = -sx
    py = -sy
    r_film = jnp.sqrt(px * px + py * py)
    bin_idx = jnp.clip((r_film / (film_diag / 2.0) * bounds.shape[0]).astype(jnp.int32),
                       0, bounds.shape[0] - 1)
    bb = jnp.asarray(bounds)[bin_idx]
    lx = bb[:, 0] + cs.p_lens[:, 0] * (bb[:, 1] - bb[:, 0])
    ly = bb[:, 2] + cs.p_lens[:, 1] * (bb[:, 3] - bb[:, 2])
    # rotate pupil point to the film point's azimuth
    sin_r = jnp.where(r_film > 1e-9, py / jnp.maximum(r_film, 1e-9), 0.0)
    cos_r = jnp.where(r_film > 1e-9, px / jnp.maximum(r_film, 1e-9), 1.0)
    plx = cos_r * lx - sin_r * ly
    ply = sin_r * lx + cos_r * ly
    rear_z = -float(lens[-1, 1])
    o = jnp.stack([px, py, jnp.zeros(n)], -1)
    d = jnp.stack([plx - px, ply - py, jnp.full(n, rear_z)], -1)
    d = normalize(d)
    ok, oc, dc = trace_from_film(lens, o, d)
    area = jnp.abs((bb[:, 1] - bb[:, 0]) * (bb[:, 3] - bb[:, 2]))
    cos_t = jnp.abs(d[:, 2])
    weight = jnp.where(ok, cos_t ** 4 * area / (rear_z * rear_z + 1e-12), 0.0)
    if spec.simple_weighting:
        weight = jnp.where(ok, 1.0, 0.0)
    rays = Rays.make(oc, dc)
    return rays, weight
