"""Quadric shapes: sphere, cylinder, disk, cone, paraboloid, hyperboloid.

Reference: shapes/src/{sphere,cylinder,disk,cone,paraboloid,hyperboloid}.rs.
TPU re-design: all quadrics of a scene live in one SoA table
(type, object<->world matrices, parameter vector); intersection runs the
whole wavefront against one quadric at a time inside a vmap over the quadric
table (scenes have few quadrics — triangle meshes carry the big geometry and
go through the BVH). Each intersect is branch-free: clipping (zmin/zmax/
phimax) and the two quadratic roots are handled with masks, mirroring the
reference's t0/t1 retry logic without control flow.

Parameter layout (quad_params[:, 8]):
  sphere:      radius, zmin, zmax, phimax, theta_min, theta_max, -, -
  cylinder:    radius, zmin, zmax, phimax, -, -, -, -
  disk:        height, radius, inner_radius, phimax, -, -, -, -
  cone:        radius, height, phimax, -, -, -, -, -
  paraboloid:  radius, zmin, zmax, phimax, -, -, -, -
  hyperboloid: p1(3), p2(3), phimax, ah/ch packed at build
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from pbrt_tpu.core import math as vm
from pbrt_tpu.core.math import vec3, dot, cross, normalize, PI, quadratic

SPHERE, CYLINDER, DISK, CONE, PARABOLOID, HYPERBOLOID = range(6)
_KIND_NAMES = {"sphere": SPHERE, "cylinder": CYLINDER, "disk": DISK,
               "cone": CONE, "paraboloid": PARABOLOID, "hyperboloid": HYPERBOLOID}


class QuadricHit(NamedTuple):
    """Per-ray hit info against one quadric (object-space param hit)."""
    hit: jnp.ndarray      # [N] bool
    t: jnp.ndarray        # [N]
    p: jnp.ndarray        # [N,3] world hit point
    ng: jnp.ndarray       # [N,3] world geometric normal
    uv: jnp.ndarray       # [N,2]
    dpdu: jnp.ndarray     # [N,3] world
    dpdv: jnp.ndarray     # [N,3] world
    p_err: jnp.ndarray    # [N,3] world-space error bound


def build_quadric(kind: str, params: dict):
    """ParamSet -> (type_id, param_vec[8], area) — host side."""
    p = np.zeros(8, np.float32)
    if kind == "sphere":
        r = float(params.get("radius", [1.0])[0])
        zmin = float(params.get("zmin", [-r])[0])
        zmax = float(params.get("zmax", [r])[0])
        phimax = np.radians(float(params.get("phimax", [360.0])[0]))
        tmin = np.arccos(np.clip(min(zmin, zmax) / r, -1, 1))
        tmax = np.arccos(np.clip(max(zmin, zmax) / r, -1, 1))
        p[:6] = [r, min(zmin, zmax), max(zmin, zmax), phimax, tmin, tmax]
        area = phimax * r * (max(zmin, zmax) - min(zmin, zmax))
        return SPHERE, p, float(area)
    if kind == "cylinder":
        r = float(params.get("radius", [1.0])[0])
        zmin = float(params.get("zmin", [-1.0])[0])
        zmax = float(params.get("zmax", [1.0])[0])
        phimax = np.radians(float(params.get("phimax", [360.0])[0]))
        p[:4] = [r, min(zmin, zmax), max(zmin, zmax), phimax]
        return CYLINDER, p, float((zmax - zmin) * r * phimax)
    if kind == "disk":
        h = float(params.get("height", [0.0])[0])
        r = float(params.get("radius", [1.0])[0])
        ir = float(params.get("innerradius", [0.0])[0])
        phimax = np.radians(float(params.get("phimax", [360.0])[0]))
        p[:4] = [h, r, ir, phimax]
        return DISK, p, float(phimax * 0.5 * (r * r - ir * ir))
    if kind == "cone":
        r = float(params.get("radius", [1.0])[0])
        h = float(params.get("height", [1.0])[0])
        phimax = np.radians(float(params.get("phimax", [360.0])[0]))
        p[:3] = [r, h, phimax]
        return CONE, p, float(r * np.sqrt(h * h + r * r) * phimax / 2.0)
    if kind == "paraboloid":
        r = float(params.get("radius", [1.0])[0])
        zmin = float(params.get("zmin", [0.0])[0])
        zmax = float(params.get("zmax", [1.0])[0])
        phimax = np.radians(float(params.get("phimax", [360.0])[0]))
        p[:4] = [r, min(zmin, zmax), max(zmin, zmax), phimax]
        radius2 = r * r
        k = 4.0 * zmax / radius2
        area = (radius2 * radius2 * phimax / (12.0 * zmax * zmax)) * \
            ((k * zmax + 1) ** 1.5 - (k * zmin + 1) ** 1.5)
        return PARABOLOID, p, float(area)
    if kind == "hyperboloid":
        p1 = np.asarray(params.get("p1", [[0, 0, 0]])[0] if isinstance(params.get("p1", [[0, 0, 0]])[0], (list, np.ndarray)) else params["p1"][:3], np.float32).reshape(3)
        p2 = np.asarray(params.get("p2", [[1, 1, 1]])[0] if isinstance(params.get("p2", [[1, 1, 1]])[0], (list, np.ndarray)) else params["p2"][:3], np.float32).reshape(3)
        phimax = np.radians(float(params.get("phimax", [360.0])[0]))
        pa, pb = p1.copy(), p2.copy()
        if pb[2] == 0.0:
            pa, pb = pb, pa
        # find implicit coefficients a, c for x^2+y^2 - c z^2 = a form
        pp = pa.copy()
        a = c = 0.0
        for _ in range(64):
            pp = pa + 2.0 * (pp - pa)
            xy1 = pp[0] ** 2 + pp[1] ** 2
            xy2 = pb[0] ** 2 + pb[1] ** 2
            denom = xy1 * pb[2] ** 2 - xy2 * pp[2] ** 2
            if abs(denom) < 1e-12:
                continue
            a = (pp[2] ** 2 - pb[2] ** 2) / denom
            c = (xy2 * a - 1.0) / (pb[2] ** 2)
            if np.isfinite(a) and a != 0.0:
                break
        p[:3] = pa
        p[3] = phimax
        # pack p2 + coefficients into remaining slots (p[4:7] = p2, p[7]=a; c derived)
        p[4:7] = pb
        p[7] = np.float32(a)
        zmin, zmax = min(pa[2], pb[2]), max(pa[2], pb[2])
        rmax = max(np.hypot(*pa[:2]), np.hypot(*pb[:2]))
        area = phimax * rmax * (zmax - zmin)  # approximate (reference uses a series)
        return HYPERBOLOID, p, float(area)
    raise ValueError(f"unknown quadric {kind!r}")


# ---------------------------------------------------------------------------
# device-side intersection — one quadric vs whole wavefront
# ---------------------------------------------------------------------------

def _clip_phi(px, py, phimax):
    phi = jnp.arctan2(py, px)
    phi = jnp.where(phi < 0.0, phi + 2.0 * PI, phi)
    return phi, phi <= phimax + 1e-6


def intersect_quadric(qtype: int, qp, o, d, t_max):
    """Object-space intersect of one quadric (static type) against rays.

    o, d: [N,3] object-space ray; t_max: [N].
    Returns (hit [N], t [N], p [N,3] obj, n [N,3] obj, uv [N,2],
             dpdu [N,3], dpdv [N,3]).
    """
    ox, oy, oz = o[..., 0], o[..., 1], o[..., 2]
    dx, dy, dz = d[..., 0], d[..., 1], d[..., 2]

    if qtype == SPHERE:
        radius, zmin, zmax, phimax, theta_min, theta_max = (qp[i] for i in range(6))
        a = dot(d, d)
        b = 2.0 * dot(o, d)
        c = dot(o, o) - radius * radius
        has, t0, t1 = quadratic(a, b, c)

        def eval_at(t):
            p = o + d * t[..., None]
            # refine: project to sphere (pbrt refinement sphere.rs)
            p = p * (radius / jnp.maximum(vm.length(p), 1e-20))[..., None]
            pz = jnp.where(jnp.abs(p[..., 2]) >= radius, jnp.sign(p[..., 2]) * radius, p[..., 2])
            phi, phi_ok = _clip_phi(p[..., 0], p[..., 1], phimax)
            full = (zmin <= -radius + 1e-7) & (zmax >= radius - 1e-7) & (phimax >= 2 * PI - 1e-6)
            z_ok = (p[..., 2] >= zmin - 1e-6) & (p[..., 2] <= zmax + 1e-6)
            ok = jnp.where(full, jnp.ones_like(phi_ok), z_ok & phi_ok)
            return p, phi, ok

        p0, phi0, ok0 = eval_at(t0)
        p1, phi1, ok1 = eval_at(t1)
        use0 = has & (t0 > 1e-4) & (t0 < t_max) & ok0
        use1 = has & (t1 > 1e-4) & (t1 < t_max) & ok1 & ~use0
        hit = use0 | use1
        t = jnp.where(use0, t0, t1)
        p = jnp.where(use0[..., None], p0, p1)
        phi = jnp.where(use0, phi0, phi1)
        theta = jnp.arccos(jnp.clip(p[..., 2] / radius, -1.0, 1.0))
        u = phi / phimax
        dth = jnp.maximum(theta_max - theta_min, 1e-6)
        v = (theta - theta_min) / dth
        zr = jnp.sqrt(jnp.maximum(p[..., 0] ** 2 + p[..., 1] ** 2, 1e-20))
        inv_zr = 1.0 / zr
        cos_phi = p[..., 0] * inv_zr
        sin_phi = p[..., 1] * inv_zr
        dpdu = vec3(-phimax * p[..., 1], phimax * p[..., 0], jnp.zeros_like(u))
        dpdv = jnp.asarray(dth)[..., None] * vec3(p[..., 2] * cos_phi, p[..., 2] * sin_phi, -radius * jnp.sin(theta))
        n = normalize(p)
        p_err = vm.gamma_bound(5) * jnp.abs(p)
        return hit, t, p, n, jnp.stack([u, v], -1), dpdu, dpdv, p_err

    if qtype == CYLINDER:
        radius, zmin, zmax, phimax = (qp[i] for i in range(4))
        a = dx * dx + dy * dy
        b = 2.0 * (dx * ox + dy * oy)
        c = ox * ox + oy * oy - radius * radius
        has, t0, t1 = quadratic(a, b, c)

        def eval_at(t):
            p = o + d * t[..., None]
            hitrad = jnp.sqrt(jnp.maximum(p[..., 0] ** 2 + p[..., 1] ** 2, 1e-20))
            p = p.at[..., 0].mul(radius / hitrad).at[..., 1].mul(radius / hitrad)
            phi, phi_ok = _clip_phi(p[..., 0], p[..., 1], phimax)
            ok = (p[..., 2] >= zmin) & (p[..., 2] <= zmax) & phi_ok
            return p, phi, ok

        p0, phi0, ok0 = eval_at(t0)
        p1, phi1, ok1 = eval_at(t1)
        use0 = has & (t0 > 1e-4) & (t0 < t_max) & ok0
        use1 = has & (t1 > 1e-4) & (t1 < t_max) & ok1 & ~use0
        hit = use0 | use1
        t = jnp.where(use0, t0, t1)
        p = jnp.where(use0[..., None], p0, p1)
        phi = jnp.where(use0, phi0, phi1)
        u = phi / phimax
        v = (p[..., 2] - zmin) / jnp.maximum(zmax - zmin, 1e-9)
        dpdu = vec3(-phimax * p[..., 1], phimax * p[..., 0], jnp.zeros_like(u))
        dpdv = vec3(jnp.zeros_like(u), jnp.zeros_like(u), jnp.full_like(u, zmax - zmin))
        n = normalize(vec3(p[..., 0], p[..., 1], jnp.zeros_like(u)))
        p_err = vm.gamma_bound(3) * jnp.abs(vec3(p[..., 0], p[..., 1], jnp.zeros_like(u)))
        return hit, t, p, n, jnp.stack([u, v], -1), dpdu, dpdv, p_err

    if qtype == DISK:
        height, radius, inner_radius, phimax = (qp[i] for i in range(4))
        t = (height - oz) / jnp.where(jnp.abs(dz) < 1e-9, jnp.inf, dz)
        p = o + d * t[..., None]
        dist2 = p[..., 0] ** 2 + p[..., 1] ** 2
        phi, phi_ok = _clip_phi(p[..., 0], p[..., 1], phimax)
        hit = (jnp.abs(dz) > 1e-9) & (t > 1e-4) & (t < t_max) & \
            (dist2 <= radius * radius) & (dist2 >= inner_radius * inner_radius) & phi_ok
        r_hit = jnp.sqrt(jnp.maximum(dist2, 1e-20))
        u = phi / phimax
        one_minus_v = (r_hit - inner_radius) / jnp.maximum(radius - inner_radius, 1e-9)
        v = 1.0 - one_minus_v
        dpdu = vec3(-phimax * p[..., 1], phimax * p[..., 0], jnp.zeros_like(u))
        dpdv = vec3(p[..., 0], p[..., 1], jnp.zeros_like(u)) * \
            ((inner_radius - radius) / jnp.maximum(r_hit, 1e-9))[..., None]
        n = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], jnp.float32), p.shape)
        p = p.at[..., 2].set(height)
        p_err = jnp.zeros_like(p)
        return hit, t, p, n, jnp.stack([u, v], -1), dpdu, dpdv, p_err

    if qtype == CONE:
        radius, cheight, phimax = (qp[i] for i in range(3))
        k = (radius / cheight) ** 2
        a = dx * dx + dy * dy - k * dz * dz
        b = 2.0 * (dx * ox + dy * oy - k * dz * (oz - cheight))
        c = ox * ox + oy * oy - k * (oz - cheight) * (oz - cheight)
        has, t0, t1 = quadratic(a, b, c)

        def eval_at(t):
            p = o + d * t[..., None]
            phi, phi_ok = _clip_phi(p[..., 0], p[..., 1], phimax)
            ok = (p[..., 2] >= 0.0) & (p[..., 2] <= cheight) & phi_ok
            return p, phi, ok

        p0, phi0, ok0 = eval_at(t0)
        p1, phi1, ok1 = eval_at(t1)
        use0 = has & (t0 > 1e-4) & (t0 < t_max) & ok0
        use1 = has & (t1 > 1e-4) & (t1 < t_max) & ok1 & ~use0
        hit = use0 | use1
        t = jnp.where(use0, t0, t1)
        p = jnp.where(use0[..., None], p0, p1)
        phi = jnp.where(use0, phi0, phi1)
        u = phi / phimax
        v = p[..., 2] / cheight
        dpdu = vec3(-phimax * p[..., 1], phimax * p[..., 0], jnp.zeros_like(u))
        omv = jnp.maximum(1.0 - v, 1e-6)
        dpdv = vec3(-p[..., 0] / omv, -p[..., 1] / omv, jnp.full_like(u, cheight))
        n = normalize(cross(dpdu, dpdv))
        p_err = vm.gamma_bound(7) * jnp.abs(p)
        return hit, t, p, n, jnp.stack([u, v], -1), dpdu, dpdv, p_err

    if qtype == PARABOLOID:
        radius, zmin, zmax, phimax = (qp[i] for i in range(4))
        k = zmax / (radius * radius)
        a = k * (dx * dx + dy * dy)
        b = 2.0 * k * (dx * ox + dy * oy) - dz
        c = k * (ox * ox + oy * oy) - oz
        has, t0, t1 = quadratic(a, b, c)

        def eval_at(t):
            p = o + d * t[..., None]
            phi, phi_ok = _clip_phi(p[..., 0], p[..., 1], phimax)
            ok = (p[..., 2] >= zmin) & (p[..., 2] <= zmax) & phi_ok
            return p, phi, ok

        p0, phi0, ok0 = eval_at(t0)
        p1, phi1, ok1 = eval_at(t1)
        use0 = has & (t0 > 1e-4) & (t0 < t_max) & ok0
        use1 = has & (t1 > 1e-4) & (t1 < t_max) & ok1 & ~use0
        hit = use0 | use1
        t = jnp.where(use0, t0, t1)
        p = jnp.where(use0[..., None], p0, p1)
        phi = jnp.where(use0, phi0, phi1)
        u = phi / phimax
        v = (p[..., 2] - zmin) / jnp.maximum(zmax - zmin, 1e-9)
        dpdu = vec3(-phimax * p[..., 1], phimax * p[..., 0], jnp.zeros_like(u))
        pz = jnp.maximum(p[..., 2], 1e-6)
        dpdv = jnp.asarray(zmax - zmin)[..., None] * vec3(p[..., 0] / (2.0 * pz), p[..., 1] / (2.0 * pz),
                                                  jnp.ones_like(u))
        n = normalize(cross(dpdu, dpdv))
        p_err = vm.gamma_bound(7) * jnp.abs(p)
        return hit, t, p, n, jnp.stack([u, v], -1), dpdu, dpdv, p_err

    if qtype == HYPERBOLOID:
        # components accessed per-axis so this works for both a flat [8]
        # param vector and the per-lane [N] wrapper used by the scene pass
        p1x, p1y, p1z = qp[0], qp[1], qp[2]
        phimax = qp[3]
        p2x, p2y, p2z = qp[4], qp[5], qp[6]
        p1v = jnp.stack(jnp.broadcast_arrays(jnp.asarray(p1x, jnp.float32),
                                             jnp.asarray(p1y, jnp.float32),
                                             jnp.asarray(p1z, jnp.float32)), -1)
        p2v = jnp.stack(jnp.broadcast_arrays(jnp.asarray(p2x, jnp.float32),
                                             jnp.asarray(p2y, jnp.float32),
                                             jnp.asarray(p2z, jnp.float32)), -1)
        ah = qp[7]
        z2 = jnp.where(jnp.abs(p2z) < 1e-9, 1.0, p2z)
        ch = (ah * (p2x ** 2 + p2y ** 2) - 1.0) / (z2 * z2)
        zmin = jnp.minimum(p1z, p2z)
        zmax = jnp.maximum(p1z, p2z)
        a = ah * dx * dx + ah * dy * dy - ch * dz * dz
        b = 2.0 * (ah * dx * ox + ah * dy * oy - ch * dz * oz)
        c = ah * ox * ox + ah * oy * oy - ch * oz * oz - 1.0
        has, t0, t1 = quadratic(a, b, c)

        def eval_at(t):
            p = o + d * t[..., None]
            v = (p[..., 2] - p1z) / jnp.maximum(p2z - p1z, 1e-9)
            pr = (1.0 - v)[..., None] * p1v + v[..., None] * p2v
            phi = jnp.arctan2(pr[..., 0] * p[..., 1] - p[..., 0] * pr[..., 1],
                              p[..., 0] * pr[..., 0] + p[..., 1] * pr[..., 1])
            phi = jnp.where(phi < 0.0, phi + 2 * PI, phi)
            ok = (p[..., 2] >= zmin) & (p[..., 2] <= zmax) & (phi <= phimax)
            return p, phi, v, ok

        p0, phi0, v0, ok0 = eval_at(t0)
        p1_, phi1, v1, ok1 = eval_at(t1)
        use0 = has & (t0 > 1e-4) & (t0 < t_max) & ok0
        use1 = has & (t1 > 1e-4) & (t1 < t_max) & ok1 & ~use0
        hit = use0 | use1
        t = jnp.where(use0, t0, t1)
        p = jnp.where(use0[..., None], p0, p1_)
        phi = jnp.where(use0, phi0, phi1)
        v = jnp.where(use0, v0, v1)
        u = phi / phimax
        cos_phi, sin_phi = jnp.cos(phi), jnp.sin(phi)
        dpdu = vec3(-phimax * p[..., 1], phimax * p[..., 0], jnp.zeros_like(u))
        dxdv = p2x - p1x
        dydv = p2y - p1y
        dzdv = p2z - p1z
        dpdv = vec3(dxdv * cos_phi - dydv * sin_phi, dxdv * sin_phi + dydv * cos_phi,
                    jnp.full_like(u, dzdv))
        n = normalize(cross(dpdu, dpdv))
        p_err = vm.gamma_bound(7) * jnp.abs(p)
        return hit, t, p, n, jnp.stack([u, v], -1), dpdu, dpdv, p_err

    raise ValueError(qtype)


def quadric_object_bounds(qtype: int, qp) -> tuple:
    """Host-side conservative object bounds."""
    qp = np.asarray(qp)
    if qtype == SPHERE:
        r = qp[0]
        return np.array([-r, -r, qp[1]]), np.array([r, r, qp[2]])
    if qtype == CYLINDER:
        r = qp[0]
        return np.array([-r, -r, qp[1]]), np.array([r, r, qp[2]])
    if qtype == DISK:
        h, r = qp[0], qp[1]
        return np.array([-r, -r, h - 1e-4]), np.array([r, r, h + 1e-4])
    if qtype == CONE:
        r, h = qp[0], qp[1]
        return np.array([-r, -r, 0.0]), np.array([r, r, h])
    if qtype == PARABOLOID:
        r = qp[0]
        return np.array([-r, -r, qp[1]]), np.array([r, r, qp[2]])
    if qtype == HYPERBOLOID:
        p1, p2 = qp[0:3], qp[4:7]
        rmax = max(np.hypot(p1[0], p1[1]), np.hypot(p2[0], p2[1]))
        zmin, zmax = min(p1[2], p2[2]), max(p1[2], p2[2])
        return np.array([-rmax, -rmax, zmin]), np.array([rmax, rmax, zmax])
    raise ValueError(qtype)


def tessellate_quadric(qtype: int, qp, o2w: np.ndarray,
                       nu: int = 64, nv: int = 32,
                       flip_normal: bool = False) -> np.ndarray:
    """Host-side parametric tessellation of a quadric surface to world-space
    triangles [T, 3, 3]. Used to give quadric AREA LIGHTS an exact
    uniform-by-area sampling path (the reference samples quadric emitters
    analytically per shape — shapes/src/sphere.rs sample / disk.rs sample;
    the TPU build samples a dense tessellation through one shared triangle
    CDF, keeping light sampling a single gather kernel for every emitter).

    Vertices are pushed OUTWARD along the surface normal by the measured
    facet sag so the tessellation circumscribes the analytic surface —
    otherwise every shadow ray toward an (inscribed, hence interior) sample
    point would first hit the quadric itself and the emitter self-shadows.

    The (u, v) grids follow each shape's intersect() parameterization, so
    partial sweeps (zmin/zmax/phimax) tessellate exactly the emitting region.
    """
    qp = np.asarray(qp, np.float64)

    if qtype == SPHERE:
        r, zmin, zmax, phimax = qp[0], qp[1], qp[2], qp[3]
        tmin = np.arccos(np.clip(zmax / r, -1, 1))
        tmax = np.arccos(np.clip(zmin / r, -1, 1))

        def eval_p(U, V):
            phi = U * phimax
            theta = tmin + V * (tmax - tmin)
            st = np.sin(theta)
            return np.stack([r * st * np.cos(phi), r * st * np.sin(phi),
                             r * np.cos(theta)], -1)
    elif qtype == CYLINDER:
        r, zmin, zmax, phimax = qp[0], qp[1], qp[2], qp[3]

        def eval_p(U, V):
            phi = U * phimax
            return np.stack([r * np.cos(phi), r * np.sin(phi),
                             zmin + V * (zmax - zmin)], -1)
    elif qtype == DISK:
        h, r, ir, phimax = qp[0], qp[1], qp[2], qp[3]

        def eval_p(U, V):
            phi = U * phimax
            rad = np.sqrt(ir * ir + V * (r * r - ir * ir))
            return np.stack([rad * np.cos(phi), rad * np.sin(phi),
                             np.full_like(phi, h)], -1)
    elif qtype == CONE:
        r, h, phimax = qp[0], qp[1], qp[2]

        def eval_p(U, V):
            phi = U * phimax
            return np.stack([r * (1 - V) * np.cos(phi),
                             r * (1 - V) * np.sin(phi), V * h], -1)
    elif qtype == PARABOLOID:
        r, zmin, zmax, phimax = qp[0], qp[1], qp[2], qp[3]

        def eval_p(U, V):
            phi = U * phimax
            z = zmin + V * (zmax - zmin)
            rad = r * np.sqrt(np.maximum(z / max(zmax, 1e-12), 0.0))
            return np.stack([rad * np.cos(phi), rad * np.sin(phi), z], -1)
    elif qtype == HYPERBOLOID:
        p1, p2, phimax = qp[0:3], qp[4:7], qp[3]

        def eval_p(U, V):
            phi = U * phimax
            x = (1 - V) * p1[0] + V * p2[0]
            y = (1 - V) * p1[1] + V * p2[1]
            z = (1 - V) * p1[2] + V * p2[2]
            return np.stack([x * np.cos(phi) - y * np.sin(phi),
                             x * np.sin(phi) + y * np.cos(phi), z], -1)
    else:
        raise ValueError(qtype)

    uu = np.linspace(0.0, 1.0, nu + 1)
    vv = np.linspace(0.0, 1.0, nv + 1)
    U, V = np.meshgrid(uu, vv, indexing="ij")      # [nu+1, nv+1]
    P = eval_p(U, V)

    # facet sag: distance from the true surface at each facet center to the
    # facet corner average; max over the grid is how far inside the surface
    # any point of the inscribed tessellation can lie
    Um, Vm = np.meshgrid(0.5 * (uu[:-1] + uu[1:]), 0.5 * (vv[:-1] + vv[1:]),
                         indexing="ij")
    Pm = eval_p(Um, Vm)
    corner_avg = 0.25 * (P[:-1, :-1] + P[1:, :-1] + P[1:, 1:] + P[:-1, 1:])
    sag = float(np.linalg.norm(Pm - corner_avg, axis=-1).max())

    # per-shape OUTWARD reference direction (object space): the sphere is
    # radial from the origin, the disk faces +z (shapes/src/disk.rs normal),
    # every axial sweep has a positive radial normal component
    if qtype == SPHERE:
        ref_dir = P.copy()
    elif qtype == DISK:
        ref_dir = np.zeros_like(P)
        ref_dir[..., 2] = 1.0
    else:
        ref_dir = P.copy()
        ref_dir[..., 2] = 0.0

    if sag > 0.0:
        # outward vertex normals from parametric partials (numeric), oriented
        # by the per-shape outward reference
        hstep = 1e-4
        du = eval_p(np.clip(U + hstep, 0, 1), V) - eval_p(np.clip(U - hstep, 0, 1), V)
        dv = eval_p(U, np.clip(V + hstep, 0, 1)) - eval_p(U, np.clip(V - hstep, 0, 1))
        nrm = np.cross(du, dv)
        nlen = np.linalg.norm(nrm, axis=-1, keepdims=True)
        rlen = np.linalg.norm(ref_dir, axis=-1, keepdims=True)
        # degenerate partials (sphere poles): fall back to the reference dir
        nrm = np.where(nlen > 1e-9, nrm / np.maximum(nlen, 1e-30),
                       ref_dir / np.maximum(rlen, 1e-30))
        sgn = np.sign(np.sum(nrm * ref_dir, -1, keepdims=True))
        sgn = np.where(np.abs(sgn) < 0.5, 1.0, sgn)
        P = P + nrm * sgn * (1.001 * sag)

    m = np.asarray(o2w, np.float64)
    Pw = P @ m[:3, :3].T + m[:3, 3]
    ref_w = ref_dir @ m[:3, :3].T          # normals transform ~ok for rigid+scale
    a, ra = Pw[:-1, :-1], ref_w[:-1, :-1]
    b = Pw[1:, :-1]
    c, rc = Pw[1:, 1:], ref_w[1:, 1:]
    d = Pw[:-1, 1:]
    t1 = np.stack([a, b, c], -2).reshape(-1, 3, 3)
    t2 = np.stack([a, c, d], -2).reshape(-1, 3, 3)
    tris = np.concatenate([t1, t2], 0)
    refs = np.concatenate([ra.reshape(-1, 3), rc.reshape(-1, 3)], 0)
    # orient winding so cross(p1-p0, p2-p0) is the emission side: outward,
    # XOR reverse-orientation (diffuse.rs uses the shape normal; the
    # one-sided `emits` test in lights/_sample_area reads this winding)
    fn = np.cross(tris[:, 1] - tris[:, 0], tris[:, 2] - tris[:, 0])
    want_neg = (np.sum(fn * refs, -1) < 0.0) ^ bool(flip_normal)
    tris[want_neg] = tris[want_neg][:, ::-1]
    tris = tris.astype(np.float32)
    # drop degenerate slivers (poles, inner radius 0)
    e1 = tris[:, 1] - tris[:, 0]
    e2 = tris[:, 2] - tris[:, 0]
    area2 = np.linalg.norm(np.cross(e1, e2), axis=-1)
    return tris[area2 > 1e-12]
