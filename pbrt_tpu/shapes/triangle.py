"""Triangle meshes: host-side SoA build + device watertight intersection.

Reference: shapes/src/triangle.rs (TriangleMesh SoA :27-55, watertight
intersect). The TPU design keeps ONE global triangle SoA for the whole scene
(vertices pre-transformed to world space, exactly like the reference bakes
object_to_world at mesh build) so the BVH leaf loop gathers from flat arrays.

Intersection is pbrt's watertight ray-triangle test (translate/permute/shear
to ray space, signed edge functions) — branch-free and vectorized over
(rays x leaf-triangles).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np
import jax.numpy as jnp

from pbrt_tpu.core import math as vm
from pbrt_tpu.core.math import vec3, cross, dot, normalize


@dataclasses.dataclass
class TriangleMeshData:
    """Host mesh container (world-space vertices)."""
    indices: np.ndarray             # [T, 3] int32
    p: np.ndarray                   # [V, 3] f32 world space
    n: Optional[np.ndarray] = None  # [V, 3]
    s: Optional[np.ndarray] = None  # [V, 3]
    uv: Optional[np.ndarray] = None  # [V, 2]
    alpha_tex: int = -1             # texture id for alpha mask
    shadow_alpha_tex: int = -1      # texture id for shadow-ray alpha mask
    reverse_orientation: bool = False
    transform_swaps_handedness: bool = False

    @property
    def n_triangles(self):
        return self.indices.shape[0]


def mesh_from_params(params: dict, object_to_world) -> TriangleMeshData:
    """Build from a 'trianglemesh' ParamSet (shapes/src/triangle.rs from_props)."""
    indices = np.asarray(params["indices"], np.int32).reshape(-1, 3)
    p = np.asarray(params["P"], np.float32).reshape(-1, 3)
    p = object_to_world.point(p)
    n = params.get("N")
    if n is not None:
        n = object_to_world.normal(np.asarray(n, np.float32).reshape(-1, 3))
    s = params.get("S")
    if s is not None:
        s = object_to_world.vector(np.asarray(s, np.float32).reshape(-1, 3))
    uv = params.get("uv", params.get("st"))
    if uv is not None:
        uv = np.asarray(uv, np.float32).reshape(-1, 2)
    return TriangleMeshData(indices, np.asarray(p, np.float32),
                            None if n is None else np.asarray(n, np.float32),
                            None if s is None else np.asarray(s, np.float32),
                            uv,
                            transform_swaps_handedness=object_to_world.swaps_handedness())


# ---------------------------------------------------------------------------
# device-side watertight intersection
# ---------------------------------------------------------------------------

def intersect_tri(p0, p1, p2, o, d, t_max):
    """Watertight ray-triangle test (triangle.rs intersect).

    All args broadcast: p0/p1/p2 [..., 3] vs rays o/d [..., 3].
    Returns (hit, t, b0, b1, b2).
    """
    # translate vertices to ray origin
    p0t = p0 - o
    p1t = p1 - o
    p2t = p2 - o
    # permute so |dz| is max
    kz = vm.max_dimension(jnp.abs(d))
    kx = (kz + 1) % 3
    ky = (kx + 1) % 3

    def pick(v, k):
        return jnp.take_along_axis(v, k[..., None], axis=-1)[..., 0]

    dx, dy, dz = pick(d, kx), pick(d, ky), pick(d, kz)
    sz = 1.0 / jnp.where(dz == 0.0, 1e-20, dz)
    sx = -dx * sz
    sy = -dy * sz

    def shear(p):
        px, py, pz = pick(p, kx), pick(p, ky), pick(p, kz)
        return px + sx * pz, py + sy * pz, pz * sz

    x0, y0, z0 = shear(p0t)
    x1, y1, z1 = shear(p1t)
    x2, y2, z2 = shear(p2t)

    e0 = x1 * y2 - y1 * x2
    e1 = x2 * y0 - y2 * x0
    e2 = x0 * y1 - y0 * x1
    # f64 fallback of the reference replaced by difference-of-products
    e0 = vm.diff_of_products(x1, y2, y1, x2)
    e1 = vm.diff_of_products(x2, y0, y2, x0)
    e2 = vm.diff_of_products(x0, y1, y0, x1)

    same_sign = ((e0 >= 0) & (e1 >= 0) & (e2 >= 0)) | ((e0 <= 0) & (e1 <= 0) & (e2 <= 0))
    det = e0 + e1 + e2
    t_scaled = e0 * z0 + e1 * z1 + e2 * z2
    pos_det = det > 0
    t_ok = jnp.where(pos_det, (t_scaled > 1e-4 * det) & (t_scaled < t_max * det),
                     (t_scaled < 1e-4 * det) & (t_scaled > t_max * det))
    hit = same_sign & (det != 0.0) & t_ok
    inv_det = 1.0 / jnp.where(det == 0.0, 1e-20, det)
    t = t_scaled * inv_det
    b0 = e0 * inv_det
    b1 = e1 * inv_det
    b2 = e2 * inv_det
    return hit, t, b0, b1, b2


def triangle_shading(tri_idx, b0, b1, b2, tp0, tp1, tp2, tn, ts, tuv, wo):
    """Compute the surface frame for hits (p, ng, ns, ss, uv, dpdu, dpdv).

    tp*: gathered vertex positions [N,3]; tn/ts: optional gathered shading
    normals/tangents ([N,3,3] per-vertex) or None; tuv: [N,3,2] uvs.
    Mirrors Triangle::intersect's shading-geometry section.
    """
    p = b0[..., None] * tp0 + b1[..., None] * tp1 + b2[..., None] * tp2
    uv0, uv1, uv2 = tuv[..., 0, :], tuv[..., 1, :], tuv[..., 2, :]
    uv = b0[..., None] * uv0 + b1[..., None] * uv1 + b2[..., None] * uv2
    # dpdu/dpdv from uv parameterization
    duv02 = uv0 - uv2
    duv12 = uv1 - uv2
    dp02 = tp0 - tp2
    dp12 = tp1 - tp2
    det = duv02[..., 0] * duv12[..., 1] - duv02[..., 1] * duv12[..., 0]
    degenerate = jnp.abs(det) < 1e-12
    inv_det = 1.0 / jnp.where(degenerate, 1.0, det)
    dpdu = (duv12[..., 1:2] * dp02 - duv02[..., 1:2] * dp12) * inv_det[..., None]
    dpdv = (-duv12[..., 0:1] * dp02 + duv02[..., 0:1] * dp12) * inv_det[..., None]
    ng = normalize(cross(dp02, dp12))
    # degenerate uv: build arbitrary frame around ng
    t1, t2 = vm.coordinate_system(ng)
    dpdu = jnp.where(degenerate[..., None], t1, dpdu)
    dpdv = jnp.where(degenerate[..., None], t2, dpdv)
    if tn is not None:
        ns = normalize(b0[..., None] * tn[..., 0, :] + b1[..., None] * tn[..., 1, :]
                       + b2[..., None] * tn[..., 2, :])
        bad = vm.length_squared(ns) < 1e-12
        ns = jnp.where(bad[..., None], ng, ns)
        ng = vm.face_forward(ng, ns)
    else:
        ns = ng
    err = vm.gamma_bound(7) * (jnp.abs(b0[..., None] * tp0) + jnp.abs(b1[..., None] * tp1)
                               + jnp.abs(b2[..., None] * tp2))
    return p, ng, ns, uv, dpdu, dpdv, err


# ---------------------------------------------------------------------------
# host helpers: procedural meshes for tests/benchmarks (no PLY assets ship
# with the reference, so the bunny-class benchmark mesh is generated)
# ---------------------------------------------------------------------------

def make_sphere_mesh(n_theta=64, n_phi=128, radius=1.0):
    th = np.linspace(0, np.pi, n_theta)
    ph = np.linspace(0, 2 * np.pi, n_phi, endpoint=False)
    T, P = np.meshgrid(th, ph, indexing="ij")
    x = radius * np.sin(T) * np.cos(P)
    y = radius * np.sin(T) * np.sin(P)
    z = radius * np.cos(T)
    verts = np.stack([x, y, z], -1).reshape(-1, 3).astype(np.float32)
    idx = []
    for i in range(n_theta - 1):
        for j in range(n_phi):
            a = i * n_phi + j
            b = i * n_phi + (j + 1) % n_phi
            c = (i + 1) * n_phi + j
            dd = (i + 1) * n_phi + (j + 1) % n_phi
            idx.append([a, b, c])
            idx.append([b, dd, c])
    normals = verts / radius
    return TriangleMeshData(np.asarray(idx, np.int32), verts, normals.astype(np.float32))


def make_knot_mesh(n_u=256, n_v=48, scale=1.0):
    """Trefoil-knot tube: a bunny-scale benchmark mesh (~n_u*n_v*2 tris)."""
    u = np.linspace(0, 2 * np.pi, n_u, endpoint=False)
    cx = np.stack([np.sin(u) + 2 * np.sin(2 * u),
                   np.cos(u) - 2 * np.cos(2 * u),
                   -np.sin(3 * u)], -1)
    # frame along curve
    t = np.gradient(cx, axis=0)
    t /= np.linalg.norm(t, axis=-1, keepdims=True)
    ref = np.array([0.0, 0.0, 1.0])
    b = np.cross(t, ref)
    b /= np.maximum(np.linalg.norm(b, axis=-1, keepdims=True), 1e-9)
    n = np.cross(b, t)
    v = np.linspace(0, 2 * np.pi, n_v, endpoint=False)
    r = 0.4
    verts = (cx[:, None, :] + r * (np.cos(v)[None, :, None] * n[:, None, :]
                                   + np.sin(v)[None, :, None] * b[:, None, :]))
    verts = (verts * scale).reshape(-1, 3).astype(np.float32)
    idx = []
    for i in range(n_u):
        for j in range(n_v):
            a = i * n_v + j
            bq = i * n_v + (j + 1) % n_v
            c = ((i + 1) % n_u) * n_v + j
            d = ((i + 1) % n_u) * n_v + (j + 1) % n_v
            idx.append([a, bq, c])
            idx.append([bq, d, c])
    return TriangleMeshData(np.asarray(idx, np.int32), verts)
