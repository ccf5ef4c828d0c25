"""Bézier curves (flat / ribbon / cylinder).

Reference: shapes/src/curve.rs (recursive-splitting analytic intersect).
TPU re-design: curves are tessellated at scene-compile time into the shared
triangle SoA — the analytic per-ray recursive split of the reference is a
deeply divergent control-flow pattern that maps poorly onto lockstep lanes,
while tessellated triangles ride the same BVH/intersect kernels as all other
geometry at full rate. Tessellation density scales with curve width/length.
"""
from __future__ import annotations

import numpy as np

from pbrt_tpu.shapes.triangle import TriangleMeshData


def _bezier_eval(cp, u):
    """cp: [4,3]; u: [n] -> points [n,3], tangents [n,3]."""
    u = u[:, None]
    a = (1 - u) ** 3 * cp[0] + 3 * (1 - u) ** 2 * u * cp[1] \
        + 3 * (1 - u) * u ** 2 * cp[2] + u ** 3 * cp[3]
    d = 3 * (1 - u) ** 2 * (cp[1] - cp[0]) + 6 * (1 - u) * u * (cp[2] - cp[1]) \
        + 3 * u ** 2 * (cp[3] - cp[2])
    return a, d


def tessellate_curve(cp, width0, width1, curve_type="cylinder", normals=None,
                     n_seg=32, n_rad=8):
    """One cubic Bézier segment -> (verts, faces, vnormals|None)."""
    u = np.linspace(0.0, 1.0, n_seg + 1)
    p, t = _bezier_eval(np.asarray(cp, np.float64), u)
    t /= np.maximum(np.linalg.norm(t, axis=-1, keepdims=True), 1e-12)
    w = (1 - u) * width0 + u * width1

    if curve_type in ("flat", "ribbon"):
        # ribbon: sweep a line segment of width w perpendicular to tangent
        if normals is not None and curve_type == "ribbon":
            n0, n1 = np.asarray(normals, np.float64)
            # slerp normals along the curve
            dotn = np.clip(np.dot(n0, n1), -1, 1)
            th = np.arccos(dotn)
            if th < 1e-6:
                nrm = np.tile(n0, (len(u), 1))
            else:
                nrm = (np.sin((1 - u)[:, None] * th) * n0 + np.sin(u[:, None] * th) * n1) / np.sin(th)
            side = np.cross(t, nrm)
        else:
            ref = np.array([0.0, 0.0, 1.0])
            side = np.cross(t, ref)
            bad = np.linalg.norm(side, axis=-1) < 1e-6
            side[bad] = np.cross(t[bad], np.array([1.0, 0.0, 0.0]))
        side /= np.maximum(np.linalg.norm(side, axis=-1, keepdims=True), 1e-12)
        v0 = p - 0.5 * w[:, None] * side
        v1 = p + 0.5 * w[:, None] * side
        verts = np.concatenate([v0, v1])
        n = len(u)
        faces = []
        for i in range(n - 1):
            faces.append([i, i + 1, n + i])
            faces.append([i + 1, n + i + 1, n + i])
        return verts.astype(np.float32), np.asarray(faces, np.int32), None

    # cylinder: circular sweep
    ref = np.array([0.0, 0.0, 1.0])
    b = np.cross(t, ref)
    bad = np.linalg.norm(b, axis=-1) < 1e-6
    b[bad] = np.cross(t[bad], np.array([1.0, 0.0, 0.0]))
    b /= np.maximum(np.linalg.norm(b, axis=-1, keepdims=True), 1e-12)
    nvec = np.cross(b, t)
    ang = np.linspace(0, 2 * np.pi, n_rad, endpoint=False)
    ring = (np.cos(ang)[None, :, None] * nvec[:, None, :]
            + np.sin(ang)[None, :, None] * b[:, None, :])
    verts = (p[:, None, :] + 0.5 * w[:, None, None] * ring).reshape(-1, 3)
    vnorm = ring.reshape(-1, 3)
    faces = []
    n_ring = n_rad
    for i in range(len(u) - 1):
        for j in range(n_rad):
            a0 = i * n_ring + j
            a1 = i * n_ring + (j + 1) % n_rad
            b0 = (i + 1) * n_ring + j
            b1 = (i + 1) * n_ring + (j + 1) % n_rad
            faces.append([a0, a1, b0])
            faces.append([a1, b1, b0])
    return verts.astype(np.float32), np.asarray(faces, np.int32), vnorm.astype(np.float32)


def curve_records(ps, o2w):
    from pbrt_tpu.scene.api import ShapeRecord
    cp = ps.find_point3s("P")
    ctype = ps.find_one_string("type", "flat")
    w0 = ps.find_one_float("width0", ps.find_one_float("width", 1.0))
    w1 = ps.find_one_float("width1", ps.find_one_float("width", 1.0))
    degree = 3
    normals = ps.find_point3s("N")
    recs = []
    n_segments = (cp.shape[0] - 1) // degree
    for s in range(max(1, n_segments)):
        seg = cp[s * degree: s * degree + 4]
        if seg.shape[0] < 4:
            break
        us, ue = s / max(n_segments, 1), (s + 1) / max(n_segments, 1)
        ws = (1 - us) * w0 + us * w1
        we = (1 - ue) * w0 + ue * w1
        v, f, n = tessellate_curve(seg, ws, we, ctype,
                                   normals if normals is not None else None)
        mesh = TriangleMeshData(f, np.asarray(o2w.point(v), np.float32),
                                None if n is None else np.asarray(o2w.normal(n), np.float32))
        recs.append(ShapeRecord("trianglemesh", mesh=mesh))
    return recs
