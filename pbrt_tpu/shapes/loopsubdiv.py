"""Loop subdivision surfaces -> triangle mesh (host side).

Reference: shapes/src/loopsubdiv.rs (winged-edge SDVertex/SDEdge/SDFace).
Here: a compact numpy implementation — per level, one new vertex per edge,
Loop vertex masks for old/new vertices, with boundary handling. The output
feeds the shared triangle SoA like every other mesh shape (TPU design keeps
ONE geometry backend: triangles through the BVH).
"""
from __future__ import annotations

import numpy as np


def loop_subdivide(verts: np.ndarray, faces: np.ndarray, levels: int):
    """Returns (vertices [V',3], faces [F',3], limit normals [V',3])."""
    v = np.asarray(verts, np.float64)
    f = np.asarray(faces, np.int64)
    for _ in range(max(0, int(levels))):
        v, f = _subdivide_once(v, f)
    n = _vertex_normals(v, f)
    return v.astype(np.float32), f.astype(np.int32), n.astype(np.float32)


def _edge_key(a, b):
    return np.minimum(a, b).astype(np.int64) * (1 << 32) + np.maximum(a, b)


def _subdivide_once(v, f):
    nv = v.shape[0]
    e01 = _edge_key(f[:, 0], f[:, 1])
    e12 = _edge_key(f[:, 1], f[:, 2])
    e20 = _edge_key(f[:, 2], f[:, 0])
    all_edges = np.concatenate([e01, e12, e20])
    uniq, inv, counts = np.unique(all_edges, return_inverse=True, return_counts=True)
    n_edges = uniq.shape[0]
    boundary_edge = counts == 1

    # edge endpoints
    ea = (uniq >> 32).astype(np.int64)
    eb = (uniq & 0xFFFFFFFF).astype(np.int64)

    # opposite vertices per edge (sum of the third vertex of adjacent faces)
    thirds = np.concatenate([f[:, 2], f[:, 0], f[:, 1]])
    opp_sum = np.zeros(n_edges)
    np.add.at(opp_sum, inv, 0.0)
    opp_accum = np.zeros((n_edges, 3))
    np.add.at(opp_accum, inv, v[thirds])

    # new edge vertices: interior 3/8(a+b) + 1/8(c+d); boundary 1/2(a+b)
    mid = 0.5 * (v[ea] + v[eb])
    interior = (3.0 / 8.0) * (v[ea] + v[eb]) + (1.0 / 8.0) * opp_accum
    edge_verts = np.where(boundary_edge[:, None], mid, interior)

    # old vertex update
    valence = np.zeros(nv, np.int64)
    neigh_sum = np.zeros((nv, 3))
    # each unique edge contributes each endpoint to the other's neighborhood
    np.add.at(valence, ea, 1)
    np.add.at(valence, eb, 1)
    np.add.at(neigh_sum, ea, v[eb])
    np.add.at(neigh_sum, eb, v[ea])
    # boundary vertices: only boundary-edge neighbors, weight 1/8 each + 3/4 self
    b_valence = np.zeros(nv, np.int64)
    b_sum = np.zeros((nv, 3))
    bea, beb = ea[boundary_edge], eb[boundary_edge]
    np.add.at(b_valence, bea, 1)
    np.add.at(b_valence, beb, 1)
    np.add.at(b_sum, bea, v[beb])
    np.add.at(b_sum, beb, v[bea])
    is_boundary_v = b_valence > 0

    val = np.maximum(valence, 1)
    beta = np.where(val == 3, 3.0 / 16.0, 3.0 / (8.0 * val))
    interior_new = v * (1.0 - val * beta)[:, None] + beta[:, None] * neigh_sum
    boundary_new = 0.75 * v + 0.125 * b_sum
    v_new_old = np.where(is_boundary_v[:, None], boundary_new, interior_new)

    new_v = np.concatenate([v_new_old, edge_verts])
    # face split: each face -> 4
    i01 = nv + inv[:len(f)]
    i12 = nv + inv[len(f):2 * len(f)]
    i20 = nv + inv[2 * len(f):]
    f0 = np.stack([f[:, 0], i01, i20], -1)
    f1 = np.stack([f[:, 1], i12, i01], -1)
    f2 = np.stack([f[:, 2], i20, i12], -1)
    f3 = np.stack([i01, i12, i20], -1)
    new_f = np.concatenate([f0, f1, f2, f3])
    return new_v, new_f


def _vertex_normals(v, f):
    fn = np.cross(v[f[:, 1]] - v[f[:, 0]], v[f[:, 2]] - v[f[:, 0]])
    n = np.zeros_like(v)
    np.add.at(n, f[:, 0], fn)
    np.add.at(n, f[:, 1], fn)
    np.add.at(n, f[:, 2], fn)
    ln = np.linalg.norm(n, axis=-1, keepdims=True)
    return n / np.maximum(ln, 1e-12)
