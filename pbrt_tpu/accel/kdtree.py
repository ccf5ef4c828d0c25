"""SAH kd-tree accelerator: native C++ build + lockstep wavefront traversal.

Reference: accelerators/src/kd_tree/mod.rs (SAH build with isect_cost=80,
traversal_cost=1, empty_bonus=0.5; packed KdAccelNode; todo-stack traversal).
TPU re-design: the build runs host-side in C++ (pbrt_tpu/native/
kdtree_builder.cpp); traversal walks ALL rays in lockstep through one
`lax.while_loop` — each lane carries (node, tmin, tmax) plus a private
todo-stack of (node, tmin, tmax) triples, processing one node per iteration
with masked leaf tests, exactly the reference's control flow flattened into
data flow. Selected by `Accelerator "kdtree"` in the scene file.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from pbrt_tpu.shapes.triangle import intersect_tri

KD_LEAF_CHUNK = 4   # masked prim tests per lockstep iteration
MAX_KD_LEAF = 1     # SAH leaf threshold (kd_tree default max_prims=1)
KD_STACK = 64


class KdTree(NamedTuple):
    flags: jnp.ndarray        # [M] int32: 0..2 split axis, 3 = leaf
    split_pos: jnp.ndarray    # [M] f32
    above_child: jnp.ndarray  # [M] int32 (below child = node + 1)
    prim_offset: jnp.ndarray  # [M] int32 into prim_indices
    prim_count: jnp.ndarray   # [M] int32
    prim_indices: jnp.ndarray  # [P'] int32 (prims may appear in many leaves)
    world_lo: jnp.ndarray     # [3]
    world_hi: jnp.ndarray     # [3]

    @property
    def n_nodes(self):
        return self.flags.shape[0]


def build_kdtree(prim_lo: np.ndarray, prim_hi: np.ndarray,
                 max_leaf: int = MAX_KD_LEAF):
    """Host build via the native C++ builder; None when unavailable (caller
    falls back to the BVH)."""
    import ctypes
    from pbrt_tpu import native
    lib = native.load("kdtree_builder")
    if lib is None:
        return None
    fn = lib.pbrt_kdtree_build
    fp = ctypes.POINTER(ctypes.c_float)
    ip = ctypes.POINTER(ctypes.c_int32)
    fn.argtypes = [fp, fp, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                   ctypes.c_int, ip, fp, ip, ip, ip, ip, ip, fp]
    fn.restype = ctypes.c_int
    T = int(prim_lo.shape[0])
    lo = np.ascontiguousarray(prim_lo, np.float32)
    hi = np.ascontiguousarray(prim_hi, np.float32)
    cap_nodes = max(16 * T, 512)
    cap_idx = max(16 * T, 512)
    for _ in range(3):  # retry with larger caps on overflow
        flags = np.empty(cap_nodes, np.int32)
        split = np.empty(cap_nodes, np.float32)
        above = np.empty(cap_nodes, np.int32)
        offs = np.empty(cap_nodes, np.int32)
        cnts = np.empty(cap_nodes, np.int32)
        idx = np.empty(cap_idx, np.int32)
        nidx = np.zeros(1, np.int32)
        wb = np.zeros(6, np.float32)
        m = fn(lo.ctypes.data_as(fp), hi.ctypes.data_as(fp), T, max_leaf,
               cap_nodes, cap_idx, flags.ctypes.data_as(ip),
               split.ctypes.data_as(fp), above.ctypes.data_as(ip),
               offs.ctypes.data_as(ip), cnts.ctypes.data_as(ip),
               idx.ctypes.data_as(ip), nidx.ctypes.data_as(ip),
               wb.ctypes.data_as(fp))
        if m == -2:
            cap_nodes *= 4
            cap_idx *= 4
            continue
        if m <= 0:
            return None
        return KdTree(jnp.asarray(flags[:m]), jnp.asarray(split[:m]),
                      jnp.asarray(above[:m]), jnp.asarray(offs[:m]),
                      jnp.asarray(cnts[:m]), jnp.asarray(idx[:int(nidx[0])]),
                      jnp.asarray(wb[:3]), jnp.asarray(wb[3:]))
    return None


def intersect_kdtree(kd: KdTree, tri_p0, tri_p1, tri_p2, o, d, t_max,
                     any_hit: bool = False):
    """Closest-hit (or any-hit) against the kd-tree. Mirrors the reference's
    todo-stack walk (kd_tree/mod.rs intersect): one node per lane per
    lax.while_loop iteration."""
    from pbrt_tpu.accel.traverse import TriHit
    N = o.shape[0]
    lanes = jnp.arange(N)
    inv_d = 1.0 / jnp.where(jnp.abs(d) < 1e-20,
                            jnp.where(d < 0, -1e-20, 1e-20), d)

    # clip to world bounds
    t0 = (kd.world_lo[None, :] - o) * inv_d
    t1 = (kd.world_hi[None, :] - o) * inv_d
    tn = jnp.minimum(t0, t1)
    tf = jnp.maximum(t0, t1)
    tmin0 = jnp.maximum(jnp.max(tn, -1), 0.0)
    tmax0 = jnp.min(tf, -1) * 1.00000024
    t_best0 = jnp.asarray(t_max, jnp.float32) + (o[:, 0] + d[:, 0]) * 0.0
    tmax0 = jnp.minimum(tmax0, t_best0)
    alive0 = tmin0 <= tmax0

    zf = (o[:, 0] + d[:, 0]) * 0.0
    zi = zf.astype(jnp.int32)
    # pre-gather triangles into leaf-list order once (contiguous leaf tests)
    tp0s = tri_p0[kd.prim_indices]
    tp1s = tri_p1[kd.prim_indices]
    tp2s = tri_p2[kd.prim_indices]
    state = dict(
        node=zi, tmin=tmin0, tmax=tmax0, sp=zi, active=alive0, cursor=zi,
        stack_n=jnp.broadcast_to(zi[:, None], (N, KD_STACK)),
        stack_t0=jnp.broadcast_to(zf[:, None], (N, KD_STACK)),
        stack_t1=jnp.broadcast_to(zf[:, None], (N, KD_STACK)),
        t_best=t_best0, tri_best=zi - 1, b1=zf, b2=zf)

    def cond(s):
        return jnp.any(s["active"])

    def body(s):
        node = s["node"]
        act = s["active"]
        fl = kd.flags[node]
        behind = s["tmin"] > s["t_best"]  # node interval past the best hit
        is_leaf = (fl == 3) & act & ~behind
        interior = act & ~is_leaf & ~behind

        t_best, tri_best, b1b, b2b = s["t_best"], s["tri_best"], s["b1"], s["b2"]
        # ---- leaf: KD_LEAF_CHUNK masked prim tests; big leaves continue
        # next iteration via the per-lane cursor ----
        offs = kd.prim_offset[node]
        cnt = kd.prim_count[node]
        cursor = s["cursor"]
        for i in range(KD_LEAF_CHUNK):
            j = cursor + i
            valid = is_leaf & (j < cnt)
            sidx = jnp.where(valid, offs + j, 0)
            hit, t, b0, b1, b2 = intersect_tri(tp0s[sidx], tp1s[sidx],
                                               tp2s[sidx], o, d, t_best)
            closer = valid & hit
            t_best = jnp.where(closer, t, t_best)
            tri_best = jnp.where(closer, sidx, tri_best)
            b1b = jnp.where(closer, b1, b1b)
            b2b = jnp.where(closer, b2, b2b)
        cursor_new = cursor + KD_LEAF_CHUNK
        leaf_done = is_leaf & (cursor_new >= cnt)

        # ---- interior: step to near child, maybe push far child ----
        ax = jnp.clip(fl, 0, 2)
        o_ax = jnp.take_along_axis(o, ax[:, None], -1)[:, 0]
        inv_ax = jnp.take_along_axis(inv_d, ax[:, None], -1)[:, 0]
        d_ax = jnp.take_along_axis(d, ax[:, None], -1)[:, 0]
        split = kd.split_pos[node]
        t_plane = (split - o_ax) * inv_ax
        below_first = (o_ax < split) | ((o_ax == split) & (d_ax <= 0.0))
        below = node + 1
        above = kd.above_child[node]
        first = jnp.where(below_first, below, above)
        second = jnp.where(below_first, above, below)
        only_first = (t_plane > s["tmax"]) | (t_plane <= 0.0)
        # the reference's if/elif gives only_first priority when both hold
        # (t_plane <= 0 can coincide with t_plane < tmin)
        only_second = (t_plane < s["tmin"]) & ~only_first
        push = interior & ~only_first & ~only_second

        sp = s["sp"]
        widx = jnp.where(push, sp, KD_STACK)
        stack_n = s["stack_n"].at[lanes, widx].set(second, mode="drop")
        stack_t0 = s["stack_t0"].at[lanes, widx].set(
            jnp.maximum(t_plane, s["tmin"]), mode="drop")
        stack_t1 = s["stack_t1"].at[lanes, widx].set(s["tmax"], mode="drop")
        sp = sp + push.astype(jnp.int32)

        node_i = jnp.where(only_second, second, first)
        tmax_i = jnp.where(push, t_plane, s["tmax"])

        # ---- pop for lanes that finished a leaf / skipped a behind node ----
        need_pop = (leaf_done | (act & behind))
        if any_hit:
            done_hit = tri_best >= 0
            need_pop = need_pop & ~done_hit
            act = act & ~(done_hit & (is_leaf | behind))
        can_pop = need_pop & (sp > 0)
        spm1 = jnp.maximum(sp - 1, 0)
        node_p = s["stack_n"][lanes, spm1]
        tmin_p = s["stack_t0"][lanes, spm1]
        tmax_p = s["stack_t1"][lanes, spm1]
        sp = jnp.where(can_pop, spm1, sp)
        active = act & ~(need_pop & ~can_pop)

        node = jnp.where(can_pop, node_p, jnp.where(interior, node_i, node))
        tmin = jnp.where(can_pop, tmin_p, s["tmin"])
        tmax = jnp.where(can_pop, tmax_p, jnp.where(interior, tmax_i, s["tmax"]))
        cursor = jnp.where(is_leaf & ~leaf_done, cursor_new, 0)
        return dict(node=node, tmin=tmin, tmax=tmax, sp=sp, active=active,
                    cursor=cursor, stack_n=stack_n, stack_t0=stack_t0,
                    stack_t1=stack_t1, t_best=t_best, tri_best=tri_best,
                    b1=b1b, b2=b2b)

    s = jax.lax.while_loop(cond, body, state)
    # map leaf-list indices back to original triangle ids
    tri = jnp.where(s["tri_best"] >= 0,
                    kd.prim_indices[jnp.maximum(s["tri_best"], 0)], -1)
    return TriHit(s["t_best"], tri, s["b1"], s["b2"])
