"""Wavefront-synchronous BVH traversal under jit.

The reference walks the flattened BVH with a per-thread 64-entry node stack
(accelerators/src/bvh/mod.rs:173-203). Here ALL rays advance in lockstep:
one `lax.while_loop` iteration pops one node per ray (per-ray stacks in a
[N, DEPTH] array), tests children boxes / leaf triangles fully vectorized,
and masks finished lanes. The loop runs until every lane's stack empties —
XLA sees static shapes; divergence costs masked lanes, not compilation.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from pbrt_tpu.accel.bvh import BVH, MAX_LEAF_PRIMS, TRAVERSAL_STACK
from pbrt_tpu.shapes.triangle import intersect_tri


def _slab(lo, hi, o, inv_d, t_best):
    """Ray-AABB test; returns (hit, t_near)."""
    t0 = (lo - o) * inv_d
    t1 = (hi - o) * inv_d
    tn = jnp.minimum(t0, t1)
    tf = jnp.maximum(t0, t1)
    t_near = jnp.max(tn, axis=-1)
    t_far = jnp.min(tf, axis=-1) * 1.00000024  # pbrt robustness factor
    hit = (t_near <= t_far) & (t_far > 0.0) & (t_near < t_best)
    return hit, t_near


class TriHit(NamedTuple):
    t: jnp.ndarray        # [N]
    tri: jnp.ndarray      # [N] original triangle id, -1 = miss
    b1: jnp.ndarray       # [N]
    b2: jnp.ndarray       # [N]
    # leaf-slot id from the Pallas kernel (-1 = miss); indexes the packed
    # slot_attr attribute table directly, skipping the slot->tri-id order
    # gather on the hot path. None for CPU/bruteforce traversals.
    slot: jnp.ndarray | None = None


def intersect_bvh(bvh: BVH, tri_p0, tri_p1, tri_p2, o, d, t_max,
                  any_hit: bool = False) -> TriHit:
    """Closest-hit (or any-hit) of rays against the triangle BVH.

    tri_p0/1/2: [T, 3] vertices in ORIGINAL prim order (gathered through
    bvh.prim_order). o, d: [N, 3]; t_max: [N].
    """
    N = o.shape[0]
    lanes = jnp.arange(N)
    inv_d = 1.0 / jnp.where(jnp.abs(d) < 1e-20, jnp.where(d < 0, -1e-20, 1e-20), d)
    neg_dir = (d < 0.0)  # [N,3]

    # every while-carry component derives from the (possibly sharded) ray
    # inputs so its sharding "varying" type is consistent under shard_map
    # (o alone is not enough: a pinhole camera's origins are replicated
    # constants — directions always vary per pixel)
    # (t_max is excluded: inf * 0 = NaN)
    zero_f = (o[:, 0] + d[:, 0]) * 0.0
    zero_i = zero_f.astype(jnp.int32)
    stack = jnp.broadcast_to(zero_i[:, None], (N, TRAVERSAL_STACK))
    sp = zero_i + 1  # root pre-pushed at slot 0

    t_best = jnp.asarray(t_max, jnp.float32) + zero_f
    tri_best = zero_i - 1
    b1_best = zero_f
    b2_best = zero_f

    # pre-gather triangles into BVH leaf order ONCE (O(T), outside the loop):
    # leaf tests then index contiguously (offset+i) — one coalesced gather per
    # test instead of the order[sidx] double indirection per lane per iter
    order = bvh.prim_order
    tp0s = tri_p0[order]
    tp1s = tri_p1[order]
    tp2s = tri_p2[order]

    def cond(state):
        sp = state[1]
        return jnp.any(sp > 0)

    def body(state):
        stack, sp, t_best, tri_best, b1_best, b2_best = state
        active = sp > 0
        spm1 = jnp.maximum(sp - 1, 0)
        node = stack[lanes, spm1]
        sp = jnp.where(active, spm1, sp)

        # ONE gather: the packed node record carries both children's bounds
        # plus (right, count, offset, axis) — see bvh.py _pack_nodes
        rec = bvh.packed[node]                     # [N, 16]
        ints = jax.lax.bitcast_convert_type(rec[:, 12:16], jnp.int32)
        rchild = ints[:, 0]
        count = ints[:, 1]
        offset = ints[:, 2]
        ax = ints[:, 3]
        is_leaf = count > 0
        leaf_active = active & is_leaf

        # ---- leaf: test up to MAX_LEAF_PRIMS triangles ----
        for i in range(MAX_LEAF_PRIMS):
            valid = leaf_active & (i < count)
            sidx = jnp.where(valid, offset + i, 0)
            hit, t, b0, b1, b2 = intersect_tri(tp0s[sidx], tp1s[sidx],
                                               tp2s[sidx], o, d, t_best)
            closer = valid & hit
            t_best = jnp.where(closer, t, t_best)
            tri_best = jnp.where(closer, sidx, tri_best)
            b1_best = jnp.where(closer, b1, b1_best)
            b2_best = jnp.where(closer, b2, b2_best)

        # ---- interior: test both children, push far then near ----
        int_active = active & ~is_leaf
        left = node + 1
        hit_l, _ = _slab(rec[:, 0:3], rec[:, 3:6], o, inv_d, t_best)
        hit_r, _ = _slab(rec[:, 6:9], rec[:, 9:12], o, inv_d, t_best)
        hit_l = hit_l & int_active
        hit_r = hit_r & int_active
        # near child: left unless ray dir negative along split axis
        swap = jnp.take_along_axis(neg_dir, ax[:, None], axis=-1)[:, 0]
        near = jnp.where(swap, rchild, left)
        far = jnp.where(swap, left, rchild)
        hit_near = jnp.where(swap, hit_r, hit_l)
        hit_far = jnp.where(swap, hit_l, hit_r)

        # push far first (popped second)
        idx = jnp.where(hit_far, sp, TRAVERSAL_STACK)
        stack = stack.at[lanes, idx].set(far, mode="drop")
        sp = sp + hit_far.astype(jnp.int32)
        idx = jnp.where(hit_near, sp, TRAVERSAL_STACK)
        stack = stack.at[lanes, idx].set(near, mode="drop")
        sp = sp + hit_near.astype(jnp.int32)

        if any_hit:
            sp = jnp.where(tri_best >= 0, 0, sp)
        return stack, sp, t_best, tri_best, b1_best, b2_best

    state = (stack, sp, t_best, tri_best, b1_best, b2_best)
    # rays with no chance at the root: clear their stacks up front
    hit_root, _ = _slab(bvh.bounds_lo[0], bvh.bounds_hi[0], o, inv_d, t_best)
    state = (stack, jnp.where(hit_root, sp, 0), t_best, tri_best, b1_best, b2_best)
    stack, sp, t_best, tri_best, b1_best, b2_best = jax.lax.while_loop(cond, body, state)
    # tri_best carries SORTED indices inside the loop; map back to original
    tri_best = jnp.where(tri_best >= 0, order[jnp.maximum(tri_best, 0)], -1)
    return TriHit(t_best, tri_best, b1_best, b2_best)


# NOTE: the XLA packet-traversal variant that lived here (one stack per
# 128-ray packet, lax.while_loop) is superseded by the Pallas kernel in
# accel/pallas_traverse.py, which implements the same packet design inside
# one kernel at ~100x the speed; it was removed as dead code (ADVICE r1).


def intersect_bruteforce(tri_p0, tri_p1, tri_p2, o, d, t_max) -> TriHit:
    """All-pairs reference path for tiny scenes / correctness tests."""
    T = tri_p0.shape[0]
    # derive every carry from the ray inputs so its sharding "varying" type
    # is consistent under shard_map (see intersect_bvh above)
    zero_f = (o[:, 0] + d[:, 0]) * 0.0
    zero_i = zero_f.astype(jnp.int32)
    t_best = jnp.asarray(t_max, jnp.float32) + zero_f
    tri_best = zero_i - 1
    b1_best = zero_f
    b2_best = zero_f

    def body(i, st):
        t_best, tri_best, b1_best, b2_best = st
        hit, t, b0, b1, b2 = intersect_tri(tri_p0[i], tri_p1[i], tri_p2[i], o, d, t_best)
        t_best = jnp.where(hit, t, t_best)
        tri_best = jnp.where(hit, i, tri_best)
        b1_best = jnp.where(hit, b1, b1_best)
        b2_best = jnp.where(hit, b2, b2_best)
        return t_best, tri_best, b1_best, b2_best

    t_best, tri_best, b1_best, b2_best = jax.lax.fori_loop(
        0, T, body, (t_best, tri_best, b1_best, b2_best))
    return TriHit(t_best, tri_best, b1_best, b2_best)
