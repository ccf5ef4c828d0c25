"""BVH build (host) -> flattened nodes (device) + wavefront traversal.

Reference: accelerators/src/bvh/ (SAH/HLBVH builders, LinearBVHNode flatten,
64-entry stack traversal bvh/mod.rs:173-203). TPU re-design:

  * BUILD runs on the host in numpy at scene-compile time, Morton-order
    (HLBVH-style) with SAH-binned splits at the top: geometry is static per
    scene, so build cost is off the device critical path.
  * The FLATTENED layout is the same depth-first "left child = next index"
    array the reference uses — it is already the ideal gather-friendly form.
  * TRAVERSAL is wavefront-synchronous: every active ray pops its own stack
    entry each iteration of one `lax.while_loop`; all lanes share the
    iteration count (SIMT-style divergence -> masking). Per-ray stacks live
    in a [N, DEPTH] register array.

The kd-tree accelerator lives in accel/kdtree.py (native C++ SAH build +
its own lockstep traversal), selected by `Accelerator "kdtree"`.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

MAX_LEAF_PRIMS = 8
TRAVERSAL_STACK = 64


class BVH(NamedTuple):
    """Flattened BVH as device arrays (pytree).

    `packed` is the traversal-optimized mirror: one 16-f32 record per node
    [child_l lo(3) hi(3), child_r lo(3) hi(3), right/count/offset/axis as
    bitcast i32] so each while-loop iteration gathers ONE contiguous row
    instead of ~8 separate arrays (HBM gather latency dominates traversal)."""
    bounds_lo: jnp.ndarray    # [M, 3]
    bounds_hi: jnp.ndarray    # [M, 3]
    right_child: jnp.ndarray  # [M] int32: index of second child (interior)
    prim_offset: jnp.ndarray  # [M] int32: first prim (leaf), -1 for interior
    prim_count: jnp.ndarray   # [M] int32
    axis: jnp.ndarray         # [M] int32 split axis
    prim_order: jnp.ndarray   # [T] int32: bvh leaf order -> original prim id
    packed: jnp.ndarray       # [M, 16] f32 (see above)

    @property
    def n_nodes(self):
        return self.bounds_lo.shape[0]


def _pack_nodes(b_lo, b_hi, right, offs, cnts, axis_arr):
    """Build the single-gather node records (host numpy)."""
    M = b_lo.shape[0]
    rec = np.zeros((M, 16), np.float32)
    interior = cnts == 0
    left = np.arange(M) + 1
    l = np.where(interior, np.minimum(left, M - 1), 0)
    r = np.where(interior, np.maximum(right, 0), 0)
    rec[:, 0:3] = b_lo[l]
    rec[:, 3:6] = b_hi[l]
    rec[:, 6:9] = b_lo[r]
    rec[:, 9:12] = b_hi[r]
    ints = np.stack([right, cnts, offs, axis_arr], -1).astype(np.int32)
    rec[:, 12:16] = ints.view(np.float32)
    return rec


def _morton3(x):
    """Interleave bits of [N,3] uint32 (10 bits each) -> [N] uint32."""
    def expand(v):
        v = v.astype(np.uint64)
        v = (v | (v << 16)) & np.uint64(0x030000FF)
        v = (v | (v << 8)) & np.uint64(0x0300F00F)
        v = (v | (v << 4)) & np.uint64(0x030C30C3)
        v = (v | (v << 2)) & np.uint64(0x09249249)
        return v
    return expand(x[:, 0]) | (expand(x[:, 1]) << np.uint64(1)) | (expand(x[:, 2]) << np.uint64(2))


SPLIT_IDS = {"sah": 0, "hlbvh": 1, "middle": 2, "equal": 3, "equalcounts": 3}


class HostBVH(NamedTuple):
    """Numpy mirror of BVH (same field names). Consumers that re-pack the
    tree on the host (pack_pallas_bvh, slot-attribute tables) read THIS
    instead of the device BVH: a device->host transfer permanently degrades
    the axon tunnel's per-call dispatch latency ~50x (measured r4), so the
    build path must never read device arrays back."""
    bounds_lo: np.ndarray
    bounds_hi: np.ndarray
    right_child: np.ndarray
    prim_offset: np.ndarray
    prim_count: np.ndarray
    axis: np.ndarray
    prim_order: np.ndarray
    packed: np.ndarray


def _to_device(h: HostBVH) -> BVH:
    return BVH(*(jnp.asarray(v) for v in h))


def build_bvh(prim_lo: np.ndarray, prim_hi: np.ndarray,
              leaf_size: int = MAX_LEAF_PRIMS,
              split_method: str = "sah", with_host: bool = False):
    """Build from per-primitive world bounds ([T,3] lo/hi) on the host.

    Prefers the native C++ builder (pbrt_tpu/native/bvh_builder.cpp) which
    implements all 4 reference split modes (binned SAH / HLBVH / middle /
    equal-counts, accelerators/src/bvh/common.rs:27-37); falls back to the
    numpy Morton builder below when no compiler is available.

    with_host=True additionally returns the HostBVH numpy mirror (see
    above) as (BVH, HostBVH).
    """
    host = _build_bvh_native(prim_lo, prim_hi, leaf_size, split_method)
    if host is None:
        host = _build_bvh_numpy(prim_lo, prim_hi, leaf_size)
    dev = _to_device(host)
    if with_host:
        return dev, host
    return dev


def _build_bvh_numpy(prim_lo, prim_hi, leaf_size) -> HostBVH:
    T = prim_lo.shape[0]
    assert T > 0
    cent = 0.5 * (prim_lo + prim_hi)
    lo = cent.min(0)
    hi = cent.max(0)
    extent = np.maximum(hi - lo, 1e-12)
    q = np.clip(((cent - lo) / extent * 1023.0), 0, 1023).astype(np.uint32)
    morton = _morton3(q)
    order = np.argsort(morton, kind="stable").astype(np.int32)
    m_sorted = morton[order]
    lo_s = prim_lo[order]
    hi_s = prim_hi[order]

    # cumulative bounds for O(1) range bounds queries
    # (prefix/suffix mins over sorted prims)
    n_est = 2 * T
    b_lo = np.empty((2 * n_est, 3), np.float32)
    b_hi = np.empty((2 * n_est, 3), np.float32)
    right = np.full(2 * n_est, -1, np.int32)
    offs = np.full(2 * n_est, -1, np.int32)
    cnts = np.zeros(2 * n_est, np.int32)
    axis_arr = np.zeros(2 * n_est, np.int32)
    next_node = [0]

    import sys
    sys.setrecursionlimit(100000)

    def split_range(s, e, bit):
        """Find split position by highest differing morton bit, else midpoint."""
        while bit >= 0:
            mask = np.uint64(1) << np.uint64(bit)
            first = m_sorted[s] & mask
            if (m_sorted[e - 1] & mask) != first:
                # binary search first index with the bit set
                loi, hii = s, e - 1
                while loi + 1 < hii:
                    mid = (loi + hii) // 2
                    if (m_sorted[mid] & mask) == first:
                        loi = mid
                    else:
                        hii = mid
                return hii, bit - 1
            bit -= 1
        return (s + e) // 2, -1

    def emit(s, e, bit):
        node = next_node[0]
        next_node[0] += 1
        b_lo[node] = lo_s[s:e].min(0)
        b_hi[node] = hi_s[s:e].max(0)
        if e - s <= leaf_size:
            offs[node] = s
            cnts[node] = e - s
            return node
        mid, nbit = split_range(s, e, bit)
        diag = b_hi[node] - b_lo[node]
        axis_arr[node] = int(np.argmax(diag))
        emit(s, mid, nbit)
        right[node] = emit(mid, e, nbit)
        return node

    emit(0, T, 29)
    M = next_node[0]
    rec = _pack_nodes(b_lo[:M], b_hi[:M], right[:M], offs[:M], cnts[:M],
                      axis_arr[:M])
    return HostBVH(b_lo[:M], b_hi[:M], right[:M], offs[:M], cnts[:M],
                   axis_arr[:M], order, rec)


def _build_bvh_native(prim_lo, prim_hi, leaf_size, split_method):
    from pbrt_tpu import native
    import ctypes
    fn = native.bvh_builder()
    if fn is None:
        return None
    T = int(prim_lo.shape[0])
    lo = np.ascontiguousarray(prim_lo, np.float32)
    hi = np.ascontiguousarray(prim_hi, np.float32)
    cap = max(2 * T, 2)
    b_lo = np.empty((cap, 3), np.float32)
    b_hi = np.empty((cap, 3), np.float32)
    right = np.empty(cap, np.int32)
    offs = np.empty(cap, np.int32)
    cnts = np.empty(cap, np.int32)
    ax = np.empty(cap, np.int32)
    order = np.empty(T, np.int32)
    fp = ctypes.POINTER(ctypes.c_float)
    ip = ctypes.POINTER(ctypes.c_int32)
    m = fn(lo.ctypes.data_as(fp), hi.ctypes.data_as(fp), T, leaf_size,
           SPLIT_IDS.get(split_method, 0),
           b_lo.ctypes.data_as(fp), b_hi.ctypes.data_as(fp),
           right.ctypes.data_as(ip), offs.ctypes.data_as(ip),
           cnts.ctypes.data_as(ip), ax.ctypes.data_as(ip),
           order.ctypes.data_as(ip))
    if m <= 0:
        return None
    rec = _pack_nodes(b_lo[:m], b_hi[:m], right[:m], offs[:m], cnts[:m], ax[:m])
    return HostBVH(b_lo[:m].copy(), b_hi[:m].copy(), right[:m].copy(),
                   offs[:m].copy(), cnts[:m].copy(), ax[:m].copy(),
                   order, rec)


def world_bounds(bvh: BVH):
    return np.asarray(bvh.bounds_lo[0]), np.asarray(bvh.bounds_hi[0])
