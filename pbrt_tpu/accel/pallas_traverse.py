"""Pallas TPU BVH traversal kernel — the renderer's hot inner loop.

Why a kernel: XLA `while_loop` iterations cost ~80us each on TPU (fixed
loop overhead, tools/bench_micro.py) and one-row HBM gathers cost
40-700us — a per-ray lockstep traversal (accel/traverse.py) runs ~500
iterations => ~500ms per 16K-ray wavefront. Inside one Pallas kernel the
same loop is a *hardware* loop over VMEM-resident tables: zero
per-iteration dispatch, node fetch is a dynamic VMEM slice + lane roll.

Design (reference walk: accelerators/src/bvh/mod.rs:173-203 — one 64-deep
node stack per CPU thread):

  * rays are processed in blocks of ROWS x 128 (one grid step each);
  * each of the ROWS sublane-rows is an independent 128-ray PACKET with
    its own traversal stack in SMEM — a packet shares one node sequence,
    so table traffic per iteration is ROWS records for ROWS*128 rays;
  * node bounds are packed 8-per-row in a [ceil(M/8), 128] f32 VMEM
    table (16 lanes per node: both children's bounds); fetch = dynamic
    sublane slice + dynamic pltpu.roll + static lane slice;
  * node int metadata (right-child, count, leaf-block, axis) is packed
    32-per-row in a [ceil(M/32), 128] i32 VMEM table; the 4 scalars are
    extracted by a roll into a VMEM scratch row and 4 static scalar
    reads (Mosaic has no vector->scalar move; static-index VMEM scalar
    reads are the supported path);
  * leaf triangles are re-packed 4-aligned: each leaf owns a 64-lane
    half-row of a [ceil(L/2), 128] table (4 triangles x 16 lanes), so a
    leaf's whole primitive list is one slice — no per-triangle gathers.

The triangle test is the same watertight translate/permute/shear test as
shapes/triangle.py::intersect_tri (triangle.rs), with identical epsilons
so per-ray / packet / Pallas paths agree bit-for-bit on hits.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from pbrt_tpu.accel.bvh import BVH
from pbrt_tpu.accel.traverse import TriHit

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS = 8            # ray rows per grid step (=> ROWS*128 rays / step)
LANES = 128
STACK = 64          # per-packet stack depth (bvh/mod.rs: 64)


LEAF_TRIS = 8       # triangles per leaf block (one full 128-lane row)


class PallasBVH(NamedTuple):
    """Kernel-layout mirror of a BVH (pytree of device arrays)."""
    nodes: jnp.ndarray   # [ceil(M/8), 128] f32 — 8 nodes/row x 16 lanes
    meta: jnp.ndarray    # [ceil(M/32), 128] i32 — 32 nodes/row x 4 lanes
    tris: jnp.ndarray    # [L, 128] f32 — one 8-tri leaf block per row
    order: jnp.ndarray   # [L*8] i32 — leaf slot -> original tri id (-1 pad)
    wlo: jnp.ndarray     # [3] world bounds (ray-sort key normalization)
    whi: jnp.ndarray     # [3]
    metas: jnp.ndarray   # [M] i32 — packed ax|cnt<<2|payload<<6 (SMEM path)
    # occluder seed: the 8 largest-area triangles, tested once per block
    # BEFORE the walk to seed t_best — rays that hit dominant geometry
    # (ground planes, walls) then slab-prune every farther subtree. One
    # extra leaf-test per block; identical results (revisits of the same
    # tri fail the strict t< test).
    seed: jnp.ndarray       # [1, 128] f32 — 8 tris x 16 lanes
    seed_slots: jnp.ndarray  # [16] i32 — slot id per seed tri; [8] = count
    # ---- 4-wide collapse (None on trees too small / too big for SMEM) ----
    # A BVH4 node groups a BVH2 internal node's up-to-4 grandchildren: the
    # intermediate level's boxes are never slab-tested, halving internal
    # box tests and nearly halving walk iterations (bvh/mod.rs stays
    # 2-wide; this is a TPU scheduling choice, not a reference structure).
    nodes4: jnp.ndarray = None  # [ceil(M4/4), 128] f32 — 4 slots x 6 bounds
    meta4: jnp.ndarray = None   # [4*M4] i32 — per-slot push word (see pack)
    axs4: jnp.ndarray = None    # [M4] i32 — a0 | a1<<2 | a2<<4 split axes

    @property
    def vmem_bytes(self) -> int:
        return (self.nodes.size + self.meta.size + self.tris.size) * 4


# node metadata lives in SMEM (pure scalar pop: one packed-word read +
# shifts) when the node count fits; beyond that fall back to the VMEM
# roll + scratch extraction. 32k nodes = 128 KB of SMEM.
SMEM_META_MAX = 1 << 15


def pack_pallas_bvh(bvh, tri_p0, tri_p1, tri_p2):
    """Host-side re-pack of a built BVH + original-order triangles.

    Returns (PallasBVH, leaf_order) where leaf_order is the HOST numpy
    slot->tri map (also stored device-side as PallasBVH.order). Pass the
    HostBVH numpy mirror, not the device BVH: reading device arrays back
    here would poison the axon tunnel's dispatch latency (accel/bvh.py).
    """
    packed = np.asarray(bvh.packed)
    cnts = np.asarray(bvh.prim_count)
    offs = np.asarray(bvh.prim_offset)
    right = np.asarray(bvh.right_child)
    axis = np.asarray(bvh.axis)
    order = np.asarray(bvh.prim_order)
    p0 = np.asarray(tri_p0)[order]
    p1 = np.asarray(tri_p1)[order]
    p2 = np.asarray(tri_p2)[order]
    M = packed.shape[0]

    # node bounds table: 12 bounds floats per node (lanes 12:16 unused)
    rows = -(-M // 8)
    nodes = np.zeros((rows * 8, 16), np.float32)
    nodes[:M, :12] = packed[:, :12]
    nodes = nodes.reshape(rows, 128)

    # leaf blocks: one full 128-lane row each, 16 lanes per triangle
    leaf_ids = np.nonzero(cnts > 0)[0]
    L = max(len(leaf_ids), 1)
    blocks = np.zeros((L, LEAF_TRIS, 16), np.float32)
    new_order = np.full(L * LEAF_TRIS, -1, np.int32)
    mrows = -(-M // 32)
    meta = np.zeros((mrows * 32, 4), np.int32)
    meta[:M, 0] = right
    meta[:M, 3] = axis
    cs = np.minimum(cnts[leaf_ids], LEAF_TRIS)
    starts = offs[leaf_ids]
    for b in range(len(leaf_ids)):
        c = int(cs[b])
        s = int(starts[b])
        blocks[b, :c, 0:3] = p0[s:s + c]
        blocks[b, :c, 3:6] = p1[s:s + c]
        blocks[b, :c, 6:9] = p2[s:s + c]
        new_order[b * LEAF_TRIS:b * LEAF_TRIS + c] = order[s:s + c]
    meta[leaf_ids, 1] = cs
    meta[leaf_ids, 2] = np.arange(len(leaf_ids), dtype=np.int32)
    tris = blocks.reshape(L, 128)
    wlo = np.minimum(packed[0, 0:3], packed[0, 6:9])
    whi = np.maximum(packed[0, 3:6], packed[0, 9:12])
    # packed scalar word per node: ax(2) | cnt(4) | payload(26) where the
    # payload is right-child for internal nodes, leaf block id for leaves
    assert M < (1 << 26) and L < (1 << 26), "payload field overflow"
    payload = np.where(meta[:M, 1] > 0, meta[:M, 2], meta[:M, 0])
    metas = (meta[:M, 3] | (meta[:M, 1] << 2) | (payload << 6)).astype(np.int32)

    # occluder seed block: 8 largest-area tris + their leaf-slot ids
    area = 0.5 * np.linalg.norm(np.cross(p1 - p0, p2 - p0), axis=-1)
    T = p0.shape[0]
    k = min(8, T)
    top = np.argsort(-area, kind="stable")[:k]      # leaf-order tri indices
    slot_of = np.full(T, -1, np.int32)
    valid = new_order >= 0
    # new_order maps slot -> ORIGINAL id; seed tris are in leaf order, so
    # map leaf-order index -> slot via the original id
    orig_of_leaf = order                              # leaf idx -> orig id
    slot_of_orig = np.full(int(order.max()) + 1, -1, np.int32)
    slot_of_orig[new_order[valid]] = np.nonzero(valid)[0]
    seed = np.zeros((8, 16), np.float32)
    seed_slots = np.full(16, -1, np.int32)
    for j in range(k):
        li = int(top[j])
        seed[j, 0:3] = p0[li]
        seed[j, 3:6] = p1[li]
        seed[j, 6:9] = p2[li]
        seed_slots[j] = slot_of_orig[orig_of_leaf[li]]
    seed_slots[8] = k
    blockid = np.full(M, -1, np.int64)
    blockid[leaf_ids] = np.arange(len(leaf_ids))
    four = _pack_bvh4(packed, cnts, right, axis, blockid)
    n4, m4, a4 = four if four is not None else (None, None, None)
    return PallasBVH(jnp.asarray(nodes), jnp.asarray(meta.reshape(mrows, 128)),
                     jnp.asarray(tris), jnp.asarray(new_order),
                     jnp.asarray(wlo), jnp.asarray(whi),
                     jnp.asarray(metas), jnp.asarray(seed.reshape(1, 128)),
                     jnp.asarray(seed_slots), n4, m4, a4), new_order


SMEM4_MAX_WORDS = 36864   # meta4 (4*M4) + axs4 (M4) SMEM word budget
# empty-slot box = NaN bounds: every slab comparison with NaN is false, so
# the slot can never vote a push. (An INVERTED lo>hi box does NOT work: the
# slab's per-axis min/max normalization turns it into an infinite box.)
_EMPTY_B = float("nan")
LEAF_TAG = 1 << 30        # stack-entry tag: leaf block (cnt in bits 26-29)


def _pack_bvh4(packed, cnts, right, axis, blockid):
    """Collapse the 2-wide tree into 4-wide nodes (host, numpy).

    Each BVH4 node is built from a BVH2 internal node i: for each child c,
    if c is a leaf it contributes ONE slot (c's box, tested at this level
    exactly as BVH2 would); if c is internal it contributes c's TWO
    children as slots (their boxes from packed[c]) and c's own box is
    never tested. Slot words are the exact stack entries the kernel
    pushes: internal -> BVH4 id, leaf -> LEAF_TAG | cnt<<26 | block.
    Returns (nodes4 [R4,128] f32, meta4 [4*M4] i32, axs4 [M4] i32) or None
    when the tree is trivial."""
    M = packed.shape[0]
    if M < 8 or cnts[0] > 0:
        return None
    from collections import deque
    ids = {0: 0}
    order = [0]
    q = deque([0])
    boxes = []      # [M4, 4, 6]
    words = []      # [M4, 4]
    axws = []       # [M4]
    empty_box = np.full(6, _EMPTY_B, np.float32)

    def slot_of(g, gbox):
        if cnts[g] > 0:
            w = LEAF_TAG | (int(min(cnts[g], LEAF_TRIS)) << 26) \
                | int(blockid[g])
            return w, gbox
        if g not in ids:
            ids[g] = len(order)
            order.append(g)
            q.append(g)
        return ids[g], gbox

    while q:
        i = q.popleft()
        sw = [0, 0, 0, 0]
        sb = [empty_box] * 4
        a = [int(axis[i]), 0, 0]
        for side, c in ((0, i + 1), (1, int(right[i]))):
            cbox = packed[i, side * 6:side * 6 + 6]
            if cnts[c] > 0:
                sw[side * 2], sb[side * 2] = slot_of(c, cbox)
            else:
                a[1 + side] = int(axis[c])
                for s2, g in ((0, c + 1), (1, int(right[c]))):
                    gbox = packed[c, s2 * 6:s2 * 6 + 6]
                    sw[side * 2 + s2], sb[side * 2 + s2] = slot_of(g, gbox)
        boxes.append(sb)
        words.append(sw)
        axws.append(a[0] | (a[1] << 2) | (a[2] << 4))

    M4 = len(order)
    assert M4 < (1 << 26), "BVH4 id overflow"
    if 5 * M4 > SMEM4_MAX_WORDS:
        return None
    rows4 = -(-M4 // 4)
    nodes4 = np.zeros((rows4 * 4, 32), np.float32)
    nodes4[:, :24] = _EMPTY_B
    nodes4[:M4, :24] = np.asarray(boxes, np.float32).reshape(M4, 24)
    meta4 = np.asarray(words, np.int32).reshape(-1)
    axs4 = np.asarray(axws, np.int32)
    return (jnp.asarray(nodes4.reshape(rows4, 128)), jnp.asarray(meta4),
            jnp.asarray(axs4))


def _pick(ax_, ay_, az_, k):
    """Select per-lane component by axis index k (0/1/2)."""
    return jnp.where(k == 0, ax_, jnp.where(k == 1, ay_, az_))


def _kernel(meta_ref, nodes_ref, tris_ref,
            ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tm_ref,
            t_out, tri_out, b1_out, b2_out, it_out,
            stack_ref, sp_ref, mscr_ref, *, any_hit: bool, rows: int,
            smem_meta: bool = False, pops: int = 1,
            dbg_skip_leaf: bool = False, dbg_push_all: bool = False):
    f32 = jnp.float32
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    tm = tm_ref[:]

    tiny = f32(1e-20)
    inv_dx = 1.0 / jnp.where(jnp.abs(dx) < tiny, jnp.where(dx < 0, -tiny, tiny), dx)
    inv_dy = 1.0 / jnp.where(jnp.abs(dy) < tiny, jnp.where(dy < 0, -tiny, tiny), dy)
    inv_dz = 1.0 / jnp.where(jnp.abs(dz) < tiny, jnp.where(dz < 0, -tiny, tiny), dz)

    # watertight permutation constants (per ray, loop-invariant)
    adx, ady, adz = jnp.abs(dx), jnp.abs(dy), jnp.abs(dz)
    kz = jnp.where((adx >= ady) & (adx >= adz), 0, jnp.where(ady >= adz, 1, 2))
    kx = (kz + 1) % 3
    ky = (kx + 1) % 3
    dpz = _pick(dx, dy, dz, kz)
    dpx = _pick(dx, dy, dz, kx)
    dpy = _pick(dx, dy, dz, ky)
    sz = 1.0 / jnp.where(dpz == 0.0, tiny, dpz)
    sx = -dpx * sz
    sy = -dpy * sz

    # per-row near/far vote is loop-invariant: majority direction sign per
    # axis, staged once into VMEM scratch and read back as scalars — the
    # old in-loop per-row full-width sums cost ~24 cross-lane reductions
    # per iteration
    negi_x = jnp.where(dx < 0.0, 1, 0)
    negi_y = jnp.where(dy < 0.0, 1, 0)
    negi_z = jnp.where(dz < 0.0, 1, 0)
    mscr_ref[:, 0:1] = jnp.sum(negi_x, axis=1, keepdims=True)
    mscr_ref[:, 1:2] = jnp.sum(negi_y, axis=1, keepdims=True)
    mscr_ref[:, 2:3] = jnp.sum(negi_z, axis=1, keepdims=True)
    swap_axis = [[mscr_ref[s, a] * 2 > LANES for a in range(3)]
                 for s in range(rows)]

    # outputs double as loop state
    t_out[:] = tm
    tri_out[:] = jnp.full((rows, LANES), -1, jnp.int32)
    b1_out[:] = jnp.zeros((rows, LANES), f32)
    b2_out[:] = jnp.zeros((rows, LANES), f32)

    for s in range(rows):
        stack_ref[s * STACK] = 0
        sp_ref[s] = 1

    def slab(lo_x, lo_y, lo_z, hi_x, hi_y, hi_z, t_best):
        t0x = (lo_x - ox) * inv_dx
        t1x = (hi_x - ox) * inv_dx
        t0y = (lo_y - oy) * inv_dy
        t1y = (hi_y - oy) * inv_dy
        t0z = (lo_z - oz) * inv_dz
        t1z = (hi_z - oz) * inv_dz
        tn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
                         jnp.minimum(t0z, t1z))
        tf = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
                         jnp.maximum(t0z, t1z)) * f32(1.00000024)
        return (tn <= tf) & (tf > 0.0) & (tn < t_best)

    def tri_test(v, t_best):
        """v: [rows, 16] one triangle per row (16-lane record); watertight
        test against all [rows, 128] rays."""
        p0x, p0y, p0z = v[:, 0:1], v[:, 1:2], v[:, 2:3]
        p1x, p1y, p1z = v[:, 3:4], v[:, 4:5], v[:, 5:6]
        p2x, p2y, p2z = v[:, 6:7], v[:, 7:8], v[:, 8:9]

        def shear(px, py, pz):
            tx, ty, tz = px - ox, py - oy, pz - oz
            vx = _pick(tx, ty, tz, kx)
            vy = _pick(tx, ty, tz, ky)
            vz = _pick(tx, ty, tz, kz)
            return vx + sx * vz, vy + sy * vz, vz * sz

        x0, y0, z0 = shear(p0x, p0y, p0z)
        x1, y1, z1 = shear(p1x, p1y, p1z)
        x2, y2, z2 = shear(p2x, p2y, p2z)
        e0 = x1 * y2 - y1 * x2
        e1 = x2 * y0 - y2 * x0
        e2 = x0 * y1 - y0 * x1
        same = ((e0 >= 0) & (e1 >= 0) & (e2 >= 0)) | ((e0 <= 0) & (e1 <= 0) & (e2 <= 0))
        det = e0 + e1 + e2
        t_sc = e0 * z0 + e1 * z1 + e2 * z2
        # NB: no jnp.where on bool vectors — Mosaic cannot lower select_n
        # on i1 operands ("Unsupported target bitwidth for truncation")
        pos = det > 0
        t_ok = (pos & (t_sc > f32(1e-4) * det) & (t_sc < t_best * det)) \
            | (~pos & (t_sc < f32(1e-4) * det) & (t_sc > t_best * det))
        hit = same & (det != 0.0) & t_ok
        inv_det = 1.0 / jnp.where(det == 0.0, tiny, det)
        return hit, t_sc * inv_det, e1 * inv_det, e2 * inv_det

    def body(carry):
        it = carry[0]

        # ---- scalar pop phase: `pops` nodes per row per iteration ----
        # Each (row, pop-slot) is an independent pop->fetch->test chain; the
        # chains pipeline against each other, amortizing the ~0.5us latency
        # of a single chain (SMEM pop -> VMEM fetch -> slab -> vote sync).
        recs = [[] for _ in range(pops)]
        tbs = [[] for _ in range(pops)]
        scal = [[None] * pops for _ in range(rows)]
        if smem_meta:
            # meta_ref is the packed [M] SMEM word table: the whole pop is
            # scalar ALU — no VMEM roll/scratch roundtrip per row
            for s in range(rows):
                sp_s = sp_ref[s]
                for p in range(pops):
                    act = sp_s > p
                    spi = jnp.maximum(sp_s - 1 - p, 0)
                    idx = stack_ref[s * STACK + spi]
                    idx = jnp.where(act, idx, 0)
                    w = meta_ref[idx]
                    ax = w & 3
                    cnt0 = (w >> 2) & 15
                    payload = (w >> 6) & 0x3FFFFFF
                    cnt = jnp.where(act, cnt0, 0)
                    blk = jnp.where(cnt0 > 0, payload, 0)
                    nrow = nodes_ref[pl.ds(idx >> 3, 1), :]
                    recs[p].append(pltpu.roll(nrow, -(idx & 7) * 16, 1)[:, :16])
                    scal[s][p] = [act, idx + 1, payload, cnt, blk, ax]
                    tbs[p].append(tris_ref[pl.ds(blk, 1), :])
                sp_ref[s] = jnp.maximum(sp_s - pops, 0)
        else:
            for s in range(rows):
                sp_s = sp_ref[s]
                act = sp_s > 0
                spm = jnp.maximum(sp_s - 1, 0)
                idx = stack_ref[s * STACK + spm]
                idx = jnp.where(act, idx, 0)
                sp_ref[s] = spm
                # int meta: roll the 4-lane group to the front, stage in VMEM
                # scratch, read back as scalars (static lane indices)
                mrow = meta_ref[pl.ds(idx >> 5, 1), :]
                mscr_ref[s:s + 1, :] = pltpu.roll(mrow, -(idx & 31) * 4, 1)
                # f32 bounds: roll the 16-lane group to the front
                nrow = nodes_ref[pl.ds(idx >> 3, 1), :]
                rec = pltpu.roll(nrow, -(idx & 7) * 16, 1)[:, :16]
                recs[0].append(rec)
                scal[s][0] = [act, idx + 1]
            for s in range(rows):
                rch = mscr_ref[s, 0]
                cnt = jnp.where(scal[s][0][0], mscr_ref[s, 1], 0)
                blk = mscr_ref[s, 2]
                ax = mscr_ref[s, 3]
                scal[s][0].extend([rch, cnt, blk, ax])
                tb = tris_ref[pl.ds(blk, 1), :]
                tbs[0].append(tb)

        # per-row scalar -> [rows,1] i32 columns (Mosaic cannot concat or
        # broadcast i1 vregs, so masks stay i32 until full [rows,128] width)
        zero_i = jnp.zeros((rows, LANES), jnp.int32)
        t_best0 = t_out[:]
        hits = []       # per pop slot: (hit_l, hit_r) [rows,LANES]
        leafs = []      # per pop slot: (tri4, cnt_col, blk_col, any_leaf_p)
        for p in range(pops):
            rec = jnp.concatenate(recs[p], axis=0)             # [rows,16]
            tri4 = jnp.concatenate(tbs[p], axis=0)             # [rows,64]
            cnt_col = jnp.concatenate(
                [jnp.full((1, 1), scal[s][p][3], jnp.int32) for s in range(rows)],
                axis=0) + zero_i
            blk_col = jnp.concatenate(
                [jnp.full((1, 1), scal[s][p][4], jnp.int32) for s in range(rows)],
                axis=0)
            int_col = jnp.concatenate(
                [jnp.full((1, 1),
                          jnp.where(scal[s][p][0] & (scal[s][p][3] == 0), 1, 0),
                          jnp.int32) for s in range(rows)], axis=0) + zero_i
            hit_l = slab(rec[:, 0:1], rec[:, 1:2], rec[:, 2:3],
                         rec[:, 3:4], rec[:, 4:5], rec[:, 5:6],
                         t_best0) & (int_col > 0)
            hit_r = slab(rec[:, 6:7], rec[:, 7:8], rec[:, 8:9],
                         rec[:, 9:10], rec[:, 10:11], rec[:, 11:12],
                         t_best0) & (int_col > 0)
            hits.append((hit_l, hit_r))
            any_leaf_p = False
            for s in range(rows):
                any_leaf_p = jnp.logical_or(any_leaf_p, scal[s][p][3] > 0)
            if dbg_skip_leaf:
                any_leaf_p = jnp.asarray(False)
            leafs.append((tri4, cnt_col, blk_col, any_leaf_p))

        # ---- vector phase: leaf triangle tests (gated per pop slot) ----
        for p in range(pops):
            tri4, cnt_col, blk_col, any_leaf_p = leafs[p]

            @pl.when(any_leaf_p)
            def _leaf(tri4=tri4, cnt_col=cnt_col, blk_col=blk_col):
                t_best = t_out[:]
                tri_b = tri_out[:]
                b1_b = b1_out[:]
                b2_b = b2_out[:]
                for j in range(LEAF_TRIS):
                    hit, t, b1, b2 = tri_test(tri4[:, j * 16:(j + 1) * 16], t_best)
                    ok = hit & (cnt_col > j)    # cnt_col is [rows,128] i32
                    t_best = jnp.where(ok, t, t_best)
                    tri_b = jnp.where(ok, blk_col * LEAF_TRIS + j, tri_b)
                    b1_b = jnp.where(ok, b1, b1_b)
                    b2_b = jnp.where(ok, b2, b2_b)
                t_out[:] = t_best
                tri_out[:] = tri_b
                b1_out[:] = b1_b
                b2_out[:] = b2_b

        # ---- scalar push phase (pop slots in reverse: nearest popped node's
        # children end on top of the stack, preserving near-first DFS).
        # Branchless: both children are written unconditionally at computed
        # offsets (a non-pushed child's write lands above the new sp and is
        # dead), and a single combined cross-lane vote per (row, slot)
        # replaces the two separate hl/hr reductions (each reduction is a
        # vector->scalar sync).
        cont = False
        for s in range(rows):
            sp_s = sp_ref[s]
            for p in reversed(range(pops)):
                act, left, rch, cnt, blk, ax = scal[s][p]
                if dbg_push_all:
                    is_int = jnp.where(act & (cnt == 0), 1, 0)
                    hl = is_int
                    hr = is_int
                else:
                    hit_l, hit_r = hits[p]
                    v = jnp.sum(jnp.where(hit_l[s:s + 1, :], 1, 0)
                                + jnp.where(hit_r[s:s + 1, :], 256, 0))
                    hl = jnp.where((v & 255) > 0, 1, 0)
                    hr = jnp.where(v >= 256, 1, 0)
                swap = jnp.where(ax == 0, swap_axis[s][0],
                                 jnp.where(ax == 1, swap_axis[s][1], swap_axis[s][2]))
                near = jnp.where(swap, rch, left)
                far = jnp.where(swap, left, rch)
                h_near = jnp.where(swap, hr, hl)
                h_far = jnp.where(swap, hl, hr)
                stack_ref[s * STACK + jnp.minimum(sp_s, STACK - 1)] = far
                stack_ref[s * STACK + jnp.minimum(sp_s + h_far, STACK - 1)] = near
                sp_s = jnp.minimum(sp_s + h_far + h_near, STACK - 1)

            if any_hit:
                # a packet row is done as soon as every lane has some hit
                all_hit = jnp.sum(jnp.where(tri_out[s:s + 1, :] >= 0, 1, 0)) == LANES
                sp_s = jnp.where(all_hit, 0, sp_s)
            sp_ref[s] = sp_s
            cont = jnp.logical_or(cont, sp_s > 0)
        return (it + 1, cont)

    n_it, _ = jax.lax.while_loop(lambda c: c[1], body, (0, True))
    it_out[pl.program_id(0)] = n_it


STACKB = 160        # block-shared stack depth (union of 1024 rays runs deeper)


def _kernel_block(meta_ref, nodes_ref, tris_ref,
                  ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tm_ref,
                  t_out, tri_out, b1_out, b2_out, it_out,
                  stack_ref, sp_ref, *, any_hit: bool, rows: int, pops: int):
    """Mega-packet traversal: ONE shared stack per rows x 128 block.

    Why: the scalar unit is the bottleneck (~15 serial scalar ops per node
    visit); sharing one traversal among all rows*128 rays of a block visits
    the union of their node sequences ONCE instead of per-128-lane-packet
    (~3.6x fewer node visits on incoherent wavefronts), and popping `pops`
    nodes per iteration keeps several pop->fetch->test chains in flight to
    hide the per-chain SMEM/VMEM/vote latency. Requires the SMEM meta table.
    """
    f32 = jnp.float32
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    tm = tm_ref[:]
    tiny = f32(1e-20)
    inv_dx = 1.0 / jnp.where(jnp.abs(dx) < tiny, jnp.where(dx < 0, -tiny, tiny), dx)
    inv_dy = 1.0 / jnp.where(jnp.abs(dy) < tiny, jnp.where(dy < 0, -tiny, tiny), dy)
    inv_dz = 1.0 / jnp.where(jnp.abs(dz) < tiny, jnp.where(dz < 0, -tiny, tiny), dz)
    adx, ady, adz = jnp.abs(dx), jnp.abs(dy), jnp.abs(dz)
    kz = jnp.where((adx >= ady) & (adx >= adz), 0, jnp.where(ady >= adz, 1, 2))
    kx = (kz + 1) % 3
    ky = (kx + 1) % 3
    dpz = _pick(dx, dy, dz, kz)
    dpx = _pick(dx, dy, dz, kx)
    dpy = _pick(dx, dy, dz, ky)
    sz = 1.0 / jnp.where(dpz == 0.0, tiny, dpz)
    sx = -dpx * sz
    sy = -dpy * sz

    # block-majority near/far vote per axis (loop-invariant)
    half = rows * LANES // 2
    swap_axis = [jnp.sum(jnp.where(dx < 0.0, 1, 0)) > half,
                 jnp.sum(jnp.where(dy < 0.0, 1, 0)) > half,
                 jnp.sum(jnp.where(dz < 0.0, 1, 0)) > half]

    t_out[:] = tm
    tri_out[:] = jnp.full((rows, LANES), -1, jnp.int32)
    b1_out[:] = jnp.zeros((rows, LANES), f32)
    b2_out[:] = jnp.zeros((rows, LANES), f32)
    stack_ref[0] = 0
    sp_ref[0] = 1

    zrow = jnp.zeros((rows, 1), f32)

    def bc(v):
        # [1,1] -> [rows,1] (Mosaic cannot broadcast sublanes+lanes at once);
        # lane broadcast then happens inside the arithmetic
        return v + zrow

    def slab(lo_x, lo_y, lo_z, hi_x, hi_y, hi_z, t_best):
        t0x = (lo_x - ox) * inv_dx
        t1x = (hi_x - ox) * inv_dx
        t0y = (lo_y - oy) * inv_dy
        t1y = (hi_y - oy) * inv_dy
        t0z = (lo_z - oz) * inv_dz
        t1z = (hi_z - oz) * inv_dz
        tn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
                         jnp.minimum(t0z, t1z))
        tf = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
                         jnp.maximum(t0z, t1z)) * f32(1.00000024)
        return (tn <= tf) & (tf > 0.0) & (tn < t_best)

    def tri_test(v, t_best):
        """v: [rows,16] (single triangle record broadcast over sublanes)."""
        p0x, p0y, p0z = v[:, 0:1], v[:, 1:2], v[:, 2:3]
        p1x, p1y, p1z = v[:, 3:4], v[:, 4:5], v[:, 5:6]
        p2x, p2y, p2z = v[:, 6:7], v[:, 7:8], v[:, 8:9]

        def shear(px, py, pz):
            tx, ty, tz = px - ox, py - oy, pz - oz
            vx = _pick(tx, ty, tz, kx)
            vy = _pick(tx, ty, tz, ky)
            vz = _pick(tx, ty, tz, kz)
            return vx + sx * vz, vy + sy * vz, vz * sz

        x0, y0, z0 = shear(p0x, p0y, p0z)
        x1, y1, z1 = shear(p1x, p1y, p1z)
        x2, y2, z2 = shear(p2x, p2y, p2z)
        e0 = x1 * y2 - y1 * x2
        e1 = x2 * y0 - y2 * x0
        e2 = x0 * y1 - y0 * x1
        same = ((e0 >= 0) & (e1 >= 0) & (e2 >= 0)) | ((e0 <= 0) & (e1 <= 0) & (e2 <= 0))
        det = e0 + e1 + e2
        t_sc = e0 * z0 + e1 * z1 + e2 * z2
        pos = det > 0
        t_ok = (pos & (t_sc > f32(1e-4) * det) & (t_sc < t_best * det)) \
            | (~pos & (t_sc < f32(1e-4) * det) & (t_sc > t_best * det))
        hit = same & (det != 0.0) & t_ok
        inv_det = 1.0 / jnp.where(det == 0.0, tiny, det)
        return hit, t_sc * inv_det, e1 * inv_det, e2 * inv_det

    def body(carry):
        it = carry[0]
        sp0 = sp_ref[0]
        slots = []      # (act, left, payload, cnt, blk, ax, rec, tb)
        for p in range(pops):
            act = sp0 > p
            spi = jnp.maximum(sp0 - 1 - p, 0)
            idx = stack_ref[spi]
            idx = jnp.where(act, idx, 0)
            w = meta_ref[idx]
            ax = w & 3
            cnt0 = (w >> 2) & 15
            payload = (w >> 6) & 0x3FFFFFF
            cnt = jnp.where(act, cnt0, 0)
            blk = jnp.where(cnt0 > 0, payload, 0)
            nrow = nodes_ref[pl.ds(idx >> 3, 1), :]
            rec = pltpu.roll(nrow, -(idx & 7) * 16, 1)[:, :16]
            tb = tris_ref[pl.ds(blk, 1), :]
            slots.append([act, idx + 1, payload, cnt, blk, ax, rec, tb])
        # sp is carried in a register to the push phase and stored once there

        t_best0 = t_out[:]
        hits = []
        for p in range(pops):
            act, left, payload, cnt, blk, ax, rec, tb = slots[p]
            gate = jnp.where(act & (cnt == 0), 1, 0) + jnp.zeros((rows, LANES), jnp.int32)
            hit_l = slab(bc(rec[:, 0:1]), bc(rec[:, 1:2]), bc(rec[:, 2:3]),
                         bc(rec[:, 3:4]), bc(rec[:, 4:5]), bc(rec[:, 5:6]),
                         t_best0) & (gate > 0)
            hit_r = slab(bc(rec[:, 6:7]), bc(rec[:, 7:8]), bc(rec[:, 8:9]),
                         bc(rec[:, 9:10]), bc(rec[:, 10:11]), bc(rec[:, 11:12]),
                         t_best0) & (gate > 0)
            hits.append((hit_l, hit_r))

        # leaf phase per slot (gated)
        z16 = jnp.zeros((rows, 16), f32)
        for p in range(pops):
            act, left, payload, cnt, blk, ax, rec, tb = slots[p]

            @pl.when(cnt > 0)
            def _leaf(cnt=cnt, blk=blk, tb=tb):
                t_best = t_out[:]
                tri_b = tri_out[:]
                b1_b = b1_out[:]
                b2_b = b2_out[:]
                cnt_col = cnt + jnp.zeros((rows, LANES), jnp.int32)
                for j in range(LEAF_TRIS):
                    hit, t, b1, b2 = tri_test(tb[:, j * 16:(j + 1) * 16] + z16, t_best)
                    ok = hit & (cnt_col > j)
                    t_best = jnp.where(ok, t, t_best)
                    tri_b = jnp.where(ok, blk * LEAF_TRIS + j, tri_b)
                    b1_b = jnp.where(ok, b1, b1_b)
                    b2_b = jnp.where(ok, b2, b2_b)
                t_out[:] = t_best
                tri_out[:] = tri_b
                b1_out[:] = b1_b
                b2_out[:] = b2_b

        # push phase, reverse order to keep near-first DFS. Branchless: both
        # children written unconditionally at computed offsets (dead writes
        # land above sp), one combined cross-lane vote per slot, sp carried
        # in a scalar register across all pushes.
        sp_s = jnp.maximum(sp0 - pops, 0)
        for p in reversed(range(pops)):
            act, left, payload, cnt, blk, ax, rec, tb = slots[p]
            hit_l, hit_r = hits[p]
            # vote weight must exceed the max possible left-hit count
            # (rows*LANES), else an all-left block aliases into hr
            W = rows * LANES + 1
            v = jnp.sum(jnp.where(hit_l, 1, 0) + jnp.where(hit_r, W, 0))
            hl = jnp.where((v % W) > 0, 1, 0)
            hr = jnp.where(v >= W, 1, 0)
            swap = jnp.where(ax == 0, swap_axis[0],
                             jnp.where(ax == 1, swap_axis[1], swap_axis[2]))
            near = jnp.where(swap, payload, left)
            far = jnp.where(swap, left, payload)
            h_near = jnp.where(swap, hr, hl)
            h_far = jnp.where(swap, hl, hr)
            stack_ref[jnp.minimum(sp_s, STACKB - 1)] = far
            stack_ref[jnp.minimum(sp_s + h_far, STACKB - 1)] = near
            sp_s = jnp.minimum(sp_s + h_far + h_near, STACKB - 1)

        if any_hit:
            all_hit = jnp.sum(jnp.where(tri_out[:] >= 0, 1, 0)) == rows * LANES
            sp_s = jnp.where(all_hit, 0, sp_s)
        sp_ref[0] = sp_s
        return (it + 1, sp_s > 0)

    n_it, _ = jax.lax.while_loop(lambda c: c[1], body, (0, True))
    it_out[pl.program_id(0)] = n_it


def _kernel_block_all(meta_ref, anyhit_ref, sslot_ref, nodes_ref, tris_ref,
                      seed_ref,
                      ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tm_ref,
                      t_out, tri_out, b1_out, b2_out, it_out,
                      stack_ref, sp_ref, ts_ref, tris_scr, b1s_ref, b2s_ref,
                      vscr_ref,
                      *, any_hit: bool, rows: int, pops: int, nblocks: int,
                      batched_vote: bool = False, dbg_skip_leaf: bool = False,
                      leaf_gate: bool = False):
    # batched_vote=True replaces the 2*pops per-slot cross-lane reductions
    # with one log-roll OR + a VMEM scalar readback — measured 17% SLOWER
    # (6.15 -> 7.21 ms bounce traversal): per-row reduce->scalar syncs are
    # ~20ns here while a VMEM scalar read costs ~100ns. Kept (off) as the
    # record of a measured dead end.
    """Whole-wavefront mega-packet traversal in ONE grid step.

    Same per-block algorithm as _kernel_block, but the kernel itself loops
    over the wavefront's blocks with lax.fori_loop: the per-grid-step Pallas
    pipeline overhead (~45us/step measured) is paid once instead of
    nblocks times. All ray/result arrays live whole in VMEM (rows*LANES*4B
    per block * 10 arrays — a 64-block 64K-ray wavefront is ~2.6 MB).
    Per-block traversal state (t/tri/b1/b2) lives in static-index VMEM
    scratch; the dynamic block slice is touched only at block entry/exit.
    """
    f32 = jnp.float32
    tiny = f32(1e-20)

    def block_body(b, _):
        sl = pl.ds(b * rows, rows)
        # per-block any-hit: occlusion-only blocks (shadow rays of a merged
        # launch) retire each lane at its FIRST hit by zeroing its t_best,
        # which fails every later slab/tri test for that lane and shrinks
        # the packet union as lanes occlude
        blk_any = (anyhit_ref[b] > 0) if not any_hit else True
        ox, oy, oz = ox_ref[sl, :], oy_ref[sl, :], oz_ref[sl, :]
        dx, dy, dz = dx_ref[sl, :], dy_ref[sl, :], dz_ref[sl, :]
        tm = tm_ref[sl, :]
        inv_dx = 1.0 / jnp.where(jnp.abs(dx) < tiny, jnp.where(dx < 0, -tiny, tiny), dx)
        inv_dy = 1.0 / jnp.where(jnp.abs(dy) < tiny, jnp.where(dy < 0, -tiny, tiny), dy)
        inv_dz = 1.0 / jnp.where(jnp.abs(dz) < tiny, jnp.where(dz < 0, -tiny, tiny), dz)
        # slab as lo*inv_d - o*inv_d: the o*inv_d half is loop-invariant,
        # halving per-box ops to one FMA per bound (rounding differs from
        # the (lo-o)*inv_d form by <1 ulp — covered by the 1.00000024
        # conservative far factor)
        oxi = ox * inv_dx
        oyi = oy * inv_dy
        ozi = oz * inv_dz
        adx, ady, adz = jnp.abs(dx), jnp.abs(dy), jnp.abs(dz)
        kz = jnp.where((adx >= ady) & (adx >= adz), 0, jnp.where(ady >= adz, 1, 2))
        kx = (kz + 1) % 3
        ky = (kx + 1) % 3
        dpz = _pick(dx, dy, dz, kz)
        dpx = _pick(dx, dy, dz, kx)
        dpy = _pick(dx, dy, dz, ky)
        sz = 1.0 / jnp.where(dpz == 0.0, tiny, dpz)
        sx = -dpx * sz
        sy = -dpy * sz
        half = rows * LANES // 2
        swap_axis = [jnp.sum(jnp.where(dx < 0.0, 1, 0)) > half,
                     jnp.sum(jnp.where(dy < 0.0, 1, 0)) > half,
                     jnp.sum(jnp.where(dz < 0.0, 1, 0)) > half]

        ts_ref[:] = tm
        tris_scr[:] = jnp.full((rows, LANES), -1, jnp.int32)
        b1s_ref[:] = jnp.zeros((rows, LANES), f32)
        b2s_ref[:] = jnp.zeros((rows, LANES), f32)
        stack_ref[0] = 0
        sp_ref[0] = 1

        zrow = jnp.zeros((rows, 1), f32)

        def bc(v):
            return v + zrow

        def slab(lo_x, lo_y, lo_z, hi_x, hi_y, hi_z, t_best):
            t0x = lo_x * inv_dx - oxi
            t1x = hi_x * inv_dx - oxi
            t0y = lo_y * inv_dy - oyi
            t1y = hi_y * inv_dy - oyi
            t0z = lo_z * inv_dz - ozi
            t1z = hi_z * inv_dz - ozi
            tn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
                             jnp.minimum(t0z, t1z))
            tf = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
                             jnp.maximum(t0z, t1z)) * f32(1.00000024)
            return (tn <= tf) & (tf > 0.0) & (tn < t_best)

        def tri_test(v, t_best):
            p0x, p0y, p0z = v[:, 0:1], v[:, 1:2], v[:, 2:3]
            p1x, p1y, p1z = v[:, 3:4], v[:, 4:5], v[:, 5:6]
            p2x, p2y, p2z = v[:, 6:7], v[:, 7:8], v[:, 8:9]

            def shear(px, py, pz):
                tx, ty, tz = px - ox, py - oy, pz - oz
                vx = _pick(tx, ty, tz, kx)
                vy = _pick(tx, ty, tz, ky)
                vz = _pick(tx, ty, tz, kz)
                return vx + sx * vz, vy + sy * vz, vz * sz

            x0, y0, z0 = shear(p0x, p0y, p0z)
            x1, y1, z1 = shear(p1x, p1y, p1z)
            x2, y2, z2 = shear(p2x, p2y, p2z)
            e0 = x1 * y2 - y1 * x2
            e1 = x2 * y0 - y2 * x0
            e2 = x0 * y1 - y0 * x1
            same = ((e0 >= 0) & (e1 >= 0) & (e2 >= 0)) | \
                ((e0 <= 0) & (e1 <= 0) & (e2 <= 0))
            det = e0 + e1 + e2
            t_sc = e0 * z0 + e1 * z1 + e2 * z2
            pos = det > 0
            t_ok = (pos & (t_sc > f32(1e-4) * det) & (t_sc < t_best * det)) \
                | (~pos & (t_sc < f32(1e-4) * det) & (t_sc > t_best * det))
            hit = same & (det != 0.0) & t_ok
            inv_det = 1.0 / jnp.where(det == 0.0, tiny, det)
            return hit, t_sc * inv_det, e1 * inv_det, e2 * inv_det

        # ---- occluder seed: test the 8 largest-area tris up front so
        # t_best starts tight and the walk slab-prunes far subtrees ----
        scnt = sslot_ref[8]

        @pl.when(scnt > 0)
        def _seed():
            z16s = jnp.zeros((rows, 16), f32)
            t_best = ts_ref[:]
            tri_b = tris_scr[:]
            b1_b = b1s_ref[:]
            b2_b = b2s_ref[:]
            scnt_col = scnt + jnp.zeros((rows, LANES), jnp.int32)
            anyv = jnp.where(blk_any, 1, 0) + jnp.zeros((rows, LANES),
                                                        jnp.int32)
            sb = seed_ref[0:1, :]
            for j in range(LEAF_TRIS):
                hit, t, b1, b2 = tri_test(sb[:, j * 16:(j + 1) * 16] + z16s,
                                          t_best)
                ok = hit & (scnt_col > j)
                t_best = jnp.where(ok, jnp.where(anyv > 0, 0.0, t), t_best)
                tri_b = jnp.where(ok, sslot_ref[j], tri_b)
                b1_b = jnp.where(ok, b1, b1_b)
                b2_b = jnp.where(ok, b2, b2_b)
            ts_ref[:] = t_best
            tris_scr[:] = tri_b
            b1s_ref[:] = b1_b
            b2s_ref[:] = b2_b

        def body(carry):
            it, _, ovf0 = carry
            sp0 = sp_ref[0]
            slots = []
            for p in range(pops):
                act = sp0 > p
                spi = jnp.maximum(sp0 - 1 - p, 0)
                idx = stack_ref[spi]
                idx = jnp.where(act, idx, 0)
                w = meta_ref[idx]
                ax = w & 3
                cnt0 = (w >> 2) & 15
                payload = (w >> 6) & 0x3FFFFFF
                cnt = jnp.where(act, cnt0, 0)
                blk = jnp.where(cnt0 > 0, payload, 0)
                nrow = nodes_ref[pl.ds(idx >> 3, 1), :]
                rec = pltpu.roll(nrow, -(idx & 7) * 16, 1)[:, :16]
                # NB: fetched unconditionally on purpose — hiding it behind
                # the leaf gate serializes the load against the gate's scalar
                # condition and measures ~10% SLOWER despite ~70% of pops
                # being internal nodes
                tb = tris_ref[pl.ds(blk, 1), :]
                slots.append([act, idx + 1, payload, cnt, blk, ax, rec, tb])

            t_best0 = ts_ref[:]
            hits = []
            for p in range(pops):
                act, left, payload, cnt, blk, ax, rec, tb = slots[p]
                gate = jnp.where(act & (cnt == 0), 1, 0) \
                    + jnp.zeros((rows, LANES), jnp.int32)
                hit_l = slab(bc(rec[:, 0:1]), bc(rec[:, 1:2]), bc(rec[:, 2:3]),
                             bc(rec[:, 3:4]), bc(rec[:, 4:5]), bc(rec[:, 5:6]),
                             t_best0) & (gate > 0)
                hit_r = slab(bc(rec[:, 6:7]), bc(rec[:, 7:8]), bc(rec[:, 8:9]),
                             bc(rec[:, 9:10]), bc(rec[:, 10:11]), bc(rec[:, 11:12]),
                             t_best0) & (gate > 0)
                hits.append((hit_l, hit_r))

            z16 = jnp.zeros((rows, 16), f32)
            for p in range(pops if not dbg_skip_leaf else 0):
                act, left, payload, cnt, blk, ax, rec, tb = slots[p]

                @pl.when(cnt > 0)
                def _leaf(cnt=cnt, blk=blk, tb=tb):
                    t_best = ts_ref[:]
                    tri_b = tris_scr[:]
                    b1_b = b1s_ref[:]
                    b2_b = b2s_ref[:]
                    cnt_col = cnt + jnp.zeros((rows, LANES), jnp.int32)
                    # occlusion-only block: a hit lane's t_best drops to 0
                    anyv = jnp.where(blk_any, 1, 0) + jnp.zeros((rows, LANES),
                                                                jnp.int32)

                    def run(j, st):
                        t_best, tri_b, b1_b, b2_b = st
                        hit, t, b1, b2 = tri_test(
                            tb[:, j * 16:(j + 1) * 16] + z16, t_best)
                        ok = hit & (cnt_col > j)
                        t_best = jnp.where(ok, jnp.where(anyv > 0, 0.0, t),
                                           t_best)
                        tri_b = jnp.where(ok, blk * LEAF_TRIS + j, tri_b)
                        b1_b = jnp.where(ok, b1, b1_b)
                        b2_b = jnp.where(ok, b2, b2_b)
                        return t_best, tri_b, b1_b, b2_b

                    st = (t_best, tri_b, b1_b, b2_b)
                    if not leaf_gate:
                        for j in range(LEAF_TRIS):
                            st = run(j, st)
                        ts_ref[:] = st[0]
                        tris_scr[:] = st[1]
                        b1s_ref[:] = st[2]
                        b2s_ref[:] = st[3]
                        return
                    for j in range(LEAF_TRIS // 2):
                        st = run(j, st)

                    # second half gated on the scalar count: mean SAH leaf
                    # occupancy is ~6 of 8, and ~20% of leaves fit in 4 —
                    # their 4x[rows,128] wasted tri tests are the single
                    # biggest avoidable VPU cost in the walk
                    @pl.when(cnt <= LEAF_TRIS // 2)
                    def _store_small(st=st):
                        ts_ref[:] = st[0]
                        tris_scr[:] = st[1]
                        b1s_ref[:] = st[2]
                        b2s_ref[:] = st[3]

                    @pl.when(cnt > LEAF_TRIS // 2)
                    def _rest(st=st):
                        for j in range(LEAF_TRIS // 2, LEAF_TRIS):
                            st = run(j, st)
                        ts_ref[:] = st[0]
                        tris_scr[:] = st[1]
                        b1s_ref[:] = st[2]
                        b2s_ref[:] = st[3]

            # ONE vote for all slots: per-lane bitmask (bits disjoint per
            # slot/side, so per-lane adds don't collide), OR-reduced across
            # lanes+sublanes with log rolls, one element staged through VMEM
            # scratch — replaces 2*pops cross-lane reduce->scalar syncs
            if batched_vote:
                mask = jnp.zeros((rows, LANES), jnp.int32)
                for p in range(pops):
                    hit_l, hit_r = hits[p]
                    mask = mask + jnp.where(hit_l, 1 << (2 * p), 0) \
                        + jnp.where(hit_r, 1 << (2 * p + 1), 0)
                for sh in (64, 32, 16, 8, 4, 2, 1):
                    mask = mask | pltpu.roll(mask, sh, 1)
                for sh in (4, 2, 1):
                    mask = mask | pltpu.roll(mask, sh, 0)
                vscr_ref[0:1, :] = mask[0:1, :]
                vote_word = vscr_ref[0, 0]

            sp_s = jnp.maximum(sp0 - pops, 0)
            ovf = ovf0
            for p in reversed(range(pops)):
                act, left, payload, cnt, blk, ax, rec, tb = slots[p]
                if batched_vote:
                    hl = (vote_word >> (2 * p)) & 1
                    hr = (vote_word >> (2 * p + 1)) & 1
                else:
                    hit_l, hit_r = hits[p]
                    W = rows * LANES + 1
                    v = jnp.sum(jnp.where(hit_l, 1, 0) + jnp.where(hit_r, W, 0))
                    hl = jnp.where((v % W) > 0, 1, 0)
                    hr = jnp.where(v >= W, 1, 0)
                swap = jnp.where(ax == 0, swap_axis[0],
                                 jnp.where(ax == 1, swap_axis[1], swap_axis[2]))
                near = jnp.where(swap, payload, left)
                far = jnp.where(swap, left, payload)
                h_near = jnp.where(swap, hr, hl)
                h_far = jnp.where(swap, hl, hr)
                stack_ref[jnp.minimum(sp_s, STACKB - 1)] = far
                stack_ref[jnp.minimum(sp_s + h_far, STACKB - 1)] = near
                # stack-overflow accounting (r3 advisor: no silent caps) —
                # reported in it_out bit 24, surfaced by bench/stats
                ovf = jnp.maximum(ovf, jnp.where(
                    sp_s + h_far + h_near > STACKB - 1, 1, 0))
                sp_s = jnp.minimum(sp_s + h_far + h_near, STACKB - 1)

            all_hit = jnp.sum(jnp.where(tris_scr[:] >= 0, 1, 0)) == rows * LANES
            sp_s = jnp.where(jnp.logical_and(blk_any if not any_hit else True,
                                             all_hit), 0, sp_s)
            sp_ref[0] = sp_s
            return (it + 1, sp_s > 0, ovf)

        n_it, _, ovf = jax.lax.while_loop(lambda c: c[1], body,
                                          (0, True, jnp.int32(0)))
        t_out[sl, :] = ts_ref[:]
        tri_out[sl, :] = tris_scr[:]
        b1_out[sl, :] = b1s_ref[:]
        b2_out[sl, :] = b2s_ref[:]
        it_out[b] = n_it | (ovf << 24)
        return 0

    jax.lax.fori_loop(0, nblocks, block_body, 0)


def _kernel_block_queue(meta_ref, anyhit_ref, sslot_ref, nodes_ref, tris_ref,
                        seed_ref,
                        ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tm_ref,
                        t_out, tri_out, it_out,
                        stack_ref, scal_ref,
                        rox_s, roy_s, roz_s, rix_s, riy_s, riz_s,
                        oxi_s, oyi_s, ozi_s, kx_s, ky_s, kz_s,
                        sx_s, sy_s, sz_s, ts_s, tri_s,
                        *, any_hit: bool, rows: int, pops: int, nblocks: int,
                        groups: int):
    """Persistent-worker mega-packet traversal: G co-resident block walks.

    Why: one walk's per-pop chain (SMEM pop -> VMEM fetch -> roll -> slab ->
    cross-lane vote -> serialized pushes) is latency-serialized at ~200ns/pop
    and leaves the VPU half idle. G independent walks interleave their
    chains — the compiler overlaps group A's vector slab/leaf work with
    group B's scalar pop/vote chain (measured: 2 static co-resident walks
    run at 159ns/pop vs 209 solo). Static pairing loses the win to max()
    imbalance (iters 120 -> 153), so blocks are pulled from an SMEM work
    QUEUE: a group that drains its stack writes its results out and
    re-arms with the next unprocessed block while the others keep walking.

    Group state lives in VMEM scratch (rays + slab/shear precomputes +
    running best-hit), [G*rows, 128] each, sliced statically per group.
    scal_ref (SMEM) holds per-group scalars [G, 8]:
      0 sp  1 cur_blk  2 start_it  3 ovf  4 blk_any  5..7 swap_axis
    and scal_ref[groups, 0] is the queue head.

    Barycentrics are NOT computed here (r5 leaf slim): the winning slot's
    b1/b2 are recomputed per lane at SI-assembly from the already-gathered
    vertex attributes (scene/intersect.py kernel_bary) with the same
    naive-product shear math, cutting ~4 vector ops per triangle test and
    two co-sorted columns from the merged-pair dispatch."""
    f32 = jnp.float32
    tiny = f32(1e-20)
    Q_SP, Q_CUR, Q_IT0, Q_OVF, Q_ANY, Q_SW = 0, 1, 2, 3, 4, 5

    for g in range(groups):
        scal_ref[g, Q_SP] = 0
        scal_ref[g, Q_CUR] = -1
    scal_ref[groups, 0] = 0   # queue head

    scnt = sslot_ref[8]
    zrow = jnp.zeros((rows, 1), f32)

    def gsl(g):
        return slice(g * rows, (g + 1) * rows)

    def bc(v):
        return v + zrow

    def slab(st, lo_x, lo_y, lo_z, hi_x, hi_y, hi_z, t_best):
        ix, iy, iz = st["ix"], st["iy"], st["iz"]
        oxi, oyi, ozi = st["oxi"], st["oyi"], st["ozi"]
        t0x = lo_x * ix - oxi
        t1x = hi_x * ix - oxi
        t0y = lo_y * iy - oyi
        t1y = hi_y * iy - oyi
        t0z = lo_z * iz - ozi
        t1z = hi_z * iz - ozi
        tn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
                         jnp.minimum(t0z, t1z))
        tf = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
                         jnp.maximum(t0z, t1z)) * f32(1.00000024)
        return (tn <= tf) & (tf > 0.0) & (tn < t_best)

    def tri_test(st, v, t_best):
        ox, oy, oz = st["ox"], st["oy"], st["oz"]
        kx, ky, kz = st["kx"], st["ky"], st["kz"]
        sx, sy, sz = st["sx"], st["sy"], st["sz"]
        p0x, p0y, p0z = v[:, 0:1], v[:, 1:2], v[:, 2:3]
        p1x, p1y, p1z = v[:, 3:4], v[:, 4:5], v[:, 5:6]
        p2x, p2y, p2z = v[:, 6:7], v[:, 7:8], v[:, 8:9]

        def shear(px, py, pz):
            tx, ty, tz = px - ox, py - oy, pz - oz
            vx = _pick(tx, ty, tz, kx)
            vy = _pick(tx, ty, tz, ky)
            vz = _pick(tx, ty, tz, kz)
            return vx + sx * vz, vy + sy * vz, vz * sz

        x0, y0, z0 = shear(p0x, p0y, p0z)
        x1, y1, z1 = shear(p1x, p1y, p1z)
        x2, y2, z2 = shear(p2x, p2y, p2z)
        e0 = x1 * y2 - y1 * x2
        e1 = x2 * y0 - y2 * x0
        e2 = x0 * y1 - y0 * x1
        same = ((e0 >= 0) & (e1 >= 0) & (e2 >= 0)) | \
            ((e0 <= 0) & (e1 <= 0) & (e2 <= 0))
        det = e0 + e1 + e2
        t_sc = e0 * z0 + e1 * z1 + e2 * z2
        pos = det > 0
        t_ok = (pos & (t_sc > f32(1e-4) * det) & (t_sc < t_best * det)) \
            | (~pos & (t_sc < f32(1e-4) * det) & (t_sc > t_best * det))
        hit = same & (det != 0.0) & t_ok
        inv_det = 1.0 / jnp.where(det == 0.0, tiny, det)
        return hit, t_sc * inv_det

    def leaf_blast(g, st, tb, cnt, blk, blk_any_col):
        """8-triangle leaf block test against group g's rays."""
        z16 = jnp.zeros((rows, 16), f32)
        t_best = ts_s[gsl(g), :]
        tri_b = tri_s[gsl(g), :]
        cnt_col = cnt + jnp.zeros((rows, LANES), jnp.int32)
        for j in range(LEAF_TRIS):
            hit, t = tri_test(st, tb[:, j * 16:(j + 1) * 16] + z16,
                              t_best)
            ok = hit & (cnt_col > j)
            t_best = jnp.where(ok, jnp.where(blk_any_col > 0, 0.0, t), t_best)
            tri_b = jnp.where(ok, blk * LEAF_TRIS + j, tri_b)
        ts_s[gsl(g), :] = t_best
        tri_s[gsl(g), :] = tri_b

    def body(carry):
        it = carry[0]

        # ---- acquire phase: idle groups pull the next block ----
        for g in range(groups):
            need = (scal_ref[g, Q_SP] == 0) & (scal_ref[g, Q_CUR] < 0)
            head = scal_ref[groups, 0]
            can = need & (head < nblocks)

            @pl.when(can)
            def _arm(g=g, head=head):
                scal_ref[groups, 0] = head + 1
                sl = pl.ds(head * rows, rows)
                ox = ox_ref[sl, :]
                oy = oy_ref[sl, :]
                oz = oz_ref[sl, :]
                dx = dx_ref[sl, :]
                dy = dy_ref[sl, :]
                dz = dz_ref[sl, :]
                inv_dx = 1.0 / jnp.where(jnp.abs(dx) < tiny,
                                         jnp.where(dx < 0, -tiny, tiny), dx)
                inv_dy = 1.0 / jnp.where(jnp.abs(dy) < tiny,
                                         jnp.where(dy < 0, -tiny, tiny), dy)
                inv_dz = 1.0 / jnp.where(jnp.abs(dz) < tiny,
                                         jnp.where(dz < 0, -tiny, tiny), dz)
                rox_s[gsl(g), :] = ox
                roy_s[gsl(g), :] = oy
                roz_s[gsl(g), :] = oz
                rix_s[gsl(g), :] = inv_dx
                riy_s[gsl(g), :] = inv_dy
                riz_s[gsl(g), :] = inv_dz
                oxi_s[gsl(g), :] = ox * inv_dx
                oyi_s[gsl(g), :] = oy * inv_dy
                ozi_s[gsl(g), :] = oz * inv_dz
                adx, ady, adz = jnp.abs(dx), jnp.abs(dy), jnp.abs(dz)
                kz = jnp.where((adx >= ady) & (adx >= adz), 0,
                               jnp.where(ady >= adz, 1, 2))
                kx = (kz + 1) % 3
                ky = (kx + 1) % 3
                dpz = _pick(dx, dy, dz, kz)
                dpx = _pick(dx, dy, dz, kx)
                dpy = _pick(dx, dy, dz, ky)
                sz = 1.0 / jnp.where(dpz == 0.0, tiny, dpz)
                kx_s[gsl(g), :] = kx
                ky_s[gsl(g), :] = ky
                kz_s[gsl(g), :] = kz
                sx_s[gsl(g), :] = -dpx * sz
                sy_s[gsl(g), :] = -dpy * sz
                sz_s[gsl(g), :] = sz
                ts_s[gsl(g), :] = tm_ref[sl, :]
                tri_s[gsl(g), :] = jnp.full((rows, LANES), -1, jnp.int32)
                half = rows * LANES // 2
                swx = jnp.sum(jnp.where(dx < 0.0, 1, 0))
                swy = jnp.sum(jnp.where(dy < 0.0, 1, 0))
                swz = jnp.sum(jnp.where(dz < 0.0, 1, 0))
                scal_ref[g, Q_SW + 0] = jnp.where(swx > half, 1, 0)
                scal_ref[g, Q_SW + 1] = jnp.where(swy > half, 1, 0)
                scal_ref[g, Q_SW + 2] = jnp.where(swz > half, 1, 0)
                ba = 1 if any_hit else 0
                if not any_hit:
                    ba = anyhit_ref[head]
                scal_ref[g, Q_ANY] = ba
                scal_ref[g, Q_CUR] = head
                scal_ref[g, Q_IT0] = it
                scal_ref[g, Q_OVF] = 0
                stack_ref[g * STACKB] = 0
                scal_ref[g, Q_SP] = 1
                # occluder seed: tight t_best before the walk (identical
                # results: revisits fail the strict t< test)
                blk_any_col = ba + jnp.zeros((rows, LANES), jnp.int32)

                @pl.when(scnt > 0)
                def _seed(g=g, blk_any_col=blk_any_col):
                    st = dict(ox=rox_s[gsl(g), :], oy=roy_s[gsl(g), :],
                              oz=roz_s[gsl(g), :], kx=kx_s[gsl(g), :],
                              ky=ky_s[gsl(g), :], kz=kz_s[gsl(g), :],
                              sx=sx_s[gsl(g), :], sy=sy_s[gsl(g), :],
                              sz=sz_s[gsl(g), :])
                    z16s = jnp.zeros((rows, 16), f32)
                    t_best = ts_s[gsl(g), :]
                    tri_b = tri_s[gsl(g), :]
                    scnt_col = scnt + jnp.zeros((rows, LANES), jnp.int32)
                    sb = seed_ref[0:1, :]
                    for j in range(LEAF_TRIS):
                        hit, t = tri_test(
                            st, sb[:, j * 16:(j + 1) * 16] + z16s, t_best)
                        ok = hit & (scnt_col > j)
                        t_best = jnp.where(
                            ok, jnp.where(blk_any_col > 0, 0.0, t), t_best)
                        tri_b = jnp.where(ok, sslot_ref[j], tri_b)
                    ts_s[gsl(g), :] = t_best
                    tri_s[gsl(g), :] = tri_b

        # ---- preload phase: group ray state -> registers, once per
        # iteration (scratch reads inside slab/tri_test would otherwise
        # re-load per pop and eat the overlap win) ----
        gstate = []
        for g in range(groups):
            gstate.append(dict(
                ox=rox_s[gsl(g), :], oy=roy_s[gsl(g), :], oz=roz_s[gsl(g), :],
                ix=rix_s[gsl(g), :], iy=riy_s[gsl(g), :], iz=riz_s[gsl(g), :],
                oxi=oxi_s[gsl(g), :], oyi=oyi_s[gsl(g), :],
                ozi=ozi_s[gsl(g), :],
                kx=kx_s[gsl(g), :], ky=ky_s[gsl(g), :], kz=kz_s[gsl(g), :],
                sx=sx_s[gsl(g), :], sy=sy_s[gsl(g), :], sz=sz_s[gsl(g), :]))

        # ---- pop phase: `pops` nodes per group ----
        allslots = []
        for g in range(groups):
            sp0 = scal_ref[g, Q_SP]
            slots = []
            for p in range(pops):
                act = sp0 > p
                spi = jnp.maximum(sp0 - 1 - p, 0)
                idx = stack_ref[g * STACKB + spi]
                idx = jnp.where(act, idx, 0)
                w = meta_ref[idx]
                ax = w & 3
                cnt0 = (w >> 2) & 15
                payload = (w >> 6) & 0x3FFFFFF
                cnt = jnp.where(act, cnt0, 0)
                blk = jnp.where(cnt0 > 0, payload, 0)
                nrow = nodes_ref[pl.ds(idx >> 3, 1), :]
                rec = pltpu.roll(nrow, -(idx & 7) * 16, 1)[:, :16]
                tb = tris_ref[pl.ds(blk, 1), :]
                slots.append([act, idx + 1, payload, cnt, blk, ax, rec, tb])
            allslots.append(slots)

        # ---- slab phase ----
        allhits = []
        for g in range(groups):
            t_best0 = ts_s[gsl(g), :]
            hits = []
            for p in range(pops):
                act, left, payload, cnt, blk, ax, rec, tb = allslots[g][p]
                gate = jnp.where(act & (cnt == 0), 1, 0) \
                    + jnp.zeros((rows, LANES), jnp.int32)
                hit_l = slab(gstate[g], bc(rec[:, 0:1]), bc(rec[:, 1:2]),
                             bc(rec[:, 2:3]), bc(rec[:, 3:4]),
                             bc(rec[:, 4:5]), bc(rec[:, 5:6]),
                             t_best0) & (gate > 0)
                hit_r = slab(gstate[g], bc(rec[:, 6:7]), bc(rec[:, 7:8]),
                             bc(rec[:, 8:9]), bc(rec[:, 9:10]),
                             bc(rec[:, 10:11]), bc(rec[:, 11:12]),
                             t_best0) & (gate > 0)
                hits.append((hit_l, hit_r))
            allhits.append(hits)

        # ---- leaf phase ----
        for g in range(groups):
            blk_any_col = scal_ref[g, Q_ANY] + jnp.zeros((rows, LANES),
                                                         jnp.int32)
            for p in range(pops):
                act, left, payload, cnt, blk, ax, rec, tb = allslots[g][p]

                @pl.when(cnt > 0)
                def _leaf(g=g, tb=tb, cnt=cnt, blk=blk,
                          blk_any_col=blk_any_col):
                    leaf_blast(g, gstate[g], tb, cnt, blk, blk_any_col)

        # ---- push phase + retire ----
        more = False
        for g in range(groups):
            sp0 = scal_ref[g, Q_SP]
            # vote weight: next power of two above the max left-hit count so
            # the two counts unpack with AND/shift instead of % (the scalar
            # modulo costs ~10 cycles per pop)
            W = 2 * rows * LANES
            sp_s = jnp.maximum(sp0 - pops, 0)
            ovf = scal_ref[g, Q_OVF]
            for p in reversed(range(pops)):
                act, left, payload, cnt, blk, ax, rec, tb = allslots[g][p]
                hit_l, hit_r = allhits[g][p]
                v = jnp.sum(jnp.where(hit_l, 1, 0) + jnp.where(hit_r, W, 0))
                hl = jnp.where((v & (W - 1)) > 0, 1, 0)
                hr = jnp.where(v >= W, 1, 0)
                swap = jnp.where(ax == 0, scal_ref[g, Q_SW + 0],
                                 jnp.where(ax == 1, scal_ref[g, Q_SW + 1],
                                           scal_ref[g, Q_SW + 2])) > 0
                near = jnp.where(swap, payload, left)
                far = jnp.where(swap, left, payload)
                h_near = jnp.where(swap, hr, hl)
                h_far = jnp.where(swap, hl, hr)
                stack_ref[g * STACKB + jnp.minimum(sp_s, STACKB - 1)] = far
                stack_ref[g * STACKB
                          + jnp.minimum(sp_s + h_far, STACKB - 1)] = near
                ovf = jnp.maximum(ovf, jnp.where(
                    sp_s + h_far + h_near > STACKB - 1, 1, 0))
                sp_s = jnp.minimum(sp_s + h_far + h_near, STACKB - 1)
            scal_ref[g, Q_OVF] = ovf
            cur = scal_ref[g, Q_CUR]
            live = cur >= 0
            all_hit = jnp.sum(jnp.where(tri_s[gsl(g), :] >= 0, 1, 0)) \
                == rows * LANES
            retire_early = all_hit & ((scal_ref[g, Q_ANY] > 0)
                                      if not any_hit else True)
            sp_s = jnp.where(retire_early, 0, sp_s)
            scal_ref[g, Q_SP] = sp_s
            done = live & (sp_s == 0)

            @pl.when(done)
            def _retire(g=g, cur=cur):
                sl = pl.ds(cur * rows, rows)
                t_out[sl, :] = ts_s[gsl(g), :]
                tri_out[sl, :] = tri_s[gsl(g), :]
                it_out[cur] = (it + 1 - scal_ref[g, Q_IT0]) \
                    | (scal_ref[g, Q_OVF] << 24)
                scal_ref[g, Q_CUR] = -1

            more = jnp.logical_or(more, sp_s > 0)
        more = jnp.logical_or(more, scal_ref[groups, 0] < nblocks)
        return (it + 1, more)

    jax.lax.while_loop(lambda c: c[1], body, (0, True))


def _kernel_block4_all(meta4_ref, axs4_ref, anyhit_ref, sslot_ref,
                       nodes4_ref, tris_ref, seed_ref,
                       ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tm_ref,
                       t_out, tri_out, b1_out, b2_out, it_out,
                       stack_ref, sp_ref, ts_ref, tris_scr, b1s_ref, b2s_ref,
                       *, any_hit: bool, rows: int, pops: int, nblocks: int,
                       dbg_skip_leaf: bool = False):
    """4-wide mega-packet traversal: same wavefront contract as
    _kernel_block_all but over the collapsed BVH4 tables.

    Stack entries ARE the pack-time slot words: internal -> BVH4 node id,
    leaf -> LEAF_TAG | cnt<<26 | leaf block. A pop of an internal entry
    slab-tests its 4 slots and pushes the hit slot words far-to-near
    (ordered by the grouping node's 3 stored split axes x the block's
    majority direction signs); a pop of a leaf entry runs the 8-triangle
    block test. Versus the 2-wide walk this never tests the skipped
    level's boxes (~half the internal slab work) and nearly halves
    iterations. it_out[b] carries iterations | (stack-overflow flag << 24)
    — no silent stack truncation (r3 advisor)."""
    f32 = jnp.float32
    tiny = f32(1e-20)

    def block_body(b, _):
        sl = pl.ds(b * rows, rows)
        blk_any = (anyhit_ref[b] > 0) if not any_hit else True
        ox, oy, oz = ox_ref[sl, :], oy_ref[sl, :], oz_ref[sl, :]
        dx, dy, dz = dx_ref[sl, :], dy_ref[sl, :], dz_ref[sl, :]
        tm = tm_ref[sl, :]
        inv_dx = 1.0 / jnp.where(jnp.abs(dx) < tiny, jnp.where(dx < 0, -tiny, tiny), dx)
        inv_dy = 1.0 / jnp.where(jnp.abs(dy) < tiny, jnp.where(dy < 0, -tiny, tiny), dy)
        inv_dz = 1.0 / jnp.where(jnp.abs(dz) < tiny, jnp.where(dz < 0, -tiny, tiny), dz)
        oxi = ox * inv_dx
        oyi = oy * inv_dy
        ozi = oz * inv_dz
        adx, ady, adz = jnp.abs(dx), jnp.abs(dy), jnp.abs(dz)
        kz = jnp.where((adx >= ady) & (adx >= adz), 0, jnp.where(ady >= adz, 1, 2))
        kx = (kz + 1) % 3
        ky = (kx + 1) % 3
        dpz = _pick(dx, dy, dz, kz)
        dpx = _pick(dx, dy, dz, kx)
        dpy = _pick(dx, dy, dz, ky)
        sz = 1.0 / jnp.where(dpz == 0.0, tiny, dpz)
        sx = -dpx * sz
        sy = -dpy * sz
        half = rows * LANES // 2
        swap_axis = [jnp.sum(jnp.where(dx < 0.0, 1, 0)) > half,
                     jnp.sum(jnp.where(dy < 0.0, 1, 0)) > half,
                     jnp.sum(jnp.where(dz < 0.0, 1, 0)) > half]

        ts_ref[:] = tm
        tris_scr[:] = jnp.full((rows, LANES), -1, jnp.int32)
        b1s_ref[:] = jnp.zeros((rows, LANES), f32)
        b2s_ref[:] = jnp.zeros((rows, LANES), f32)
        stack_ref[0] = 0          # root = internal BVH4 node 0
        sp_ref[0] = 1

        zrow = jnp.zeros((rows, 1), f32)

        def bc(v):
            return v + zrow

        def slab(lo_x, lo_y, lo_z, hi_x, hi_y, hi_z, t_best):
            t0x = lo_x * inv_dx - oxi
            t1x = hi_x * inv_dx - oxi
            t0y = lo_y * inv_dy - oyi
            t1y = hi_y * inv_dy - oyi
            t0z = lo_z * inv_dz - ozi
            t1z = hi_z * inv_dz - ozi
            tn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
                             jnp.minimum(t0z, t1z))
            tf = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
                             jnp.maximum(t0z, t1z)) * f32(1.00000024)
            return (tn <= tf) & (tf > 0.0) & (tn < t_best)

        def tri_test(v, t_best):
            p0x, p0y, p0z = v[:, 0:1], v[:, 1:2], v[:, 2:3]
            p1x, p1y, p1z = v[:, 3:4], v[:, 4:5], v[:, 5:6]
            p2x, p2y, p2z = v[:, 6:7], v[:, 7:8], v[:, 8:9]

            def shear(px, py, pz):
                tx, ty, tz = px - ox, py - oy, pz - oz
                vx = _pick(tx, ty, tz, kx)
                vy = _pick(tx, ty, tz, ky)
                vz = _pick(tx, ty, tz, kz)
                return vx + sx * vz, vy + sy * vz, vz * sz

            x0, y0, z0 = shear(p0x, p0y, p0z)
            x1, y1, z1 = shear(p1x, p1y, p1z)
            x2, y2, z2 = shear(p2x, p2y, p2z)
            e0 = x1 * y2 - y1 * x2
            e1 = x2 * y0 - y2 * x0
            e2 = x0 * y1 - y0 * x1
            same = ((e0 >= 0) & (e1 >= 0) & (e2 >= 0)) | \
                ((e0 <= 0) & (e1 <= 0) & (e2 <= 0))
            det = e0 + e1 + e2
            t_sc = e0 * z0 + e1 * z1 + e2 * z2
            pos = det > 0
            t_ok = (pos & (t_sc > f32(1e-4) * det) & (t_sc < t_best * det)) \
                | (~pos & (t_sc < f32(1e-4) * det) & (t_sc > t_best * det))
            hit = same & (det != 0.0) & t_ok
            inv_det = 1.0 / jnp.where(det == 0.0, tiny, det)
            return hit, t_sc * inv_det, e1 * inv_det, e2 * inv_det

        scnt = sslot_ref[8]

        @pl.when(scnt > 0)
        def _seed():
            z16s = jnp.zeros((rows, 16), f32)
            t_best = ts_ref[:]
            tri_b = tris_scr[:]
            b1_b = b1s_ref[:]
            b2_b = b2s_ref[:]
            scnt_col = scnt + jnp.zeros((rows, LANES), jnp.int32)
            anyv = jnp.where(blk_any, 1, 0) + jnp.zeros((rows, LANES),
                                                        jnp.int32)
            sb = seed_ref[0:1, :]
            for j in range(LEAF_TRIS):
                hit, t, b1, b2 = tri_test(sb[:, j * 16:(j + 1) * 16] + z16s,
                                          t_best)
                ok = hit & (scnt_col > j)
                t_best = jnp.where(ok, jnp.where(anyv > 0, 0.0, t), t_best)
                tri_b = jnp.where(ok, sslot_ref[j], tri_b)
                b1_b = jnp.where(ok, b1, b1_b)
                b2_b = jnp.where(ok, b2, b2_b)
            ts_ref[:] = t_best
            tris_scr[:] = tri_b
            b1s_ref[:] = b1_b
            b2s_ref[:] = b2_b

        def body(carry):
            it, _, ovf0 = carry
            sp0 = sp_ref[0]
            slots = []
            for p in range(pops):
                act = sp0 > p
                spi = jnp.maximum(sp0 - 1 - p, 0)
                e = stack_ref[spi]
                e = jnp.where(act, e, LEAF_TAG)   # inactive: leaf, cnt 0
                is_leaf = (e >> 30) & 1
                cnt = jnp.where(is_leaf > 0, (e >> 26) & 15, 0)
                pay = e & 0x3FFFFFF
                blk = jnp.where(is_leaf > 0, pay, 0)
                nid = jnp.where(is_leaf > 0, 0, pay)
                ws = [meta4_ref[4 * nid + j] for j in range(4)]
                axw = axs4_ref[nid]
                nrow = nodes4_ref[pl.ds(nid >> 2, 1), :]
                rec = pltpu.roll(nrow, -(nid & 3) * 32, 1)[:, :32]
                tb = tris_ref[pl.ds(blk, 1), :]
                is_int = act & (is_leaf == 0)
                slots.append([is_int, cnt, blk, ws, axw, rec, tb])

            t_best0 = ts_ref[:]
            hits = []
            for p in range(pops):
                is_int, cnt, blk, ws, axw, rec, tb = slots[p]
                gate = jnp.where(is_int, 1, 0) \
                    + jnp.zeros((rows, LANES), jnp.int32)
                hs = []
                for j in range(4):
                    o6 = j * 6
                    hs.append(slab(bc(rec[:, o6:o6 + 1]), bc(rec[:, o6 + 1:o6 + 2]),
                                   bc(rec[:, o6 + 2:o6 + 3]), bc(rec[:, o6 + 3:o6 + 4]),
                                   bc(rec[:, o6 + 4:o6 + 5]), bc(rec[:, o6 + 5:o6 + 6]),
                                   t_best0) & (gate > 0))
                hits.append(hs)

            z16 = jnp.zeros((rows, 16), f32)
            for p in range(pops if not dbg_skip_leaf else 0):
                is_int, cnt, blk, ws, axw, rec, tb = slots[p]

                @pl.when(cnt > 0)
                def _leaf(cnt=cnt, blk=blk, tb=tb):
                    t_best = ts_ref[:]
                    tri_b = tris_scr[:]
                    b1_b = b1s_ref[:]
                    b2_b = b2s_ref[:]
                    cnt_col = cnt + jnp.zeros((rows, LANES), jnp.int32)
                    anyv = jnp.where(blk_any, 1, 0) + jnp.zeros((rows, LANES),
                                                                jnp.int32)
                    for j in range(LEAF_TRIS):
                        hit, t, b1, b2 = tri_test(
                            tb[:, j * 16:(j + 1) * 16] + z16, t_best)
                        ok = hit & (cnt_col > j)
                        t_best = jnp.where(ok, jnp.where(anyv > 0, 0.0, t),
                                           t_best)
                        tri_b = jnp.where(ok, blk * LEAF_TRIS + j, tri_b)
                        b1_b = jnp.where(ok, b1, b1_b)
                        b2_b = jnp.where(ok, b2, b2_b)
                    ts_ref[:] = t_best
                    tris_scr[:] = tri_b
                    b1s_ref[:] = b1_b
                    b2s_ref[:] = b2_b

            W = rows * LANES + 1
            sp_s = jnp.maximum(sp0 - pops, 0)
            ovf = ovf0
            for p in reversed(range(pops)):
                is_int, cnt, blk, ws, axw, rec, tb = slots[p]
                h0, h1, h2, h3 = hits[p]
                v01 = jnp.sum(jnp.where(h0, 1, 0) + jnp.where(h1, W, 0))
                v23 = jnp.sum(jnp.where(h2, 1, 0) + jnp.where(h3, W, 0))
                b0 = jnp.where(((v01 % W) > 0) & (ws[0] != 0), 1, 0)
                b1_ = jnp.where((v01 >= W) & (ws[1] != 0), 1, 0)
                b2_ = jnp.where(((v23 % W) > 0) & (ws[2] != 0), 1, 0)
                b3 = jnp.where((v23 >= W) & (ws[3] != 0), 1, 0)
                a0 = axw & 3
                a1 = (axw >> 2) & 3
                a2 = (axw >> 4) & 3

                def swp(a):
                    return jnp.where(a == 0, swap_axis[0],
                                     jnp.where(a == 1, swap_axis[1],
                                               swap_axis[2]))
                s0, s1, s2 = swp(a0), swp(a1), swp(a2)
                # near child within each pair; near pair by the parent axis
                e_ln = jnp.where(s1, ws[1], ws[0])
                e_lf = jnp.where(s1, ws[0], ws[1])
                h_ln = jnp.where(s1, b1_, b0)
                h_lf = jnp.where(s1, b0, b1_)
                e_rn = jnp.where(s2, ws[3], ws[2])
                e_rf = jnp.where(s2, ws[2], ws[3])
                h_rn = jnp.where(s2, b3, b2_)
                h_rf = jnp.where(s2, b2_, b3)
                e_ff = jnp.where(s0, e_lf, e_rf)
                e_fn = jnp.where(s0, e_ln, e_rn)
                e_nf = jnp.where(s0, e_rf, e_lf)
                e_nn = jnp.where(s0, e_rn, e_ln)
                h_ff = jnp.where(s0, h_lf, h_rf)
                h_fn = jnp.where(s0, h_ln, h_rn)
                h_nf = jnp.where(s0, h_rf, h_lf)
                h_nn = jnp.where(s0, h_rn, h_ln)
                stack_ref[jnp.minimum(sp_s, STACKB - 1)] = e_ff
                sp1 = sp_s + h_ff
                stack_ref[jnp.minimum(sp1, STACKB - 1)] = e_fn
                sp2 = sp1 + h_fn
                stack_ref[jnp.minimum(sp2, STACKB - 1)] = e_nf
                sp3 = sp2 + h_nf
                stack_ref[jnp.minimum(sp3, STACKB - 1)] = e_nn
                ovf = jnp.maximum(ovf, jnp.where(sp3 + h_nn > STACKB - 1, 1, 0))
                sp_s = jnp.minimum(sp3 + h_nn, STACKB - 1)

            all_hit = jnp.sum(jnp.where(tris_scr[:] >= 0, 1, 0)) == rows * LANES
            sp_s = jnp.where(jnp.logical_and(blk_any if not any_hit else True,
                                             all_hit), 0, sp_s)
            sp_ref[0] = sp_s
            return (it + 1, sp_s > 0, ovf)

        n_it, _, ovf = jax.lax.while_loop(lambda c: c[1], body,
                                          (0, True, jnp.int32(0)))
        t_out[sl, :] = ts_ref[:]
        tri_out[sl, :] = tris_scr[:]
        b1_out[sl, :] = b1s_ref[:]
        b2_out[sl, :] = b2s_ref[:]
        it_out[b] = n_it | (ovf << 24)
        return 0

    jax.lax.fori_loop(0, nblocks, block_body, 0)


def _morton16(q):
    """Interleave 2 x 8-bit -> 16-bit morton (q: [...,2] int32)."""
    def expand(v):
        v = v & 0xFF
        v = (v | (v << 4)) & 0x0F0F
        v = (v | (v << 2)) & 0x3333
        v = (v | (v << 1)) & 0x5555
        return v
    return expand(q[..., 0]) | (expand(q[..., 1]) << 1)


def _ray_sort_key(pb, o, d):
    """Coherence key: origin cell morton (high bits) | direction octant.

    Secondary rays scatter in memory order after a bounce; traversal cost
    is proportional to the per-128-lane-packet union of visited nodes, so
    grouping rays by spatial cell + direction octant cuts it ~2x
    (tools/bench_order.py)."""
    return _ray_sort_key_cols(pb, o[:, 0], o[:, 1], o[:, 2],
                              d[:, 0], d[:, 1], d[:, 2])


def _ray_sort_key_cols(pb, ox, oy, oz, dx, dy, dz, cells: int = 16):
    """Column-SoA form of _ray_sort_key (18-bit key at 32 cells/axis)."""
    ext = jnp.maximum(pb.whi - pb.wlo, 1e-6)
    c = float(cells)
    qx = jnp.clip((ox - pb.wlo[0]) / ext[0] * c, 0.0, c - 1).astype(jnp.int32)
    qy = jnp.clip((oy - pb.wlo[1]) / ext[1] * c, 0.0, c - 1).astype(jnp.int32)
    qz = jnp.clip((oz - pb.wlo[2]) / ext[2] * c, 0.0, c - 1).astype(jnp.int32)
    def expand(v):
        v = v & 0xFF
        v = (v | (v << 4)) & 0x0F0F
        v = (v | (v << 2)) & 0x3333
        v = (v | (v << 1)) & 0x5555
        return v
    bits = cells.bit_length() - 1
    mxz = expand(qx) | (expand(qz) << 1)
    oct_ = ((dx < 0).astype(jnp.int32)
            + 2 * (dy < 0).astype(jnp.int32)
            + 4 * (dz < 0).astype(jnp.int32))
    return (mxz << (3 + bits)) | (qy << 3) | oct_


POPS = 8


QUEUE_GROUPS = 3    # co-resident walks in the persistent-worker kernel


@functools.partial(jax.jit, static_argnames=("any_hit", "interpret",
                                             "with_iters", "rows", "pops",
                                             "dbg_skip_leaf", "leaf_gate",
                                             "use4", "queue"))
def _traverse_cols(pb: PallasBVH, ox, oy, oz, dx, dy, dz, tm,
                   any_hit=False, interpret=False, with_iters=False,
                   rows=ROWS, pops=POPS, anyhit_mask=None,
                   dbg_skip_leaf=False, leaf_gate=False, use4=None,
                   queue=None):
    """Column-SoA mega-packet traversal (block1 mode only).

    Takes per-component [N] ray columns — [N,3] column slices and
    concatenates cost ~1-2 ms EACH inside a large XLA module (layout
    conversions), so callers on the hot path keep rays as columns across
    the traversal boundary.
    """
    N = ox.shape[0]
    BLK = rows * LANES
    npad = (-N) % BLK
    Np = N + npad
    R = Np // LANES
    far = pb.whi + (pb.whi - pb.wlo) + 1.0

    # pad rays start beyond the world's max corner pointing away: the root
    # slab test fails immediately, so padding adds no node visits (with
    # tmax=0 alone, origins inside the world still walk their whole subtree)
    def padc(v, c):
        return jnp.concatenate([v, jnp.full((npad,), c, jnp.float32)], 0)

    tm = jnp.broadcast_to(jnp.asarray(tm, jnp.float32), (N,))
    cols = [padc(ox, far[0]), padc(oy, far[1]), padc(oz, far[2]),
            padc(dx, 0.0), padc(dy, 0.0), padc(dz, 1.0), padc(tm, 0.0)]

    def comp(v):
        return v.reshape(R, LANES)

    nblocks = Np // BLK
    assert pb.metas.shape[0] <= SMEM_META_MAX, "node table exceeds SMEM"
    if anyhit_mask is None:
        ah_blocks = jnp.full((nblocks,), 1 if any_hit else 0, jnp.int32)
    else:
        # per-block flag: 1 only when every ray of the block is
        # occlusion-only (straddling blocks stay closest-hit, which is
        # still a correct occlusion answer)
        m = jnp.concatenate([anyhit_mask.astype(jnp.int32),
                             jnp.zeros((npad,), jnp.int32)])
        ah_blocks = (jnp.sum(m.reshape(nblocks, BLK), axis=1) == BLK
                     ).astype(jnp.int32)
    # default OFF: measured on the 73.7k-tri knot (64K-ray wavefronts),
    # BVH4 cuts iterations 130 -> 82 (bounce) but total box tests RISE
    # (82*32 vs 130*16): in a 1024-ray union walk nearly every visited
    # node's both children hit, so BVH2's parent tests are not wasted
    # while BVH4 pays 4 grandchild tests on sparse subtrees. Net: bounce
    # 13.3 -> 13.7 ms large / 5.0 -> 4.7 ms small. Kept as a bit-exact
    # (tested) alternative for coherent/small-union workloads.
    if use4 is None:
        use4 = False
    out_shapes = [jax.ShapeDtypeStruct((R, LANES), jnp.float32),
                  jax.ShapeDtypeStruct((R, LANES), jnp.int32),
                  jax.ShapeDtypeStruct((R, LANES), jnp.float32),
                  jax.ShapeDtypeStruct((R, LANES), jnp.float32),
                  jax.ShapeDtypeStruct((nblocks,), jnp.int32)]
    vm = pl.BlockSpec(memory_space=pltpu.VMEM)
    sm = pl.BlockSpec(memory_space=pltpu.SMEM)
    if queue is None:
        queue = 0 if (use4 and pb.nodes4 is not None) or dbg_skip_leaf \
            or leaf_gate else QUEUE_GROUPS
    if queue and not (use4 and pb.nodes4 is not None):
        G = queue
        kern = functools.partial(_kernel_block_queue, any_hit=any_hit,
                                 rows=rows, pops=pops, nblocks=nblocks,
                                 groups=G)
        fscr = lambda: pltpu.VMEM((G * rows, LANES), jnp.float32)
        iscr = lambda: pltpu.VMEM((G * rows, LANES), jnp.int32)
        t, tri, iters = pl.pallas_call(
            kern,
            out_shape=[out_shapes[0], out_shapes[1], out_shapes[4]],
            in_specs=[sm, sm, sm, vm, vm, vm] + [vm] * 7,
            out_specs=[vm, vm, sm],
            scratch_shapes=[pltpu.SMEM((G * STACKB,), jnp.int32),
                            pltpu.SMEM((G + 1, 8), jnp.int32),
                            fscr(), fscr(), fscr(),      # rox/roy/roz
                            fscr(), fscr(), fscr(),      # inv d
                            fscr(), fscr(), fscr(),      # o*inv
                            iscr(), iscr(), iscr(),      # kx/ky/kz
                            fscr(), fscr(), fscr(),      # sx/sy/sz
                            fscr(), iscr()],             # ts/tri
            interpret=interpret,
        )(pb.metas, ah_blocks, pb.seed_slots, pb.nodes, pb.tris, pb.seed,
          *[comp(c) for c in cols])
        slot = tri.reshape(-1)[:N]
        tri_id = jnp.where(slot >= 0, pb.order[jnp.maximum(slot, 0)], -1)
        # b1/b2 deferred: recomputed at SI assembly (kernel_bary)
        th = TriHit(t.reshape(-1)[:N], tri_id, None, None, slot)
        if with_iters:
            return th, iters
        return th
    if use4 and pb.nodes4 is not None:
        kern = functools.partial(_kernel_block4_all, any_hit=any_hit,
                                 rows=rows, pops=pops, nblocks=nblocks,
                                 dbg_skip_leaf=dbg_skip_leaf)
        t, tri, b1, b2, iters = pl.pallas_call(
            kern,
            out_shape=out_shapes,
            in_specs=[sm, sm, sm, sm, vm, vm, vm] + [vm] * 7,
            out_specs=[vm] * 4 + [sm],
            scratch_shapes=[pltpu.SMEM((STACKB,), jnp.int32),
                            pltpu.SMEM((1,), jnp.int32),
                            pltpu.VMEM((rows, LANES), jnp.float32),
                            pltpu.VMEM((rows, LANES), jnp.int32),
                            pltpu.VMEM((rows, LANES), jnp.float32),
                            pltpu.VMEM((rows, LANES), jnp.float32)],
            interpret=interpret,
        )(pb.meta4, pb.axs4, ah_blocks, pb.seed_slots, pb.nodes4, pb.tris,
          pb.seed, *[comp(c) for c in cols])
    else:
        kern = functools.partial(_kernel_block_all, any_hit=any_hit, rows=rows,
                                 pops=pops, nblocks=nblocks,
                                 dbg_skip_leaf=dbg_skip_leaf, leaf_gate=leaf_gate)
        t, tri, b1, b2, iters = pl.pallas_call(
            kern,
            out_shape=out_shapes,
            in_specs=[sm, sm, sm, vm, vm, vm] + [vm] * 7,
            out_specs=[vm] * 4 + [sm],
            scratch_shapes=[pltpu.SMEM((STACKB,), jnp.int32),
                            pltpu.SMEM((1,), jnp.int32),
                            pltpu.VMEM((rows, LANES), jnp.float32),
                            pltpu.VMEM((rows, LANES), jnp.int32),
                            pltpu.VMEM((rows, LANES), jnp.float32),
                            pltpu.VMEM((rows, LANES), jnp.float32),
                            pltpu.VMEM((rows, LANES), jnp.int32)],
            interpret=interpret,
        )(pb.metas, ah_blocks, pb.seed_slots, pb.nodes, pb.tris, pb.seed,
          *[comp(c) for c in cols])
    slot = tri.reshape(-1)[:N]
    # NB: the order gather is dead code (DCE'd) for callers that consume
    # attributes via the slot-keyed packed table (scene/intersect.py)
    tri_id = jnp.where(slot >= 0, pb.order[jnp.maximum(slot, 0)], -1)
    th = TriHit(t.reshape(-1)[:N], tri_id,
                b1.reshape(-1)[:N], b2.reshape(-1)[:N], slot)
    if with_iters:
        return th, iters
    return th


@functools.partial(jax.jit, static_argnames=("any_hit", "interpret", "sort",
                                             "with_iters", "rows", "pops",
                                             "mode", "use4",
                                             "dbg_skip_leaf", "dbg_push_all"))
def _traverse(pb: PallasBVH, o, d, t_max, any_hit=False, interpret=False,
              sort=False, with_iters=False, rows=ROWS, pops=POPS,
              mode="block1", anyhit_mask=None, use4=None,
              dbg_skip_leaf=False, dbg_push_all=False):
    if sort:
        perm = jnp.argsort(_ray_sort_key(pb, o, d))
        tm = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (o.shape[0],))
        th = _traverse(pb, o[perm], d[perm], tm[perm], any_hit=any_hit,
                       interpret=interpret, sort=False, rows=rows, pops=pops,
                       mode=mode)
        unsort = lambda v: jnp.zeros_like(v).at[perm].set(v)
        return TriHit(unsort(th.t), unsort(th.tri), unsort(th.b1),
                      unsort(th.b2), unsort(th.slot))
    smem_meta = pb.metas.shape[0] <= SMEM_META_MAX
    if mode == "block1" and smem_meta:
        ot = o.T
        dt_ = d.T
        return _traverse_cols(pb, ot[0], ot[1], ot[2], dt_[0], dt_[1], dt_[2],
                              t_max, any_hit=any_hit, interpret=interpret,
                              with_iters=with_iters, rows=rows, pops=pops,
                              anyhit_mask=anyhit_mask, use4=use4,
                              dbg_skip_leaf=dbg_skip_leaf)
    N = o.shape[0]
    BLK = rows * LANES
    npad = (-N) % BLK
    # pad rays start beyond the world's max corner pointing away: the root
    # slab test fails immediately, so padding adds no node visits (with
    # tmax=0 alone, origins inside the world still walk their whole subtree)
    pad_o = jnp.broadcast_to(pb.whi + (pb.whi - pb.wlo) + 1.0, (npad, 3))
    zero_pad_d = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], jnp.float32), (npad, 3))
    o_p = jnp.concatenate([o, pad_o.astype(jnp.float32)], 0)
    d_p = jnp.concatenate([d, zero_pad_d], 0)
    tm = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (N,))
    tm_p = jnp.concatenate([tm, jnp.zeros((npad,), jnp.float32)], 0)
    Np = N + npad
    R = Np // LANES

    def comp(v):
        return v.reshape(R, LANES)

    grid = Np // BLK
    blk = pl.BlockSpec((rows, LANES), lambda i: (i, 0))
    if mode == "block" and smem_meta:
        kern = functools.partial(_kernel_block, any_hit=any_hit, rows=rows,
                                 pops=pops)
        scratch = [pltpu.SMEM((STACKB,), jnp.int32),
                   pltpu.SMEM((1,), jnp.int32)]
    else:
        kern = functools.partial(_kernel, any_hit=any_hit, rows=rows,
                                 smem_meta=smem_meta,
                                 pops=pops if smem_meta else 1,
                                 dbg_skip_leaf=dbg_skip_leaf,
                                 dbg_push_all=dbg_push_all)
        scratch = [pltpu.SMEM((rows * STACK,), jnp.int32),
                   pltpu.SMEM((rows,), jnp.int32),
                   pltpu.VMEM((rows, 128), jnp.int32)]
    out_shapes = [jax.ShapeDtypeStruct((R, LANES), jnp.float32),
                  jax.ShapeDtypeStruct((R, LANES), jnp.int32),
                  jax.ShapeDtypeStruct((R, LANES), jnp.float32),
                  jax.ShapeDtypeStruct((R, LANES), jnp.float32),
                  jax.ShapeDtypeStruct((grid,), jnp.int32)]  # iters/block
    t, tri, b1, b2, iters = pl.pallas_call(
        kern,
        grid=(grid,),
        out_shape=out_shapes,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM if smem_meta
                               else pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)]
        + [blk] * 7,
        out_specs=[blk] * 4
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],  # iters: whole-array SMEM,
        # written at program_id — a (1,1) blocked output fails Mosaic's
        # (8,128)-divisibility check on real TPU
        scratch_shapes=scratch,
        interpret=interpret,
    )(pb.metas if smem_meta else pb.meta, pb.nodes, pb.tris,
      comp(o_p[:, 0]), comp(o_p[:, 1]), comp(o_p[:, 2]),
      comp(d_p[:, 0]), comp(d_p[:, 1]), comp(d_p[:, 2]), comp(tm_p))
    slot = tri.reshape(-1)[:N]
    tri_id = jnp.where(slot >= 0, pb.order[jnp.maximum(slot, 0)], -1)
    th = TriHit(t.reshape(-1)[:N], tri_id,
                b1.reshape(-1)[:N], b2.reshape(-1)[:N], slot)
    if with_iters:
        return th, iters
    return th


def far_miss_rays(pb: PallasBVH, n):
    """(o, d) for rays that miss the BVH root in one slab test — used to
    zero the traversal cost of dead/terminated wavefront lanes."""
    o = jnp.broadcast_to(pb.whi + (pb.whi - pb.wlo) + 1.0, (n, 3))
    d = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], jnp.float32), (n, 3))
    return o.astype(jnp.float32), d


def intersect_bvh_pallas(pb: PallasBVH, o, d, t_max, any_hit: bool = False,
                         interpret: bool = False, sort: bool = False,
                         anyhit_mask=None) -> TriHit:
    """Closest-hit (or any-hit) via the Pallas kernel. Same contract as
    accel/traverse.py::intersect_bvh. sort=True re-orders lanes by a
    spatial-coherence key before traversal; render wavefronts are dispatched
    in pixel-Morton order and stay origin-coherent across bounces, so the
    default is no sort (measured: sorting real bounce wavefronts cuts node
    visits <10% and costs an argsort + gathers + unsort scatters).
    anyhit_mask [N] bool marks occlusion-only lanes of a merged launch:
    whole blocks of them retire each lane at its first hit."""
    return _traverse(pb, o, d, t_max, any_hit=any_hit, interpret=interpret,
                     sort=sort, anyhit_mask=anyhit_mask)
