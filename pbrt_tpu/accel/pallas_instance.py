"""Two-level BVH traversal for object instances + animated shapes (Pallas).

Reference: core/src/primitives/transformed_primitive.rs:16 — a shared
prototype behind a per-instance (possibly animated) transform; rays are
transformed INTO prototype space at the boundary, the prototype's own BVH
is traversed there, and hits keep the world-space t metric (an affine map
preserves the o + t*d parameterization). api/src/lib.rs:813-874 wraps
animated shapes the same way.

TPU design (one mega-packet block per 1024 rays, like
pallas_traverse._kernel_block_all):

  * ONE unified node/meta table: the TOP tree over instance world AABBs
    (its leaves are instance-enter records, meta cnt == 15) followed by
    every prototype's subtree, child indices pre-offset at pack time;
  * entering an instance pushes a RESTORE sentinel then the prototype
    root; the CURRENT ray set (and its traversal invariants) live in the
    while-loop carry, so "restore" just re-selects the original world
    rays — no scratch ray banks and exactly one nesting level, which is
    all the reference supports (instances cannot contain instances);
  * the per-instance transform is evaluated PER LANE at the lane's ray
    time. Static scenes use the matrix lerp M(t) = M0 + t*(M1 - M0)
    (exact, zero extra cost); scenes with any animated instance compile
    the TRS path instead (static `trs` flag): pack-time polar
    decomposition of both w2p keyframes (animated_transform.rs
    decompose) and in-kernel quaternion SLERP + lerped T/S, with
    motion-SAMPLED top-level AABBs (17 times + step pad) standing in for
    the reference's exact BoundPointMotion (animated_transform.rs:1203);
  * hits record the instance id; the triangle id maps through `order`
    into the GLOBAL triangle tables, so downstream shading reuses the
    standard uv/prim/material gathers and only the geometric frame needs
    the instance-to-world transform.

Scenes without instances never touch this kernel (separate launch).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from pbrt_tpu.accel.bvh import BVH, build_bvh
from pbrt_tpu.accel.traverse import TriHit

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS = 8
LANES = 128
STACKI = 160
RESTORE = -2          # stack sentinel: leave the current instance
IMAT_STRIDE = 56      # per-instance SMEM floats: w2p0[12], (w2p1-w2p0)[12],
                      # then the TRS decomposition of both w2p keyframes:
                      # T0[3] T1[3] q0[4] q1[4] S0[9] S1[9]
                      # (animated_transform.rs decompose: M = T R S with R
                      # from iterative polar decomposition, S = R^-1 M)


def _decompose_trs(m):
    """4x4 affine -> (T[3], q[4] xyzw, S[3,3]) per animated_transform.rs
    decompose (polar iteration, then S = R^-1 M)."""
    T = np.asarray(m, np.float64)[:3, 3].copy()
    M3 = np.asarray(m, np.float64)[:3, :3].copy()
    R = M3.copy()
    for _ in range(100):
        Rn = 0.5 * (R + np.linalg.inv(R.T))
        if np.abs(Rn - R).max() < 1e-9:
            R = Rn
            break
        R = Rn
    S = np.linalg.inv(R) @ M3
    # rotation matrix -> quaternion (w last)
    tr = np.trace(R)
    if tr > 0:
        s = np.sqrt(tr + 1.0) * 2
        q = np.array([(R[2, 1] - R[1, 2]) / s, (R[0, 2] - R[2, 0]) / s,
                      (R[1, 0] - R[0, 1]) / s, 0.25 * s])
    else:
        i = int(np.argmax(np.diag(R)))
        j, k = (i + 1) % 3, (i + 2) % 3
        s = np.sqrt(max(1.0 + R[i, i] - R[j, j] - R[k, k], 1e-12)) * 2
        q = np.zeros(4)
        q[i] = 0.25 * s
        q[j] = (R[j, i] + R[i, j]) / s
        q[k] = (R[k, i] + R[i, k]) / s
        q[3] = (R[k, j] - R[j, k]) / s
    q = q / np.linalg.norm(q)
    return T, q, S


def _slerp_trs_host(d0, d1, t):
    """Host mirror of the kernel's TRS interpolation (motion bounds)."""
    T0, q0, S0 = d0
    T1, q1, S1 = d1
    if np.dot(q0, q1) < 0:
        q1 = -q1
    d = np.clip(np.dot(q0, q1), -1.0, 1.0)
    th = np.arccos(d)
    if np.sin(th) < 1e-4:
        q = (1 - t) * q0 + t * q1
    else:
        q = (np.sin((1 - t) * th) * q0 + np.sin(t * th) * q1) / np.sin(th)
    q = q / np.linalg.norm(q)
    x, y, z, w = q
    R = np.array([[1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
                  [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
                  [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)]])
    m = np.eye(4)
    m[:3, :3] = R @ (S0 + t * (S1 - S0))
    m[:3, 3] = T0 + t * (T1 - T0)
    return m


class InstanceBVH(NamedTuple):
    """Unified top+prototype tables (pytree of device arrays)."""
    nodes: jnp.ndarray    # [ceil(M/8), 128] f32 — children bounds, 16/node
    metas: jnp.ndarray    # [M] i32 (SMEM) — ax|cnt<<2|payload<<6; cnt==15
                          # marks an instance-enter leaf (payload = inst id)
    tris: jnp.ndarray     # [L, 128] f32 — 8-tri leaf blocks (prototype space)
    order: jnp.ndarray    # [L*8] i32 — leaf slot -> GLOBAL triangle row
    imat: jnp.ndarray     # [I*24] f32 (SMEM) — per-instance w2p keyframes
    iroot: jnp.ndarray    # [I] i32 (SMEM) — prototype root node index
    ianim: jnp.ndarray    # [I] i32 (SMEM) — 1 if animated
    i2w: jnp.ndarray      # [I, 2, 16] f32 — keyframe instance->world (4x4
                          #   row-major padded) for shading-frame transforms
    w2p: jnp.ndarray      # [I, 2, 16] f32 — keyframes world->prototype
    wlo: jnp.ndarray      # [3] top-level world bounds
    whi: jnp.ndarray


def _aabb_transform(lo, hi, m):
    """World AABB of a prototype-space AABB under 4x4 m (prototype->world)."""
    corners = np.array([[x, y, z] for x in (lo[0], hi[0])
                        for y in (lo[1], hi[1]) for z in (lo[2], hi[2])])
    w = corners @ m[:3, :3].T + m[:3, 3]
    return w.min(0), w.max(0)


def pack_instance_world(proto_tri_bounds, proto_tri_global,
                        instances):
    """Build + pack the two-level structure.

    proto_tri_bounds: list over prototypes of ([T,3] lo, [T,3] hi) triangle
      bounds in prototype space;
    proto_tri_global: list over prototypes of [T] GLOBAL tri row ids, in
      the same order (with [T,3,3] vertices available via pack step below);
    instances: list of dicts {proto, m_p2w0, m_p2w1, m_w2p0, m_w2p1,
      animated} (4x4 numpy).
    Also needs the prototype triangle VERTICES to fill leaf blocks — they
    are passed packed inside proto_tri_bounds' third element (p0, p1, p2).
    """
    # ---- prototype subtrees ----
    proto_pack = []
    proto_bounds = []
    for (lo, hi, p0, p1, p2), gids in zip(proto_tri_bounds, proto_tri_global):
        eps = 1e-5 * np.maximum(np.abs(lo) + np.abs(hi), 1.0)
        # host mirror avoids device readback (accel/bvh.py HostBVH note)
        _, bvh = build_bvh(lo - eps, hi + eps, with_host=True)
        proto_pack.append((bvh, p0, p1, p2, gids))
        root = np.asarray(bvh.packed)[0]
        blo = np.minimum(root[0:3], root[6:9])
        bhi = np.maximum(root[3:6], root[9:12])
        proto_bounds.append((blo, bhi))

    # ---- top tree over instance world AABBs (leaf_size=1: one instance
    # per leaf so the meta payload can name it) ----
    n_inst = len(instances)
    ilo = np.zeros((n_inst, 3), np.float32)
    ihi = np.zeros((n_inst, 3), np.float32)
    for i, inst in enumerate(instances):
        blo, bhi = proto_bounds[inst["proto"]]
        l0, h0 = _aabb_transform(blo, bhi, inst["m_p2w0"])
        l1, h1 = _aabb_transform(blo, bhi, inst["m_p2w1"])
        ilo[i] = np.minimum(l0, l1)
        ihi[i] = np.maximum(h0, h1)
        if inst.get("animated"):
            # motion-expanded bounds (animated_transform.rs:1203
            # BoundPointMotion): slerped corner paths are curved, so the
            # keyframe union can under-cover; sample the SAME TRS path the
            # kernel evaluates and pad by the largest inter-sample step
            dp0 = _decompose_trs(inst["m_w2p0"])
            dp1 = _decompose_trs(inst["m_w2p1"])
            prev = None
            step = 0.0
            for tt in np.linspace(0.0, 1.0, 17):
                # invert the kernel's exact w2p(t) path -> p2w(t)
                mt = np.linalg.inv(_slerp_trs_host(dp0, dp1, float(tt)))
                lt, ht = _aabb_transform(blo, bhi, mt)
                ilo[i] = np.minimum(ilo[i], lt)
                ihi[i] = np.maximum(ihi[i], ht)
                c = 0.5 * (lt + ht)
                if prev is not None:
                    step = max(step, float(np.abs(c - prev).max()))
                prev = c
            ilo[i] -= step
            ihi[i] += step
    _, top = build_bvh(ilo, ihi, leaf_size=1, with_host=True)

    # ---- merge node/meta/tris tables ----
    all_bounds = []   # [M,12] child-bounds rows
    all_meta = []     # packed words
    tris_blocks = []  # [*,8,16]
    order = []

    def append_tree(bvh, node_base, leaf_cb):
        """leaf_cb(prim_offset, prim_count) -> (cnt_field, payload)."""
        packed = np.asarray(bvh.packed)
        cnts = np.asarray(bvh.prim_count)
        offs = np.asarray(bvh.prim_offset)
        right = np.asarray(bvh.right_child)
        axis = np.asarray(bvh.axis)
        M = packed.shape[0]
        for ni in range(M):
            all_bounds.append(packed[ni, :12])
            if cnts[ni] > 0:
                cf, payload = leaf_cb(int(offs[ni]), int(cnts[ni]))
            else:
                cf, payload = 0, int(right[ni]) + node_base
            all_meta.append(int(axis[ni]) | (cf << 2) | (payload << 6))
        return M

    # top tree first (root at node 0)
    top_order = np.asarray(top.prim_order)

    def top_leaf(off, cnt):
        assert cnt == 1, "top tree must have 1-instance leaves"
        return 15, int(top_order[off])
    n_top = append_tree(top, 0, top_leaf)

    # prototype subtrees
    proto_root = []
    base = n_top
    for bvh, p0, p1, p2, gids in proto_pack:
        proto_root.append(base)
        cnts = np.asarray(bvh.prim_count)
        offs = np.asarray(bvh.prim_offset)
        po = np.asarray(bvh.prim_order)

        def leaf(off, cnt, p0=p0, p1=p1, p2=p2, gids=gids, po=po):
            blk = len(tris_blocks)
            c = min(cnt, 8)
            block = np.zeros((8, 16), np.float32)
            ids = po[off:off + c]
            block[:c, 0:3] = p0[ids]
            block[:c, 3:6] = p1[ids]
            block[:c, 6:9] = p2[ids]
            tris_blocks.append(block)
            order.extend([int(gids[j]) for j in ids] + [-1] * (8 - c))
            return c, blk
        base += append_tree(bvh, base, leaf)

    M = len(all_meta)
    assert M < (1 << 25), "instance-world node table too large"
    rows = -(-M // 8)
    nodes = np.zeros((rows * 8, 16), np.float32)
    nodes[:M, :12] = np.asarray(all_bounds, np.float32)
    if not tris_blocks:
        tris_blocks = [np.zeros((8, 16), np.float32)]
        order = [-1] * 8
    tris = np.stack(tris_blocks).reshape(len(tris_blocks), 128)

    imat = np.zeros((n_inst * IMAT_STRIDE,), np.float32)
    i2w = np.zeros((n_inst, 2, 16), np.float32)
    w2p = np.zeros((n_inst, 2, 16), np.float32)
    ianim = np.zeros((n_inst,), np.int32)
    for i, inst in enumerate(instances):
        a = np.asarray(inst["m_w2p0"], np.float32)
        b = np.asarray(inst["m_w2p1"], np.float32)
        imat[i * IMAT_STRIDE:i * IMAT_STRIDE + 12] = a[:3, :].ravel()
        imat[i * IMAT_STRIDE + 12:i * IMAT_STRIDE + 24] = (b - a)[:3, :].ravel()
        T0, q0, S0 = _decompose_trs(a)
        T1, q1, S1 = _decompose_trs(b)
        if np.dot(q0, q1) < 0:
            q1 = -q1           # sign-align so the kernel's arc is short
        o6 = i * IMAT_STRIDE
        imat[o6 + 24:o6 + 27] = T0
        imat[o6 + 27:o6 + 30] = T1
        imat[o6 + 30:o6 + 34] = q0
        imat[o6 + 34:o6 + 38] = q1
        imat[o6 + 38:o6 + 47] = S0.ravel()
        imat[o6 + 47:o6 + 56] = S1.ravel()
        i2w[i, 0] = np.asarray(inst["m_p2w0"], np.float32).ravel()
        i2w[i, 1] = np.asarray(inst["m_p2w1"], np.float32).ravel()
        w2p[i, 0] = a.ravel()
        w2p[i, 1] = b.ravel()
        ianim[i] = 1 if inst.get("animated") else 0
    iroot = np.asarray([proto_root[inst["proto"]] for inst in instances],
                       np.int32)

    return InstanceBVH(
        jnp.asarray(nodes.reshape(rows, 128)),
        jnp.asarray(np.asarray(all_meta, np.int32)),
        jnp.asarray(tris), jnp.asarray(np.asarray(order, np.int32)),
        jnp.asarray(imat), jnp.asarray(iroot), jnp.asarray(ianim),
        jnp.asarray(i2w), jnp.asarray(w2p),
        jnp.asarray(ilo.min(0)), jnp.asarray(ihi.max(0))), \
        ilo.min(0), ihi.max(0)


def trs_matrices_at(imat_rows, w):
    """XLA mirror of the kernel's TRS interpolation for shading frames.

    imat_rows: [N, IMAT_STRIDE] gathered per-lane imat rows; w: [N] clipped
    time. Returns (w2p [N,4,4], p2w [N,4,4]) — p2w is the affine inverse
    of the interpolated w2p, matching the reference's invert-after-
    interpolate (transformed_primitive.rs intersect)."""
    T0 = imat_rows[:, 24:27]
    T1 = imat_rows[:, 27:30]
    q0 = imat_rows[:, 30:34]
    q1 = imat_rows[:, 34:38]
    S0 = imat_rows[:, 38:47].reshape(-1, 3, 3)
    S1 = imat_rows[:, 47:56].reshape(-1, 3, 3)
    d = jnp.clip(jnp.sum(q0 * q1, -1), -1.0, 1.0)
    th = jnp.arccos(d)
    sth = jnp.sin(th)
    small = sth < 1e-4
    a = w * th
    inv_s = 1.0 / jnp.where(small, 1.0, sth)
    w1 = jnp.where(small, w, jnp.sin(a) * inv_s)
    w0 = jnp.where(small, 1.0 - w, jnp.sin(th - a) * inv_s)
    q = w0[:, None] * q0 + w1[:, None] * q1
    q = q * jax.lax.rsqrt(jnp.sum(q * q, -1, keepdims=True))
    x, y, z, qw = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    R = jnp.stack([
        jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - z * qw),
                   2 * (x * z + y * qw)], -1),
        jnp.stack([2 * (x * y + z * qw), 1 - 2 * (x * x + z * z),
                   2 * (y * z - x * qw)], -1),
        jnp.stack([2 * (x * z - y * qw), 2 * (y * z + x * qw),
                   1 - 2 * (x * x + y * y)], -1)], -2)
    S = S0 + w[:, None, None] * (S1 - S0)
    L = jnp.einsum("nij,njk->nik", R, S)
    T = T0 + w[:, None] * (T1 - T0)
    n = w.shape[0]
    w2p = jnp.zeros((n, 4, 4), jnp.float32)
    w2p = w2p.at[:, :3, :3].set(L).at[:, :3, 3].set(T).at[:, 3, 3].set(1.0)
    # affine inverse: [L t]^-1 = [L^-1, -L^-1 t]
    Linv = jnp.linalg.inv(L + 1e-12 * jnp.eye(3))
    Tinv = -jnp.einsum("nij,nj->ni", Linv, T)
    p2w = jnp.zeros((n, 4, 4), jnp.float32)
    p2w = p2w.at[:, :3, :3].set(Linv).at[:, :3, 3].set(Tinv).at[:, 3, 3].set(1.0)
    return w2p, p2w


def _pick(ax_, ay_, az_, k):
    return jnp.where(k == 0, ax_, jnp.where(k == 1, ay_, az_))


def _kernel_inst(meta_ref, imat_ref, iroot_ref,  # noqa: C901
                 ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tm_ref,
                 time_ref, nodes_ref, tris_ref,
                 t_out, tri_out, b1_out, b2_out, inst_out, it_out,
                 stack_ref, sp_ref, ts_ref, tris_scr, b1s_ref, b2s_ref,
                 is_ref,
                 *, rows: int, nblocks: int, trs: bool = False):
    f32 = jnp.float32
    tiny = f32(1e-20)

    def block_body(b, _):
        sl = pl.ds(b * rows, rows)
        wox, woy, woz = ox_ref[sl, :], oy_ref[sl, :], oz_ref[sl, :]
        wdx, wdy, wdz = dx_ref[sl, :], dy_ref[sl, :], dz_ref[sl, :]
        tm = tm_ref[sl, :]
        tvec = time_ref[sl, :]

        def derive(ox, oy, oz, dx, dy, dz):
            inv_dx = 1.0 / jnp.where(jnp.abs(dx) < tiny,
                                     jnp.where(dx < 0, -tiny, tiny), dx)
            inv_dy = 1.0 / jnp.where(jnp.abs(dy) < tiny,
                                     jnp.where(dy < 0, -tiny, tiny), dy)
            inv_dz = 1.0 / jnp.where(jnp.abs(dz) < tiny,
                                     jnp.where(dz < 0, -tiny, tiny), dz)
            adx, ady, adz = jnp.abs(dx), jnp.abs(dy), jnp.abs(dz)
            kz = jnp.where((adx >= ady) & (adx >= adz), 0,
                           jnp.where(ady >= adz, 1, 2))
            kx = (kz + 1) % 3
            ky = (kx + 1) % 3
            dpz = _pick(dx, dy, dz, kz)
            dpx = _pick(dx, dy, dz, kx)
            dpy = _pick(dx, dy, dz, ky)
            sz = 1.0 / jnp.where(dpz == 0.0, tiny, dpz)
            return (inv_dx, inv_dy, inv_dz, kx, ky, kz,
                    -dpx * sz, -dpy * sz, sz)

        w_derived = derive(wox, woy, woz, wdx, wdy, wdz)

        ts_ref[:] = tm
        tris_scr[:] = jnp.full((rows, LANES), -1, jnp.int32)
        b1s_ref[:] = jnp.zeros((rows, LANES), f32)
        b2s_ref[:] = jnp.zeros((rows, LANES), f32)
        is_ref[:] = jnp.full((rows, LANES), -1, jnp.int32)
        stack_ref[0] = 0
        sp_ref[0] = 1

        zrow = jnp.zeros((rows, 1), f32)

        def bc(v):
            return v + zrow

        def slab(state, lo_x, lo_y, lo_z, hi_x, hi_y, hi_z, t_best):
            ox, oy, oz, dx, dy, dz, (ivx, ivy, ivz, *_rest) = state
            t0x = (lo_x - ox) * ivx
            t1x = (hi_x - ox) * ivx
            t0y = (lo_y - oy) * ivy
            t1y = (hi_y - oy) * ivy
            t0z = (lo_z - oz) * ivz
            t1z = (hi_z - oz) * ivz
            tn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                         jnp.minimum(t0y, t1y)),
                             jnp.minimum(t0z, t1z))
            tf = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                         jnp.maximum(t0y, t1y)),
                             jnp.maximum(t0z, t1z)) * f32(1.00000024)
            return (tn <= tf) & (tf > 0.0) & (tn < t_best)

        def tri_test(state, v, t_best):
            ox, oy, oz, dx, dy, dz, (_ix, _iy, _iz, kx, ky, kz, sx, sy, sz) = state
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

        def body(carry):
            (it, _cont, cur_inst,
             ox, oy, oz, dx, dy, dz, drv) = carry
            sp0 = sp_ref[0]
            act = sp0 > 0
            spm = jnp.maximum(sp0 - 1, 0)
            raw = stack_ref[spm]
            leave = act & (raw == RESTORE)
            idx = jnp.where(act & (raw >= 0), raw, 0)
            w = meta_ref[idx]
            ax = w & 3
            cnt0 = (w >> 2) & 15
            payload = (w >> 6) & 0x1FFFFFF
            enter = act & (raw >= 0) & (cnt0 == 15)
            is_leaf = act & (raw >= 0) & (cnt0 > 0) & (cnt0 < 15)
            cnt = jnp.where(is_leaf, cnt0, 0)
            blk = jnp.where(is_leaf, payload, 0)
            is_int = act & (raw >= 0) & (cnt0 == 0)

            # ---- instance transform (unconditional data-flow; selected in) -
            iid = jnp.where(enter, payload, 0)
            mb = iid * IMAT_STRIDE
            tcl = jnp.clip(tvec, 0.0, 1.0)
            if not trs:
                m = [imat_ref[mb + j] for j in range(12)]
                md = [imat_ref[mb + 12 + j] for j in range(12)]
                M = [m[j] + tcl * md[j] for j in range(12)]  # [rows,LANES]
            else:
                # animated scene: per-lane TRS interpolation of the w2p
                # decomposition (animated_transform.rs interpolate) — quat
                # SLERP for rotation (exact arc; the matrix lerp shrinks
                # and shears large rotations), lerped T and S. theta is a
                # per-instance SCALAR (SMEM), only t is per lane.
                T0 = [imat_ref[mb + 24 + j] for j in range(3)]
                T1 = [imat_ref[mb + 27 + j] for j in range(3)]
                q0 = [imat_ref[mb + 30 + j] for j in range(4)]
                q1 = [imat_ref[mb + 34 + j] for j in range(4)]
                S0 = [imat_ref[mb + 38 + j] for j in range(9)]
                S1 = [imat_ref[mb + 47 + j] for j in range(9)]
                dq = q0[0] * q1[0] + q0[1] * q1[1] + q0[2] * q1[2] \
                    + q0[3] * q1[3]
                dq = jnp.minimum(jnp.maximum(dq, -1.0), 1.0)
                theta = jnp.arccos(dq)
                sth = jnp.sin(theta)
                small = sth < 1e-4
                a = tcl * theta
                inv_s = 1.0 / jnp.where(small, 1.0, sth)
                w1 = jnp.where(small, tcl, jnp.sin(a) * inv_s)
                w0 = jnp.where(small, 1.0 - tcl, jnp.sin(theta - a) * inv_s)
                q = [w0 * q0[j] + w1 * q1[j] for j in range(4)]
                qn = jax.lax.rsqrt(q[0] * q[0] + q[1] * q[1]
                                   + q[2] * q[2] + q[3] * q[3])
                x, y, z, w_ = [q[j] * qn for j in range(4)]
                R9 = [1 - 2 * (y * y + z * z), 2 * (x * y - z * w_),
                      2 * (x * z + y * w_),
                      2 * (x * y + z * w_), 1 - 2 * (x * x + z * z),
                      2 * (y * z - x * w_),
                      2 * (x * z - y * w_), 2 * (y * z + x * w_),
                      1 - 2 * (x * x + y * y)]
                Sv = [S0[j] + tcl * (S1[j] - S0[j]) for j in range(9)]
                M = []
                for r in range(3):
                    for c in range(3):
                        M.append(R9[3 * r + 0] * Sv[0 + c]
                                 + R9[3 * r + 1] * Sv[3 + c]
                                 + R9[3 * r + 2] * Sv[6 + c])
                    M.append(T0[r] + tcl * (T1[r] - T0[r]))
            tox = M[0] * wox + M[1] * woy + M[2] * woz + M[3]
            toy = M[4] * wox + M[5] * woy + M[6] * woz + M[7]
            toz = M[8] * wox + M[9] * woy + M[10] * woz + M[11]
            tdx = M[0] * wdx + M[1] * wdy + M[2] * wdz
            tdy = M[4] * wdx + M[5] * wdy + M[6] * wdz
            tdz = M[8] * wdx + M[9] * wdy + M[10] * wdz

            ent = jnp.where(enter, 1.0, 0.0)
            lv = jnp.where(leave, 1.0, 0.0)

            def sel3(tv, wv, cv):
                # enter -> transformed, leave -> world, else current
                return jnp.where(ent > 0, tv, jnp.where(lv > 0, wv, cv))
            nox = sel3(tox, wox, ox)
            noy = sel3(toy, woy, oy)
            noz = sel3(toz, woz, oz)
            ndx = sel3(tdx, wdx, dx)
            ndy = sel3(tdy, wdy, dy)
            ndz = sel3(tdz, wdz, dz)
            switch = enter | leave
            ndrv = jax.tree.map(
                lambda new, old: jnp.where(switch, new, old)
                if new.dtype != jnp.int32
                else jnp.where(switch, new, old),
                derive(nox, noy, noz, ndx, ndy, ndz), drv)
            cur_inst = jnp.where(enter, iid,
                                 jnp.where(leave, -1, cur_inst))
            state = (nox, noy, noz, ndx, ndy, ndz, ndrv)

            # ---- node fetch + children tests ----
            nrow = nodes_ref[pl.ds(idx >> 3, 1), :]
            rec = pltpu.roll(nrow, -(idx & 7) * 16, 1)[:, :16]
            t_best0 = ts_ref[:]
            gate = jnp.where(is_int, 1, 0) + jnp.zeros((rows, LANES), jnp.int32)
            hit_l = slab(state, bc(rec[:, 0:1]), bc(rec[:, 1:2]), bc(rec[:, 2:3]),
                         bc(rec[:, 3:4]), bc(rec[:, 4:5]), bc(rec[:, 5:6]),
                         t_best0) & (gate > 0)
            hit_r = slab(state, bc(rec[:, 6:7]), bc(rec[:, 7:8]), bc(rec[:, 8:9]),
                         bc(rec[:, 9:10]), bc(rec[:, 10:11]), bc(rec[:, 11:12]),
                         t_best0) & (gate > 0)

            # ---- leaf triangle tests ----
            @pl.when(is_leaf)
            def _leaf(cnt=cnt, blk=blk, state=state, cur_inst=cur_inst):
                tb = tris_ref[pl.ds(blk, 1), :]
                z16 = jnp.zeros((rows, 16), f32)
                t_best = ts_ref[:]
                tri_b = tris_scr[:]
                b1_b = b1s_ref[:]
                b2_b = b2s_ref[:]
                in_b = is_ref[:]
                cnt_col = cnt + jnp.zeros((rows, LANES), jnp.int32)
                for j in range(8):
                    hit, t, b1, b2 = tri_test(state,
                                              tb[:, j * 16:(j + 1) * 16] + z16,
                                              t_best)
                    ok = hit & (cnt_col > j)
                    t_best = jnp.where(ok, t, t_best)
                    tri_b = jnp.where(ok, blk * 8 + j, tri_b)
                    b1_b = jnp.where(ok, b1, b1_b)
                    b2_b = jnp.where(ok, b2, b2_b)
                    in_b = jnp.where(ok, cur_inst, in_b)
                ts_ref[:] = t_best
                tris_scr[:] = tri_b
                b1s_ref[:] = b1_b
                b2s_ref[:] = b2_b
                is_ref[:] = in_b

            # ---- push phase ----
            sp_s = spm
            # instance enter: push RESTORE then the prototype root
            root = iroot_ref[iid]
            # weight must exceed the max left-hit count rows*LANES (aliasing
            # at rows>=16 otherwise)
            W = rows * LANES + 1
            v = jnp.sum(jnp.where(hit_l, 1, 0) + jnp.where(hit_r, W, 0))
            hl = jnp.where((v % W) > 0, 1, 0)
            hr = jnp.where(v >= W, 1, 0)
            # near/far by majority direction sign on the CURRENT rays
            _ix, _iy, _iz, kxx, kyy, kzz, sxx, syy, szz = state[6]
            half = rows * LANES // 2
            swap0 = jnp.sum(jnp.where(state[3] < 0.0, 1, 0)) > half
            swap1 = jnp.sum(jnp.where(state[4] < 0.0, 1, 0)) > half
            swap2 = jnp.sum(jnp.where(state[5] < 0.0, 1, 0)) > half
            swap = jnp.where(ax == 0, swap0, jnp.where(ax == 1, swap1, swap2))
            left = idx + 1
            near = jnp.where(swap, payload, left)
            far = jnp.where(swap, left, payload)
            h_near = jnp.where(swap, hr, hl)
            h_far = jnp.where(swap, hl, hr)
            # enter overrides: far slot <- RESTORE, near slot <- proto root
            far = jnp.where(enter, RESTORE, far)
            near = jnp.where(enter, root, near)
            h_far = jnp.where(enter, 1, h_far)
            h_near = jnp.where(enter, 1, h_near)
            stack_ref[jnp.minimum(sp_s, STACKI - 1)] = far
            stack_ref[jnp.minimum(sp_s + h_far, STACKI - 1)] = near
            sp_s = jnp.minimum(sp_s + h_far + h_near, STACKI - 1)
            sp_ref[0] = sp_s
            return ((it + 1, sp_s > 0, cur_inst,
                     nox, noy, noz, ndx, ndy, ndz, ndrv))

        zero = jnp.zeros((rows, LANES), f32)
        init = (0, True, jnp.int32(-1),
                wox + zero, woy + zero, woz + zero,
                wdx + zero, wdy + zero, wdz + zero, w_derived)
        out = jax.lax.while_loop(lambda c: c[1], body, init)
        n_it = out[0]
        t_out[sl, :] = ts_ref[:]
        tri_out[sl, :] = tris_scr[:]
        b1_out[sl, :] = b1s_ref[:]
        b2_out[sl, :] = b2s_ref[:]
        inst_out[sl, :] = is_ref[:]
        it_out[b] = n_it
        return 0

    jax.lax.fori_loop(0, nblocks, block_body, 0)


@functools.partial(jax.jit, static_argnames=("interpret", "trs"))
def _intersect_instances_impl(ib: InstanceBVH, o, d, t_max, time=None,
                        interpret=False, trs=False):
    """Closest instanced-triangle hit. Returns (TriHit with GLOBAL tri ids,
    inst [N] i32, -1 for miss)."""
    N = o.shape[0]
    BLK = ROWS * LANES
    npad = (-N) % BLK
    pad_o = jnp.broadcast_to(ib.whi + (ib.whi - ib.wlo) + 1.0, (npad, 3))
    o_p = jnp.concatenate([o, pad_o.astype(jnp.float32)], 0)
    d_p = jnp.concatenate(
        [d, jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], jnp.float32),
                             (npad, 3))], 0)
    tm = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (N,))
    tm_p = jnp.concatenate([tm, jnp.zeros((npad,), jnp.float32)], 0)
    if time is None:
        time = jnp.zeros((N,), jnp.float32)
    tv = jnp.concatenate([jnp.broadcast_to(time, (N,)).astype(jnp.float32),
                          jnp.zeros((npad,), jnp.float32)], 0)
    Np = N + npad
    R = Np // LANES

    def comp(v):
        return v.reshape(R, LANES)

    nblocks = Np // BLK
    kern = functools.partial(_kernel_inst, rows=ROWS, nblocks=nblocks,
                             trs=trs)
    vm = pl.BlockSpec(memory_space=pltpu.VMEM)
    sm = pl.BlockSpec(memory_space=pltpu.SMEM)
    out_shapes = [jax.ShapeDtypeStruct((R, LANES), jnp.float32),
                  jax.ShapeDtypeStruct((R, LANES), jnp.int32),
                  jax.ShapeDtypeStruct((R, LANES), jnp.float32),
                  jax.ShapeDtypeStruct((R, LANES), jnp.float32),
                  jax.ShapeDtypeStruct((R, LANES), jnp.int32),
                  jax.ShapeDtypeStruct((nblocks,), jnp.int32)]
    t, tri, b1, b2, inst, _ = pl.pallas_call(
        kern,
        out_shape=out_shapes,
        in_specs=[sm, sm, sm] + [vm] * 8 + [vm, vm],
        out_specs=[vm] * 5 + [sm],
        scratch_shapes=[pltpu.SMEM((STACKI,), jnp.int32),
                        pltpu.SMEM((1,), jnp.int32),
                        pltpu.VMEM((ROWS, LANES), jnp.float32),
                        pltpu.VMEM((ROWS, LANES), jnp.int32),
                        pltpu.VMEM((ROWS, LANES), jnp.float32),
                        pltpu.VMEM((ROWS, LANES), jnp.float32),
                        pltpu.VMEM((ROWS, LANES), jnp.int32)],
        interpret=interpret,
    )(ib.metas, ib.imat, ib.iroot,
      comp(o_p[:, 0]), comp(o_p[:, 1]), comp(o_p[:, 2]),
      comp(d_p[:, 0]), comp(d_p[:, 1]), comp(d_p[:, 2]), comp(tm_p),
      comp(tv), ib.nodes, ib.tris)
    slot = tri.reshape(-1)[:N]
    tri_id = jnp.where(slot >= 0, ib.order[jnp.maximum(slot, 0)], -1)
    th = TriHit(t.reshape(-1)[:N], tri_id,
                b1.reshape(-1)[:N], b2.reshape(-1)[:N])
    return th, inst.reshape(-1)[:N]


def intersect_instances(ibvh, o, d, t_max, time=None, interpret=False,
                        trs=False):
    """Gradient-detached wrapper: the instance kernel has no JVP rule and
    geometry is a constant of the AD tape (scene/intersect.py note)."""
    import jax as _jax
    o, d, t_max = _jax.lax.stop_gradient((o, d, t_max))
    if time is not None:
        time = _jax.lax.stop_gradient(time)
    return _intersect_instances_impl(ibvh, o, d, t_max, time=time,
                                     interpret=interpret, trs=trs)
