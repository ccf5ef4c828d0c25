"""Unified scene intersection: BVH triangles + quadric table -> SurfaceInteraction.

Reference: core/src/scene.rs intersect/intersect_p + GeometricPrimitive::
intersect. TPU re-design: triangles ride the wavefront BVH kernel; the few
quadrics of a scene run as a vmapped brute-force pass (each quadric vs all
rays, per-lane lax.switch over quadric type); the closest of the two worlds
wins and the full SurfaceInteraction is reconstructed once for the winner.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from pbrt_tpu.core import math as vm
from pbrt_tpu.core.math import normalize, cross, dot
from pbrt_tpu.core.interaction import SurfaceInteraction, make_frame
from pbrt_tpu.accel.traverse import intersect_bvh, intersect_bruteforce, TriHit
from pbrt_tpu.accel.kdtree import intersect_kdtree
from pbrt_tpu.shapes.triangle import triangle_shading
from pbrt_tpu.shapes import quadrics as Q
from pbrt_tpu.scene.types import (SceneData, SceneFlags, AT_P0, AT_P1, AT_P2,
                                  AT_N, AT_UV, AT_HASN, AT_PRIM, AT_MAT,
                                  AT_LIGHT, AT_REV, AT_TRI, AT_ALPHA,
                                  AT_SALPHA)


def _quadric_pass(scene: SceneData, flags: SceneFlags, o, d, t_max):
    """[N] closest quadric hit over the whole table. Returns dict of arrays."""
    Nq = scene.quad_type.shape[0]

    def one_quadric(qi, carry):
        t_best, best_idx = carry
        w2o = scene.quad_w2o[qi]
        oo = o @ w2o[:3, :3].T + w2o[:3, 3]
        od = d @ w2o[:3, :3].T
        qp = scene.quad_params[qi]

        def branch(k):
            return lambda: Q.intersect_quadric(k, qp, oo, od, t_best)[0:2]

        hit, t = jax.lax.switch(scene.quad_type[qi],
                                [branch(k) for k in range(6)])
        closer = hit & (t < t_best)
        t_best = jnp.where(closer, t, t_best)
        best_idx = jnp.where(closer, qi, best_idx)
        return t_best, best_idx

    t_best = jnp.asarray(t_max, jnp.float32)
    best_idx = jnp.full(o.shape[:1], -1, jnp.int32)
    t_best, best_idx = jax.lax.fori_loop(0, Nq, one_quadric, (t_best, best_idx))
    return t_best, best_idx


def _quadric_eval_all(scene: SceneData, qi, o, d, t_max):
    """Per-lane full quadric evaluation: for each of the 6 kinds evaluate with
    per-lane params and mask-select by the lane's quadric type."""
    qis = jnp.maximum(qi, 0)
    w2o = vm.gather_rows(scene.quad_w2o, qis)
    o2w = vm.gather_rows(scene.quad_o2w, qis)
    oo = jnp.einsum("nij,nj->ni", w2o[:, :3, :3], o) + w2o[:, :3, 3]
    od = jnp.einsum("nij,nj->ni", w2o[:, :3, :3], d)
    qp = vm.gather_rows(scene.quad_params, qis)      # [N, 8]
    qtype = vm.gather_rows(scene.quad_type, qis)

    class PerLaneParams:
        def __getitem__(self, i):
            return qp[:, i]
    plp = PerLaneParams()

    out = None
    for k in range(6):
        hit, t, p, n, uv, dpdu, dpdv, perr = Q.intersect_quadric(k, plp, oo, od, t_max)
        sel = qtype == k
        if out is None:
            out = [jnp.where(sel, hit, False), jnp.where(sel, t, 0.0),
                   jnp.where(sel[:, None], p, 0.0), jnp.where(sel[:, None], n, 0.0),
                   jnp.where(sel[:, None], uv, 0.0), jnp.where(sel[:, None], dpdu, 0.0),
                   jnp.where(sel[:, None], dpdv, 0.0), jnp.where(sel[:, None], perr, 0.0)]
        else:
            out[0] = jnp.where(sel, hit, out[0])
            out[1] = jnp.where(sel, t, out[1])
            for j, v in enumerate((p, n, uv, dpdu, dpdv, perr)):
                out[2 + j] = jnp.where(sel[:, None], v, out[2 + j])
    hit, t, p, n, uv, dpdu, dpdv, perr = out
    # object -> world
    pw = jnp.einsum("nij,nj->ni", o2w[:, :3, :3], p) + o2w[:, :3, 3]
    nw = normalize(jnp.einsum("nij,ni->nj", w2o[:, :3, :3], n))
    dpduw = jnp.einsum("nij,nj->ni", o2w[:, :3, :3], dpdu)
    dpdvw = jnp.einsum("nij,nj->ni", o2w[:, :3, :3], dpdv)
    perrw = jnp.abs(jnp.einsum("nij,nj->ni", jnp.abs(o2w[:, :3, :3]), perr)) + 1e-5 * jnp.abs(pw)
    return hit, t, pw, nw, uv, dpduw, dpdvw, perrw


ALPHA_ROUNDS = 3   # re-trace rounds past alpha-masked hits per query


def kernel_bary(o, d, p0, p1, p2):
    """Recompute the Pallas kernel's barycentrics per lane (r5 leaf slim).

    Replicates the kernel's tri_test math EXACTLY — naive shear products,
    same tiny/epsilon constants (pallas_traverse.py tri_test) — so the
    b1/b2 the kernel used to emit are reproduced for its winning slot
    from the already-gathered vertex attributes. NOT the same as
    shapes/triangle.py intersect_tri, which upgrades the edge functions
    with diff_of_products."""
    tiny = jnp.float32(1e-20)
    ax, ay, az = jnp.abs(d[:, 0]), jnp.abs(d[:, 1]), jnp.abs(d[:, 2])
    kz = jnp.where((ax >= ay) & (ax >= az), 0, jnp.where(ay >= az, 1, 2))
    kx = (kz + 1) % 3
    ky = (kx + 1) % 3

    def pick(v, k):
        # where-chain, NOT take_along_axis: per-lane XLA gathers cost ~1ms
        # each at wavefront sizes in-context (core/math.py gather_rows note)
        return jnp.where(k == 0, v[:, 0], jnp.where(k == 1, v[:, 1],
                                                    v[:, 2]))

    dpz = pick(d, kz)
    sz = 1.0 / jnp.where(dpz == 0.0, tiny, dpz)
    sx = -pick(d, kx) * sz
    sy = -pick(d, ky) * sz

    def shear(p):
        t = p - o
        return (pick(t, kx) + sx * pick(t, kz),
                pick(t, ky) + sy * pick(t, kz),
                pick(t, kz) * sz)

    x0, y0, z0 = shear(p0)
    x1, y1, z1 = shear(p1)
    x2, y2, z2 = shear(p2)
    e1 = x2 * y0 - y2 * x0
    e2 = x0 * y1 - y0 * x1
    det = (x1 * y2 - y1 * x2) + e1 + e2
    inv_det = 1.0 / jnp.where(det == 0.0, tiny, det)
    return e1 * inv_det, e2 * inv_det


def _closest_tris(scene, flags, o, d, t_best, anyhit_mask=None):
    if flags.use_pallas:
        # geometry is a constant of the AD tape (pbrt-style detached
        # discontinuities, diff/__init__.py): the Pallas kernel has no JVP
        # rule, so detach its ray inputs explicitly — bounce directions
        # carry tangents through the sampled-lobe chain otherwise
        from pbrt_tpu.accel.pallas_traverse import intersect_bvh_pallas
        o, d, t_best = jax.lax.stop_gradient((o, d, t_best))
        return intersect_bvh_pallas(scene.pbvh, o, d, t_best,
                                    anyhit_mask=anyhit_mask)
    if flags.use_bvh and flags.accel == "kdtree":
        return intersect_kdtree(scene.kd, scene.tri_p0, scene.tri_p1,
                                scene.tri_p2, o, d, t_best)
    if flags.use_bvh:
        return intersect_bvh(scene.bvh, scene.tri_p0, scene.tri_p1,
                             scene.tri_p2, o, d, t_best)
    if flags.n_instances > 0:
        # prototype rows live past n_world_tris and are NOT world geometry
        nw = flags.n_world_tris
        return intersect_bruteforce(scene.tri_p0[:nw], scene.tri_p1[:nw],
                                    scene.tri_p2[:nw], o, d, t_best)
    return intersect_bruteforce(scene.tri_p0, scene.tri_p1, scene.tri_p2,
                                o, d, t_best)


SORT_MIN_NODES = 8192   # sorted dispatch pays off only on deep trees


def _smem_fits(pbvh):
    from pbrt_tpu.accel.pallas_traverse import SMEM_META_MAX
    return pbvh.metas.shape[0] <= SMEM_META_MAX


def _hit_attr(scene, th):
    """Packed attribute rows for a TriHit: slot-keyed when the Pallas kernel
    produced slots (skips the slot->tri order gather), tri-keyed otherwise."""
    if th.slot is not None and scene.slot_attr is not None:
        return vm.gather_rows(scene.slot_attr, jnp.maximum(th.slot, 0))
    return vm.gather_rows(scene.tri_attr, jnp.maximum(th.tri, 0))


def _hit_valid(th):
    """[N] bool hit mask without touching th.tri (whose slot->tri gather is
    dead code on the Pallas path)."""
    return (th.slot >= 0) if th.slot is not None else (th.tri >= 0)


def _alpha_of_hit(scene, th, o, d, shadow=False, tex_kinds=None):
    """Evaluate a hit triangle's alpha-mask texture ([N]; 1.0 = opaque).

    shadow may be a python bool or a per-lane [N] bool array (merged
    next+shadow wavefronts pick the shadow_alpha_mask column per lane)."""
    from pbrt_tpu.textures import eval_texture
    attr = _hit_attr(scene, th)
    if isinstance(shadow, jnp.ndarray):
        aid = jnp.where(shadow, attr[:, AT_SALPHA], attr[:, AT_ALPHA])
    else:
        aid = attr[:, AT_SALPHA] if shadow else attr[:, AT_ALPHA]
    aid = aid.astype(jnp.int32)
    if th.b1 is None:
        b1, b2 = kernel_bary(o, d, attr[:, AT_P0:AT_P0 + 3],
                             attr[:, AT_P1:AT_P1 + 3],
                             attr[:, AT_P2:AT_P2 + 3])
    else:
        b1, b2 = th.b1, th.b2
    b0 = 1.0 - b1 - b2
    tuv = attr[:, AT_UV:AT_UV + 6].reshape(-1, 3, 2)
    uv = b0[:, None] * tuv[:, 0] + b1[:, None] * tuv[:, 1] + b2[:, None] * tuv[:, 2]
    p = o + th.t[:, None] * d
    a = eval_texture(scene.tex, aid, uv, p, kinds=tex_kinds)[:, 0]
    return jnp.where(_hit_valid(th) & (aid >= 0), a, 1.0)


def _closest_tris_alpha(scene, flags, o, d, t_best, shadow=False):
    """Closest hit skipping alpha-masked surface points.

    Reference: shapes/src/triangle.rs intersect's alpha_mask evaluate-and-
    reject. Wavefront form: after a closest hit, lanes whose hit point has
    alpha == 0 re-trace from just past the hit (ALPHA_ROUNDS rounds)."""
    th = _closest_tris(scene, flags, o, d, t_best)
    if not flags.has_alpha:
        return th

    def merge(masked, a, b):
        slot = None
        if a.slot is not None and b.slot is not None:
            slot = jnp.where(masked, a.slot, b.slot)
        b1 = None if a.b1 is None else jnp.where(masked, a.b1, b.b1)
        b2 = None if a.b2 is None else jnp.where(masked, a.b2, b.b2)
        return TriHit(jnp.where(masked, a.t, b.t),
                      jnp.where(masked, a.tri, b.tri), b1, b2, slot)

    t_off = jnp.zeros_like(th.t)
    oo = o
    for _ in range(ALPHA_ROUNDS):
        a = _alpha_of_hit(scene, th, oo, d, shadow, tex_kinds=flags.tex_kinds)
        masked = _hit_valid(th) & (a <= 0.0)
        eps = 1e-4 * (1.0 + jnp.abs(th.t))
        step = th.t + eps
        oo2 = jnp.where(masked[:, None], oo + step[:, None] * d, oo)
        t_off2 = jnp.where(masked, t_off + step, t_off)
        rem = jnp.where(masked, jnp.asarray(t_best, jnp.float32) - t_off2, 1.0)
        th2 = _closest_tris(scene, flags, oo2, d, jnp.maximum(rem, 0.0))
        th = merge(masked, th2, th)
        oo, t_off = oo2, t_off2
    # final masked survivors count as misses; map t back to the original ray
    a = _alpha_of_hit(scene, th, oo, d, shadow, tex_kinds=flags.tex_kinds)
    still = _hit_valid(th) & (a <= 0.0)
    return TriHit(jnp.where(still, jnp.asarray(t_best, jnp.float32), th.t + t_off),
                  jnp.where(still, -1, th.tri), th.b1, th.b2,
                  None if th.slot is None else jnp.where(still, -1, th.slot))


def _instance_pass(scene, flags, o, d, tri_t, tri_id, b1, b2, time):
    """Fold the two-level instance world's closest hits into the triangle
    results (accel/pallas_instance.py). Returns updated (t, id, b1, b2,
    inst)."""
    from pbrt_tpu.accel.pallas_instance import intersect_instances
    thi, inst_i = intersect_instances(scene.ibvh, o, d, tri_t, time=time,
                                      interpret=not flags.use_pallas,
                                      trs=flags.any_animated_inst)
    hit_i = thi.tri >= 0        # already bounded by tri_t
    tri_t = jnp.where(hit_i, thi.t, tri_t)
    tri_id = jnp.where(hit_i, thi.tri, tri_id)
    b1 = jnp.where(hit_i, thi.b1, b1)
    b2 = jnp.where(hit_i, thi.b2, b2)
    inst = jnp.where(hit_i, inst_i, -1)
    return tri_t, tri_id, b1, b2, inst


def intersect(scene: SceneData, flags: SceneFlags, o, d, t_max,
              time=None) -> SurfaceInteraction:
    """Closest hit of the whole wavefront -> full SurfaceInteraction.

    time: optional [N] ray times in [0,1] for animated instance transforms
    (static scenes ignore it)."""
    N = o.shape[0]
    # geometry is a constant of the AD tape (pbrt-style detached
    # discontinuities, diff/__init__.py): traversal while-loops (CPU) and
    # Pallas kernels (TPU) are not reverse-differentiable, and bounce
    # directions carry parameter tangents through the sampled-lobe chain
    o, d = jax.lax.stop_gradient((o, d))
    t_best = jax.lax.stop_gradient(jnp.asarray(t_max, jnp.float32))

    # triangles
    slot = None
    if flags.n_tris > 0:
        th = _closest_tris_alpha(scene, flags, o, d, t_best)
        tri_t, tri_id, b1, b2 = th.t, th.tri, th.b1, th.b2
        if b1 is None and flags.n_instances > 0:
            # instance merging needs materialized barycentrics
            attr = _hit_attr(scene, th)
            b1, b2 = kernel_bary(o, d, attr[:, AT_P0:AT_P0 + 3],
                                 attr[:, AT_P1:AT_P1 + 3],
                                 attr[:, AT_P2:AT_P2 + 3])
        if flags.n_instances == 0:
            slot = th.slot
    else:
        tri_t = t_best
        tri_id = jnp.full((N,), -1, jnp.int32)
        b1 = b2 = jnp.zeros((N,), jnp.float32)

    inst = None
    if flags.n_instances > 0:
        tri_t, tri_id, b1, b2, inst = _instance_pass(
            scene, flags, o, d, tri_t, tri_id, b1, b2, time)

    # quadrics
    if flags.n_quadrics > 0:
        q_t, q_id = _quadric_pass(scene, flags, o, d, tri_t)
    else:
        q_t = tri_t
        q_id = jnp.full((N,), -1, jnp.int32)
    return _assemble_si(scene, flags, o, d, t_max, tri_t, tri_id, b1, b2,
                        q_t, q_id, inst=inst, time=time, slot=slot)


def intersect_pair(scene: SceneData, flags: SceneFlags,
                   o_nx, d_nx, tmax_nx, active_nx,
                   o_sh, d_sh, dist_sh, active_sh, time=None):
    """One merged traversal for a bounce's next-ray + shadow-ray sets.

    The path integrator needs, per bounce, a closest hit for the continued
    rays AND an occlusion bit for the NEE shadow rays. Tracing them in one
    2N launch halves the per-launch overhead (Pallas staging + quadric
    pass), and dead lanes of either set are re-pointed at a far-miss origin
    so their blocks retire in one root test (the FAR trick — with t_max=0
    alone, an origin inside the world still walks its whole subtree).

    Returns (si_next [N], occluded [N] bool). Reference semantics:
    scene.rs intersect + VisibilityTester::unoccluded.
    """
    N = o_nx.shape[0]
    # detached geometry (see intersect())
    o_nx, d_nx, tmax_nx = jax.lax.stop_gradient((o_nx, d_nx, tmax_nx))
    o_sh, d_sh, dist_sh = jax.lax.stop_gradient((o_sh, d_sh, dist_sh))
    if flags.use_pallas and flags.n_tris > 0:
        from pbrt_tpu.accel.pallas_traverse import far_miss_rays
        fo, fd = far_miss_rays(scene.pbvh, N)
        o_nx = jnp.where(active_nx[:, None], o_nx, fo)
        d_nx = jnp.where(active_nx[:, None], d_nx, fd)
        o_sh = jnp.where(active_sh[:, None], o_sh, fo)
        d_sh = jnp.where(active_sh[:, None], d_sh, fd)
    o2 = jnp.concatenate([o_nx, o_sh], 0)
    d2 = jnp.concatenate([d_nx, d_sh], 0)
    tm2 = jnp.concatenate([jnp.broadcast_to(jnp.asarray(tmax_nx, jnp.float32), (N,)),
                           jnp.broadcast_to(jnp.asarray(dist_sh, jnp.float32), (N,))], 0)

    if flags.n_tris > 0:
        if flags.has_alpha:
            th = _closest_tris_alpha(scene, flags, o2, d2, tm2,
                                     shadow=jnp.concatenate(
                                         [jnp.zeros((N,), bool),
                                          jnp.ones((N,), bool)]))
        elif (flags.use_pallas and flags.n_instances == 0
              and scene.pbvh is not None and _smem_fits(scene.pbvh)
              and scene.pbvh.metas.shape[0] >= SORT_MIN_NODES):
            # sorted + compacted dispatch: bounce wavefronts scatter after
            # the first bounce, and traversal cost tracks the per-1024-ray
            # block's node-sequence union. Regrouping lanes by (live,
            # shadow-vs-next, origin-cell morton | direction octant) cuts
            # union iterations ~20% and herds dead lanes into whole dead
            # blocks (which retire in one root test). The permutation rides
            # lax.sort CO-SORTING (key + ray columns through the sort
            # network) both ways: in-module XLA gathers/scatters lower to a
            # serial ~100ns/row path (25-50 ms for this shuffle!) while the
            # sort network is ~1 ms. Rays cross the boundary as [N] columns
            # — [N,3] column slices are ~1-2 ms layout conversions each.
            from pbrt_tpu.accel.pallas_traverse import (_ray_sort_key_cols,
                                                        _traverse_cols)
            o2, d2, tm2 = jax.lax.stop_gradient((o2, d2, tm2))
            o2t, d2t = o2.T, d2.T
            ox, oy, oz = o2t[0], o2t[1], o2t[2]
            dx, dy, dz = d2t[0], d2t[1], d2t[2]
            live2 = jnp.concatenate([active_nx, active_sh])
            is_sh = jnp.concatenate([jnp.zeros((N,), bool),
                                     jnp.ones((N,), bool)])
            key = _ray_sort_key_cols(scene.pbvh, ox, oy, oz, dx, dy, dz)
            key = key | jnp.where(is_sh, jnp.int32(1 << 24), 0)
            key = jnp.where(live2, key, jnp.int32(0x7FFFFFFF))
            lane = jnp.arange(2 * N, dtype=jnp.int32)
            (_, oxs, oys, ozs, dxs, dys, dzs, tms, ahs, lanes) = jax.lax.sort(
                (key, ox, oy, oz, dx, dy, dz, tm2,
                 is_sh.astype(jnp.int32), lane), dimension=0, num_keys=1)
            ths = _traverse_cols(scene.pbvh, oxs, oys, ozs, dxs, dys, dzs,
                                 tms, anyhit_mask=ahs > 0)
            # unsort by a second co-sort keyed on the original lane id;
            # b1/b2 are deferred on the queue-kernel path (two fewer
            # columns through the sort network)
            slot_s = ths.slot if ths.slot is not None else ths.tri
            if ths.b1 is None:
                (_, t_u, slot_u) = jax.lax.sort(
                    (lanes, ths.t, slot_s), dimension=0, num_keys=1)
                b1_u = b2_u = None
            else:
                (_, t_u, b1_u, b2_u, slot_u) = jax.lax.sort(
                    (lanes, ths.t, ths.b1, ths.b2, slot_s),
                    dimension=0, num_keys=1)
            if ths.slot is not None:
                # tri ids stay unresolved (-1): this branch is gated to
                # no-instance no-alpha scenes, where assembly is slot-keyed
                th = TriHit(t_u, jnp.full_like(slot_u, -1), b1_u, b2_u,
                            slot_u)
            else:
                th = TriHit(t_u, slot_u, b1_u, b2_u, None)
        else:
            # shadow half is occlusion-only: its blocks retire lanes at
            # their first hit inside the kernel
            th = _closest_tris(scene, flags, o2, d2, tm2,
                               anyhit_mask=jnp.concatenate(
                                   [jnp.zeros((N,), bool),
                                    jnp.ones((N,), bool)]))
        tri_t, tri_id, b1, b2 = th.t, th.tri, th.b1, th.b2
        if b1 is None and flags.n_instances > 0:
            attr = _hit_attr(scene, th)
            b1, b2 = kernel_bary(o2, d2, attr[:, AT_P0:AT_P0 + 3],
                                 attr[:, AT_P1:AT_P1 + 3],
                                 attr[:, AT_P2:AT_P2 + 3])
        tri_hit = _hit_valid(th)
        slot = th.slot if flags.n_instances == 0 else None
    else:
        tri_t = tm2
        tri_id = jnp.full((2 * N,), -1, jnp.int32)
        b1 = b2 = jnp.zeros((2 * N,), jnp.float32)
        tri_hit = jnp.zeros((2 * N,), bool)
        slot = None
    inst = None
    if flags.n_instances > 0:
        t2 = None if time is None else jnp.concatenate(
            [jnp.broadcast_to(time, (N,))] * 2)
        tri_t, tri_id, b1, b2, inst2 = _instance_pass(
            scene, flags, o2, d2, tri_t, tri_id, b1, b2, t2)
        inst = inst2[:N]
        tri_hit = tri_id >= 0
    if flags.n_quadrics > 0:
        q_t, q_id = _quadric_pass(scene, flags, o2, d2, tri_t)
    else:
        q_t = tri_t
        q_id = jnp.full((2 * N,), -1, jnp.int32)

    occluded = active_sh & (tri_hit[N:] | (q_id[N:] >= 0))
    si = _assemble_si(scene, flags, o_nx, d_nx, tmax_nx,
                      tri_t[:N], tri_id[:N],
                      None if b1 is None else b1[:N],
                      None if b2 is None else b2[:N],
                      q_t[:N], q_id[:N], inst=inst, time=time,
                      slot=None if slot is None else slot[:N])
    return si, occluded


def _assemble_si(scene, flags, o, d, t_max, tri_t, tri_id, b1, b2, q_t, q_id,
                 inst=None, time=None, slot=None):
    N = o.shape[0]

    # ONE packed-attribute row gather per lane (scene/types.py AT_*) —
    # slot-keyed on the Pallas path (no slot->tri order indirection)
    if slot is not None and scene.slot_attr is not None:
        attr = vm.gather_rows(scene.slot_attr, jnp.maximum(slot, 0))
        tri_valid = slot >= 0
    else:
        attr = vm.gather_rows(scene.tri_attr, jnp.maximum(tri_id, 0))
        tri_valid = tri_id >= 0

    use_quad = q_id >= 0   # quadric pass already bounded by tri_t
    any_hit = tri_valid | use_quad
    t = jnp.where(use_quad, q_t, tri_t)

    # --- assemble SurfaceInteraction ---
    if b1 is None:
        # r5 leaf slim: the queue kernel defers barycentrics; reproduce
        # its values from the gathered vertices (kernel_bary docstring)
        b1, b2 = kernel_bary(o, d, attr[:, AT_P0:AT_P0 + 3],
                             attr[:, AT_P1:AT_P1 + 3],
                             attr[:, AT_P2:AT_P2 + 3])
    b0 = 1.0 - b1 - b2
    tp0 = attr[:, AT_P0:AT_P0 + 3]
    tp1 = attr[:, AT_P1:AT_P1 + 3]
    tp2 = attr[:, AT_P2:AT_P2 + 3]
    has_n = attr[:, AT_HASN] > 0.5
    tn = jnp.where(has_n[:, None, None],
                   attr[:, AT_N:AT_N + 9].reshape(N, 3, 3), 0.0)
    tuv = attr[:, AT_UV:AT_UV + 6].reshape(N, 3, 2)
    p_t, ng_t, ns_raw, uv_t, dpdu_t, dpdv_t, perr_t = triangle_shading(
        None, b0, b1, b2, tp0, tp1, tp2, None, None, tuv, -d)
    # interpolated shading normals where present
    ns_int = normalize(b0[:, None] * tn[:, 0] + b1[:, None] * tn[:, 1]
                       + b2[:, None] * tn[:, 2])
    ns_bad = vm.length_squared(ns_int) < 1e-12
    ns_t = jnp.where((has_n & ~ns_bad)[:, None], ns_int, ns_raw)
    ng_t = vm.face_forward(ng_t, ns_t)

    tri_prim = attr[:, AT_PRIM].astype(jnp.int32)
    if flags.n_quadrics > 0:
        qh, q_t2, p_q, ng_q, uv_q, dpdu_q, dpdv_q, perr_q = _quadric_eval_all(
            scene, q_id, o, d, t_max)
        p = jnp.where(use_quad[:, None], p_q, p_t)
        ng = jnp.where(use_quad[:, None], ng_q, ng_t)
        ns = jnp.where(use_quad[:, None], ng_q, ns_t)
        uv = jnp.where(use_quad[:, None], uv_q, uv_t)
        dpdu = jnp.where(use_quad[:, None], dpdu_q, dpdu_t)
        dpdv = jnp.where(use_quad[:, None], dpdv_q, dpdv_t)
        perr = jnp.where(use_quad[:, None], perr_q, perr_t)
        prim = jnp.where(use_quad,
                         vm.gather_rows(scene.quad_prim, jnp.maximum(q_id, 0)),
                         tri_prim)
    else:
        p, ng, ns, uv, dpdu, dpdv, perr = p_t, ng_t, ns_t, uv_t, dpdu_t, dpdv_t, perr_t
        prim = tri_prim

    # instanced hits: geometry came out in PROTOTYPE space — move the frame
    # to world with the lane's instance transform at its ray time
    # (transformed_primitive.rs intersect: ray into prototype space, hit
    # back out; t is world-metric already, so p comes from the ray)
    if inst is not None and flags.n_instances > 0:
        has_i = (inst >= 0) & ~use_quad
        ii = jnp.maximum(inst, 0)
        tt = jnp.zeros((N,), jnp.float32) if time is None else \
            jnp.broadcast_to(time, (N,)).astype(jnp.float32)
        w = jnp.clip(tt, 0.0, 1.0)[:, None]
        if flags.any_animated_inst:
            # match the kernel's TRS/slerp interpolation exactly
            from pbrt_tpu.accel.pallas_instance import (trs_matrices_at,
                                                        IMAT_STRIDE)
            rows_i = vm.gather_rows(
                scene.ibvh.imat.reshape(-1, IMAT_STRIDE), ii)
            Mw, Mi = trs_matrices_at(rows_i, w[:, 0])
        else:
            A = vm.gather_rows(scene.ibvh.i2w, ii)          # [N,2,16]
            Mi = (A[:, 0] + w * (A[:, 1] - A[:, 0])).reshape(N, 4, 4)
            Wm = vm.gather_rows(scene.ibvh.w2p, ii)
            Mw = (Wm[:, 0] + w * (Wm[:, 1] - Wm[:, 0])).reshape(N, 4, 4)
        lin = Mi[:, :3, :3]
        p_i = o + t[:, None] * d
        dpdu_i = jnp.einsum("nij,nj->ni", lin, dpdu)
        dpdv_i = jnp.einsum("nij,nj->ni", lin, dpdv)
        # normals transform by the inverse-transpose = (w2p linear)^T
        ns_i = normalize(jnp.einsum("nij,ni->nj", Mw[:, :3, :3], ns))
        ng_i = normalize(jnp.einsum("nij,ni->nj", Mw[:, :3, :3], ng))
        perr_i = jnp.einsum("nij,nj->ni", jnp.abs(lin), perr) \
            + 1e-5 * jnp.abs(p_i)
        p = jnp.where(has_i[:, None], p_i, p)
        dpdu = jnp.where(has_i[:, None], dpdu_i, dpdu)
        dpdv = jnp.where(has_i[:, None], dpdv_i, dpdv)
        ns = jnp.where(has_i[:, None], ns_i, ns)
        ng = jnp.where(has_i[:, None], vm.face_forward(ng_i, ns_i), ng)
        perr = jnp.where(has_i[:, None], perr_i, perr)

    # reverse orientation flips normals (GeometricPrimitive); tri lanes read
    # the packed column, quadric lanes the (small, one-hot) prim table
    rev = attr[:, AT_REV] > 0.5
    mat_row = attr[:, AT_MAT].astype(jnp.int32)
    light_row = attr[:, AT_LIGHT].astype(jnp.int32)
    if flags.n_quadrics > 0:
        qprim = jnp.maximum(prim, 0)
        rev = jnp.where(use_quad, vm.gather_rows(scene.prim_rev, qprim), rev)
        mat_row = jnp.where(use_quad,
                            vm.gather_rows(scene.prim_material, qprim), mat_row)
        light_row = jnp.where(use_quad,
                              vm.gather_rows(scene.prim_light, qprim), light_row)
    ng = jnp.where(rev[:, None], -ng, ng)
    ns = jnp.where(rev[:, None], -ns, ns)

    # sanitize miss lanes: garbage positions (1e30 sentinels) overflow f32
    # in downstream distance math and poison reverse-mode AD through where()
    # (the double-where problem) — replace with benign finite values
    safe3 = lambda v, alt: jnp.where(any_hit[:, None], jnp.nan_to_num(v, nan=0.0, posinf=0.0, neginf=0.0), alt)
    up = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], jnp.float32), (N, 3))
    p = safe3(p, 0.0)
    perr = safe3(perr, 0.0)
    ng = safe3(ng, up)
    ns = safe3(ns, up)
    uv = jnp.where(any_hit[:, None], jnp.nan_to_num(uv), 0.0)
    dpdu = safe3(dpdu, up)
    dpdv = safe3(dpdv, up)
    t = jnp.where(any_hit, t, 1e20)

    ss, ts = make_frame(ns, dpdu)
    material = jnp.where(any_hit, mat_row, -1)
    area_light = jnp.where(any_hit, light_row, -1)
    z = jnp.zeros((N,), jnp.float32)
    return SurfaceInteraction(
        valid=any_hit, t=t, p=p, p_err=perr, wo=normalize(-d), ng=ng, ns=ns,
        ss=ss, ts=ts, uv=uv, dpdu=dpdu, dpdv=dpdv,
        prim=jnp.where(any_hit, prim, -1), material=material,
        area_light=area_light, dudx=z, dvdx=z, dudy=z, dvdy=z)


def intersect_p(scene: SceneData, flags: SceneFlags, o, d, t_max, time=None):
    """Any-hit (shadow rays). Returns [N] bool occluded."""
    o, d, t_max = jax.lax.stop_gradient((o, d, jnp.asarray(t_max, jnp.float32)))
    occluded = jnp.zeros(o.shape[:1], bool)
    if flags.n_tris > 0:
        if flags.has_alpha:
            # any-hit can land on a masked point; fall back to the
            # alpha-aware closest-hit walk (shadow_alpha_mask semantics,
            # triangle.rs intersect_p)
            th = _closest_tris_alpha(scene, flags, o, d,
                                     jnp.asarray(t_max, jnp.float32),
                                     shadow=True)
        elif flags.use_pallas:
            from pbrt_tpu.accel.pallas_traverse import intersect_bvh_pallas
            o, d, t_max = jax.lax.stop_gradient((o, d, t_max))
            th = intersect_bvh_pallas(scene.pbvh, o, d, t_max, any_hit=True)
        elif flags.use_bvh and flags.accel == "kdtree":
            th = intersect_kdtree(scene.kd, scene.tri_p0, scene.tri_p1,
                                  scene.tri_p2, o, d, t_max, any_hit=True)
        elif flags.use_bvh:
            th = intersect_bvh(scene.bvh, scene.tri_p0, scene.tri_p1,
                               scene.tri_p2, o, d, t_max, any_hit=True)
        elif flags.n_instances > 0:
            nw = flags.n_world_tris
            th = intersect_bruteforce(scene.tri_p0[:nw], scene.tri_p1[:nw],
                                      scene.tri_p2[:nw], o, d, t_max)
        else:
            th = intersect_bruteforce(scene.tri_p0, scene.tri_p1, scene.tri_p2,
                                      o, d, t_max)
        occluded = occluded | _hit_valid(th)
    if flags.n_instances > 0:
        from pbrt_tpu.accel.pallas_instance import intersect_instances
        thi, _ = intersect_instances(scene.ibvh, o, d,
                                     jnp.asarray(t_max, jnp.float32),
                                     time=time,
                                     interpret=not flags.use_pallas,
                                     trs=flags.any_animated_inst)
        occluded = occluded | (thi.tri >= 0)
    if flags.n_quadrics > 0:
        q_t, q_id = _quadric_pass(scene, flags, o, d, jnp.asarray(t_max, jnp.float32))
        occluded = occluded | (q_id >= 0)
    return occluded
