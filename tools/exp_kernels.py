"""Experimental traversal-kernel variants, benchmarked against the live one.

Variants:
  A. shared-stack: ONE stack per ROWSx128 block (scalar pop amortized over
     8 rows; more iterations from the bigger packet union).
  B. flat nodes: node record stored one-per-sublane-row [M,128] (lanes 0:12)
     -> dynamic sublane slice, NO lane roll.
  C. gated tri fetch: only slice the tris table when the popped node is a
     leaf (pl.when + scratch).
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))

from __graft_entry__ import _build_scene
from pbrt_tpu.accel.pallas_traverse import _traverse
from pbrt_tpu.scene.intersect import intersect
from pbrt_tpu.integrators.common import camera_rays
from pbrt_tpu.core.math import normalize

ROWS = 8
LANES = 128
STACK = 64


def flat_pack(pb):
    """nodes [Mpad, 128] f32 (lanes 0:12 = both children bounds);
    tris [Lpad*... one leaf block per row: [Lb, 128] lanes 0:64."""
    nodes8 = np.asarray(pb.nodes).reshape(-1, 8, 16)
    M = nodes8.shape[0] * 8
    flat = np.zeros((M, 128), np.float32)
    flat[:, :16] = nodes8.reshape(M, 16)
    tris2 = np.asarray(pb.tris)            # [Lpad/2, 128]
    Lb = tris2.shape[0] * 2
    tflat = np.zeros((Lb, 128), np.float32)
    tflat[0::2, :64] = tris2[:, :64]
    tflat[1::2, :64] = tris2[:, 64:]
    return jnp.asarray(flat), jnp.asarray(tflat)


def _pick(ax_, ay_, az_, k):
    return jnp.where(k == 0, ax_, jnp.where(k == 1, ay_, az_))


def _shared_kernel(meta_ref, nodes_ref, tris_ref,
                   ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tm_ref,
                   t_out, tri_out, b1_out, b2_out, it_out,
                   stack_ref, sp_ref, *, rows: int, flat: bool):
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

    t_out[:] = tm
    tri_out[:] = jnp.full((rows, LANES), -1, jnp.int32)
    b1_out[:] = jnp.zeros((rows, LANES), f32)
    b2_out[:] = jnp.zeros((rows, LANES), f32)
    stack_ref[0] = 0
    sp_ref[0] = 1

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
        sp = sp_ref[0]
        spm = jnp.maximum(sp - 1, 0)
        idx = stack_ref[spm]
        sp_ref[0] = spm
        w = meta_ref[idx]
        ax = w & 3
        cnt = (w >> 2) & 7
        payload = (w >> 5) & 0x7FFFFFF
        blk = jnp.where(cnt > 0, payload, 0)
        if flat:
            rec = nodes_ref[pl.ds(idx, 1), :]            # [1,128]
            tb = tris_ref[pl.ds(blk, 1), :64]
        else:
            nrow = nodes_ref[pl.ds(idx >> 3, 1), :]
            rec = pltpu.roll(nrow, -(idx & 7) * 16, 1)[:, :16]
            trow = tris_ref[pl.ds(blk >> 1, 1), :]
            tb = jnp.where((blk & 1) == 1, trow[:, 64:], trow[:, :64])

        t_best0 = t_out[:]
        is_int = jnp.where(cnt == 0, 1, 0)
        zcol = jnp.zeros((rows, 1), jnp.float32)

        def bc(v):
            # [1,1] -> [rows,1]: Mosaic can't broadcast sublanes+lanes at once
            return v + zcol
        hit_l = slab(bc(rec[:, 0:1]), bc(rec[:, 1:2]), bc(rec[:, 2:3]),
                     bc(rec[:, 3:4]), bc(rec[:, 4:5]), bc(rec[:, 5:6]), t_best0) & (is_int > 0)
        hit_r = slab(bc(rec[:, 6:7]), bc(rec[:, 7:8]), bc(rec[:, 8:9]),
                     bc(rec[:, 9:10]), bc(rec[:, 10:11]), bc(rec[:, 11:12]), t_best0) & (is_int > 0)

        @pl.when(cnt > 0)
        def _leaf():
            t_best = t_out[:]
            tri_b = tri_out[:]
            b1_b = b1_out[:]
            b2_b = b2_out[:]
            zc = jnp.zeros((rows, 16), jnp.float32)
            for j in range(4):
                hit, t, b1, b2 = tri_test(tb[:, j * 16:(j + 1) * 16] + zc, t_best)
                ok = hit & ((cnt > j) + jnp.zeros((rows, LANES), jnp.int32) > 0)
                t_best = jnp.where(ok, t, t_best)
                tri_b = jnp.where(ok, blk * 4 + j, tri_b)
                b1_b = jnp.where(ok, b1, b1_b)
                b2_b = jnp.where(ok, b2, b2_b)
            t_out[:] = t_best
            tri_out[:] = tri_b
            b1_out[:] = b1_b
            b2_out[:] = b2_b

        hl = jnp.sum(jnp.where(hit_l, 1, 0)) > 0
        hr = jnp.sum(jnp.where(hit_r, 1, 0)) > 0
        left = idx + 1
        rch = payload

        @pl.when(hr)
        def _():
            sp_s = sp_ref[0]
            stack_ref[jnp.minimum(sp_s, STACK - 1)] = rch
            sp_ref[0] = jnp.minimum(sp_s + 1, STACK - 1)

        @pl.when(hl)
        def _():
            sp_s = sp_ref[0]
            stack_ref[jnp.minimum(sp_s, STACK - 1)] = left
            sp_ref[0] = jnp.minimum(sp_s + 1, STACK - 1)

        return (it + 1, sp_ref[0] > 0)

    n_it, _ = jax.lax.while_loop(lambda c: c[1], body, (0, True))
    it_out[pl.program_id(0)] = n_it


@functools.partial(jax.jit, static_argnames=("flat", "rows"))
def traverse_shared(metas, nodes, tris, o, d, t_max, flat=False, rows=8):
    N = o.shape[0]
    BLK = rows * LANES
    npad = (-N) % BLK
    o_p = jnp.concatenate([o, jnp.zeros((npad, 3), jnp.float32)], 0)
    d_p = jnp.concatenate([d, jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], jnp.float32), (npad, 3))], 0)
    tm_p = jnp.concatenate([jnp.broadcast_to(t_max, (N,)), jnp.zeros((npad,))], 0)
    Np = N + npad
    R = Np // LANES

    def comp(v):
        return v.reshape(R, LANES)
    grid = Np // BLK
    blk = pl.BlockSpec((rows, LANES), lambda i: (i, 0))
    kern = functools.partial(_shared_kernel, rows=rows, flat=flat)
    out_shapes = [jax.ShapeDtypeStruct((R, LANES), jnp.float32),
                  jax.ShapeDtypeStruct((R, LANES), jnp.int32),
                  jax.ShapeDtypeStruct((R, LANES), jnp.float32),
                  jax.ShapeDtypeStruct((R, LANES), jnp.float32),
                  jax.ShapeDtypeStruct((grid,), jnp.int32)]
    t, tri, b1, b2, iters = pl.pallas_call(
        kern, grid=(grid,), out_shape=out_shapes,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)] + [blk] * 7,
        out_specs=[blk] * 4 + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        scratch_shapes=[pltpu.SMEM((STACK,), jnp.int32),
                        pltpu.SMEM((1,), jnp.int32)],
    )(metas, nodes, tris, comp(o_p[:, 0]), comp(o_p[:, 1]), comp(o_p[:, 2]),
      comp(d_p[:, 0]), comp(d_p[:, 1]), comp(d_p[:, 2]), comp(tm_p))
    return t.reshape(-1)[:N], tri.reshape(-1)[:N], iters


def main():
    cs = _build_scene()
    pb = cs.data.pbvh
    n = int(os.environ.get("N", 1 << 16))
    lin = np.arange(n, dtype=np.int64) % (64 * 64)
    xs = (lin % 64).astype(np.int64)
    ys = (lin // 64).astype(np.int64)
    keym = np.zeros_like(xs)
    for b in range(6):
        keym |= ((xs >> b) & 1) << (2 * b) | ((ys >> b) & 1) << (2 * b + 1)
    order = np.argsort(keym, kind="stable")
    px = jnp.asarray(xs[order], jnp.int32)
    py = jnp.asarray(ys[order], jnp.int32)
    rays, w, pf = jax.jit(lambda a, b, c: camera_rays(cs, a, b, c))(
        px, py, jnp.ones(n, jnp.int32))
    o, d = rays.o, normalize(rays.d)
    si = jax.jit(lambda o, d: intersect(cs.data, cs.flags, o, d,
                                        jnp.full((n,), 1e30)))(o, d)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    u1 = jax.random.uniform(k1, (n,))
    u2 = jax.random.uniform(k2, (n,))
    r = jnp.sqrt(u1)
    phi = 2 * jnp.pi * u2
    ns = si.ns
    t_ = jnp.where(jnp.abs(ns[:, 0:1]) > 0.9, jnp.array([[0.0, 1.0, 0.0]]),
                   jnp.array([[1.0, 0.0, 0.0]]))
    ss = normalize(jnp.cross(ns, t_))
    ts = jnp.cross(ns, ss)
    ld = jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi),
                    jnp.sqrt(jnp.maximum(1 - u1, 0.0))], -1)
    d2 = normalize(ld[:, 0:1] * ss + ld[:, 1:2] * ts + ld[:, 2:3] * ns)
    o2 = si.p + si.ng * 1e-3
    tmax = jnp.full((n,), 1e30)

    nodes_flat, tris_flat = flat_pack(pb)
    print(f"flat nodes VMEM: {nodes_flat.size*4/1e6:.1f} MB, "
          f"tris {tris_flat.size*4/1e6:.1f} MB")

    def bench(name, f, *args):
        out = f(*args)
        jax.block_until_ready(out)
        t0 = time.time()
        for _ in range(10):
            out = f(*args)
        jax.block_until_ready(out)
        dt = (time.time() - t0) / 10
        iters = out[-1]
        print(f"{name:44s} {dt*1e3:7.2f} ms  iters mean={np.mean(iters):7.1f}")
        return out

    # reference: current kernel
    tf = jax.jit(lambda o, d, t: _traverse(pb, o, d, t, with_iters=True))
    out = bench("current (cam)", lambda o, d, t: tf(o, d, t), o, d, tmax)
    t_ref_cam = np.asarray(out[0].t)
    out = bench("current (bounce)", lambda o, d, t: tf(o, d, t), o2, d2, tmax)
    t_ref = np.asarray(out[0].t)
    tri_ref = np.asarray(out[0].tri)

    for rows in (8, 16, 32):
        f = lambda o, d, t, rows=rows: traverse_shared(pb.metas, pb.nodes, pb.tris, o, d, t, flat=False, rows=rows)
        bench(f"shared-stack rows={rows} (cam)", f, o, d, tmax)
        out = bench(f"shared-stack rows={rows} (bounce)", f, o2, d2, tmax)
    # correctness check vs current
    t_new = np.asarray(out[0])
    mism = np.sum(np.asarray(out[1]) != tri_ref)
    print(f"  shared vs current tri mismatches: {mism}")

    for rows in (8, 16, 32):
        f = lambda o, d, t, rows=rows: traverse_shared(pb.metas, nodes_flat, tris_flat, o, d, t, flat=True, rows=rows)
        bench(f"shared+flat rows={rows} (cam)", f, o, d, tmax)
        bench(f"shared+flat rows={rows} (bounce)", f, o2, d2, tmax)


if __name__ == "__main__":
    main()
