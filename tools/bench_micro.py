"""Microbenchmark: where does BVH traversal time go on the TPU?

Times, at N rays on the knot scene:
  a) full intersect_bvh closest-hit
  b) a stripped while_loop doing ONLY the packed-node gather per iteration
  c) same loop with the gather replaced by a broadcast (loop overhead bound)
  d) pure elementwise op (dispatch overhead bound)
Run: python tools/bench_micro.py   (grabs the TPU tunnel — single client!)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from pbrt_tpu.shapes.triangle import make_knot_mesh
from pbrt_tpu.accel.bvh import build_bvh
from pbrt_tpu.accel.traverse import intersect_bvh


def timeit(f, *args, iters=5):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters


def main():
    N = int(os.environ.get("N", 1 << 14))
    mesh = make_knot_mesh(n_u=96, n_v=24, scale=0.45)
    p = np.asarray(mesh.p)
    idx = np.asarray(mesh.indices).reshape(-1, 3)
    p0, p1, p2 = p[idx[:, 0]], p[idx[:, 1]], p[idx[:, 2]]
    lo = np.minimum(np.minimum(p0, p1), p2)
    hi = np.maximum(np.maximum(p0, p1), p2)
    bvh = build_bvh(lo, hi)
    print(f"tris={len(p0)} nodes={bvh.n_nodes} N={N} backend={jax.devices()[0].platform}")

    tp0, tp1, tp2 = jnp.asarray(p0), jnp.asarray(p1), jnp.asarray(p2)

    # coherent camera-like rays from z=+4 toward origin jittered
    rng = np.random.default_rng(0)
    u = rng.random((N, 2)).astype(np.float32)
    o = jnp.asarray(np.stack([(u[:, 0] - .5) * 2, (u[:, 1] - .5) * 2,
                              np.full(N, 4.0, np.float32)], -1))
    d = jnp.asarray(np.stack([np.zeros(N, np.float32), np.zeros(N, np.float32),
                              -np.ones(N, np.float32)], -1))
    t_max = jnp.full((N,), 1e30, jnp.float32)

    f_full = jax.jit(lambda o, d: intersect_bvh(bvh, tp0, tp1, tp2, o, d, t_max))
    dt = timeit(f_full, o, d)
    th = f_full(o, d)
    print(f"a) intersect_bvh:        {dt*1e3:9.2f} ms   hits={int((th.tri>=0).sum())}")

    # b) gather-only loop, fixed iteration count
    ITERS = int(os.environ.get("ITERS", 256))
    packed = bvh.packed
    M = packed.shape[0]

    def gather_loop(o):
        node = (o[:, 0] * 0).astype(jnp.int32)
        acc = o[:, 0] * 0

        def body(i, st):
            node, acc = st
            rec = packed[node]
            acc = acc + rec[:, 0]
            node = (node + jax.lax.bitcast_convert_type(rec[:, 13], jnp.int32)) % M
            return node, acc
        return jax.lax.fori_loop(0, ITERS, body, (node, acc))[1]

    dt = timeit(jax.jit(gather_loop), o)
    print(f"b) {ITERS}x packed gather: {dt*1e3:9.2f} ms   ({dt/ITERS*1e6:.1f} us/iter)")

    # c) loop without gather
    def nogather_loop(o):
        acc = o[:, 0] * 0

        def body(i, st):
            return st * 0.5 + 1.0
        return jax.lax.fori_loop(0, ITERS, body, acc)

    dt = timeit(jax.jit(nogather_loop), o)
    print(f"c) {ITERS}x no-gather:     {dt*1e3:9.2f} ms   ({dt/ITERS*1e6:.1f} us/iter)")

    # d) one elementwise
    f_ew = jax.jit(lambda o: o * 2.0 + 1.0)
    dt = timeit(f_ew, o)
    print(f"d) elementwise dispatch: {dt*1e3:9.2f} ms")

    # e) scatter (stack push) loop
    def scatter_loop(o):
        stack = jnp.zeros((N, 64), jnp.int32)
        lanes = jnp.arange(N)

        def body(i, stack):
            stack = stack.at[lanes, i % 64].set(i)
            return stack
        return jax.lax.fori_loop(0, ITERS, body, stack)

    dt = timeit(jax.jit(scatter_loop), o)
    print(f"e) {ITERS}x stack scatter: {dt*1e3:9.2f} ms   ({dt/ITERS*1e6:.1f} us/iter)")

    # f) triangle-gather (leaf test) loop: 12 row gathers like the leaf unroll
    def leaf_loop(o):
        sidx = (o[:, 0] * 0).astype(jnp.int32)
        acc = o[:, 0] * 0

        def body(i, st):
            sidx, acc = st
            for k in range(4):
                a = tp0[sidx + k % 3]
                b = tp1[sidx + k % 3]
                c = tp2[sidx + k % 3]
                acc = acc + a[:, 0] + b[:, 1] + c[:, 2]
            sidx = (sidx + 1) % (len(p0) - 4)
            return sidx, acc
        return jax.lax.fori_loop(0, ITERS, body, (sidx, acc))[1]

    dt = timeit(jax.jit(leaf_loop), o)
    print(f"f) {ITERS}x 12 tri gathers:{dt*1e3:9.2f} ms   ({dt/ITERS*1e6:.1f} us/iter)")


if __name__ == "__main__":
    main()
