"""Marginal in-graph cost of each op: time jit(K reps) for K=1,2 and diff.

Removes the per-call RPC/dispatch overhead of the tunneled platform that
pollutes one-op micro-benches.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))

from __graft_entry__ import _build_scene
from pbrt_tpu.accel.pallas_traverse import _traverse, _ray_sort_key
from pbrt_tpu.scene.intersect import intersect


def timed(f, *args, iters=30):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters


def marginal(make_f, *args, iters=30):
    t1 = timed(jax.jit(make_f(1)), *args, iters=iters)
    t2 = timed(jax.jit(make_f(2)), *args, iters=iters)
    return t2 - t1, t1


def main():
    cs = _build_scene()
    pb = cs.data.pbvh
    n = int(os.environ.get("N", 1 << 16))
    o = jax.random.uniform(jax.random.PRNGKey(0), (n, 3)) * 2 - 1
    d = jax.random.normal(jax.random.PRNGKey(1), (n, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    tmax = jnp.full((n,), 1e30)
    key = _ray_sort_key(pb, o, d)
    perm = jnp.argsort(key)

    def mk_argsort(k):
        def f(key):
            out = key
            for i in range(k):
                out = jnp.argsort(out + i)
            return out
        return f
    dm, _ = marginal(mk_argsort, key)
    print(f"argsort[{n}] marginal:      {dm*1e3:7.2f} ms")

    def mk_gather3(k):
        def f(v, p):
            out = v
            for i in range(k):
                out = out[p]
            return out
        return f
    dm, _ = marginal(mk_gather3, o, perm)
    print(f"gather [N,3] marginal:     {dm*1e3:7.2f} ms")

    def mk_gather1(k):
        def f(v, p):
            out = v
            for i in range(k):
                out = out[p]
            return out
        return f
    dm, _ = marginal(mk_gather1, tmax, perm)
    print(f"gather [N] marginal:       {dm*1e3:7.2f} ms")

    def mk_scatter1(k):
        def f(v, p):
            out = v
            for i in range(k):
                out = jnp.zeros_like(out).at[p].set(out)
            return out
        return f
    dm, _ = marginal(mk_scatter1, tmax, perm)
    print(f"scatter [N] marginal:      {dm*1e3:7.2f} ms")

    def mk_trav_nosort(k):
        def f(o, d, tm):
            acc = 0.0
            for i in range(k):
                th = _traverse(pb, o, d, tm + i * 0.0, sort=False)
                acc = acc + th.t.sum()
            return acc
        return f
    dm, t1 = marginal(mk_trav_nosort, o, d, tmax, iters=10)
    print(f"traverse nosort marginal:  {dm*1e3:7.2f} ms (1x total {t1*1e3:.2f})")

    def mk_trav_sort(k):
        def f(o, d, tm):
            acc = 0.0
            for i in range(k):
                th = _traverse(pb, o, d, tm + i * 0.0, sort=True)
                acc = acc + th.t.sum()
            return acc
        return f
    dm, t1 = marginal(mk_trav_sort, o, d, tmax, iters=10)
    print(f"traverse sorted marginal:  {dm*1e3:7.2f} ms (1x total {t1*1e3:.2f})")

    # coherent camera-like rays
    oc = jnp.broadcast_to(jnp.array([3.0, 3.0, 3.0]), (n, 3))
    t_ = jnp.linspace(0, 1, n)
    dc = jnp.stack([-1.0 + 0.3 * t_, -1.0 + 0.2 * t_, -1.0 * jnp.ones(n)], -1)
    dc = dc / jnp.linalg.norm(dc, axis=-1, keepdims=True)
    dm, t1 = marginal(mk_trav_nosort, oc, dc, tmax, iters=10)
    print(f"traverse coherent nosort marginal: {dm*1e3:7.2f} ms")

    # iteration counts sorted vs unsorted
    _, it_u = jax.jit(lambda o, d, t: _traverse(pb, o, d, t, with_iters=True))(o, d, tmax)
    perm2 = jnp.argsort(_ray_sort_key(pb, o, d))
    _, it_s = jax.jit(lambda o, d, t: _traverse(pb, o, d, t, with_iters=True))(o[perm2], d[perm2], tmax)
    print(f"iters/block random: unsorted mean={np.mean(it_u):.0f}  sorted mean={np.mean(it_s):.0f}")


if __name__ == "__main__":
    main()
