"""Round-4 perf probe: decompose traversal launch cost.

Measures, on the live backend: unsorted vs sorted traversal, the argsort
itself, per-iteration marginal cost (via iters regressed against time at
different coherence levels), and block-count scaling.
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
from pbrt_tpu.integrators.common import camera_rays
from pbrt_tpu.core.math import normalize
from pbrt_tpu.accel.pallas_traverse import _traverse, _ray_sort_key
from pbrt_tpu.scene.intersect import intersect


def timeit(f, *args, iters=30):
    out = jax.block_until_ready(f(*args))
    t0 = time.time()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters, out


def main():
    cs = _build_scene()
    pb = cs.data.pbvh
    n = int(os.environ.get("N", 1 << 16))
    lin = np.arange(n, dtype=np.int64) % (64 * 64)
    xs = (lin % 64).astype(np.int64)
    ys = (lin // 64).astype(np.int64)
    key = np.zeros_like(xs)
    for b in range(6):
        key |= ((xs >> b) & 1) << (2 * b) | ((ys >> b) & 1) << (2 * b + 1)
    order = np.argsort(key, kind="stable")
    px = jnp.asarray(xs[order], jnp.int32)
    py = jnp.asarray(ys[order], jnp.int32)
    sidx = jnp.ones(n, jnp.int32)
    rays, _, _ = jax.jit(lambda a, b, c: camera_rays(cs, a, b, c))(px, py, sidx)
    o, d = rays.o, normalize(rays.d)
    tmax = jnp.full((n,), 1e30)

    f_uns = jax.jit(lambda o, d, t: _traverse(pb, o, d, t, with_iters=True))
    dt, (th, it) = timeit(f_uns, o, d, tmax)
    nb = it.shape[0]
    print(f"cam unsorted:  {dt*1e3:7.2f} ms  iters mean={float(np.mean(it)):6.1f} "
          f"total={int(np.sum(it))}  us/iter={dt*1e6/float(np.sum(it)):.2f}")

    f_sort = jax.jit(lambda o, d, t: _traverse(pb, o, d, t, sort=True))
    dt_s, _ = timeit(f_sort, o, d, tmax)
    print(f"cam sorted:    {dt_s*1e3:7.2f} ms")

    f_key = jax.jit(lambda o, d: jnp.argsort(_ray_sort_key(pb, o, d)))
    dt_k, perm = timeit(f_key, o, d)
    print(f"argsort alone: {dt_k*1e3:7.2f} ms")

    # gather+unsort-scatter cost
    f_g = jax.jit(lambda o, d, p: (o[p], d[p]))
    dt_g, _ = timeit(f_g, o, d, perm)
    print(f"permute o,d:   {dt_g*1e3:7.2f} ms")

    # bounce rays (diffuse hemisphere around normal)
    si = jax.jit(lambda o, d, t: intersect(cs.data, cs.flags, o, d, t))(o, d, tmax)
    kx = jax.random.PRNGKey(0)
    u = jax.random.uniform(kx, (n, 2))
    r = jnp.sqrt(u[:, 0]); phi = 2 * jnp.pi * u[:, 1]
    t_ = jnp.where(jnp.abs(si.ns[:, 0:1]) > 0.9,
                   jnp.array([[0.0, 1.0, 0.0]]), jnp.array([[1.0, 0.0, 0.0]]))
    ss = normalize(jnp.cross(si.ns, t_)); ts = jnp.cross(si.ns, ss)
    d2 = normalize((r * jnp.cos(phi))[:, None] * ss
                   + (r * jnp.sin(phi))[:, None] * ts
                   + jnp.sqrt(jnp.maximum(1 - u[:, 0], 0.0))[:, None] * si.ns)
    o2 = si.p + si.ng * 1e-3
    dt_b, (_, itb) = timeit(f_uns, o2, d2, tmax)
    print(f"bounce unsrt:  {dt_b*1e3:7.2f} ms  iters mean={float(np.mean(itb)):6.1f} "
          f"total={int(np.sum(itb))}  us/iter={dt_b*1e6/float(np.sum(itb)):.2f}")
    dt_bs, _ = timeit(f_sort, o2, d2, tmax)
    print(f"bounce sorted: {dt_bs*1e3:7.2f} ms")
    # sorted iters
    perm2 = np.asarray(f_key(o2, d2))
    _, itbs = jax.block_until_ready(f_uns(o2[perm2], d2[perm2], tmax))
    print(f"   sorted iters mean={float(np.mean(itbs)):6.1f} total={int(np.sum(itbs))}")

    # half-dead wavefront: every other lane far-missed
    from pbrt_tpu.accel.pallas_traverse import far_miss_rays
    fo, fd = far_miss_rays(pb, n)
    mask = (np.arange(n) % 2 == 0)
    o3 = jnp.where(jnp.asarray(mask)[:, None], o2, fo)
    d3 = jnp.where(jnp.asarray(mask)[:, None], d2, fd)
    dt_h, (_, ith) = timeit(f_uns, o3, d3, tmax)
    print(f"half-dead:     {dt_h*1e3:7.2f} ms  iters mean={float(np.mean(ith)):6.1f}")

    # small wavefront scaling: 1,2,4,...,64 blocks of bounce rays
    for blocks in (1, 4, 16, 64):
        m = blocks * 1024
        dt_m, _ = timeit(f_uns, o2[:m], d2[:m], tmax[:m])
        print(f"bounce {blocks:3d} blk: {dt_m*1e3:7.2f} ms ({dt_m*1e6/blocks:6.1f} us/blk)")


if __name__ == "__main__":
    main()
