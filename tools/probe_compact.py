"""Measure wavefront-compaction primitives on TPU at bounce-wavefront sizes.

Candidates for between-bounce compaction (VERDICT r4 item 1a):
  - full argsort by (dead | morton-octant) key
  - cumsum stable partition (live-first) + packed-ray gather/scatter
  - traversal cost sorted vs unsorted vs half-dead on the LARGE scene
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
from pbrt_tpu.accel.pallas_traverse import _traverse, _ray_sort_key, far_miss_rays
from pbrt_tpu.scene.intersect import intersect
from pbrt_tpu.integrators.common import camera_rays
from pbrt_tpu.core.math import normalize


def timeit(f, *args, iters=20):
    out = jax.block_until_ready(f(*args))
    t0 = time.time()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters, out


def main():
    cs = _build_scene(large=True)
    pb = cs.data.pbvh
    res = 256
    n = int(os.environ.get("N", 1 << 18))
    lin = np.arange(n, dtype=np.int64) % (res * res)
    xs = (lin % res).astype(np.int64)
    ys = (lin // res).astype(np.int64)
    key = np.zeros_like(xs)
    for b in range(8):
        key |= ((xs >> b) & 1) << (2 * b) | ((ys >> b) & 1) << (2 * b + 1)
    order = np.argsort(key, kind="stable")
    px = jnp.asarray(xs[order], jnp.int32)
    py = jnp.asarray(ys[order], jnp.int32)
    rays, _, _ = jax.jit(lambda a, b, c: camera_rays(cs, a, b, c))(
        px, py, jnp.ones(n, jnp.int32))
    o, d = rays.o, normalize(rays.d)
    tmax = jnp.full((n,), 1e30)

    f_uns = jax.jit(lambda o, d, t: _traverse(pb, o, d, t, with_iters=True))
    dt, (th, it) = timeit(f_uns, o, d, tmax, iters=5)
    print(f"cam unsorted:  {dt*1e3:7.2f} ms  it/blk={float(np.mean(it)):6.1f}")

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
    live = np.asarray(si.valid)
    print(f"live fraction after camera hit: {live.mean():.3f}")

    dt_b, (_, itb) = timeit(f_uns, o2, d2, tmax, iters=5)
    print(f"bounce unsrt:  {dt_b*1e3:7.2f} ms  it/blk={float(np.mean(itb)):6.1f}")

    # dead lanes -> far-miss (as the integrator does), random deaths
    fo, fd = far_miss_rays(pb, n)
    lv = jnp.asarray(live)
    o3 = jnp.where(lv[:, None], o2, fo)
    d3 = jnp.where(lv[:, None], d2, fd)
    dt_h, (_, ith) = timeit(f_uns, o3, d3, tmax, iters=5)
    print(f"live-masked:   {dt_h*1e3:7.2f} ms  it/blk={float(np.mean(ith)):6.1f}")

    # cumsum partition: live-first positions
    def partition(liveb):
        c = jnp.cumsum(liveb.astype(jnp.int32))
        nl = c[-1]
        cd = jnp.cumsum((~liveb).astype(jnp.int32))
        return jnp.where(liveb, c - 1, nl + cd - 1)
    f_part = jax.jit(partition)
    dt_p, pos = timeit(f_part, lv)
    print(f"cumsum partition: {dt_p*1e3:7.2f} ms")

    # packed ray permute: [N,8] scatter by pos
    rpack = jnp.concatenate([o3, d3, tmax[:, None],
                             jnp.zeros((n, 1))], -1)
    f_sc = jax.jit(lambda rp, pos: jnp.zeros_like(rp).at[pos].set(rp))
    dt_s, rpak2 = timeit(f_sc, rpack, pos)
    print(f"packed scatter [N,8]: {dt_s*1e3:7.2f} ms")
    f_g = jax.jit(lambda rp, pos: rp[pos])
    dt_g, _ = timeit(f_g, rpack, pos)
    print(f"packed gather [N,8]:  {dt_g*1e3:7.2f} ms")

    # compacted traversal: live-first wavefront
    rc = np.asarray(rpak2)
    oc, dc, tc = jnp.asarray(rc[:, 0:3]), jnp.asarray(rc[:, 3:6]), jnp.asarray(rc[:, 6])
    dt_c, (_, itc) = timeit(f_uns, oc, dc, tc, iters=5)
    print(f"compacted:     {dt_c*1e3:7.2f} ms  it/blk={float(np.mean(itc)):6.1f}")

    # argsort full morton+octant key for comparison
    f_key = jax.jit(lambda o, d: jnp.argsort(_ray_sort_key(pb, o, d)))
    dt_k, _ = timeit(f_key, o2, d2)
    print(f"argsort key:   {dt_k*1e3:7.2f} ms")

    # compact + morton-sorted live prefix
    def key2(o, d, liveb):
        k = _ray_sort_key(pb, o, d)
        return jnp.where(liveb, k, jnp.int32(0x7FFFFFFF))
    f_k2 = jax.jit(lambda o, d, l: jnp.argsort(key2(o, d, l)))
    perm = jax.block_until_ready(f_k2(o2, d2, lv))
    oc2, dc2 = o3[perm], d3[perm]
    dt_c2, (_, itc2) = timeit(f_uns, oc2, dc2, tmax, iters=5)
    print(f"compact+sort:  {dt_c2*1e3:7.2f} ms  it/blk={float(np.mean(itc2)):6.1f}")


if __name__ == "__main__":
    main()
