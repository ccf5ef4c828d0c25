"""Direct traversal timing on the large scene: camera + bounce wavefronts."""
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
from pbrt_tpu.accel.pallas_traverse import _traverse_cols, _ray_sort_key_cols
from pbrt_tpu.scene.intersect import intersect
from pbrt_tpu.integrators.common import camera_rays
from pbrt_tpu.core.math import normalize


def timeit(f, *args, iters=10):
    out = jax.block_until_ready(f(*args))
    t0 = time.time()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters, out


def main():
    cs = _build_scene(large=os.environ.get("SMALL", "0") != "1")
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

    def cols(o, d):
        ot, dt_ = o.T, d.T
        return ot[0], ot[1], ot[2], dt_[0], dt_[1], dt_[2]

    f = jax.jit(lambda *a: _traverse_cols(pb, *a, with_iters=True))
    dt, (th, it) = timeit(f, *cols(o, d), tmax)
    print(f"cam:          {dt*1e3:7.2f} ms  it/blk={float(np.mean(it)):6.1f}")

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
    dt_b, (_, itb) = timeit(f, *cols(o2, d2), tmax)
    print(f"bounce:       {dt_b*1e3:7.2f} ms  it/blk={float(np.mean(itb)):6.1f}")

    # sorted bounce
    def sorted_trav(o, d, t):
        ox, oy, oz, dx, dy, dz = cols(o, d)
        k = _ray_sort_key_cols(pb, ox, oy, oz, dx, dy, dz)
        (_, oxs, oys, ozs, dxs, dys, dzs, tms) = jax.lax.sort(
            (k, ox, oy, oz, dx, dy, dz, t), dimension=0, num_keys=1)
        return _traverse_cols(pb, oxs, oys, ozs, dxs, dys, dzs, tms,
                              with_iters=True)
    fs = jax.jit(sorted_trav)
    dt_s, (_, its) = timeit(fs, o2, d2, tmax)
    print(f"bounce sorted:{dt_s*1e3:7.2f} ms  it/blk={float(np.mean(its)):6.1f}")


if __name__ == "__main__":
    main()
