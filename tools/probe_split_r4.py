"""Split traversal cost: node walk vs leaf tests; rows/pops sweep (large)."""
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
from pbrt_tpu.accel.pallas_traverse import _traverse_cols
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
    n = int(os.environ.get("N", 1 << 16))
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

    # bounce rays (diffuse from camera hits)
    from pbrt_tpu.scene.intersect import intersect
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

    for label, oo, dd in [("cam", o, d), ("bounce", o2, d2)]:
        for rows, pops, skip in [(8, 8, False), (8, 8, True), (4, 8, False),
                                 (8, 4, False), (8, 16, False),
                                 (4, 4, False), (8, 12, False)]:
            f = jax.jit(lambda *a, rows=rows, pops=pops, skip=skip:
                        _traverse_cols(pb, *a, with_iters=True, rows=rows,
                                       pops=pops, dbg_skip_leaf=skip))
            try:
                dt, (th, it) = timeit(f, *cols(oo, dd), tmax)
            except Exception as e:
                print(f"{label} rows={rows} pops={pops} skip={int(skip)}: "
                      f"FAIL {str(e)[:80]}")
                continue
            print(f"{label} rows={rows:2d} pops={pops:2d} skip={int(skip)}: "
                  f"{dt*1e3:7.2f} ms it/blk={float(np.mean(it)):6.1f}")


if __name__ == "__main__":
    main()
