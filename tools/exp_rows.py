"""Benchmark ROWS (packets per block) for the production traversal kernel."""
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
from pbrt_tpu.accel.pallas_traverse import _traverse
from pbrt_tpu.scene.intersect import intersect
from pbrt_tpu.integrators.common import camera_rays
from pbrt_tpu.core.math import normalize


def make_wavefront(cs, n):
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
    return o, d, o2, d2


def main():
    cs = _build_scene()
    pb = cs.data.pbvh
    n = int(os.environ.get("N", 1 << 16))
    o, d, o2, d2 = make_wavefront(cs, n)
    tmax = jnp.full((n,), 1e30)

    ref = None
    for rows in (8, 16):
        f = jax.jit(lambda o, d, t, rows=rows: _traverse(
            pb, o, d, t, with_iters=True, rows=rows))
        for name, oo, dd in (("cam", o, d), ("bounce", o2, d2)):
            out = f(oo, dd, tmax)
            jax.block_until_ready(out)
            t0 = time.time()
            for _ in range(10):
                out = f(oo, dd, tmax)
            jax.block_until_ready(out)
            dt = (time.time() - t0) / 10
            th, iters = out
            nb = n // (rows * 128)
            print(f"rows={rows:2d} {name:6s} {dt*1e3:7.2f} ms  "
                  f"iters mean={np.mean(iters):7.1f} "
                  f"(total joint iters {np.sum(iters)})", flush=True)
            if name == "bounce":
                if ref is None:
                    ref = np.asarray(th.tri)
                else:
                    mism = np.sum(np.asarray(th.tri) != ref)
                    print(f"         tri mismatches vs rows=8: {mism}")


if __name__ == "__main__":
    main()
