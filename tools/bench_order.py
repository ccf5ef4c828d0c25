"""Effect of wavefront pixel ordering on Pallas traversal time (TPU).

Packets are 128 consecutive lanes; raster order makes a packet span 2 full
image rows, Morton order makes it a compact ~11x11 tile. Also measures a
bounce-like incoherent load, sorted vs unsorted.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(f, *args, iters=10):
    out = jax.block_until_ready(f(*args))
    t0 = time.time()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters


def morton2(x, y, bits=8):
    m = np.zeros_like(x, dtype=np.uint32)
    for b in range(bits):
        m |= ((x >> b) & 1) << (2 * b) | ((y >> b) & 1) << (2 * b + 1)
    return m


def main():
    from __graft_entry__ import _build_scene
    from pbrt_tpu.accel.pallas_traverse import intersect_bvh_pallas
    from pbrt_tpu.integrators.common import camera_rays

    N = 1 << 16
    cs = _build_scene()
    data = cs.data
    side = 64
    lin = np.arange(N) % (side * side)
    px_r = (lin % side).astype(np.int32)
    py_r = (lin // side).astype(np.int32)
    mort = morton2(px_r.astype(np.uint32), py_r.astype(np.uint32))
    order = np.argsort(mort, kind="stable")
    px_m, py_m = px_r[order], py_r[order]

    tmax = jnp.full((N,), 1e30, jnp.float32)
    f_trav = jax.jit(lambda o, d: intersect_bvh_pallas(data.pbvh, o, d, tmax))
    f_cam = jax.jit(lambda px, py: camera_rays(
        cs, px, py, jnp.ones((N,), jnp.int32))[0])

    for name, px, py in (("raster", px_r, py_r), ("morton", px_m, py_m)):
        rays = jax.block_until_ready(f_cam(jnp.asarray(px), jnp.asarray(py)))
        o, d = rays.o, rays.d
        jax.block_until_ready(f_trav(o, d))
        dt = timeit(f_trav, o, d)
        print(f"camera {name}:  {dt*1e3:8.2f} ms  {N/dt/1e6:6.2f} Mrays/s")

    # bounce-like: cosine-hemisphere directions from points on the knot,
    # unsorted vs sorted by (origin-cell, direction-octant)
    rng = np.random.default_rng(0)
    th = rng.random(N) * 2 * np.pi
    ph = np.arccos(rng.random(N) ** 0.5)
    dmat = np.stack([np.sin(ph) * np.cos(th), np.sin(ph) * np.sin(th),
                     np.cos(ph)], -1).astype(np.float32)
    # origins: random points near the knot surface region
    omat = (rng.random((N, 3)).astype(np.float32) - 0.5) * 2.0
    o_b = jnp.asarray(omat)
    d_b = jnp.asarray(dmat)
    dt = timeit(f_trav, o_b, d_b)
    print(f"bounce unsorted: {dt*1e3:8.2f} ms  {N/dt/1e6:6.2f} Mrays/s")

    oct_ = ((dmat[:, 0] < 0) + 2 * (dmat[:, 1] < 0) + 4 * (dmat[:, 2] < 0)).astype(np.uint32)
    q = np.clip(((omat + 1.0) * 0.5 * 15), 0, 15).astype(np.uint32)
    okey = morton2(q[:, 0], q[:, 1], 4) | (morton2(q[:, 2], oct_, 4) << 8)
    key = (okey << 3) | oct_
    so = np.argsort(key, kind="stable")
    dt = timeit(f_trav, o_b[so], d_b[so])
    print(f"bounce sorted:   {dt*1e3:8.2f} ms  {N/dt/1e6:6.2f} Mrays/s")

    # direction-octant only sort
    so2 = np.argsort(oct_, kind="stable")
    dt = timeit(f_trav, o_b[so2], d_b[so2])
    print(f"bounce oct-sort: {dt*1e3:8.2f} ms  {N/dt/1e6:6.2f} Mrays/s")


def iters_probe():
    """Iteration counts per 1024-ray block (divergence diagnostic)."""
    from __graft_entry__ import _build_scene
    from pbrt_tpu.accel.pallas_traverse import _traverse
    from pbrt_tpu.integrators.common import camera_rays
    import jax.numpy as jnp
    N = 1 << 16
    cs = _build_scene()
    side = 64
    lin = np.arange(N) % (side * side)
    xs, ys = (lin % side).astype(np.uint32), (lin // side).astype(np.uint32)
    order = np.argsort(morton2(xs, ys), kind="stable")
    px, py = xs[order].astype(np.int32), ys[order].astype(np.int32)
    rays = camera_rays(cs, jnp.asarray(px), jnp.asarray(py),
                       jnp.ones((N,), jnp.int32))[0]
    tmax = jnp.full((N,), 1e30, jnp.float32)
    th, iters = _traverse(cs.data.pbvh, rays.o, rays.d, tmax, with_iters=True)
    it = np.asarray(iters).ravel()
    print(f"camera-morton iters/block: mean={it.mean():.0f} min={it.min()} "
          f"max={it.max()} p90={np.percentile(it, 90):.0f}")


if __name__ == "__main__":
    if os.environ.get("ITERS_PROBE"):
        iters_probe()
    else:
        main()
