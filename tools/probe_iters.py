"""Probe: Pallas traversal iteration counts + sort overhead on TPU."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(f, *args, iters=10):
    jax.block_until_ready(f(*args))
    t0 = time.time()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters


def main():
    from __graft_entry__ import _build_scene
    from pbrt_tpu.accel import pallas_traverse as PT
    from pbrt_tpu.integrators.common import camera_rays

    N = int(os.environ.get("N", 1 << 16))
    cs = _build_scene()
    pb = cs.data.pbvh
    print("nodes rows", pb.nodes.shape, "tris", pb.tris.shape,
          "vmem KB", pb.vmem_bytes // 1024)

    side = 64
    lin = np.arange(N) % (side * side)
    px = jnp.asarray(lin % side, jnp.int32)
    py = jnp.asarray(lin // side, jnp.int32)
    sidx = jnp.ones((N,), jnp.int32)
    rays, _, _ = camera_rays(cs, px, py, sidx)
    o, d = rays.o, rays.d
    tmax = jnp.full((N,), 1e30, jnp.float32)

    th, iters = PT._traverse(pb, o, d, tmax, with_iters=True)
    jax.block_until_ready(th)
    it = np.asarray(iters)
    print(f"iters/block: mean {it.mean():.0f} min {it.min()} max {it.max()}  "
          f"blocks {it.size}")

    for sort in (False, True):
        f = jax.jit(lambda o, d: PT._traverse(pb, o, d, tmax, sort=sort))
        dt = timeit(f, o, d)
        print(f"sort={sort}: {dt*1e3:7.2f} ms  {N/dt/1e6:6.2f} Mrays/s "
              f"({dt/ (it.mean()*it.size) *1e9:.0f} ns/iter est)")

    # shuffled (incoherent) case
    rng = np.random.default_rng(0)
    perm = rng.permutation(N)
    o_i, d_i = o[perm], d[perm]
    th, iters = PT._traverse(pb, o_i, d_i, tmax, with_iters=True)
    jax.block_until_ready(th)
    it2 = np.asarray(iters)
    print(f"shuffled iters/block: mean {it2.mean():.0f} max {it2.max()}")
    for sort in (False, True):
        f = jax.jit(lambda o, d: PT._traverse(pb, o, d, tmax, sort=sort))
        dt = timeit(f, o_i, d_i)
        print(f"shuffled sort={sort}: {dt*1e3:7.2f} ms  {N/dt/1e6:6.2f} Mrays/s")


if __name__ == "__main__":
    main()
