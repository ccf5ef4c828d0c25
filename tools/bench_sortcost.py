"""Micro-bench: cost of the ray-sort permutation machinery vs the kernel."""
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
from pbrt_tpu.accel.pallas_traverse import (intersect_bvh_pallas, _traverse,
                                            _ray_sort_key)


def timeit(f, *args, iters=30):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters


def main():
    cs = _build_scene()
    pb = cs.data.pbvh
    n = int(os.environ.get("N", 1 << 16))
    kx = jax.random.PRNGKey(0)
    o = jax.random.uniform(kx, (n, 3)) * 2 - 1
    d = jax.random.normal(jax.random.PRNGKey(1), (n, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    tmax = jnp.full((n,), 1e30)

    t = timeit(jax.jit(lambda o, d: _ray_sort_key(pb, o, d)), o, d)
    print(f"sort key compute:   {t*1e3:7.2f} ms")
    key = _ray_sort_key(pb, o, d)
    t = timeit(jax.jit(lambda k: jnp.argsort(k)), key)
    print(f"argsort:            {t*1e3:7.2f} ms")
    perm = jnp.argsort(key)
    t = timeit(jax.jit(lambda v, p: v[p]), o, perm)
    print(f"gather [N,3]:       {t*1e3:7.2f} ms")
    v = o[:, 0]
    t = timeit(jax.jit(lambda v, p: jnp.zeros_like(v).at[p].set(v)), v, perm)
    print(f"scatter unsort [N]: {t*1e3:7.2f} ms")

    t = timeit(jax.jit(lambda o, d, tm: _traverse(pb, o, d, tm, sort=False)), o, d, tmax)
    print(f"traverse nosort:    {t*1e3:7.2f} ms")
    t = timeit(jax.jit(lambda o, d, tm: _traverse(pb, o, d, tm, sort=True)), o, d, tmax)
    print(f"traverse sorted:    {t*1e3:7.2f} ms")
    t = timeit(jax.jit(lambda o, d, tm: _traverse(pb, o, d, tm, sort=False)), o, d, tmax * 0)
    print(f"traverse dead nosort: {t*1e3:7.2f} ms")

    # pure pallas launch cost: 1-iteration kernel (all dead, no sort)
    o0 = jnp.zeros((n, 3)) + jnp.array([100.0, 100.0, 100.0])
    dd = jnp.zeros((n, 3)) + jnp.array([0.0, 0.0, 1.0])
    t = timeit(jax.jit(lambda o, d, tm: _traverse(pb, o, d, tm, sort=False)), o0, dd, tmax)
    print(f"traverse miss-all:  {t*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
