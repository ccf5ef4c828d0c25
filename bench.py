"""Benchmark: Mrays/s on the BVH'd-triangle path-trace (BASELINE config 2 class).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Runs on whatever jax backend is active (TPU under the driver; JAX_PLATFORMS
honored). Counts TOTAL rays traced (camera + bounce + shadow) per wall
second after warmup, the standard Mrays/s accounting.
"""
import json
import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from __graft_entry__ import _build_scene
    from pbrt_tpu.integrators.path import li_path

    cs = _build_scene()
    max_depth = 4

    def fn(px, py, sidx):
        L, p_film, w = li_path(cs, px, py, sidx, max_depth=max_depth)
        return L

    n = int(os.environ.get("BENCH_RAYS", 1 << 17))
    rng = np.random.default_rng(0)
    px = jnp.asarray(rng.integers(0, 64, n), jnp.int32)
    py = jnp.asarray(rng.integers(0, 64, n), jnp.int32)

    jfn = jax.jit(fn)
    # warmup / compile
    jfn(px, py, jnp.zeros(n, jnp.int32)).block_until_ready()

    iters = int(os.environ.get("BENCH_ITERS", 8))
    t0 = time.time()
    for i in range(iters):
        out = jfn(px, py, jnp.full(n, i + 1, jnp.int32))
    out.block_until_ready()
    dt = time.time() - t0

    # rays per path sample: camera(1) + per bounce (1 shadow + 1 bsdf) x depth
    rays_per_sample = 1 + 2 * max_depth
    total_rays = n * iters * rays_per_sample
    mrays = total_rays / dt / 1e6
    baseline = 100.0  # BASELINE.json north star: 100 Mrays/s/chip
    print(json.dumps({
        "metric": "Mrays/s/chip (knot path-trace, depth 4)",
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / baseline, 4),
    }))


if __name__ == "__main__":
    main()
