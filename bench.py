"""Benchmark: Mrays/s on the BVH'd-triangle path-trace (BASELINE config 2 class).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Runs on whatever jax backend is active (TPU under the driver; JAX_PLATFORMS
honored). Counts TOTAL rays traced (camera + bounce + shadow) per wall
second after warmup, the standard Mrays/s accounting.

The wavefront is dispatched in fixed-size chunks (BENCH_CHUNK) so a single
device launch stays well under any RPC/watchdog limit; total rays scale with
BENCH_RAYS regardless of chunk size.
"""
import json
import os
import sys
import time


def main():
    import jax
    # persistent compile cache: repeated bench runs (and the driver's) skip
    # the multi-minute XLA compile of the unrolled path tracer
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                       ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp
    import numpy as np
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from __graft_entry__ import _build_scene
    from pbrt_tpu.integrators.path import li_path

    cs = _build_scene()
    max_depth = 4

    def fn(px, py, sidx):
        L, p_film, w = li_path(cs, px, py, sidx, max_depth=max_depth)
        return jnp.sum(L)

    total = int(os.environ.get("BENCH_RAYS", 1 << 19))
    chunk = int(os.environ.get("BENCH_CHUNK", 1 << 17))
    chunk = min(chunk, total)
    # coherent wavefront: pixels in Morton order with spp repeats — the
    # order real renders dispatch (render.py _sample_pixels), which keeps
    # each 128-lane traversal packet on a compact image tile
    lin = np.arange(chunk, dtype=np.int64) % (64 * 64)
    xs = (lin % 64).astype(np.int64)
    ys = (lin // 64).astype(np.int64)
    key = np.zeros_like(xs)
    for b in range(6):
        key |= ((xs >> b) & 1) << (2 * b) | ((ys >> b) & 1) << (2 * b + 1)
    order = np.argsort(key, kind="stable")
    px = jnp.asarray(xs[order], jnp.int32)
    py = jnp.asarray(ys[order], jnp.int32)

    jfn = jax.jit(fn)
    jfn(px, py, jnp.zeros(chunk, jnp.int32)).block_until_ready()  # compile

    iters = int(os.environ.get("BENCH_ITERS", 8))
    n_chunks = max(total // chunk, 1)
    t0 = time.time()
    acc = None
    for i in range(iters):
        for c in range(n_chunks):
            acc = jfn(px, py, jnp.full(chunk, i * n_chunks + c + 1, jnp.int32))
    acc.block_until_ready()
    dt = time.time() - t0

    # rays per path sample: camera(1) + per bounce (1 shadow + 1 bsdf) x depth
    rays_per_sample = 1 + 2 * max_depth
    total_rays = chunk * n_chunks * iters * rays_per_sample
    mrays = total_rays / dt / 1e6
    baseline = 100.0  # BASELINE.json north star: 100 Mrays/s/chip

    # regress the traversal kernel's per-block iteration counts (packet
    # union size — the divergence metric VERDICT r2 asks to track): a
    # camera wavefront and a first-bounce diffuse wavefront
    import numpy as _np
    from pbrt_tpu.accel.pallas_traverse import _traverse
    from pbrt_tpu.scene.intersect import intersect
    from pbrt_tpu.core.math import normalize as _norm
    from pbrt_tpu.integrators.common import camera_rays as _cr
    n_it = 1 << 16
    rays, _, _ = jax.jit(lambda a, b, c: _cr(cs, a, b, c))(
        px[:n_it], py[:n_it], jnp.ones(n_it, jnp.int32))
    o_c, d_c = rays.o, _norm(rays.d)
    tmax = jnp.full((n_it,), 1e30)
    _, it_cam = jax.jit(lambda o, d, t: _traverse(cs.data.pbvh, o, d, t,
                                                  with_iters=True))(o_c, d_c, tmax)
    si = jax.jit(lambda o, d: intersect(cs.data, cs.flags, o, d, tmax))(o_c, d_c)
    kx = jax.random.PRNGKey(0)
    u = jax.random.uniform(kx, (n_it, 2))
    r = jnp.sqrt(u[:, 0])
    phi = 2 * jnp.pi * u[:, 1]
    t_ = jnp.where(jnp.abs(si.ns[:, 0:1]) > 0.9,
                   jnp.array([[0.0, 1.0, 0.0]]), jnp.array([[1.0, 0.0, 0.0]]))
    ss = _norm(jnp.cross(si.ns, t_))
    ts = jnp.cross(si.ns, ss)
    d_b = _norm((r * jnp.cos(phi))[:, None] * ss + (r * jnp.sin(phi))[:, None] * ts
                + jnp.sqrt(jnp.maximum(1 - u[:, 0], 0.0))[:, None] * si.ns)
    _, it_bnc = jax.jit(lambda o, d, t: _traverse(cs.data.pbvh, o, d, t,
                                                  with_iters=True))(
        si.p + si.ng * 1e-3, d_b, tmax)

    print(json.dumps({
        "metric": "Mrays/s/chip (knot path-trace, depth 4)",
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / baseline, 4),
        "iters_per_block_camera": round(float(_np.mean(it_cam)), 1),
        "iters_per_block_bounce": round(float(_np.mean(it_bnc)), 1),
    }))


if __name__ == "__main__":
    main()
