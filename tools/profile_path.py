"""Phase-level timing breakdown of the bench path-trace on the knot scene.

Times each phase of a depth-4 path trace separately (closest-hit traversal,
any-hit shadow traversal, lobes+NEE math, bsdf sampling) so perf work
targets the real bottleneck. Run on whatever backend is live.
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
from pbrt_tpu.integrators.path import li_path
from pbrt_tpu.integrators.common import camera_rays, bounce_base, sample_one_light
from pbrt_tpu.scene.intersect import intersect, intersect_p
from pbrt_tpu.core.math import normalize
from pbrt_tpu.accel.pallas_traverse import intersect_bvh_pallas, _traverse


def timeit(f, *args, iters=20):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters, out


def main():
    cs = _build_scene()
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

    # full pipeline
    def full(px, py, sidx):
        L, _, _ = li_path(cs, px, py, sidx, max_depth=4)
        return jnp.sum(L)
    dt_full, _ = timeit(jax.jit(full), px, py, sidx)
    print(f"full li_path d4:     {dt_full*1e3:8.2f} ms   "
          f"({n*9/dt_full/1e6:7.2f} Mrays/s)")

    # camera rays only
    rays, w, pf = jax.jit(lambda a, b, c: camera_rays(cs, a, b, c))(px, py, sidx)
    o, d = rays.o, normalize(rays.d)

    # one closest-hit traversal (camera rays, coherent)
    tmax = jnp.full((n,), 1e30)
    f_hit = jax.jit(lambda o, d, t: intersect_bvh_pallas(cs.data.pbvh, o, d, t, sort=True))
    dt_hit, th = timeit(f_hit, o, d, tmax)
    print(f"closest-hit (cam):   {dt_hit*1e3:8.2f} ms   "
          f"({n/dt_hit/1e6:7.2f} Mrays/s)")

    # iteration counts for camera rays
    _, iters = jax.jit(lambda o, d, t: _traverse(cs.data.pbvh, o, d, t, with_iters=True))(o, d, tmax)
    print(f"  iters/block (unsorted cam): mean={np.mean(iters):7.1f} max={np.max(iters)}")

    # full SurfaceInteraction assembly
    f_si = jax.jit(lambda o, d, t: intersect(cs.data, cs.flags, o, d, t).p.sum())
    dt_si, _ = timeit(f_si, o, d, tmax)
    print(f"intersect+assemble:  {dt_si*1e3:8.2f} ms")

    # any-hit shadow
    f_sh = jax.jit(lambda o, d, t: intersect_p(cs.data, cs.flags, o, d, t))
    dt_sh, _ = timeit(f_sh, o, d, tmax * 0 + 10.0)
    print(f"any-hit shadow:      {dt_sh*1e3:8.2f} ms")

    # incoherent bounce rays: scatter direction
    kx = jax.random.PRNGKey(0)
    d2 = jax.random.normal(kx, (n, 3))
    d2 = d2 / jnp.linalg.norm(d2, axis=-1, keepdims=True)
    si = jax.jit(lambda o, d, t: intersect(cs.data, cs.flags, o, d, t))(o, d, tmax)
    o2 = si.p + si.ng * 1e-3
    dt_hit2, _ = timeit(f_hit, o2, d2, tmax)
    print(f"closest-hit (bounce):{dt_hit2*1e3:8.2f} ms   "
          f"({n/dt_hit2/1e6:7.2f} Mrays/s)")
    _, iters2 = jax.jit(lambda o, d, t: _traverse(cs.data.pbvh, o, d, t, with_iters=True))(o2, d2, tmax)
    print(f"  iters/block (unsorted bounce): mean={np.mean(iters2):7.1f} max={np.max(iters2)}")

    # dead-lane traversal: t_max=0 for all lanes
    dt_dead, _ = timeit(f_hit, o2, d2, tmax * 0.0)
    print(f"closest-hit (all dead, tmax=0): {dt_dead*1e3:8.2f} ms")

    # shading math only (lobes + NEE without the shadow trace)
    from pbrt_tpu.materials import compute_lobes
    from pbrt_tpu.materials import bsdf as B
    def shade(si_p):
        lobes = compute_lobes(cs.data.mats, cs.data.tex, si.material, si.uv,
                              si.p, jnp.zeros(n), cs.flags.has_tex_slot)
        wo_l = si.world_to_local(si.wo)
        bs = B.bsdf_sample(lobes, wo_l, jnp.zeros(n) + 0.5,
                           jnp.zeros((n, 2)) + 0.3, None)
        f = B.bsdf_f(lobes, wo_l, bs.wi, None)
        return f.sum() + bs.pdf.sum()
    dt_shade, _ = timeit(jax.jit(shade), si.p)
    print(f"lobes+bsdf math:     {dt_shade*1e3:8.2f} ms")

    est = dt_hit * 5 + dt_sh * 4 + dt_shade * 4
    print(f"\nest. (5 closest + 4 shadow + 4 shade): {est*1e3:.2f} ms vs full {dt_full*1e3:.2f} ms")


if __name__ == "__main__":
    main()
