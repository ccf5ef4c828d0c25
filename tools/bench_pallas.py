"""TPU benchmark + parity for the Pallas traversal kernel vs per-ray XLA."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from pbrt_tpu.shapes.triangle import make_knot_mesh
from pbrt_tpu.accel.bvh import build_bvh
from pbrt_tpu.accel.traverse import intersect_bvh
from pbrt_tpu.accel.pallas_traverse import pack_pallas_bvh, intersect_bvh_pallas


def timeit(f, *args, iters=20):
    out = jax.block_until_ready(f(*args))
    t0 = time.time()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters


def main():
    N = int(os.environ.get("N", 1 << 17))
    mesh = make_knot_mesh(n_u=96, n_v=24, scale=0.45)
    p = np.asarray(mesh.p)
    idx = np.asarray(mesh.indices).reshape(-1, 3)
    p0, p1, p2 = p[idx[:, 0]], p[idx[:, 1]], p[idx[:, 2]]
    lo = np.minimum(np.minimum(p0, p1), p2)
    hi = np.maximum(np.maximum(p0, p1), p2)
    bvh = build_bvh(lo, hi)
    tp0, tp1, tp2 = jnp.asarray(p0), jnp.asarray(p1), jnp.asarray(p2)
    pb, _ = pack_pallas_bvh(bvh, tp0, tp1, tp2)
    print(f"tris={len(p0)} nodes={bvh.n_nodes} N={N} "
          f"vmem={pb.vmem_bytes/1e6:.1f}MB backend={jax.devices()[0].platform}")

    # coherent camera-like rays (raster order, slight spread)
    side = 256
    lin = np.arange(N) % (side * side)
    ux = (lin % side) / side - 0.5
    uy = (lin // side) / side - 0.5
    o = jnp.asarray(np.stack([np.zeros(N), np.zeros(N), np.full(N, 4.0)], -1),
                    jnp.float32)
    dd = np.stack([ux * 1.2, uy * 1.2, -np.ones(N)], -1)
    dd /= np.linalg.norm(dd, axis=1, keepdims=True)
    d = jnp.asarray(dd, jnp.float32)
    t_max = jnp.full((N,), 1e30, jnp.float32)

    f_pal = jax.jit(lambda o, d: intersect_bvh_pallas(pb, o, d, t_max))
    th_p = jax.block_until_ready(f_pal(o, d))
    print("pallas compiled; hits:", int((th_p.tri >= 0).sum()))

    # parity vs per-ray XLA on a random subset (full per-ray run is minutes)
    NS = 4096
    sel = np.random.default_rng(7).choice(N, NS, replace=False)
    f_ref = jax.jit(lambda o, d: intersect_bvh(bvh, tp0, tp1, tp2, o, d,
                                               t_max[:NS]))
    th_r = jax.block_until_ready(f_ref(o[sel], d[sel]))
    pal_tri = np.asarray(th_p.tri)[sel]
    hm = (np.asarray(th_r.tri >= 0) == (pal_tri >= 0))
    both = np.asarray(th_r.tri >= 0) & (pal_tri >= 0)
    dt_ = np.abs(np.asarray(th_r.t)[both] - np.asarray(th_p.t)[sel][both])
    print(f"parity: mask={hm.sum()}/{NS} hits={both.sum()} "
          f"tmax-diff={dt_.max() if both.any() else 0:.2e}")

    dt = timeit(f_pal, o, d)
    print(f"pallas closest-hit: {dt*1e3:8.2f} ms  {N/dt/1e6:8.2f} Mrays/s")

    f_any = jax.jit(lambda o, d: intersect_bvh_pallas(pb, o, d, t_max, any_hit=True))
    jax.block_until_ready(f_any(o, d))
    dt = timeit(f_any, o, d)
    print(f"pallas any-hit:     {dt*1e3:8.2f} ms  {N/dt/1e6:8.2f} Mrays/s")

    # incoherent rays (shuffled) — the post-bounce worst case
    perm = np.random.default_rng(1).permutation(N)
    o2, d2 = o[perm], d[perm]
    dt = timeit(f_pal, o2, d2)
    print(f"pallas shuffled:    {dt*1e3:8.2f} ms  {N/dt/1e6:8.2f} Mrays/s")


if __name__ == "__main__":
    main()
