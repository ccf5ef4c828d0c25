"""Microbenchmark: BVH/kd traversal in isolation (Mrays/s).

Usage: python tools/bench_traverse.py [n_tris] [n_rays]
Runs on the active jax backend. Prints Mrays/s for closest-hit and any-hit,
for both accelerators, at coherent and incoherent ray distributions.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main():
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                       "..", ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp
    from pbrt_tpu.accel.bvh import build_bvh
    from pbrt_tpu.accel.kdtree import build_kdtree, intersect_kdtree
    from pbrt_tpu.accel.traverse import intersect_bvh
    from pbrt_tpu.shapes.triangle import make_knot_mesh

    T_target = int(sys.argv[1]) if len(sys.argv) > 1 else 50000
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 1 << 16

    # knot mesh scaled to roughly T_target triangles
    n_u = max(int((T_target / 48) ** 0.5 * 4), 16)
    mesh = make_knot_mesh(n_u=n_u, n_v=max(n_u // 4, 8), scale=1.0)
    idx = mesh.indices
    p0 = jnp.asarray(mesh.p[idx[:, 0]])
    p1 = jnp.asarray(mesh.p[idx[:, 1]])
    p2 = jnp.asarray(mesh.p[idx[:, 2]])
    T = idx.shape[0]
    lo = np.minimum(np.minimum(mesh.p[idx[:, 0]], mesh.p[idx[:, 1]]), mesh.p[idx[:, 2]])
    hi = np.maximum(np.maximum(mesh.p[idx[:, 0]], mesh.p[idx[:, 1]]), mesh.p[idx[:, 2]])
    bvh = build_bvh(lo, hi)
    kd = build_kdtree(lo, hi)
    print(f"tris={T} bvh_nodes={bvh.n_nodes} kd_nodes={kd.n_nodes if kd else 0} "
          f"rays={N} backend={jax.devices()[0].platform}")

    rng = np.random.default_rng(0)
    # coherent: camera-like fan from one origin
    d_coh = rng.normal(size=(N, 3)) * [0.3, 0.3, 1.0] + [0, 0, -1]
    d_coh /= np.linalg.norm(d_coh, axis=1, keepdims=True)
    o_coh = np.tile([0.0, 0.0, 4.0], (N, 1))
    # incoherent: random origins/directions
    o_inc = rng.uniform(-2, 2, (N, 3))
    d_inc = rng.normal(size=(N, 3))
    d_inc /= np.linalg.norm(d_inc, axis=1, keepdims=True)
    tm = jnp.full((N,), 1e20, jnp.float32)

    def run(tag, fn, o, d):
        j = jax.jit(fn)
        out = j(jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32))
        out[0].block_until_ready()
        iters = 10
        t0 = time.time()
        for _ in range(iters):
            out = j(jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32))
        out[0].block_until_ready()
        dt = time.time() - t0
        hit_frac = float((np.asarray(out.tri) >= 0).mean())
        print(f"  {tag:<28} {N * iters / dt / 1e6:8.2f} Mrays/s   hit={hit_frac:.2f}")

    run("bvh closest coherent", lambda o, d: intersect_bvh(bvh, p0, p1, p2, o, d, tm), o_coh, d_coh)
    run("bvh closest incoherent", lambda o, d: intersect_bvh(bvh, p0, p1, p2, o, d, tm), o_inc, d_inc)
    run("bvh anyhit coherent", lambda o, d: intersect_bvh(bvh, p0, p1, p2, o, d, tm, any_hit=True), o_coh, d_coh)
    if kd is not None:
        run("kd closest coherent", lambda o, d: intersect_kdtree(kd, p0, p1, p2, o, d, tm), o_coh, d_coh)
        run("kd closest incoherent", lambda o, d: intersect_kdtree(kd, p0, p1, p2, o, d, tm), o_inc, d_inc)


if __name__ == "__main__":
    main()
