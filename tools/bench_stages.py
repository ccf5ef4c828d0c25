"""Stage-level TPU timing of the path tracer: where does the time go now
that traversal is a Pallas kernel?"""
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


def main():
    from __graft_entry__ import _build_scene
    from pbrt_tpu.scene.intersect import intersect, intersect_p
    from pbrt_tpu.accel.pallas_traverse import intersect_bvh_pallas
    from pbrt_tpu.integrators.path import li_path
    from pbrt_tpu.integrators.common import sample_one_light, camera_rays
    from pbrt_tpu.materials import compute_lobes

    N = int(os.environ.get("N", 1 << 16))
    cs = _build_scene()
    data, flags = cs.data, cs.flags
    print(f"N={N} use_pallas={flags.use_pallas} backend={jax.devices()[0].platform}")

    side = 64
    lin = np.arange(N) % (side * side)
    px = jnp.asarray(lin % side, jnp.int32)
    py = jnp.asarray(lin // side, jnp.int32)
    sidx = jnp.ones((N,), jnp.int32)

    f_cam = jax.jit(lambda px, py, s: camera_rays(cs, px, py, s)[0])
    rays = jax.block_until_ready(f_cam(px, py, sidx))
    o, d = rays.o, rays.d
    tmax = jnp.full((N,), 1e30, jnp.float32)
    print(f"camera_rays:      {timeit(f_cam, px, py, sidx)*1e3:8.2f} ms")

    f_trav = jax.jit(lambda o, d: intersect_bvh_pallas(data.pbvh, o, d, tmax))
    jax.block_until_ready(f_trav(o, d))
    print(f"raw pallas trav:  {timeit(f_trav, o, d)*1e3:8.2f} ms (coherent)")

    rng = np.random.default_rng(0)
    perm = rng.permutation(N)
    o_i, d_i = o[perm], d[perm]
    print(f"raw pallas trav:  {timeit(f_trav, o_i, d_i)*1e3:8.2f} ms (shuffled)")

    f_int = jax.jit(lambda o, d: intersect(data, flags, o, d, tmax))
    si = jax.block_until_ready(f_int(o, d))
    print(f"intersect+SI:     {timeit(f_int, o, d)*1e3:8.2f} ms")

    f_ip = jax.jit(lambda o, d: intersect_p(data, flags, o, d, tmax))
    jax.block_until_ready(f_ip(o, d))
    print(f"intersect_p:      {timeit(f_ip, o, d)*1e3:8.2f} ms")

    u = jnp.linspace(0, 1, N)
    f_lob = jax.jit(lambda si, u: compute_lobes(data.mats, data.tex, si.material,
                                                si.uv, si.p, u, flags.has_tex_slot))
    lobes = jax.block_until_ready(f_lob(si, u))
    print(f"compute_lobes:    {timeit(f_lob, si, u)*1e3:8.2f} ms")

    act = jnp.ones((N,), bool)
    u2 = jnp.stack([u, 1 - u], -1)
    f_nee = jax.jit(lambda si, lobes: sample_one_light(cs, si, lobes, act, u, u2))
    jax.block_until_ready(f_nee(si, lobes))
    print(f"NEE (w/ shadow):  {timeit(f_nee, si, lobes)*1e3:8.2f} ms")

    for depth in (1, 4):
        f_li = jax.jit(lambda px, py, s: li_path(cs, px, py, s, max_depth=depth)[0])
        jax.block_until_ready(f_li(px, py, sidx))
        dt = timeit(f_li, px, py, sidx, iters=5)
        rays_n = N * (1 + 2 * depth)
        print(f"li_path depth={depth}: {dt*1e3:8.2f} ms  -> {rays_n/dt/1e6:6.2f} Mrays/s")


if __name__ == "__main__":
    main()
