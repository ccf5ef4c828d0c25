"""r5 stage profile: decompose a bounce of the LARGE-scene path trace into
sort / traverse / assemble / lobes / NEE-prep / bsdf-sample pieces at bench
wavefront sizes."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np

def timeit(f, *args, iters=10):
    out = jax.block_until_ready(f(*args))
    t0 = time.time()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters

def main():
    from __graft_entry__ import _build_scene
    from pbrt_tpu.scene.intersect import intersect, intersect_pair
    from pbrt_tpu.accel.pallas_traverse import (_traverse_cols, _ray_sort_key_cols)
    from pbrt_tpu.integrators.path import li_path
    from pbrt_tpu.integrators.common import camera_rays, prepare_one_light
    from pbrt_tpu.materials import compute_lobes
    from pbrt_tpu.materials import bsdf as B
    from pbrt_tpu.core.math import normalize

    large = os.environ.get("LARGE", "1") == "1"
    N = int(os.environ.get("N", 1 << 17))
    cs = _build_scene(large=large)
    data, flags = cs.data, cs.flags
    res = 256 if large else 64
    print(f"large={large} N={N} n_tris={flags.n_tris}")

    lin = np.arange(N) % (res * res)
    xs = (lin % res).astype(np.int64); ys = (lin // res).astype(np.int64)
    key = np.zeros_like(xs)
    for b in range(res.bit_length() - 1):
        key |= ((xs >> b) & 1) << (2 * b) | ((ys >> b) & 1) << (2 * b + 1)
    order = np.argsort(key, kind="stable")
    px = jnp.asarray(xs[order], jnp.int32); py = jnp.asarray(ys[order], jnp.int32)
    sidx = jnp.ones((N,), jnp.int32)

    # full step
    f_li = jax.jit(lambda px, py, s: li_path(cs, px, py, s, max_depth=4)[0])
    jax.block_until_ready(f_li(px, py, sidx))
    dt_full = timeit(f_li, px, py, sidx, iters=5)
    print(f"li_path depth=4:  {dt_full*1e3:8.2f} ms")

    f_cam = jax.jit(lambda px, py, s: camera_rays(cs, px, py, s)[0])
    rays = jax.block_until_ready(f_cam(px, py, sidx))
    o, d = rays.o, normalize(rays.d)
    tmax = jnp.full((N,), 1e30, jnp.float32)
    print(f"camera_rays:      {timeit(f_cam, px, py, sidx)*1e3:8.2f} ms")

    f_int = jax.jit(lambda o, d: intersect(data, flags, o, d, tmax))
    si = jax.block_until_ready(f_int(o, d))
    print(f"intersect cam:    {timeit(f_int, o, d)*1e3:8.2f} ms")

    # realistic bounce wavefront: cosine bounce dirs + shadow rays to the area light
    kx = jax.random.PRNGKey(0)
    u = jax.random.uniform(kx, (N, 2))
    r = jnp.sqrt(u[:, 0]); phi = 2 * jnp.pi * u[:, 1]
    t_ = jnp.where(jnp.abs(si.ns[:, 0:1]) > 0.9, jnp.array([[0.0, 1.0, 0.0]]), jnp.array([[1.0, 0.0, 0.0]]))
    ss = normalize(jnp.cross(si.ns, t_)); ts = jnp.cross(si.ns, ss)
    d_b = normalize((r * jnp.cos(phi))[:, None] * ss + (r * jnp.sin(phi))[:, None] * ts
                    + jnp.sqrt(jnp.maximum(1 - u[:, 0], 0.0))[:, None] * si.ns)
    o_b = si.p + si.ng * 1e-3
    act = si.valid
    # shadow rays at light
    u1 = jax.random.uniform(jax.random.PRNGKey(1), (N,))
    u2 = jax.random.uniform(jax.random.PRNGKey(2), (N, 2))
    f_lob = jax.jit(lambda si, u: compute_lobes(data.mats, data.tex, si.material, si.uv, si.p, u, flags.has_tex_slot))
    lobes = jax.block_until_ready(f_lob(si, u1))
    print(f"compute_lobes:    {timeit(f_lob, si, u1)*1e3:8.2f} ms")

    f_nee = jax.jit(lambda si, lobes: prepare_one_light(cs, si, lobes, act, u1, u2))
    ld, o_sh, d_sh, dist_sh, nee_live = jax.block_until_ready(f_nee(si, lobes))
    print(f"prepare_one_light:{timeit(f_nee, si, lobes)*1e3:8.2f} ms")

    wo_local = si.world_to_local(si.wo)
    f_bs = jax.jit(lambda lobes, wo, u1, u2: B.bsdf_sample(lobes, wo, u1, u2, fams=flags.bsdf_fams))
    jax.block_until_ready(f_bs(lobes, wo_local, u1, u2))
    print(f"bsdf_sample:      {timeit(f_bs, lobes, wo_local, u1, u2)*1e3:8.2f} ms")

    # merged pair (as in li_path)
    f_pair = jax.jit(lambda o, d, osh, dsh, dsh2: intersect_pair(
        data, flags, o, d, jnp.full((N,), 1e30), act, osh, dsh, dsh2, nee_live))
    jax.block_until_ready(f_pair(o_b, d_b, o_sh, d_sh, dist_sh))
    print(f"intersect_pair:   {timeit(f_pair, o_b, d_b, o_sh, d_sh, dist_sh)*1e3:8.2f} ms")

    # decompose the pair: sort-only vs traverse-only
    o2 = jnp.concatenate([o_b, o_sh], 0); d2 = jnp.concatenate([d_b, d_sh], 0)
    tm2 = jnp.concatenate([jnp.full((N,), 1e30), jnp.broadcast_to(dist_sh, (N,))], 0)
    live2 = jnp.concatenate([act, nee_live])
    is_sh = jnp.concatenate([jnp.zeros((N,), bool), jnp.ones((N,), bool)])
    def sort_pack(o2, d2, tm2):
        o2t, d2t = o2.T, d2.T
        key = _ray_sort_key_cols(data.pbvh, o2t[0], o2t[1], o2t[2], d2t[0], d2t[1], d2t[2])
        key = key | jnp.where(is_sh, jnp.int32(1 << 24), 0)
        key = jnp.where(live2, key, jnp.int32(0x7FFFFFFF))
        lane = jnp.arange(2 * N, dtype=jnp.int32)
        return jax.lax.sort((key, o2t[0], o2t[1], o2t[2], d2t[0], d2t[1], d2t[2], tm2,
                             is_sh.astype(jnp.int32), lane), dimension=0, num_keys=1)
    f_sort = jax.jit(sort_pack)
    srt = jax.block_until_ready(f_sort(o2, d2, tm2))
    print(f"pair co-sort:     {timeit(f_sort, o2, d2, tm2)*1e3:8.2f} ms")
    (_, oxs, oys, ozs, dxs, dys, dzs, tms, ahs, lanes) = srt
    f_trav = jax.jit(lambda *a: _traverse_cols(data.pbvh, *a[:7], anyhit_mask=a[7] > 0))
    jax.block_until_ready(f_trav(oxs, oys, ozs, dxs, dys, dzs, tms, ahs))
    print(f"pair traverse:    {timeit(f_trav, oxs, oys, ozs, dxs, dys, dzs, tms, ahs)*1e3:8.2f} ms")
    ths = f_trav(oxs, oys, ozs, dxs, dys, dzs, tms, ahs)
    f_uns = jax.jit(lambda lanes, t, s: jax.lax.sort((lanes, t, s), dimension=0, num_keys=1))
    jax.block_until_ready(f_uns(lanes, ths.t, ths.slot))
    print(f"pair unsort:      {timeit(f_uns, lanes, ths.t, ths.slot)*1e3:8.2f} ms")
    # live stats
    print("live next:", int(act.sum()), "live shadow:", int(nee_live.sum()), "of", N)

if __name__ == "__main__":
    main()
