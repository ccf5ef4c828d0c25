"""Packet-vs-megapacket traversal sweep on a REAL first-bounce wavefront."""
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
    from pbrt_tpu.scene.intersect import intersect
    from pbrt_tpu.accel.pallas_traverse import _traverse, _traverse_cols, _ray_sort_key
    from pbrt_tpu.integrators.common import camera_rays
    from pbrt_tpu.core.math import normalize

    N = int(os.environ.get("N", 1 << 16))
    cs = _build_scene(large=True)
    data, flags = cs.data, cs.flags
    res = 256
    lin = np.arange(N) % (res * res)
    xs = (lin % res).astype(np.int64); ys = (lin // res).astype(np.int64)
    key = np.zeros_like(xs)
    for b in range(res.bit_length() - 1):
        key |= ((xs >> b) & 1) << (2 * b) | ((ys >> b) & 1) << (2 * b + 1)
    order = np.argsort(key, kind="stable")
    px = jnp.asarray(xs[order], jnp.int32); py = jnp.asarray(ys[order], jnp.int32)
    sidx = jnp.ones((N,), jnp.int32)
    rays, _, _ = jax.jit(lambda a,b,c: camera_rays(cs,a,b,c))(px, py, sidx)
    o, d = rays.o, normalize(rays.d)
    tmax = jnp.full((N,), 1e30, jnp.float32)
    si = jax.jit(lambda o,d: intersect(data, flags, o, d, tmax))(o, d)
    kx = jax.random.PRNGKey(0)
    u = jax.random.uniform(kx, (N, 2))
    r = jnp.sqrt(u[:, 0]); phi = 2 * jnp.pi * u[:, 1]
    t_ = jnp.where(jnp.abs(si.ns[:, 0:1]) > 0.9, jnp.array([[0.0,1.0,0.0]]), jnp.array([[1.0,0.0,0.0]]))
    ss = normalize(jnp.cross(si.ns, t_)); ts = jnp.cross(si.ns, ss)
    d_b = normalize((r*jnp.cos(phi))[:,None]*ss + (r*jnp.sin(phi))[:,None]*ts
                    + jnp.sqrt(jnp.maximum(1-u[:,0],0.0))[:,None]*si.ns)
    o_b = si.p + si.ng * 1e-3
    # pre-sort by the coherence key (as the real dispatch does)
    perm = jnp.argsort(_ray_sort_key(data.pbvh, o_b, d_b))
    o_b, d_b = o_b[perm], d_b[perm]
    pb = data.pbvh

    cases = [
        ("block1 r8 p8 queue=0", dict(mode="block1", rows=8, pops=8, queue=0)),
        ("queue G2", dict(mode="block1", rows=8, pops=8, queue=2)),
        ("queue G3", dict(mode="block1", rows=8, pops=8, queue=3)),
        ("queue G4", dict(mode="block1", rows=8, pops=8, queue=4)),


    ]
    base = None
    for name, kw in cases:
        try:
            if "queue" in kw:
                f = jax.jit(lambda o, d, kw=kw: _traverse_cols(
                    pb, o[:,0], o[:,1], o[:,2], d[:,0], d[:,1], d[:,2],
                    jnp.full((o.shape[0],), 1e30), with_iters=True,
                    **{k:v for k,v in kw.items() if k not in ("mode",)}))
            elif "leaf_gate" in kw:
                f = jax.jit(lambda o, d, kw=kw: _traverse_cols(
                    pb, o[:,0], o[:,1], o[:,2], d[:,0], d[:,1], d[:,2],
                    jnp.full((o.shape[0],), 1e30), with_iters=True, **kw))
            else:
                f = jax.jit(lambda o, d, kw=kw: _traverse(pb, o, d, 1e30, with_iters=True, **kw))
            th, it = jax.block_until_ready(f(o_b, d_b))
            dt = timeit(f, o_b, d_b) * 1e3
            it = np.asarray(it)
            if base is None: base = np.asarray(th.t)
            match = np.allclose(np.asarray(th.t), base, rtol=1e-5)
            print(f"{name:24s}: {dt:7.2f} ms  iters/blk {float((it & 0xFFFFFF).mean()):7.1f}  match={match}")
        except Exception as e:
            print(f"{name:24s}: FAIL {str(e)[:120]}")

if __name__ == "__main__":
    main()

# appended: pops sweep entry point
def pops_sweep():
    main.__wrapped__ = None
