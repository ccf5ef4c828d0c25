"""Compare sort-key designs by per-block traversal iteration counts and time.

Uses realistic bounce rays: camera rays traced to first hit, then cosine-
hemisphere scattered — the distribution the real renderer traverses.
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
from pbrt_tpu.accel.pallas_traverse import _traverse
from pbrt_tpu.scene.intersect import intersect
from pbrt_tpu.integrators.common import camera_rays
from pbrt_tpu.core.math import normalize


def timed(f, *args, iters=20):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters, out


def morton3(q, bits):
    def expand(v):
        v = v.astype(jnp.int64)
        v = (v | (v << 16)) & 0x30000FF
        v = (v | (v << 8)) & 0x300F00F
        v = (v | (v << 4)) & 0x30C30C3
        v = (v | (v << 2)) & 0x9249249
        return v
    return (expand(q[:, 0]) | (expand(q[:, 1]) << 1)
            | (expand(q[:, 2]) << 2)).astype(jnp.int32)


def main():
    cs = _build_scene(large=os.environ.get('LARGE','0')=='1')
    pb = cs.data.pbvh
    n = int(os.environ.get("N", 1 << 16))
    # realistic bounce wavefront
    res = 256 if os.environ.get("LARGE","0")=="1" else 64
    lin = np.arange(n, dtype=np.int64) % (res * res)
    xs = (lin % res).astype(np.int64)
    ys = (lin // res).astype(np.int64)
    key = np.zeros_like(xs)
    for b in range(res.bit_length()-1):
        key |= ((xs >> b) & 1) << (2 * b) | ((ys >> b) & 1) << (2 * b + 1)
    order = np.argsort(key, kind="stable")
    px = jnp.asarray(xs[order], jnp.int32)
    py = jnp.asarray(ys[order], jnp.int32)
    rays, w, pf = jax.jit(lambda a, b, c: camera_rays(cs, a, b, c))(
        px, py, jnp.ones(n, jnp.int32))
    o, d = rays.o, normalize(rays.d)
    si = jax.jit(lambda o, d: intersect(cs.data, cs.flags, o, d,
                                        jnp.full((n,), 1e30)))(o, d)
    # cosine-hemisphere scatter around ns
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    u1 = jax.random.uniform(k1, (n,))
    u2 = jax.random.uniform(k2, (n,))
    r = jnp.sqrt(u1)
    phi = 2 * jnp.pi * u2
    ns = si.ns
    t_ = jnp.where(jnp.abs(ns[:, 0:1]) > 0.9, jnp.array([[0.0, 1.0, 0.0]]),
                   jnp.array([[1.0, 0.0, 0.0]]))
    ss = normalize(jnp.cross(ns, t_))
    ts = jnp.cross(ns, ss)
    ld = jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi),
                    jnp.sqrt(jnp.maximum(1 - u1, 0.0))], -1)
    d2 = normalize(ld[:, 0:1] * ss + ld[:, 1:2] * ts + ld[:, 2:3] * ns)
    o2 = si.p + si.ng * 1e-3
    alive = si.valid
    print(f"alive: {alive.sum()}/{n}")
    tmax = jnp.full((n,), 1e30)

    tf = jax.jit(lambda o, d, t: _traverse(pb, o, d, t, with_iters=True))

    def report(name, oo, dd, tt):
        (th, iters) = tf(oo, dd, tt)
        jax.block_until_ready(th)
        t0 = time.time()
        for _ in range(10):
            out = tf(oo, dd, tt)
        jax.block_until_ready(out)
        dt = (time.time() - t0) / 10
        print(f"{name:34s} iters mean={np.mean(iters):7.1f} max={np.max(iters):5d} "
              f"time={dt*1e3:7.2f} ms")

    ext = jnp.maximum(pb.whi - pb.wlo, 1e-6)

    report("unsorted", o2, d2, tmax)

    # current key (16-cell, xz-morton | y | oct)
    from pbrt_tpu.accel.pallas_traverse import _ray_sort_key
    perm = jnp.argsort(_ray_sort_key(pb, o2, d2))
    report("current key", o2[perm], d2[perm], tmax[perm])

    # full 3D morton, B bits/axis, octant low
    for bits in (3, 4, 5, 6):
        q = jnp.clip(((o2 - pb.wlo) / ext) * (1 << bits), 0, (1 << bits) - 1).astype(jnp.int32)
        m = morton3(q, bits)
        oct_ = ((d2[:, 0] < 0).astype(jnp.int32) + 2 * (d2[:, 1] < 0).astype(jnp.int32)
                + 4 * (d2[:, 2] < 0).astype(jnp.int32))
        perm = jnp.argsort((m << 3) | oct_)
        report(f"morton3 {bits}b | oct", o2[perm], d2[perm], tmax[perm])

    # octant high, morton low
    for bits in (4, 5):
        q = jnp.clip(((o2 - pb.wlo) / ext) * (1 << bits), 0, (1 << bits) - 1).astype(jnp.int32)
        m = morton3(q, bits)
        oct_ = ((d2[:, 0] < 0).astype(jnp.int32) + 2 * (d2[:, 1] < 0).astype(jnp.int32)
                + 4 * (d2[:, 2] < 0).astype(jnp.int32))
        perm = jnp.argsort((oct_ << (3 * bits)) | m)
        report(f"oct | morton3 {bits}b", o2[perm], d2[perm], tmax[perm])

    # 6D key: position morton + direction morton interleaved
    q = jnp.clip(((o2 - pb.wlo) / ext) * 16, 0, 15).astype(jnp.int32)
    qd = jnp.clip((d2 * 0.5 + 0.5) * 4, 0, 3).astype(jnp.int32)
    m = morton3(q, 4)
    md = morton3(qd, 2)
    perm = jnp.argsort((m << 6) | md)
    report("morton3 4b | dirmorton 2b", o2[perm], d2[perm], tmax[perm])

    # dead-lane handling: half the lanes dead -> FAR origin vs in-place
    far = pb.whi + ext
    dead = jnp.arange(n) % 2 == 0
    o3 = jnp.where(dead[:, None], far, o2)
    d3 = jnp.where(dead[:, None], jnp.array([[1.0, 0.0, 0.0]]), d2)
    q = jnp.clip(((o3 - pb.wlo) / ext) * 32, 0, 31).astype(jnp.int32)
    m = morton3(q, 5)
    oct_ = ((d3[:, 0] < 0).astype(jnp.int32) + 2 * (d3[:, 1] < 0).astype(jnp.int32)
            + 4 * (d3[:, 2] < 0).astype(jnp.int32))
    perm = jnp.argsort((m << 3) | oct_)
    report("50% dead FAR, morton5|oct", o3[perm], d3[perm], tmax[perm])
    # dead in place with tmax=0
    perm = jnp.argsort(_ray_sort_key(pb, o2, d2))
    report("50% dead tmax=0 (current key)", o2[perm], d2[perm],
           jnp.where(dead, 0.0, tmax)[perm])


if __name__ == "__main__":
    main()
