"""Capture a TPU trace of the large-scene li_path step and print per-op totals."""
import os, sys, time, glob, gzip, collections
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np

def main():
    from __graft_entry__ import _build_scene
    from pbrt_tpu.integrators.path import li_path
    N = int(os.environ.get("N", 1 << 16))
    cs = _build_scene(large=True)
    res = 256
    lin = np.arange(N) % (res * res)
    xs = (lin % res).astype(np.int64); ys = (lin // res).astype(np.int64)
    key = np.zeros_like(xs)
    for b in range(res.bit_length() - 1):
        key |= ((xs >> b) & 1) << (2 * b) | ((ys >> b) & 1) << (2 * b + 1)
    order = np.argsort(key, kind="stable")
    px = jnp.asarray(xs[order], jnp.int32); py = jnp.asarray(ys[order], jnp.int32)
    sidx = jnp.ones((N,), jnp.int32)
    f_li = jax.jit(lambda px, py, s: li_path(cs, px, py, s, max_depth=4)[0])
    jax.block_until_ready(f_li(px, py, sidx))
    logdir = "/tmp/jaxtrace"
    os.system("rm -rf " + logdir)
    with jax.profiler.trace(logdir):
        for i in range(3):
            out = f_li(px, py, sidx)
        jax.block_until_ready(out)
    print("trace done")

if __name__ == "__main__":
    main()
