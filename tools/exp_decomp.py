"""Decompose per-iteration kernel cost via dbg variants (bounce wavefront)."""
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
from tools.exp_rows import make_wavefront


def main():
    cs = _build_scene()
    pb = cs.data.pbvh
    n = int(os.environ.get("N", 1 << 16))
    o, d, o2, d2 = make_wavefront(cs, n)
    tmax = jnp.full((n,), 1e30)

    def bench(name, **kw):
        f = jax.jit(lambda o, d, t: _traverse(pb, o, d, t, with_iters=True, **kw))
        out = f(o2, d2, tmax)
        jax.block_until_ready(out)
        t0 = time.time()
        for _ in range(10):
            out = f(o2, d2, tmax)
        jax.block_until_ready(out)
        dt = (time.time() - t0) / 10
        th, iters = out
        tot = int(np.sum(iters))
        print(f"{name:28s} {dt*1e3:7.2f} ms  joint iters {tot}  "
              f"per-iter {dt/tot*1e9:6.0f} ns", flush=True)

    bench("full")
    bench("skip leaf", dbg_skip_leaf=True)
    bench("push-all (no votes)", dbg_push_all=True)
    bench("skip leaf + push-all", dbg_skip_leaf=True, dbg_push_all=True)


if __name__ == "__main__":
    main()
