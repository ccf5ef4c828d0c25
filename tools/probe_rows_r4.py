"""Round-4 sweep: rows (block size) x pops for the mega-packet kernel."""
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

    ref_tri = None
    for rows in (8, 16, 32):
        for pops in (8, 16):
            f = jax.jit(lambda o, d, t, rows=rows, pops=pops: _traverse(
                pb, o, d, t, with_iters=True, rows=rows, pops=pops))
            line = f"rows={rows:2d} pops={pops:2d} "
            for name, oo, dd in (("cam", o, d), ("bnc", o2, d2)):
                th, iters = jax.block_until_ready(f(oo, dd, tmax))
                t0 = time.time()
                for _ in range(20):
                    out = f(oo, dd, tmax)
                jax.block_until_ready(out)
                dt = (time.time() - t0) / 20
                line += (f"| {name} {dt*1e3:6.2f}ms it/blk={np.mean(iters):6.1f} "
                         f"tot={np.sum(iters):5d} ")
                if name == "bnc":
                    tri = np.asarray(th.tri)
                    if ref_tri is None:
                        ref_tri = tri
                    else:
                        mism = np.sum(tri != ref_tri)
                        line += f"mism={mism} "
            print(line, flush=True)


if __name__ == "__main__":
    main()
