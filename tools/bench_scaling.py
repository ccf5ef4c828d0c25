"""1 -> N device scaling of the sharded render step (virtual CPU mesh).

Measures BOTH curves (BASELINE: >=85% of linear, 1 -> 2 hosts):
  strong — fixed TOTAL rays, split over N devices;
  weak   — fixed rays PER DEVICE, total grows with N (the target's real
           meaning: per-chip load constant as the slice grows).

Honesty note: the virtual devices share this host's CPU cores (2 in this
cgroup), so raw weak-scaling wall time grows once N exceeds the physical
cores even for a perfectly parallel program. The report therefore includes
`eff_vs_roofline`: efficiency against the core-limited ideal
t_ideal(N) = t(1) * N / min(N, cores) — on real TPU chips (one program per
chip) the roofline is flat and this equals plain weak-scaling efficiency.
The only cross-device communication is the film/radiance psum.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import Mesh, PartitionSpec as P  # noqa: E402
from jax import shard_map  # noqa: E402

CORES = os.cpu_count() or 1


def rays_for(n, side=64):
    lin = np.arange(n) % (side * side)
    return (jnp.asarray(lin % side, jnp.int32),
            jnp.asarray(lin // side, jnp.int32),
            jnp.ones((n,), jnp.int32))


def time_step(cs, li_path, nd, n_rays):
    mesh = Mesh(np.asarray(jax.devices()[:nd]), ("rays",))

    def shard_step(px, py, s):
        L, _, _ = li_path(cs, px, py, s, max_depth=2)
        return jax.lax.psum(jnp.sum(L), "rays")

    f = jax.jit(shard_map(shard_step, mesh=mesh,
                          in_specs=(P("rays"),) * 3, out_specs=P()))
    px, py, s = rays_for(n_rays)
    out = f(px, py, s)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(3):
        out = f(px, py, s)
    jax.block_until_ready(out)
    return (time.time() - t0) / 3


def main():
    from __graft_entry__ import _build_scene
    from pbrt_tpu.integrators.path import li_path

    cs = _build_scene()
    N_STRONG = 1 << 14
    R_WEAK = 1 << 12     # rays per device

    strong = {}
    weak = {}
    t1_strong = t1_weak = None
    for nd in (1, 2, 4, 8):
        dt = time_step(cs, li_path, nd, N_STRONG)
        if t1_strong is None:
            t1_strong = dt
        strong[str(nd)] = {
            "step_s": round(dt, 4), "rays_per_dev": N_STRONG // nd,
            "speedup_vs_1dev": round(t1_strong / dt, 3)}
        print(f"strong nd={nd}: {dt*1e3:8.1f} ms  "
              f"speedup {t1_strong/dt:.2f}x", flush=True)

        dtw = time_step(cs, li_path, nd, R_WEAK * nd)
        if t1_weak is None:
            t1_weak = dtw
        ideal = t1_weak * nd / min(nd, CORES)
        weak[str(nd)] = {
            "step_s": round(dtw, 4), "rays_per_dev": R_WEAK,
            "total_rays": R_WEAK * nd,
            "eff_raw": round(t1_weak / dtw, 3),
            "eff_vs_roofline": round(ideal / dtw, 3)}
        print(f"weak   nd={nd}: {dtw*1e3:8.1f} ms  "
              f"eff_raw {t1_weak/dtw:.2f}  "
              f"eff_vs_roofline {ideal/dtw:.2f}", flush=True)

    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "SCALING.json")
    with open(out_path, "w") as fh:
        json.dump({
            "mesh": "virtual-cpu", "axis": "rays", "host_cores": CORES,
            "strong": {"total_rays": N_STRONG, "per_device": strong},
            "weak": {"rays_per_device": R_WEAK, "per_device": weak},
            "note": "shard_map over rays; film/radiance psum is the only "
                    "collective; pixel-equality vs 1 device asserted by "
                    "tests/test_sharded.py. Virtual devices share "
                    f"{CORES} physical cores, so raw weak efficiency is "
                    "core-bound past that; eff_vs_roofline divides out the "
                    "core limit (flat roofline = real per-chip hardware).",
        }, fh, indent=1)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
