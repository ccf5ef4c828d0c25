"""Measure table-gather strategies on TPU: XLA gather vs one-hot matmul.

The r4 profile shows 64K-element gathers cost 700-950us each (XLA lowers
them to serial dynamic-slices on TPU) and the path tracer issues dozens per
bounce. Candidate replacements:
  - one-hot matmul (classic TPU embedding trick, MXU-fed)
  - chunked scan one-hot
  - take-along-axis variants
"""
import os
import sys
import time
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))


def timeit(f, *args, iters=30):
    out = jax.block_until_ready(f(*args))
    t0 = time.time()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters


def main():
    n = 1 << 16
    rng = np.random.default_rng(0)
    for T, K in ((8, 16), (64, 16), (512, 16), (4608, 16), (4608, 4), (69000, 16)):
        table = jnp.asarray(rng.normal(size=(T, K)), jnp.float32)
        idx = jnp.asarray(rng.integers(0, T, n), jnp.int32)

        f_g = jax.jit(lambda t, i: t[i])
        dt_g = timeit(f_g, table, idx)

        def onehot_mm(t, i):
            oh = jax.nn.one_hot(i, T, dtype=jnp.bfloat16)
            return jnp.dot(oh, t.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)
        dt_oh = timeit(jax.jit(onehot_mm), table, idx) if T <= 8192 else float("nan")

        # f32 one-hot (exact)
        def onehot_f32(t, i):
            oh = jax.nn.one_hot(i, T, dtype=jnp.float32)
            return jnp.dot(oh, t, preferred_element_type=jnp.float32)
        dt_oh32 = timeit(jax.jit(onehot_f32), table, idx) if T <= 8192 else float("nan")

        # chunked scan one-hot: avoids materializing [n, T]
        CH = 2048
        def scan_oh(t, i):
            ic = i.reshape(n // CH, CH)
            def step(_, ii):
                oh = jax.nn.one_hot(ii, T, dtype=jnp.bfloat16)
                return None, jnp.dot(oh, t.astype(jnp.bfloat16),
                                     preferred_element_type=jnp.float32)
            _, out = jax.lax.scan(step, None, ic)
            return out.reshape(n, K)
        dt_scan = timeit(jax.jit(scan_oh), table, idx) if T <= 70000 else float("nan")

        print(f"T={T:6d} K={K:2d}: gather {dt_g*1e3:7.3f} ms | onehot-bf16 "
              f"{dt_oh*1e3:7.3f} ms | onehot-f32 {dt_oh32*1e3:7.3f} ms | "
              f"scan-oh {dt_scan*1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
