"""Probe Mosaic/Pallas TPU capabilities needed by the BVH traversal kernel:
  1. SMEM input refs with dynamic scalar indexing (node meta table)
  2. SMEM capacity (how big can a meta table be?)
  3. dynamic sublane slice of a VMEM ref (nodes_ref[pl.ds(row,1), :])
  4. one-hot matmul extraction of a 16-lane sub-record
  5. lax.while_loop with SMEM scratch state + vector carry
Run: python tools/probe_pallas.py
"""
import os
import sys
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def probe1_smem_dynamic():
    """SMEM input + dynamic scalar read + while_loop + dyn VMEM sublane slice."""
    M = 64
    meta = jnp.arange(M * 4, dtype=jnp.int32).reshape(M, 4)
    nodes = jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128)

    def kernel(meta_ref, nodes_ref, out_ref, stack_ref):
        stack_ref[0] = 5
        stack_ref[1] = 9

        def body(carry):
            i, acc = carry
            idx = stack_ref[i]
            v = meta_ref[idx, 2]            # dynamic scalar read from SMEM
            row = nodes_ref[pl.ds(idx % 8, 1), :]   # dyn sublane slice VMEM
            sub = idx % 8
            oh = (jax.lax.broadcasted_iota(jnp.int32, (1, 8), 1) == sub)
            rec = jnp.dot(oh.astype(jnp.float32), row.reshape(8, 16),
                          preferred_element_type=jnp.float32)  # [1,16]
            acc = acc + v.astype(jnp.float32) + rec[0, 3]
            return i + 1, acc

        def cond(carry):
            return carry[0] < 2

        _, acc = jax.lax.while_loop(cond, body, (0, 0.0))
        out_ref[0, 0] = acc

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        scratch_shapes=[pltpu.SMEM((16,), jnp.int32)],
    )(meta, nodes)
    want = (meta[5, 2] + meta[9, 2]).astype(jnp.float32)
    # rec[0,3]: idx=5 -> row5 of nodes reshaped [8,16] of row (5%8=5) ... nodes
    # row 5 reshaped(8,16)[5,3] = nodes[5, 5*16+3]
    want = want + nodes[5, 5 * 16 + 3] + nodes[1, 1 * 16 + 3]
    print("probe1 smem+dyn:", float(out[0, 0]), "want", float(want),
          "OK" if abs(float(out[0, 0]) - float(want)) < 1e-3 else "FAIL")


def probe2_smem_capacity():
    """Find max SMEM input size."""
    for kb in (32, 64, 128, 256, 512, 1024):
        M = kb * 1024 // 16
        meta = jnp.ones((M, 4), jnp.int32)

        def kernel(meta_ref, out_ref):
            out_ref[0, 0] = meta_ref[M - 1, 3]
        try:
            out = pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            )(meta)
            print(f"probe2 SMEM {kb}KB: OK ({int(out[0,0])})")
        except Exception as e:
            print(f"probe2 SMEM {kb}KB: FAIL {str(e)[:120]}")
            break


def probe3_scalar_stack_push():
    """Dynamic scalar SMEM writes (stack push at runtime sp)."""
    def kernel(out_ref, stack_ref):
        def body(i, sp):
            stack_ref[sp] = i * 10
            return sp + 1
        sp = jax.lax.fori_loop(0, 5, body, 0)
        acc = 0
        for k in range(5):
            acc += stack_ref[k]
        out_ref[0, 0] = acc + sp

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        scratch_shapes=[pltpu.SMEM((64,), jnp.int32)],
    )()
    print("probe3 dyn stack:", int(out[0, 0]), "want", 10 * (0 + 1 + 2 + 3 + 4) + 5,
          "OK" if int(out[0, 0]) == 105 else "FAIL")


def probe4_vector_carry_while():
    """while_loop carrying [8,128] vectors + scalar flag; scalar select of rows."""
    x = jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128)

    def kernel(x_ref, out_ref):
        v = x_ref[:]

        def cond(c):
            return c[0] < 3

        def body(c):
            i, acc = c
            half = jnp.where(i % 2 == 0, v[:, :64], v[:, 64:])
            pad = jnp.concatenate([half, half], axis=1)
            return i + 1, acc + pad

        _, acc = jax.lax.while_loop(cond, body, (0, jnp.zeros_like(v)))
        out_ref[:] = acc

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)
    print("probe4 vec-carry while: sum", float(out.sum()), "OK(ran)")


def probe5_concat_scalars():
    """Build [8,1] vector from 8 SMEM scalars via concat of full((1,1),s)."""
    meta = jnp.arange(32, dtype=jnp.int32).reshape(8, 4)

    def kernel(meta_ref, out_ref):
        cols = [jnp.full((1, 1), meta_ref[s, 1], jnp.int32) for s in range(8)]
        out_ref[:] = jnp.concatenate(cols, axis=0)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 1), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(meta)
    print("probe5 scalar->vec:", np.asarray(out).ravel().tolist(), "want",
          (np.arange(8) * 4 + 1).tolist())


if __name__ == "__main__":
    for p in (probe1_smem_dynamic, probe2_smem_capacity, probe3_scalar_stack_push,
              probe4_vector_carry_while, probe5_concat_scalars):
        try:
            p()
        except Exception as e:
            print(p.__name__, "EXCEPTION:", str(e)[:400])
