"""Bisect the probe1/probe2 failures: SMEM input refs vs dyn sublane slice vs
one-hot dot."""
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def run(name, f):
    try:
        f()
        print(name, "OK")
    except Exception as e:
        msg = str(e)
        print(name, "FAIL:", msg[:1500].replace("\n", " | "))


def a_smem_input_small():
    meta = jnp.arange(16, dtype=jnp.int32).reshape(4, 4)

    def kernel(meta_ref, out_ref):
        out_ref[0, 0] = meta_ref[3, 1]

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
    )(meta)
    assert int(out[0, 0]) == 13, out


def a2_smem_input_dyn():
    meta = jnp.arange(4096 * 4, dtype=jnp.int32).reshape(4096, 4)

    def kernel(meta_ref, out_ref):
        i = meta_ref[0, 0] + 77
        out_ref[0, 0] = meta_ref[i, 1]

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
    )(meta)
    assert int(out[0, 0]) == 77 * 4 + 1, out


def b_dyn_sublane_slice():
    nodes = jnp.arange(64 * 128, dtype=jnp.float32).reshape(64, 128)

    def kernel(idx_ref, nodes_ref, out_ref):
        i = idx_ref[0]
        row = nodes_ref[pl.ds(i, 1), :]
        out_ref[:] = row

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(jnp.array([7], jnp.int32), nodes)
    assert float(out[0, 0]) == 7 * 128, out


def c_onehot_dot():
    nodes = jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128)

    def kernel(nodes_ref, out_ref):
        row = nodes_ref[pl.ds(3, 1), :]
        r8 = row.reshape(8, 16)
        oh = (jax.lax.broadcasted_iota(jnp.int32, (1, 8), 1) == 5).astype(jnp.float32)
        rec = jnp.dot(oh, r8, preferred_element_type=jnp.float32)
        out_ref[:] = rec

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, 16), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(nodes)
    assert float(out[0, 3]) == 3 * 128 + 5 * 16 + 3, np.asarray(out)


def c2_reshape_row():
    nodes = jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128)

    def kernel(nodes_ref, out_ref):
        row = nodes_ref[pl.ds(3, 1), :]
        out_ref[:] = row.reshape(8, 16)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 16), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(nodes)
    assert float(out[5, 3]) == 3 * 128 + 5 * 16 + 3, np.asarray(out)


def d_scratch_smem_big():
    for kb in (64, 256, 1024):
        n = kb * 1024 // 4

        def kernel(out_ref, scr):
            scr[5] = 42
            out_ref[0, 0] = scr[5]
        try:
            out = pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
                out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
                scratch_shapes=[pltpu.SMEM((n,), jnp.int32)],
            )()
            print(f"  d: SMEM scratch {kb}KB OK")
        except Exception as e:
            print(f"  d: SMEM scratch {kb}KB FAIL: {str(e)[:200]}")
            break


def e_dyn_scalar_read_vmem():
    """Dynamic scalar read directly from a VMEM ref (fallback for meta)."""
    meta = jnp.arange(4096 * 4, dtype=jnp.int32).reshape(4096, 4)

    def kernel(idx_ref, meta_ref, out_ref):
        i = idx_ref[0]
        out_ref[0, 0] = meta_ref[i, 1]

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
    )(jnp.array([77], jnp.int32), meta)
    assert int(out[0, 0]) == 77 * 4 + 1, out


if __name__ == "__main__":
    run("a  smem-input-small", a_smem_input_small)
    run("a2 smem-input-dyn-4096x4", a2_smem_input_dyn)
    run("b  dyn-sublane-slice", b_dyn_sublane_slice)
    run("c  onehot-dot", c_onehot_dot)
    run("c2 reshape-row", c2_reshape_row)
    d_scratch_smem_big()
    run("e  dyn-scalar-read-vmem", e_dyn_scalar_read_vmem)
