"""Probe round 3: node-record extraction alternatives (no reshape allowed).
  f: selection-matrix dot  row[1,128] @ sel[128,16] with dynamic sub
  g: VMEM scalar read with BOTH indices dynamic
  h: 1-D SMEM input with dynamic read
  i: dynamic pltpu.roll of a [1,128] row
  j: 12 scalar VMEM reads -> broadcast [1,1] values
"""
import os
import sys

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
        print(name, "FAIL:", str(e)[:300].replace("\n", " | "))


def f_selection_dot():
    nodes = jnp.arange(64 * 128, dtype=jnp.float32).reshape(64, 128)

    def kernel(idx_ref, nodes_ref, out_ref):
        idx = idx_ref[0]
        row = nodes_ref[pl.ds(idx >> 3, 1), :]          # [1,128]
        sub = idx & 7
        li = jax.lax.broadcasted_iota(jnp.int32, (128, 16), 0)
        ci = jax.lax.broadcasted_iota(jnp.int32, (128, 16), 1)
        sel = (li == sub * 16 + ci).astype(jnp.float32)
        out_ref[:] = jnp.dot(row, sel, preferred_element_type=jnp.float32)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, 16), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(jnp.array([27], jnp.int32), nodes)
    want = 27 // 8 * 128 + (27 % 8) * 16 + 3
    assert float(out[0, 3]) == want, (np.asarray(out), want)


def g_vmem_scalar_2dyn():
    meta = jnp.arange(512 * 128, dtype=jnp.int32).reshape(512, 128)

    def kernel(idx_ref, meta_ref, out_ref):
        i = idx_ref[0]
        out_ref[0, 0] = meta_ref[i >> 5, (i & 31) * 4 + 2]

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
    )(jnp.array([77], jnp.int32), meta)
    want = (77 >> 5) * 128 + (77 & 31) * 4 + 2
    assert int(out[0, 0]) == want, (int(out[0, 0]), want)


def h_smem_1d():
    meta = jnp.arange(16384, dtype=jnp.int32)

    def kernel(idx_ref, meta_ref, out_ref):
        out_ref[0, 0] = meta_ref[idx_ref[0]]

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
    )(jnp.array([999], jnp.int32), meta)
    assert int(out[0, 0]) == 999


def i_dyn_roll():
    nodes = jnp.arange(128, dtype=jnp.float32).reshape(1, 128)

    def kernel(idx_ref, nodes_ref, out_ref):
        sub = idx_ref[0]
        row = nodes_ref[:]
        rolled = pltpu.roll(row, -sub * 16, 1)
        out_ref[:] = rolled[:, :16]

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, 16), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(jnp.array([5], jnp.int32), nodes)
    assert float(out[0, 3]) == 5 * 16 + 3, np.asarray(out)


def j_scalar_reads_bcast():
    nodes = jnp.arange(64 * 128, dtype=jnp.float32).reshape(64, 128)

    def kernel(idx_ref, nodes_ref, out_ref):
        idx = idx_ref[0]
        r = idx >> 3
        base = (idx & 7) * 16
        vals = [jnp.full((1, 1), nodes_ref[r, base + c], jnp.float32)
                for c in range(12)]
        out_ref[:] = jnp.concatenate(vals, axis=1)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, 12), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(jnp.array([27], jnp.int32), nodes)
    want = 27 // 8 * 128 + (27 % 8) * 16 + 3
    assert float(out[0, 3]) == want, (np.asarray(out), want)


if __name__ == "__main__":
    run("f selection-dot", f_selection_dot)
    run("g vmem-scalar-2dyn", g_vmem_scalar_2dyn)
    run("h smem-1d-64KB", h_smem_1d)
    run("i dyn-roll", i_dyn_roll)
    run("j scalar-reads-bcast", j_scalar_reads_bcast)
