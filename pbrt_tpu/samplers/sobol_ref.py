"""Reference-matched global Sobol' enumeration.

Reproduces the reference's SobolSampler bit-for-bit (BASELINE's
matched-sequence requirement):

  * generator matrices: the standard pbrt-v3 / Joe-Kuo tables, extracted to
    .npy data by tools/extract_sobol_data.py
    (reference: core/src/sobol_matrices.rs:5-11);
  * global sample enumeration: sobol_interval_to_index maps (pixel, sample
    number) to an index into one global Sobol' sequence via the van der
    Corput matrices and their inverses
    (reference: core/src/low_discrepency.rs:1770-1815);
  * sample_dimension: dims 0/1 are remapped from [0,1)^2 over the whole
    sample-resolution square back into the current pixel
    (reference: samplers/src/sobol.rs sample_dimension);
  * maxmindist: the C_MAX_MIN_DIST generator matrices drive the first 2D
    slot (reference: core/src/low_discrepency.rs:235,
    samplers/src/maxmin.rs:84-97).

The 46-bit global index is carried as a (hi, lo) u32 pair — JAX x64 stays
off. All bit loops are static (52 matrix columns), so each dimension costs
~150 fused vector ops per wavefront.
"""
from __future__ import annotations

import functools
import os

import numpy as np
import jax.numpy as jnp

U32 = jnp.uint32
ONE_MINUS_EPS = np.float32(1.0 - 2.0 ** -24)
_DATA = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data")


@functools.lru_cache()
def tables():
    m32 = np.load(os.path.join(_DATA, "sobol_matrices_32.npy"))
    vdc = np.load(os.path.join(_DATA, "vdc_sobol_matrices.npy"))
    vdci = np.load(os.path.join(_DATA, "vdc_sobol_matrices_inv.npy"))
    cmm = np.load(os.path.join(_DATA, "c_max_min_dist.npy"))
    return m32, vdc, vdci, cmm


def log2_resolution(resolution) -> int:
    """next_power_of_two(max extent) exponent (sobol.rs:46-55)."""
    r = max(int(resolution[0]), int(resolution[1]), 1)
    return int(np.ceil(np.log2(r))) if r > 1 else 0


def sobol_interval_to_index(m: int, spp: int, frame, px, py):
    """Global sample index for pixel (px,py) sample number `frame`.

    m: log2 of the pow2 sample resolution (static); spp static (pow2).
    Returns (hi, lo) u32 pair. Mirrors low_discrepency.rs:1770-1807.
    """
    frame = jnp.asarray(frame).astype(U32)
    if m == 0:
        z = jnp.zeros_like(frame)
        return z, z      # reference: index 0 for a degenerate resolution
    _, vdc, vdci, _ = tables()
    m2 = 2 * m
    fbits = max(int(spp - 1).bit_length(), 1)

    # index = frame << m2
    if m2 < 32:
        lo = frame << U32(m2)
        hi = frame >> U32(32 - m2)
    else:
        lo = jnp.zeros_like(frame)
        hi = frame << U32(m2 - 32) if m2 > 32 else frame

    # delta = XOR of vdc[m-1][c] over set bits c of frame (fits 2m<=30 bits)
    row = vdc[m - 1]
    delta = jnp.zeros_like(frame)
    for c in range(fbits):
        delta = delta ^ jnp.where((frame >> U32(c)) & U32(1) > 0,
                                  U32(int(row[c]) & 0xFFFFFFFF), U32(0))

    b = ((px.astype(U32) << U32(m)) | py.astype(U32)) ^ delta

    rowi = vdci[m - 1]
    for c in range(m2):
        col = int(rowi[c])
        bit = (b >> U32(c)) & U32(1) > 0
        if col & 0xFFFFFFFF:
            lo = lo ^ jnp.where(bit, U32(col & 0xFFFFFFFF), U32(0))
        if col >> 32:
            hi = hi ^ jnp.where(bit, U32(col >> 32), U32(0))
    return hi, lo


def sobol_sample_u32(hi, lo, dim: int):
    """Raw u32 sample of `dim` at global index (hi,lo), scramble=0
    (low_discrepency.rs sobol_sample_f32)."""
    m32, _, _, _ = tables()
    row = m32[dim % m32.shape[0]]
    v = jnp.zeros_like(lo)
    for i in range(32):
        c = int(row[i])
        if c:
            v = v ^ jnp.where((lo >> U32(i)) & U32(1) > 0, U32(c), U32(0))
    for i in range(20):
        c = int(row[32 + i])
        if c:
            v = v ^ jnp.where((hi >> U32(i)) & U32(1) > 0, U32(c), U32(0))
    return v


def u32_to_unit_float(v):
    return jnp.minimum(v.astype(jnp.float32) * np.float32(2.0 ** -32),
                       ONE_MINUS_EPS)


def sobol_dim(resolution, spp: int, px, py, sample_idx, dim: int):
    """Reference-matched SobolSampler.sample_dimension for the wavefront.

    px, py: absolute pixel coords (sample-bounds origin assumed (0,0) —
    this framework's films never extend sample bounds below zero).
    """
    m = log2_resolution(resolution)
    hi, lo = sobol_interval_to_index(m, spp, sample_idx, px, py)
    v = u32_to_unit_float(sobol_sample_u32(hi, lo, dim))
    if dim in (0, 1):
        res = np.float32(1 << m)
        pixc = (px if dim == 0 else py).astype(jnp.float32)
        v = jnp.clip(v * res - pixc, 0.0, ONE_MINUS_EPS)
    return v


def sample_generator_matrix_u32(C_row, a):
    """XOR of C columns over set bits of a [N] u32 (low_discrepency.rs
    sample_generator_matrix with scramble=0)."""
    v = jnp.zeros_like(a)
    for i in range(32):
        c = int(C_row[i])
        if c:
            v = v ^ jnp.where((a >> U32(i)) & U32(1) > 0, U32(c), U32(0))
    return v


def maxmin_first_slot(spp: int, shuffled_idx, dim: int):
    """The maxmindist sampler's specialized first 2D slot: (i/spp,
    C_MAX_MIN_DIST[log2 spp](i)) (maxmin.rs:89-94). shuffled_idx is the
    per-pixel-shuffled sample order (the reference shuffles with its rng)."""
    _, _, _, cmm = tables()
    lg = min(max(int(spp - 1).bit_length(), 0), 16)
    if dim == 0:
        return jnp.minimum(shuffled_idx.astype(jnp.float32) / np.float32(spp),
                           ONE_MINUS_EPS)
    return u32_to_unit_float(
        sample_generator_matrix_u32(cmm[lg], shuffled_idx.astype(U32)))
