"""Stateless sample generators — the TPU re-design of core/src/sampler/.

The reference's `Sampler` trait is a mutable per-tile object with
start_pixel/get_1d/get_2d cursors (core/src/sampler/mod.rs:17). Here a
sampler is a frozen `SamplerSpec` plus the pure function

    sample_dim(spec, px, py, sample_index, dim) -> [N] float32 in [0,1)

evaluated for a whole wavefront at once. Dimension indices are allocated
statically by the integrators (camera dims 0-4, then 5 per bounce), so the
entire render is a closed-form function of (pixel, sample, seed) — this is
what makes path-replay differentiation and SPMD sharding trivial.

Families (reference parity):
  random       -> counter-based PCG hash            (samplers/src/random.rs)
  stratified   -> shuffled jittered strata (CMJ permutation, Kensler 2013)
                                                    (samplers/src/stratified.rs)
  halton       -> faithful global Halton enumeration with pixel stride
                  2^j*3^k and digit-permutation scrambling
                                                    (samplers/src/halton.rs:22-101)
  sobol        -> per-pixel Owen-scrambled + shuffled Sobol' ("padded Sobol",
                  Burley 2020) over generated matrices
                                                    (samplers/src/sobol.rs)
  02sequence   -> same machinery restricted to the (0,2) matrix pair per 2D
                  slot                              (samplers/src/zero_two_sequence.rs)
  maxmindist   -> 02sequence machinery (the reference's specialized C-matrix
                  tables trade for Owen scrambling here)
                                                    (samplers/src/max_min_dist.rs)
"""
from __future__ import annotations

import dataclasses
import math
from typing import Tuple

import numpy as np
import jax.numpy as jnp

from pbrt_tpu.samplers import hashing as H
from pbrt_tpu.samplers import lds

U32 = jnp.uint32


@dataclasses.dataclass(frozen=True)
class SamplerSpec:
    kind: str = "random"
    spp: int = 16
    seed: int = 0
    xsamples: int = 4            # stratified strata in x
    ysamples: int = 4            # stratified strata in y
    jitter: bool = True
    resolution: Tuple[int, int] = (0, 0)   # needed by halton/sobol
    dimensions: int = 1024
    owen: bool = False   # sobol: opt-in Owen-scrambled padded variant
                         # (default is the reference-matched global
                         # enumeration, samplers/sobol_ref.py)

    def rounded_spp(self) -> int:
        """sobol-family samplers need power-of-two spp (reference rounds up
        with a warning, core/src/sampler/common.rs)."""
        if self.kind in ("sobol", "02sequence", "maxmindist", "lowdiscrepancy"):
            return 1 << max(0, (self.spp - 1).bit_length())
        if self.kind == "stratified":
            return self.xsamples * self.ysamples
        return self.spp


def make_sampler(kind: str, params: dict, resolution: Tuple[int, int], seed: int = 0) -> SamplerSpec:
    """Build a SamplerSpec from a .pbrt ParamSet dict (name->values)."""
    spp = int(params.get("pixelsamples", [16])[0])
    if kind == "stratified":
        xs = int(params.get("xsamples", [4])[0])
        ys = int(params.get("ysamples", [4])[0])
        return SamplerSpec("stratified", xs * ys, seed, xs, ys,
                           bool(params.get("jitter", [True])[0]), resolution)
    if kind in ("random", "halton", "sobol", "02sequence", "maxmindist", "lowdiscrepancy"):
        k = "02sequence" if kind == "lowdiscrepancy" else kind
        owen = bool(params.get("owenscramble", [False])[0])
        return SamplerSpec(k, spp, seed, resolution=resolution, owen=owen)
    raise ValueError(f"unknown sampler kind {kind!r}")


# ---------------------------------------------------------------------------
# halton enumeration constants (host precompute per spec)
# ---------------------------------------------------------------------------

def _mult_inverse(a: int, n: int) -> int:
    # extended euclid
    t, new_t, r, new_r = 0, 1, n, a % n
    while new_r != 0:
        q = r // new_r
        t, new_t = new_t, t - q * new_t
        r, new_r = new_r, r - q * new_r
    return t % n


def _halton_consts(resolution):
    rx = max(int(resolution[0]), 1)
    ry = max(int(resolution[1]), 1)
    j = 0
    while (1 << j) < min(rx, 128):
        j += 1
    k = 0
    while 3 ** k < min(ry, 128):
        k += 1
    b0, b1 = 1 << j, 3 ** k
    stride = b0 * b1
    inv0 = _mult_inverse(stride // b0, b0)
    inv1 = _mult_inverse(stride // b1, b1)
    return j, k, b0, b1, stride, inv0, inv1


def _halton_index(spec: SamplerSpec, px, py, sample_idx):
    """Global Halton sample index for (pixel, sample) — the CRT enumeration
    of samplers/src/halton.rs get_index_for_sample."""
    j, k, b0, b1, stride, inv0, inv1 = _halton_consts(spec.resolution)
    pm0 = (px.astype(U32)) % U32(b0)
    pm1 = (py.astype(U32)) % U32(b1)
    # digit-reverse the pixel coordinate in each base
    d0 = lds.inverse_radical_inverse(2, pm0, j)
    d1 = lds.inverse_radical_inverse(3, pm1, k)
    off = (d0 * U32(stride // b0) * U32(inv0) + d1 * U32(stride // b1) * U32(inv1)) % U32(stride)
    return off + sample_idx.astype(U32) * U32(stride)


# permutation tables shared across halton specs (seeded once). Kept as
# NUMPY so caching across jit traces can't leak tracers; slices become
# jit constants at use sites.
def _halton_perm_table(seed):
    return lds.radical_inverse_permutations(seed)


# ---------------------------------------------------------------------------
# per-kind dimension evaluation
# ---------------------------------------------------------------------------

def _dim_key(spec, dim):
    return H.hash_combine(U32(spec.seed), U32(dim))


def sample_dim(spec: SamplerSpec, px, py, sample_idx, dim: int):
    """[N] float32 sample for static dimension `dim`.

    px, py: int32 pixel coords [N]; sample_idx: int32 [N].
    """
    px = jnp.asarray(px).astype(jnp.int32)
    py = jnp.asarray(py).astype(jnp.int32)
    sample_idx = jnp.asarray(sample_idx).astype(jnp.int32)
    pix = H.hash3(px.astype(U32), py.astype(U32), U32(spec.seed))

    if spec.kind == "random":
        return H.u32_to_float(H.hash3(pix, sample_idx.astype(U32), U32(dim)))

    if spec.kind == "stratified":
        return _stratified_dim(spec, pix, sample_idx, dim)

    if spec.kind == "halton":
        return _halton_dim(spec, px, py, sample_idx, dim)

    if spec.kind == "sobol" and not spec.owen:
        # reference-matched global Sobol' enumeration (scramble = 0)
        from pbrt_tpu.samplers import sobol_ref
        return sobol_ref.sobol_dim(spec.resolution, spec.rounded_spp(),
                                   px, py, sample_idx, dim)

    if spec.kind in ("sobol", "02sequence", "maxmindist"):
        return _sobol_dim(spec, pix, sample_idx, dim)

    raise ValueError(f"unknown sampler kind {spec.kind!r}")


def sample_2d(spec: SamplerSpec, px, py, sample_idx, dim: int):
    """[N, 2] sample for the 2D slot at (dim, dim+1). For stratified, the
    pair is drawn jointly from an xs x ys grid (true 2D stratification)."""
    if spec.kind == "stratified":
        pix = H.hash3(jnp.asarray(px).astype(U32), jnp.asarray(py).astype(U32), U32(spec.seed))
        return _stratified_2d(spec, pix, jnp.asarray(sample_idx).astype(jnp.int32), dim)
    a = sample_dim(spec, px, py, sample_idx, dim)
    b = sample_dim(spec, px, py, sample_idx, dim + 1)
    return jnp.stack([a, b], axis=-1)


def _stratified_dim(spec, pix, sample_idx, dim):
    spp = spec.rounded_spp()
    key = H.hash_combine(pix, _dim_key(spec, dim))
    stratum = H.cmj_permute(sample_idx.astype(U32), spp, key)
    jit_u = H.u32_to_float(H.hash3(key, sample_idx.astype(U32), U32(0x55)))
    j = jit_u if spec.jitter else 0.5
    return jnp.minimum((stratum.astype(jnp.float32) + j) / spp, H.ONE_MINUS_EPS)


def _stratified_2d(spec, pix, sample_idx, dim):
    xs, ys = spec.xsamples, spec.ysamples
    spp = xs * ys
    key = H.hash_combine(pix, _dim_key(spec, dim))
    stratum = H.cmj_permute(sample_idx.astype(U32), spp, key)
    sx = (stratum % U32(xs)).astype(jnp.float32)
    sy = (stratum // U32(xs)).astype(jnp.float32)
    ju = H.u32_to_float(H.hash3(key, sample_idx.astype(U32), U32(0xa1)))
    jv = H.u32_to_float(H.hash3(key, sample_idx.astype(U32), U32(0xb2)))
    if not spec.jitter:
        ju = jv = 0.5
    u = jnp.minimum((sx + ju) / xs, H.ONE_MINUS_EPS)
    v = jnp.minimum((sy + jv) / ys, H.ONE_MINUS_EPS)
    return jnp.stack([u, v], axis=-1)


_HALTON_TABLES = {}


def _halton_dim(spec, px, py, sample_idx, dim):
    j, k, b0, b1, stride, _, _ = _halton_consts(spec.resolution)
    index = _halton_index(spec, px, py, sample_idx)
    if dim == 0:
        return lds.radical_inverse(2, index >> U32(j))
    if dim == 1:
        return lds.radical_inverse(3, index // U32(b1))
    key = spec.seed
    if key not in _HALTON_TABLES:
        _HALTON_TABLES[key] = _halton_perm_table(spec.seed)
    table, offs, ps = _HALTON_TABLES[key]
    d = min(dim, len(ps) - 1)
    base = int(ps[d])
    perm = table[int(offs[d]):int(offs[d]) + base]
    return lds.scrambled_radical_inverse(base, index, perm)


def _sobol_mats():
    # numpy (lru-cached in lds); jnp ops treat rows as jit constants, and
    # caching numpy can't leak tracers across traces
    return lds.sobol_matrices()


def _sobol_dim(spec, pix, sample_idx, dim):
    spp = spec.rounded_spp()
    mask = spp - 1
    # per-pixel shuffle of the sample index (decorrelates pixels)
    shuffled = H.nested_uniform_shuffle(sample_idx.astype(U32), mask, pix) & U32(mask)
    if spec.kind == "maxmindist" and dim in (0, 1):
        # the reference's specialized C-matrix first 2D slot
        # (low_discrepency.rs:235 C_MAX_MIN_DIST; maxmin.rs:89-97 — the
        # per-pixel shuffle stands in for its rng shuffle)
        from pbrt_tpu.samplers import sobol_ref
        return sobol_ref.maxmin_first_slot(spp, shuffled, dim)
    if spec.kind == "sobol":
        d = dim % lds.N_SOBOL_DIMS
    else:
        # (0,2): every 2D slot reuses the proven matrix pair, scrambled
        # independently per slot
        d = dim % 2
        shuffled = H.nested_uniform_shuffle(
            sample_idx.astype(U32), mask, H.hash_combine(pix, U32(dim // 2))) & U32(mask)
    v = lds.sobol_sample_u32(shuffled, _sobol_mats()[d])
    v = H.owen_scramble_u32(v, H.hash_combine(pix, _dim_key(spec, dim)))
    return H.u32_to_float(v)
