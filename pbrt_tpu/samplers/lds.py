"""Low-discrepancy machinery: primes, radical inverses, Sobol' matrices.

Reference: core/src/low_discrepency.rs (radical inverse + permutations) and
core/src/sobol_matrices.rs (27k LoC of generated Joe-Kuo tables). TPU-first
re-design:

  * Radical inverses are computed for a WHOLE wavefront at once per
    dimension; the digit loop is a static python unroll (base known at trace
    time) so XLA sees straight-line VPU code, no per-ray control flow.
  * Sobol' generator matrices are GENERATED at import time from primitive
    polynomials over GF(2) (enumerated programmatically) with deterministic
    odd initial direction numbers — not copied tables. Quality beyond the
    classic first dimensions is recovered by hash-based Owen scrambling
    (Burley 2020), which our sobol-family samplers always apply.
"""
from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp

from pbrt_tpu.samplers.hashing import U32, u32_to_float, ONE_MINUS_EPS

N_SOBOL_DIMS = 256
SOBOL_BITS = 32


# ---------------------------------------------------------------------------
# primes
# ---------------------------------------------------------------------------

@functools.lru_cache(None)
def primes(n: int):
    """First n primes (host)."""
    out = []
    cand = 2
    while len(out) < n:
        if all(cand % p for p in out if p * p <= cand):
            out.append(cand)
        cand += 1
    return tuple(out)


@functools.lru_cache(None)
def prime_sums(n: int):
    ps = primes(n)
    sums = [0]
    for p in ps[:-1]:
        sums.append(sums[-1] + p)
    return tuple(sums)


# ---------------------------------------------------------------------------
# radical inverse (vectorized over wavefront, static base)
# ---------------------------------------------------------------------------

def n_digits(base: int, bits: int = 32) -> int:
    import math
    return int(math.ceil(bits / math.log2(base)))


def radical_inverse(base: int, index):
    """Van der Corput radical inverse of u32 index in `base` -> [0,1)."""
    index = jnp.asarray(index).astype(jnp.uint32)
    if base == 2:
        from pbrt_tpu.samplers.hashing import reverse_bits32
        return jnp.minimum(reverse_bits32(index).astype(jnp.float32) * jnp.float32(2.3283064365386963e-10),
                           ONE_MINUS_EPS)
    # accumulate the inverse directly in f32 (digit-integer accumulation
    # would overflow u32 for 21 base-3 digits; f32 loses only digits that
    # are below its own precision anyway)
    inv_base = jnp.float32(1.0 / base)
    b = U32(base)
    inv = jnp.zeros(index.shape, jnp.float32)
    factor = inv_base
    for _ in range(n_digits(base)):
        nxt = index // b
        digit = index - nxt * b
        inv = inv + digit.astype(jnp.float32) * factor
        factor = factor * inv_base
        index = nxt
    return jnp.minimum(inv, ONE_MINUS_EPS)


def scrambled_radical_inverse(base: int, index, perm):
    """Radical inverse with per-digit permutation table perm: [base] u32.

    Mirrors core/src/low_discrepency.rs scrambled_radical_inverse. perm is a
    device array; the digit loop gathers perm[digit] for the whole wavefront.
    """
    index = jnp.asarray(index).astype(jnp.uint32)
    perm = jnp.asarray(perm)  # fresh per trace; callers may cache numpy
    inv_base = jnp.float32(1.0 / base)
    b = U32(base)
    inv = jnp.zeros(index.shape, jnp.float32)
    factor = inv_base
    for _ in range(n_digits(base)):
        nxt = index // b
        digit = index - nxt * b
        inv = inv + perm[digit].astype(jnp.float32) * factor
        factor = factor * inv_base
        index = nxt
    # infinite tail of permuted zero digits: perm[0] * sum_{i>k} base^-i
    tail = perm[0].astype(jnp.float32) * factor * (base / (base - 1.0))
    return jnp.minimum(inv + tail, ONE_MINUS_EPS)


def inverse_radical_inverse(base: int, inverse, num_digits: int):
    """Given the reversed-digit integer, recover the original index
    (low_discrepency.rs:1535). Host/device, vectorized."""
    inverse = jnp.asarray(inverse).astype(jnp.uint32)
    index = jnp.zeros_like(inverse)
    b = U32(base)
    for _ in range(num_digits):
        digit = inverse % b
        inverse = inverse // b
        index = index * b + digit
    return index


@functools.lru_cache(None)
def radical_inverse_permutations(seed: int = 0, n_dims: int = 128):
    """Random digit permutations for the first n_dims primes, flattened with
    offsets (reference ComputeRadicalInversePermutations). Host numpy."""
    rng = np.random.default_rng(seed)
    ps = primes(n_dims)
    offs = prime_sums(n_dims)
    total = offs[-1] + ps[-1]
    table = np.zeros(total, np.uint32)
    for i, p in enumerate(ps):
        table[offs[i]:offs[i] + p] = rng.permutation(p).astype(np.uint32)
    return table, np.asarray(offs, np.int64), np.asarray(ps, np.int64)


# ---------------------------------------------------------------------------
# Sobol' matrices — generated, not copied
# ---------------------------------------------------------------------------

def _is_primitive(poly: int, degree: int) -> bool:
    """Check primitivity of a GF(2) polynomial given as bitmask (bit degree..0)."""
    order = (1 << degree) - 1

    def polymulmod(a, b, mod, deg):
        r = 0
        while b:
            if b & 1:
                r ^= a
            b >>= 1
            a <<= 1
            if a >> deg & 1:
                a ^= mod
        return r

    def polypowmod(a, e, mod, deg):
        r = 1
        while e:
            if e & 1:
                r = polymulmod(r, a, mod, deg)
            a = polymulmod(a, a, mod, deg)
            e >>= 1
        return r

    # x^order mod poly must be 1
    if polypowmod(2, order, poly, degree) != 1:
        return False
    # and x^(order/q) != 1 for each prime factor q of order
    n = order
    factors = set()
    d = 2
    while d * d <= n:
        while n % d == 0:
            factors.add(d)
            n //= d
        d += 1
    if n > 1:
        factors.add(n)
    for q in factors:
        if polypowmod(2, order // q, poly, degree) == 1:
            return False
    return True


@functools.lru_cache(None)
def _primitive_polys(count: int):
    """First `count` primitive polynomials over GF(2), ascending degree.
    Returned as (degree, coeff_bits a_1..a_{s-1}) pairs."""
    out = []
    degree = 1
    while len(out) < count:
        # candidates: x^s + a_1 x^{s-1} + ... + a_{s-1} x + 1
        for interior in range(1 << max(degree - 1, 0)):
            poly = (1 << degree) | (interior << 1) | 1
            if _is_primitive(poly, degree):
                out.append((degree, interior))
                if len(out) >= count:
                    break
        degree += 1
    return tuple(out)


@functools.lru_cache(None)
def sobol_matrices(n_dims: int = N_SOBOL_DIMS, seed: int = 7):
    """[n_dims, 32] uint32 generator matrices (columns v_k, MSB-aligned)."""
    rng = np.random.default_rng(seed)
    M = np.zeros((n_dims, SOBOL_BITS), np.uint32)
    # dimension 0: van der Corput — identity matrix
    for k in range(SOBOL_BITS):
        M[0, k] = np.uint32(1) << np.uint32(31 - k)
    polys = _primitive_polys(n_dims - 1)
    for d in range(1, n_dims):
        s, a = polys[d - 1]
        # initial direction numbers m_1..m_s: odd, m_k < 2^k
        m = [1]  # m_1 = 1 keeps the first column maximal
        for k in range(2, s + 1):
            m.append(int(rng.integers(0, 1 << (k - 1))) * 2 + 1)
        # recurrence
        for k in range(s + 1, SOBOL_BITS + 1):
            new = m[k - s - 1] ^ (m[k - s - 1] << s)
            for i in range(1, s):
                if (a >> (s - 1 - i)) & 1:
                    new ^= m[k - i - 1] << i
            m.append(new)
        for k in range(SOBOL_BITS):
            # m[k] is m_{k+1} < 2^{k+1}; v_k = m_{k+1} / 2^{k+1}, MSB-aligned
            M[d, k] = np.uint32((m[k] << (31 - k)) & 0xFFFFFFFF)
    return M


def sobol_sample_u32(index, dim_matrix):
    """Evaluate Sobol' u32 for wavefront `index` with matrix [32] u32."""
    index = jnp.asarray(index).astype(jnp.uint32)
    v = jnp.zeros_like(index)
    for b in range(SOBOL_BITS):
        bit = (index >> U32(b)) & U32(1)
        v = v ^ (bit * dim_matrix[b])
    return v


def sobol_sample(index, dim: int, matrices=None):
    if matrices is None:
        matrices = jnp.asarray(sobol_matrices())
    return u32_to_float(sobol_sample_u32(index, matrices[dim]))
