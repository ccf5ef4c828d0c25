"""Counter-based hashing primitives for stateless sampling.

The reference carries mutable per-tile sampler state (core/src/sampler/mod.rs,
PCG32 RNG core/src/rng.rs). On TPU, mutable per-lane state is poison: instead
every random value is a pure hash of (pixel, sample_index, dimension, seed).
This is the whole-framework determinism/replay story: path-replay backprop and
multi-device sharding both fall out of sample = f(counter).

Hashes: PCG output permutation over an LCG-mixed counter (O'Neill), and the
Laine-Karras/Burley hash-based Owen scrambling for base-2 sequences.
"""
from __future__ import annotations

import jax.numpy as jnp

U32 = jnp.uint32
_INV_U32 = jnp.float32(2.3283064365386963e-10)  # 1/2^32
ONE_MINUS_EPS = jnp.float32(1.0 - 2.0 ** -24)


def _u32(x):
    return jnp.asarray(x).astype(U32)


def pcg_hash(x):
    """PCG-RXS-M-XS style 32-bit mix."""
    x = _u32(x)
    state = x * U32(747796405) + U32(2891336453)
    word = ((state >> ((state >> U32(28)) + U32(4))) ^ state) * U32(277803737)
    return (word >> U32(22)) ^ word


def hash_combine(a, b):
    """Mix two u32 streams (boost-style)."""
    a = _u32(a)
    b = _u32(b)
    return pcg_hash(a ^ (b + U32(0x9E3779B9) + (a << U32(6)) + (a >> U32(2))))


def hash3(a, b, c):
    return hash_combine(hash_combine(a, b), c)


def hash4(a, b, c, d):
    return hash_combine(hash3(a, b, c), d)


def u32_to_float(u):
    """uint32 -> float in [0, 1)."""
    return jnp.minimum(_u32(u).astype(jnp.float32) * _INV_U32, ONE_MINUS_EPS)


def uniform_float(*keys):
    """Hash any number of integer keys to a float in [0,1)."""
    h = _u32(keys[0])
    for k in keys[1:]:
        h = hash_combine(h, k)
    return u32_to_float(h)


def reverse_bits32(x):
    x = _u32(x)
    x = ((x << U32(16)) | (x >> U32(16)))
    x = ((x & U32(0x00ff00ff)) << U32(8)) | ((x & U32(0xff00ff00)) >> U32(8))
    x = ((x & U32(0x0f0f0f0f)) << U32(4)) | ((x & U32(0xf0f0f0f0)) >> U32(4))
    x = ((x & U32(0x33333333)) << U32(2)) | ((x & U32(0xcccccccc)) >> U32(2))
    x = ((x & U32(0x55555555)) << U32(1)) | ((x & U32(0xaaaaaaaa)) >> U32(1))
    return x


def laine_karras_permutation(x, seed):
    """Hash-based Owen scramble of a bit-reversed index (Burley 2020)."""
    x = _u32(x)
    seed = _u32(seed)
    x = x + seed
    x = x ^ (x * U32(0x6c50b47c))
    x = x ^ (x * U32(0xb82f1e52))
    x = x ^ (x * U32(0xc7afe638))
    x = x ^ (x * U32(0x8d22f6e6))
    return x


def owen_scramble_u32(x, seed):
    """Owen-scramble a radical-inverse u32 (bits already reversed so the
    radix point is at the top)."""
    x = reverse_bits32(x)
    x = laine_karras_permutation(x, seed)
    return reverse_bits32(x)


def nested_uniform_shuffle(i, n_pow2_mask, seed):
    """Owen-shuffle index i within a power-of-two domain (a bijection on
    [0, mask] because the LK permute only propagates information upward in
    the reversed-bit domain)."""
    x = laine_karras_permutation(reverse_bits32(_u32(i)), seed)
    return reverse_bits32(x) & _u32(n_pow2_mask)


def cmj_permute(i, l, p):
    """Kensler's cycle-walking pseudorandom permutation of [0, l).

    i: [N] u32 indices, l: static python int domain size, p: [N] u32 pattern
    keys. Used for stratum shuffling in the stratified/cmj samplers.
    """
    if l <= 1:
        return jnp.zeros_like(_u32(i))
    w = (1 << (l - 1).bit_length()) - 1  # pow2-1 mask >= l-1
    i = _u32(i)
    p = _u32(p)
    wm = U32(w)

    def rounds(i):
        i ^= p
        i *= U32(0xe170893d)
        i ^= p >> U32(16)
        i ^= (i & wm) >> U32(4)
        i ^= p >> U32(8)
        i *= U32(0x0929eb3f)
        i ^= p >> U32(23)
        i ^= (i & wm) >> U32(1)
        i *= U32(1) | (p >> U32(27))
        i *= U32(0x6935fa69)
        i ^= (i & wm) >> U32(11)
        i *= U32(0x74dcca23)
        i ^= (i & wm) >> U32(2)
        i *= U32(0x9e501cc3)
        i ^= (i & wm) >> U32(2)
        i *= U32(0xc860a3df)
        i &= wm
        i ^= i >> U32(5)
        return i

    # cycle-walk: with a pow2 mask, at most a few retries needed; a fixed
    # small unroll keeps it jit-static (prob of needing >8 is ~(1/2)^8)
    out = rounds(i)
    for _ in range(8):
        need = out >= U32(l)
        out = jnp.where(need, rounds(out), out)
    out = jnp.where(out >= U32(l), i % U32(l), out)  # fallback, keeps in-range
    return (out + p) % U32(l)
