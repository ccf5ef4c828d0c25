"""Matched-sequence validation of the global Sobol' sampler.

An independent numpy port of the reference enumeration
(core/src/low_discrepency.rs:1770-1846, samplers/src/sobol.rs) with native
u64 arithmetic is compared bitwise against the jnp implementation's
u32-pair emulation (pbrt_tpu/samplers/sobol_ref.py) — per BASELINE, the
first samples of dims 0-1 must match the reference enumeration exactly.
"""
import numpy as np
import jax.numpy as jnp

from pbrt_tpu.samplers.sobol_ref import (tables, sobol_interval_to_index,
                                         sobol_sample_u32, sobol_dim,
                                         log2_resolution)
from pbrt_tpu.samplers import SamplerSpec, sample_dim

ONE_MINUS_EPS = np.float32(1.0 - 2.0 ** -24)


def ref_interval_to_index(m, frame, px, py):
    """Direct u64 port of low_discrepency.rs sobol_interval_to_index."""
    if m == 0:
        return np.uint64(0)
    _, vdc, vdci, _ = tables()
    m2 = np.uint64(m << 1)
    frame = int(frame)
    index = np.uint64(frame) << m2
    delta = np.uint64(0)
    c = 0
    f = frame
    while f > 0:
        if f & 1:
            delta ^= vdc[m - 1][c]
        f >>= 1
        c += 1
    b = np.uint64(((px << m) | py)) ^ delta
    c = 0
    while b > 0:
        if b & np.uint64(1):
            index ^= vdci[m - 1][c]
        b >>= np.uint64(1)
        c += 1
    return index


def ref_sobol_sample(a, dim):
    m32, _, _, _ = tables()
    a = int(a)
    v = np.uint32(0)
    i = 0
    while a != 0:
        if a & 1:
            v ^= m32[dim][i]
        a >>= 1
        i += 1
    return min(np.float32(v) * np.float32(2.0 ** -32), ONE_MINUS_EPS)


def test_index_matches_u64_reference():
    res = (16, 16)
    m = log2_resolution(res)
    spp = 16
    pts = [(x, y, s) for x in (0, 3, 7, 15) for y in (0, 5, 15)
           for s in range(spp)]
    px = jnp.asarray([p[0] for p in pts], jnp.int32)
    py = jnp.asarray([p[1] for p in pts], jnp.int32)
    si = jnp.asarray([p[2] for p in pts], jnp.int32)
    hi, lo = sobol_interval_to_index(m, spp, si, px, py)
    got = (np.asarray(hi).astype(np.uint64) << np.uint64(32)) | \
        np.asarray(lo).astype(np.uint64)
    want = np.asarray([ref_interval_to_index(m, s, x, y) for x, y, s in pts],
                      np.uint64)
    assert (got == want).all(), (got[:8], want[:8])


def test_samples_match_u64_reference_bitwise():
    res = (16, 16)
    m = log2_resolution(res)
    spp = 16
    pts = [(x, y, s) for x in (0, 2, 9) for y in (1, 14) for s in range(spp)]
    px = jnp.asarray([p[0] for p in pts], jnp.int32)
    py = jnp.asarray([p[1] for p in pts], jnp.int32)
    si = jnp.asarray([p[2] for p in pts], jnp.int32)
    hi, lo = sobol_interval_to_index(m, spp, si, px, py)
    for dim in (0, 1, 2, 3, 7):
        got = np.asarray(sobol_sample_u32(hi, lo, dim))
        want = []
        for x, y, s in pts:
            idx = ref_interval_to_index(m, s, x, y)
            m32 = tables()[0]
            v = np.uint32(0)
            a = int(idx)
            i = 0
            while a:
                if a & 1:
                    v ^= m32[dim][i]
                a >>= 1
                i += 1
            want.append(v)
        assert (got == np.asarray(want, np.uint32)).all(), dim


def test_film_dims_remap_into_pixel():
    """dims 0/1 land in [0,1) relative to the pixel (sobol.rs:84-92)."""
    res = (16, 16)
    spp = 16
    n = 16 * 16 * spp
    xs = np.arange(n) % 16
    ys = (np.arange(n) // 16) % 16
    ss = np.arange(n) // 256
    u0 = np.asarray(sobol_dim(res, spp, jnp.asarray(xs, jnp.int32),
                              jnp.asarray(ys, jnp.int32),
                              jnp.asarray(ss, jnp.int32), 0))
    u1 = np.asarray(sobol_dim(res, spp, jnp.asarray(xs, jnp.int32),
                              jnp.asarray(ys, jnp.int32),
                              jnp.asarray(ss, jnp.int32), 1))
    assert (u0 >= 0).all() and (u0 < 1).all()
    assert (u1 >= 0).all() and (u1 < 1).all()
    # global stratification: the spp samples of one pixel are distinct
    p0 = u0[(xs == 3) & (ys == 7)]
    assert len(np.unique(p0)) == spp


def test_sampler_dispatch_uses_matched_path():
    spec = SamplerSpec("sobol", 16, 0, resolution=(16, 16))
    px = jnp.asarray([2, 5], jnp.int32)
    py = jnp.asarray([3, 8], jnp.int32)
    si = jnp.asarray([0, 7], jnp.int32)
    got = np.asarray(sample_dim(spec, px, py, si, 2))
    m = log2_resolution((16, 16))
    want = [ref_sobol_sample(ref_interval_to_index(m, int(s), int(x), int(y)), 2)
            for x, y, s in zip([2, 5], [3, 8], [0, 7])]
    assert np.allclose(got, np.asarray(want), atol=0), (got, want)


def test_maxmin_first_slot_uses_c_matrix():
    from pbrt_tpu.samplers.sobol_ref import maxmin_first_slot
    _, _, _, cmm = tables()
    spp = 16
    lg = 4
    idx = jnp.arange(spp, dtype=jnp.uint32)
    v = np.asarray(maxmin_first_slot(spp, idx, 1))
    want = []
    for a in range(spp):
        acc = np.uint32(0)
        i = 0
        aa = a
        while aa:
            if aa & 1:
                acc ^= cmm[lg][i]
            aa >>= 1
            i += 1
        want.append(min(np.float32(acc) * np.float32(2.0 ** -32), ONE_MINUS_EPS))
    assert np.allclose(v, np.asarray(want), atol=0)
    u = np.asarray(maxmin_first_slot(spp, idx, 0))
    assert np.allclose(u, np.arange(spp) / spp, atol=1e-7)
