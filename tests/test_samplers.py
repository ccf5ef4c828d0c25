"""Sampler family tests: range, stratification, low-discrepancy properties."""
import numpy as np
import jax.numpy as jnp
import pytest

from pbrt_tpu.samplers import SamplerSpec, sample_dim, sample_2d, make_sampler
from pbrt_tpu.samplers import lds
from pbrt_tpu.samplers import hashing as H


import functools
import jax


@functools.lru_cache(maxsize=None)
def _jitted(spec, dim):
    return jax.jit(lambda px, py, s: sample_dim(spec, px, py, s, dim))


def eval_all(spec, spp, dim, px=3, py=5):
    s = jnp.arange(spp, dtype=jnp.int32)
    pxs = jnp.full((spp,), px, jnp.int32)
    pys = jnp.full((spp,), py, jnp.int32)
    return np.asarray(_jitted(spec, dim)(pxs, pys, s))


ALL_KINDS = ["random", "stratified", "halton", "sobol", "02sequence", "maxmindist"]


@pytest.mark.parametrize("kind", ALL_KINDS)
def test_range_and_determinism(kind):
    spec = SamplerSpec(kind, spp=16, xsamples=4, ysamples=4, resolution=(64, 64))
    for dim in [0, 1, 2, 5, 11]:
        v1 = eval_all(spec, spec.rounded_spp(), dim)
        v2 = eval_all(spec, spec.rounded_spp(), dim)
        assert np.all(v1 >= 0.0) and np.all(v1 < 1.0), (kind, dim)
        np.testing.assert_array_equal(v1, v2)


@pytest.mark.parametrize("kind", ["stratified", "halton", "sobol", "02sequence"])
def test_1d_stratification(kind):
    """spp samples of any dim should be close to one-per-stratum."""
    spec = SamplerSpec(kind, spp=16, xsamples=4, ysamples=4, resolution=(64, 64))
    spp = spec.rounded_spp()
    # halton dims >= 2 use odd prime bases: a 16-sample prefix cannot be
    # perfectly binary-stratified (true of the reference too) — check dim 0
    # only there
    dims = [0] if kind == "halton" else [0, 2, 6]
    for dim in dims:
        v = eval_all(spec, spp, dim)
        hist = np.histogram(v, bins=spp, range=(0, 1))[0]
        # stratified/sobol families: perfectly or near-perfectly stratified
        assert hist.max() <= 2 and (hist > 0).sum() >= spp - 2, (kind, dim, hist)


@pytest.mark.parametrize("kind", ALL_KINDS)
def test_mean_converges(kind):
    spec = SamplerSpec(kind, spp=256, xsamples=16, ysamples=16, resolution=(64, 64))
    spp = spec.rounded_spp()
    v = eval_all(spec, spp, 3)
    assert abs(v.mean() - 0.5) < 0.05, (kind, v.mean())


def test_pixel_decorrelation():
    """Different pixels must get different sequences."""
    for kind in ALL_KINDS:
        spec = SamplerSpec(kind, spp=16, resolution=(64, 64))
        a = eval_all(spec, 16, 2, px=1, py=1)
        b = eval_all(spec, 16, 2, px=2, py=1)
        assert not np.allclose(a, b), kind


def test_halton_first_dims_unscrambled():
    """Global Halton: pooling all pixels' dim-0 radical inverses must cover
    [0,1) like base-2 van der Corput."""
    spec = SamplerSpec("halton", spp=4, resolution=(16, 16))
    xs, ys = np.meshgrid(np.arange(16), np.arange(16))
    px = jnp.asarray(xs.ravel(), jnp.int32)
    py = jnp.asarray(ys.ravel(), jnp.int32)
    v0 = np.asarray(sample_dim(spec, px, py, jnp.zeros_like(px), 0))
    # each pixel's dim-0 sample lies in [0,1); distinct pixels well spread
    assert v0.min() >= 0 and v0.max() < 1
    hist = np.histogram(v0, bins=16, range=(0, 1))[0]
    assert (hist > 0).all()


def test_radical_inverse_values():
    # base 2: 1 -> 0.5, 2 -> 0.25, 3 -> 0.75
    idx = jnp.asarray([0, 1, 2, 3, 4], jnp.uint32)
    v = np.asarray(lds.radical_inverse(2, idx))
    np.testing.assert_allclose(v, [0.0, 0.5, 0.25, 0.75, 0.125], atol=1e-7)
    v3 = np.asarray(lds.radical_inverse(3, idx))
    np.testing.assert_allclose(v3, [0.0, 1 / 3, 2 / 3, 1 / 9, 4 / 9], atol=1e-6)


def test_inverse_radical_inverse():
    idx = jnp.arange(27, dtype=jnp.uint32)
    # digit-reverse twice with enough digits is identity
    rev = lds.inverse_radical_inverse(3, idx, 3)
    back = np.asarray(lds.inverse_radical_inverse(3, rev, 3))
    np.testing.assert_array_equal(back, np.arange(27))


def test_sobol_matrices_valid():
    M = lds.sobol_matrices()
    # column k must have top bit pattern: v_k = m_k << (31-k), m_k odd
    for d in range(min(16, M.shape[0])):
        for k in range(32):
            mk = int(M[d, k]) >> (31 - k)
            assert mk & 1 == 1, (d, k)  # odd direction numbers
    # dim 0 + dim 1 form a (0,2)-sequence: elementary-interval check at 16
    idx = jnp.arange(16, dtype=jnp.uint32)
    x = np.asarray(lds.sobol_sample(idx, 0))
    y = np.asarray(lds.sobol_sample(idx, 1))
    # 4x4 grid: exactly one sample per cell
    cells = set((int(xi * 4), int(yi * 4)) for xi, yi in zip(x, y))
    assert len(cells) == 16


def test_sobol_2d_projection_lowdisc():
    spec = SamplerSpec("02sequence", spp=64, resolution=(8, 8))
    s = jnp.arange(64, dtype=jnp.int32)
    px = jnp.zeros_like(s); py = jnp.zeros_like(s)
    uv = np.asarray(sample_2d(spec, px, py, s, 6))
    # 8x8 elementary intervals each get exactly one point
    cells = set((int(u * 8), int(v * 8)) for u, v in uv)
    assert len(cells) == 64


def test_cmj_permute_is_permutation():
    for l in [5, 16, 100]:
        i = jnp.arange(l, dtype=jnp.uint32)
        p = jnp.full((l,), 12345, jnp.uint32)
        out = np.asarray(H.cmj_permute(i, l, p))
        assert sorted(out.tolist()) == list(range(l)), (l, out)


def test_make_sampler_from_params():
    s = make_sampler("stratified", {"xsamples": [8], "ysamples": [8]}, (128, 128))
    assert s.rounded_spp() == 64
    s = make_sampler("sobol", {"pixelsamples": [100]}, (128, 128))
    assert s.rounded_spp() == 128
