"""Accelerators: native BVH builders + kd-tree vs brute force ground truth.

Reference test strategy analog: the reference has no accelerator tests; we
add exact-agreement checks (SURVEY sect. 4 'where we must do better').
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pbrt_tpu.accel.bvh import build_bvh, _build_bvh_native
from pbrt_tpu.accel.kdtree import build_kdtree, intersect_kdtree
from pbrt_tpu.accel.traverse import intersect_bvh, intersect_bruteforce


@pytest.fixture(scope="module")
def tri_soup():
    rng = np.random.default_rng(7)
    T = 800
    c = rng.uniform(-1, 1, (T, 3)).astype(np.float32)
    p0 = c
    p1 = c + rng.uniform(-0.08, 0.08, (T, 3)).astype(np.float32)
    p2 = c + rng.uniform(-0.08, 0.08, (T, 3)).astype(np.float32)
    lo = np.minimum(np.minimum(p0, p1), p2)
    hi = np.maximum(np.maximum(p0, p1), p2)
    N = 512
    o = rng.uniform(-3, 3, (N, 3)).astype(np.float32)
    d = rng.normal(size=(N, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    tp = tuple(map(jnp.asarray, (p0, p1, p2)))
    tm = jnp.full((N,), 1e20, jnp.float32)
    ref = intersect_bruteforce(*tp, jnp.asarray(o), jnp.asarray(d), tm)
    return lo, hi, tp, jnp.asarray(o), jnp.asarray(d), tm, ref


@pytest.mark.parametrize("sm", ["sah", "hlbvh", "middle", "equal"])
def test_bvh_split_methods_match_bruteforce(tri_soup, sm):
    lo, hi, tp, o, d, tm, ref = tri_soup
    bvh = build_bvh(lo, hi, split_method=sm)
    # structural invariants
    cnts = np.asarray(bvh.prim_count)
    offs = np.asarray(bvh.prim_offset)
    leaf = cnts > 0
    assert cnts[leaf].sum() == lo.shape[0]
    seen = np.zeros(lo.shape[0], bool)
    order = np.asarray(bvh.prim_order)
    for of, ct in zip(offs[leaf], cnts[leaf]):
        seen[order[of:of + ct]] = True
    assert seen.all()
    th = intersect_bvh(bvh, *tp, o, d, tm)
    assert np.array_equal(np.asarray(th.tri), np.asarray(ref.tri))


def test_kdtree_matches_bruteforce(tri_soup):
    lo, hi, tp, o, d, tm, ref = tri_soup
    kd = build_kdtree(lo, hi)
    assert kd is not None, "native kd builder unavailable"
    th = intersect_kdtree(kd, *tp, o, d, tm)
    assert np.array_equal(np.asarray(th.tri), np.asarray(ref.tri))
    tha = intersect_kdtree(kd, *tp, o, d, tm, any_hit=True)
    assert np.array_equal(np.asarray(tha.tri) >= 0, np.asarray(ref.tri) >= 0)


def test_native_matches_numpy_fallback(tri_soup):
    from pbrt_tpu.accel.bvh import _to_device
    lo, hi, tp, o, d, tm, ref = tri_soup
    native = _build_bvh_native(lo, hi, 4, "hlbvh")  # HostBVH (numpy)
    assert native is not None
    th = intersect_bvh(_to_device(native), *tp, o, d, tm)
    assert np.array_equal(np.asarray(th.tri), np.asarray(ref.tri))
