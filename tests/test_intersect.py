"""BVH correctness: traversal == brute force on random rays."""
import numpy as np
import jax
import jax.numpy as jnp

from pbrt_tpu.shapes.triangle import make_knot_mesh, make_sphere_mesh
from pbrt_tpu.accel.bvh import build_bvh
from pbrt_tpu.accel.traverse import intersect_bvh, intersect_bruteforce


def _mesh_arrays(mesh):
    tri = mesh.p[mesh.indices]
    return (jnp.asarray(tri[:, 0]), jnp.asarray(tri[:, 1]), jnp.asarray(tri[:, 2]))


def _random_rays(n, rng, spread=4.0):
    o = jnp.asarray(rng.uniform(-spread, spread, (n, 3)).astype(np.float32))
    d = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    return o, d


def test_bvh_matches_bruteforce_knot():
    mesh = make_knot_mesh(n_u=48, n_v=12)
    p0, p1, p2 = _mesh_arrays(mesh)
    lo = np.asarray(jnp.minimum(jnp.minimum(p0, p1), p2))
    hi = np.asarray(jnp.maximum(jnp.maximum(p0, p1), p2))
    bvh = build_bvh(lo, hi)
    rng = np.random.default_rng(1)
    o, d = _random_rays(512, rng)
    tmax = jnp.full((512,), jnp.inf)
    ref = jax.jit(lambda o, d: intersect_bruteforce(p0, p1, p2, o, d, tmax))(o, d)
    got = jax.jit(lambda o, d: intersect_bvh(bvh, p0, p1, p2, o, d, tmax))(o, d)
    hit_ref = np.asarray(ref.tri) >= 0
    hit_got = np.asarray(got.tri) >= 0
    np.testing.assert_array_equal(hit_got, hit_ref)
    # same t (same triangle may differ on exact shared edges; compare t)
    np.testing.assert_allclose(np.asarray(got.t)[hit_ref],
                               np.asarray(ref.t)[hit_ref], rtol=1e-4)
    assert hit_ref.sum() > 50  # rays actually hit things


def test_bvh_any_hit():
    mesh = make_sphere_mesh(24, 48)
    p0, p1, p2 = _mesh_arrays(mesh)
    lo = np.asarray(jnp.minimum(jnp.minimum(p0, p1), p2))
    hi = np.asarray(jnp.maximum(jnp.maximum(p0, p1), p2))
    bvh = build_bvh(lo, hi)
    rng = np.random.default_rng(2)
    o, d = _random_rays(256, rng, spread=3.0)
    tmax = jnp.full((256,), jnp.inf)
    closest = intersect_bvh(bvh, p0, p1, p2, o, d, tmax)
    any_hit = intersect_bvh(bvh, p0, p1, p2, o, d, tmax, any_hit=True)
    np.testing.assert_array_equal(np.asarray(any_hit.tri) >= 0,
                                  np.asarray(closest.tri) >= 0)


def test_bvh_respects_tmax():
    mesh = make_sphere_mesh(16, 32)
    p0, p1, p2 = _mesh_arrays(mesh)
    lo = np.asarray(jnp.minimum(jnp.minimum(p0, p1), p2))
    hi = np.asarray(jnp.maximum(jnp.maximum(p0, p1), p2))
    bvh = build_bvh(lo, hi)
    # ray toward sphere from z=3: hits at t~2; with tmax=1 must miss
    o = jnp.asarray([[0.0, 0, 3.0]] * 4, jnp.float32)
    d = jnp.asarray([[0.0, 0, -1.0]] * 4, jnp.float32)
    hit = intersect_bvh(bvh, p0, p1, p2, o, d, jnp.full((4,), 10.0))
    miss = intersect_bvh(bvh, p0, p1, p2, o, d, jnp.full((4,), 1.0))
    assert np.all(np.asarray(hit.tri) >= 0)
    assert np.all(np.asarray(miss.tri) < 0)
    np.testing.assert_allclose(np.asarray(hit.t), 2.0, atol=2e-2)
