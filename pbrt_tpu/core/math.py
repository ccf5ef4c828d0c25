"""Vector/geometry math over batched jnp arrays.

TPU-first replacement for the reference's generic Point/Vector/Normal types
(reference: core/src/geometry/{vector3,point3,normal}.rs). Instead of scalar
structs with operator overloads, every quantity is a jnp array whose LAST axis
is the component axis (3 for vectors/points/normals, 2 for 2D). All functions
broadcast over leading axes, so a "vector" here is really a wavefront of
vectors [N, 3] and every op is an 8x128-lane VPU op under XLA.

Conventions:
  - float32 everywhere on the radiance path (reference uses Float=f32,
    core/src/pbrt/common.rs:13).
  - dot/cross/normalize etc. keep the trailing axis; reductions use keepdims
    only where stated.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Float = jnp.float32
INF = jnp.float32(jnp.inf)
PI = 3.14159265358979323846
INV_PI = 1.0 / PI
INV_2PI = 1.0 / (2.0 * PI)
INV_4PI = 1.0 / (4.0 * PI)
PI_OVER_2 = PI / 2.0
PI_OVER_4 = PI / 4.0
SQRT_2 = 1.41421356237309504880
# Largest float strictly < 1.0 (reference: core/src/rng.rs ONE_MINUS_EPSILON)
ONE_MINUS_EPSILON = jnp.float32(1.0 - 2.0 ** -24)
# Conservative intersection epsilon; the reference carries per-hit EFloat
# error bounds (core/src/efloat.rs:8) — on TPU we instead use scaled offsets
# at ray-spawn time (see `offset_ray_origin`).
MACHINE_EPSILON = jnp.float32(1.1920929e-07) * 0.5
SHADOW_EPSILON = 1e-4


def gamma_bound(n):
    """pbrt's gamma(n) = n*eps/(1-n*eps) rounding-error bound."""
    ne = n * MACHINE_EPSILON
    return ne / (1.0 - ne)


# ---------------------------------------------------------------------------
# construction helpers
# ---------------------------------------------------------------------------

def vec3(x, y, z):
    """Stack components into a [..., 3] array (broadcasting)."""
    x, y, z = jnp.broadcast_arrays(
        jnp.asarray(x, Float), jnp.asarray(y, Float), jnp.asarray(z, Float))
    return jnp.stack([x, y, z], axis=-1)


def vec2(x, y):
    x, y = jnp.broadcast_arrays(jnp.asarray(x, Float), jnp.asarray(y, Float))
    return jnp.stack([x, y], axis=-1)


def splat3(s):
    return jnp.broadcast_to(jnp.asarray(s, Float)[..., None], jnp.shape(s) + (3,))


# ---------------------------------------------------------------------------
# elementwise / reduction ops
# ---------------------------------------------------------------------------

def dot(a, b):
    return jnp.sum(a * b, axis=-1)


def absdot(a, b):
    return jnp.abs(dot(a, b))


def cross(a, b):
    # f64 promotion is NOT used (reference promotes to f64 in cross,
    # core/src/geometry/vector3.rs — on TPU f64 is emulated and slow; the
    # difference-of-products trick below recovers most of the accuracy).
    ax, ay, az = a[..., 0], a[..., 1], a[..., 2]
    bx, by, bz = b[..., 0], b[..., 1], b[..., 2]
    return vec3(
        diff_of_products(ay, bz, az, by),
        diff_of_products(az, bx, ax, bz),
        diff_of_products(ax, by, ay, bx),
    )


def diff_of_products(a, b, c, d):
    """a*b - c*d with an FMA-style error correction (Kahan)."""
    cd = c * d
    err = jnp.float32(-c) * d + cd  # rounding error of c*d (fma if available)
    return (a * b - cd) + err


def length_squared(v):
    return jnp.sum(v * v, axis=-1)


def length(v):
    return jnp.sqrt(length_squared(v))


def normalize(v):
    # floor at 1e-20 (not 1e-38): the rsqrt VJP carries rsqrt(x)^3, which
    # overflows f32 below ~2e-26 and turns masked-lane cotangents into
    # 0*inf=NaN that poison every gradient upstream (tests/test_diff.py)
    return v * jax.lax.rsqrt(jnp.maximum(length_squared(v), 1e-20))[..., None]


def distance(a, b):
    return length(a - b)


def distance_squared(a, b):
    return length_squared(a - b)


def lerp(t, a, b):
    return (1.0 - t) * a + t * b


def face_forward(n, v):
    """Flip n to lie in the hemisphere of v."""
    return jnp.where((dot(n, v) < 0.0)[..., None], -n, n)


def max_component(v):
    return jnp.max(v, axis=-1)


def min_component(v):
    return jnp.min(v, axis=-1)


def max_dimension(v):
    return jnp.argmax(v, axis=-1)


def permute(v, x, y, z):
    return jnp.stack([v[..., x], v[..., y], v[..., z]], axis=-1)


def coordinate_system(v1):
    """Build an orthonormal frame around unit v1 (branchless Duff et al.).

    Replaces the reference's branchy coordinate_system
    (core/src/geometry/coordinate_system.rs) with the copysign construction —
    no data-dependent control flow, perfect for the VPU.
    Returns (v2, v3) with v1 x v2 = v3.
    """
    x, y, z = v1[..., 0], v1[..., 1], v1[..., 2]
    sign = jnp.where(z >= 0.0, 1.0, -1.0).astype(Float)
    a = -1.0 / (sign + z)
    b = x * y * a
    v2 = vec3(1.0 + sign * x * x * a, sign * b, -sign * x)
    v3 = vec3(b, sign + y * y * a, -y)
    return v2, v3


def spherical_direction(sin_theta, cos_theta, phi):
    return vec3(sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), cos_theta)


def spherical_direction_in(sin_theta, cos_theta, phi, x, y, z):
    return (sin_theta * jnp.cos(phi))[..., None] * x \
        + (sin_theta * jnp.sin(phi))[..., None] * y \
        + cos_theta[..., None] * z


def spherical_theta(v):
    return jnp.arccos(jnp.clip(v[..., 2], -1.0, 1.0))


def spherical_phi(v):
    p = jnp.arctan2(v[..., 1], v[..., 0])
    return jnp.where(p < 0.0, p + 2.0 * PI, p)


# ---------------------------------------------------------------------------
# scalar utilities (mirroring reference core/src/pbrt/common.rs)
# ---------------------------------------------------------------------------

def clamp(x, lo, hi):
    return jnp.clip(x, lo, hi)


def quadratic(a, b, c):
    """Solve a t^2 + b t + c = 0 robustly (vectorized, always-defined).

    Returns (has_solution, t0, t1) with t0 <= t1. Where there is no real
    solution the t values are garbage but has_solution is False — callers
    mask. Mirrors the numerically stable form of the reference
    (core/src/efloat.rs quadratic), minus the EFloat interval tracking.
    """
    # discriminant in f32 with difference-of-products for accuracy
    discrim = diff_of_products(b, b, 4.0 * a, c)
    has = discrim >= 0.0
    root = jnp.sqrt(jnp.maximum(discrim, 0.0))
    q = jnp.where(b < 0.0, -0.5 * (b - root), -0.5 * (b + root))
    t0 = q / jnp.where(a == 0.0, 1.0, a)
    t1 = c / jnp.where(q == 0.0, 1.0, q)
    lo = jnp.minimum(t0, t1)
    hi = jnp.maximum(t0, t1)
    # degenerate linear case a == 0
    lin_t = -c / jnp.where(b == 0.0, 1.0, b)
    lin = a == 0.0
    lo = jnp.where(lin, lin_t, lo)
    hi = jnp.where(lin, lin_t, hi)
    has = jnp.where(lin, b != 0.0, has)
    return has, lo, hi


def erf_inv(x):
    """Inverse error function (Giles' polynomial), used by MLT mutations."""
    x = jnp.clip(x, -0.99999, 0.99999)
    w = -jnp.log((1.0 - x) * (1.0 + x))
    w_small = w - 2.5
    p_small = 2.81022636e-08
    for c in [3.43273939e-07, -3.5233877e-06, -4.39150654e-06, 0.00021858087,
              -0.00125372503, -0.00417768164, 0.246640727, 1.50140941]:
        p_small = p_small * w_small + c
    w_big = jnp.sqrt(w) - 3.0
    p_big = -0.000200214257
    for c in [0.000100950558, 0.00134934322, -0.00367342844, 0.00573950773,
              -0.0076224613, 0.00943887047, 1.00167406, 2.83297682]:
        p_big = p_big * w_big + c
    return jnp.where(w < 5.0, p_small, p_big) * x


def next_float_up(x):
    """Next representable float toward +inf (for robust ray offsets)."""
    xi = jnp.asarray(x, jnp.float32).view(jnp.int32)
    xi = jnp.where(jnp.asarray(x) >= 0.0, xi + 1, xi - 1)
    out = xi.view(jnp.float32)
    return jnp.where(x == jnp.inf, x, jnp.where(x == -0.0, jnp.float32(1e-45), out))


def next_float_down(x):
    xi = jnp.asarray(x, jnp.float32).view(jnp.int32)
    xi = jnp.where(jnp.asarray(x) > 0.0, xi - 1, xi + 1)
    out = xi.view(jnp.float32)
    return jnp.where(x == -jnp.inf, x, jnp.where(x == 0.0, jnp.float32(-1e-45), out))


def offset_ray_origin(p, p_err, n, w):
    """Offset a spawned ray origin along the normal outside the error bounds.

    Reference: core/src/interaction/mod.rs spawn_ray / offset_ray_origin.
    p_err is a conservative [...,3] error bound on the hit point.
    """
    d = dot(jnp.abs(n), p_err)
    offset = d[..., None] * n
    offset = jnp.where((dot(w, n) < 0.0)[..., None], -offset, offset)
    po = p + offset
    po = jnp.where(offset > 0.0, next_float_up(po), jnp.where(offset < 0.0, next_float_down(po), po))
    return po


# Tables at or below this row count are gathered by a one-hot MXU matmul
# instead of an XLA gather. In a large render graph XLA's TPU gather
# lowering degrades to ~700-950us per 64K-lane gather from even a 4-row
# table (r4 profile: 46 of 57 ms of a depth-4 trace were such gathers);
# the one-hot matmul is a dense [N,T]x[T,K] contraction on the MXU.
# Cost scales with N*T*K, so only small tables qualify; wide row gathers
# from big tables (packed attribute rows) take XLA's fast ~125us path.
ONEHOT_GATHER_MAX = 1024


def _gather_rows_onehot(flat, idx):
    """[T,K] rows at [M] int indices via one-hot matmul.

    precision=HIGHEST makes the f32 MXU path exact (bf16x6 recovers the
    full f32 product; the one-hot side is exactly representable and each
    output row has a single nonzero term) — measured max|err| = 0 vs a
    real gather. DEFAULT would truncate table values to bf16."""
    T = flat.shape[0]
    idx = jnp.clip(idx, 0, T - 1)
    oh = (idx[:, None] == jnp.arange(T, dtype=jnp.int32)[None, :]
          ).astype(jnp.float32)
    dt = flat.dtype
    if dt == jnp.float32:
        return jnp.dot(oh, flat, precision=jax.lax.Precision.HIGHEST,
                       preferred_element_type=jnp.float32)
    v = jnp.dot(oh, flat.astype(jnp.float32),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)
    if dt == jnp.bool_:
        return v > 0.5
    # round, don't truncate: an epsilon-low product must not off-by-one an id
    return jnp.round(v).astype(dt)


def gather_rows(tab, idx):
    """tab[idx] for a row table of any inner rank.

    Small tables (rows <= ONEHOT_GATHER_MAX) go through the one-hot matmul
    (see above). Larger tables use a flat 2-D row gather: XLA on TPU lowers
    gathers from >2-D tables ~10-25x slower than row gathers from 2-D
    tables; flattening the inner dims first and reshaping after is
    bit-identical and hits the fast path.
    """
    inner = tab.shape[1:]
    flat = tab.reshape(tab.shape[0], -1) if len(inner) != 1 else tab
    if flat.ndim == 1:
        flat = flat[:, None]
    if flat.shape[0] <= ONEHOT_GATHER_MAX:
        idx_flat = idx.reshape(-1)
        out = _gather_rows_onehot(flat, idx_flat)
        return out.reshape(idx.shape + inner)
    return flat[idx.reshape(-1)].reshape(idx.shape + inner)
