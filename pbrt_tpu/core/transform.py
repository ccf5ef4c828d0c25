"""4x4 transforms and animated transforms.

Reference: core/src/geometry/transform.rs and animated_transform.rs. The
reference stores (m, m_inv) pairs and interns them in a TransformCache; here a
Transform is just a pair of [4,4] arrays (host numpy during scene compile,
jnp on device). Application functions broadcast over wavefronts [..., 3].
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from pbrt_tpu.core.math import vec3, normalize, cross, dot


class Transform:
    """Immutable (matrix, inverse) pair. Host-side scene-compile object."""

    __slots__ = ("m", "m_inv")

    def __init__(self, m=None, m_inv=None):
        if m is None:
            m = np.eye(4, dtype=np.float32)
        m = np.asarray(m, np.float32).reshape(4, 4)
        if m_inv is None:
            m_inv = np.linalg.inv(m.astype(np.float64)).astype(np.float32)
        else:
            m_inv = np.asarray(m_inv, np.float32).reshape(4, 4)
        self.m = m
        self.m_inv = m_inv

    # -- composition ----------------------------------------------------
    def __mul__(self, other: "Transform") -> "Transform":
        return Transform(self.m @ other.m, other.m_inv @ self.m_inv)

    def inverse(self) -> "Transform":
        return Transform(self.m_inv, self.m)

    def is_identity(self) -> bool:
        return np.allclose(self.m, np.eye(4))

    def swaps_handedness(self) -> bool:
        return float(np.linalg.det(self.m[:3, :3])) < 0.0

    # -- application (works on numpy or jnp, broadcasts) ----------------
    def point(self, p):
        return apply_point(self.m, p)

    def vector(self, v):
        return apply_vector(self.m, v)

    def normal(self, n):
        return apply_normal(self.m_inv, n)

    def __repr__(self):
        return f"Transform({self.m.tolist()})"

    def key(self):
        """Hashable dedup key (replaces the reference TransformCache arena,
        api/src/transform_cache.rs:47 — we dedup by value)."""
        return self.m.tobytes()


# ---------------------------------------------------------------------------
# matrix application, usable device-side with [4,4] jnp matrices
# ---------------------------------------------------------------------------

def apply_point(m, p):
    xp = jnp if isinstance(p, jnp.ndarray) or isinstance(m, jnp.ndarray) else np
    p = xp.asarray(p, xp.float32)
    out = p @ xp.asarray(m, xp.float32)[:3, :3].T + xp.asarray(m, xp.float32)[:3, 3]
    w = p @ xp.asarray(m, xp.float32)[3, :3].T + m[3, 3]
    return xp.where(w[..., None] == 1.0, out, out / w[..., None])


def apply_vector(m, v):
    xp = jnp if isinstance(v, jnp.ndarray) or isinstance(m, jnp.ndarray) else np
    v = xp.asarray(v, xp.float32)
    return v @ xp.asarray(m, xp.float32)[:3, :3].T


def apply_normal(m_inv, n):
    xp = jnp if isinstance(n, jnp.ndarray) or isinstance(m_inv, jnp.ndarray) else np
    n = xp.asarray(n, xp.float32)
    return n @ xp.asarray(m_inv, xp.float32)[:3, :3]


# ---------------------------------------------------------------------------
# constructors (reference transform.rs: translate/scale/rotate/look_at/
# perspective/orthographic)
# ---------------------------------------------------------------------------

def translate(d):
    d = np.asarray(d, np.float32)
    m = np.eye(4, dtype=np.float32)
    m[:3, 3] = d
    mi = np.eye(4, dtype=np.float32)
    mi[:3, 3] = -d
    return Transform(m, mi)


def scale(s):
    s = np.asarray(s, np.float32)
    if s.ndim == 0:
        s = np.array([s, s, s], np.float32)
    m = np.diag(np.append(s, 1.0)).astype(np.float32)
    mi = np.diag(np.append(1.0 / s, 1.0)).astype(np.float32)
    return Transform(m, mi)


def rotate(angle_deg, axis):
    a = np.asarray(axis, np.float64)
    a = a / np.linalg.norm(a)
    s = np.sin(np.radians(angle_deg))
    c = np.cos(np.radians(angle_deg))
    m = np.eye(4)
    for i in range(3):
        for j in range(3):
            m[i, j] = a[i] * a[j] * (1 - c) + (c if i == j else 0.0)
    m[0, 1] -= a[2] * s; m[0, 2] += a[1] * s
    m[1, 0] += a[2] * s; m[1, 2] -= a[0] * s
    m[2, 0] -= a[1] * s; m[2, 1] += a[0] * s
    return Transform(m.astype(np.float32), m.T.astype(np.float32))


def rotate_x(deg):
    return rotate(deg, [1, 0, 0])


def rotate_y(deg):
    return rotate(deg, [0, 1, 0])


def rotate_z(deg):
    return rotate(deg, [0, 0, 1])


def look_at(eye, look, up):
    """camera-to-world transform (reference transform.rs:191)."""
    eye = np.asarray(eye, np.float64)
    look = np.asarray(look, np.float64)
    up = np.asarray(up, np.float64)
    d = look - eye
    d = d / np.linalg.norm(d)
    right = np.cross(up / np.linalg.norm(up), d)
    rn = np.linalg.norm(right)
    if rn < 1e-10:
        # up parallel to viewing direction: pick arbitrary right
        right = np.cross(np.array([0.0, 1.0, 0.0]) if abs(d[1]) < 0.9 else np.array([1.0, 0.0, 0.0]), d)
        rn = np.linalg.norm(right)
    right /= rn
    new_up = np.cross(d, right)
    c2w = np.eye(4)
    c2w[:3, 0] = right
    c2w[:3, 1] = new_up
    c2w[:3, 2] = d
    c2w[:3, 3] = eye
    return Transform(c2w.astype(np.float32))


def perspective(fov_deg, n, f):
    """Perspective projection camera->screen (reference transform.rs:234)."""
    persp = np.array([
        [1, 0, 0, 0],
        [0, 1, 0, 0],
        [0, 0, f / (f - n), -f * n / (f - n)],
        [0, 0, 1, 0]], np.float64)
    inv_tan = 1.0 / np.tan(np.radians(fov_deg) / 2.0)
    return scale([inv_tan, inv_tan, 1.0]) * Transform(persp.astype(np.float32))


def orthographic(znear, zfar):
    return scale([1.0, 1.0, 1.0 / (zfar - znear)]) * translate([0.0, 0.0, -znear])


# ---------------------------------------------------------------------------
# quaternions + animated transforms (reference animated_transform.rs)
# ---------------------------------------------------------------------------

def matrix_to_quaternion(m):
    """Rotation [3,3] -> quaternion [x,y,z,w] (host, float64)."""
    m = np.asarray(m, np.float64)
    tr = np.trace(m)
    if tr > 0.0:
        s = np.sqrt(tr + 1.0)
        w = s / 2.0
        s = 0.5 / s
        return np.array([(m[2, 1] - m[1, 2]) * s, (m[0, 2] - m[2, 0]) * s,
                         (m[1, 0] - m[0, 1]) * s, w])
    i = int(np.argmax(np.diag(m)))
    j, k = (i + 1) % 3, (i + 2) % 3
    s = np.sqrt(max((m[i, i] - (m[j, j] + m[k, k])) + 1.0, 0.0))
    q = np.zeros(4)
    q[i] = s * 0.5
    if s != 0.0:
        s = 0.5 / s
    q[3] = (m[k, j] - m[j, k]) * s
    q[j] = (m[j, i] + m[i, j]) * s
    q[k] = (m[k, i] + m[i, k]) * s
    return q


def quaternion_to_matrix(q):
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xp = jnp if isinstance(q, jnp.ndarray) else np
    return xp.stack([
        xp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)], -1),
        xp.stack([2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)], -1),
        xp.stack([2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)], -1),
    ], -2)


def decompose(m):
    """M = T R S decomposition by polar iteration (animated_transform.rs)."""
    m = np.asarray(m, np.float64)
    t = m[:3, 3].copy()
    r = m[:3, :3].copy()
    for _ in range(100):
        r_next = 0.5 * (r + np.linalg.inv(r.T))
        if np.max(np.abs(r_next - r)) < 1e-4:
            r = r_next
            break
        r = r_next
    s = np.linalg.inv(r) @ m[:3, :3]
    return t, matrix_to_quaternion(r), s


class AnimatedTransform:
    """Two keyframed transforms with decomposed slerp interpolation.

    Device-side interpolation: `interpolate(t)` returns a [4,4] jnp matrix
    built from lerped T/S and slerped R — pure function, jit/vmap friendly.
    """

    def __init__(self, t0: Transform, time0: float, t1: Transform, time1: float):
        self.start, self.end = t0, t1
        self.time0, self.time1 = float(time0), float(time1)
        self.animated = not np.allclose(t0.m, t1.m)
        self.T0, self.R0, self.S0 = decompose(t0.m)
        self.T1, self.R1, self.S1 = decompose(t1.m)
        if np.dot(self.R0, self.R1) < 0.0:
            self.R1 = -self.R1

    def interpolate(self, time):
        """Return [...,4,4] interpolated matrix for (possibly batched) time."""
        if not self.animated:
            return jnp.asarray(self.start.m)
        dt = jnp.clip((time - self.time0) / max(self.time1 - self.time0, 1e-9), 0.0, 1.0)
        T = (1.0 - dt)[..., None] * jnp.asarray(self.T0, jnp.float32) \
            + dt[..., None] * jnp.asarray(self.T1, jnp.float32)
        # slerp
        q0 = jnp.asarray(self.R0, jnp.float32)
        q1 = jnp.asarray(self.R1, jnp.float32)
        cos_t = jnp.clip(jnp.sum(q0 * q1), -1.0, 1.0)
        theta = jnp.arccos(cos_t)
        sin_t = jnp.sin(theta)
        use_lerp = sin_t < 1e-5
        w0 = jnp.where(use_lerp, 1.0 - dt, jnp.sin((1.0 - dt) * theta) / jnp.where(use_lerp, 1.0, sin_t))
        w1 = jnp.where(use_lerp, dt, jnp.sin(dt * theta) / jnp.where(use_lerp, 1.0, sin_t))
        q = w0[..., None] * q0 + w1[..., None] * q1
        q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
        R = quaternion_to_matrix(q)
        S = (1.0 - dt)[..., None, None] * jnp.asarray(self.S0, jnp.float32) \
            + dt[..., None, None] * jnp.asarray(self.S1, jnp.float32)
        upper = R @ S
        batch = jnp.shape(dt)
        m = jnp.zeros(batch + (4, 4), jnp.float32)
        m = m.at[..., :3, :3].set(upper)
        m = m.at[..., :3, 3].set(T)
        m = m.at[..., 3, 3].set(1.0)
        return m

    def motion_bounds(self, lo, hi):
        """Conservative union of bounds at sampled times (host)."""
        los, his = [], []
        for i in range(8):
            t = self.time0 + (self.time1 - self.time0) * i / 7.0 if self.animated else self.time0
            m = np.asarray(self.interpolate(jnp.float32(t)))
            corners = np.array([[x, y, z] for x in (lo[0], hi[0])
                                for y in (lo[1], hi[1]) for z in (lo[2], hi[2])])
            pts = corners @ m[:3, :3].T + m[:3, 3]
            los.append(pts.min(0)); his.append(pts.max(0))
            if not self.animated:
                break
        return np.min(los, 0), np.max(his, 0)
