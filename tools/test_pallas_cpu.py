"""Quick CPU interpret-mode parity check of the Pallas traversal kernel."""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from pbrt_tpu.shapes.triangle import make_knot_mesh
from pbrt_tpu.accel.bvh import build_bvh
from pbrt_tpu.accel.traverse import intersect_bvh
from pbrt_tpu.accel.pallas_traverse import pack_pallas_bvh, intersect_bvh_pallas

mesh = make_knot_mesh(n_u=32, n_v=8, scale=0.45)
p = np.asarray(mesh.p)
idx = np.asarray(mesh.indices).reshape(-1, 3)
p0, p1, p2 = p[idx[:, 0]], p[idx[:, 1]], p[idx[:, 2]]
lo = np.minimum(np.minimum(p0, p1), p2)
hi = np.maximum(np.maximum(p0, p1), p2)
bvh = build_bvh(lo, hi)
print(f"tris={len(p0)} nodes={bvh.n_nodes}")

tp0, tp1, tp2 = jnp.asarray(p0), jnp.asarray(p1), jnp.asarray(p2)
pb, _ = pack_pallas_bvh(bvh, tp0, tp1, tp2)
print("nodes2d", pb.nodes.shape, "tris2d", pb.tris.shape, "meta", pb.meta.shape)

N = 1500  # deliberately not a multiple of 1024
rng = np.random.default_rng(0)
u = rng.random((N, 2)).astype(np.float32)
o = jnp.asarray(np.stack([(u[:, 0] - .5) * 3, (u[:, 1] - .5) * 3,
                          np.full(N, 4.0, np.float32)], -1))
dd = np.stack([(rng.random(N).astype(np.float32) - .5) * 0.4,
               (rng.random(N).astype(np.float32) - .5) * 0.4,
               -np.ones(N, np.float32)], -1)
dd /= np.linalg.norm(dd, axis=1, keepdims=True)
d = jnp.asarray(dd)
t_max = jnp.full((N,), 1e30, jnp.float32)

ref = intersect_bvh(bvh, tp0, tp1, tp2, o, d, t_max)
got = intersect_bvh_pallas(pb, o, d, t_max, interpret=True)

r_tri = np.asarray(ref.tri)
g_tri = np.asarray(got.tri)
r_t = np.asarray(ref.t)
g_t = np.asarray(got.t)
hit_match = (r_tri >= 0) == (g_tri >= 0)
print(f"hits ref={int((r_tri>=0).sum())} pallas={int((g_tri>=0).sum())} "
      f"mask-match={int(hit_match.sum())}/{N}")
both = (r_tri >= 0) & (g_tri >= 0)
dt = np.abs(r_t[both] - g_t[both])
print(f"t maxdiff={dt.max() if both.any() else 0:.2e} "
      f"tri-id match={(r_tri[both]==g_tri[both]).mean()*100:.1f}%")
b1d = (np.abs(np.asarray(ref.b1)[both] - np.asarray(got.b1)[both]).max()
       if both.any() and got.b1 is not None else 0)
print(f"b1 maxdiff={b1d:.2e}")

# any-hit mode
refp = intersect_bvh(bvh, tp0, tp1, tp2, o, d, t_max, any_hit=True)
gotp = intersect_bvh_pallas(pb, o, d, t_max, any_hit=True, interpret=True)
occ_r = np.asarray(refp.tri) >= 0
occ_g = np.asarray(gotp.tri) >= 0
print(f"any_hit match={int((occ_r==occ_g).sum())}/{N}")
assert (occ_r == occ_g).all()
assert hit_match.all()
assert dt.max() < 1e-3
print("PASS")
