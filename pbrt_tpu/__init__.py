"""pbrt_tpu — a TPU-native, differentiable physically based renderer.

A from-scratch JAX/XLA/Pallas re-design of the pbrt-v3 capability set
(reference: hackmad/pbrt-v3-rs). NOT a port: the reference's trait-object
plugin architecture becomes flattened structure-of-arrays pytrees; its
tile-based CPU thread pools become SPMD wavefront sharding over a
`jax.sharding.Mesh`; its per-ray recursion becomes a bounce-stepped
wavefront loop under `jit`.

Layer map (mirrors SURVEY.md sect. 1, rebuilt TPU-first):
  core/        math, transforms, spectrum, sampling distributions (L1/L2)
  samplers/    counter-based low-discrepancy sample generators (L3)
  scene/       .pbrt parser + scene compiler -> device arrays (L5)
  shapes/      host-side shape tessellation/compile + device intersect (L3)
  accel/       BVH build (host) + flattened traversal (device) (L3)
  materials/ textures/ lights/ cameras/ filters/ media/   plugin tables (L3)
  film/        filter-weighted accumulation + image output (L2)
  integrators/ wavefront light-transport loops (L4) — the "models"
  parallel/    device-mesh sharding of the wavefront (SPMD)
  diff/        path-replay differentiable rendering
  io/          PNG/PFM/EXR image IO
  utils/       options, stats, progress
"""

__version__ = "0.1.0"

from pbrt_tpu.utils.options import Options, OPTIONS  # noqa: F401
