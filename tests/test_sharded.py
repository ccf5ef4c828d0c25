"""Multi-device rendering: render_sharded over the 8-device virtual CPU mesh
must produce the same image as the single-device driver (SURVEY sect. 5.8,
BASELINE north star: multi-host scaling path).

The mesh path shards rays (pixels x spp) over the "rays" axis, replicates
the scene, and psum-merges film — the determinism contract says the result
is the same estimator, so images match to float-sum-reorder tolerance.
"""
import numpy as np
import jax

from pbrt_tpu.scene import load_scene_string
from pbrt_tpu.render import render_sampler_integrator
from pbrt_tpu.parallel.mesh import render_sharded, make_ray_mesh

SCENE = """
LookAt 0 5 0  0 0 0  0 0 -1
Camera "perspective" "float fov" 30
Film "image" "integer xresolution" [16] "integer yresolution" [16]
Sampler "02sequence" "integer pixelsamples" 8
Integrator "path" "integer maxdepth" 2
WorldBegin
LightSource "infinite" "rgb L" [1 1 1]
LightSource "point" "point from" [0 3 0] "rgb I" [20 20 20]
AttributeBegin
  Material "matte" "rgb Kd" [0.6 0.5 0.4]
  Shape "trianglemesh" "integer indices" [0 1 2 0 2 3]
    "point P" [-100 0 -100  100 0 -100  100 0 100  -100 0 100]
AttributeEnd
WorldEnd
"""


def test_sharded_equals_single():
    cs = load_scene_string(SCENE)
    img1 = render_sampler_integrator(cs)
    for n in (2, 8):
        mesh = make_ray_mesh(n)
        imgn = render_sharded(cs, mesh)
        np.testing.assert_allclose(imgn, img1, rtol=2e-5, atol=2e-6), n


def test_mesh_uses_devices():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    mesh = make_ray_mesh(4)
    assert mesh.devices.size == 4


def test_sharded_stats_and_checkpoint(tmp_path):
    """Parity with the single-device driver: device counters psum across
    the mesh into the stats registry (P8), and checkpoint/resume works."""
    from pbrt_tpu.utils.stats import STATS
    from pbrt_tpu.utils.options import Options
    from pbrt_tpu.utils.checkpoint import load_checkpoint

    cs = load_scene_string(SCENE)
    mesh = make_ray_mesh(4)

    STATS.clear()
    opts = Options()
    opts.stats_device = True
    opts.checkpoint_path = str(tmp_path / "ck.npz")
    opts.checkpoint_every = 1
    opts.wavefront_size = 16 * 16   # force multiple batches so a mid-run
                                    # checkpoint actually lands
    img = render_sharded(cs, mesh, options=opts)
    # counters crossed the mesh: camera rays = n_pix * spp
    assert STATS.counters.get("Intersections/Camera rays traced", 0) >= 16 * 16 * 8
    ck = load_checkpoint(opts.checkpoint_path)
    assert ck is not None
    film, s, _ = ck
    assert s > 0

    # resume from the checkpoint gives the same final image
    opts2 = Options()
    opts2.stats_device = False
    opts2.checkpoint_path = opts.checkpoint_path
    opts2.resume = True
    img2 = render_sharded(cs, mesh, options=opts2)
    np.testing.assert_allclose(img2, img, rtol=2e-5, atol=2e-6)
