"""Projection / goniometric light image maps.

Reference: lights/src/projection.rs (perspective map projection, zero
outside the fov window), lights/src/goniometric.rs (equirect photometric
map). A half-bright/half-dark map must light the two sides of the scene
asymmetrically.
"""
import numpy as np
import jax.numpy as jnp

from pbrt_tpu.scene import load_scene_string
from pbrt_tpu import lights as LT
from pbrt_tpu.utils.options import Options


def _scene(kind, mapfile):
    return f"""
Camera "perspective" "float fov" 45
Film "image" "integer xresolution" [8] "integer yresolution" [8]
Sampler "random" "integer pixelsamples" 1
Integrator "path" "integer maxdepth" 1
WorldBegin
LightSource "{kind}" "rgb I" [10 10 10] "string mapname" "{mapfile}"
Shape "trianglemesh" "integer indices" [0 1 2]
  "point P" [-5 -5 -3  5 -5 -3  0 5 -3]
WorldEnd
"""


def _halfmap(tmp_path):
    # left half black, right half white PNG
    from PIL import Image
    a = np.zeros((32, 32, 3), np.uint8)
    a[:, 16:] = 255
    p = str(tmp_path / "half.png")
    Image.fromarray(a).save(p)
    return p


def _probe(kind, tmp_path, ref):
    mp = _halfmap(tmp_path)
    cs = load_scene_string(_scene(kind, mp), Options())
    lt = cs.data.lights
    assert lt.limg.shape[1:] == (64, 64, 3), "map was not loaded into the atlas"
    ref = jnp.asarray(ref, jnp.float32)
    li = LT.sample_li(lt, cs.data, jnp.zeros((2,), jnp.int32), ref,
                      jnp.asarray([[0.5, 0.5]] * 2, jnp.float32),
                      cs.data.world_center, cs.data.world_radius)
    return np.asarray(li.li).sum(-1)


def test_projection_map_asymmetric(tmp_path):
    # probes left/right of the light axis, inside the 45-degree window
    # (|x/z| < tan(fov/2) = 0.414)
    v = _probe("projection", tmp_path, [[0.5, 0.1, 2.0], [-0.5, 0.1, 2.0]])
    assert not np.isclose(v[0], v[1]), f"map had no effect: {v}"
    assert min(v) == 0.0, f"dark half must be fully masked: {v}"


def test_goniometric_map_asymmetric(tmp_path):
    # phi = atan2(y, x): +y vs -y probes land on opposite map halves
    v = _probe("goniometric", tmp_path, [[0.5, 0.1, 2.0], [0.5, -0.1, 2.0]])
    assert not np.isclose(v[0], v[1]), f"map had no effect: {v}"
