"""Spatial/uniform light-selection strategies (core/src/light_distrib/).

The strategies reweight light *selection* only — the estimator stays
unbiased, so all strategies must converge to the same image."""
import numpy as np
import pytest

from pbrt_tpu.scene import load_scene_string
from pbrt_tpu.render import render


def scene_with(strategy):
    return f"""
LookAt 0 2 6  0 1 0  0 1 0
Camera "perspective" "float fov" 40
Film "image" "integer xresolution" [16] "integer yresolution" [16]
Sampler "02sequence" "integer pixelsamples" 32
Integrator "path" "integer maxdepth" 2 "string lightsamplestrategy" "{strategy}"
WorldBegin
LightSource "point" "point from" [-3 4 2] "rgb I" [30 30 30]
LightSource "point" "point from" [3 4 2] "rgb I" [5 5 5]
AttributeBegin
  Material "matte" "rgb Kd" [0.5 0.5 0.5]
  Shape "trianglemesh" "integer indices" [0 1 2 0 2 3]
    "point P" [-10 0 -10  10 0 -10  10 0 10  -10 0 10]
AttributeEnd
WorldEnd
"""


@pytest.fixture(scope="module")
def power_img():
    return render(load_scene_string(scene_with("power")))


@pytest.mark.parametrize("strategy", ["uniform", "spatial"])
def test_strategies_agree(power_img, strategy):
    img = render(load_scene_string(scene_with(strategy)))
    np.testing.assert_allclose(img.mean(), power_img.mean(), rtol=0.06)
    # per-pixel agreement (same sampler sequence, different selection —
    # generous tolerance on a 2-light direct-lit plane)
    np.testing.assert_allclose(img, power_img, atol=0.15)


def test_spatial_table_shapes():
    from pbrt_tpu.lights.distrib import build_spatial_distrib
    cs = load_scene_string(scene_with("spatial"))
    sd = cs.data.light_spatial
    assert sd is not None
    V = int(np.prod(np.asarray(sd.nvox)))
    assert sd.func.shape == (V, 2)
    assert sd.cdf.shape == (V, 3)
    # pmfs along each row sum to 1
    f = np.asarray(sd.func)
    fi = np.asarray(sd.func_int)
    pmf = f / (fi[:, None] * 2)
    np.testing.assert_allclose(pmf.sum(1), 1.0, rtol=1e-4)
    # the voxel nearest the bright light prefers it
    from pbrt_tpu.lights.distrib import spatial_pdf
    import jax.numpy as jnp
    p = jnp.asarray([[-3.0, 3.5, 2.0]])
    p0 = np.asarray(spatial_pdf(sd, p, jnp.asarray([0])))[0]
    p1 = np.asarray(spatial_pdf(sd, p, jnp.asarray([1])))[0]
    assert p0 > p1


def test_spatial_beats_power_many_lights():
    """VERDICT r4 #10: on a many-light scene the spatial voxel strategy
    (per-voxel Li/pdf-weighted selection, spatial.rs:96-165) must beat
    power sampling, which degenerates to uniform when all lights share one
    power. 49 point lights over a plane, camera viewing one corner: only
    nearby lights matter, so voxel-local selection cuts NEE variance.
    MSE is measured against a converged power-strategy render (same
    unbiased estimator, high spp)."""
    import numpy as np
    from pbrt_tpu.scene import load_scene_string
    from pbrt_tpu.render import render

    def scene(strategy, spp):
        lights = "\n".join(
            f'LightSource "point" "point from" [{(i % 7) * 3 - 9} 2 '
            f'{(i // 7) * 3 - 9}] "rgb I" [4 4 4]'
            for i in range(49))
        return f"""
LookAt -8 4 -8  -9 0 -9  0 1 0
Camera "perspective" "float fov" 35
Film "image" "integer xresolution" [16] "integer yresolution" [16]
Sampler "02sequence" "integer pixelsamples" {spp}
Integrator "path" "integer maxdepth" 2
  "string lightsamplestrategy" "{strategy}" "integer spatialvoxels" 24
WorldBegin
{lights}
AttributeBegin
  Material "matte" "rgb Kd" [0.7 0.7 0.7]
  Shape "trianglemesh" "integer indices" [0 1 2 0 2 3]
    "point P" [-12 0 -12  12 0 -12  12 0 12  -12 0 12]
AttributeEnd
WorldEnd
"""

    ref = np.asarray(render(load_scene_string(scene("power", 64))))
    img_pow = np.asarray(render(load_scene_string(scene("power", 4))))
    img_spa = np.asarray(render(load_scene_string(scene("spatial", 4))))
    mse_pow = float(((img_pow - ref) ** 2).mean())
    mse_spa = float(((img_spa - ref) ** 2).mean())
    # require a real margin, not a coin flip
    assert mse_spa < 0.75 * mse_pow, (mse_spa, mse_pow)
