"""Renderer correctness: analytic radiometry checks on tiny scenes.

These are the quantitative analog of the reference's golden-image fixtures
(SURVEY sect. 4): closed-form expected radiance instead of eyeballed PNGs.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from pbrt_tpu.scene import load_scene_string
from pbrt_tpu.render import render


def make(scene, **kw):
    return load_scene_string(scene, **kw)


PLANE = """
  AttributeBegin
    Material "matte" "rgb Kd" [{kd} {kd} {kd}]
    Shape "trianglemesh" "integer indices" [0 1 2 0 2 3]
      "point P" [-100 0 -100  100 0 -100  100 0 100  -100 0 100]
  AttributeEnd
"""

HEAD = """
LookAt 0 5 0  0 0 0  0 0 -1
Camera "perspective" "float fov" 30
Film "image" "integer xresolution" [32] "integer yresolution" [32]
Sampler "{sampler}" "integer pixelsamples" {spp}
Integrator "{integrator}" "integer maxdepth" {depth}
WorldBegin
"""


def test_env_furnace_plane():
    """Matte plane under constant env L=1: outgoing = albedo exactly.
    Catches NEE/BSDF-MIS double counting and cosine-weight errors."""
    for kd in (0.4, 0.8):
        scene = HEAD.format(sampler="02sequence", spp=64, integrator="path", depth=3) \
            + 'LightSource "infinite" "rgb L" [1 1 1]\n' \
            + PLANE.format(kd=kd) + "WorldEnd"
        img = render(make(scene))
        center = img[8:24, 8:24].mean(axis=(0, 1))
        np.testing.assert_allclose(center, kd, rtol=0.03), (kd, center)


def test_point_light_analytic():
    """Matte plane + point light: L = kd/pi * I * cos / d^2."""
    I = 100.0
    kd = 0.6
    scene = ("LookAt 0 5 0  0 0 0  0 0 -1\n"
             'Camera "perspective" "float fov" 20\n'
             'Film "image" "integer xresolution" [32] "integer yresolution" [32]\n'
             'Sampler "stratified" "integer xsamples" 4 "integer ysamples" 4\n'
             'Integrator "path" "integer maxdepth" 1\n'
             "WorldBegin\n"
             f'LightSource "point" "point from" [0 3 0] "rgb I" [{I} {I} {I}]\n'
             + PLANE.format(kd=kd) + "WorldEnd")
    img = render(make(scene))
    # center pixel looks at origin: light straight above at d=3, cos=1
    expected = kd / np.pi * I / 9.0
    center = img[15:17, 15:17].mean()
    np.testing.assert_allclose(center, expected, rtol=0.02)


def test_area_light_direct_view():
    """Camera under a down-facing emitter sees Le exactly; from behind, 0.
    (diffuse.rs l() one-sidedness)."""
    def scene(eye_y, look_y):
        return (f"LookAt 0 {eye_y} 0  0 {look_y} 0  0 0 -1\n"
                'Camera "perspective" "float fov" 30\n'
                'Film "image" "integer xresolution" [16] "integer yresolution" [16]\n'
                'Sampler "random" "integer pixelsamples" 4\n'
                'Integrator "path" "integer maxdepth" 1\n'
                "WorldBegin\n"
                'AttributeBegin\n'
                '  AreaLightSource "diffuse" "rgb L" [5 5 5]\n'
                '  Translate 0 3 0\n'
                '  Shape "trianglemesh" "integer indices" [0 1 2 0 2 3]\n'
                '    "point P" [-4 0 -4  4 0 -4  4 0 4  -4 0 4]\n'
                'AttributeEnd\n'
                "WorldEnd")
    below = render(make(scene(0.0, 3.0)))
    above = render(make(scene(6.0, 3.0)))
    np.testing.assert_allclose(below[6:10, 6:10].mean(), 5.0, rtol=1e-3)
    assert above.max() < 1e-6


# emitter offset to the side so the floor center stays visible from above
AREA_BODY = ('AttributeBegin\n'
             '  AreaLightSource "diffuse" "rgb L" [40 40 40]\n'
             '  Translate 2 {h} 0\n'
             '  Shape "trianglemesh" "integer indices" [0 1 2 0 2 3]\n'
             '    "point P" [-0.2 0 -0.2  0.2 0 -0.2  0.2 0 0.2  -0.2 0 0.2]\n'
             'AttributeEnd\n')


def test_area_light_vs_path_consistency():
    """Direct and path integrators agree on a direct-lighting-only scene."""
    body = AREA_BODY.format(h=3) + PLANE.format(kd=0.5)
    imgs = {}
    for integ in ("path", "directlighting"):
        scene = HEAD.format(sampler="02sequence", spp=64, integrator=integ,
                            depth=2) + body + "WorldEnd"
        imgs[integ] = render(make(scene))
    a = imgs["path"][14:18, 14:18].mean()
    b = imgs["directlighting"][14:18, 14:18].mean()
    assert a > 0.005, a
    np.testing.assert_allclose(a, b, rtol=0.06)


def test_area_light_falloff():
    """Small emitter at (2,h,0) lighting the origin:
    L proportional to h^2/(4+h^2)^2 (both cosines + inverse square)."""
    def scene_at(h):
        return (HEAD.format(sampler="02sequence", spp=128, integrator="path", depth=1)
                + AREA_BODY.format(h=h) + PLANE.format(kd=0.5) + "WorldEnd")
    img2 = render(make(scene_at(2.0)))
    img4 = render(make(scene_at(4.0)))
    r = img2[15:17, 15:17].mean() / max(img4[15:17, 15:17].mean(), 1e-9)
    expected = (4.0 / 64.0) / (16.0 / 400.0)
    np.testing.assert_allclose(r, expected, rtol=0.1)


def test_mirror_reflection():
    """Mirror plane reflects the env light exactly (Kr * L)."""
    scene = (HEAD.format(sampler="random", spp=16, integrator="path", depth=3)
             + 'LightSource "infinite" "rgb L" [0.5 0.5 0.5]\n'
             + 'AttributeBegin\n'
               'Material "mirror" "rgb Kr" [0.8 0.8 0.8]\n'
               'Shape "trianglemesh" "integer indices" [0 1 2 0 2 3]\n'
               '"point P" [-100 0 -100  100 0 -100  100 0 100  -100 0 100]\n'
               'AttributeEnd\n'
             + "WorldEnd")
    img = render(make(scene))
    center = img[8:24, 8:24].mean(axis=(0, 1))
    np.testing.assert_allclose(center, 0.8 * 0.5, rtol=0.02)


def test_sphere_shadow():
    """Sphere between plane and point light casts a shadow."""
    # camera off-axis so the sphere doesn't hide its own shadow
    scene = ("LookAt 4 5 4  0 0 0  0 1 0\n"
             'Camera "perspective" "float fov" 30\n'
             'Film "image" "integer xresolution" [48] "integer yresolution" [48]\n'
             'Sampler "stratified" "integer xsamples" 2 "integer ysamples" 2\n'
             'Integrator "path" "integer maxdepth" 1\n'
             "WorldBegin\n"
             'LightSource "point" "point from" [0 4 0] "rgb I" [50 50 50]\n'
             'AttributeBegin\n'
             '  Material "matte" "rgb Kd" [0.5 0.5 0.5]\n'
             '  Translate 0 2 0\n'
             '  Shape "sphere" "float radius" 0.5\n'
             'AttributeEnd\n'
             + PLANE.format(kd=0.5) + "WorldEnd")
    img = render(make(scene))
    # image center = world origin = directly under the light, in shadow
    center = img[23:25, 23:25].mean()
    off = img[40:44, 4:8].mean()
    assert center < 0.3 * off, (center, off)


def test_quick_option_quarters_resolution():
    from pbrt_tpu.utils.options import Options
    opts = Options(quick=True)
    scene = HEAD.format(sampler="random", spp=4, integrator="path", depth=1) \
        + 'LightSource "infinite" "rgb L" [1 1 1]\n' + "WorldEnd"
    cs = load_scene_string(scene, options=opts)
    assert cs.film.full_resolution == (8, 8)
