"""Parser/compiler coverage over the reference's 58 fixture scenes.

The reference ships .pbrt fixtures under scenes/ exercising every plugin
(SURVEY sect. 4 golden scenes). They are INPUT DATA for our parser — every
one must tokenize + drive the Api; most must also compile to device arrays.
"""
import glob
import os

import numpy as np
import pytest

from pbrt_tpu.scene.api import Api
from pbrt_tpu.scene.parser import parse_file
from pbrt_tpu.scene.build import build_scene

REF_SCENES = sorted(glob.glob("/root/reference/scenes/**/*.pbrt", recursive=True))


@pytest.mark.skipif(not REF_SCENES, reason="reference scenes not mounted")
@pytest.mark.parametrize("path", REF_SCENES, ids=lambda p: os.path.relpath(p, "/root/reference/scenes"))
def test_parse_reference_scene(path):
    api = Api()
    api.cwd = os.path.dirname(path)
    parse_file(path, api)   # must not raise
    assert api.scene is not None


@pytest.mark.skipif(not REF_SCENES, reason="reference scenes not mounted")
def test_build_reference_scenes_bulk():
    """Every fixture must also COMPILE to a device scene."""
    failures = []
    for path in REF_SCENES:
        api = Api()
        api.cwd = os.path.dirname(path)
        try:
            parse_file(path, api)
            cs = build_scene(api.scene, cwd=api.cwd)
            assert cs.film.full_resolution[0] > 0
        except Exception as e:  # noqa: BLE001
            failures.append((os.path.basename(path), repr(e)[:120]))
    assert not failures, failures
