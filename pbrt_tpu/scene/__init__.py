from pbrt_tpu.scene.build import load_scene, load_scene_string, build_scene  # noqa: F401
from pbrt_tpu.scene.types import CompiledScene, SceneData, SceneFlags  # noqa: F401
