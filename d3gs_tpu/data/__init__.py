"""Data layer: dataset readers, cameras, PLY IO, Scene orchestration."""
from .cameras import Camera, CameraBatch, camera_from_info  # noqa: F401
from .scene import Scene, SceneInfo  # noqa: F401
