"""Interactive viewing: orbit camera, SIBR-compatible network viewer."""
from .orbit import OrbitCamera  # noqa: F401
from .network_viewer import NetworkViewer  # noqa: F401
