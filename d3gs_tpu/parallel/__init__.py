"""Multi-device scaling: meshes, sharded rendering, sharded train steps."""
from .mesh import make_mesh, shard_gaussian_state  # noqa: F401
from .sharded import make_sharded_render, make_sharded_train_step  # noqa: F401
