"""Model layer: Gaussian point-cloud state + deformation fields."""
from .gaussians import GaussianState, AdamState  # noqa: F401
