"""d3gs_tpu — TPU-native deformable 3D Gaussian splatting framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
preacherwhite/Deformable-3D-Gaussians (see SURVEY.md): explicit Gaussian point
cloud + time-conditioned deformation fields (MLP / 6DoF / neural-ODE), a
differentiable tile rasterizer, adaptive densification, and multi-device
scaling via jax.sharding meshes.

Layout:
  ops/          math + rasterizer compute path (pure JAX + Pallas kernels)
  models/       GaussianState pytree, deformation networks & field wrappers
  data/         dataset readers (Blender/D-NeRF, COLMAP, ...), cameras, PLY IO
  train/        training loops (flagship batched, paper-baseline, distillation)
  render_eval/  offline render modes, metrics, trajectory export
  parallel/     device-mesh sharding for multi-chip training
  native/       C++ host-side helpers (knn, ply) with ctypes bindings
"""

__version__ = "0.1.0"
