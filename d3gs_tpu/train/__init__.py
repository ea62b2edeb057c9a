"""Training loops: static 3DGS, paper-baseline deformable, flagship batched,
trajectory distillation, synthetic-ODE harnesses."""
