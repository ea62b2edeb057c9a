"""Per-frame deformation MLP, single-camera steps, 3k warm-up.

Preset parity with the reference recipe `arguments/baseline.py`; consumed by
`train.py --configs configs/baseline.py` (d3gs_tpu.config.apply_config_file).
"""

ModelParams = dict(
    is_ode=False,
    D=8,
    W=256,
    max_gaussians=10000,
)

OptimizationParams = dict(
    scale_lr=False,
    direct_compute=False,
    sequence_length=5,
    num_cams_per_iter=1,
    spread_out_sequence=False,
    warm_up=3000,
)
