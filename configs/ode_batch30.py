"""ODE with 30-camera batches over 30-frame windows.

Preset parity with the reference recipe `arguments/ode_batch30.py`; consumed by
`train.py --configs configs/ode_batch30.py` (d3gs_tpu.config.apply_config_file).
"""

ModelParams = dict(
    is_ode=True,
    D=8,
    W=256,
    max_gaussians=10000,
)

OptimizationParams = dict(
    scale_lr=False,
    direct_compute=True,
    sequence_length=30,
    num_cams_per_iter=30,
    spread_out_sequence=True,
    position_lr_init=0.0001,
    position_lr_final=1e-07,
)
