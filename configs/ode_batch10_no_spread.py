"""ODE over contiguous (unspread) 30-frame windows.

Preset parity with the reference recipe `arguments/ode_batch10_no_spread.py`; consumed by
`train.py --configs configs/ode_batch10_no_spread.py` (d3gs_tpu.config.apply_config_file).
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
    num_cams_per_iter=10,
    spread_out_sequence=False,
)
