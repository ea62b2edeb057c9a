"""Baseline MLP over a 30-frame window without sequence spreading.

Preset parity with the reference recipe `arguments/baseline_no_spread.py`; consumed by
`train.py --configs configs/baseline_no_spread.py` (d3gs_tpu.config.apply_config_file).
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
    sequence_length=30,
    num_cams_per_iter=1,
    spread_out_sequence=False,
)
