"""ODE, short 15-frame windows, decay to a tiny final position LR.

Preset parity with the reference recipe `arguments/ode_batch10_complex_weightdecay_smallend.py`; consumed by
`train.py --configs configs/ode_batch10_complex_weightdecay_smallend.py` (d3gs_tpu.config.apply_config_file).
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
    sequence_length=15,
    num_cams_per_iter=15,
    spread_out_sequence=True,
    position_lr_init=0.0001,
    position_lr_final=1e-08,
    weight_decay=1e-05,
)
