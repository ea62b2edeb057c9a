"""ODE with 1e-5 weight decay on the deformation net.

Preset parity with the reference recipe `arguments/ode_batch10_complex_weight_decay.py`; consumed by
`train.py --configs configs/ode_batch10_complex_weight_decay.py` (d3gs_tpu.config.apply_config_file).
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
    spread_out_sequence=True,
    position_lr_init=0.00016,
    position_lr_final=1.6e-06,
    weight_decay=1e-05,
)
