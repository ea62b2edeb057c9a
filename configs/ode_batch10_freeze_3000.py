"""ODE with frozen gaussians and densification cut off at 3k iters.

Preset parity with the reference recipe `arguments/ode_batch10_freeze_3000.py`; consumed by
`train.py --configs configs/ode_batch10_freeze_3000.py` (d3gs_tpu.config.apply_config_file).
"""

ModelParams = dict(
    is_ode=True,
    D=8,
    W=256,
    max_gaussians=10000,
    use_linear=0,
    use_emb=True,
)

OptimizationParams = dict(
    scale_lr=False,
    direct_compute=True,
    sequence_length=30,
    num_cams_per_iter=10,
    spread_out_sequence=True,
    position_lr_init=0.0001,
    position_lr_final=1e-07,
    rtol=0.0001,
    atol=1e-05,
    freeze_gaussians=True,
    densify_until_iter=3000,
)
