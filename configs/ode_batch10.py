"""Flagship ODE recipe: 150-frame windows, 60-camera batches, constant 1e-3 position LR.

Preset parity with the reference recipe `arguments/ode_batch10.py`; consumed by
`train.py --configs configs/ode_batch10.py` (d3gs_tpu.config.apply_config_file).
"""

ModelParams = dict(
    is_ode=True,
    D=8,
    W=256,
    use_linear=0,
    use_emb=True,
)

OptimizationParams = dict(
    scale_lr=False,
    direct_compute=True,
    sequence_length=150,
    num_cams_per_iter=60,
    spread_out_sequence=True,
    position_lr_init=0.001,
    position_lr_final=0.001,
    rtol=0.0001,
    atol=1e-05,
    iterations=150000,
    warm_up=0,
)
