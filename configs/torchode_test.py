"""ODE smoke recipe: 40k iters, constant 1e-4 position LR, 1-iter warm-up.

Preset parity with the reference recipe `arguments/torchode_test.py`; consumed by
`train.py --configs configs/torchode_test.py` (d3gs_tpu.config.apply_config_file).
"""

ModelParams = dict(
    is_ode=True,
    D=8,
    W=256,
    use_linear=0,
    use_emb=True,
    use_torch_ode=False,
)

OptimizationParams = dict(
    scale_lr=False,
    direct_compute=True,
    sequence_length=30,
    num_cams_per_iter=10,
    spread_out_sequence=True,
    position_lr_init=0.0001,
    position_lr_final=0.0001,
    rtol=0.0001,
    atol=1e-05,
    iterations=40000,
    warm_up=1,
)
