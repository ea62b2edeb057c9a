"""Neural-ODE field, 10-camera batches, low position LR, 20k iters.

Preset parity with the reference recipe `arguments/ode_batch1.py`; consumed by
`train.py --configs configs/ode_batch1.py` (d3gs_tpu.config.apply_config_file).
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
    position_lr_init=2e-05,
    position_lr_final=1e-07,
    rtol=0.0001,
    atol=1e-05,
    freeze_gaussians=False,
    warm_up=3000,
    max_batch_gaussians=-1,
    iterations=20000,
)
