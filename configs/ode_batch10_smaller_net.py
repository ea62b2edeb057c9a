"""Small ODE net with iterative alternating updates and weight decay, 60k iters.

Preset parity with the reference recipe `arguments/ode_batch10_smaller_net.py`; consumed by
`train.py --configs configs/ode_batch10_smaller_net.py` (d3gs_tpu.config.apply_config_file).
"""

ModelParams = dict(
    is_ode=True,
    D=4,
    W=128,
    max_gaussians=10000,
    use_linear=0,
    use_emb=True,
    output_scale=1,
)

OptimizationParams = dict(
    scale_lr=False,
    direct_compute=True,
    sequence_length=60,
    num_cams_per_iter=15,
    spread_out_sequence=True,
    position_lr_init=0.0001,
    position_lr_final=1e-07,
    rtol=0.0001,
    atol=1e-05,
    freeze_gaussians=False,
    use_iterative_update=True,
    iterative_update_decay=0.9,
    iterative_update_interval=100,
    max_training_switches=15,
    iterations=60000,
    weight_decay=0.0001,
)
