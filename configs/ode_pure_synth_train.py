"""Synthetic-trajectory ODE fit: tiny net, 1000-frame sequence, 2k iters.

Preset parity with the reference recipe `arguments/ode_pure_synth_train.py`; consumed by
`train.py --configs configs/ode_pure_synth_train.py` (d3gs_tpu.config.apply_config_file).
"""

ModelParams = dict(
    is_ode=True,
    D=4,
    W=128,
    use_linear=0,
    use_emb=False,
    is_blender=False,
)

OptimizationParams = dict(
    scale_lr=False,
    direct_compute=True,
    sequence_length=1000,
    num_cams_per_iter=20,
    spread_out_sequence=True,
    position_lr_init=0.0001,
    position_lr_final=1e-06,
    rtol=0.0001,
    atol=1e-05,
    iterations=2000,
    warm_up=0,
)
