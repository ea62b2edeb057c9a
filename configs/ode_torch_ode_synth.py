"""Batched-ODE trainer on synthetic data (D=5/W=128, 150-frame windows).

Preset parity with the reference recipe `arguments/ode_torch_ode_synth.py`; consumed by
`train.py --configs configs/ode_torch_ode_synth.py` (d3gs_tpu.config.apply_config_file).
"""

ModelParams = dict(
    is_ode=True,
    D=5,
    W=128,
    use_linear=0,
    use_emb=True,
    use_torch_ode=True,
)

OptimizationParams = dict(
    scale_lr=False,
    direct_compute=True,
    sequence_length=150,
    num_cams_per_iter=10,
    spread_out_sequence=True,
    position_lr_init=0.0001,
    position_lr_final=1e-06,
    rtol=0.001,
    atol=0.0001,
    iterations=150000,
    warm_up=0,
)
