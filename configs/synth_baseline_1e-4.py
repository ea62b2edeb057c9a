"""Batched baseline distillation recipe at constant 1e-4 position LR.

Preset parity with the reference recipe `arguments/synth_baseline_1e-4.py`; consumed by
`train.py --configs configs/synth_baseline_1e-4.py` (d3gs_tpu.config.apply_config_file).
"""

ModelParams = dict(
    is_ode=False,
    D=8,
    W=256,
    use_linear=0,
    use_emb=True,
    use_torch_ode=True,
)

OptimizationParams = dict(
    scale_lr=False,
    direct_compute=False,
    sequence_length=1000,
    num_cams_per_iter=1000,
    spread_out_sequence=True,
    position_lr_init=0.0001,
    position_lr_final=0.0001,
    rtol=0.0001,
    atol=1e-05,
    iterations=10000,
    warm_up=0,
)
