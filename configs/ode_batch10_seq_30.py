"""ODE, 30-frame windows at the looser 1e-3/1e-4 tolerances, 40k iters.

Preset parity with the reference recipe `arguments/ode_batch10_seq_30.py`; consumed by
`train.py --configs configs/ode_batch10_seq_30.py` (d3gs_tpu.config.apply_config_file).
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
    sequence_length=30,
    num_cams_per_iter=10,
    spread_out_sequence=True,
    position_lr_init=0.0001,
    position_lr_final=1e-06,
    rtol=0.001,
    atol=0.0001,
    iterations=40000,
    warm_up=3000,
)
