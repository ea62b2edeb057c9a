"""Quality A/B: deform-MLP activation dtype f32 vs bf16 (dev tool).

The bf16 opt-in's recorded ~0.9 dB PSNR cost (fields.py spec comment) was
measured BEFORE 34e47b4 switched train steps to default single-bf16-pass
matmuls with targeted f32 pins. Under the shipping regime every MLP matmul
already rounds its inputs to bf16, so storing the activations in bf16
should add almost no forward error — the remaining delta is backward
cotangent rounding. This re-measures the PSNR gap under identical seeds on
a mid-size synthetic dynamic scene (non-rigid warp so the deform MLP has
real work), ~2k iterations, 300px.

Run on TPU: python tools/exp_r5_mlp_quality.py
"""
import dataclasses
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from d3gs_tpu.config import ModelParams, OptimizationParams, PipelineParams
from d3gs_tpu.models import gaussians as G
from d3gs_tpu.models.renderer import render
from d3gs_tpu.train.baseline import train_baseline

from tests.test_train_static import gt_state, make_camera  # noqa: E402

SIZE = 300
N_GT = 800
CAP = 4096
N_TRAIN, N_TEST = 16, 4
ITERS = 2000
WARM = 300


def warp(xyz, fid):
    """Non-rigid GT motion: translation + a bend that the MLP must learn."""
    x, y, z = xyz[:, 0], xyz[:, 1], xyz[:, 2]
    dx = 0.25 * fid + 0.15 * fid * jnp.sin(2.0 * y)
    dy = 0.12 * fid * jnp.cos(2.0 * x)
    return xyz + jnp.stack([dx, dy, 0.05 * fid * z], axis=-1)


def make_dataset():
    gt = gt_state(n=N_GT, cap=CAP)
    bg = jnp.zeros(3)

    def cam_at(k, n, phase=0.0):
        fid = k / max(n - 1, 1)
        shifted = gt.replace(params=gt.params._replace(
            xyz=warp(gt.params.xyz, fid)))
        cam = make_camera(angle=phase + k * 2 * math.pi / n,
                          width=SIZE, height=SIZE)
        out = render(shifted, cam, bg=bg, tile_capacity=512, tile_chunk=19)
        return dataclasses.replace(cam, image=out.image,
                                   fid=jnp.asarray(fid, jnp.float32))

    train_cams = [cam_at(k, N_TRAIN) for k in range(N_TRAIN)]
    test_cams = [cam_at(k, N_TEST, phase=0.37) for k in range(N_TEST)]
    return gt, train_cams, test_cams


def run_arm(dtype, gt, train_cams, test_cams):
    rng = np.random.default_rng(1)
    pts = np.asarray(gt.params.xyz[:N_GT]) + \
        rng.normal(scale=0.04, size=(N_GT, 3)).astype(np.float32)
    cols = rng.uniform(0.2, 1.0, size=(N_GT, 3)).astype(np.float32)
    st = G.create_from_pcd(pts, cols, sh_degree=1, capacity=CAP,
                           spatial_lr_scale=4.0)

    model_cfg = ModelParams(is_blender=True, sh_degree=1,
                            deform_dtype=dtype)
    opt_cfg = OptimizationParams(
        iterations=ITERS, warm_up=WARM, sequence_length=N_TRAIN,
        densify_from_iter=500, densify_until_iter=1500,
        densification_interval=100, opacity_reset_interval=10_000,
        position_lr_max_steps=ITERS, deform_lr_max_steps=ITERS)
    pipe_cfg = PipelineParams(tile_capacity=512, tile_chunk=19,
                              steps_per_dispatch=25)

    result = train_baseline(
        gaussians=st, train_cams=train_cams, test_cams=test_cams,
        cameras_extent=4.0, model_cfg=model_cfg, opt_cfg=opt_cfg,
        pipe_cfg=pipe_cfg, test_iterations=(1000, 1500, ITERS),
        seed=0, progress=False, log_every=500)
    print(f"deform_dtype={dtype:9s} best_psnr={result.best_psnr:.3f}",
          flush=True)
    return result.best_psnr


if __name__ == "__main__":
    gt, train_cams, test_cams = make_dataset()
    p32 = run_arm("float32", gt, train_cams, test_cams)
    p16 = run_arm("bfloat16", gt, train_cams, test_cams)
    print(f"delta (bf16 - f32): {p16 - p32:+.3f} dB", flush=True)
