"""End-to-end static training smoke: optimize a fresh Gaussian cloud to fit
images rendered from a ground-truth cloud (SURVEY.md §7 step 5, miniature)."""
import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

from d3gs_tpu.config import OptimizationParams, PipelineParams
from d3gs_tpu.data.cameras import Camera
from d3gs_tpu.models import gaussians as G
from d3gs_tpu.models.renderer import render
from d3gs_tpu.ops.camera_math import perspective_projection, world_to_view
from d3gs_tpu.train.step import densify_fns, make_train_step


def make_camera(angle, width=64, height=64, radius=4.0, image=None):
    R = np.array([[math.cos(angle), 0, math.sin(angle)],
                  [0, 1, 0],
                  [-math.sin(angle), 0, math.cos(angle)]])
    # camera at distance `radius` looking at origin
    t = np.array([0.0, 0.0, radius])
    V = world_to_view(R, t).T
    fov = math.radians(60)
    P = perspective_projection(0.01, 100.0, fov, fov).T
    img = jnp.zeros((height, width, 3)) if image is None else image
    return Camera(
        viewmatrix=jnp.asarray(V, jnp.float32),
        projmatrix=jnp.asarray((V @ P), jnp.float32),
        campos=jnp.asarray(np.linalg.inv(V)[3, :3], jnp.float32),
        fid=jnp.asarray(0.0), image=img,
        width=width, height=height, fovx=fov, fovy=fov)


def gt_state(n=120, seed=0, cap=512):
    rng = np.random.default_rng(seed)
    pts = rng.normal(size=(n, 3)).astype(np.float32) * 0.6
    cols = rng.uniform(0.2, 1.0, size=(n, 3)).astype(np.float32)
    st = G.create_from_pcd(pts, cols, sh_degree=1, capacity=cap)
    # make them chunky and opaque so images have structure
    st = st.replace(params=st.params._replace(
        scaling=jnp.where(jnp.arange(cap)[:, None] < n,
                          jnp.log(0.12), st.params.scaling),
        opacity=jnp.where(jnp.arange(cap)[:, None] < n, 2.0,
                          st.params.opacity)))
    return st


def test_static_training_reduces_loss_and_densifies():
    cap = 512
    gt = gt_state(cap=cap)
    bg = jnp.zeros(3)
    cams = []
    for k in range(6):
        cam = make_camera(angle=k * math.pi / 3)
        out = render(gt, cam, bg=bg, tile_capacity=256, tile_chunk=16)
        cams.append(dataclasses.replace(cam, image=out.image))

    # fresh model from noisy GT points
    rng = np.random.default_rng(1)
    pts = np.asarray(gt.params.xyz[:120]) + \
        rng.normal(scale=0.05, size=(120, 3)).astype(np.float32)
    cols = rng.uniform(0.2, 1.0, size=(120, 3)).astype(np.float32)
    st = G.create_from_pcd(pts, cols, sh_degree=1, capacity=cap,
                           spatial_lr_scale=4.0)

    opt_cfg = OptimizationParams(warm_up=0, lambda_dssim=0.2,
                                 densify_grad_threshold=2e-4)
    pipe_cfg = PipelineParams(tile_capacity=256, tile_chunk=16)
    step = make_train_step(opt_cfg=opt_cfg, pipe_cfg=pipe_cfg, donate=False)
    densify, reset, oneup = densify_fns(opt_cfg)

    key = jax.random.PRNGKey(0)
    losses = []
    for it in range(60):
        cam = cams[it % len(cams)]
        key, k1 = jax.random.split(key)
        st, _, aux = step(st, None, cam, jnp.asarray(it, jnp.float32), k1, bg)
        losses.append(float(aux.loss))
        if it == 40:
            before = int(st.num_alive)
            st = densify(st, k1, 0.0, 4.0)
            after = int(st.num_alive)
            assert after >= 1  # densify ran without shape blowup
    assert losses[-1] < losses[0] * 0.7, (losses[0], losses[-1])
    assert np.isfinite(losses).all()


def test_freeze_gaussians_keeps_params():
    cap = 256
    gt = gt_state(n=50, cap=cap)
    bg = jnp.zeros(3)
    cam = make_camera(0.0)
    out = render(gt, cam, bg=bg, tile_capacity=128, tile_chunk=16)
    cam = dataclasses.replace(cam, image=out.image)

    opt_cfg = OptimizationParams(warm_up=0)
    pipe_cfg = PipelineParams(tile_capacity=128, tile_chunk=16)
    step = make_train_step(opt_cfg=opt_cfg, pipe_cfg=pipe_cfg,
                           freeze_gaussians=True, donate=False)
    st0 = gt
    st1, _, _ = step(st0, None, cam, jnp.asarray(0.0), jax.random.PRNGKey(0),
                     bg)
    np.testing.assert_array_equal(np.asarray(st1.params.xyz),
                                  np.asarray(gt.params.xyz))
