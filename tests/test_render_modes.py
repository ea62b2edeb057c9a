"""All five interpolation render modes (reference render.py:177-396) run on
a tiny scene and produce frames + (optional) video artifacts."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from d3gs_tpu.config import PipelineParams
from d3gs_tpu.models.deform import DeformFieldSpec, create_deform_field
from d3gs_tpu.render_eval import render_modes as RM
from tests.test_train_static import gt_state, make_camera


@pytest.fixture(scope="module")
def setup():
    st = gt_state(n=60, cap=128)
    cams = [make_camera(a, width=32, height=32) for a in (0.0, 1.0, 2.0)]
    spec = DeformFieldSpec(kind="baseline", is_blender=True, D=2, W=16)
    dstate, field = create_deform_field(spec, jax.random.PRNGKey(0))
    pipe = PipelineParams(tile_capacity=128, tile_chunk=4)
    render_at = RM.make_render_fn(st, field, pipe)
    return st, cams, dstate.params, render_at


@pytest.mark.parametrize("mode", ["time", "view", "all", "pose",
                                  "original"])
def test_interpolation_modes_produce_frames(tmp_path, setup, mode):
    st, cams, d_params, render_at = setup
    bg = jnp.zeros(3)
    mp = str(tmp_path)
    kw = dict(frames=3)
    if mode == "time":
        RM.interpolate_time(mp, "test", 1, cams, st, d_params, render_at,
                            bg, **kw)
        base = "test/interpolate_1"
    elif mode == "view":
        RM.interpolate_view(mp, "test", 1, cams, st, d_params, render_at,
                            bg, R=np.asarray(cams[0].viewmatrix)[:3, :3].T,
                            T=np.asarray(cams[0].campos))
        base = "test/interpolate_view_1"
    elif mode == "all":
        RM.interpolate_all(mp, "test", 1, cams, st, d_params, render_at,
                           bg, **kw)
        base = "test/interpolate_all_1"
    elif mode == "pose":
        RM.interpolate_poses(mp, "test", 1, cams, st, d_params, render_at,
                             bg, **kw)
        base = "test/interpolate_pose_1"
    else:
        RM.interpolate_view_original(mp, "test", 1, cams, st, d_params,
                                     render_at, bg, **kw)
        base = "test/interpolate_hyper_view_1"
    rdir = os.path.join(mp, base, "renders")
    pngs = [f for f in os.listdir(rdir) if f.endswith(".png")]
    assert len(pngs) >= 3
    import imageio.v2 as imageio
    arr = imageio.imread(os.path.join(rdir, sorted(pngs)[0]))
    assert arr.shape[:2] == (32, 32)
    assert os.path.isdir(os.path.join(mp, base, "depth"))
