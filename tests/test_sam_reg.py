"""Mask-consistency regularizer tests."""
import jax
import jax.numpy as jnp
import numpy as np

from d3gs_tpu.train.sam_reg import (grid_label_map, mask_regularization,
                                    project_to_pixels)
from tests.test_train_static import gt_state, make_camera


def test_project_to_pixels_centers():
    cam = make_camera(0.0, width=64, height=64)
    # a point at the origin projects to the image center
    px, inf = project_to_pixels(jnp.zeros((1, 3)), cam.projmatrix, 64, 64)
    assert bool(inf[0])
    np.testing.assert_allclose(np.asarray(px[0]), [31.5, 31.5], atol=0.6)


def test_mask_reg_zero_for_rigid_motion():
    """Uniform per-mask deformation => zero variance penalty; scattered
    deformation => positive."""
    cap = 256
    st = gt_state(n=100, cap=cap)
    cam = make_camera(0.0, width=64, height=64)
    labels = jnp.asarray(grid_label_map(64, 64, cells=4))

    d_uniform = jnp.ones((cap, 3)) * 0.3
    reg0 = mask_regularization(labels, 16, st.params.xyz, cam.projmatrix,
                               d_uniform, 0.0, 0.0, st.alive, 64, 64)
    # uniform motion inside EVERY mask -> zero variance
    assert float(reg0) < 1e-6

    rng = np.random.default_rng(0)
    d_rand = jnp.asarray(rng.normal(size=(cap, 3)).astype(np.float32))
    reg1 = mask_regularization(labels, 16, st.params.xyz, cam.projmatrix,
                               d_rand, 0.0, 0.0, st.alive, 64, 64)
    assert float(reg1) > 1e-3

    # differentiable
    g = jax.grad(lambda d: mask_regularization(
        labels, 16, st.params.xyz, cam.projmatrix, d, 0.0, 0.0, st.alive,
        64, 64))(d_rand)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0
