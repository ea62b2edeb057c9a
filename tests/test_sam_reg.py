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


def test_slic_segments_coherent_regions():
    """SLIC on a two-color image must separate the colors into different
    labels and produce labels in 1..n_segments."""
    from d3gs_tpu.train.segment import slic_label_map
    img = np.zeros((48, 48, 3), np.float32)
    img[:, 24:] = [1.0, 0.2, 0.1]          # right half red-ish
    lab = slic_label_map(img, n_segments=16)
    assert lab.shape == (48, 48)
    assert lab.min() >= 1 and lab.max() <= 16
    left = set(np.unique(lab[:, :20]))
    right = set(np.unique(lab[:, 28:]))
    assert not (left & right), "color boundary must separate segments"


def test_masks_to_label_map_overlap_order():
    from d3gs_tpu.train.segment import masks_to_label_map
    big = np.zeros((8, 8), bool)
    big[:, :] = True
    small = np.zeros((8, 8), bool)
    small[2:4, 2:4] = True
    lab = masks_to_label_map(np.stack([small, big]), num_masks=8)
    # the small (foreground) mask must win the overlap
    assert lab[3, 3] != lab[0, 0]
    assert (lab > 0).all()


def test_generate_and_cache_label_maps(tmp_path):
    """End-to-end mask generation from raw images with the reference's
    cache layout (<source>/sam_masks_cache/<name>_mask.npy), reused on the
    second call."""
    import dataclasses

    from d3gs_tpu.train.segment import load_or_generate_label_maps
    cam = make_camera(0.0, width=32, height=32)
    img = np.zeros((32, 32, 3), np.float32)
    img[:, 16:] = 0.9
    cams = [dataclasses.replace(cam, image=jnp.asarray(img),
                                image_name=f"r_{i}") for i in range(2)]
    maps = load_or_generate_label_maps(cams, str(tmp_path), num_masks=9,
                                       progress=False)
    assert set(maps) == {"r_0", "r_1"}
    cache = tmp_path / "sam_masks_cache"
    assert sorted(p.name for p in cache.iterdir()) == [
        "r_0_mask.npy", "r_1_mask.npy"]
    maps2 = load_or_generate_label_maps(cams, str(tmp_path), num_masks=9,
                                        progress=False)
    np.testing.assert_array_equal(maps["r_0"], maps2["r_0"])
    # the generated map feeds the jittable regularizer directly
    st = gt_state(n=50, cap=128)
    reg = mask_regularization(
        jnp.asarray(maps["r_0"]), 9, st.params.xyz, cam.projmatrix,
        jnp.ones((128, 3)), 0.0, 0.0, st.alive, 32, 32)
    assert np.isfinite(float(reg))
