"""Full-stack CLI test: synthetic Blender/D-NeRF dataset on disk ->
train.py -> render.py -> metrics.py (exercises readers, Scene, cfg_args,
checkpoints, render modes, metric JSONs)."""
import json
import math
import os

import jax.numpy as jnp
import numpy as np
import pytest

from d3gs_tpu.models.renderer import render
from d3gs_tpu.render_eval.render_modes import camera_with_fid
from tests.test_train_static import gt_state, make_camera


def write_blender_dataset(root, n_train=6, n_test=2, size=64):
    """Render a translating GT cloud into a D-NeRF-format dataset."""
    import imageio.v2 as imageio

    gt = gt_state(n=80, cap=256)
    os.makedirs(os.path.join(root, "train"), exist_ok=True)
    os.makedirs(os.path.join(root, "test"), exist_ok=True)
    fov = math.radians(60)

    def c2w_from_angle(angle, radius=4.0):
        # inverse of the D-NeRF reader's pose flip so the reader recovers
        # exactly our render camera
        R = np.array([[math.cos(angle), 0, math.sin(angle)],
                      [0, 1, 0],
                      [-math.sin(angle), 0, math.cos(angle)]])
        T = np.array([0.0, 0.0, radius])
        Rr = -R.copy()
        Rr[:, 0] = -Rr[:, 0]
        m3 = Rr.T  # matrix[:3,:3]
        c2w = np.eye(4)
        inv = np.eye(4)
        inv[:3, :3] = m3
        inv[:3, 3] = -T
        c2w = np.linalg.inv(inv)
        return c2w

    def emit(split, n):
        frames = []
        for k in range(n):
            t = k / max(n - 1, 1)
            angle = k * 2 * math.pi / n
            shifted = gt.replace(params=gt.params._replace(
                xyz=gt.params.xyz + jnp.array([0.3 * t, 0.0, 0.0])))
            cam = make_camera(angle, width=size, height=size)
            out = render(shifted, cam, bg=jnp.zeros(3), tile_capacity=256,
                         tile_chunk=16)
            img8 = (np.clip(np.asarray(out.image), 0, 1) * 255).astype(
                np.uint8)
            alpha = (np.clip(np.asarray(out.alpha), 0, 1) * 255).astype(
                np.uint8)
            rgba = np.concatenate([img8, alpha[..., None]], axis=-1)
            fname = f"r_{k:03d}"
            imageio.imwrite(os.path.join(root, split, fname + ".png"), rgba)
            frames.append({
                "file_path": f"./{split}/{fname}",
                "time": t,
                "transform_matrix": c2w_from_angle(angle).tolist(),
            })
        with open(os.path.join(root, f"transforms_{split}.json"), "w") as f:
            json.dump({"camera_angle_x": fov, "frames": frames}, f)

    emit("train", n_train)
    emit("test", n_test)
    return root


@pytest.mark.slow
def test_cli_train_render_metrics(tmp_path):
    data = write_blender_dataset(str(tmp_path / "data"))
    model_path = str(tmp_path / "out")

    import train as train_cli
    result = train_cli.main([
        "-s", data, "-m", model_path, "--eval", "--is_blender",
        "--trainer", "baseline", "--iterations", "30", "--warm_up", "10",
        "--sequence_length", "6", "--densify_from_iter", "1000",
        "--test_iterations", "30", "--save_iterations", "30",
        "--tile_capacity", "256", "--tile_chunk", "16", "--quiet",
        "--sh_degree", "1", "--position_lr_max_steps", "30"])
    assert result.best_psnr > 0
    assert os.path.exists(os.path.join(model_path, "cfg_args"))
    assert os.path.exists(os.path.join(
        model_path, "point_cloud", "iteration_30", "point_cloud.ply"))
    assert os.path.exists(os.path.join(
        model_path, "deform", "iteration_30", "deform.npz"))

    import render as render_cli
    render_cli.main(["-m", model_path, "--skip_train", "--mode", "render",
                     "--tile_capacity", "256", "--tile_chunk", "16"])
    test_dir = os.path.join(model_path, "test", "ours_30")
    assert len(os.listdir(os.path.join(test_dir, "renders"))) == 2
    assert len(os.listdir(os.path.join(test_dir, "gt"))) == 2

    import metrics as metrics_cli
    metrics_cli.main(["-m", model_path])
    with open(os.path.join(model_path, "results.json")) as f:
        results = json.load(f)
    assert "ours_30" in results
    assert results["ours_30"]["PSNR"] > 5.0


def test_blender_reader_roundtrip(tmp_path):
    """Reader must recover our render camera exactly."""
    from d3gs_tpu.data.dataset_readers import read_cameras_from_transforms
    from d3gs_tpu.data.cameras import camera_from_info

    data = write_blender_dataset(str(tmp_path / "data2"), n_train=2,
                                 n_test=1)
    infos = read_cameras_from_transforms(data, "transforms_train.json",
                                         False)
    assert len(infos) == 2
    cam = camera_from_info(infos[0])
    want = make_camera(0.0, width=64, height=64)
    np.testing.assert_allclose(np.asarray(cam.viewmatrix),
                               np.asarray(want.viewmatrix), atol=1e-5)
    np.testing.assert_allclose(np.asarray(cam.projmatrix),
                               np.asarray(want.projmatrix), atol=1e-5)


def test_sweep_runner(tmp_path):
    """train_loops.py: one flagship run + output subdir per sequence length
    (reference train_loops.py:46-68)."""
    import train_loops

    data = str(tmp_path / "data")
    write_blender_dataset(data, n_train=4, n_test=1, size=32)
    out = str(tmp_path / "sweep")
    train_loops.main([
        "-s", data, "-m", out, "--eval", "--is_blender", "--quiet",
        "--iterations", "8", "--warm_up", "4", "--num_cams_per_iter", "2",
        "--tile_capacity", "128", "--tile_chunk", "8",
        "--position_lr_max_steps", "8", "--sequence_lengths", "2", "4"])
    for seq in (2, 4):
        d = os.path.join(out, f"seq_{seq}")
        assert os.path.exists(os.path.join(d, "cfg_args"))
        assert os.path.isdir(os.path.join(d, "point_cloud", "iteration_8"))
