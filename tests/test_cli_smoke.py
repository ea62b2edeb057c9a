"""Tiny smoke runs of the auxiliary CLIs (ode demos, synthetic-ODE
train/render, trajectory export) — artifact existence + finiteness."""
import os

import numpy as np
import pytest


def test_ode_demo_spiral(tmp_path):
    import ode_demo
    out = str(tmp_path / "demo")
    ode_demo.main(["--demo", "spiral", "--iterations", "10",
                   "--num_points", "24", "--batch_size", "4",
                   "--window", "4", "--out", out])
    assert os.path.isdir(out) and len(os.listdir(out)) > 0


def test_train_and_render_synth_ode(tmp_path):
    import render_synth_ode
    import train_synth_ode
    out = str(tmp_path / "synth")
    train_synth_ode.main(["--trajectory", "linear", "--num_points", "16",
                          "--iterations", "12", "--batch_size", "4",
                          "--window", "4", "--kind", "simple",
                          "--out", out, "--no_plot"])
    params = [f for f in os.listdir(out) if f.endswith(".npz")]
    assert params, os.listdir(out)
    render_synth_ode.main(["--trajectory", "linear", "--num_points", "16",
                           "--kind", "simple", "--out", out,
                           "--params", os.path.join(out, params[0])])
    assert any(f.endswith(".png") for f in os.listdir(out))


def test_sample_trajectories_cli(tmp_path):
    import sample_trajectories
    import train as train_cli
    from tests.test_cli_end_to_end import write_blender_dataset

    data = str(tmp_path / "data")
    write_blender_dataset(data, n_train=3, n_test=1, size=32)
    mp = str(tmp_path / "model")
    train_cli.main(["-s", data, "-m", mp, "--eval", "--is_blender",
                    "--trainer", "baseline", "--iterations", "6",
                    "--warm_up", "2", "--quiet", "--sh_degree", "0",
                    "--tile_capacity", "128", "--tile_chunk", "8",
                    "--test_iterations", "6", "--save_iterations", "6",
                    "--position_lr_max_steps", "6"])
    sample_trajectories.main(["-m", mp, "--num_timesteps", "5"])
    traj = np.load(os.path.join(mp, "trajectories.npy"))
    ts = np.load(os.path.join(mp, "timestamps.npy"))
    assert traj.shape[0] == 5 and traj.shape[2] == 3
    assert ts.shape == (5,)
    assert np.isfinite(traj).all()

    # render-only FPS benchmark branch (reference render_baseline.py:57-74)
    import render as render_cli
    render_cli.main(["-m", mp, "--skip_train", "--skip_test",
                     "--benchmark", "--mode", "render",
                     "--tile_capacity", "128", "--tile_chunk", "8"])


def test_distill_and_forecast_clis(tmp_path):
    """train_synth_gau.py from a trained baseline checkpoint, then
    forecast.py over exported trajectories — the reference's offline
    pipeline (components 11, 16, 17) end-to-end at toy scale."""
    import forecast as forecast_cli
    import sample_trajectories
    import train as train_cli
    import train_synth_gau
    from tests.test_cli_end_to_end import write_blender_dataset

    data = str(tmp_path / "data")
    write_blender_dataset(data, n_train=3, n_test=1, size=32)
    base = str(tmp_path / "base")
    train_cli.main(["-s", data, "-m", base, "--eval", "--is_blender",
                    "--trainer", "baseline", "--iterations", "6",
                    "--warm_up", "2", "--quiet", "--sh_degree", "0",
                    "--tile_capacity", "128", "--tile_chunk", "8",
                    "--test_iterations", "6", "--save_iterations", "6",
                    "--position_lr_max_steps", "6"])
    out = str(tmp_path / "distill")
    # the blender reader random-initializes 100k points (reference
    # :284-295); subsample the teacher via max_gaussians (reference load_ply
    # parity) to keep the CPU ODE rollout small
    train_synth_gau.main(["-s", data, "-m", out, "--is_blender", "--quiet",
                          "--base_model_path", base,
                          "--distill_iterations", "6", "--data_size", "4",
                          "--batch_time", "3", "--tile_capacity", "128",
                          "--tile_chunk", "8", "--test_iterations", "6",
                          "--max_gaussians", "512"])
    assert os.path.isdir(out)

    sample_trajectories.main(["-m", base, "--num_timesteps", "12"])
    fdir = str(tmp_path / "fc")
    forecast_cli.main(["--trajectories",
                       os.path.join(base, "trajectories.npy"),
                       "--output_dir", fdir, "--past_len", "4",
                       "--future_len", "2", "--stride", "2",
                       "--d_model", "16", "--epochs", "1",
                       "--batch_size", "8"])
    assert os.path.isdir(fdir) and len(os.listdir(fdir)) > 0


def test_convert_cli_command_assembly(tmp_path):
    """convert.py drives a fake colmap executable; verify the reference's
    command sequence (feature_extractor/exhaustive_matcher/mapper/
    image_undistorter, convert.py:30-96) plus the resize pyramid."""
    import subprocess
    import sys as _sys

    import imageio.v2 as imageio

    src = tmp_path / "scene"
    (src / "input").mkdir(parents=True)
    img = np.zeros((16, 16, 3), np.uint8)
    imageio.imwrite(str(src / "input" / "0.png"), img)

    log = tmp_path / "calls.log"
    fake = tmp_path / "fake_colmap"
    fake.write_text(
        "#!/bin/sh\n"
        f"echo \"$@\" >> {log}\n"
        # image_undistorter must create images/ + sparse/ like colmap does
        "case \"$1\" in image_undistorter)\n"
        f"  mkdir -p {src}/images {src}/sparse\n"
        f"  cp {src}/input/0.png {src}/images/0.png\n"
        f"  touch {src}/sparse/cameras.bin ;;\n"
        "esac\n")
    fake.chmod(0o755)

    import convert
    convert.main(["-s", str(src), "--colmap_executable", str(fake),
                  "--no_gpu", "--resize"])
    calls = log.read_text().splitlines()
    subcmds = [c.split()[0] for c in calls]
    assert subcmds == ["feature_extractor", "exhaustive_matcher", "mapper",
                       "image_undistorter"]
    assert "--SiftExtraction.use_gpu 0" in calls[0]
    # moved into sparse/0 and resize pyramid emitted
    assert os.path.exists(os.path.join(src, "sparse", "0", "cameras.bin"))
    for div in (2, 4, 8):
        out = os.path.join(src, f"images_{div}", "0.png")
        assert os.path.exists(out)
        assert imageio.imread(out).shape[0] == 16 // div
