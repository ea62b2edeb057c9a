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
