"""CLI: train with a live network viewer attached.

Counterpart of the reference train_gui.py / train_baseline.py's network_gui
hooks (:57-71): runs the baseline trainer while serving renders to a
SIBR-protocol client (d3gs_tpu/viewer/network_viewer.py) between
iterations. The reference's dearpygui in-process GUI is replaced by the
socket viewer — same protocol, works headless.
"""
from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from d3gs_tpu import config as C


def main(argv=None):
    parser = argparse.ArgumentParser()
    C.add_group_args(parser, C.ModelParams)
    C.add_group_args(parser, C.PipelineParams)
    C.add_group_args(parser, C.OptimizationParams)
    parser.add_argument("--ip", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=6009)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(argv)

    model_cfg = C.extract_group(args, C.ModelParams)
    pipe_cfg = C.extract_group(args, C.PipelineParams)
    opt_cfg = C.extract_group(args, C.OptimizationParams)

    import dataclasses
    import os

    from d3gs_tpu.data.cameras import Camera
    from d3gs_tpu.data.scene import Scene
    from d3gs_tpu.models.renderer import render
    from d3gs_tpu.train.baseline import train_baseline
    from d3gs_tpu.viewer import NetworkViewer

    if not model_cfg.model_path:
        model_cfg.model_path = "./output/gui"
    os.makedirs(model_cfg.model_path, exist_ok=True)
    scene = Scene(model_cfg, capacity=pipe_cfg.capacity, seed=args.seed)
    viewer = NetworkViewer(args.ip, args.port)
    print(f"network viewer listening on {args.ip}:{viewer.port}")

    state_box = {"state": scene.gaussians}

    def viewer_render(vcam, scale_mod):
        cam = Camera(
            viewmatrix=jnp.asarray(vcam.world_view_transform, jnp.float32),
            projmatrix=jnp.asarray(vcam.full_proj_transform, jnp.float32),
            campos=jnp.asarray(vcam.camera_center, jnp.float32),
            fid=jnp.asarray(0.0),
            image=jnp.zeros((vcam.height, vcam.width, 3)),
            width=vcam.width, height=vcam.height,
            fovx=vcam.fovx, fovy=vcam.fovy)
        out = render(state_box["state"], cam,
                     scaling_modifier=float(scale_mod),
                     bg=jnp.zeros(3),
                     tile_capacity=pipe_cfg.tile_capacity,
                     tile_chunk=pipe_cfg.tile_chunk)
        return np.asarray(out.image)

    # run training; serve the viewer between logged iterations via the
    # tb_writer hook (called every log_every)
    class ViewerHook:
        def add_scalar(self, *a, **k):
            viewer.serve_once(viewer_render, model_cfg.source_path)

        def add_image(self, *a, **k):
            pass

        def add_histogram(self, *a, **k):
            pass

    result = train_baseline(
        gaussians=scene.gaussians,
        train_cams=scene.get_train_cameras(),
        test_cams=scene.get_test_cameras(),
        cameras_extent=scene.cameras_extent,
        model_cfg=model_cfg, opt_cfg=opt_cfg, pipe_cfg=pipe_cfg,
        model_path=model_cfg.model_path, tb_writer=ViewerHook(),
        log_every=10, seed=args.seed)
    state_box["state"] = result.state
    # keep serving after training until the client disconnects
    print("training done; serving viewer (ctrl-c to exit)")
    try:
        while True:
            viewer.serve_once(viewer_render, model_cfg.source_path)
    except KeyboardInterrupt:
        viewer.close()


if __name__ == "__main__":
    main()
