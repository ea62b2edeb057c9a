"""CLI: interactive GUI trainer / viewer.

Counterpart of the reference train_gui.py: an in-process dearpygui GUI
(orbit/pan/zoom interaction, wall-clock-animated fid, depth mode, FPS
overlay — reference :524-710 + utils/gui_utils.py) interleaved with the
baseline training loop, falling back to the SIBR-protocol socket viewer
(d3gs_tpu/viewer/network_viewer.py, reference network_gui hooks
train_baseline.py:57-71) when dearpygui is not installed or --no_gui is
given. `--view_only` skips training and views a trained checkpoint
(gaussians + deform weights at --iteration).
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
    parser.add_argument("--gui", action="store_true",
                        help="force the dearpygui front-end (default: use "
                             "it when importable, else socket viewer)")
    parser.add_argument("--no_gui", action="store_true",
                        help="force the headless socket viewer")
    parser.add_argument("--view_only", action="store_true",
                        help="no training: view the trained checkpoint in "
                             "--model_path at --iteration")
    parser.add_argument("--iteration", type=int, default=-1)
    parser.add_argument("--gui_size", type=int, default=800)
    parser.add_argument("--radius", type=float, default=2.5)
    args = parser.parse_args(argv)

    model_cfg = C.extract_group(args, C.ModelParams)
    pipe_cfg = C.extract_group(args, C.PipelineParams)
    opt_cfg = C.extract_group(args, C.OptimizationParams)

    import dataclasses  # noqa: F401
    import os

    from d3gs_tpu.data.cameras import Camera
    from d3gs_tpu.data.scene import Scene
    from d3gs_tpu.models.renderer import render
    from d3gs_tpu.viewer.gui import GUI

    use_gui = args.gui or (not args.no_gui and GUI.available())
    if args.gui and not GUI.available():
        raise SystemExit("--gui requested but dearpygui is not installed "
                         "(optional dependency); drop --gui for the "
                         "socket viewer")

    if not model_cfg.model_path:
        model_cfg.model_path = "./output/gui"
    os.makedirs(model_cfg.model_path, exist_ok=True)

    def jitted_view_render(direct: bool = False):
        tc, tk = pipe_cfg.tile_capacity, pipe_cfg.tile_chunk

        @jax.jit
        def _r(state, cam, dx, dr, ds):
            # ODE-kind fields return ABSOLUTE positions (render.py:53-56)
            return render(state, cam, d_xyz=dx, d_rotation=dr,
                          d_scaling=ds, direct_compute=direct,
                          bg=jnp.zeros(3),
                          tile_capacity=tc, tile_chunk=tk)
        return _r

    if args.view_only:
        # ---- trained-scene viewer (reference test_step-only flow) ----
        from d3gs_tpu.models.deform import create_deform_field
        from d3gs_tpu.models.deform.fields import load_deform_weights
        from d3gs_tpu.train.flagship import pick_field_spec

        scene = Scene(model_cfg, load_iteration=args.iteration,
                      shuffle=False, capacity=pipe_cfg.capacity)
        spec = pick_field_spec(model_cfg, opt_cfg)
        dstate, field = create_deform_field(spec, jax.random.PRNGKey(0),
                                            opt_cfg)
        dstate = load_deform_weights(model_cfg.model_path, dstate,
                                     args.iteration)
        d_params = dstate.params
        direct = spec.kind in ("ode", "simple", "simple_start")

        def deform_fn(xyz, fid):
            return field.step(d_params, xyz, fid, y0=xyz)

        gui = GUI(scene.gaussians, width=args.gui_size,
                  height=args.gui_size, radius=args.radius,
                  deform_fn=jax.jit(deform_fn),
                  render_fn=jitted_view_render(direct),
                  direct_compute=direct,
                  n_frames=len(scene.get_train_cameras()))
        if use_gui:
            print(f"viewing {model_cfg.model_path} "
                  f"(iteration {scene.loaded_iter})")
            gui.run()
        else:
            _serve_socket(args, model_cfg, pipe_cfg, gui)
        return

    # ---- GUI / socket-viewer trainer ---------------------------------
    from d3gs_tpu.train.baseline import train_baseline

    scene = Scene(model_cfg, capacity=pipe_cfg.capacity, seed=args.seed)
    gui = GUI(scene.gaussians, width=args.gui_size, height=args.gui_size,
              radius=args.radius, render_fn=jitted_view_render(),
              n_frames=len(scene.get_train_cameras()))

    if use_gui:
        gui.setup()

        def live_hook(state, deform_state, field, iteration):
            gui.state = state
            if deform_state is not None:
                dp = deform_state.params
                gui.deform_fn = lambda xyz, fid: field.step(dp, xyz, fid,
                                                            y0=xyz)
            gui.pump()

        serve_after = gui
    else:
        from d3gs_tpu.viewer import NetworkViewer
        viewer = NetworkViewer(args.ip, args.port)
        print(f"network viewer listening on {args.ip}:{viewer.port}")

        def viewer_render_for(state):
            def viewer_render(vcam, scale_mod):
                cam = Camera(
                    viewmatrix=jnp.asarray(vcam.world_view_transform,
                                           jnp.float32),
                    projmatrix=jnp.asarray(vcam.full_proj_transform,
                                           jnp.float32),
                    campos=jnp.asarray(vcam.camera_center, jnp.float32),
                    fid=jnp.asarray(0.0),
                    image=jnp.zeros((vcam.height, vcam.width, 3)),
                    width=vcam.width, height=vcam.height,
                    fovx=vcam.fovx, fovy=vcam.fovy)
                out = render(state, cam,
                             scaling_modifier=float(scale_mod),
                             bg=jnp.zeros(3),
                             tile_capacity=pipe_cfg.tile_capacity,
                             tile_chunk=pipe_cfg.tile_chunk)
                return np.asarray(out.image)
            return viewer_render

        def live_hook(state, deform_state, field, iteration):
            viewer.serve_once(viewer_render_for(state),
                              model_cfg.source_path)

        serve_after = None

    result = train_baseline(
        gaussians=scene.gaussians,
        train_cams=scene.get_train_cameras(),
        test_cams=scene.get_test_cameras(),
        cameras_extent=scene.cameras_extent,
        model_cfg=model_cfg, opt_cfg=opt_cfg, pipe_cfg=pipe_cfg,
        model_path=model_cfg.model_path, log_every=10, seed=args.seed,
        live_hook=live_hook)

    if serve_after is not None:
        serve_after.state = result.state
        print("training done; interactive view (close window to exit)")
        while serve_after.pump():
            pass
        serve_after._dpg.destroy_context()
    else:
        print("training done; serving viewer (ctrl-c to exit)")
        try:
            while True:
                viewer.serve_once(viewer_render_for(result.state),
                                  model_cfg.source_path)
        except KeyboardInterrupt:
            viewer.close()


def _serve_socket(args, model_cfg, pipe_cfg, gui):
    """Headless fallback for --view_only: serve the trained scene over the
    SIBR socket protocol, ignoring orbit state (the client drives poses)."""
    from d3gs_tpu.viewer import NetworkViewer
    viewer = NetworkViewer(args.ip, args.port)
    print(f"dearpygui unavailable: socket viewer on {args.ip}:{viewer.port}")

    import jax.numpy as jnp

    from d3gs_tpu.data.cameras import Camera
    from d3gs_tpu.models.renderer import render

    def viewer_render(vcam, scale_mod):
        cam = Camera(
            viewmatrix=jnp.asarray(vcam.world_view_transform, jnp.float32),
            projmatrix=jnp.asarray(vcam.full_proj_transform, jnp.float32),
            campos=jnp.asarray(vcam.camera_center, jnp.float32),
            fid=jnp.asarray(gui.current_fid(), jnp.float32),
            image=jnp.zeros((vcam.height, vcam.width, 3)),
            width=vcam.width, height=vcam.height,
            fovx=vcam.fovx, fovy=vcam.fovy)
        dx, dr, ds = (gui.deform_fn(gui.state.params.xyz, cam.fid)
                      if gui.deform_fn is not None else (0.0, 0.0, 0.0))
        out = render(gui.state, cam, d_xyz=dx, d_rotation=dr, d_scaling=ds,
                     direct_compute=gui.direct_compute
                     and gui.deform_fn is not None,
                     scaling_modifier=float(scale_mod), bg=jnp.zeros(3),
                     tile_capacity=pipe_cfg.tile_capacity,
                     tile_chunk=pipe_cfg.tile_chunk)
        return np.asarray(out.image)

    try:
        while True:
            viewer.serve_once(viewer_render, model_cfg.source_path)
    except KeyboardInterrupt:
        viewer.close()


if __name__ == "__main__":
    main()
