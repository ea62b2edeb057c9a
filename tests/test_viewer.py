"""Network viewer protocol round-trip + orbit camera sanity."""
import json
import socket
import threading
import time

import numpy as np

from d3gs_tpu.viewer import NetworkViewer, OrbitCamera


def test_orbit_camera():
    cam = OrbitCamera(64, 48, r=3.0)
    p0 = cam.pose.copy()
    cam.orbit(100, 0)
    assert not np.allclose(cam.pose, p0)
    cam.scale(1)
    assert cam.radius < 3.0
    v = cam.view
    np.testing.assert_allclose(v @ cam.pose, np.eye(4), atol=1e-5)
    assert cam.mvp.shape == (4, 4)


def test_network_viewer_roundtrip():
    viewer = NetworkViewer(port=0)
    got = {}

    def render_fn(cam, scale_mod):
        got["cam"] = cam
        got["scale"] = scale_mod
        return np.full((cam.height, cam.width, 3), 0.5, np.float32)

    def client():
        s = socket.create_connection(("127.0.0.1", viewer.port), timeout=10)
        msg = {
            "resolution_x": 8, "resolution_y": 4, "train": True,
            "fov_x": 1.0, "fov_y": 0.8, "z_near": 0.01, "z_far": 100.0,
            "shs_python": False, "rot_scale_python": False,
            "keep_alive": True, "scaling_modifier": 1.5,
            "view_matrix": list(np.eye(4).flatten().astype(float)),
            "view_projection_matrix": list(np.eye(4).flatten().astype(float)),
        }
        data = json.dumps(msg).encode()
        s.sendall(len(data).to_bytes(4, "little") + data)
        img = b""
        while len(img) < 8 * 4 * 3:
            img += s.recv(4096)
        verify_len = int.from_bytes(img[8 * 4 * 3:8 * 4 * 3 + 4] or
                                    s.recv(4), "little")
        got["img_len"] = len(img)
        s.close()

    t = threading.Thread(target=client)
    t.start()
    handled = False
    # accept is non-blocking (training loops poll it); give the client
    # thread time to actually connect between polls
    for _ in range(500):
        if viewer.serve_once(render_fn, verify="ok"):
            handled = True
            break
        time.sleep(0.01)
    t.join(timeout=10)
    viewer.close()
    assert handled
    assert got["cam"].width == 8 and got["cam"].height == 4
    assert got["scale"] == 1.5
    # sign flips applied
    wvt = got["cam"].world_view_transform
    np.testing.assert_allclose(np.diag(wvt), [1, -1, -1, 1], atol=1e-6)


def test_gui_headless_test_step():
    """The GUI logic (orbit interaction, fid animation, rgb/depth modes,
    FPS stats) works without dearpygui — test_step renders frames from a
    state exactly like the reference's test_step (train_gui.py:644-710)."""
    import jax.numpy as jnp

    from d3gs_tpu.viewer.gui import GUI
    from tests.test_train_static import gt_state

    st = gt_state(n=80, cap=256)
    gui = GUI(st, width=64, height=64, radius=3.0)
    gui.playing = False
    gui.fid = 0.25
    assert gui.current_fid() == 0.25
    gui.playing = True
    assert 0.0 <= gui.current_fid() < 1.0

    f1 = gui.test_step()
    assert f1.shape == (64, 64, 3) and np.isfinite(f1).all()
    assert gui.infer_ms > 0 and gui.fps > 0

    # orbit interaction must change the view
    gui.cam.orbit(120.0, 40.0)
    gui.cam.scale(1.0)
    gui.cam.pan(10.0, 5.0)
    f2 = gui.test_step()
    assert np.abs(f2 - f1).max() > 1e-4

    # depth display mode
    gui.mode = "depth"
    fd = gui.test_step()
    assert fd.shape == (64, 64, 3) and float(fd.max()) <= 1.0 + 1e-6
    assert np.abs(fd - f2).max() > 1e-4

    # deform_fn hook is applied
    calls = {}

    def deform_fn(xyz, fid):
        calls["fid"] = float(fid)
        return jnp.ones_like(xyz) * 0.3, 0.0, 0.0

    gui.mode = "rgb"
    gui.deform_fn = deform_fn
    gui.playing = False
    gui.fid = 0.5
    f3 = gui.test_step()
    assert calls["fid"] == 0.5
    assert np.abs(f3 - f2).max() > 1e-4


def test_gui_direct_compute_for_ode_checkpoints():
    """ODE-kind fields return ABSOLUTE positions; the GUI must render them
    with direct_compute so geometry is not displaced by xyz + y(t)."""
    import jax.numpy as jnp

    from d3gs_tpu.models.renderer import render
    from d3gs_tpu.viewer.gui import GUI
    from tests.test_train_static import gt_state

    st = gt_state(n=60, cap=256)
    shift = jnp.array([0.15, 0.0, 0.0])

    def ode_like_deform(xyz, fid):        # absolute positions
        return xyz + shift, 0.0, 0.0

    gui = GUI(st, width=64, height=64, radius=3.0,
              deform_fn=ode_like_deform, direct_compute=True)
    gui.playing = False
    frame = gui.test_step()

    # oracle: render the shifted cloud statically through the same camera
    cam = gui._camera()
    want = render(st.replace(params=st.params._replace(
        xyz=st.params.xyz + shift)), cam, bg=jnp.zeros(3))
    np.testing.assert_allclose(frame, np.clip(np.asarray(want.image), 0, 1),
                               atol=1e-5)
