"""Dataset-reader coverage beyond Blender: COLMAP (bin + txt), Nerfies
(vrig + interp split rules), DTU projection decomposition, Plenoptic Video
poses_bounds, dynamic360 — each against a synthetic fixture with known
geometry (SURVEY.md §7.2 'byte-identical camera matrices vs reference
loader' test strategy)."""
import json
import math
import os

import numpy as np
import pytest

from d3gs_tpu.data import colmap_loader as cl
from d3gs_tpu.data import dataset_readers as dr


def _write_png(path, h=8, w=8, value=128):
    import imageio.v2 as imageio
    img = np.full((h, w, 3), value, np.uint8)
    imageio.imwrite(path, img)


def _rot(angle):
    c, s = math.cos(angle), math.sin(angle)
    return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])


# ---------------------------------------------------------------------------
# COLMAP
# ---------------------------------------------------------------------------

def _make_colmap_fixture(root, text=False):
    sparse = os.path.join(root, "sparse/0")
    os.makedirs(sparse, exist_ok=True)
    imgdir = os.path.join(root, "images")
    os.makedirs(imgdir, exist_ok=True)

    cams = {1: cl.ColmapCamera(id=1, model="PINHOLE", width=8, height=8,
                               params=np.array([10.0, 12.0, 4.0, 4.0]))}
    images = {}
    rng = np.random.default_rng(0)
    for i in range(3):
        R = _rot(0.3 * i)
        q = cl.rotmat2qvec(R)
        t = rng.normal(size=3)
        images[i + 1] = cl.ColmapImage(
            id=i + 1, qvec=q, tvec=t, camera_id=1, name=f"{i}.png",
            xys=np.zeros((0, 2)), point3D_ids=np.zeros((0,), np.int64))
        _write_png(os.path.join(imgdir, f"{i}.png"))
    xyz = rng.normal(size=(5, 3))
    rgb = rng.integers(0, 255, (5, 3)).astype(np.uint8)
    if text:
        with open(os.path.join(sparse, "cameras.txt"), "w") as f:
            f.write("# comment\n1 PINHOLE 8 8 10.0 12.0 4.0 4.0\n")
        with open(os.path.join(sparse, "images.txt"), "w") as f:
            f.write("# comment\n")
            for i, im in images.items():
                q, t = im.qvec, im.tvec
                f.write(f"{i} {q[0]} {q[1]} {q[2]} {q[3]} "
                        f"{t[0]} {t[1]} {t[2]} 1 {im.name}\n\n")
        with open(os.path.join(sparse, "images.txt"), "a") as f:
            f.write("\n")            # trailing blank line (regression)
        with open(os.path.join(sparse, "points3D.txt"), "w") as f:
            f.write("# comment\n")
            for j in range(5):
                f.write(f"{j + 1} {xyz[j, 0]} {xyz[j, 1]} {xyz[j, 2]} "
                        f"{rgb[j, 0]} {rgb[j, 1]} {rgb[j, 2]} 0.5\n")
    else:
        cl.write_cameras_binary(os.path.join(sparse, "cameras.bin"), cams)
        cl.write_images_binary(os.path.join(sparse, "images.bin"), images)
        cl.write_points3d_binary(os.path.join(sparse, "points3D.bin"),
                                 xyz, rgb)
    return cams, images, xyz, rgb


@pytest.mark.parametrize("text", [False, True])
def test_colmap_scene_reader(tmp_path, text):
    root = str(tmp_path)
    cams, images, xyz, rgb = _make_colmap_fixture(root, text=text)
    scene = dr.read_colmap_scene(root, eval_split=True, llffhold=2)
    infos = scene.train_cameras + scene.test_cameras
    assert len(infos) == 3
    # llffhold=2: even indices test, odd train (reference :184-188)
    assert len(scene.test_cameras) == 2 and len(scene.train_cameras) == 1

    by_name = {c.image_name: c for c in infos}
    for i in range(3):
        c = by_name[str(i)]
        R_exp = cl.qvec2rotmat(images[i + 1].qvec).T
        np.testing.assert_allclose(c.R, R_exp, atol=1e-12)
        np.testing.assert_allclose(c.T, images[i + 1].tvec, atol=1e-12)
        # PINHOLE: fovx from fx=10, fovy from fy=12 (reference :150-152)
        assert c.fovx == pytest.approx(2 * math.atan(8 / (2 * 10.0)))
        assert c.fovy == pytest.approx(2 * math.atan(8 / (2 * 12.0)))
        assert c.fid == pytest.approx(i / 2)    # int name / (n-1)
    # point cloud written + read through the PLY cache
    assert scene.point_cloud.points.shape == (5, 3)
    np.testing.assert_allclose(scene.point_cloud.points, xyz, atol=1e-6)


def test_colmap_binary_text_parsers_agree(tmp_path):
    b = os.path.join(tmp_path, "bin")
    t = os.path.join(tmp_path, "txt")
    os.makedirs(b), os.makedirs(t)
    _make_colmap_fixture(b, text=False)
    _make_colmap_fixture(t, text=True)
    cb = cl.read_cameras_binary(os.path.join(b, "sparse/0/cameras.bin"))
    ct = cl.read_cameras_text(os.path.join(t, "sparse/0/cameras.txt"))
    ib = cl.read_images_binary(os.path.join(b, "sparse/0/images.bin"))
    it = cl.read_images_text(os.path.join(t, "sparse/0/images.txt"))
    assert cb[1].model == ct[1].model == "PINHOLE"
    np.testing.assert_allclose(cb[1].params, ct[1].params)
    for k in ib:
        np.testing.assert_allclose(ib[k].qvec, it[k].qvec, atol=1e-12)
        np.testing.assert_allclose(ib[k].tvec, it[k].tvec, atol=1e-12)
        assert ib[k].name == it[k].name


# ---------------------------------------------------------------------------
# Nerfies / HyperNeRF
# ---------------------------------------------------------------------------

def _make_nerfies_fixture(parent, kind, ids, train_ids=None, val_ids=None):
    """kind decides the PARENT directory name (vrig_*/interp_* drive the
    split rules, reference :411-430)."""
    root = os.path.join(parent, f"{kind}_scene", "data")
    os.makedirs(os.path.join(root, "camera"), exist_ok=True)
    ratio = {"vrig": 0.25, "interp": 0.5}[kind]
    sub = int(1 / ratio)
    os.makedirs(os.path.join(root, "rgb", f"{sub}x"), exist_ok=True)
    with open(os.path.join(root, "scene.json"), "w") as f:
        json.dump({"scale": 2.0, "center": [0.1, 0.2, 0.3]}, f)
    meta = {i: {"time_id": k} for k, i in enumerate(ids)}
    with open(os.path.join(root, "metadata.json"), "w") as f:
        json.dump(meta, f)
    ds = {"ids": ids}
    if train_ids is not None:
        ds["train_ids"], ds["val_ids"] = train_ids, val_ids
    with open(os.path.join(root, "dataset.json"), "w") as f:
        json.dump(ds, f)
    rng = np.random.default_rng(1)
    for i in ids:
        R = _rot(0.2)
        cam = {"orientation": R.tolist(),
               "position": rng.normal(size=3).tolist(),
               "focal_length": 20.0,
               "principal_point": [4.0, 4.0],
               "image_size": [8 * sub, 8 * sub]}
        with open(os.path.join(root, "camera", f"{i}.json"), "w") as f:
            json.dump(cam, f)
        _write_png(os.path.join(root, "rgb", f"{sub}x", f"{i}.png"))
    np.save(os.path.join(root, "points.npy"), rng.normal(size=(6, 3)))
    return root


def test_nerfies_vrig_split_and_geometry(tmp_path):
    ids = [f"im{i}" for i in range(4)]
    root = _make_nerfies_fixture(str(tmp_path), "vrig", ids,
                                 train_ids=ids[:3], val_ids=ids[3:])
    scene = dr.read_nerfies_scene(root, eval_split=True)
    assert len(scene.train_cameras) == 3 and len(scene.test_cameras) == 1
    c0 = scene.train_cameras[0]
    # vrig ratio 0.25: focal scaled to 5 on an 8px image
    assert c0.fovx == pytest.approx(2 * math.atan(8 / (2 * 20.0 * 0.25)))
    # fid normalized by the max time_id over the selected images
    fids = [c.fid for c in scene.train_cameras + scene.test_cameras]
    assert max(fids) == pytest.approx(1.0) and min(fids) == 0.0
    # position/center/scale composition (reference :437-441)
    with open(os.path.join(root, "camera", "im0.json")) as f:
        cj = json.load(f)
    pos = (np.array(cj["position"]) - np.array([0.1, 0.2, 0.3])) * 2.0
    ori = np.array(cj["orientation"]).T      # reference :457
    np.testing.assert_allclose(c0.T, -pos @ ori, atol=1e-6)
    np.testing.assert_allclose(c0.R, ori, atol=1e-12)


def test_nerfies_interp_split_rule(tmp_path):
    ids = [f"f{i:02d}" for i in range(8)]
    root = _make_nerfies_fixture(str(tmp_path), "interp", ids)
    scene = dr.read_nerfies_scene(root, eval_split=True)
    # interp: train = ids[::4] (2 of 8), val = ids[2::4] (2 of 8)
    assert len(scene.train_cameras) == 2
    assert len(scene.test_cameras) == 2
    assert [c.image_name for c in scene.train_cameras] == ["f00", "f04"]
    assert [c.image_name for c in scene.test_cameras] == ["f02", "f06"]


# ---------------------------------------------------------------------------
# DTU
# ---------------------------------------------------------------------------

def test_dtu_projection_decomposition_roundtrip(tmp_path):
    root = str(tmp_path)
    os.makedirs(os.path.join(root, "image"))
    K = np.array([[20.0, 0, 4.0], [0, 22.0, 4.0], [0, 0, 1.0]])
    mats = {}
    rng = np.random.default_rng(2)
    centers = []
    for i in range(2):
        R = _rot(0.4 * i + 0.1)         # world-to-cam rotation
        center = rng.normal(size=3)
        t = -R @ center
        P = K @ np.concatenate([R, t[:, None]], axis=1)
        w = np.eye(4)
        w[:3, :4] = P
        mats[f"world_mat_{i}"] = w
        mats[f"scale_mat_{i}"] = np.eye(4)
        centers.append(center)
        _write_png(os.path.join(root, "image", f"{i:03d}.png"))
    np.savez(os.path.join(root, "cameras_sphere.npz"), **mats)
    scene = dr.read_dtu_scene(root)
    assert len(scene.train_cameras) == 2
    for i, c in enumerate(scene.train_cameras):
        assert c.fovx == pytest.approx(2 * math.atan(8 / (2 * 20.0)),
                                       rel=1e-5)
        assert c.fovy == pytest.approx(2 * math.atan(8 / (2 * 22.0)),
                                       rel=1e-5)
        # recovered camera center: -R @ T must equal the constructed one
        np.testing.assert_allclose(c.R @ -c.T if False else
                                   -(c.R @ c.T), centers[i], atol=1e-5)


# ---------------------------------------------------------------------------
# Plenoptic Video
# ---------------------------------------------------------------------------

def test_plenoptic_scene_split_and_fids(tmp_path):
    root = str(tmp_path)
    n_cams, n_frames = 3, 4
    rng = np.random.default_rng(3)
    poses = np.zeros((n_cams, 3, 5))
    for i in range(n_cams):
        c2w = np.eye(4)
        c2w[:3, :3] = _rot(0.2 * i)
        c2w[:3, 3] = rng.normal(size=3)
        # LLFF convention: columns [-y, x, z] of the stored pose map back
        # through the reader's [1:2, -0:1, 2:4] shuffle
        poses[i, :, 0] = -c2w[:3, 1]
        poses[i, :, 1] = c2w[:3, 0]
        poses[i, :, 2:4] = c2w[:3, 2:4]
        poses[i, :, 4] = [8, 8, 21.0]   # H, W, focal
    pb = np.concatenate([poses.reshape(n_cams, 15),
                         np.tile([0.1, 10.0], (n_cams, 1))], axis=1)
    np.save(os.path.join(root, "poses_bounds.npy"), pb)
    for i in range(n_cams):
        d = os.path.join(root, "frames", f"cam{i:02d}")
        os.makedirs(d)
        for f in range(n_frames):
            _write_png(os.path.join(d, f"{f:04d}.png"))
    scene = dr.read_plenoptic_scene(root, eval_split=True,
                                    num_images=n_frames, hold_id=(0,))
    # camera 0 held out: test has its frames, train the other two cameras
    assert len(scene.test_cameras) == n_frames
    assert len(scene.train_cameras) == 2 * n_frames
    fids = sorted({c.fid for c in scene.train_cameras})
    assert fids[0] == 0.0 and fids[-1] == pytest.approx(1.0)
    c = scene.train_cameras[0]
    assert c.fovx == pytest.approx(2 * math.atan(8 / (2 * 21.0)))


# ---------------------------------------------------------------------------
# dynamic360 + registry
# ---------------------------------------------------------------------------

def test_dynamic360_reader(tmp_path):
    root = str(tmp_path)
    os.makedirs(root, exist_ok=True)
    frames = []
    for i in range(2):
        c2w = np.eye(4)
        c2w[:3, :3] = _rot(0.5 * i)
        c2w[2, 3] = 4.0
        _write_png(os.path.join(root, f"r_{i}.png"))
        frames.append({"file_path": f"./r_{i}", "time": i,
                       "transform_matrix": c2w.tolist()})
    with open(os.path.join(root, "transforms.json"), "w") as f:
        json.dump({"camera_angle_x": 0.8, "frames": frames}, f)
    scene = dr.read_dynamic360_scene(root)
    assert len(scene.train_cameras) == 2
    assert scene.train_cameras[0].fovx == pytest.approx(0.8)


def test_registry_has_all_reference_types():
    assert set(dr.scene_load_type_callbacks) == {
        "colmap", "blender", "dtu", "nerfies", "plenoptic", "dynamic360"}
