"""Data layer: PLY codec roundtrips, Blender reader on a generated scene."""

import json
import math
import os

import numpy as np
import pytest

from svgir_tpu.data import ply as PLY
from svgir_tpu.data.readers import (load_scene, read_blender_scene,
                                    read_sfm_scene)


def test_ply_roundtrip(tmp_path):
    path = os.path.join(tmp_path, "pc.ply")
    rng = np.random.default_rng(0)
    xyz = rng.normal(size=(100, 3)).astype(np.float32)
    rgb = (rng.random((100, 3)) * 255).astype(np.float32)
    nrm = rng.normal(size=(100, 3)).astype(np.float32)
    PLY.store_pointcloud(path, xyz, rgb, nrm)
    pts, cols, normals = PLY.fetch_pointcloud(path)
    np.testing.assert_allclose(pts, xyz, atol=1e-6)
    np.testing.assert_allclose(cols * 255, rgb.astype(np.uint8), atol=1.0)
    np.testing.assert_allclose(normals, nrm, atol=1e-6)


def _write_blender_scene(root, n_frames=3, res=32, alpha=True):
    import imageio.v2 as imageio
    os.makedirs(os.path.join(root, "train"), exist_ok=True)
    frames = []
    for i in range(n_frames):
        a = 2 * math.pi * i / n_frames
        c2w = np.eye(4)
        c2w[:3, 3] = [3 * math.sin(a), 0, 3 * math.cos(a)]
        # look-at is irrelevant for the reader test; keep identity rotation
        frames.append({"file_path": f"./train/r_{i}",
                       "transform_matrix": c2w.tolist()})
        img = np.zeros((res, res, 4 if alpha else 3), np.uint8)
        img[8:24, 8:24, :3] = 200
        if alpha:
            img[8:24, 8:24, 3] = 255
        imageio.imwrite(os.path.join(root, "train", f"r_{i}.png"), img)
    with open(os.path.join(root, "transforms_train.json"), "w") as f:
        json.dump({"camera_angle_x": 0.8, "frames": frames}, f)


def test_blender_reader(tmp_path):
    _write_blender_scene(str(tmp_path))
    scene = read_blender_scene(str(tmp_path), white_background=False,
                               eval_split=False)
    assert len(scene.train_cameras) == 3
    cam = scene.train_cameras[0]
    assert cam.width == 32 and cam.height == 32
    assert cam.image.shape == (3, 32, 32)
    assert cam.image_mask.shape == (1, 32, 32)
    # alpha-premultiply over black bg: masked-out pixels are 0
    img = np.asarray(cam.image)
    mask = np.asarray(cam.image_mask)[0]
    assert img[:, mask < 0.5].max() == 0
    assert img[:, mask > 0.5].mean() > 0.5
    # random init cloud generated + extent = 1.1 * max center spread
    assert scene.points.shape == (100_000, 3)
    assert scene.cameras_extent > 0
    # dispatch picks the blender path
    scene2 = load_scene(str(tmp_path), white_background=False,
                        eval_split=False)
    assert len(scene2.train_cameras) == 3

    # multi-resolution camera scales (reference Scene resolution_scales
    # [1, 4, 8], scene/__init__.py:29; eval renders at 4, eval_nvs.py:133)
    c4 = scene.train_cameras_at(4)[0]
    assert (c4.width, c4.height) == (8, 8)
    assert c4.image.shape == (3, 8, 8) and c4.image_mask.shape == (1, 8, 8)
    assert c4.fovx == cam.fovx and c4.fovy == cam.fovy
    np.testing.assert_allclose(np.asarray(c4.image).mean(),
                               np.asarray(cam.image).mean(), atol=0.05)
    assert scene.train_cameras_at(1) is scene.train_cameras
    assert scene.train_cameras_at(4) is scene.train_cameras_at(4)  # cached


def _write_sfm_scene(root, n_cams=4, res=24):
    """Minimal render_relight/DTU layout: inputs/sfm_scene.json +
    inputs/model/sparse.ply + images + pmasks."""
    import imageio.v2 as imageio
    inputs = os.path.join(root, "inputs")
    os.makedirs(os.path.join(inputs, "images"), exist_ok=True)
    os.makedirs(os.path.join(inputs, "pmasks"), exist_ok=True)
    os.makedirs(os.path.join(inputs, "model"), exist_ok=True)

    bbox = np.diag([2.0, 3.0, 4.0, 1.0])
    bbox[:3, 3] = [0.1, 0.2, 0.3]
    images, file_paths = {}, {}
    fx, fy, cx, cy = 30.0, 32.0, res / 2 + 1, res / 2 - 1
    for i in range(n_cams):
        a = 2 * math.pi * i / n_cams
        c2w = np.eye(4)
        c2w[:3, 3] = [5 * math.sin(a), 0.0, 5 * math.cos(a)]
        extrinsic = np.linalg.inv(c2w)
        # index 2 is in the reference's DTU validation list
        images[str(i)] = {
            "flg": 2 if i != 3 else 0,    # cam 3 invalid -> skipped
            "camera": {
                "intrinsic": {"focal": [fx, fy], "ppt": [cx, cy]},
                "extrinsic": extrinsic.reshape(-1).tolist()}}
        file_paths[str(i)] = f"images/im_{i}.png"
        img = np.full((res, res, 3), 180, np.uint8)
        imageio.imwrite(os.path.join(inputs, "images", f"im_{i}.png"), img)
        m = np.zeros((res, res), np.uint8)
        m[4:20, 4:20] = 255
        imageio.imwrite(os.path.join(inputs, "pmasks", f"im_{i}.png"), m)
    with open(os.path.join(inputs, "sfm_scene.json"), "w") as f:
        json.dump({"bbox": {"transform": bbox.reshape(-1).tolist()},
                   "image_path": {"file_paths": file_paths},
                   "camera_track_map": {"images": images}}, f)
    rng = np.random.default_rng(0)
    xyz = rng.normal(size=(50, 3)).astype(np.float32)
    PLY.store_pointcloud(os.path.join(inputs, "model", "sparse.ply"),
                         xyz, rng.random((50, 3)) * 255,
                         np.zeros((50, 3), np.float32))
    return bbox, xyz


def test_sfm_scene_reader(tmp_path):
    bbox, xyz = _write_sfm_scene(str(tmp_path))
    scene = read_sfm_scene(str(tmp_path), eval_split=True)
    # cam 3 has flg != 2 -> dropped; index 2 goes to the test split
    assert len(scene.train_cameras) == 2
    assert len(scene.test_cameras) == 1
    assert scene.test_cameras[0].uid == 2
    cam = scene.train_cameras[0]
    assert cam.image.shape == (3, 24, 24)
    # pmask multiplies the image: outside the 4:20 square pixels are 0
    img, mask = np.asarray(cam.image), np.asarray(cam.image_mask)[0]
    assert img[:, mask < 0.5].max() == 0 and img[:, mask > 0.5].min() > 0.5
    # bbox diag is replaced by max(diag)/2 = 2.0 before inversion; points
    # map through inv: x' = (x - t) / 2
    bbox_eff = bbox.copy()
    bbox_eff[[0, 1, 2], [0, 1, 2]] = 2.0
    expect = (np.concatenate([xyz, np.ones_like(xyz[:, :1])], -1)
              @ np.linalg.inv(bbox_eff).T)[:, :3]
    np.testing.assert_allclose(scene.points, expect, atol=1e-5)
    # camera centers normalized the same way: extent reflects r=5 orbit / 2
    assert 1.5 < scene.cameras_extent < 4.0
    # center-shift projection in effect (cx offset breaks symmetry)
    full = np.asarray(cam.full_proj)
    assert abs(full[0, 2]) > 0 or abs(full[0, 3]) > 0
    # dispatch finds it
    scene2 = load_scene(str(tmp_path), eval_split=True)
    assert len(scene2.train_cameras) == 2


def test_cameras_json_dump(tmp_path):
    """cameras.json layout matches scene/__init__.py:78-83 +
    camera_utils.py:87-122 (position/rotation are camera-to-world)."""
    from svgir_tpu.data.readers import dump_cameras_json

    _write_blender_scene(str(tmp_path))
    scene = read_blender_scene(str(tmp_path), white_background=False,
                               eval_split=False)
    path = dump_cameras_json(str(tmp_path), scene)
    with open(path) as f:
        cams = json.load(f)
    assert len(cams) == 3
    c0, cam0 = cams[0], scene.train_cameras[0]
    assert set(c0) == {"id", "img_name", "width", "height", "position",
                       "rotation", "FoVx", "FoVy"}
    c2w = np.linalg.inv(np.asarray(cam0.world_view))
    np.testing.assert_allclose(c0["position"], c2w[:3, 3], atol=1e-5)
    np.testing.assert_allclose(np.array(c0["rotation"]), c2w[:3, :3],
                               atol=1e-5)
