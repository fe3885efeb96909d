"""Data layer: PLY codec roundtrips, Blender reader on a generated scene."""

import json
import math
import os

import numpy as np
import pytest

from svgir_tpu.data import ply as PLY
from svgir_tpu.data.readers import load_scene, read_blender_scene


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
