"""Camera staging (train/staging.py): device residency, u8 packing, budget."""

import dataclasses

import jax
import numpy as np
import pytest

from svgir_tpu.cameras import look_at_camera
from svgir_tpu.train.staging import StagedCamera, resolve, stage_cameras


def _cam(res=16, img=None):
    cam = look_at_camera(eye=[0, 0, -3], target=[0, 0, 0], up=[0, -1, 0],
                         fovx=1.0, fovy=1.0, width=res, height=res)
    if img is None:
        img = np.random.default_rng(0).random((3, res, res)).astype(np.float32)
    return dataclasses.replace(cam, image=img,
                               image_mask=np.ones((1, res, res), np.float32))


def test_stage_f32_bit_identical():
    cam = _cam()
    (out,) = stage_cameras([cam], verbose=False)
    assert isinstance(out.image, jax.Array)
    assert out.image.dtype == np.float32
    np.testing.assert_array_equal(np.asarray(out.image), cam.image)
    assert resolve(out) is out          # plain Camera passes through


def test_stage_u8_lossless_roundtrip():
    # u8-representable image (PNG-derived GT shape) packs losslessly
    img = (np.arange(3 * 16 * 16).reshape(3, 16, 16) % 256) / 255.0
    cam = _cam(img=img.astype(np.float32))
    # budget below the 4 KB f32 total forces u8 packing; u8 fits
    (out,) = stage_cameras([cam], bytes_budget=2048, verbose=False)
    assert isinstance(out, StagedCamera)
    got = resolve(out)
    np.testing.assert_allclose(np.asarray(got.image), img, atol=1e-7)
    np.testing.assert_array_equal(np.asarray(got.image_mask), 1.0)
    # metadata forwards through the wrapper
    assert out.width == 16 and out.height == 16


def test_stage_u8_lossy_stays_f32():
    cam = _cam()   # random floats do NOT round-trip through u8
    (out,) = stage_cameras([cam], bytes_budget=3500, verbose=False)
    img = out.image if not isinstance(out, StagedCamera) else out.cam.image
    assert img.dtype == np.float32
    np.testing.assert_array_equal(np.asarray(resolve(out).image), cam.image)


def test_stage_skips_tensorless_cameras():
    cam = look_at_camera(eye=[0, 0, -3], target=[0, 0, 0], up=[0, -1, 0],
                         fovx=1.0, fovy=1.0, width=8, height=8)
    assert stage_cameras([cam], verbose=False) == [cam]
