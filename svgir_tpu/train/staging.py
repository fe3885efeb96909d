"""Device staging of camera image-plane tensors.

``make_camera`` keeps image/mask/depth/normal/mono tensors HOST-resident
(numpy) so scene loading never pushes hundreds of MB through the device
transport eagerly (see cameras.py:126-136).  But paying that transfer per
TRAIN STEP is the dominant trainer cost on a tunneled TPU: measured
2026-08-20 (tools/probe_trainer_gap.py, 100k gaussians, 800x800), the same
jitted step runs 38 ms/iter with device-resident cameras vs 213 ms/iter
re-uploading host numpy every step — the 25x trainer-vs-bench gap of
VERDICT r4.  The CUDA reference keeps all images GPU-resident for the same
reason (scene/cameras.py:38-57).

``stage_cameras`` moves the tensors to device ONCE, safely:

- transfers are SEQUENTIAL and SYNCED per camera (the relay aborts with
  INTERNAL when >1 GB of eager puts are in flight at load time; serial
  synced puts avoid that pattern),
- when the full-f32 residency would exceed ``bytes_budget``, tensors that
  round-trip losslessly through uint8 (i.e. came from 8-bit sources, as
  the reference's PNG GT does — utils/general_utils.py PILtoTorch / 255)
  are stored as uint8 on device and decoded by a tiny jit per use;
  lossy-to-quantize tensors stay f32,
- if even then the budget is exceeded, the remaining cameras stay
  host-resident (loud warning), and any transfer failure falls back to
  host-resident rather than crashing the run.

In the common case (fits in budget) staging is BIT-IDENTICAL to the
host-resident path: same f32 values, one-time transfer.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

FIELDS = ("image", "image_mask", "depth", "normal", "mono")


def _host_fields(cam) -> Dict[str, np.ndarray]:
    out = {}
    for f in FIELDS:
        a = getattr(cam, f)
        if a is not None and not isinstance(a, jax.Array):
            out[f] = np.asarray(a, np.float32)
    return out


def _u8_lossless(a: np.ndarray) -> bool:
    """True iff ``a`` is exactly k/255 everywhere (came from 8-bit data):
    round-tripping uint8 then changes no value beyond f32 representation."""
    if a.min() < 0.0 or a.max() > 1.0:
        return False
    s = a * np.float32(255.0)
    return float(np.abs(s - np.rint(s)).max()) <= 1e-3


@jax.jit
def _decode_u8(arrs):
    return {k: v.astype(jnp.float32) * (1.0 / 255.0)
            for k, v in arrs.items()}


class StagedCamera:
    """Camera whose quantizable tensors live on device as uint8; ``get()``
    decodes to f32 per use (one fused jit call) without keeping an f32 copy
    resident.  Under-budget staging returns plain Cameras instead."""

    __slots__ = ("cam", "packed")

    def __init__(self, cam, packed: Dict[str, jax.Array]):
        self.cam = cam          # Camera; packed fields hold their u8 arrays
        self.packed = packed

    def get(self):
        return dataclasses.replace(self.cam, **_decode_u8(self.packed))

    # camera_for_iter and logging only touch metadata — forward it
    def __getattr__(self, name):
        return getattr(self.cam, name)


def resolve(cam):
    """Materialize a StagedCamera into a Camera (no-op for Camera)."""
    return cam.get() if isinstance(cam, StagedCamera) else cam


def stage_cameras(cams: Sequence, *, bytes_budget: int = 4 << 30,
                  verbose: bool = True) -> List:
    """Return cameras with image-plane tensors resident on device.

    Elements are plain Cameras (f32 on device) or StagedCameras (uint8 on
    device + per-use decode).  Cameras whose tensors are already device
    arrays (or absent) pass through unchanged.
    """
    per_cam = [_host_fields(c) for c in cams]
    total_f32 = sum(a.nbytes for f in per_cam for a in f.values())
    if total_f32 == 0:
        return list(cams)

    use_u8 = total_f32 > bytes_budget
    if verbose:
        mode = "uint8-packed" if use_u8 else "f32"
        print(f"staging {len(cams)} cameras on device "
              f"({total_f32 / 1e6:.0f} MB as f32, mode={mode})", flush=True)

    staged: List = []
    spent = 0
    failed = False
    for cam, fields in zip(cams, per_cam):
        if not fields or failed:
            staged.append(cam)
            continue
        put_f32: Dict[str, jax.Array] = {}
        put_u8: Dict[str, jax.Array] = {}
        try:
            for name, a in fields.items():
                if use_u8 and _u8_lossless(a):
                    dev = jax.device_put(
                        np.rint(a * 255.0).astype(np.uint8))
                    put_u8[name] = dev
                else:
                    dev = jax.device_put(a)
                    put_f32[name] = dev
                jax.block_until_ready(dev)
                spent += dev.nbytes
            if spent > bytes_budget:
                raise MemoryError(
                    f"camera staging budget exceeded ({spent / 1e6:.0f} MB)")
        except Exception as exc:  # relay INTERNAL / OOM -> host fallback
            print(f"WARNING: camera staging stopped ({type(exc).__name__}: "
                  f"{exc}); remaining cameras stay host-resident "
                  "(slower per-step upload)", flush=True)
            failed = True
            staged.append(cam)
            continue
        new_cam = dataclasses.replace(cam, **put_f32, **put_u8) \
            if put_u8 else dataclasses.replace(cam, **put_f32)
        staged.append(StagedCamera(new_cam, put_u8) if put_u8 else new_cam)
    if verbose:
        print(f"staged {spent / 1e6:.0f} MB of camera tensors on device",
              flush=True)
    return staged
