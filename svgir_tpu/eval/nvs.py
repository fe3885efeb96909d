"""Novel-view-synthesis evaluation — ``eval_nvs.py`` equivalent.

Renders train/test views through the active render mode, computes PSNR /
SSIM (/ LPIPS when weights exist), writes per-view renders + auxiliary
buffers and a metrics summary.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from svgir_tpu.eval import metrics as M


def save_image(path: str, img) -> None:
    import imageio.v2 as imageio
    arr = np.asarray(img)
    if arr.ndim == 3 and arr.shape[0] in (1, 3):
        arr = arr.transpose(1, 2, 0)
    if arr.shape[-1] == 1:
        arr = arr[..., 0]
    imageio.imwrite(path, (np.clip(arr, 0, 1) * 255).astype(np.uint8))


def render_set(out_dir: str, name: str, cameras: List, render_one,
               save_buffers: tuple = ("render", "depth", "opacity"),
               lpips_weights: Optional[str] = None) -> Dict:
    """eval_nvs.py render_set (:29-90): render each view, metric vs GT."""
    img_dir = os.path.join(out_dir, name, "renders")
    gt_dir = os.path.join(out_dir, name, "gt")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(gt_dir, exist_ok=True)

    psnrs, ssims, lpipss = [], [], []
    warned_overflow = False
    for idx, cam in enumerate(cameras):
        res = render_one(cam)
        if (not warned_overflow and "overflow" in res
                and bool(jnp.any(res["overflow"]))):
            warned_overflow = True
            print(f"WARNING: instance-buffer overflow rendering {name} "
                  f"view {idx}: splats were dropped — raise "
                  "--max_instances", flush=True)
        pred = jnp.clip(res["render"], 0, 1)
        gt = cam.image
        psnrs.append(M.psnr(pred, gt))
        ssims.append(M.ssim(pred, gt))
        lp = M.lpips(pred, gt, lpips_weights)
        if lp is not None:
            lpipss.append(lp)
        save_image(os.path.join(img_dir, f"{idx:05d}.png"), pred)
        save_image(os.path.join(gt_dir, f"{idx:05d}.png"), gt)
        for key in save_buffers:
            if key == "render" or key not in res:
                continue
            buf = res[key]
            if key == "depth":
                d = np.asarray(buf)[0]
                rng = d.max() - d.min() + 1e-8
                buf = ((d - d.min()) / rng)[None]
            elif key in ("normal", "pseudo_normal"):
                buf = buf * 0.5 + 0.5      # train.py:403 save convention
            save_image(os.path.join(img_dir, f"{idx:05d}_{key}.png"), buf)

    available, note = M.lpips_status(lpips_weights)
    out = {
        "psnr": float(np.mean(psnrs)) if psnrs else float("nan"),
        "ssim": float(np.mean(ssims)) if ssims else float("nan"),
        # loud absence: never a silently-missing column (VERDICT r3 item 3)
        "lpips": float(np.mean(lpipss)) if lpipss else note,
        "n_views": len(cameras),
    }
    with open(os.path.join(out_dir, name, "metrics.json"), "w") as f:
        json.dump(out, f, indent=2)
    # reference-layout text twin (eval_nvs.py:86-89 metric_<set>.txt /
    # train.py:421-424 eval.txt) for drop-in consumers
    with open(os.path.join(out_dir, f"metric_{name}.txt"), "w") as f:
        f.write(f"psnr: {out['psnr']}\n")
        f.write(f"ssim: {out['ssim']}\n")
        f.write(f"lpips: {out['lpips']}\n")
    return out


def save_training_vis(out_dir: str, iteration: int, results: Dict,
                      gt_image=None) -> None:
    """Training visualization grid (train.py save_training_vis :319-363):
    tiles the available buffers side by side into one PNG."""
    import numpy as np

    tiles = []
    keys = ["render", "pbr", "base_color", "roughness", "diffuse",
            "local_lights", "visibility", "normal", "pseudo_normal",
            "depth", "opacity"]
    for key in keys:
        if key not in results:
            continue
        img = np.asarray(results[key])
        if key == "depth":
            d = img[0]
            rng = d.max() - d.min() + 1e-8
            img = np.stack([(d - d.min()) / rng] * 3)
        elif key in ("normal", "pseudo_normal"):
            img = img * 0.5 + 0.5
        elif img.shape[0] == 1:
            img = np.repeat(img, 3, 0)
        tiles.append(np.clip(img[:3], 0, 1))
    if gt_image is not None:
        tiles.insert(0, np.asarray(gt_image))
    if not tiles:
        return
    grid = np.concatenate(tiles, axis=2)   # side by side
    os.makedirs(out_dir, exist_ok=True)
    save_image(os.path.join(out_dir, f"iter_{iteration:06d}.png"), grid)
