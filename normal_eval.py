#!/usr/bin/env python
"""Normal-map MAE evaluation — the reference ``normal_eval.py`` equivalent.

Compares rendered normal PNGs against GT normal PNGs by mean angular error
(degrees), decoding the [0,1] PNG encoding back to [-1,1] vectors.
"""

import argparse
import glob
import os

import numpy as np


def get_mae(pred: np.ndarray, gt: np.ndarray) -> float:
    """normal_eval.py:11-18: mean angular error over valid GT pixels."""
    pred_v = pred * 2.0 - 1.0
    gt_v = gt * 2.0 - 1.0
    mask = np.linalg.norm(gt_v, axis=-1) > 0.5
    pred_n = pred_v / np.clip(np.linalg.norm(pred_v, axis=-1, keepdims=True),
                              1e-8, None)
    gt_n = gt_v / np.clip(np.linalg.norm(gt_v, axis=-1, keepdims=True),
                          1e-8, None)
    cos = np.clip((pred_n * gt_n).sum(-1), -1, 1)
    ang = np.degrees(np.arccos(cos))
    return float(ang[mask].mean())


def main(argv=None):
    import imageio.v2 as imageio

    parser = argparse.ArgumentParser()
    parser.add_argument("--pred_dir", required=True)
    parser.add_argument("--gt_dir", required=True)
    parser.add_argument("--pattern", default="*.png")
    args = parser.parse_args(argv)

    preds = sorted(glob.glob(os.path.join(args.pred_dir, args.pattern)))
    gts = sorted(glob.glob(os.path.join(args.gt_dir, args.pattern)))
    assert len(preds) == len(gts) and preds, \
        f"{len(preds)} pred vs {len(gts)} gt images"
    maes = []
    for p, g in zip(preds, gts):
        pred = np.asarray(imageio.imread(p)).astype(np.float32)[..., :3] / 255
        gt = np.asarray(imageio.imread(g)).astype(np.float32)[..., :3] / 255
        maes.append(get_mae(pred, gt))
    print(f"MAE: {np.mean(maes):.4f} deg over {len(maes)} images")


if __name__ == "__main__":
    main()
