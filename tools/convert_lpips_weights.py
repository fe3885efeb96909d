"""Convert torch LPIPS-vgg checkpoints to the svgir_tpu .npz format.

Inputs (both are plain torch state dicts; nothing is downloaded here):
  --vgg  torchvision VGG16 IMAGENET1K_V1 checkpoint (vgg16-397923af.pth)
  --lin  richzhang PerceptualSimilarity v0.1 linear weights (vgg.pth from
         lpips/weights/v0.1/ — keys ``lin{k}.model.1.weight``)

Output: an .npz with conv{idx}/w, conv{idx}/b (torchvision ``features``
indices) and lin0..lin4, loadable by svgir_tpu.eval.lpips_jax.LPIPSJax.

Usage:
  python tools/convert_lpips_weights.py --vgg vgg16-397923af.pth \
      --lin vgg.pth --out lpips_vgg.npz
"""

import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--vgg", required=True)
    ap.add_argument("--lin", required=True)
    ap.add_argument("--out", default="lpips_vgg.npz")
    args = ap.parse_args()

    import torch

    from svgir_tpu.eval.lpips_jax import VGG16_BLOCKS

    vgg = torch.load(args.vgg, map_location="cpu")
    lin = torch.load(args.lin, map_location="cpu")

    out = {}
    for blk in VGG16_BLOCKS:
        for idx in blk:
            out[f"conv{idx}/w"] = vgg[f"features.{idx}.weight"].numpy()
            out[f"conv{idx}/b"] = vgg[f"features.{idx}.bias"].numpy()
    for k in range(5):
        # richzhang naming: lin{k}.model.1.weight [1, C, 1, 1]
        for key in (f"lin{k}.model.1.weight", f"{k}.1.weight",
                    f"lin.{k}.1.weight"):
            if key in lin:
                out[f"lin{k}"] = lin[key].numpy().reshape(-1)
                break
        else:
            raise KeyError(f"linear head {k} not found in {args.lin}: "
                           f"{list(lin.keys())[:6]}")

    np.savez(args.out, **out)
    print(f"wrote {args.out}: {len(out)} arrays")


if __name__ == "__main__":
    main()
