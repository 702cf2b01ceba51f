"""Offline converter: torch VGG16 (+ LPIPS linear heads) -> ldm3d .npz.

The reference loads pretrained LPIPS weights from exported TF checkpoints
(./models/vgg, ./models/lin — reference vqgan_attn_cp.py:654-658,
models/lpips_tensorflow.py:114-181). This environment has no network
egress, so ldm3d's LPIPS falls back to a deterministic random init; on a
machine with the weights available, run this script once and point
LDM3D_LPIPS_WEIGHTS (or `load_lpips_params(path)`) at the output.

Inputs (either or both):
  --vgg  path to a torchvision VGG16 state_dict (.pth), keys
         `features.{idx}.weight/bias` with the standard layer indexing
  --lins path to an LPIPS (richzhang/PerceptualSimilarity) state_dict with
         keys `lin{i}.model.1.weight`

Output: one .npz of flat `module/path/param` arrays matching
ldm3d.models.lpips.LPIPS's parameter tree:
  vgg/block{b}_conv{c}/kernel [kh,kw,cin,cout], .../bias [cout]
  lin{i}/kernel [1,1,cin,1]

Usage: python tools/export_lpips_weights.py --vgg vgg16.pth \
           --lins lpips_vgg.pth --out lpips_weights.npz
"""

from __future__ import annotations

import argparse

import numpy as np

# torchvision vgg16 `features` indices of the conv layers, in LPIPS order
_TORCH_CONV_IDX = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
_BLOCKS = [(1, 2), (2, 2), (3, 3), (4, 3), (5, 3)]  # (block, convs)


def convert_vgg(state: dict) -> dict:
    out = {}
    li = 0
    for block, n_convs in _BLOCKS:
        for ci in range(1, n_convs + 1):
            idx = _TORCH_CONV_IDX[li]
            li += 1
            w = np.asarray(state[f"features.{idx}.weight"])  # [out,in,kh,kw]
            b = np.asarray(state[f"features.{idx}.bias"])
            name = f"vgg/block{block}_conv{ci}"
            out[f"{name}/kernel"] = w.transpose(2, 3, 1, 0)  # -> [kh,kw,in,out]
            out[f"{name}/bias"] = b
    return out


def convert_lins(state: dict) -> dict:
    out = {}
    for i in range(5):
        key = f"lin{i}.model.1.weight"
        if key not in state:  # some exports drop the Dropout, shifting idx
            key = f"lin{i}.model.0.weight"
        w = np.asarray(state[key])                    # [1, cin, 1, 1]
        out[f"lin{i}/kernel"] = w.transpose(2, 3, 1, 0)  # -> [1,1,cin,1]
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--vgg", default=None)
    ap.add_argument("--lins", default=None)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()
    if not (args.vgg or args.lins):
        raise SystemExit("pass --vgg and/or --lins")
    import torch  # cpu build is sufficient

    flat = {}
    if args.vgg:
        sd = torch.load(args.vgg, map_location="cpu", weights_only=True)
        sd = {k: v for k, v in sd.items()}
        flat.update(convert_vgg(sd))
    if args.lins:
        sd = torch.load(args.lins, map_location="cpu", weights_only=True)
        flat.update(convert_lins(sd))
    np.savez(args.out, **flat)
    print(f"wrote {args.out} ({len(flat)} arrays)")


if __name__ == "__main__":
    main()
