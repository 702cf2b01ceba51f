"""Opportunistic real-LPIPS weights check (VERDICT r4 next-8).

Every perceptual number so far used the random-feature surrogate because
pretrained VGG16 weights are unreachable in this zero-egress environment
(reference loads ImageNet VGG16 + trained lin heads,
models/lpips_tensorflow.py:114-181). This tool searches every plausible
local source and either converts real weights for the GAN trainer
(LDM3D_LPIPS_WEIGHTS) or records the environmental block explicitly.

Sources tried, in order:
  1. $LDM3D_LPIPS_WEIGHTS (already-converted npz)
  2. $LDM3D_VGG16_TORCH (torch-layout state dict, any torch.load-able file)
  3. torch hub / torchvision caches on disk
  4. torchvision.models.vgg16(weights=IMAGENET1K_V1) — will fail fast
     offline, succeeding only if a later environment allows egress

Exit code 0 with "FOUND" when real weights are usable, 0 with "BLOCKED"
otherwise (the check is informational).
"""

from __future__ import annotations

import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    # 1. already-converted npz
    p = os.environ.get("LDM3D_LPIPS_WEIGHTS")
    if p and os.path.exists(p):
        print(f"FOUND: converted LPIPS weights at {p} "
              f"(GANTrainer loads these automatically)")
        return

    # 2./3. torch-layout VGG16 candidates
    candidates = []
    if os.environ.get("LDM3D_VGG16_TORCH"):
        candidates.append(os.environ["LDM3D_VGG16_TORCH"])
    for root in (os.path.expanduser("~/.cache/torch/hub/checkpoints"),
                 os.path.expanduser("~/.cache/torch/checkpoints"),
                 "/opt/models", "/usr/share/models"):
        candidates += sorted(glob.glob(os.path.join(root, "*vgg16*")))
    for cand in candidates:
        if not os.path.exists(cand):
            continue
        try:
            import torch

            sd = torch.load(cand, map_location="cpu")
            import numpy as np

            from tools.export_lpips_weights import convert_vgg

            out = os.path.join(os.path.dirname(cand), "lpips_ldm3d.npz")
            np.savez(out, **convert_vgg({k: v for k, v in sd.items()}))
            print(f"FOUND: converted {cand} -> {out}; export "
                  f"LDM3D_LPIPS_WEIGHTS={out} for GAN runs")
            return
        except Exception as e:  # noqa: BLE001
            print(f"candidate {cand}: unusable ({e})")

    # 4. torchvision download (fails fast with no egress)
    try:
        import torchvision

        w = torchvision.models.VGG16_Weights.IMAGENET1K_V1
        m = torchvision.models.vgg16(weights=w)
        import numpy as np

        from tools.export_lpips_weights import convert_vgg

        out = "/tmp/lpips_ldm3d.npz"
        np.savez(out, **convert_vgg(m.state_dict()))
        print(f"FOUND: downloaded torchvision VGG16 -> {out}; export "
              f"LDM3D_LPIPS_WEIGHTS={out} for GAN runs")
        return
    except Exception as e:  # noqa: BLE001
        print(f"torchvision path unavailable: {type(e).__name__}: {e}")

    print("BLOCKED: no pretrained VGG16 weights reachable in this "
          "environment (zero egress, no local caches). Perceptual terms "
          "use the random-feature surrogate — internally consistent, not "
          "comparable to trained-LPIPS numbers (see README/PERF.md).")


if __name__ == "__main__":
    main()
