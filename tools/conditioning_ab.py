"""Merge two --fidelity_sweep --fidelity_by_class JSONs into one A/B table.

Closes the conditioning-strength study (reports/quality_r3/
context_effect.md): arm A = the reference-parity cross-attention-only
flagship, arm B = the same recipe retrained with --context_in_time. The
decisive column is fid_class_sep = mean over classes of
(cross-class FID − same-class FID): ~0 means the sampler ignores its
context token; >0 means conditional samples land measurably closer to
their own class's real slice.

Usage: python tools/conditioning_ab.py A=path/a.json B=path/b.json \
           --out reports/quality_r3/conditioning_ab.md
"""

from __future__ import annotations

import argparse
import json


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("runs", nargs="+", help="name=path/to/sweep.json")
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    arms = []
    for spec in args.runs:
        name, _, path = spec.partition("=")
        with open(path) as f:
            arms.append((name, json.load(f)))

    lines = ["# Conditioning-strength A/B — per-class fidelity", "",
             "fid_class_sep = mean(cross-class FID − same-class FID); "
             "0 ⇒ the context token is ignored, larger ⇒ stronger "
             "class-conditional generation. Same samples score the "
             "overall latent-FID column.", "",
             "| arm | epoch | sampler | steps | guidance | latent-FID "
             "| same c0/c1 | cross c0/c1 | class sep |",
             "|---|---|---|---|---|---|---|---|---|"]
    for name, data in arms:
        for r in data.get("rows", []):
            if "fid_class_sep" not in r:
                continue
            lines.append(
                f"| {name} | {data.get('epoch', '?')} | {r['sampler']} "
                f"| {r['steps'] or 'T'} "
                f"| {r['guidance'] if r['guidance'] is not None else '—'} "
                f"| {r['latent_fid']} "
                f"| {r.get('fid_same_c0', '—')}/{r.get('fid_same_c1', '—')} "
                f"| {r.get('fid_cross_c0', '—')}/"
                f"{r.get('fid_cross_c1', '—')} "
                f"| {r['fid_class_sep']} |")
    with open(args.out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote", args.out)


if __name__ == "__main__":
    main()
