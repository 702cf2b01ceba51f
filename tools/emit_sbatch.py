"""Slurm launcher integration: emit sbatch scripts for the canonical jobs.

The reference ships ten hand-written Slurm scripts (`sb_*.sbatch`: one
node, 4x V100, 96-128 GB, 2-day walltime — e.g. /root/reference/
sb_vqgan.sbatch, sb_cond_dm3d.sbatch). This framework is scheduler-
agnostic — every job is one CLI invocation — so the Slurm integration is a
generator: it emits an sbatch wrapper for any preset/flag combination,
including the multi-host form that derives `--process_id` from
$SLURM_PROCID and points `--coordinator` at node 0.

    python tools/emit_sbatch.py --preset vqgan_attn --train_vq \
        --epochs 400 --lbs 2 --out sb_vqgan.sbatch
    python tools/emit_sbatch.py --preset conditional_dm3d --train_dm \
        --nodes 4 --out sb_cond_dm3d.sbatch      # multi-host DCN launch
    python tools/emit_sbatch.py --all --out_dir slurm/   # one per preset

Unknown flags pass through verbatim to ldm3d.cli.main, so any CLI surface
works; `--preset`/`--nodes`/`--time`/`--partition`/`--out`/`--out_dir`
are consumed here.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HEADER = """#!/bin/bash
#SBATCH --job-name={name}
#SBATCH --nodes={nodes}
#SBATCH --ntasks-per-node=1
#SBATCH --cpus-per-task=16
#SBATCH --time={time}
{partition}#SBATCH --output={name}-%j.out
#SBATCH --error={name}-%j.err

set -euo pipefail
cd "$SLURM_SUBMIT_DIR"
"""

SINGLE = """
srun python -m ldm3d.cli.main {args}
"""

# Multi-host: node 0 is the jax.distributed coordinator; every rank runs
# the identical command (RUNBOOK.md "Multi-host").
MULTI = """
COORD_HOST=$(scontrol show hostnames "$SLURM_JOB_NODELIST" | head -n1)
export LDM3D_COORDINATOR="$COORD_HOST:8476"
export LDM3D_NUM_PROCESSES="$SLURM_NNODES"

srun bash -c 'python -m ldm3d.cli.main {args} \\
    --coordinator "$LDM3D_COORDINATOR" \\
    --num_processes "$LDM3D_NUM_PROCESSES" \\
    --process_id "$SLURM_PROCID"'
"""

# preset -> canonical extra flags, mirroring the reference's sbatch matrix
# (sb_vqvae3d-monai.sbatch, sb_vqgan.sbatch, sb_nsvqvae3d.sbatch,
# sb_cond_dm3d.sbatch, sb_dm3d.sbatch, sb_sweep.sbatch).
CANONICAL = {
    "vqvae_b8_all": ["--train_vq", "--kernel_resize", "--epochs", "200",
                     "--lbs", "8"],
    "vqgan_attn": ["--train_vq", "--epochs", "400", "--lbs", "2",
                   "--disc_threshold", "40"],
    "vqgan_baseline": ["--train_vq", "--epochs", "400", "--lbs", "2"],
    "vqgan_gnorm": ["--train_vq", "--epochs", "400", "--lbs", "2"],
    "vqgan_stride": ["--train_vq", "--epochs", "400", "--lbs", "2"],
    "nsvqvae": ["--train_vq", "--epochs", "200", "--lbs", "8"],
    "rnsvqvae": ["--train_vq", "--epochs", "200", "--lbs", "8"],
    "dm3d": ["--train_dm", "--timesteps", "300", "--epochs", "100",
             "--lbs", "3"],
    "conditional_dm3d": ["--train_dm", "--timesteps", "500", "--epochs",
                         "100", "--lbs", "3", "--augment",
                         "--save_best_only"],
    "vqvae_dm_stage1": ["--train_vq", "--epochs", "60", "--lbs", "8"],
}


def emit(preset: str, cli_args: list, nodes: int, time: str,
         partition: str) -> str:
    name = f"ldm3d_{preset}"
    args = " ".join(["--preset", preset] + [str(a) for a in cli_args])
    part = f"#SBATCH --partition={partition}\n" if partition else ""
    body = MULTI if nodes > 1 else SINGLE
    return (HEADER.format(name=name, nodes=nodes, time=time, partition=part)
            + body.format(args=args))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default=None)
    ap.add_argument("--all", action="store_true",
                    help="emit one sbatch per canonical preset job")
    ap.add_argument("--nodes", type=int, default=1)
    ap.add_argument("--time", default="2-00:00:00")
    ap.add_argument("--partition", default=None)
    ap.add_argument("--out", default=None)
    ap.add_argument("--out_dir", default="slurm")
    args, passthrough = ap.parse_known_args(argv)

    if args.all:
        os.makedirs(args.out_dir, exist_ok=True)
        for preset, flags in CANONICAL.items():
            path = os.path.join(args.out_dir, f"sb_{preset}.sbatch")
            with open(path, "w") as f:
                f.write(emit(preset, flags + passthrough, args.nodes,
                             args.time, args.partition))
            print("wrote", path)
        return

    if not args.preset:
        ap.error("--preset or --all required")
    flags = passthrough or CANONICAL.get(args.preset, [])
    text = emit(args.preset, flags, args.nodes, args.time, args.partition)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text)
        print("wrote", args.out)
    else:
        print(text)


if __name__ == "__main__":
    main()
