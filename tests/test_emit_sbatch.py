"""Slurm launcher generator (tools/emit_sbatch.py) — replaces the
reference's ten hand-written sb_*.sbatch files (e.g. /root/reference/
sb_vqgan.sbatch) with a preset-driven emitter."""

import os
import subprocess
import sys


def _run(*args, cwd="/root/repo"):
    return subprocess.run(
        [sys.executable, "tools/emit_sbatch.py", *args], cwd=cwd,
        capture_output=True, text=True, timeout=60)


def test_emit_single_node(tmp_path):
    out = tmp_path / "sb_vqgan.sbatch"
    r = _run("--preset", "vqgan_attn", "--out", str(out))
    assert r.returncode == 0, r.stderr
    text = out.read_text()
    assert "#SBATCH --nodes=1" in text
    assert "--preset vqgan_attn" in text
    assert "--train_vq" in text and "--disc_threshold 40" in text
    assert "srun python -m ldm3d.cli.main" in text


def test_emit_multi_node_wires_distributed(tmp_path):
    out = tmp_path / "sb_dm.sbatch"
    r = _run("--preset", "conditional_dm3d", "--nodes", "4",
             "--out", str(out))
    assert r.returncode == 0, r.stderr
    text = out.read_text()
    assert "#SBATCH --nodes=4" in text
    assert "LDM3D_COORDINATOR" in text
    assert '--process_id "$SLURM_PROCID"' in text


def test_emit_all_covers_canonical_matrix(tmp_path):
    r = _run("--all", "--out_dir", str(tmp_path))
    assert r.returncode == 0, r.stderr
    files = sorted(os.listdir(tmp_path))
    # at least the reference's job families: vqvae, 4 vqgan variants,
    # nsvq/rnsvq, 2 dm variants, stage-1
    assert len(files) >= 10, files
    assert "sb_vqgan_attn.sbatch" in files
    assert "sb_conditional_dm3d.sbatch" in files


def test_passthrough_flags(tmp_path):
    out = tmp_path / "s.sbatch"
    r = _run("--preset", "vqvae_b8_all", "--out", str(out),
             "--epochs", "7", "--norm", "group")
    assert r.returncode == 0, r.stderr
    text = out.read_text()
    assert "--epochs 7" in text and "--norm group" in text
