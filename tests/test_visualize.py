"""Headless notebook-equivalents (ldm3d/utils/visualize.py)."""

import numpy as np

from ldm3d.utils.visualize import (main, plot_loss_curves, plot_volume_grid,
                                   read_training_log)


def _write_log(path):
    path.write_text(
        "epoch,loss,reconst_loss,val_loss\n"
        "0,0.1,0.09,0.12\n1,0.05,0.04,0.06\n2,0.02,0.018,0.03\n")
    return str(path)


def test_loss_curves(tmp_path):
    log = _write_log(tmp_path / "training.log")
    cols = read_training_log(log)
    assert list(cols["loss"]) == [0.1, 0.05, 0.02]
    out = plot_loss_curves([log], str(tmp_path / "loss.png"))
    assert (tmp_path / "loss.png").stat().st_size > 0
    assert out.endswith("loss.png")


def test_volume_grid(tmp_path):
    vol = np.random.default_rng(0).uniform(size=(2, 8, 8, 8, 1)).astype(
        np.float32)
    p = tmp_path / "recon.npy"
    np.save(p, vol)
    plot_volume_grid([str(p)], str(tmp_path / "vols.png"))
    assert (tmp_path / "vols.png").stat().st_size > 0


def test_cli(tmp_path):
    log = _write_log(tmp_path / "training.log")
    main(["loss", log, "--out", str(tmp_path / "out.png")])
    assert (tmp_path / "out.png").exists()
