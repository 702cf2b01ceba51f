"""Callbacks + orbax checkpoint/resume round-trip tests
(reference: Keras ModelCheckpoint/CSVLogger/ReduceLROnPlateau and the
missing DelayedReduceLROnPlateau, SURVEY.md §2.5/§5)."""

import csv
import json

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from ldm3d.train.callbacks import (CSVLogger, DelayedReduceLROnPlateau,
                                   MetricsLogger, ReduceLROnPlateau,
                                   get_learning_rate)
from ldm3d.train.checkpoint import CheckpointManager


def _opt_state(lr=1e-3):
    tx = optax.inject_hyperparams(optax.adam)(learning_rate=lr)
    return tx.init({"w": jnp.zeros((3,))})


def test_reduce_lr_on_plateau_reduces_after_patience():
    cb = ReduceLROnPlateau(monitor="loss", factor=0.5, patience=2,
                           min_lr=1e-6)
    s = _opt_state(1e-3)
    s, red = cb(0, {"loss": 1.0}, s)        # best=1.0
    assert not red
    s, red = cb(1, {"loss": 1.0}, s)        # wait=1
    assert not red
    s, red = cb(2, {"loss": 1.0}, s)        # wait=2 -> reduce
    assert red and np.isclose(get_learning_rate(s), 5e-4)
    # improvement resets the counter
    s, red = cb(3, {"loss": 0.5}, s)
    assert not red and np.isclose(get_learning_rate(s), 5e-4)


def test_reduce_lr_respects_min_lr_and_missing_metric():
    cb = ReduceLROnPlateau(monitor="val_loss", factor=0.1, patience=1,
                           min_lr=1e-3)
    s = _opt_state(1e-3)
    s, red = cb(0, {"loss": 1.0}, s)        # monitor missing -> no-op
    assert not red
    s, red = cb(1, {"val_loss": 1.0}, s)
    s, red = cb(2, {"val_loss": 1.0}, s)    # would reduce below min_lr
    assert not red and np.isclose(get_learning_rate(s), 1e-3)


def test_delayed_reduce_lr_waits_for_start_epoch():
    cb = DelayedReduceLROnPlateau(start_epoch=3, monitor="loss",
                                  factor=0.5, patience=1)
    s = _opt_state(1e-2)
    for e in range(3):                      # gated: no state accumulates
        s, red = cb(e, {"loss": 1.0}, s)
        assert not red
    s, _ = cb(3, {"loss": 1.0}, s)          # best=1.0
    s, red = cb(4, {"loss": 1.0}, s)        # plateau -> reduce
    assert red and np.isclose(get_learning_rate(s), 5e-3)


def test_csv_logger_format_and_append(tmp_path):
    path = str(tmp_path / "training.log")
    log = CSVLogger(path)
    log(0, {"loss": 0.5, "val_loss": 0.6})
    log(1, {"loss": 0.25, "val_loss": 0.3})
    rows = list(csv.DictReader(open(path)))
    assert [r["epoch"] for r in rows] == ["0", "1"]
    assert float(rows[1]["loss"]) == 0.25
    # append=True resumes without rewriting the header
    log2 = CSVLogger(path, append=True)
    log2(2, {"loss": 0.1, "val_loss": 0.2})
    rows = list(csv.DictReader(open(path)))
    assert len(rows) == 3 and rows[2]["epoch"] == "2"


def test_csv_logger_late_columns(tmp_path):
    """Columns that first appear mid-run (periodic latent_fid at
    fidelity_freq boundaries) must widen the header, not be dropped."""
    from ldm3d.utils.visualize import read_training_log
    path = str(tmp_path / "training.log")
    log = CSVLogger(path)
    log(0, {"loss": 0.5})
    log(1, {"loss": 0.4, "latent_fid": 12.0})   # late column
    log(2, {"loss": 0.3})
    rows = list(csv.DictReader(open(path)))
    assert "latent_fid" in rows[0]
    assert rows[0]["latent_fid"] == "" and rows[1]["latent_fid"] == "12.0"
    # reader maps blanks to NaN instead of discarding the column
    cols = read_training_log(path)
    assert "latent_fid" in cols
    assert np.isnan(cols["latent_fid"][0]) and cols["latent_fid"][1] == 12.0
    # append-resume adopts the widened header
    log2 = CSVLogger(path, append=True)
    log2(3, {"loss": 0.2, "latent_fid": 9.0})
    rows = list(csv.DictReader(open(path)))
    assert len(rows) == 4 and rows[3]["latent_fid"] == "9.0"


def test_metrics_logger_jsonl(tmp_path):
    path = str(tmp_path / "metrics.jsonl")
    log = MetricsLogger(path, run_name="r1")
    log(1, {"loss": 0.5})
    log(2, {"loss": 0.4}, prefix="val_")
    recs = [json.loads(l) for l in open(path)]
    assert recs[0]["run"] == "r1" and recs[0]["loss"] == 0.5
    assert recs[1]["val_loss"] == 0.4


def _tiny_state(seed=0):
    k = jax.random.PRNGKey(seed)
    return {"params": {"w": jax.random.normal(k, (4, 4))},
            "step": jnp.array(7, jnp.int32)}


def test_checkpoint_save_restore_roundtrip(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "ckpt"), keep=3)
    state = _tiny_state()
    assert mgr.save(1, jax.device_get(state))
    mgr.wait()
    template = jax.tree_util.tree_map(np.zeros_like, jax.device_get(state))
    restored, epoch = mgr.restore(template)
    assert epoch == 1
    np.testing.assert_allclose(restored["params"]["w"],
                               np.asarray(state["params"]["w"]))
    assert int(restored["step"]) == 7
    mgr.close()


def test_checkpoint_epoch_selection_and_retention(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "ckpt"), keep=2)
    for e in (1, 2, 3):
        st = _tiny_state(seed=e)
        mgr.save(e, jax.device_get(st))
    mgr.wait()
    assert mgr.latest_epoch() == 3
    template = jax.tree_util.tree_map(np.zeros_like,
                                      jax.device_get(_tiny_state()))
    _, epoch = mgr.restore(template, 2)      # explicit epoch resume
    assert epoch == 2
    with pytest.raises(Exception):
        mgr.restore(template, 1)             # evicted by keep=2
    mgr.close()


def test_checkpoint_save_best_only(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "ckpt"), save_best_only=True)
    st = jax.device_get(_tiny_state())
    assert mgr.save(1, st, metric=1.0)
    assert not mgr.save(2, st, metric=1.5)   # worse -> skipped
    assert mgr.save(3, st, metric=0.5)
    mgr.wait()
    assert mgr.latest_epoch() == 3
    mgr.close()


def test_checkpoint_pinned_epoch_survives_retention(tmp_path):
    """A pinned best-metric epoch is never pruned by `keep`, and the pin
    persists across manager restarts (VERDICT r4 weak #6: the round-4
    flagship's best-FID epoch was silently pruned by keep=5)."""
    mgr = CheckpointManager(str(tmp_path / "ckpt"), keep=2)
    st = jax.device_get(_tiny_state())
    mgr.save(1, st)
    mgr.save(3, st, pin="best_latent_fid")   # the best-FID epoch
    for e in (5, 7, 9):
        mgr.save(e, st)
    mgr.wait()
    assert mgr.pinned() == {"best_latent_fid": 3}
    template = jax.tree_util.tree_map(np.zeros_like, st)
    _, epoch = mgr.restore(template, 3)      # pinned: still restorable
    assert epoch == 3
    with pytest.raises(Exception):
        mgr.restore(template, 5)             # unpinned old epoch: pruned
    with pytest.raises(Exception):
        mgr.restore(template, 1)
    mgr.close()

    # a fresh manager on the same dir keeps honoring the pin file
    mgr2 = CheckpointManager(str(tmp_path / "ckpt"), keep=2)
    assert mgr2.pinned() == {"best_latent_fid": 3}
    mgr2.save(11, st)
    mgr2.wait()
    _, epoch = mgr2.restore(template, 3)
    assert epoch == 3
    # re-pinning moves the slot; the old pin becomes prunable
    mgr2.save(13, st, pin="best_latent_fid")
    mgr2.save(15, st)
    mgr2.save(17, st)
    mgr2.wait()
    with pytest.raises(Exception):
        mgr2.restore(template, 3)
    _, epoch = mgr2.restore(template, 13)
    assert epoch == 13
    mgr2.close()


def test_fit_pins_best_metric_epoch(tmp_path):
    """loop.fit saves + pins the best-val_psnr / best-latent_fid epoch
    even when it falls off the ckpt_freq grid, and retention never drops
    it."""
    from ldm3d.train.loop import fit

    class _Trainer:
        def train_step(self, state, vol, mask):
            return state, {"loss": jnp.asarray(0.0)}

    psnr = {1: 30.0, 2: 35.0, 3: 31.0, 4: 29.0, 5: 28.0, 6: 27.0}

    def epoch_callback(epoch, state):
        return {"val_psnr": psnr[epoch + 1]}

    ckpt = CheckpointManager(str(tmp_path / "ckpt"), keep=1)
    loader = [(jnp.zeros((1, 2)), jnp.zeros((1, 2)))]
    state = jax.device_get(_tiny_state())
    fit(_Trainer(), state, loader, 6, ckpt=ckpt, ckpt_freq=100,
        epoch_callback=epoch_callback, verbose=False)
    ckpt.wait()
    # epoch 2 (best psnr) is pinned; epoch 6 (final) is the latest
    assert ckpt.pinned() == {"best_val_psnr": 2}
    template = jax.tree_util.tree_map(np.zeros_like, state)
    _, e = ckpt.restore(template, 2)
    assert e == 2
    _, e = ckpt.restore(template)            # latest = final epoch
    assert e == 6
    ckpt.close()


def test_fit_with_recovery_resumes_from_checkpoint(tmp_path):
    """A step that crashes mid-training is recovered from the latest
    checkpoint and training completes (SURVEY.md §5: the reference's only
    'recovery' was manual Slurm resubmission)."""
    from ldm3d.train.loop import fit_with_recovery

    class Trainer:
        def train_step(self, state, vol, mask):
            new = {"params": {"w": state["params"]["w"] + 1.0},
                   "step": state["step"] + 1}
            return new, {"loss": jnp.float32(1.0)}

    crashes = {"n": 0}

    def step_fn(state, batch):
        # crash once at global step 3 (epoch 1), after epoch 0 checkpointed
        if int(state["step"]) == 3 and crashes["n"] == 0:
            crashes["n"] += 1
            raise RuntimeError("injected fault")
        return Trainer().train_step(state, *batch)

    loader = [(jnp.zeros((1,)), jnp.zeros((1,)))] * 2
    state = {"params": {"w": jnp.zeros(())}, "step": jnp.array(0, jnp.int32)}
    mgr = CheckpointManager(str(tmp_path / "ckpt"), keep=3)
    final, metrics = fit_with_recovery(
        Trainer(), state, loader, epochs=3, ckpt=mgr, max_restarts=1,
        step_fn=step_fn, verbose=False)
    mgr.wait()
    assert crashes["n"] == 1
    # 3 epochs x 2 steps, minus the 1 step lost to the rollback replay
    assert int(final["step"]) == 6
    assert mgr.latest_epoch() == 3
    mgr.close()
