"""Headline benchmark: full-T conditional 128^3 MRI sample + VQ decode on
one chip — the north-star metric from BASELINE.md.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Baseline: the reference never instrumented sampling (an eager Python loop of
T U-Net calls, networks/dm3d.py:510-532); BASELINE.json sets the bar at
< 10 s per 1000-step 128^3 sample+decode on one v5e chip, i.e. 6 volumes/min.
The flagship recipe is T=500 (the reference's own conditional setting,
sb_cond_dm3d.sbatch, chosen by the round-4 recipe sweep), so the bar is
scaled per-U-Net-step: vs_baseline = measured volumes/min divided by
6 vol/min * (1000 / T) — halving T never inflates the headline number.

Trained weights: restored in priority order from
  1. $LDM3D_BENCH_CKPT or runs/ckpt_flagship/flagship_dm (orbax train
     state; best-latent-FID epoch),
  2. ckpt/flagship/flagship_f16.npz (compact float16 snapshot COMMITTED to
     git — survives VM resets, unlike runs/; written by
     tools/export_flagship.py).
Falling back to random init prints a loud warning and reports
trained_weights: false — a benched random U-Net proves throughput only
(VERDICT r4 weak #1).
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp

from ldm3d.core.config import TrainConfig, replace
from ldm3d.train.dm_trainer import DiffusionTrainer
from __graft_entry__ import _flagship_cfg

BASELINE_VOL_PER_MIN = 6.0  # 10 s / volume north-star bar (BASELINE.md)
_REPO = os.path.dirname(os.path.abspath(__file__))
NPZ_PATH = os.path.join(_REPO, "ckpt", "flagship", "flagship_f16.npz")


def _enable_compile_cache():
    """Persistent XLA compilation cache: first compiles of the 128^3
    programs take minutes through this environment's TPU relay; cached
    reruns take seconds."""
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/ldm3d_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass  # older jax without these options


def _orbax_dir():
    return os.environ.get(
        "LDM3D_BENCH_CKPT",
        os.path.join(_REPO, "runs", "ckpt_flagship", "flagship_dm"))


def _load_meta():
    """(meta dict, source tag): the benched checkpoint's train-time
    invariants — latent_scale etc. MUST match training or every sample is
    silently wrong (cli/main.py writes train_meta.json; the npz snapshot
    embeds the same fields)."""
    path = os.path.join(_orbax_dir(), "train_meta.json")
    if os.path.exists(path):
        try:
            with open(path) as f:
                return json.load(f), "orbax"
        except (OSError, ValueError):
            pass
    if os.path.isdir(_orbax_dir()):
        return {}, "orbax"
    if os.path.exists(NPZ_PATH):
        try:
            from ldm3d.utils.export import load_meta_npz
            return load_meta_npz(NPZ_PATH), "npz"
        except Exception as e:  # noqa: BLE001
            print(f"# WARNING: committed snapshot unreadable ({e})",
                  flush=True)
    return {}, "none"


def _apply_meta(cfg, meta):
    diff = cfg
    if "latent_scale" in meta:
        diff = replace(diff, latent_scale=float(meta["latent_scale"]))
    if "clip_sample_range" in meta:
        diff = replace(diff,
                       clip_sample_range=float(meta["clip_sample_range"]))
    if "timesteps" in meta:
        diff = replace(diff, timesteps=int(meta["timesteps"]))
    if "prediction_type" in meta:
        diff = replace(diff, prediction_type=meta["prediction_type"])
    unet = diff.unet
    if meta.get("context_in_time"):
        unet = replace(unet, context_in_time=True)
    if "cfg_dropout" in meta:
        unet = replace(unet, cfg_dropout=float(meta["cfg_dropout"]))
    if "context_dim" in meta:
        # the flagship corpus is 4-class (context token 0..3 + null row);
        # the embedding-table shape must match the checkpoint's
        unet = replace(unet, context_dim=int(meta["context_dim"]))
    # denoiser shape must rebuild the checkpoint's parameter tree (the
    # round-5 flagship widened the stem past the 256-ch latent)
    if "unet_stem" in meta:
        unet = replace(unet, first_conv_channels=int(meta["unet_stem"]))
    if "unet_widths" in meta:
        unet = replace(unet, widths=tuple(int(w)
                                          for w in meta["unet_widths"]))
    if "unet_attention" in meta:
        unet = replace(unet, has_attention=tuple(
            bool(v) for v in meta["unet_attention"]))
    return replace(diff, unet=unet)


def _best_fid_epoch(path):
    """Checkpointed epoch with the lowest logged latent-FID, or None
    (= latest) when no fidelity rows / no matching saved epoch exist.
    Fidelity rows log `step` = epoch-1 (end of epoch step+1)."""
    best = None
    try:
        with open(os.path.join(path, "metrics.jsonl")) as f:
            for row in f:
                try:
                    rec = json.loads(row)
                except ValueError:
                    continue
                if "latent_fid" in rec and "step" in rec:
                    ep = int(rec["step"]) + 1
                    if os.path.isdir(os.path.join(path, str(ep))) and (
                            best is None or rec["latent_fid"] < best[1]):
                        best = (ep, rec["latent_fid"])
    except OSError:
        return None
    return best[0] if best else None


def _restore_trained(trainer, state, source):
    """Restore end-to-end-trained flagship weights. Returns
    (state, trained: bool, fidelity: dict)."""
    if source == "orbax":
        path = _orbax_dir()
        try:
            from ldm3d.train.checkpoint import CheckpointManager
            mgr = CheckpointManager(path)
            # Prefer the best-latent-FID epoch over the latest: flagship
            # runs measurably overtrain past the best epoch (FID 49 -> 109
            # over 50 -> 200 epochs in round 4) — bench the model a user
            # would actually deploy. loop.fit pins this epoch against
            # retention (checkpoint.py).
            best_epoch = _best_fid_epoch(path)
            host_state = jax.device_get(state)
            state, epoch = mgr.restore(host_state, best_epoch)
            state = jax.device_put(state)
            jax.block_until_ready(state.params)
            print(f"# restored trained flagship weights (epoch {epoch}) "
                  f"from {path}", flush=True)
            return state, True, _fidelity_from_jsonl(path, epoch)
        except Exception as e:  # noqa: BLE001 - fall through to npz
            print(f"# orbax restore failed ({e}); trying committed "
                  f"snapshot", flush=True)
            source = "npz" if os.path.exists(NPZ_PATH) else "none"
    if source == "npz":
        try:
            from ldm3d.utils.export import load_meta_npz, load_state_npz
            meta = load_meta_npz(NPZ_PATH)
            state = jax.device_put(load_state_npz(NPZ_PATH,
                                                  jax.device_get(state)))
            jax.block_until_ready(state.params)
            print(f"# restored trained flagship weights (epoch "
                  f"{meta.get('epoch', '?')}) from committed snapshot "
                  f"{NPZ_PATH}", flush=True)
            fid = {k: meta[k] for k in
                   ("latent_fid", "latent_fid_epoch", "latent_fid_sampler",
                    "fid_class_sep", "latent_mmd") if k in meta}
            return state, True, fid
        except Exception as e:  # noqa: BLE001
            print(f"# committed-snapshot restore failed ({e})", flush=True)
    print("# " + "!" * 66, flush=True)
    print("# WARNING: NO TRAINED FLAGSHIP WEIGHTS FOUND — benching RANDOM "
          "init.", flush=True)
    print("# Throughput below is valid; sample quality is NOT. Train via "
          "RUNBOOK.md", flush=True)
    print("# or restore ckpt/flagship/flagship_f16.npz "
          "(tools/export_flagship.py).", flush=True)
    print("# " + "!" * 66, flush=True)
    return state, False, {}


def _fidelity_from_jsonl(path, epoch):
    """Quality metrics of the benched epoch from the training run's
    metrics.jsonl (logged during --train_dm via --fidelity_freq): reported
    beside throughput so BENCH carries a fidelity anchor, not just speed."""
    out = {}
    try:
        with open(os.path.join(path, "metrics.jsonl")) as f:
            for row in f:
                try:
                    rec = json.loads(row)
                except ValueError:
                    continue
                if "latent_fid" not in rec:
                    continue
                if int(rec.get("step", -2)) + 1 == epoch or not out:
                    out = {"latent_fid": round(rec["latent_fid"], 2),
                           "latent_fid_epoch": int(rec.get("step", -1)) + 1,
                           # the training-loop fidelity probe samples with
                           # deterministic DDIM at full T; sweep tables
                           # score other samplers — don't cross-compare
                           "latent_fid_sampler": "ddim-T"}
                    if "fid_class_sep" in rec:
                        out["fid_class_sep"] = round(rec["fid_class_sep"], 3)
                    if "latent_mmd" in rec:
                        out["latent_mmd"] = round(rec["latent_mmd"], 3)
    except OSError:
        pass
    return out


def main():
    _enable_compile_cache()
    meta, source = _load_meta()
    cfg = _apply_meta(_flagship_cfg(), meta)
    # Sample in a batch of 16: the per-step U-Net at 8^3 latents is
    # launch-bound at batch 1; throughput measured 190 vol/min @ b1,
    # 848 @ b8, 1084 @ b16, 1140 @ b32 (diminishing past 16).
    batch = 16
    # The flagship trains with EMA sampling weights (ema_decay 0.999);
    # the state template must match the checkpoint's tree.
    ema = float(meta.get("ema_decay", 0.0)) if meta else 0.0
    trainer = DiffusionTrainer(cfg, TrainConfig(batch_size=batch,
                                                ema_decay=ema),
                               conditional=True)
    # Init once at the real 128^3 image shape with batch 1 (params are
    # batch-agnostic, but the conditional U-Net's ContextMLP params depend
    # on the latent spatial size, so the 8^3 latent grid must match).
    state = trainer.init_state(jax.random.PRNGKey(0),
                               (1, 128, 128, 128, 1))
    state, trained, fidelity = _restore_trained(trainer, state, source)
    lat_shape = (batch, cfg.latent_size, cfg.latent_size, cfg.latent_size,
                 cfg.latent_channels)
    fn = trainer.generate_fn(lat_shape, decode=True)
    ctx = jnp.ones((batch,), jnp.int32)

    # compile + warmup
    out = fn(state, jax.random.PRNGKey(1), ctx)
    out.block_until_ready()

    runs = 3
    start = time.perf_counter()
    for i in range(runs):
        out = fn(state, jax.random.PRNGKey(2 + i), ctx)
    out.block_until_ready()
    elapsed = time.perf_counter() - start

    vols_per_min = runs * batch / elapsed * 60.0
    bar = BASELINE_VOL_PER_MIN * (1000.0 / cfg.timesteps)
    line = {
        "metric": (f"cond_128^3_sample_decode_{cfg.timesteps}step_"
                   "volumes_per_min_per_chip"),
        "value": round(vols_per_min, 3),
        "unit": "volumes/min/chip",
        "vs_baseline": round(vols_per_min / bar, 3),
        "trained_weights": trained,
    }
    if not trained:
        line["warning"] = "RANDOM INIT - no trained checkpoint found"
    line.update(fidelity)
    print(json.dumps(line))


if __name__ == "__main__":
    main()
