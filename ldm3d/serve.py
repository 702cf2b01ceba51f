"""Volume-generation server — the production-serving front of the fused
sampler.

The reference has no serving story (generation = rerun `main.py --test_dm`
and collect .npy files). Here a checkpointed conditional LDM is loaded
once, the sample(+decode) program is compiled once per (batch, sampler)
signature and kept warm, and volumes stream out over HTTP:

  POST /generate {"num": 4, "context": 1, "sampler": "ddim",
                  "sample_steps": 50, "guidance_scale": null,
                  "seed": 7, "format": "npy"}
    -> application/octet-stream (.npy payload, shape [num, H, W, D, 1]);
       "format": "nii" returns a .nii.gz of the first volume.
  GET  /healthz  -> {"status": "ok", "model": ..., "compiled": [...]}

Requests are served sequentially (one chip, one program at a time); the
sampler itself is batched, so throughput comes from `num` per request
(measured 1079 vol/min/chip at batch 16, PERF.md).

CLI: python -m ldm3d.serve --preset conditional_dm3d \
         --ckpt_dir ./checkpoints --port 8777
"""

from __future__ import annotations

import argparse
import io
import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer
from typing import Dict, Optional, Tuple

import numpy as np


class GenerationService:
    """Owns the trainer state and a cache of compiled sampler programs."""

    def __init__(self, cfg, state, conditional: bool, name: str = "ldm3d"):
        from ldm3d.train.dm_trainer import DiffusionTrainer
        from ldm3d.core.config import TrainConfig

        self.cfg = cfg
        self.name = name
        self.trainer = DiffusionTrainer(cfg, TrainConfig(batch_size=1),
                                        conditional=conditional)
        self.state = state
        from collections import OrderedDict
        self._programs: "OrderedDict[Tuple, tuple]" = OrderedDict()
        self._lock = threading.Lock()
        self._counter = 0

    @classmethod
    def from_checkpoint(cls, exp_cfg, ckpt_dir: str,
                        epoch: Optional[int] = None, ema: bool = False):
        """Restore the newest (or a specific) checkpoint of a train run.

        `ema=True` builds the restore template with the ema_params subtree
        a `--train_dm --ema_decay > 0` checkpoint carries (sampling then
        automatically uses the averaged weights); without it, restoring
        such a checkpoint fails on the tree mismatch."""
        import jax
        from ldm3d.core.config import TrainConfig
        from ldm3d.train.checkpoint import CheckpointManager
        from ldm3d.train.dm_trainer import DiffusionTrainer

        conditional = exp_cfg.model == "conditional_dm"
        trainer = DiffusionTrainer(exp_cfg.diffusion, TrainConfig(
            batch_size=1, ema_decay=0.999 if ema else 0.0),
            conditional=conditional)
        size = exp_cfg.data.volume_size
        state = trainer.init_state(
            jax.random.PRNGKey(0),
            (1, size, size, size, exp_cfg.diffusion.vqvae.in_channels))
        mgr = CheckpointManager(ckpt_dir)
        state, ep = mgr.restore(jax.device_get(state), epoch)
        svc = cls(exp_cfg.diffusion, state, conditional, name=exp_cfg.name)
        svc.epoch = ep
        return svc

    def _program(self, batch: int, sampler: str, sample_steps, guidance):
        key = (batch, sampler, sample_steps, guidance)
        entry = self._programs.get(key)
        if entry is None:
            c = self.cfg
            lat = (batch, c.latent_size, c.latent_size, c.latent_size,
                   c.latent_channels)
            # LRU-bound the device-program cache: each entry is a compiled
            # XLA executable holding HBM; without a cap, request-shaped
            # keys (num x sampler x steps x guidance) are a compile/HBM
            # exhaustion vector. The trainer's own cache is evicted in
            # lockstep so the executable is actually released.
            while len(self._programs) >= self.MAX_PROGRAMS:
                _, (_, old_tkey) = self._programs.popitem(last=False)
                self.trainer._generate_cache.pop(old_tkey, None)
            prog = self.trainer.generate_fn(
                lat, decode=True, sampler=sampler, sample_steps=sample_steps,
                guidance_scale=guidance)
            # must mirror generate_fn's cache-key tuple exactly (incl.
            # use_ema default) or eviction silently leaks executables
            tkey = (tuple(lat), 0, True, sampler, sample_steps, 0.0,
                    guidance, True)
            self._programs[key] = (prog, tkey)
        else:
            self._programs[key] = self._programs.pop(key)  # mark recent
            prog = entry[0]
        return prog

    MAX_BATCH = 32
    MAX_PROGRAMS = 8

    def generate(self, num: int = 1, context: Optional[int] = None,
                 sampler: str = "ddpm", sample_steps: Optional[int] = None,
                 guidance_scale: Optional[float] = None,
                 seed: Optional[int] = None) -> np.ndarray:
        import jax
        import jax.numpy as jnp

        # Validate request-shaped inputs BEFORE they reach the program
        # cache: every distinct (num, sampler, steps, guidance) tuple
        # compiles and permanently caches a device program, so unbounded
        # values are a compile/HBM exhaustion vector.
        num = int(num)
        if not 1 <= num <= self.MAX_BATCH:
            raise ValueError(f"num must be in [1, {self.MAX_BATCH}]")
        if sampler not in ("ddpm", "ddim", "dpmpp", "dpmpp_sde"):
            raise ValueError("sampler must be 'ddpm', 'ddim', 'dpmpp' "
                             "or 'dpmpp_sde'")
        if sampler == "ddpm":
            sample_steps = None  # the full chain ignores strides; don't
            # fork the program cache on them
        if sample_steps is not None:
            sample_steps = int(sample_steps)
            if not 1 <= sample_steps <= self.cfg.timesteps:
                raise ValueError(
                    f"sample_steps must be in [1, {self.cfg.timesteps}]")
        if guidance_scale is not None:
            # quantize to 1 decimal: guidance is an arbitrary float cache
            # key, and each distinct value would compile + cache its own
            # device program; 0.1 resolution is far below any perceptible
            # guidance difference
            guidance_scale = round(float(guidance_scale), 1)
            if not 0.0 <= guidance_scale <= 20.0:
                raise ValueError("guidance_scale must be in [0, 20]")
            if guidance_scale == 1.0:
                guidance_scale = None  # no-op scale; don't fork the cache
            elif getattr(self.cfg.unet, "cfg_dropout", 0.0) == 0.0:
                # surface the capability gap as a request error instead of
                # a compile-time failure deep in the trainer: guidance
                # needs a null-context token learned via --cfg_dropout>0
                raise ValueError(
                    "guidance_scale requires a model trained with "
                    "cfg_dropout > 0 (restore one via --cfg_dropout)")
        if self.trainer.conditional:
            context = 0 if context is None else int(context)
            max_ctx = self.cfg.unet.context_dim
            if not 0 <= context <= max_ctx:
                raise ValueError(f"context must be in [0, {max_ctx}]")

        with self._lock:  # one chip: serialize device work
            fn = self._program(num, sampler, sample_steps, guidance_scale)
            if seed is None:
                self._counter += 1
                seed = self._counter
            ctx = None
            if self.trainer.conditional:
                ctx = jnp.full((num,), int(context or 0), jnp.int32)
            out = fn(self.state, jax.random.PRNGKey(int(seed)), ctx)
            return np.asarray(out, np.float32)

    def compiled_signatures(self):
        return [list(k[:2]) + [k[2], k[3]] for k in self._programs]


def _make_handler(svc: GenerationService):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _json(self, code: int, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._json(200, {"status": "ok", "model": svc.name,
                                 "compiled": svc.compiled_signatures()})
            else:
                self._json(404, {"error": "unknown path"})

        def do_POST(self):
            if self.path != "/generate":
                self._json(404, {"error": "unknown path"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n) or b"{}")
                vols = svc.generate(
                    num=int(req.get("num", 1)),
                    context=req.get("context"),
                    sampler=req.get("sampler", "ddpm"),
                    sample_steps=req.get("sample_steps"),
                    guidance_scale=req.get("guidance_scale"),
                    seed=req.get("seed"))
            except Exception as e:
                self._json(400, {"error": f"{type(e).__name__}: {e}"})
                return
            fmt = req.get("format", "npy")
            buf = io.BytesIO()
            if fmt == "nii":
                import tempfile, os
                from ldm3d.data.nifti import save_nifti
                with tempfile.NamedTemporaryFile(suffix=".nii.gz",
                                                 delete=False) as f:
                    tmp = f.name
                save_nifti(tmp, vols[0])
                with open(tmp, "rb") as f:
                    buf.write(f.read())
                os.remove(tmp)
            else:
                np.save(buf, vols)
            payload = buf.getvalue()
            self.send_response(200)
            self.send_header("Content-Type", "application/octet-stream")
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

    return Handler


def serve(svc: GenerationService, host: str = "127.0.0.1",
          port: int = 8777) -> HTTPServer:
    server = HTTPServer((host, port), _make_handler(svc))
    return server


def main(argv=None):
    ap = argparse.ArgumentParser("ldm3d.serve")
    ap.add_argument("--preset", default="conditional_dm3d")
    ap.add_argument("--ckpt_dir", required=True,
                    help="checkpoint dir of the --train_dm run")
    ap.add_argument("--epoch", type=int, default=None)
    ap.add_argument("--cfg_dropout", type=float, default=None,
                    help="set to the --cfg_dropout the checkpoint was "
                         "trained with (adds the null-context token row "
                         "to the restore template, enabling "
                         "guidance_scale requests)")
    ap.add_argument("--prediction_type", default=None,
                    choices=["eps", "v"],
                    help="set to the --prediction_type the checkpoint "
                         "was trained with so sampling converts the "
                         "model output correctly")
    ap.add_argument("--latent_scale", type=float, default=None,
                    help="the --latent_scale the checkpoint was trained "
                         "with (SD-style scale_factor; wrong values "
                         "decode from the wrong latent magnitude)")
    ap.add_argument("--clip_sample_range", type=float, default=None,
                    help="samplers' mean/x0 clipping half-width "
                         "(<= 0 disables; default 1.0 reference parity)")
    ap.add_argument("--context_in_time", action="store_true",
                    help="checkpoint was trained with --context_in_time: "
                         "sampling must route the context embedding "
                         "through the time embedding the same way (the "
                         "parameter tree is identical either way, so a "
                         "wrong setting restores fine but samples from "
                         "the weaker conditioning path)")
    ap.add_argument("--ema", action="store_true",
                    help="checkpoint was trained with --ema_decay > 0: "
                         "restore (and sample from) the EMA weights")
    ap.add_argument("--norm", default=None, choices=["batch", "group"],
                    help="normalization family of the checkpoint's "
                         "frozen stage-1 (--norm at train time)")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8777)
    args = ap.parse_args(argv)

    from dataclasses import replace

    from ldm3d.core.presets import get_preset
    preset = get_preset(args.preset)
    if args.cfg_dropout is not None:
        diff = preset.diffusion
        preset = replace(preset, diffusion=replace(
            diff, unet=replace(diff.unet, cfg_dropout=args.cfg_dropout)))
    if args.prediction_type is not None:
        preset = replace(preset, diffusion=replace(
            preset.diffusion, prediction_type=args.prediction_type))
    if args.context_in_time:
        diff = preset.diffusion
        preset = replace(preset, diffusion=replace(
            diff, unet=replace(diff.unet, context_in_time=True)))
    if args.latent_scale is not None:
        preset = replace(preset, diffusion=replace(
            preset.diffusion, latent_scale=args.latent_scale))
    if args.clip_sample_range is not None:
        preset = replace(preset, diffusion=replace(
            preset.diffusion, clip_sample_range=args.clip_sample_range))
    if args.norm is not None:
        diff = preset.diffusion
        preset = replace(preset, diffusion=replace(
            diff, vqvae=replace(diff.vqvae, norm=args.norm)))
    svc = GenerationService.from_checkpoint(preset, args.ckpt_dir,
                                            args.epoch, ema=args.ema)
    server = serve(svc, args.host, args.port)
    print(f"serving {svc.name} (epoch {svc.epoch}) "
          f"on http://{args.host}:{args.port}")
    server.serve_forever()


if __name__ == "__main__":
    main()
