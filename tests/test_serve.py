"""Generation-server tests (ldm3d/serve.py) on a tiny CPU model."""

import pytest

pytestmark = pytest.mark.slow

import io
import json
import threading
import urllib.error
import urllib.request

import jax
import numpy as np
import pytest

from __graft_entry__ import _flagship_cfg
from ldm3d.core.config import TrainConfig
from ldm3d.serve import GenerationService, serve
from ldm3d.train.dm_trainer import DiffusionTrainer


@pytest.fixture(scope="module")
def svc():
    cfg = _flagship_cfg(tiny=True)
    trainer = DiffusionTrainer(cfg, TrainConfig(batch_size=1,
                                                dtype="float32"),
                               conditional=True)
    state = trainer.init_state(jax.random.PRNGKey(0), (1, 16, 16, 16, 1))
    return GenerationService(cfg, state, conditional=True, name="tiny")


def test_service_generate_and_program_cache(svc):
    v = svc.generate(num=2, context=1, sampler="ddim", sample_steps=4)
    assert v.shape == (2, 16, 16, 16, 1)
    assert np.isfinite(v).all()
    svc.generate(num=2, context=0, sampler="ddim", sample_steps=4)
    assert len(svc.compiled_signatures()) == 1  # same signature -> cached
    svc.generate(num=1, context=0, sampler="ddim", sample_steps=4)
    assert len(svc.compiled_signatures()) == 2


def test_http_roundtrip(svc):
    server = serve(svc, port=0)  # ephemeral port
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz") as r:
            health = json.loads(r.read())
        assert health["status"] == "ok" and health["model"] == "tiny"

        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate",
            data=json.dumps({"num": 1, "context": 1, "sampler": "ddim",
                             "sample_steps": 4, "seed": 3}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req) as r:
            vols = np.load(io.BytesIO(r.read()))
        assert vols.shape == (1, 16, 16, 16, 1)

        # nii format returns a parseable NIfTI of the first volume
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate",
            data=json.dumps({"num": 1, "context": 0, "sampler": "ddim",
                             "sample_steps": 4, "format": "nii"}).encode())
        with urllib.request.urlopen(req) as r:
            payload = r.read()
        import gzip
        raw = gzip.decompress(payload)
        assert raw[:4] == (348).to_bytes(4, "little")  # NIfTI-1 header

        # bad request -> 400, not a crash
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate",
            data=json.dumps({"num": "NaN"}).encode())
        try:
            urllib.request.urlopen(req)
            assert False, "expected HTTP 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        server.shutdown()


def test_request_validation(svc):
    # bounds: num, sample_steps, context, sampler are validated before a
    # program is compiled/cached (ADVICE r1: unbounded values exhaust
    # compile time / HBM; out-of-range context was silently clamped)
    n_before = len(svc.compiled_signatures())
    with pytest.raises(ValueError):
        svc.generate(num=0)
    with pytest.raises(ValueError):
        svc.generate(num=GenerationService.MAX_BATCH + 1)
    with pytest.raises(ValueError):
        svc.generate(num=1, sampler="nonsense")
    with pytest.raises(ValueError):
        svc.generate(num=1, sampler="ddim", sample_steps=10 ** 6)
    with pytest.raises(ValueError):
        svc.generate(num=1, context=99, sampler="ddim", sample_steps=4)
    # guidance on a model trained without cfg_dropout must raise loudly,
    # not silently return unguided samples
    with pytest.raises(ValueError):
        svc.generate(num=1, context=1, sampler="ddim", sample_steps=4,
                     guidance_scale=3.0)
    assert len(svc.compiled_signatures()) == n_before


def test_http_bad_request_returns_400(svc):
    server = serve(svc, port=0)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate",
            data=json.dumps({"num": 10 ** 6}).encode(),
            headers={"Content-Type": "application/json"})
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req)
        assert ei.value.code == 400
    finally:
        server.shutdown()


def test_ddpm_request_does_not_fork_cache_on_sample_steps(svc):
    # sample_steps is DDIM-only; a ddpm request must normalize it away so
    # clients cycling the field don't compile new programs
    svc.generate(num=1, context=0, sampler="ddpm")
    n = len(svc.compiled_signatures())
    svc.generate(num=1, context=0, sampler="ddpm", sample_steps=7)
    assert len(svc.compiled_signatures()) == n


def test_program_cache_lru_bound(svc):
    """The compiled-program cache must stay bounded (ADVICE r2): distinct
    request signatures beyond MAX_PROGRAMS evict the oldest entry from
    both the service cache and the trainer's generate cache."""
    svc._programs.clear()
    svc.trainer._generate_cache.clear()
    for num in range(1, GenerationService.MAX_PROGRAMS + 4):
        svc.generate(num=num, context=0, sampler="ddim", sample_steps=2)
    assert len(svc._programs) == GenerationService.MAX_PROGRAMS
    assert len(svc.trainer._generate_cache) == GenerationService.MAX_PROGRAMS


def test_guidance_scale_quantized():
    """guidance_scale is rounded to 1 decimal before it becomes a program
    cache key, and out-of-range values are rejected (ADVICE r2)."""
    import types

    captured = {}

    class FakeSvc(GenerationService):
        def __init__(self):  # skip trainer construction
            self.cfg = types.SimpleNamespace(
                timesteps=8,
                unet=types.SimpleNamespace(cfg_dropout=0.1, context_dim=1))
            self.trainer = types.SimpleNamespace(conditional=True)
            from collections import OrderedDict
            self._programs = OrderedDict()
            self._lock = threading.Lock()
            self._counter = 0

        def _program(self, batch, sampler, sample_steps, guidance):
            captured["guidance"] = guidance
            def fn(state, rng, ctx):
                return np.zeros((batch, 2, 2, 2, 1), np.float32)
            return fn

    s = FakeSvc()
    s.state = None
    s.generate(num=1, context=0, sampler="ddim", sample_steps=2,
               guidance_scale=3.14159)
    assert captured["guidance"] == 3.1
    with pytest.raises(ValueError):
        s.generate(num=1, context=0, guidance_scale=21.0)
    with pytest.raises(ValueError):
        s.generate(num=1, context=0, guidance_scale=-0.5)


def test_from_checkpoint_restores_flagship_recipe(tmp_path):
    """Serving the round-3 flagship recipe: a checkpoint trained with
    --ema_decay + --prediction_type v + --cfg_dropout restores through
    GenerationService.from_checkpoint(ema=True) (template carries the
    ema_params subtree) and serves guided requests."""
    import dataclasses

    from ldm3d.core.config import ExperimentConfig, DataConfig
    from ldm3d.train.checkpoint import CheckpointManager

    cfg = _flagship_cfg(tiny=True)
    cfg = dataclasses.replace(
        cfg, prediction_type="v", min_snr_gamma=5.0,
        unet=dataclasses.replace(cfg.unet, cfg_dropout=0.25))
    tcfg = TrainConfig(batch_size=2, dtype="float32", ema_decay=0.9)
    trainer = DiffusionTrainer(cfg, tcfg, conditional=True)
    state = trainer.init_state(jax.random.PRNGKey(0), (2, 16, 16, 16, 1))
    vol = jax.random.uniform(jax.random.PRNGKey(1), (2, 16, 16, 16, 1))
    import jax.numpy as jnp
    state, _ = trainer.train_step(state, vol, jnp.ones((2,), jnp.int32))
    assert state.ema_params is not None

    ckpt_dir = str(tmp_path / "dm")
    mgr = CheckpointManager(ckpt_dir)
    mgr.save(1, state)
    mgr.wait()
    mgr.close()

    exp = ExperimentConfig(name="tiny_flagship", model="conditional_dm",
                           vqvae=cfg.vqvae, diffusion=cfg,
                           train=tcfg, data=DataConfig(volume_size=16))
    svc = GenerationService.from_checkpoint(exp, ckpt_dir, ema=True)
    assert svc.epoch == 1
    assert svc.state.ema_params is not None
    v = svc.generate(num=1, context=1, sampler="ddim", sample_steps=2,
                     guidance_scale=2.0)
    assert v.shape == (1, 16, 16, 16, 1) and np.isfinite(v).all()
