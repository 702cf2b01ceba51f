"""Generation-server tests (ldm3d/serve.py) on a tiny CPU model."""

import io
import json
import threading
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
