"""Multi-host (2-process) dryrun on CPU+Gloo — the DCN readiness test
(VERDICT r1 #8): jax.distributed over two processes, mesh built from the
global device set, per-host batch rows in the DataLoader, one real VQ
train step over the global batch. Each subprocess gets 4 virtual CPU
devices => an 8-device global mesh."""

import pytest

pytestmark = pytest.mark.slow

import json
import os
import socket
import subprocess
import sys
import textwrap

import numpy as np

WORKER = textwrap.dedent("""
    import json, os, sys
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax
    jax.config.update("jax_platforms", "cpu")

    pid, port, cache_dir = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    from ldm3d.parallel.distributed import initialize
    assert initialize(f"127.0.0.1:{port}", 2, pid)

    import jax.numpy as jnp
    from ldm3d.core.config import DataConfig, MeshConfig, QuantizerConfig, \\
        TrainConfig, VQVAEConfig
    from ldm3d.data.pipeline import DataLoader, VolumeCache
    from ldm3d.parallel.mesh import make_mesh
    from ldm3d.train.vq_trainer import VQTrainer

    mesh = make_mesh(MeshConfig(data=-1, space=1))
    assert mesh.devices.size == 8, mesh.devices.size

    cache = VolumeCache(cache_dir)
    loader = DataLoader(cache, 8, DataConfig(volume_size=16), train=True,
                        mesh=mesh)
    rows = loader._local_rows()
    vol, mask, ctx = next(iter(loader))
    assert vol.shape == (8, 16, 16, 16, 1), vol.shape

    cfg = VQVAEConfig(
        in_channels=2, out_channels=2, num_channels=(4, 8),
        num_res_channels=(4, 8), num_res_layers=1,
        downsample_stride=(2, 2), downsample_kernel=(4, 4),
        upsample_stride=(2, 2), upsample_kernel=(4, 4),
        quantizer=QuantizerConfig(kind="ste", num_embeddings=16,
                                  embedding_dim=8))
    tr = VQTrainer(cfg, TrainConfig(batch_size=8, dtype="float32"),
                   mesh=mesh)
    state = tr.init_state(jax.random.PRNGKey(0), (8, 16, 16, 16, 2))
    state, metrics = tr.train_step(state, vol, mask)

    # orbax round-trip across both processes (VERDICT r2 next-9): save the
    # post-step state collectively, restore into a fresh template, compare
    from ldm3d.train.checkpoint import CheckpointManager
    mgr = CheckpointManager(sys.argv[4], keep=1)
    mgr.save(1, state)
    mgr.wait()
    template = tr.init_state(jax.random.PRNGKey(9), (8, 16, 16, 16, 2))
    restored, ep = mgr.restore(template)
    leaves = zip(jax.tree_util.tree_leaves(jax.device_get(state.params)),
                 jax.tree_util.tree_leaves(jax.device_get(restored.params)))
    ckpt_ok = bool(ep == 1 and all((a == b).all() for a, b in leaves))
    mgr.close()

    out = {"pid": pid,
           "rows": [int(rows.start), int(rows.stop)],
           "batch_mean": float(jnp.mean(vol)),
           "loss": float(metrics["loss"]),
           "ckpt_ok": ckpt_ok}
    print("RESULT " + json.dumps(out))
""")


def test_two_process_cpu_training_step(tmp_path):
    from ldm3d.data.pipeline import write_synthetic_cache

    cache_dir = str(tmp_path / "cache")
    write_synthetic_cache(cache_dir, 8, 16, seed=0)
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = "/root/repo" + (
        ":" + env["PYTHONPATH"] if env.get("PYTHONPATH") else "")
    ckpt_dir = str(tmp_path / "ckpt")
    procs = [subprocess.Popen(
        [sys.executable, str(worker), str(pid), str(port), cache_dir,
         ckpt_dir],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        cwd="/root/repo", env=env) for pid in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=480)
        assert p.returncode == 0, out[-3000:]
        outs.append(out)

    results = {}
    for out in outs:
        line = [ln for ln in out.splitlines() if ln.startswith("RESULT ")]
        assert line, out[-2000:]
        rec = json.loads(line[-1][len("RESULT "):])
        results[rec["pid"]] = rec

    # each host read a disjoint contiguous half of the global batch
    spans = sorted((results[p]["rows"][0], results[p]["rows"][1])
                   for p in results)
    assert spans == [(0, 4), (4, 8)], spans
    # the global batch and the train step agree bitwise across processes
    assert results[0]["batch_mean"] == results[1]["batch_mean"]
    assert results[0]["loss"] == results[1]["loss"]
    assert np.isfinite(results[0]["loss"])
    # the collective orbax save/restore round-tripped bit-equal on BOTH
    # processes
    assert results[0]["ckpt_ok"] and results[1]["ckpt_ok"]
