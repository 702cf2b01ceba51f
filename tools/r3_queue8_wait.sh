#!/bin/bash
# Wait for the TPU relay to come back (known wedge/restart failure mode,
# NOTES_r3.md), then run queue phase 8. Probes with a short-lived client:
# while the relay is down the probe never obtains a grant, so killing it
# on timeout is safe.
cd /root/repo
for i in $(seq 1 150); do
  if timeout 180 python -c "import jax; jax.devices(); import jax.numpy as jnp; (jnp.ones((8,8))@jnp.ones((8,8))).block_until_ready()" >/dev/null 2>&1; then
    echo "[wait] TPU alive after probe $i $(date -u +%H:%M:%S)"
    exec bash tools/r3_queue8.sh
  fi
  echo "[wait] probe $i: TPU unavailable $(date -u +%H:%M:%S)"
  sleep 120
done
echo "[wait] relay never came back"
