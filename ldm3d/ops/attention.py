"""Blockwise (flash) voxel attention for 3D latent grids.

The reference's `AttentionBlock` materializes the full (h*w*d)^2 score tensor
through two reshapes (networks/dm3d.py:51-61), which caps it at tiny 8^3-16^3
latent grids. Here attention runs over the flattened voxel sequence with an
online-softmax Pallas kernel: score tiles live only in VMEM, the two matmuls
run on the MXU, and memory is O(N * C) instead of O(N^2) — full-resolution
attention at 32^3+ grids becomes feasible (SURVEY.md §2.6 SP/CP row).

`impl="auto"` uses the Pallas kernel on TPU when shapes align and plain XLA
attention elsewhere (CPU tests, tiny sequences). Sequence lengths that do not
divide the block sizes are handled inside the kernel: the padded tail of the
last key block is masked to -inf before it enters the online softmax, so any
(nq, nkv) is safe (padded query rows compute garbage that the output
BlockSpec discards on store).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _attention_xla(q: jax.Array, k: jax.Array, v: jax.Array,
                   scale: float) -> jax.Array:
    scores = jnp.einsum("bqc,bkc->bqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    return jnp.einsum("bqk,bkc->bqc", probs, v)


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref, *,
                  scale: float, nk: int, nkv: int, block_k: int):
    ik = pl.program_id(2)

    @pl.when(ik == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0]                                   # [BQ, C]
    k = k_ref[0]                                   # [BK, C]
    v = v_ref[0]                                   # [BK, C]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale   # [BQ, BK]

    # Mask the padded tail of the final key block: columns at global index
    # >= nkv hold unspecified pad data (NaN in interpret mode) and must not
    # enter the softmax; the matching v rows must be zeroed too, because
    # even a zero probability times a NaN pad value poisons the p @ v
    # accumulation.
    if nkv % block_k != 0:
        col = ik * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < nkv, s, _NEG_INF)
        vrow = ik * block_k + jax.lax.broadcasted_iota(jnp.int32, v.shape, 0)
        v = jnp.where(vrow < nkv, v, 0)

    m_prev = m_ref[:]                              # [BQ, 1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    p = jnp.exp(s - m_new)                         # [BQ, BK]
    alpha = jnp.exp(m_prev - m_new)                # [BQ, 1]
    l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    m_ref[:] = m_new

    @pl.when(ik == nk - 1)
    def _():
        o_ref[0] = (acc_ref[:] / l_ref[:]).astype(o_ref.dtype)


def _attention_pallas(q: jax.Array, k: jax.Array, v: jax.Array, scale: float,
                      block_q: int = 1024, block_k: int = 1024,
                      interpret: bool = False) -> jax.Array:
    # Block size measured on TPU v5e at seq 32768, C=64: 512^2 -> 6.0 ms,
    # 1024^2 -> 2.45 ms (vs 16.9 ms XLA), 2048-blocks regress (VMEM).
    b, nq, c = q.shape
    nkv = k.shape[1]
    block_q = min(block_q, nq)
    block_k = min(block_k, nkv)
    grid = (b, pl.cdiv(nq, block_q), pl.cdiv(nkv, block_k))

    kernel = functools.partial(_flash_kernel, scale=scale, nk=grid[2],
                               nkv=nkv, block_k=block_k)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, c), lambda b, iq, ik: (b, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, c), lambda b, iq, ik: (b, ik, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, c), lambda b, iq, ik: (b, ik, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, c), lambda b, iq, ik: (b, iq, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, nq, c), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, c), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * b * nq * nkv * c,
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize,
            transcendentals=b * nq * nkv,
        ),
        interpret=interpret,
    )(q, k, v)


def _pallas_ok(q: jax.Array, k: jax.Array) -> bool:
    if jax.default_backend() != "tpu":
        return False
    b, nq, c = q.shape
    nkv = k.shape[1]
    # XLA's fused attention wins below ~8k^2 scores (measured: seq 4096 XLA
    # 0.47 ms vs Pallas 0.92 ms; seq 32768 XLA 16.9 ms vs Pallas 2.5 ms) —
    # the kernel pays off once the score matrix stops fitting cache-friendly
    # fusion, i.e. full-resolution attention at 32^3+ voxel grids. The U-Net
    # head widths are 64/128/256 (conditional_dm3d.py:321 stem 32 doubling
    # up), so C must admit 64: lane-dim 64 relayouts on the MXU but was
    # measured fast (2.45 ms at seq 32768, C=64 — the PERF.md number).
    return c % 64 == 0 and nq * nkv >= 8192 * 8192


def voxel_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                    scale: float | None = None,
                    impl: str = "auto") -> jax.Array:
    """Softmax attention over flattened voxel sequences.

    Args:
      q, k, v: [B(. heads folded into B), N, C].
      scale: score scale; defaults to C ** -0.5 as the reference
        (dm3d.py:44 uses units^-0.5).
      impl: "auto" | "xla" | "pallas". "pallas" forces the flash kernel
        (interpreted off-TPU so tests can exercise it on CPU).
    """
    if scale is None:
        scale = float(q.shape[-1]) ** -0.5
    if impl == "pallas":
        return _attention_pallas(q, k, v, scale,
                                 interpret=jax.default_backend() != "tpu")
    if impl == "auto" and _pallas_ok(q, k):
        return _attention_pallas(q, k, v, scale)
    return _attention_xla(q, k, v, scale)
