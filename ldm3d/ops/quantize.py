"""Fused codebook nearest-neighbour ops (the shared kernel of all five
reference quantizers).

Every reference quantizer flattens activations to [N, D], computes L2
distances to a [K, D] codebook via ||x||^2 + ||c||^2 - 2 x.c, takes argmin,
and gathers (reference: networks/vqvae3d_monai.py:133-177,
networks/nsvqvae.py:144-166, networks/vqgan_attn_cp.py:191-215). On TPU we
fuse distance-matmul + argmin into one Pallas kernel so the [N, K] distance
matrix lives only in VMEM tiles and the matmul runs on the MXU; the gather
and EMA statistics remain plain XLA (one-hot matmuls, also MXU-friendly).

`impl="auto"` picks Pallas on TPU and XLA elsewhere, so the same code path
runs in CPU unit tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# ---------------------------------------------------------------------------
# XLA reference implementation
# ---------------------------------------------------------------------------


def _nearest_indices_xla(x: jax.Array, codebook: jax.Array) -> jax.Array:
    """[N, D], [K, D] -> [N] int32 argmin_k ||x - c_k||^2."""
    # ||x||^2 is constant per row: argmin only needs ||c||^2 - 2 x.c.
    scores = jnp.dot(x, codebook.T, preferred_element_type=jnp.float32)
    c_sq = jnp.sum(jnp.square(codebook.astype(jnp.float32)), axis=-1)
    return jnp.argmin(c_sq[None, :] - 2.0 * scores, axis=-1).astype(jnp.int32)


# ---------------------------------------------------------------------------
# Pallas TPU kernel
# ---------------------------------------------------------------------------

# Measured on TPU v5e at the flagship shape (N=32768, D=256, K=1024):
# tile 512 -> 0.45 ms, 1024 -> 0.37 ms, 2048 -> 0.11 ms (vs XLA 0.23 ms),
# 4096 regresses (VMEM pressure). 2048 amortizes the per-grid-step argmin.
_TILE_N = 2048


def _nearest_kernel(x_ref, cb_ref, csq_ref, idx_ref):
    """One grid step: [TILE_N, D] x [D, K] -> argmin over K, in VMEM.

    The distance matrix tile is [TILE_N, K] fp32 in VMEM and is never written
    to HBM; the matmul uses the MXU via jnp.dot.
    """
    scores = jnp.dot(x_ref[:], cb_ref[:], preferred_element_type=jnp.float32)
    dists = csq_ref[:] - 2.0 * scores  # [TILE_N, K]; + ||x||^2 omitted (const/row)
    idx_ref[:] = jnp.argmin(dists, axis=-1, keepdims=True).astype(jnp.int32)


def _nearest_indices_pallas(x: jax.Array, codebook: jax.Array) -> jax.Array:
    n, d = x.shape
    k = codebook.shape[0]
    n_pad = -n % _TILE_N
    if n_pad:
        x = jnp.pad(x, ((0, n_pad), (0, 0)))
    n_tot = n + n_pad

    cb_t = codebook.T.astype(x.dtype)                       # [D, K]
    c_sq = jnp.sum(jnp.square(codebook.astype(jnp.float32)), axis=-1)
    c_sq = c_sq.reshape(1, k)

    grid = (n_tot // _TILE_N,)
    idx = pl.pallas_call(
        _nearest_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_TILE_N, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_TILE_N, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tot, 1), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_tot * d * k,
            bytes_accessed=n_tot * d * 4 + d * k * 4 + n_tot * 4,
            transcendentals=0,
        ),
    )(x, cb_t, c_sq)
    return idx[:n, 0]


def _pallas_ok(n: int, d: int, k: int) -> bool:
    if jax.default_backend() != "tpu":
        return False
    # codebook + one [TILE_N, K] fp32 tile + x tile must fit VMEM comfortably.
    vmem = d * k * 4 + _TILE_N * k * 4 + _TILE_N * d * 4
    # small-N calls are launch-bound: XLA's fused matmul+argmin wins there
    return (n >= _TILE_N and vmem < 12 * 1024 * 1024
            and d % 128 == 0 and k % 128 == 0)


def nearest_codebook_indices(x: jax.Array, codebook: jax.Array,
                             impl: str = "auto") -> jax.Array:
    """argmin_k ||x_n - c_k||^2 for flattened activations.

    Args:
      x: [N, D] activations.
      codebook: [K, D] codebook (row-major layout; transposed-codebook
        reference variants are normalized to this layout at the module level).
      impl: "auto" | "xla" | "pallas".

    Returns: [N] int32 indices.
    """
    # argmin is piecewise-constant: force both operands out of any
    # surrounding linearization so the Pallas kernel (which has no JVP
    # rule) is never differentiated through.
    x = jax.lax.stop_gradient(x)
    codebook = jax.lax.stop_gradient(codebook)
    n, d = x.shape
    k = codebook.shape[0]
    if impl == "pallas" or (impl == "auto" and _pallas_ok(n, d, k)):
        return _nearest_indices_pallas(x, codebook)
    return _nearest_indices_xla(x, codebook)


# ---------------------------------------------------------------------------
# Composite quantization ops shared by the quantizer modules
# ---------------------------------------------------------------------------


def codebook_usage_counts(indices: jax.Array, num_embeddings: int) -> jax.Array:
    """Per-code usage counts (reference bincount, vqvae3d_monai.py:161).

    One-hot sum compiles to an efficient scatter/matmul on TPU; under jit with
    a sharded batch the result is automatically the cross-replica (global)
    count, fixing the reference's per-replica race (SURVEY.md §2.6)."""
    one_hot = jax.nn.one_hot(indices, num_embeddings, dtype=jnp.float32)
    return jnp.sum(one_hot, axis=0)


def perplexity_from_counts(counts: jax.Array, eps: float = 1e-10) -> jax.Array:
    """exp entropy of codebook usage (reference vqvae3d_monai.py:158-159)."""
    avg = counts / jnp.maximum(jnp.sum(counts), 1.0)
    return jnp.exp(-jnp.sum(avg * jnp.log(avg + eps)))


def ema_statistics(x_flat: jax.Array, indices: jax.Array,
                   num_embeddings: int) -> tuple[jax.Array, jax.Array]:
    """(cluster_counts [K], cluster_sums [K, D]) for EMA codebook updates
    (reference: vqgan_attn_cp.py:220-230, emavqvae.py:213-222)."""
    one_hot = jax.nn.one_hot(indices, num_embeddings, dtype=jnp.float32)
    counts = jnp.sum(one_hot, axis=0)
    sums = jnp.dot(one_hot.T, x_flat.astype(jnp.float32),
                   preferred_element_type=jnp.float32)
    return counts, sums


@functools.partial(jax.jit, static_argnames=("impl",))
def quantize_lookup(x_flat: jax.Array, codebook: jax.Array,
                    impl: str = "auto") -> tuple[jax.Array, jax.Array]:
    """(quantized [N, D], indices [N]). Gradients flow to `codebook` through
    the gather (as in the reference's one-hot matmul, vqvae3d_monai.py:141)."""
    indices = nearest_codebook_indices(
        jax.lax.stop_gradient(x_flat), jax.lax.stop_gradient(codebook), impl)
    quantized = jnp.take(codebook, indices, axis=0)
    return quantized, indices
