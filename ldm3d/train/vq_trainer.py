"""Stage-1 VQ-VAE trainer: jitted, mesh-sharded train/eval steps.

Parity with the reference training semantics (networks/vqvae3d_monai.py:
476-544 driven by main.py:186-271):
  - input = concat(volume, mask) on the channel axis (train_step :478)
  - reconstruction MSE on the image channel only (:487)
  - plus the quantizer loss; the reference's manual `/num_gpus` (:489)
    disappears because mean-reduction under jit over the sharded global batch
    already yields the global mean
  - eval adds per-slice SSIM/PSNR (:523-536)

TPU-native structure: one `jax.jit` per step with NamedSharding constraints —
batch sharded over the 'data' mesh axis, state replicated; XLA inserts the
gradient all-reduce over ICI.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ldm3d.core.config import TrainConfig, VQVAEConfig
from ldm3d.models.quantizers import replace_unused_codebooks
from ldm3d.models.vqvae import VQVAE
from ldm3d.models.vqvae_legacy import LegacyVQVAE
from ldm3d.ops.metrics import volume_psnr, volume_ssim
from ldm3d.parallel.mesh import replicated
from ldm3d.train.state import TrainState


def make_optimizer(cfg: TrainConfig, lr: float | None = None
                   ) -> optax.GradientTransformation:
    """Adam with the LR injected as opt-state hyperparameter so plateau
    schedulers (ldm3d/train/callbacks.py) can adjust it without
    recompiling the jitted step."""
    return optax.inject_hyperparams(optax.adam)(
        learning_rate=lr if lr is not None else cfg.learning_rate,
        b1=cfg.adam_b1, b2=cfg.adam_b2)


class VQTrainer:
    """Owns the model, optimizer, and compiled step functions."""

    def __init__(self, cfg: VQVAEConfig, train_cfg: TrainConfig,
                 mesh: Optional[Mesh] = None):
        self.cfg = cfg
        self.train_cfg = train_cfg
        self.mesh = mesh
        dtype = jnp.bfloat16 if train_cfg.dtype == "bfloat16" else jnp.float32
        if cfg.family == "ema_skip":
            from ldm3d.models.emavqvae import EMASkipTrainable
            self.model = EMASkipTrainable(
                num_channels=cfg.out_channels,
                num_filters=cfg.num_channels[0],
                embedding_dim=cfg.quantizer.embedding_dim,
                num_embeddings=cfg.quantizer.num_embeddings, dtype=dtype)
        elif cfg.family == "legacy":
            self.model = LegacyVQVAE(
                latent_dim=cfg.quantizer.embedding_dim,
                num_embeddings=cfg.quantizer.num_embeddings,
                mode=cfg.legacy_mode, down=cfg.legacy_down,
                out_channels=cfg.out_channels, dtype=dtype)
        else:
            self.model = VQVAE(cfg, dtype=dtype)
        self.tx = make_optimizer(train_cfg)
        self._train_step = None  # built on first call (needs state shardings)
        self._eval_step = self._build_eval_step()

    def _state_shardings(self, state):
        """Placement for the train state: replicated, except conv channels
        over the 'model' axis when the mesh has one (tensor parallelism,
        SURVEY.md §2.6 TP row)."""
        from ldm3d.parallel.mesh import MODEL_AXIS
        rep = replicated(self.mesh)
        if self.mesh.shape.get(MODEL_AXIS, 1) == 1:
            return rep
        from ldm3d.parallel.tp import tp_state_shardings
        return tp_state_shardings(state, self.mesh)

    # -- initialization ----------------------------------------------------

    def init_state(self, rng: jax.Array, sample_shape) -> TrainState:
        p_rng, n_rng, d_rng, s_rng = jax.random.split(rng, 4)
        dummy = jnp.zeros(sample_shape, jnp.float32)
        variables = self.model.init(
            {"params": p_rng, "noise": n_rng, "dropout": d_rng}, dummy,
            training=False)
        params = variables["params"]
        state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            vq_stats=variables.get("vq_stats"),
            batch_stats=variables.get("batch_stats"),
            opt_state=self.tx.init(params),
            rng=s_rng)
        if self.mesh is not None:
            state = jax.device_put(state, self._state_shardings(state))
        return state

    # -- steps -------------------------------------------------------------

    def _model_input(self, vol, mask):
        """concat(img, mask) for 2-channel configs (reference
        vqvae3d_monai.py:478); the 1-channel families (NSVQ/RNSVQ/EMA)
        train on the bare volume (reference nsvqvae.py:432)."""
        if self.cfg.in_channels > vol.shape[-1]:
            return jnp.concatenate([vol, mask], axis=-1)
        return vol

    def _loss_fn(self, params, state: TrainState, vol, mask, rngs, training):
        x = self._model_input(vol, mask)
        variables = {"params": params}
        mutable = []
        if state.vq_stats is not None:
            variables["vq_stats"] = state.vq_stats
            mutable.append("vq_stats")
        if state.batch_stats is not None:
            variables["batch_stats"] = state.batch_stats
            mutable.append("batch_stats")
        if training:
            (recon, aux), updates = self.model.apply(
                variables, x, training=True, mutable=mutable, rngs=rngs)
        else:
            recon, aux = self.model.apply(variables, x, training=False)
            updates = {}
        img_recon = recon[..., :vol.shape[-1]].astype(jnp.float32)
        recon_loss = jnp.mean(jnp.square(img_recon - vol))
        q_weight = self.cfg.quantizer.quantize_loss_weight
        loss = recon_loss + q_weight * aux.loss.astype(jnp.float32)
        metrics = {
            "loss": loss,
            "reconst_loss": recon_loss,
            "quantize_loss": aux.loss,
            "perplexity": aux.perplexity,
        }
        if aux.usage_counts.ndim == 2:
            # multi-stage quantizer (RNSVQ): one perplexity column per
            # stage so dead later stages are visible in training.log
            from ldm3d.ops.quantize import perplexity_from_counts
            for i in range(aux.usage_counts.shape[0]):
                metrics[f"perplexity_stage{i}"] = perplexity_from_counts(
                    aux.usage_counts[i])
        return loss, (metrics, updates, img_recon)

    def _build_train_step(self, state_template=None):
        def step(state: TrainState, vol, mask):
            rng, noise_rng, drop_rng = jax.random.split(state.rng, 3)
            rngs = {"noise": noise_rng, "dropout": drop_rng}
            grad_fn = jax.value_and_grad(self._loss_fn, has_aux=True)
            (loss, (metrics, updates, _)), grads = grad_fn(
                state.params, state, vol, mask, rngs, True)
            updates_tx, opt_state = self.tx.update(grads, state.opt_state,
                                                   state.params)
            params = optax.apply_updates(state.params, updates_tx)
            new_state = state.replace(
                step=state.step + 1, params=params, opt_state=opt_state,
                vq_stats=updates.get("vq_stats", state.vq_stats),
                batch_stats=updates.get("batch_stats", state.batch_stats),
                rng=rng)
            return new_state, metrics

        if self.mesh is None:
            return jax.jit(step, donate_argnums=(0,))
        rep = replicated(self.mesh)
        # input shardings are inferred from the args (batch may be sharded
        # over 'data' and optionally a spatial axis over 'space'); state is
        # pinned to its placement (replicated, or TP-sharded conv channels
        # when the mesh has a 'model' axis) and metrics replicated. The
        # spatial context pins every conv activation's depth axis to
        # 'space' (ldm3d/parallel/spatial.py).
        from ldm3d.parallel.spatial import with_spatial
        state_sh = rep if state_template is None \
            else self._state_shardings(state_template)
        return jax.jit(with_spatial(self.mesh, step), donate_argnums=(0,),
                       out_shardings=(state_sh, rep))

    def _build_eval_step(self):
        def step(state: TrainState, vol, mask):
            _, (metrics, _, img_recon) = self._loss_fn(
                state.params, state, vol, mask, {}, False)
            metrics = dict(metrics)
            metrics["ssim"] = volume_ssim(img_recon, vol)
            metrics["psnr"] = volume_psnr(img_recon, vol)
            return metrics

        if self.mesh is None:
            return jax.jit(step)
        from ldm3d.parallel.spatial import with_spatial
        rep = replicated(self.mesh)
        return jax.jit(with_spatial(self.mesh, step), out_shardings=rep)

    def train_step(self, state: TrainState, vol, mask):
        if self._train_step is None:
            self._train_step = self._build_train_step(state)
        return self._train_step(state, vol, mask)

    def eval_step(self, state: TrainState, vol, mask):
        return self._eval_step(state, vol, mask)

    def recalibrate_batch_stats(self, state: TrainState, loader,
                                passes: int = 3) -> TrainState:
        """Re-estimate BatchNorm running statistics with forward-only
        passes over `loader` (params, codebook EMA state and optimizer
        untouched).

        BN eval mode uses running averages (momentum .99, Keras parity —
        layers.py:105) that can lag the training distribution, which shows
        up as val-loss spikes while train loss is smooth (observed on the
        4-level 8^3-bottleneck config). ~`passes` epochs of forwards move
        the averages onto the final-params activation distribution; the
        time constant is 1/(1-momentum) = 100 batches."""
        if state.batch_stats is None:
            return state

        def fwd(batch_stats, vol, mask, rng):
            x = self._model_input(vol, mask)
            variables = {"params": state.params,
                         "batch_stats": batch_stats}
            mutable = ["batch_stats"]
            if state.vq_stats is not None:
                variables["vq_stats"] = state.vq_stats
                mutable.append("vq_stats")  # written in training mode;
                # its updates are dropped below (codebook state untouched)
            n_rng, d_rng = jax.random.split(rng)
            _, updates = self.model.apply(
                variables, x, training=True, mutable=mutable,
                rngs={"noise": n_rng, "dropout": d_rng})
            return updates["batch_stats"]

        fwd = jax.jit(fwd)  # no donation: the caller's state keeps its
        # batch_stats buffer valid (the stats pytree is tiny)
        batch_stats = state.batch_stats
        # fresh noise/dropout draws per (pass, batch): a fixed key would
        # repeat the same dropout mask on every batch and bias the
        # re-estimated statistics relative to the training distribution
        base_rng = jax.random.fold_in(state.rng, 0x5eca11b)
        i = 0
        for _ in range(passes):
            for vol, mask, _ctx in loader:
                batch_stats = fwd(batch_stats, vol, mask,
                                  jax.random.fold_in(base_rng, i))
                i += 1
        return state.replace(batch_stats=batch_stats)

    # -- codebook maintenance ---------------------------------------------

    def replace_unused(self, state: TrainState, num_batches: int,
                       rng: jax.Array) -> Tuple[TrainState, jax.Array]:
        """Epoch-end unused-code replacement (ReplaceCodebookCallback,
        reference vqvae3d_monai.py:100-109) as a pure state transition.

        ste/nsvq re-seed dead rows of the single codebook; rnsvq re-seeds
        per residual stage from that stage's own used rows (reference
        rnsvqvae.py:142-190). The EMA families (ema / ema_sonnet) return
        unchanged: they restart dead codes *inside* the training step
        (random-restart against `restart_thres`, quantizers.py
        VectorQuantizerEMA), so the epoch-end hook is a deliberate no-op
        for them."""
        kind = self.cfg.quantizer.kind
        thresh = self.cfg.quantizer.discarding_threshold
        if kind in ("ste", "nsvq"):
            params = state.params["quantizer"]
            usage = state.vq_stats["quantizer"]["codebooks_used"]
            new_cb, new_usage, n = replace_unused_codebooks(
                params["codebook"], usage, num_batches, rng, thresh)
            new_params = dict(state.params)
            new_params["quantizer"] = {**params, "codebook": new_cb}
            new_stats = dict(state.vq_stats)
            new_stats["quantizer"] = {**state.vq_stats["quantizer"],
                                      "codebooks_used": new_usage}
            return state.replace(params=new_params, vq_stats=new_stats), n
        if kind == "rnsvq":
            from ldm3d.models.quantizers import \
                replace_unused_codebooks_staged
            params = state.params["quantizer"]
            usage = state.vq_stats["quantizer"]["codebooks_used"]
            new_cb, new_usage, n = replace_unused_codebooks_staged(
                params["codebooks"], usage, num_batches, rng, thresh)
            new_params = dict(state.params)
            new_params["quantizer"] = {**params, "codebooks": new_cb}
            new_stats = dict(state.vq_stats)
            new_stats["quantizer"] = {**state.vq_stats["quantizer"],
                                      "codebooks_used": new_usage}
            return state.replace(params=new_params, vq_stats=new_stats), n
        return state, jnp.zeros((), jnp.int32)

    # -- inference --------------------------------------------------------

    def reconstruct(self, state: TrainState, vol, mask):
        if not hasattr(self, "_reconstruct"):
            self._reconstruct = jax.jit(
                lambda st, v, m: self.model.apply(
                    st.variables(), self._model_input(v, m), training=False))
        return self._reconstruct(state, vol, mask)
