"""Jitted train / eval steps (the reference's per-batch hot loop,
src/main.py:137-169, compiled once as a single XLA program).

Differences from the reference, by design:

- one fused program per step: forward + joint loss + backward + AdamW +
  schedule + metrics (the reference launches separate kernels and syncs
  ``.item()`` thrice per batch — src/main.py:158, 165, 168); metrics
  come back as a small device dict fetched once,
- multimodal features are actually fed to the model (the reference
  unpacks but drops them — src/main.py:138 vs 147-150; SURVEY.md §2.4.3),
- SPMD: the batch dimension is sharded over the mesh ``data`` axis;
  XLA inserts the gradient all-reduce over ICI,
- fill rows (``valid`` = False, used to complete the final eval batch)
  are masked out of both losses and metrics.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from ergm_tpu.core.config import ModelConfig
from ergm_tpu.models import gpt2


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def create_train_state(params, tx: optax.GradientTransformation) -> TrainState:
    return TrainState(params=params, opt_state=tx.init(params), step=jnp.zeros((), jnp.int32))


def _losses_and_metrics(params, config: ModelConfig, batch: Dict[str, jnp.ndarray],
                        deterministic: bool, rng, mesh=None):
    valid = batch["valid"]
    labels = jnp.where(valid[:, None], batch["labels"], -100)
    out = gpt2.forward(
        params, config, batch["input_ids"],
        token_type_ids=batch["token_type_ids"],
        imgs=batch.get("imgs"), auds=batch.get("auds"),
        caption_ids=batch.get("caption_ids"),
        encoder_attention_mask=batch.get("caption_mask"),
        labels=labels,
        deterministic=deterministic, rng=rng,
        # bucket-padded batches: emotion head reads the last real token
        seq_lengths=batch.get("seq_lengths"),
        # the loss path never needs dense [B, L, V] logits; the fused/
        # chunked CE keeps HBM bounded at large batch
        compute_logits=False,
        mesh=mesh,
    )
    lm_loss = out.lm_loss
    # emotion CE with fill rows masked (reference loss: src/model.py:710-711)
    emo_logits = out.emotion_logits
    logz = jax.nn.logsumexp(emo_logits, axis=-1)
    gold = jnp.take_along_axis(emo_logits, batch["emotion_labels"][:, None], axis=-1)[:, 0]
    w = valid.astype(jnp.float32)
    emo_loss = jnp.sum((logz - gold) * w) / jnp.maximum(jnp.sum(w), 1.0)
    loss = lm_loss + emo_loss

    preds = jnp.argmax(emo_logits, axis=-1)
    # supervised-token count for token-weighted corpus PPL (the
    # reference's PPL weights batches equally regardless of token count,
    # src/main.py:171-173 — report both; VERDICT r1 weak #6)
    lm_tokens = jnp.sum(labels[:, 1:] != -100).astype(jnp.float32)
    metrics = {
        "loss": loss,
        "lm_loss": lm_loss,
        "lm_loss_sum": lm_loss * lm_tokens,
        "lm_tokens": lm_tokens,
        "emotion_loss": emo_loss,
        "emotion_correct": jnp.sum((preds == batch["emotion_labels"]) & valid),
        "num_examples": jnp.sum(valid),
    }
    return loss, metrics


def make_train_step(config: ModelConfig, tx: optax.GradientTransformation,
                    mesh=None, opt_shardings=None):
    """Returns jitted step(state, batch, rng) -> (state, metrics).

    ``mesh`` (optional) lets the LM loss run its Pallas kernel per data
    shard via shard_map on multi-device meshes (see gpt2.forward).

    ``opt_shardings`` (optional, ZeRO-1): a sharding pytree matching the
    optimizer state — the constraint pins the UPDATED moments to their
    sharded layout, so XLA computes the elementwise Adam update per
    shard (slicing the psum-reduced grads) instead of replicating the
    new state and resharding on the way out.
    """

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray], rng) -> Tuple[TrainState, dict]:
        step_rng = jax.random.fold_in(rng, state.step)

        def loss_fn(p):
            return _losses_and_metrics(p, config, batch, deterministic=False,
                                       rng=step_rng, mesh=mesh)

        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        if opt_shardings is not None:
            new_opt = jax.lax.with_sharding_constraint(new_opt, opt_shardings)
        new_params = optax.apply_updates(state.params, updates)
        metrics["grad_norm"] = optax.global_norm(grads)
        return TrainState(new_params, new_opt, state.step + 1), metrics

    return train_step


def make_eval_step(config: ModelConfig, mesh=None):
    @jax.jit
    def eval_step(params, batch: Dict[str, jnp.ndarray]) -> dict:
        _, metrics = _losses_and_metrics(params, config, batch,
                                         deterministic=True, rng=None, mesh=mesh)
        return metrics

    return eval_step


def batch_to_device(batch, mesh=None, include_modalities: bool = True) -> Dict[str, jnp.ndarray]:
    """ergm_tpu.data.dataset.Batch -> device dict, batch-sharded over the
    mesh data axis when a mesh is given.

    Multi-process: each host's batch is its LOCAL shard of the global
    batch (grain_loader shards the dataset per host), so the global
    array is assembled with ``jax.make_array_from_process_local_data``
    — a plain device_put would treat every host's differing local batch
    as the same global array and silently drop all but each host's own
    addressable slice."""
    arrays = {
        "input_ids": batch.input_ids,
        "token_type_ids": batch.token_type_ids,
        "labels": batch.labels,
        "emotion_labels": batch.emotion_labels,
        "valid": batch.valid,
        "seq_lengths": batch.attention_mask.sum(axis=-1).astype("int32"),
    }
    if include_modalities:
        arrays["imgs"] = batch.imgs
        arrays["auds"] = batch.auds
    if batch.caption_ids is not None:
        arrays["caption_ids"] = batch.caption_ids
        arrays["caption_mask"] = batch.caption_mask
    if mesh is not None:
        from ergm_tpu.core.mesh import batch_sharding

        sh = batch_sharding(mesh)
        if jax.process_count() > 1:
            return {k: jax.make_array_from_process_local_data(sh, v)
                    for k, v in arrays.items()}
        return {k: jax.device_put(v, sh) for k, v in arrays.items()}
    return {k: jnp.asarray(v) for k, v in arrays.items()}
