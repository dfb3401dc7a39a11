"""Jittable train / eval steps: loss, metrics, and the L2 penalty.

Loss parity (reference ``train.py:102-109`` + SURVEY.md Q6/Q7):
  * sparse categorical cross-entropy — the reference computes it on softmax
    probabilities; here it is the mathematically identical
    ``logits - logsumexp`` form for numerical stability (the softmax itself
    is never materialised in the loss).
  * L2 weight decay enters the *loss* (Keras kernel_regularizer semantics:
    ``wd * sum(w^2)``, not decoupled weight decay), applied to every conv /
    dense kernel except the SE bottleneck's first layer, which the reference
    constructs without a regularizer (``model.py:278-283``).

Metrics parity: top-1 accuracy and top-5 accuracy, as in the reference's
compile metrics (``train.py:105-109``).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import optax


def l2_penalty(params) -> jnp.ndarray:
    """``sum(w^2)`` over regularized kernels (excludes SE fc1, biases, BN)."""
    leaves = jax.tree_util.tree_leaves_with_path(params)
    total = 0.0
    for path, leaf in leaves:
        keys = [getattr(p, "key", "") for p in path]
        if keys[-1] != "kernel":
            continue
        if "se" in keys and "se_fc1" in keys:
            continue
        total = total + jnp.sum(jnp.square(leaf.astype(jnp.float32)))
    return total


def _topk_correct(logits_or_probs, labels, k: int):
    k = min(k, logits_or_probs.shape[-1])   # fewer classes than k => top-all
    top = jax.lax.top_k(logits_or_probs, k)[1]
    return jnp.any(top == labels[:, None], axis=-1)


def make_train_step(model, weight_decay: float):
    """Build the pure training step:  (state, batch, rng) -> (state, metrics).

    ``batch`` is a dict with ``video`` (B, T, S, S, C) and ``label`` (B,).
    ``rng`` is a base PRNG key; the per-step dropout key is derived by
    folding in the step counter, so the step stays a pure function of its
    arguments (safe to pjit and to resume deterministically).
    """

    def loss_fn(params, batch_stats, video, label, dropout_rng):
        logits, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            video,
            train=True,
            return_logits=True,
            rngs={"dropout": dropout_rng},
            mutable=["batch_stats"],
        )
        ce = optax.softmax_cross_entropy_with_integer_labels(
            logits.astype(jnp.float32), label
        ).mean()
        loss = ce + weight_decay * l2_penalty(params)
        return loss, (mutated["batch_stats"], logits)

    def train_step(state, batch, rng):
        dropout_rng = jax.random.fold_in(rng, state.step)
        (loss, (new_stats, logits)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state.batch_stats, batch["video"], batch["label"],
          dropout_rng)
        new_state = state.apply_gradients(grads, new_stats)
        label = batch["label"]
        metrics = {
            "loss": loss,
            "acc": jnp.mean(jnp.argmax(logits, -1) == label),
            "top_5_acc": jnp.mean(_topk_correct(logits, label, 5)),
        }
        return new_state, metrics

    return train_step


def make_eval_step(model):
    """Build the pure eval step: (state, batch) -> metric sums.

    ``batch['video']`` holds ``videos * num_views`` clips; the model's
    eval path averages the per-clip probabilities (reference
    ``model.py:123-127``), so metrics compare per-video predictions against
    per-video labels.  Sums (not means) are returned so the caller can
    aggregate exactly over a dataset whose size isn't divisible by the batch.
    """

    def eval_step(state, batch) -> Dict[str, jnp.ndarray]:
        probs = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["video"],
            train=False,
        )
        label = batch["label"]
        # CE on the ensembled probabilities, like Keras evaluate on the
        # softmax output (clipped for log stability the way Keras does).
        p_true = jnp.take_along_axis(probs, label[:, None], axis=-1)[:, 0]
        ce = -jnp.log(jnp.clip(p_true, 1e-7, 1.0))
        return {
            "count": jnp.asarray(label.shape[0], jnp.float32),
            "loss_sum": jnp.sum(ce),
            "acc_sum": jnp.sum(jnp.argmax(probs, -1) == label),
            "top_5_sum": jnp.sum(_topk_correct(probs, label, 5)),
        }

    return eval_step
