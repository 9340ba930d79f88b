"""Punctuation-recovery training: class-balanced CE + BERT distillation.

Re-designs the reference PuncTrainer (punc_recover/trainer/punc_trainer.py
in Z-yq/TensorflowASR):

  loss = classes_loss(labels, logits) + 10 * bert_feature_loss(feat, pred)

- classes_loss (:104-115): masked CE averaged over non-pad positions PLUS
  the same CE averaged over non-pad, non-"no-punc" (label != 1) positions —
  the second term re-weights the rare real-punctuation labels.
- bert_feature_loss (:93-102): per-position MSE against precomputed
  keras-bert teacher features, masked where the teacher emits -10 pads.

Batch: ids [B, T] i32, punc_labels [B, T] i32 (0 pad, 1 no-punc, >=2 punc
classes), bert_features [B, T, 768] f32 (-10.0 at pad positions).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax

from tensorflowasr_tpu.models.punc import PuncTransformer
from tensorflowasr_tpu.train.state import ASRTrainState


def classes_loss(labels: jnp.ndarray, logits: jnp.ndarray) -> jnp.ndarray:
    ce = optax.softmax_cross_entropy_with_integer_labels(
        logits.astype(jnp.float32), labels)
    mask = (labels != 0).astype(jnp.float32)
    mask_one = mask * (labels != 1).astype(jnp.float32)
    per_ex = jnp.sum(ce * mask, -1) / (jnp.sum(mask, -1) + 1e-6)
    per_ex_punc = jnp.sum(ce * mask_one, -1) / (jnp.sum(mask_one, -1) + 1e-6)
    return per_ex + per_ex_punc


def bert_feature_loss(teacher: jnp.ndarray, pred: jnp.ndarray) -> jnp.ndarray:
    t = min(teacher.shape[1], pred.shape[1])
    teacher, pred = teacher[:, :t], pred[:, :t]
    mask = (teacher != -10.0).astype(jnp.float32)
    sq = jnp.square(teacher - pred) * mask
    per_pos = jnp.sum(sq, -1) / (jnp.sum(mask, -1) + 1e-6)
    return jnp.mean(per_pos, -1)


def classes_acc(labels: jnp.ndarray, logits: jnp.ndarray) -> jnp.ndarray:
    pred = jnp.argmax(logits, -1).astype(labels.dtype)
    mask = (labels != 0).astype(jnp.float32)
    return jnp.sum((pred == labels) * mask) / (jnp.sum(mask) + 1e-6)


def make_punc_train_step(model: PuncTransformer, distill_weight: float = 10.0,
                         donate: bool = True) -> Callable:
    def loss_fn(params, batch, rng):
        logits, bert_out = model.apply(
            {"params": params}, batch["ids"], training=True,
            rngs={"dropout": rng})
        bd = classes_loss(batch["punc_labels"], logits)
        if "bert_features" in batch:
            fm = bert_feature_loss(batch["bert_features"], bert_out)
        else:
            fm = jnp.zeros_like(bd)
        total = jnp.mean(bd + distill_weight * fm)
        metrics = {
            "bd_loss": jnp.mean(bd),
            "feature_map_loss": jnp.mean(fm),
            "train_loss": total,
            "bd_acc": classes_acc(batch["punc_labels"], logits),
        }
        return total, metrics

    def step(state: ASRTrainState, batch, rng):
        drop_rng = jax.random.fold_in(rng, state.step)
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, drop_rng)
        return state.apply_gradients(grads=grads), metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_punc_eval_step(model: PuncTransformer) -> Callable:
    def step(state: ASRTrainState, batch):
        logits, bert_out = model.apply({"params": state.params},
                                       batch["ids"], training=False)
        out = {
            "bd_loss": jnp.mean(classes_loss(batch["punc_labels"], logits)),
            "bd_acc": classes_acc(batch["punc_labels"], logits),
        }
        if "bert_features" in batch:
            out["feature_map_loss"] = jnp.mean(
                bert_feature_loss(batch["bert_features"], bert_out))
        return out

    return jax.jit(step)


def punc_recover_ids(logits: jnp.ndarray, threshold: float = 0.65
                     ) -> jnp.ndarray:
    """Per-position punctuation decision (PythonInference punc_recover.py:
    46-62): class argmax where argmax >= 2 and softmax prob >= threshold,
    else 0 (no insertion)."""
    probs = jax.nn.softmax(logits.astype(jnp.float32), -1)
    best = jnp.argmax(probs, -1)
    p = jnp.max(probs, -1)
    return jnp.where((best >= 2) & (p >= threshold), best, 0).astype(
        jnp.int32)
