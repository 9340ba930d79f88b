"""Data-parallel VAD training.

Re-designs the reference VADTrainer (vad/trainer/vad_trainer.py:10-166 in
Z-yq/TensorflowASR) as a jitted step:

  loss = (one_loss + zero_loss) * 10 + multi_res_stft(wav_target, masked)

where one/zero are the class-balanced BCE means over voiced/unvoiced frames
(:42-48) and the STFT term trains the masked-waveform denoising head
(:56-57). The streaming variant of the reference randomly reshapes batches
to ``streaming_min_frame`` windows (:118-145) — here that is a pure
host-side batch transform (``streaming_reshape``) since shapes must stay
static per compiled step.

Batch: x [B, N, F] framed wav, labels [B, N, 1] {0,1}, wav_target [B, N, F].
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tensorflowasr_tpu.ops.stft_loss import multi_resolution_stft_loss
from tensorflowasr_tpu.train.state import ASRTrainState


def vad_mask_loss(labels: jnp.ndarray, logits: jnp.ndarray
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Class-balanced BCE: (mean over voiced frames, mean over silent
    frames) — vad_trainer.mask_loss (:42-48)."""
    ce = optax.sigmoid_binary_cross_entropy(
        logits.squeeze(-1).astype(jnp.float32), labels.squeeze(-1))
    one = labels.squeeze(-1)
    zero = 1.0 - one
    one_loss = jnp.sum(ce * one) / (jnp.sum(one) + 1e-6)
    zero_loss = jnp.sum(ce * zero) / (jnp.sum(zero) + 1e-6)
    return one_loss, zero_loss


def vad_accuracy(labels: jnp.ndarray, logits: jnp.ndarray) -> jnp.ndarray:
    pred = (logits.squeeze(-1) >= 0.0).astype(jnp.float32)
    return jnp.mean((pred == labels.squeeze(-1)).astype(jnp.float32))


def streaming_reshape(batch: dict, min_frames: int,
                      rng: np.random.Generator) -> dict:
    """Host-side streaming augmentation (vad_trainer.py:118-145): randomly
    fold the time axis into the batch axis in windows of ``k`` frames."""
    n = batch["x"].shape[1]
    choices = [k for k in range(min_frames, n + 1) if n % k == 0]
    k = int(rng.choice(choices)) if choices else n
    def fold(a):
        b = a.shape[0]
        return a.reshape(b * (n // k), k, *a.shape[2:])
    return {name: fold(a) for name, a in batch.items()}


def make_vad_train_step(model, donate: bool = True,
                        global_batch: int | None = None) -> Callable:
    if global_batch is None:
        import warnings

        warnings.warn(
            "make_vad_train_step: global_batch not given — falling back "
            "to the per-step array shape, which JITTERS the effective lr "
            "under streaming_reshape's random fold. Pass the configured "
            "running_config batch_size.", stacklevel=2)

    def loss_fn(params, batch):
        logits, masked = model.apply({"params": params}, batch["x"],
                                     training=True)
        one, zero = vad_mask_loss(batch["labels"], logits)
        stft = multi_resolution_stft_loss(batch["wav_target"], masked)
        # the reference runs its (already batch-averaged) scalar through
        # compute_average_loss, i.e. divides by the CONFIGURED global
        # batch size (vad_trainer.py:57-58, base_trainer.py:79) — match
        # it: at the same lr the 4-8x larger gradients otherwise blow up
        # on hard corpora (observed NaN within 100 steps on the round-4
        # multi-speaker corpus). ``global_batch`` must be the CONSTANT
        # running_config batch_size, NOT the per-step array shape: the
        # streaming_reshape fold multiplies shape[0] by a random factor
        # every step, which would make the effective lr jitter.
        divisor = global_batch or batch["x"].shape[0]
        total = ((one + zero) * 10.0 + stft) / divisor
        metrics = {
            "vad_loss": (one + zero),
            "wav_loss": stft,
            "train_loss": total,
            "vad_acc": vad_accuracy(batch["labels"], logits),
        }
        return total, metrics

    def step(state: ASRTrainState, batch, rng=None):
        # rng accepted for TrainerBase.fit compatibility (unused: the VAD
        # models have no dropout)
        (_, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, batch)
        return state.apply_gradients(grads=grads), metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_vad_eval_step(model) -> Callable:
    def step(state: ASRTrainState, batch):
        logits, masked = model.apply({"params": state.params}, batch["x"],
                                     training=False)
        one, zero = vad_mask_loss(batch["labels"], logits)
        stft = multi_resolution_stft_loss(batch["wav_target"], masked)
        pred = (logits.squeeze(-1) >= 0.0).astype(jnp.float32)
        lab = batch["labels"].squeeze(-1)
        tp = jnp.sum(pred * lab)
        f1 = 2 * tp / (jnp.sum(pred) + jnp.sum(lab) + 1e-6)
        return {
            "vad_loss": one + zero,
            "wav_loss": stft,
            "vad_acc": vad_accuracy(batch["labels"], logits),
            "f1": f1,
        }

    return jax.jit(step)
