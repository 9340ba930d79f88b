"""CTC loss and greedy decoding — JAX-native, static shapes, XLA-friendly.

Replaces the reference's ``tf.keras.backend.ctc_batch_cost`` /
``ctc_decode`` (asr/trainer/ctc_runners.py:91-97) and the C++
``ctc_greedy_decoder`` (Inference/CppInference/onnx/src/core/
ctc_greedy_decoder.h:5-44, externals/ctc_decoders.zip) with:

- :func:`ctc_loss` — forward algorithm (alpha recursion) in log space via
  ``lax.scan`` over time; fully batched and masked, differentiable through
  the scan (XLA turns the backward pass into another scan).
- :func:`ctc_greedy_decode` — vectorized argmax -> collapse-repeats ->
  drop-blank with a stable-sort compaction instead of the reference's
  dynamic-shape ``tf.while_loop``.

Blank can be any index (the shipped configs use blank == num_classes-1,
i.e. ``blank_at_zero: False``).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1.0e30


def _interleave_blanks(labels: jnp.ndarray, blank_id: int) -> jnp.ndarray:
    """[B, L] -> [B, 2L+1] with blanks at even positions."""
    b, l = labels.shape
    ext = jnp.full((b, 2 * l + 1), blank_id, dtype=labels.dtype)
    return ext.at[:, 1::2].set(labels)


@functools.partial(jax.jit, static_argnames=("blank_id", "logits_time_major",
                                              "zero_infinity", "prob_floor"))
def ctc_loss(logits: jnp.ndarray,
             logit_lengths: jnp.ndarray,
             labels: jnp.ndarray,
             label_lengths: jnp.ndarray,
             blank_id: int,
             logits_time_major: bool = False,
             zero_infinity: bool = True,
             prob_floor: float = 0.0) -> jnp.ndarray:
    """Per-example negative log likelihood, shape [B].

    Args:
      logits: [B, T, V] unnormalized scores (NOT probabilities — unlike
        keras ctc_batch_cost we take logits and normalize internally).
      logit_lengths: [B] valid frames per example.
      labels: [B, L] int labels, padded arbitrarily past label_lengths.
      label_lengths: [B] valid labels per example.
      blank_id: index of the CTC blank.
      zero_infinity: zero the loss of infeasible examples (logit length too
        short for the label) instead of returning ~1e30 — keeps training
        stable when an upstream length regulator under-picks frames.
      prob_floor: floor per-frame probabilities at this value before the
        log, i.e. logp = log(softmax(x) + prob_floor). The reference's
        keras ctc_batch_cost computes log(y_pred + keras epsilon) with
        epsilon = 1e-7 (tf.keras.backend.ctc_label_dense_to_sparse path),
        capping any frame's -logp at ~16.1 and thereby softening
        gradients on confidently-wrong frames; pass 1e-7 for exact
        reference training-dynamics parity, 0 for the clean CTC.
    """
    if logits_time_major:
        logits = jnp.transpose(logits, (1, 0, 2))
    logprobs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    if prob_floor:
        # log(p + floor) without materializing probabilities
        logprobs = jnp.logaddexp(logprobs, jnp.log(prob_floor))
    b, t, _ = logprobs.shape
    l = labels.shape[1]
    s = 2 * l + 1

    ext = _interleave_blanks(labels.astype(jnp.int32), blank_id)  # [B, S]
    # skip transition s-2 -> s allowed when ext[s] is a real label differing
    # from ext[s-2]
    ext_shift2 = jnp.concatenate(
        [jnp.full((b, 2), -1, ext.dtype), ext[:, :-2]], axis=1)
    allow_skip = (ext != blank_id) & (ext != ext_shift2)          # [B, S]

    pos = jnp.arange(s)[None, :]                                   # [1, S]

    # label-indexed logprobs for ALL frames in one vectorized gather
    # (hoisted out of the scan — T in-loop gathers made the loop
    # iteration-overhead-bound on TPU: 36 ms fwd at B=128, T=200)
    lp_ext_all = jnp.take_along_axis(
        logprobs, ext[:, None, :], axis=2)                         # [B, T, S]

    # alpha init at t=0: only states 0 (blank) and 1 (first label) are live
    lp0 = lp_ext_all[:, 0, :]                                      # [B, S]
    alpha0 = jnp.where(pos < 2, lp0, NEG_INF)
    alpha0 = jnp.where((pos == 1) & (label_lengths[:, None] == 0),
                       NEG_INF, alpha0)

    def shift_right(x, n):
        return jnp.concatenate(
            [jnp.full((b, n), NEG_INF, x.dtype), x[:, :-n]], axis=1)

    def step(alpha, inputs):
        lp_ext, t_idx = inputs                                     # [B, S]
        stay = alpha
        prev = shift_right(alpha, 1)
        skip = jnp.where(allow_skip, shift_right(alpha, 2), NEG_INF)
        m = jnp.maximum(jnp.maximum(stay, prev), skip)
        new = m + jnp.log(jnp.exp(stay - m) + jnp.exp(prev - m)
                          + jnp.exp(skip - m))
        new = jnp.where(m <= NEG_INF / 2, NEG_INF, new) + lp_ext
        # frames past the example's length carry alpha through unchanged
        live = (t_idx < logit_lengths)[:, None]
        new = jnp.where(live, new, alpha)
        return new, None

    # unroll the scan body — the per-step tensors are tiny ([B, S]), so
    # the un-unrolled loop is iteration-overhead-bound on TPU
    lp_ext_tm = jnp.transpose(lp_ext_all, (1, 0, 2))               # [T, B, S]
    unroll = max(1, min(16, (t - 1)))
    alpha_t, _ = jax.lax.scan(step, alpha0,
                              (lp_ext_tm[1:], jnp.arange(1, t)),
                              unroll=unroll)

    # final: logsumexp of states 2*label_len and 2*label_len - 1
    end = 2 * label_lengths.astype(jnp.int32)                      # [B]
    a_end = jnp.take_along_axis(alpha_t, end[:, None], axis=1)[:, 0]
    a_end1 = jnp.take_along_axis(
        alpha_t, jnp.maximum(end - 1, 0)[:, None], axis=1)[:, 0]
    a_end1 = jnp.where(label_lengths > 0, a_end1, NEG_INF)
    m = jnp.maximum(a_end, a_end1)
    ll = m + jnp.log(jnp.exp(a_end - m) + jnp.exp(a_end1 - m))
    loss = -ll
    if zero_infinity:
        loss = jnp.where(ll <= NEG_INF / 2,
                         jax.lax.stop_gradient(loss) * 0.0, loss)
    return loss


def compact_kept(ids: jnp.ndarray, keep: jnp.ndarray, pad_id: int = 0
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Left-justify the ``keep``-masked entries of each row (stable
    argsort compaction — static shapes, fully on-device).
    Returns (compacted [B, T] padded with ``pad_id``, counts [B])."""
    order = jnp.argsort(~keep, axis=1, stable=True)               # kept first
    gathered = jnp.take_along_axis(ids, order, axis=1)
    kept_sorted = jnp.take_along_axis(keep, order, axis=1)
    out = jnp.where(kept_sorted, gathered, pad_id)
    return out, keep.sum(axis=1).astype(jnp.int32)


def collapse_and_remove_blank(ids: jnp.ndarray,
                              lengths: jnp.ndarray,
                              blank_id: int,
                              pad_id: int = 0
                              ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Collapse repeats then drop blanks, left-justified with static shape.

    ids: [B, T] frame-wise ids; lengths: [B] valid frames.
    Returns (decoded [B, T] padded with ``pad_id``, decoded_lengths [B]).

    Vectorized replacement for the reference's ``tf.keras.backend.ctc_decode``
    greedy path (asr/trainer/ctc_runners.py:97).
    """
    b, t = ids.shape
    tpos = jnp.arange(t)[None, :]
    valid = tpos < lengths[:, None]
    prev = jnp.concatenate(
        [jnp.full((b, 1), -1, ids.dtype), ids[:, :-1]], axis=1)
    keep = valid & (ids != blank_id) & (ids != prev)
    return compact_kept(ids, keep, pad_id)


@functools.partial(jax.jit, static_argnames=("blank_id", "pad_id"))
def ctc_greedy_decode(logits: jnp.ndarray,
                      lengths: jnp.ndarray,
                      blank_id: int,
                      pad_id: int = 0) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy CTC decode: argmax -> collapse -> drop blank.

    logits: [B, T, V] (softmax is monotonic so raw logits are fine).
    Returns (ids [B, T] padded, lengths [B]).
    """
    ids = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    return collapse_and_remove_blank(ids, lengths, blank_id, pad_id)


def merge_repeated(ids: jnp.ndarray, lengths: jnp.ndarray,
                   pad_id: int = 0) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Collapse adjacent repeats only (no blank removal) —
    parity with utils/tools.py merge_repeated."""
    b, t = ids.shape
    tpos = jnp.arange(t)[None, :]
    valid = tpos < lengths[:, None]
    prev = jnp.concatenate(
        [jnp.full((b, 1), -1, ids.dtype), ids[:, :-1]], axis=1)
    keep = valid & (ids != prev)
    return compact_kept(ids, keep, pad_id)
