"""RNN-T (transducer) loss — JAX forward-backward over antidiagonals.

TPU-native replacement for the reference's native warp-transducer
(externals/warp-transducer.zip: cpu_rnnt.h / gpu_rnnt_kernel.h CUDA kernels,
wrapped by asr/losses/rnnt_losses.py:131-270 in Z-yq/TensorflowASR — a
legacy path there, provided here for completeness/parity).

The alpha recursion over the (T, U+1) lattice is evaluated one antidiagonal
at a time with ``lax.scan`` (T+U steps of vectorized work — the same
wavefront schedule the reference's ``tf.scan`` helper and the CUDA kernels
use), entirely in log space, masked for padded time/label lengths.
Gradients flow through the scan (XLA differentiates it into a reverse
scan, which is exactly the beta recursion up to common-subexpression
sharing), so no hand-written custom_vjp is needed for correctness; the
loss is O((T+U) * B * min(T, U+1)) wavefront work.

API mirrors warp-rnnt: ``rnnt_loss(logits [B,T,U+1,V], labels [B,U],
logit_lengths [B], label_lengths [B], blank)``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

NEG_INF = -1.0e30


def _logaddexp(a, b):
    m = jnp.maximum(a, b)
    out = m + jnp.log(jnp.exp(a - m) + jnp.exp(b - m))
    return jnp.where(m <= NEG_INF / 2, NEG_INF, out)


@functools.partial(jax.jit, static_argnames=("blank",))
def rnnt_loss(logits: jnp.ndarray,
              labels: jnp.ndarray,
              logit_lengths: jnp.ndarray,
              label_lengths: jnp.ndarray,
              blank: int = 0) -> jnp.ndarray:
    """Per-example negative log likelihood of the transducer lattice.

    Args:
      logits: [B, T, U+1, V] joint-network outputs (unnormalized).
      labels: [B, U] int labels (padded past label_lengths).
      logit_lengths: [B] valid acoustic frames.
      label_lengths: [B] valid labels.
      blank: blank index.

    Returns: [B] loss.
    """
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    b, t, u1, _ = logp.shape
    u = u1 - 1

    # transition log-probs
    lp_blank = logp[..., blank]                          # [B, T, U+1]
    lab = labels.astype(jnp.int32)
    lp_emit = jnp.take_along_axis(
        logp[:, :, :u, :], lab[:, None, :, None], axis=-1)[..., 0]
    # pad emit at u = U (no label to emit)
    lp_emit = jnp.pad(lp_emit, ((0, 0), (0, 0), (0, 1)),
                      constant_values=NEG_INF)           # [B, T, U+1]

    # alpha over antidiagonals: alpha[t, u] with t+u = k on diagonal k,
    # represent diagonal as a vector indexed by u in [0, U].

    t_idx_all = jnp.arange(u1)

    def step(alpha, k):
        # alpha: diagonal k values indexed by u (t = k - u)
        u_idx = t_idx_all                                 # [U+1]
        t_idx = k - u_idx
        valid_cell = (t_idx >= 0) & (t_idx < t) & \
            (u_idx[None, :] <= label_lengths[:, None]) & \
            (t_idx[None, :] < logit_lengths[:, None] + 0) & True
        # from (t-1, u): blank at (t-1, u) — same u, diagonal k-1
        tm1 = jnp.clip(t_idx - 1, 0, t - 1)
        lp_b = lp_blank[:, tm1, u_idx]                    # [B, U+1]
        from_blank = jnp.where((t_idx >= 1)[None, :],
                               alpha + lp_b, NEG_INF)
        # from (t, u-1): emit label u-1 at (t, u-1) — diagonal k-1 shifted
        tcl = jnp.clip(t_idx, 0, t - 1)
        um1 = jnp.clip(u_idx - 1, 0, u1 - 1)
        lp_e = lp_emit[:, tcl, um1]                       # [B, U+1]
        alpha_shift = jnp.concatenate(
            [jnp.full((b, 1), NEG_INF), alpha[:, :-1]], axis=1)
        from_emit = jnp.where((u_idx >= 1)[None, :],
                              alpha_shift + lp_e, NEG_INF)
        new = _logaddexp(from_blank, from_emit)
        new = jnp.where((t_idx == 0)[None, :] & (u_idx == 0)[None, :]
                        & (k == 0), 0.0, new)
        new = jnp.where(valid_cell, new, NEG_INF)
        return new, None

    ks = jnp.arange(1, t + u1)

    # The terminal cell (T_b - 1, U_b) sits on a per-example diagonal
    # (padding); collect alpha there + the final blank as each diagonal
    # is produced.
    def step_collect(carry, k):
        alpha, best = carry
        new, _ = step(alpha, k)
        # terminal diagonal for example b is (logit_len - 1 + label_len)
        term_k = logit_lengths + label_lengths - 1
        term_val = jnp.take_along_axis(
            new, label_lengths[:, None], axis=1)[:, 0]
        lp_b_last = lp_blank[
            jnp.arange(b),
            jnp.clip(logit_lengths - 1, 0, t - 1),
            label_lengths]
        cand = term_val + lp_b_last
        best = jnp.where(k == term_k, cand, best)
        return (new, best), None

    init = (jnp.full((b, u1), NEG_INF).at[:, 0].set(0.0),
            jnp.full((b,), NEG_INF))
    (_, best), _ = jax.lax.scan(step_collect, init, ks)
    # degenerate case: logit_len-1+label_len == 0 -> diagonal 0, handle
    zero_case = (logit_lengths + label_lengths - 1) == 0
    ll0 = lp_blank[:, 0, 0]
    best = jnp.where(zero_case, ll0, best)
    return -best
