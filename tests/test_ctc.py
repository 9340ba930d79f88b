"""CTC loss golden tests vs torch.nn.functional.ctc_loss and optax, plus
greedy-decode correctness vs a pure-python reference."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax
import torch
import torch.nn.functional as F

from tensorflowasr_tpu.ops import ctc as ctc_ops


def _random_case(rng, b=4, t=50, v=20, lmax=12, blank_last=True):
    logits = rng.standard_normal((b, t, v)).astype(np.float32)
    logit_len = rng.integers(lmax * 2 + 2, t + 1, size=b).astype(np.int32)
    label_len = rng.integers(1, lmax + 1, size=b).astype(np.int32)
    blank = v - 1 if blank_last else 0
    lo = 1 if not blank_last else 0
    hi = v - 1 if blank_last else v
    labels = rng.integers(lo, hi, size=(b, lmax)).astype(np.int32)
    for i in range(b):
        labels[i, label_len[i]:] = 0
    return logits, logit_len, labels, label_len, blank


@pytest.mark.parametrize("blank_last", [True, False])
def test_ctc_loss_matches_torch(rng, blank_last):
    logits, logit_len, labels, label_len, blank = _random_case(
        rng, blank_last=blank_last)
    got = np.asarray(ctc_ops.ctc_loss(
        jnp.asarray(logits), jnp.asarray(logit_len), jnp.asarray(labels),
        jnp.asarray(label_len), blank_id=blank))

    lp = torch.log_softmax(torch.from_numpy(logits), dim=-1).transpose(0, 1)
    want = F.ctc_loss(
        lp, torch.from_numpy(labels.astype(np.int64)),
        torch.from_numpy(logit_len.astype(np.int64)),
        torch.from_numpy(label_len.astype(np.int64)),
        blank=blank, reduction="none", zero_infinity=False).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_ctc_loss_matches_optax(rng):
    b, t, v, lmax = 3, 40, 15, 10
    logits, logit_len, labels, label_len, _ = _random_case(
        rng, b=b, t=t, v=v, lmax=lmax, blank_last=False)
    got = np.asarray(ctc_ops.ctc_loss(
        jnp.asarray(logits), jnp.asarray(logit_len), jnp.asarray(labels),
        jnp.asarray(label_len), blank_id=0))

    tpos = np.arange(t)[None, :]
    logit_pad = (tpos >= logit_len[:, None]).astype(np.float32)
    lpos = np.arange(lmax)[None, :]
    label_pad = (lpos >= label_len[:, None]).astype(np.float32)
    want = np.asarray(optax.ctc_loss(
        jnp.asarray(logits), jnp.asarray(logit_pad), jnp.asarray(labels),
        jnp.asarray(label_pad), blank_id=0))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_ctc_loss_gradients_match_torch(rng):
    logits, logit_len, labels, label_len, blank = _random_case(
        rng, b=2, t=30, v=10, lmax=6)

    def loss_fn(lg):
        return ctc_ops.ctc_loss(
            lg, jnp.asarray(logit_len), jnp.asarray(labels),
            jnp.asarray(label_len), blank_id=blank).sum()

    got = np.asarray(jax.grad(loss_fn)(jnp.asarray(logits)))

    tl = torch.from_numpy(logits).requires_grad_(True)
    lp = torch.log_softmax(tl, dim=-1).transpose(0, 1)
    loss = F.ctc_loss(
        lp, torch.from_numpy(labels.astype(np.int64)),
        torch.from_numpy(logit_len.astype(np.int64)),
        torch.from_numpy(label_len.astype(np.int64)),
        blank=blank, reduction="sum", zero_infinity=False)
    loss.backward()
    np.testing.assert_allclose(got, tl.grad.numpy(), rtol=1e-3, atol=1e-4)


def test_ctc_loss_ignores_padding_frames(rng):
    """Loss must not depend on logits past logit_lengths."""
    logits, logit_len, labels, label_len, blank = _random_case(rng)
    l1 = np.asarray(ctc_ops.ctc_loss(
        jnp.asarray(logits), jnp.asarray(logit_len), jnp.asarray(labels),
        jnp.asarray(label_len), blank_id=blank))
    logits2 = logits.copy()
    for i in range(len(logit_len)):
        logits2[i, logit_len[i]:] = 99.0
    l2 = np.asarray(ctc_ops.ctc_loss(
        jnp.asarray(logits2), jnp.asarray(logit_len), jnp.asarray(labels),
        jnp.asarray(label_len), blank_id=blank))
    np.testing.assert_allclose(l1, l2, rtol=1e-5)


def _py_greedy(ids, length, blank):
    out, prev = [], None
    for x in ids[:length]:
        if x != prev and x != blank:
            out.append(int(x))
        prev = x
    return out


def test_greedy_decode_matches_python(rng):
    b, t, v = 8, 60, 12
    blank = v - 1
    logits = rng.standard_normal((b, t, v)).astype(np.float32)
    lengths = rng.integers(5, t + 1, size=b).astype(np.int32)
    dec, dec_len = ctc_ops.ctc_greedy_decode(
        jnp.asarray(logits), jnp.asarray(lengths), blank_id=blank)
    dec, dec_len = np.asarray(dec), np.asarray(dec_len)
    ids = logits.argmax(-1)
    for i in range(b):
        want = _py_greedy(ids[i], lengths[i], blank)
        assert dec_len[i] == len(want)
        assert dec[i, :dec_len[i]].tolist() == want
        assert (dec[i, dec_len[i]:] == 0).all()


def test_collapse_repeated_known_case():
    # classic: [a a blank a b b] -> [a a b]
    ids = jnp.asarray([[1, 1, 4, 1, 2, 2]])
    lengths = jnp.asarray([6])
    out, n = ctc_ops.collapse_and_remove_blank(ids, lengths, blank_id=4)
    assert np.asarray(n)[0] == 3
    assert np.asarray(out)[0, :3].tolist() == [1, 1, 2]


def test_merge_repeated():
    ids = jnp.asarray([[3, 3, 1, 1, 1, 2]])
    out, n = ctc_ops.merge_repeated(ids, jnp.asarray([6]))
    assert np.asarray(n)[0] == 3
    assert np.asarray(out)[0, :3].tolist() == [3, 1, 2]
