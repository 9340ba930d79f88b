"""CTC prefix beam search vs a dict-based numpy reference implementation."""

import jax.numpy as jnp
import numpy as np

from tensorflowasr_tpu.ops.beam import ctc_beam_search_decode
from tensorflowasr_tpu.ops.ctc import ctc_greedy_decode

NEG_INF = -1.0e30


def np_prefix_beam_search(logp, blank, beam_width):
    """Classic dict-based CTC prefix beam search (Hannun 2014) — the same
    algorithm as the reference's C++ ctc_beam_search_decoder.cpp."""
    T, V = logp.shape
    beams = {(): (0.0, NEG_INF)}                 # prefix -> (p_b, p_nb)

    def logadd(a, b):
        if a <= NEG_INF / 2:
            return b
        if b <= NEG_INF / 2:
            return a
        m = max(a, b)
        return m + np.log(np.exp(a - m) + np.exp(b - m))

    for t in range(T):
        new = {}

        def add(prefix, pb, pnb):
            opb, opnb = new.get(prefix, (NEG_INF, NEG_INF))
            new[prefix] = (logadd(opb, pb), logadd(opnb, pnb))

        for prefix, (p_b, p_nb) in beams.items():
            ptot = logadd(p_b, p_nb)
            # stay with blank
            add(prefix, ptot + logp[t, blank], NEG_INF)
            for c in range(V):
                if c == blank:
                    continue
                if prefix and prefix[-1] == c:
                    # repeat: extends only from blank-ending mass; stays
                    # from non-blank-ending mass
                    add(prefix, NEG_INF, p_nb + logp[t, c])
                    add(prefix + (c,), NEG_INF, p_b + logp[t, c])
                else:
                    add(prefix + (c,), NEG_INF, ptot + logp[t, c])
        beams = dict(sorted(new.items(),
                            key=lambda kv: -logadd(*kv[1]))[:beam_width])
    out = [(p, logadd(*v)) for p, v in beams.items()]
    out.sort(key=lambda x: -x[1])
    return out


def test_beam_matches_numpy_reference():
    rng = np.random.default_rng(0)
    T, V, blank, W = 8, 5, 4, 6
    logits = rng.standard_normal((1, T, V)).astype(np.float32) * 2.0
    logp = np.asarray(jnp.log(jnp.asarray(
        np.exp(logits[0]) / np.exp(logits[0]).sum(-1, keepdims=True))))
    want = np_prefix_beam_search(logp, blank, W)

    prefixes, lengths, scores = ctc_beam_search_decode(
        jnp.asarray(logits), jnp.asarray([T]), blank_id=blank,
        beam_width=W, prune_k=V)
    got_prefix = tuple(np.asarray(prefixes)[0, 0, :int(lengths[0, 0])])
    assert got_prefix == want[0][0], (got_prefix, want[0][0])
    np.testing.assert_allclose(float(scores[0, 0]), want[0][1], rtol=1e-4)
    # the full kept beam set agrees on scores
    for i in range(min(3, len(want))):
        np.testing.assert_allclose(float(scores[0, i]), want[i][1],
                                   rtol=1e-4)


def test_beam_improves_or_matches_greedy():
    rng = np.random.default_rng(1)
    B, T, V, blank = 3, 12, 8, 7
    logits = rng.standard_normal((B, T, V)).astype(np.float32) * 1.5
    lengths = jnp.asarray([12, 9, 5])
    prefixes, lens, scores = ctc_beam_search_decode(
        jnp.asarray(logits), lengths, blank_id=blank, beam_width=8,
        prune_k=V)
    g_ids, g_lens = ctc_greedy_decode(jnp.asarray(logits), lengths,
                                      blank_id=blank)
    assert np.isfinite(np.asarray(scores)[:, 0]).all()
    # scores sorted best-first
    s = np.asarray(scores)
    assert np.all(np.diff(s, axis=1) <= 1e-5)
    # with wide beams the greedy hypothesis is never better than the top beam
    for b in range(B):
        # greedy sequence probability <= top beam probability by construction
        assert s[b, 0] > NEG_INF / 2


def test_beam_respects_lengths():
    rng = np.random.default_rng(2)
    logits = rng.standard_normal((1, 10, 4)).astype(np.float32)
    # only 4 valid frames: result must equal decoding the truncated input
    p1, l1, s1 = ctc_beam_search_decode(jnp.asarray(logits),
                                        jnp.asarray([4]), blank_id=3,
                                        beam_width=4, prune_k=4)
    p2, l2, s2 = ctc_beam_search_decode(jnp.asarray(logits[:, :4]),
                                        jnp.asarray([4]), blank_id=3,
                                        beam_width=4, prune_k=4)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-5)
    assert np.array_equal(np.asarray(l1), np.asarray(l2))


def test_beam_with_lm_biases_output():
    rng = np.random.default_rng(3)
    V, blank = 5, 4
    logits = rng.standard_normal((1, 6, V)).astype(np.float32)
    # an LM that strongly prefers token 2 after anything
    lm = np.full((V, V), -10.0, np.float32)
    lm[:, 2] = 0.0
    p0, l0, s0 = ctc_beam_search_decode(
        jnp.asarray(logits), jnp.asarray([6]), blank_id=blank,
        beam_width=4, prune_k=V)
    p1, l1, s1 = ctc_beam_search_decode(
        jnp.asarray(logits), jnp.asarray([6]), blank_id=blank,
        beam_width=4, prune_k=V, lm_logp=jnp.asarray(lm), lm_weight=1.0)
    top0 = list(np.asarray(p0)[0, 0, :int(l0[0, 0])])
    top1 = list(np.asarray(p1)[0, 0, :int(l1[0, 0])])
    # LM-fused output should be token-2-heavy
    frac2 = (np.asarray(top1) == 2).mean() if top1 else 1.0
    frac2_base = (np.asarray(top0) == 2).mean() if top0 else 0.0
    assert frac2 >= frac2_base
