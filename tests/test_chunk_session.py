"""ChunkStreamSession: streaming serving vs offline predict parity, plus
the bigram LM utility."""

import jax
import jax.numpy as jnp
import numpy as np

from tests.test_chunk import N_CHAR, N_PHONE, tiny_cfg
from tensorflowasr_tpu.models.chunk_conformer import (
    ChunkConformer,
    feature_pick,
)
from tensorflowasr_tpu.serve.chunk_session import ChunkStreamSession


def test_chunk_stream_session_matches_offline():
    cfg = tiny_cfg()
    model = ChunkConformer(cfg, N_PHONE, N_CHAR)
    rng = np.random.default_rng(0)
    n_chunks = 6
    wav = rng.standard_normal(
        (cfg.chunk_samples * n_chunks,)).astype(np.float32) * 0.1
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(wav[None]),
                           jnp.ones((1, 4), jnp.int32), 8, False,
                           method=ChunkConformer.train_forward)

    session = ChunkStreamSession(model, variables)
    # feed in odd-sized packets to exercise the remainder buffer
    pkt = 1000
    for i in range(0, len(wav), pkt):
        session.feed(wav[i:i + pkt])
    out = session.flush()

    # offline reference: phone argmax over the full utterance
    phone_logits, hidden = model.apply(
        variables, jnp.asarray(wav[None]), False,
        method=ChunkConformer.encode_to_phones)
    off_ids = np.argmax(np.asarray(phone_logits)[0], -1)
    blank = N_PHONE - 1
    off_collapsed = []
    prev = -1
    for i in off_ids:
        if i != prev and i != blank:
            off_collapsed.append(int(i))
        prev = i
    assert out["phone_ids"] == off_collapsed

    # char path: the session's FINAL char rows must match the offline
    # decoder run over the same picked frames
    picked_f, _, counts = feature_pick(hidden, phone_logits, blank, n_chunks * cfg.sub_length)
    n_picked = int(np.asarray(counts)[0])
    if n_picked >= 1:
        def helper_decoder(model, picked):
            h = model.helper(picked, False)
            return model.decoder(h, False)[0]

        off_char = np.asarray(model.apply(
            variables, picked_f, method=helper_decoder))[0][:n_picked]
        off_ids_char = np.argmax(off_char, -1)
        n_final = len(session._char_ids)
        wb = cfg.decoder.win_back
        assert n_final == max(0, n_picked - wb)
        # with decoder_step=1 streaming final ids equal offline EXACTLY
        assert session._char_ids == [int(i) for i in off_ids_char[:n_final]]
    # final + provisional ids together cover every picked frame
    assert (len(session._char_ids)
            + len(session._provisional_ids)) == n_picked


def test_bigram_lm_table(tmp_path):
    from tensorflowasr_tpu.utils.ngram_lm import estimate_bigram_lm

    seqs = [[1, 2, 3], [1, 2, 4], [1, 2, 3]]
    lm = estimate_bigram_lm(seqs, vocab_size=6, add_k=0.1)
    assert lm.shape == (6, 6)
    # p(2|1) should dominate row 1
    assert np.argmax(lm[1]) == 2
    # rows are normalized
    np.testing.assert_allclose(np.exp(lm).sum(1), 1.0, rtol=1e-5)

    def ppl(table, sequences):
        total, n = 0.0, 0
        for seq in sequences:
            prev = 0
            for tok in seq:
                total += float(table[prev, int(tok)])
                prev = int(tok)
                n += 1
        return float(np.exp(-total / max(n, 1)))

    assert ppl(lm, seqs) < ppl(lm, [[5, 5, 5]])
