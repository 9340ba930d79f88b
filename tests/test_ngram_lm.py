"""On-chip Kneser-Ney n-gram LM: build/lookup parity, perplexity ordering,
and beam shallow fusion beating the bigram (VERDICT round-1 item 3 — the
KenLM-scorer role of the reference's externals/ctc_decoders)."""

import numpy as np
import jax.numpy as jnp
import pytest

from tensorflowasr_tpu.ops.beam import ctc_beam_search_decode
from tensorflowasr_tpu.utils.lm import estimate_bigram_lm
from tensorflowasr_tpu.utils.ngram_lm import (
    NGramLM,
    lm_pack,
    score_candidates,
    train_ngram_lm,
)


def _markov_corpus(rng, n_seqs, v=8, length=10):
    """Deterministic order-2 language: next = (2*a + b) % v."""
    seqs = []
    for _ in range(n_seqs):
        s = [int(rng.integers(0, v)), int(rng.integers(0, v))]
        for _ in range(length - 2):
            s.append((2 * s[-2] + s[-1]) % v)
        seqs.append(s)
    return seqs


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(0)
    return _markov_corpus(rng, 300)


@pytest.fixture(scope="module")
def lm3(corpus):
    return train_ngram_lm(corpus, 8, order=3)


def test_onchip_lookup_matches_numpy(corpus, lm3):
    rng = np.random.default_rng(1)
    ctxs, cands, golden = [], [], []
    for _ in range(40):
        ctx = [int(rng.integers(0, 8)), int(rng.integers(0, 8))]
        cand = [int(rng.integers(0, 8)) for _ in range(5)]
        ctxs.append(ctx)
        cands.append(cand)
        golden.append([lm3.score(ctx, c) for c in cand])
    got = np.asarray(score_candidates(
        lm_pack(lm3), jnp.asarray(ctxs, jnp.int32),
        jnp.asarray(cands, jnp.int32)))
    np.testing.assert_allclose(got, np.asarray(golden, np.float32),
                               atol=1e-5)


def test_bos_context_matches_numpy(lm3):
    golden = [lm3.score([], c) for c in range(8)]
    got = np.asarray(score_candidates(
        lm_pack(lm3), jnp.asarray([[lm3.bos, lm3.bos]], jnp.int32),
        jnp.asarray([list(range(8))], jnp.int32)))[0]
    np.testing.assert_allclose(got, np.asarray(golden, np.float32),
                               atol=1e-5)


def test_probabilities_normalize(corpus, lm3):
    ctx = corpus[0][:2]
    total = sum(np.exp(lm3.score(ctx, c)) for c in range(8))
    assert 0.97 < total < 1.03


def test_order3_beats_order2_perplexity(corpus):
    rng = np.random.default_rng(7)
    held = _markov_corpus(rng, 60)
    lm3 = train_ngram_lm(corpus, 8, order=3)
    lm2 = train_ngram_lm(corpus, 8, order=2)
    p3, p2 = lm3.perplexity(held), lm2.perplexity(held)
    # the language IS order-2-conditional, so the trigram should crush it
    assert p3 < p2 * 0.6, (p3, p2)


def test_save_load_roundtrip(tmp_path, lm3):
    path = str(tmp_path / "lm.npz")
    lm3.save(path)
    lm = NGramLM.load(path)
    assert lm.order == 3 and lm.n_probe == lm3.n_probe
    assert lm.score([3, 4], 2) == pytest.approx(lm3.score([3, 4], 2))


def _ambiguous_logits(rng, seq, v, blank):
    """One emission frame per token + blank separator; the true token TIES
    with a random confusable — acoustics alone are a coin flip, only the
    LM can break it."""
    frames = []
    for tok in seq:
        e = np.full((v,), -5.0, np.float32)
        other = int(rng.integers(0, v - 1))
        while other == tok:
            other = int(rng.integers(0, v - 1))
        e[tok] = 1.0
        e[other] = 1.0
        frames.append(e)
        b = np.full((v,), -5.0, np.float32)
        b[blank] = 3.0
        frames.append(b)
    return np.stack(frames)


def test_trigram_fusion_beats_bigram_cer(corpus):
    """Held-out decode CER: on-chip order-3 fusion must beat bigram
    fusion when the language is order-2-conditional."""
    rng = np.random.default_rng(5)
    v_tok = 8
    blank = v_tok
    v = v_tok + 1
    lm3 = lm_pack(train_ngram_lm(corpus, v_tok, order=3))
    bigram = np.pad(estimate_bigram_lm(corpus, v_tok), ((0, 1), (0, 1)),
                    constant_values=-20.0)

    held = _markov_corpus(rng, 30, v=v_tok, length=8)

    def decode_err(**lm_kwargs):
        errs = total = 0
        for seq in held:
            logits = _ambiguous_logits(rng, seq, v, blank)[None]
            p, l, _ = ctc_beam_search_decode(
                jnp.asarray(logits), jnp.asarray([logits.shape[1]]),
                blank_id=blank, beam_width=8, prune_k=4, **lm_kwargs)
            hyp = list(np.asarray(p)[0, 0, :int(l[0, 0])])
            n = max(len(seq), len(hyp))
            errs += sum(1 for a, b in zip(seq, hyp) if a != b) + \
                abs(len(seq) - len(hyp))
            total += n
        return errs / total

    rng = np.random.default_rng(5)
    cer_bi = decode_err(lm_logp=jnp.asarray(bigram), lm_weight=0.8)
    rng = np.random.default_rng(5)
    cer_tri = decode_err(ngram_lm=lm3, lm_weight=0.8)
    assert cer_tri < cer_bi, (cer_tri, cer_bi)
    assert cer_tri < 0.12, cer_tri


def test_train_lm_cli(tmp_path, capsys):
    import yaml

    from tensorflowasr_tpu.cli.train_lm import main

    lines = ["/x.wav\tni3 hao3 shi4", "/y.wav\tshi4 jie4 hao3",
             "/z.wav\tni3 shi4 jie4"] * 5
    (tmp_path / "train.list").write_text("\n".join(lines), encoding="utf-8")
    (tmp_path / "phones.txt").write_text(
        "\n".join(["n", "i3", "h", "ao3", "sh", "i4", "j", "ie4"]),
        encoding="utf-8")
    (tmp_path / "chars.txt").write_text(
        "\n".join(["<S>", "</S>", "ni3", "hao3", "shi4", "jie4"]),
        encoding="utf-8")
    (tmp_path / "p2p.map").write_text(
        "ni3\tn i3\nhao3\th ao3\nshi4\tsh i4\njie4\tj ie4\n",
        encoding="utf-8")
    data_cfg = {
        "speech_config": {"train_list": str(tmp_path / "train.list"),
                          "pinyin_map": str(tmp_path / "p2p.map"),
                          "transcripts_are_pinyin": True},
        "inp_config": {"vocabulary": str(tmp_path / "phones.txt"),
                       "blank_at_zero": False},
        "tar_config": {"vocabulary": str(tmp_path / "chars.txt"),
                       "blank_at_zero": False},
    }
    dc = tmp_path / "data.yml"
    mc = tmp_path / "model.yml"
    dc.write_text(yaml.safe_dump(data_cfg), encoding="utf-8")
    mc.write_text(yaml.safe_dump({"model_config": {}}), encoding="utf-8")
    out = tmp_path / "lm.npz"
    rc = main(["--data_config", str(dc), "--model_config", str(mc),
               "--unit", "phone", "--order", "3", "--output", str(out),
               "--eval_lists", str(tmp_path / "train.list")])
    assert rc == 0 and out.exists()
    assert "held-out perplexity" in capsys.readouterr().out
    lm = NGramLM.load(str(out))
    assert lm.order == 3 and lm.vocab_size == 9  # 8 phones + blank
