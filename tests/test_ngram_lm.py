"""On-chip Kneser-Ney n-gram LM: build/lookup parity, perplexity ordering,
and beam shallow fusion beating the bigram (VERDICT round-1 item 3 — the
KenLM-scorer role of the reference's externals/ctc_decoders)."""

import numpy as np
import jax.numpy as jnp
import pytest

from tensorflowasr_tpu.ops.beam import ctc_beam_search_decode
from tensorflowasr_tpu.utils.ngram_lm import estimate_bigram_lm
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


def test_arpa_roundtrip_perplexity(tmp_path, corpus, lm3):
    """to_arpa -> from_arpa must preserve the model: same perplexity and
    same per-token scores (within text-format rounding). Covers the
    ARPA-import role of the reference's KenLM scorer
    (externals/ctc_decoders.zip scorer.cpp)."""
    tokens = [f"t{i}" for i in range(8)] + ["<blank>"]
    path = str(tmp_path / "lm.arpa")
    lm3.to_arpa(path, tokens)
    lm = NGramLM.from_arpa(path, {t: i for i, t in enumerate(tokens)},
                           lm3.vocab_size)
    assert lm.order == lm3.order
    assert lm.perplexity(corpus[:50]) == pytest.approx(
        lm3.perplexity(corpus[:50]), rel=1e-4)
    for ctx, tok in [((3, 4), 2), ((0,), 1), ((), 5), ((7, 7), 7)]:
        assert lm.score(list(ctx), tok) == pytest.approx(
            lm3.score(list(ctx), tok), abs=1e-4)


def test_arpa_roundtrip_survives_save_load(tmp_path, lm3):
    """save() keeps the raw entries, so a LOADED .npz can still export
    ARPA identical to the original export."""
    npz = str(tmp_path / "lm.npz")
    lm3.save(npz)
    loaded = NGramLM.load(npz)
    tokens = [f"t{i}" for i in range(8)] + ["<blank>"]
    a1, a2 = str(tmp_path / "a1.arpa"), str(tmp_path / "a2.arpa")
    lm3.to_arpa(a1, tokens)
    loaded.to_arpa(a2, tokens)
    with open(a1) as f1, open(a2) as f2:
        assert sorted(f1.read().splitlines()) == \
            sorted(f2.read().splitlines())


def test_from_kenlm_style_arpa(tmp_path):
    """Parse a hand-written KenLM-style file (log10, <s>/</s>/<unk>
    conventions) and check the backoff math against hand computation."""
    arpa = """
\\data\\
ngram 1=5
ngram 2=3

\\1-grams:
-99\t<s>\t-0.30103
-0.60206\ta\t-0.30103
-0.60206\tb\t-0.30103
-1.0\tc
-2.0\t<unk>

\\2-grams:
-0.30103\t<s> a
-0.1549\ta b
-0.60206\tb </s>

\\end\\
"""
    path = str(tmp_path / "k.arpa")
    with open(path, "w") as f:
        f.write(arpa)
    lm = NGramLM.from_arpa(path, {"a": 0, "b": 1, "c": 2}, 3)
    assert lm.order == 2
    ln10 = np.log(10.0)
    # seen bigram: direct
    assert lm.score([0], 1) == pytest.approx(-0.1549 * ln10, abs=1e-5)
    # BOS context: <s> a seen
    assert lm.score([], 0) == pytest.approx(-0.30103 * ln10, abs=1e-5)
    # unseen bigram a->c: bow(a) + uni(c)
    assert lm.score([0], 2) == pytest.approx(
        (-0.30103 + -1.0) * ln10, abs=1e-5)
    # entries with </s>/<unk> were skipped, c has no backoff -> bow 0
    assert lm.score([2], 0) == pytest.approx(-0.60206 * ln10, abs=1e-5)


def test_word_arpa_char_normalization(tmp_path):
    """A WORD-level ARPA (multi-char tokens) becomes a unit-level LM whose
    transitions reflect the lexicon: within-word and across-frequent-
    bigram transitions outscore never-seen ones (the reference word-trie
    role, scorer.cpp/path_trie.cpp)."""
    from tensorflowasr_tpu.utils.ngram_lm import char_lm_from_word_arpa

    arpa = """
\\data\\
ngram 1=3
ngram 2=2

\\1-grams:
-0.5\tab\t-0.3
-0.5\tcd\t-0.3
-99\t<s>\t-0.3

\\2-grams:
-0.2\tab cd
-1.5\tcd ab

\\end\\
"""
    path = str(tmp_path / "w.arpa")
    with open(path, "w") as f:
        f.write(arpa)
    chars = {c: i for i, c in enumerate("abcd")}
    lm = char_lm_from_word_arpa(path, chars, 4, order=2)
    # within-word transition a->b dominates a->(anything else)
    assert lm.score([chars["a"]], chars["b"]) > \
        lm.score([chars["a"]], chars["c"]) + 1.0
    # frequent word bigram "ab cd": b->c outscores b->a ("cd ab" is rare
    # so d->a exists but weaker than d... compare against never-seen b->d)
    assert lm.score([chars["b"]], chars["c"]) > \
        lm.score([chars["b"]], chars["d"]) + 1.0
    # on-chip scoring agrees with the numpy scorer for this LM too
    dev = lm_pack(lm)
    ctx = jnp.asarray([[lm.bos, chars["a"]]], jnp.int32)
    cand = jnp.asarray([[chars["b"], chars["c"]]], jnp.int32)
    got = np.asarray(score_candidates(dev, ctx, cand))[0]
    want = [lm.score([chars["a"]], chars["b"]),
            lm.score([chars["a"]], chars["c"])]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_train_lm_cli_arpa_export_import(tmp_path, capsys):
    """--arpa_out then --lm x.arpa: a full CLI ARPA round trip drives the
    same perplexity."""
    import yaml

    from tensorflowasr_tpu.cli.train_lm import main

    (tmp_path / "train.list").write_text(
        "\n".join(["a\tni3 hao3", "b\tni3 hao3 shi4 jie4",
                   "c\tshi4 jie4 ni3 hao3"] * 5), encoding="utf-8")
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
    dc, mc = tmp_path / "data.yml", tmp_path / "model.yml"
    dc.write_text(yaml.safe_dump(data_cfg), encoding="utf-8")
    mc.write_text(yaml.safe_dump({"model_config": {}}), encoding="utf-8")
    out, arpa = tmp_path / "lm.npz", tmp_path / "lm.arpa"
    rc = main(["--data_config", str(dc), "--model_config", str(mc),
               "--unit", "phone", "--order", "2", "--output", str(out),
               "--arpa_out", str(arpa)])
    assert rc == 0 and arpa.exists()
    first = capsys.readouterr().out
    assert "ARPA export" in first
    # import the ARPA back through the CLI eval path
    rc = main(["--data_config", str(dc), "--model_config", str(mc),
               "--unit", "phone", "--lm", str(arpa),
               "--eval_lists", str(tmp_path / "train.list")])
    assert rc == 0
    second = capsys.readouterr().out
    p1 = float(first.split("train ppl ")[1].split(")")[0])
    p2 = float(second.split("perplexity")[1].split(":")[1].strip())
    assert p2 == pytest.approx(p1, rel=1e-3)
