"""make_bert_features CLI: a tiny local HF BERT (random init — no network)
drives the REAL teacher path end-to-end, and the resulting .npy files feed
punc training with feature_map_loss > 0 (VERDICT round-1 item 4; matches
/root/reference/punc_recover/dataloaders/punc_dataloader.py:157-168)."""

import hashlib
import os

import numpy as np
import pytest
import yaml

transformers = pytest.importorskip("transformers")

HIDDEN = 16


@pytest.fixture(scope="module")
def tiny_bert(tmp_path_factory):
    """A saved-to-disk miniature Chinese BERT (vocab built locally)."""
    import torch  # noqa: F401  (transformers backend)
    from transformers import BertConfig, BertModel, BertTokenizer

    d = tmp_path_factory.mktemp("tiny_bert")
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + \
        list("abcdef") + ["你", "好", "世", "界"]
    (d / "vocab.txt").write_text("\n".join(vocab), encoding="utf-8")
    tok = BertTokenizer(str(d / "vocab.txt"))
    cfg = BertConfig(vocab_size=len(vocab), hidden_size=HIDDEN,
                     num_hidden_layers=1, num_attention_heads=2,
                     intermediate_size=32, max_position_embeddings=64)
    model = BertModel(cfg)
    model.save_pretrained(str(d))
    tok.save_pretrained(str(d))
    return str(d)


@pytest.fixture()
def punc_configs(tmp_path):
    (tmp_path / "chars.txt").write_text(
        "\n".join(["<S>", "</S>"] + list("abcdef")), encoding="utf-8")
    (tmp_path / "puncs.txt").write_text(
        "\n".join(["<S>", "</S>", "，", "。"]), encoding="utf-8")
    lines = ["ab，cd。", "abc。", "fed，ab。", "bcade。"]
    (tmp_path / "punc.list").write_text("\n".join(lines), encoding="utf-8")
    cfg = {
        "punc_vocab": {"vocabulary": str(tmp_path / "chars.txt"),
                       "blank_at_zero": True},
        "punc_biaodian": {"vocabulary": str(tmp_path / "puncs.txt"),
                          "blank_at_zero": True},
        "running_config": {"train_list": str(tmp_path / "punc.list"),
                           "eval_list": str(tmp_path / "punc.list"),
                           "batch_size": 2, "outdir": None},
        "model_config": {"num_layers": 1, "d_model": 16,
                         "enc_embedding_dim": 16, "num_heads": 2,
                         "dff": 16, "pe_input": 64, "bert_dim": HIDDEN},
    }
    dp, mp = tmp_path / "d.yml", tmp_path / "m.yml"
    dp.write_text(yaml.dump({k: v for k, v in cfg.items()
                             if k != "model_config"}))
    mp.write_text(yaml.dump({"model_config": cfg["model_config"]}))
    return str(dp), str(mp), lines, tmp_path


def test_make_bert_features_and_distill_train(tiny_bert, punc_configs):
    from tensorflowasr_tpu.cli.make_bert_features import main

    dp, mp, lines, tmp_path = punc_configs
    outdir = str(tmp_path / "feats")
    rc = main(["--data_config", dp, "--model_config", mp,
               "--bert_model", tiny_bert, "--output_dir", outdir,
               "--compute_dtype", "float32"])
    assert rc == 0

    # one file per line, hash-named, aligned [n_chars + 2, HIDDEN]
    for line in lines:
        h = hashlib.sha1(line.encode("utf-8")).hexdigest()[:16]
        path = os.path.join(outdir, f"{h}.npy")
        assert os.path.exists(path), line
        feat = np.load(path)
        n_chars = len([c for c in line if c not in ("，", "。")])
        assert feat.shape == (n_chars + 2, HIDDEN)
        assert feat.dtype == np.float32

    # idempotent: re-run skips everything
    from tensorflowasr_tpu.cli import make_bert_features
    rc = make_bert_features.main(
        ["--data_config", dp, "--model_config", mp,
         "--bert_model", tiny_bert, "--output_dir", outdir,
         "--compute_dtype", "float32"])
    assert rc == 0

    # the features feed the dataloader + trainer: feature_map_loss > 0
    import jax

    from tensorflowasr_tpu.cli.common import build_punc_model
    from tensorflowasr_tpu.train.punc_trainer import make_punc_train_step
    from tensorflowasr_tpu.utils.config import UserConfig

    config = UserConfig(dp, mp)
    _, dl, model, state = build_punc_model(config)
    dl.bert_feature_dir = outdir
    batch = dl.generate(True)
    assert "bert_features" in batch
    assert batch["bert_features"].shape[-1] == HIDDEN
    step = make_punc_train_step(model, donate=False)
    state, metrics = step(state, batch, jax.random.PRNGKey(0))
    fm = float(metrics["feature_map_loss"])
    assert np.isfinite(fm) and fm > 0.0
