"""examples/aishell1 recipe smoke: prepare -> train_asr -> eval_am on a
synthetic mini-AISHELL tree (same layout + transcript format as the real
corpus, openslr.org/33)."""

import json
import os
import sys

import numpy as np
import yaml

from tensorflowasr_tpu.utils.audio import write_wav

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

LEXICON = {"你": "ni3", "好": "hao3", "世": "shi4", "界": "jie4",
           "中": "zhong1", "国": "guo2", "大": "da4", "小": "xiao3"}
UTTS = {
    "train": [("BAC009S0002W0122", "你 好"), ("BAC009S0002W0123", "世界"),
              ("BAC009S0002W0124", "中 国"), ("BAC009S0003W0200", "大小"),
              ("BAC009S0003W0201", "你好 世界"),
              ("BAC009S0003W0202", "中国 大")],
    "dev": [("BAC009S0900W0400", "你 好"), ("BAC009S0900W0401", "中国")],
    "test": [("BAC009S0901W0500", "世 界")],
}


def _sine(freq, seconds, sr=16000, amp=0.5):
    t = np.arange(int(seconds * sr)) / sr
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def _build_tree(root):
    sr = 16000
    trans = []
    i = 0
    for split, utts in UTTS.items():
        for utt, txt in utts:
            spk = utt[6:11]
            d = root / "wav" / split / spk
            d.mkdir(parents=True, exist_ok=True)
            write_wav(str(d / f"{utt}.wav"), _sine(180 + 25 * i, 1.0), sr)
            trans.append(f"{utt} {txt}")
            i += 1
    td = root / "transcript"
    td.mkdir(exist_ok=True)
    (td / "aishell_transcript_v0.8.txt").write_text(
        "\n".join(trans) + "\n", encoding="utf-8")
    lex = root / "lexicon.tsv"
    lex.write_text("\n".join(f"{c}\t{p}" for c, p in LEXICON.items()),
                   encoding="utf-8")
    return lex


def test_aishell1_recipe_end_to_end(tmp_path, capsys):
    from examples.aishell1.prepare import main as prepare_main
    from tensorflowasr_tpu.cli.eval_am import main as eval_main
    from tensorflowasr_tpu.cli.train_asr import main as train_main

    data_dir = tmp_path / "aishell1"
    data_dir.mkdir()
    lex = _build_tree(data_dir)
    work = tmp_path / "work"

    rc = prepare_main(["--data_dir", str(data_dir), "--out_dir", str(work),
                       "--lexicon", str(lex)])
    assert rc == 0

    # lists: every wav with a transcript, path<TAB>pinyin (lexicon mode)
    train_lines = (work / "train.list").read_text(
        encoding="utf-8").strip().splitlines()
    assert len(train_lines) == len(UTTS["train"])
    path, txt = train_lines[0].split("\t")
    assert os.path.exists(path)
    assert all(t[-1].isdigit() for t in txt.split())  # toned pinyin
    assert (work / "test.list").read_text(encoding="utf-8").strip()

    # vocabularies + map are loadable and cover the corpus
    from tensorflowasr_tpu.utils.text import (
        TextFeaturizer, load_pinyin2phone, tokens_to_phones)
    p2p = load_pinyin2phone(str(work / "pinyin2phone.map"))
    phone_f = TextFeaturizer({"vocabulary": str(work / "phones.txt"),
                              "blank_at_zero": False})
    for pin in LEXICON.values():
        for ph in tokens_to_phones([pin], p2p, phone_f):
            assert phone_f.has(ph), ph

    # generated am_data.yml is valid and points into work/
    cfg = yaml.safe_load((work / "am_data.yml").read_text(encoding="utf-8"))
    assert cfg["speech_config"]["transcripts_are_pinyin"] is True
    assert cfg["running_config"]["num_epochs"] == 50

    # shrink for CPU-mesh smoke: tiny batch, short training
    cfg["running_config"].update(batch_size=2, log_interval_steps=2,
                                 save_interval_steps=4,
                                 eval_interval_steps=1000)
    cfg["speech_config"]["wav_max_duration"] = 2
    cfg["optimizer_config"] = {"lr": 0.003}
    data_yml = work / "am_data_smoke.yml"
    data_yml.write_text(yaml.dump(cfg), encoding="utf-8")
    model_yml = work / "model.yml"
    model_yml.write_text(yaml.dump({"model_config": {
        "name": "OfflineConformerCTC", "dmodel": 32, "num_blocks": 1,
        "head_size": 8, "num_heads": 2, "kernel_size": 8,
        "ctcdecoder_num_blocks": 1, "translator_num_blocks": 1,
        "dropout": 0.0}}), encoding="utf-8")

    rc = train_main(["--data_config", str(data_yml),
                     "--model_config", str(model_yml),
                     "--total_steps", "4", "--compute_dtype", "float32",
                     "--data_workers", "0"])
    assert rc == 0
    outdir = cfg["running_config"]["outdir"]
    assert os.listdir(os.path.join(outdir, "checkpoints"))

    rc = eval_main(["--data_config", str(data_yml),
                    "--model_config", str(model_yml),
                    "--max_batches", "1", "--compute_dtype", "float32"])
    assert rc == 0
    out = capsys.readouterr().out
    report = json.loads(out.strip().splitlines()[-1])
    assert "phone_cer" in report and np.isfinite(report["phone_cer"])
