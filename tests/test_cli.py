"""CLI end-to-end smoke: train_asr / eval_am / test_asr with tiny YAML
configs on a synthetic corpus (CPU mesh)."""

import json
import os

import numpy as np
import pytest
import yaml

from tensorflowasr_tpu.utils.audio import write_wav


def _sine(freq, seconds, sr=16000, amp=0.5):
    t = np.arange(int(seconds * sr)) / sr
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


@pytest.fixture()
def configs(tmp_path):
    sr = 16000
    lines = []
    texts = ["ni3 hao3", "shi4 jie4", "ni3 shi4", "hao3 jie4"]
    for i, txt in enumerate(texts):
        p = tmp_path / f"u{i}.wav"
        write_wav(str(p), _sine(200 + 40 * i, 1.0), sr)
        lines.append(f"{p}\t{txt}")
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
        "speech_config": {
            "sample_rate": sr, "stride_ms": 10, "reduction_factor": 4,
            "wav_max_duration": 2, "train_list": str(tmp_path / "train.list"),
            "eval_list": str(tmp_path / "train.list"),
            "pinyin_map": str(tmp_path / "p2p.map"),
            "transcripts_are_pinyin": True,
        },
        "inp_config": {"vocabulary": str(tmp_path / "phones.txt"),
                       "blank_at_zero": False},
        "tar_config": {"vocabulary": str(tmp_path / "chars.txt"),
                       "blank_at_zero": False},
        "augments_config": None,
        "optimizer_config": {"lr": 0.003},
        "running_config": {"batch_size": 2, "log_interval_steps": 2,
                           "eval_interval_steps": 1000,
                           "save_interval_steps": 4,
                           "outdir": str(tmp_path / "logs")},
    }
    model_cfg = {
        "model_config": {
            "name": "OfflineConformerCTC", "dmodel": 32, "num_blocks": 1,
            "head_size": 8, "num_heads": 2, "kernel_size": 8,
            "ctcdecoder_num_blocks": 1, "translator_num_blocks": 1,
            "dropout": 0.0,
        }
    }
    dp = tmp_path / "data.yml"
    mp = tmp_path / "model.yml"
    dp.write_text(yaml.dump(data_cfg), encoding="utf-8")
    mp.write_text(yaml.dump(model_cfg), encoding="utf-8")
    return tmp_path, str(dp), str(mp)


def test_train_eval_test_asr_cli(configs, capsys):
    tmp_path, data_yml, model_yml = configs
    from tensorflowasr_tpu.cli.eval_am import main as eval_main
    from tensorflowasr_tpu.cli.test_asr import main as test_main
    from tensorflowasr_tpu.cli.train_asr import main as train_main

    rc = train_main(["--data_config", data_yml, "--model_config", model_yml,
                     "--total_steps", "4", "--compute_dtype", "float32"])
    assert rc == 0
    # checkpoint written
    ckpts = os.listdir(tmp_path / "logs" / "checkpoints")
    assert len(ckpts) >= 1
    # metrics logged
    metrics = (tmp_path / "logs" / "metrics.jsonl").read_text().strip()
    assert metrics
    m = json.loads(metrics.splitlines()[-1])
    assert np.isfinite(m["train_loss"])

    rc = eval_main(["--data_config", data_yml, "--model_config", model_yml,
                    "--max_batches", "2", "--compute_dtype", "float32"])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()[-1]
    result = json.loads(out)
    assert "phone_phone_cer" in result or "phone_cer" in str(result)

    wav_path = str(next(tmp_path.glob("u0.wav")))
    rc = test_main(["--data_config", data_yml, "--model_config", model_yml,
                    "--wav", wav_path, "--compute_dtype", "float32"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "RTF" in out and "phones:" in out

    # beam decode with on-chip n-gram shallow fusion: train the LM from
    # the same list, then eval_am --lm
    from tensorflowasr_tpu.cli.train_lm import main as lm_main

    lm_path = str(tmp_path / "lm.npz")
    rc = lm_main(["--data_config", data_yml, "--model_config", model_yml,
                  "--unit", "phone", "--order", "3", "--output", lm_path])
    assert rc == 0
    capsys.readouterr()
    rc = eval_main(["--data_config", data_yml, "--model_config", model_yml,
                    "--max_batches", "1", "--compute_dtype", "float32",
                    "--lm", lm_path, "--lm_weight", "0.3"])
    assert rc == 0
    result = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "phone_cer" in str(result)
