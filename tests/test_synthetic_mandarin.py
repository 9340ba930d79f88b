"""examples/synthetic_mandarin: generate -> aishell1 prepare
(--train_time_lexicon keeps hanzi targets) -> train_asr -> eval_am runs
end to end at the real phone-inventory scale (247-token vocab)."""

import json
import os
import subprocess
import sys

import yaml
import pytest  # noqa: E402

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_generate_prepare_train_eval(tmp_path, capsys):
    corpus = str(tmp_path / "corpus")
    work = str(tmp_path / "work")
    env = dict(os.environ)
    for script, argv in (
            ("examples/synthetic_mandarin/generate.py",
             ["--out_dir", corpus, "--n_chars", "30", "--n_train", "24",
              "--n_dev", "6", "--n_test", "4", "--max_len", "6"]),
            ("examples/aishell1/prepare.py",
             ["--data_dir", corpus, "--out_dir", work,
              "--train_time_lexicon", os.path.join(corpus, "lexicon.tsv")]),
    ):
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, script)] + argv,
            capture_output=True, text=True, env=env, cwd=REPO)
        assert out.returncode == 0, out.stderr

    # shrink to test scale: small model + small batch
    cfg_path = os.path.join(work, "am_data.yml")
    cfg = yaml.safe_load(open(cfg_path, encoding="utf-8"))
    cfg["running_config"]["batch_size"] = 4
    cfg["running_config"]["log_interval_steps"] = 2
    cfg["running_config"]["eval_interval_steps"] = 1000
    cfg["running_config"]["save_interval_steps"] = 4
    cfg["optimizer_config"] = {"lr": 0.002}
    yaml.safe_dump(cfg, open(cfg_path, "w", encoding="utf-8"))
    model_cfg = {"model_config": {
        "name": "OfflineConformerCTC", "dmodel": 32, "num_blocks": 1,
        "head_size": 8, "num_heads": 2, "kernel_size": 8, "dropout": 0.0,
        "ctcdecoder_num_blocks": 1, "translator_num_blocks": 1}}
    model_path = str(tmp_path / "model.yml")
    yaml.safe_dump(model_cfg, open(model_path, "w", encoding="utf-8"))

    from tensorflowasr_tpu.cli.eval_am import main as eval_main
    from tensorflowasr_tpu.cli.train_asr import main as train_main

    rc = train_main(["--data_config", cfg_path, "--model_config",
                     model_path, "--total_steps", "4",
                     "--compute_dtype", "float32"])
    assert rc == 0
    assert os.path.isdir(os.path.join(work, "ctc_offline-logs",
                                      "checkpoints"))
    rc = eval_main(["--data_config", cfg_path, "--model_config", model_path,
                    "--max_batches", "1", "--compute_dtype", "float32"])
    assert rc == 0
    result = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "phone_cer" in str(result)
