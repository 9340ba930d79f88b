"""CLI smoke for eval_vad / eval_punc / train+test chunk ASR with tiny
configs."""

import json

import numpy as np
import pytest
import yaml

from tensorflowasr_tpu.utils.audio import write_wav


def _sine(freq, seconds, sr, amp=0.5):
    t = np.arange(int(seconds * sr)) / sr
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def test_train_then_eval_vad_cli(tmp_path, capsys):
    """train_vad saves an orbax checkpoint; eval_vad restores it."""
    import os

    from tensorflowasr_tpu.cli.eval_vad import main as eval_main
    from tensorflowasr_tpu.cli.train_vad import main as train_main

    sr = 8000
    paths = []
    for i in range(4):
        p = tmp_path / f"v{i}.wav"
        write_wav(str(p), _sine(250 + 30 * i, 0.5, sr, 0.7), sr)
        paths.append(str(p))
    (tmp_path / "vad.list").write_text("\n".join(paths), encoding="utf-8")
    data_cfg = {
        "speech_config": {"sample_rate": sr, "frame_input": 80,
                          "max_frames": 8000, "voice_thread": 0.4},
        "running_config": {"train_list": str(tmp_path / "vad.list"),
                           "eval_list": str(tmp_path / "vad.list"),
                           "batch_size": 2, "log_interval_steps": 2,
                           "save_interval_steps": 2,
                           "outdir": str(tmp_path / "vlogs")},
        "augments_config": None,
    }
    model_cfg = {"model_config": {"name": "CNN_Online_VAD", "dmodel": 8}}
    dp, mp = tmp_path / "d.yml", tmp_path / "m.yml"
    dp.write_text(yaml.dump(data_cfg))
    mp.write_text(yaml.dump(model_cfg))
    rc = train_main(["--data_config", str(dp), "--model_config", str(mp),
                     "--total_steps", "2", "--compute_dtype", "float32"])
    assert rc == 0
    assert os.listdir(tmp_path / "vlogs" / "checkpoints")

    rc = eval_main(["--data_config", str(dp), "--model_config", str(mp),
                    "--max_batches", "1", "--compute_dtype", "float32"])
    assert rc == 0
    captured = capsys.readouterr()
    out = json.loads(captured.out.strip().splitlines()[-1])
    assert "f1" in out and "acc" in out
    # restored, not random init: no warning on stderr
    assert "no VAD checkpoint" not in captured.err


def test_eval_punc_cli(tmp_path, capsys):
    from tensorflowasr_tpu.cli.eval_punc import main

    (tmp_path / "chars.txt").write_text(
        "\n".join(["<S>", "</S>"] + list("abcdef")), encoding="utf-8")
    (tmp_path / "puncs.txt").write_text("\n".join(["<S>", "</S>", "，", "。"]),
                                        encoding="utf-8")
    (tmp_path / "punc.list").write_text("ab，cd。\nabc。\nfed，ab。\n",
                                        encoding="utf-8")
    cfg = {
        "punc_vocab": {"vocabulary": str(tmp_path / "chars.txt"),
                       "blank_at_zero": True},
        "punc_biaodian": {"vocabulary": str(tmp_path / "puncs.txt"),
                          "blank_at_zero": True},
        "running_config": {"train_list": str(tmp_path / "punc.list"),
                           "eval_list": str(tmp_path / "punc.list"),
                           "batch_size": 2, "outdir": None},
        "model_config": {"num_layers": 2, "d_model": 16,
                         "enc_embedding_dim": 16, "num_heads": 2,
                         "dff": 16, "pe_input": 64},
    }
    dp, mp = tmp_path / "d.yml", tmp_path / "m.yml"
    dp.write_text(yaml.dump({k: v for k, v in cfg.items()
                             if k != "model_config"}))
    mp.write_text(yaml.dump({"model_config": cfg["model_config"]}))
    rc = main(["--data_config", str(dp), "--model_config", str(mp),
               "--max_batches", "1", "--compute_dtype", "float32"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "bd_acc" in out


def test_test_punc_cli(tmp_path, capsys):
    from tensorflowasr_tpu.cli.test_punc import main

    (tmp_path / "chars.txt").write_text(
        "\n".join(["<S>", "</S>"] + list("abcdef")), encoding="utf-8")
    (tmp_path / "puncs.txt").write_text(
        "\n".join(["<S>", "</S>", "，", "。"]), encoding="utf-8")
    (tmp_path / "punc.list").write_text("ab，cd。\nabc。\n", encoding="utf-8")
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
                         "dff": 16, "pe_input": 32},
    }
    dp, mp = tmp_path / "d.yml", tmp_path / "m.yml"
    dp.write_text(yaml.dump({k: v for k, v in cfg.items()
                             if k != "model_config"}))
    mp.write_text(yaml.dump({"model_config": cfg["model_config"]}))
    rc = main(["--data_config", str(dp), "--model_config", str(mp),
               "--text", "abcd", "--compute_dtype", "float32"])
    assert rc == 0
    out = capsys.readouterr().out.strip()
    # every input char survives (punctuation may or may not be inserted
    # by the random-init model)
    assert [c for c in out if c not in ("，", "。")] == list("abcd")


def test_chunk_train_and_stream_cli(tmp_path, capsys):
    from tensorflowasr_tpu.cli.test_chunk_asr import main as chunk_main
    from tensorflowasr_tpu.cli.train_asr import main as train_main

    sr = 16000
    lines = []
    for i, txt in enumerate(["ni3 hao3", "shi4 jie4"]):
        p = tmp_path / f"u{i}.wav"
        write_wav(str(p), _sine(200 + 40 * i, 1.0, sr), sr)
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
            "wav_max_duration": 2,
            "train_list": str(tmp_path / "train.list"),
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
                           "save_interval_steps": 2,
                           "outdir": str(tmp_path / "logs")},
    }
    stack = dict(dmodel=16, head_size=8, num_heads=2, kernel_size=4,
                 fc_factor=0.5, dropout=0.0, win_front=6)
    model_cfg = {"model_config": {
        "name": "ChunkConformer",
        "ChunkConformerFront": {"dmodel": 16, "reduction_factor": 4,
                                "sample_rate": sr, "n_mels": 20,
                                "stride_ms": 10, "chunk_num": 16},
        "ChunkConformerEncoder": {**stack, "num_blocks": 1, "win_back": 0},
        "ChunkCTCPicker": {**stack, "num_blocks": 1, "win_back": 0},
        "ChunkCTCDecoder": {**stack, "num_blocks": 1, "win_back": 2},
        "ContextHelper": {**stack, "num_blocks": 1, "win_back": 0},
    }}
    dp, mp = tmp_path / "d.yml", tmp_path / "m.yml"
    dp.write_text(yaml.dump(data_cfg))
    mp.write_text(yaml.dump(model_cfg))

    rc = train_main(["--data_config", str(dp), "--model_config", str(mp),
                     "--total_steps", "2", "--compute_dtype", "float32"])
    assert rc == 0

    wav_path = str(tmp_path / "u0.wav")
    rc = chunk_main(["--data_config", str(dp), "--model_config", str(mp),
                     "--wav", wav_path, "--compute_dtype", "float32"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "offline phones:" in out
    assert "stream  chars :" in out
    assert "RTF" in out


def test_serve_model_chunk_stream_ops(tmp_path):
    """build_chunk_stream_ops (the serve_model --chunk path): restores
    the trained chunk checkpoint and serves deterministic, isolated
    multi-stream decodes."""
    from tensorflowasr_tpu.cli.serve_model import build_chunk_stream_ops
    from tensorflowasr_tpu.cli.train_asr import main as train_main

    sr = 16000
    lines = []
    for i, txt in enumerate(["ni3 hao3", "shi4 jie4"]):
        p = tmp_path / f"u{i}.wav"
        write_wav(str(p), _sine(200 + 40 * i, 1.0, sr), sr)
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
            "wav_max_duration": 2,
            "train_list": str(tmp_path / "train.list"),
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
                           "save_interval_steps": 2,
                           "outdir": str(tmp_path / "logs")},
    }
    stack = dict(dmodel=16, head_size=8, num_heads=2, kernel_size=4,
                 fc_factor=0.5, dropout=0.0, win_front=6)
    model_cfg = {"model_config": {
        "name": "ChunkConformer",
        "ChunkConformerFront": {"dmodel": 16, "reduction_factor": 4,
                                "sample_rate": sr, "n_mels": 20,
                                "stride_ms": 10, "chunk_num": 16},
        "ChunkConformerEncoder": {**stack, "num_blocks": 1, "win_back": 0},
        "ChunkCTCPicker": {**stack, "num_blocks": 1, "win_back": 0},
        "ChunkCTCDecoder": {**stack, "num_blocks": 1, "win_back": 2},
        "ContextHelper": {**stack, "num_blocks": 1, "win_back": 0},
    }}
    dp, mp = tmp_path / "d.yml", tmp_path / "m.yml"
    dp.write_text(yaml.dump(data_cfg))
    mp.write_text(yaml.dump(model_cfg))

    rc = train_main(["--data_config", str(dp), "--model_config", str(mp),
                     "--total_steps", "2", "--compute_dtype", "float32"])
    assert rc == 0

    ops, front = build_chunk_stream_ops(str(dp), str(mp), n_slots=2,
                                        max_wait_ms=2.0)
    try:
        info = ops["stream_info"]()
        cs = int(info[0])
        assert int(info[2]) == 2
        wav = _sine(220, 1.0, sr)

        def run_once():
            slot = ops["stream_open"]()
            sid = np.asarray([int(slot[0])], np.int32)
            for off in range(0, len(wav), cs):
                ops["stream_feed"](sid, wav[off:off + cs])
            ph, ch = ops["stream_close"](sid)
            return list(ph), list(ch)

        first = run_once()
        second = run_once()      # slot reuse must decode identically
        assert first == second
    finally:
        front.shutdown()
