"""Input-pipeline parallelism: PrefetchIterator semantics, parallel wav
loading, prefetching generator equivalence."""

import time

import numpy as np
import pytest

from tensorflowasr_tpu.data.prefetch import PrefetchIterator, parallel_map


def test_parallel_map_ordered():
    out = parallel_map(lambda x: x * x, list(range(20)), num_workers=4)
    assert out == [x * x for x in range(20)]


def test_prefetch_iterator_overlaps_and_propagates_errors():
    calls = []

    def slow_producer():
        calls.append(time.perf_counter())
        time.sleep(0.05)
        return len(calls)

    it = PrefetchIterator(slow_producer, depth=3, num_workers=2)
    first = next(it)
    assert isinstance(first, int)
    # background workers should have queued more while we slept
    time.sleep(0.3)
    assert it._queue.qsize() >= 2
    it.close()

    def failing_producer():
        raise ValueError("boom")

    it2 = PrefetchIterator(failing_producer, depth=2, num_workers=1)
    with pytest.raises(ValueError, match="boom"):
        next(it2)
    it2.close()


def test_am_loader_parallel_matches_serial(tmp_path):
    from tests.test_data import _featurizers, _sine
    from tensorflowasr_tpu.data.am_dataloader import AMDataLoader
    from tensorflowasr_tpu.utils.audio import write_wav

    sr = 16000
    lines = []
    for i, txt in enumerate(["ni3 hao3", "shi4 jie4", "ni3 shi4",
                             "hao3 jie4"]):
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
    p2p = {"ni3": ["n", "i3"], "hao3": ["h", "ao3"],
           "shi4": ["sh", "i4"], "jie4": ["j", "ie4"]}
    config = {
        "speech_config": {"sample_rate": sr, "stride_ms": 10,
                          "reduction_factor": 4, "wav_max_duration": 2},
        "running_config": {"train_list": str(tmp_path / "train.list"),
                           "eval_list": str(tmp_path / "train.list"),
                           "batch_size": 4},
        "augments_config": None,
    }

    def mk():
        return AMDataLoader(config, *_featurizers(tmp_path / "phones.txt",
                                                  tmp_path / "chars.txt"),
                            pinyin2phone=p2p, transcripts_are_pinyin=True,
                            bucket_seconds=(2.0,))

    serial = mk().generate(train=False)
    parallel = mk().generate(train=False, num_workers=4)
    for k in serial:
        np.testing.assert_array_equal(serial[k], parallel[k])

    # prefetching generator yields valid batches
    dl = mk()
    it = dl.generator(train=True, num_workers=2, prefetch_depth=2)
    b1 = next(it)
    b2 = next(it)
    assert b1["wav"].shape == b2["wav"].shape
    it.close()


def _sine(freq, seconds, sr=16000):
    t = np.arange(int(sr * seconds)) / sr
    return (0.3 * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def test_mp_batch_iterator_end_to_end(tmp_path):
    """Process-based batch production: spawn workers build their own
    sharded AMDataLoader from the YAML pair and stream valid batches."""
    import yaml

    from tensorflowasr_tpu.cli.common import am_batch_stream
    from tensorflowasr_tpu.data.mp_prefetch import MPBatchIterator
    from tensorflowasr_tpu.utils.audio import write_wav

    sr = 16000
    texts = ["ni3 hao3", "shi4 jie4", "ni3 shi4", "hao3 jie4"]
    lines = []
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
            "wav_max_duration": 2,
            "train_list": str(tmp_path / "train.list"),
            "eval_list": str(tmp_path / "train.list"),
            "pinyin_map": str(tmp_path / "p2p.map"),
            "transcripts_are_pinyin": True,
            "bucket_seconds": [1.5, 2.0],
        },
        "inp_config": {"vocabulary": str(tmp_path / "phones.txt"),
                       "blank_at_zero": False},
        "tar_config": {"vocabulary": str(tmp_path / "chars.txt"),
                       "blank_at_zero": False},
        "augments_config": None,
        "running_config": {"batch_size": 2},
    }
    model_cfg = {"model_config": {"name": "OfflineConformerCTC"}}
    dp, mp_ = tmp_path / "data.yml", tmp_path / "model.yml"
    dp.write_text(yaml.dump(data_cfg), encoding="utf-8")
    mp_.write_text(yaml.dump(model_cfg), encoding="utf-8")

    import functools

    it = MPBatchIterator(
        functools.partial(am_batch_stream, str(dp), str(mp_), True, 1),
        num_workers=2, depth=2)
    try:
        for _ in range(3):
            b = next(it)
            assert b["wav"].shape[0] == 2
            # bucket_seconds override honored: 1s utts land in the 1.5s
            # bucket, quantized to the reduction quantum
            assert b["wav"].shape[1] <= int(1.5 * sr) + 640
            assert np.all(b["phone_length"] == 4)  # 2 pinyin x (initial+final)
    finally:
        it.close()


def test_mp_batch_iterator_forwards_worker_errors():
    import functools

    from tensorflowasr_tpu.cli.common import am_batch_stream
    from tensorflowasr_tpu.data.mp_prefetch import MPBatchIterator

    it = MPBatchIterator(
        functools.partial(am_batch_stream, "/nonexistent/data.yml",
                          "/nonexistent/model.yml", True, 1),
        num_workers=1, depth=1)
    try:
        with pytest.raises(RuntimeError):
            next(it)
    finally:
        it.close()
