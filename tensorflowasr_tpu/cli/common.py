"""Shared CLI plumbing: config loading + featurizer/dataloader wiring."""

from __future__ import annotations

import argparse
import logging
from typing import Optional, Tuple

from tensorflowasr_tpu.utils.config import UserConfig
from tensorflowasr_tpu.utils.text import (
    PinyinConverter,
    TextFeaturizer,
    load_pinyin2phone,
)


def config_parser(description: str,
                  model_required: bool = True) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=description)
    p.add_argument("--data_config", required=True,
                   help="data YAML (speech/augments/running config)")
    p.add_argument("--model_config", required=model_required,
                   help="model YAML (model_config section)" +
                        ("" if model_required
                         else "; optional — defaults to the data YAML"))
    p.add_argument("--total_steps", type=int, default=10000)
    p.add_argument("--data_workers", type=int, default=4,
                   help="host threads for wav loading (reference: "
                        "fit(workers=10)); prefetch runs when > 0")
    p.add_argument("--data_procs", type=int, default=0,
                   help="batch-producer PROCESSES (the reference's "
                        "use_multiprocessing=True); each owns a train-list "
                        "shard. 0 = threads only. Use when batch prep, not "
                        "the device, limits steps/s")
    p.add_argument("--compute_dtype", default="bfloat16",
                   choices=["float32", "bfloat16"])
    p.add_argument("--log_level", default="INFO")
    return p


def load_config(args) -> UserConfig:
    import os

    logging.basicConfig(
        level=getattr(logging, args.log_level.upper(), logging.INFO),
        format="%(asctime)s %(name)s %(levelname)s %(message)s")
    # persistent XLA compile cache: full-size programs take 30 s - 4 min
    # each over a tunneled TPU; restarts/resumes skip recompiling every
    # bucket shape. jax.config.update (not env vars: jax snapshots the
    # environment at import, which happens before any CLI code runs)
    if not os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        import jax

        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/tasr_xla"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    return UserConfig(args.data_config, args.model_config)


def restore_or_warn(state, outdir: Optional[str], what: str):
    """Restore the newest checkpoint under ``outdir``/checkpoints into
    ``state``; warn on stderr when none exists (evaluating random init)."""
    import os
    import sys

    if outdir:
        from tensorflowasr_tpu.train.checkpoint import CheckpointManager

        ckdir = os.path.join(outdir, "checkpoints")
        if os.path.isdir(ckdir):
            restored = CheckpointManager(ckdir).restore_latest(state)
            if restored is not None:
                return restored
    print(f"warning: no {what} checkpoint found under "
          f"{outdir or '(no outdir)'}; using random init", file=sys.stderr)
    return state


def build_vad_model(config: UserConfig):
    """(model, example-initialized ASRTrainState) from config sections —
    shared by train_vad / eval_vad / serve_model."""
    import jax
    import jax.numpy as jnp

    from tensorflowasr_tpu.models.vad import OfflineVAD, OnlineVAD
    from tensorflowasr_tpu.train.state import ASRTrainState, make_optimizer

    sc = config.section("speech_config")
    mc = config.section("model_config")
    cls = OnlineVAD if (mc["name"] or "CNN_Online_VAD") == "CNN_Online_VAD" \
        else OfflineVAD
    frame_input = sc["frame_input"] or 80
    model = cls(dmodel=mc["dmodel"] or 32, frame_input=frame_input)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 10, frame_input), jnp.float32))
    state = ASRTrainState.create(
        apply_fn=model.apply, params=variables["params"],
        tx=make_optimizer(config.section("optimizer_config").data))
    return model, state


def build_punc_model(config: UserConfig):
    """(char featurizer, punc dataloader, model, ASRTrainState) — shared
    by train_punc / eval_punc."""
    import jax
    import jax.numpy as jnp

    from tensorflowasr_tpu.data.punc_dataloader import PuncDataLoader
    from tensorflowasr_tpu.models.punc import PuncConfig, PuncTransformer
    from tensorflowasr_tpu.train.state import ASRTrainState, make_optimizer
    from tensorflowasr_tpu.utils.text import TextFeaturizer

    char_f = TextFeaturizer(dict(config.section("punc_vocab").data.items()))
    bd_vocab_path = config.section("punc_biaodian")["vocabulary"]
    punc_tokens = []
    if bd_vocab_path:
        bd_f = TextFeaturizer({"vocabulary": bd_vocab_path,
                               "blank_at_zero": True})
        punc_tokens = [t for t in bd_f.vocab_array
                       if t not in ("<S>", "</S>")]
    punc_cfg = PuncConfig.from_user_config(config)
    rc = config.section("running_config")
    max_len = min(int(rc["max_len"] or 64), punc_cfg.pe_input)
    dl = PuncDataLoader(config, char_f, punc_tokens, max_len=max_len)
    model = PuncTransformer(punc_cfg,
                            char_f.num_classes, dl.num_punc_classes)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.ones((1, 8), jnp.int32))
    state = ASRTrainState.create(
        apply_fn=model.apply, params=variables["params"],
        tx=make_optimizer(config.section("optimizer_config").data))
    return char_f, dl, model, state


def build_featurizers(config: UserConfig
                      ) -> Tuple[TextFeaturizer, TextFeaturizer, dict,
                                 Optional[PinyinConverter], bool]:
    """-> (phone featurizer, char featurizer, pinyin2phone map,
    pinyin converter, transcripts_are_pinyin)."""
    phone_f = TextFeaturizer(dict(config.section("inp_config").data))
    char_f = TextFeaturizer(dict(config.section("tar_config").data))
    sc = config.section("speech_config")
    p2p_path = sc["pinyin_map"]
    p2p = load_pinyin2phone(p2p_path) if p2p_path else {}
    transcripts_are_pinyin = bool(sc["transcripts_are_pinyin"])
    pin = None
    if not transcripts_are_pinyin:
        pin = PinyinConverter(lexicon_path=sc["pinyin_lexicon"])
        if not pin.available:
            logging.warning(
                "no hanzi->pinyin backend (install pypinyin or set "
                "speech_config.pinyin_lexicon); assuming transcripts are "
                "already space-separated pinyin")
            transcripts_are_pinyin = True
            pin = None
    return phone_f, char_f, p2p, pin, transcripts_are_pinyin


# -- module-level batch streams (picklable for data.mp_prefetch) -----------

def am_batch_stream(data_config: str, model_config: str, train: bool = True,
                    sample_workers: int = 4, worker_id: int = 0,
                    num_workers: int = 1):
    """Build an AMDataLoader in THIS process over the worker's train-list
    shard and yield packed batches forever. Top-level so
    ``functools.partial(am_batch_stream, data_yml, model_yml)`` pickles
    into data.mp_prefetch.MPBatchIterator's spawn workers."""
    from tensorflowasr_tpu.data.am_dataloader import AMDataLoader

    config = UserConfig(data_config, model_config)
    phone_f, char_f, p2p, pin, pinyin_txt = build_featurizers(config)
    dl = AMDataLoader(config, phone_f, char_f, pinyin2phone=p2p, pinyin=pin,
                      transcripts_are_pinyin=pinyin_txt, seed=worker_id)
    if num_workers > 1 and train and len(dl.train_list) >= num_workers:
        dl.train_list = dl.train_list[worker_id::num_workers]
    while True:
        yield dl.generate(train=train, num_workers=sample_workers)


def chunk_batch_stream(data_config: str, model_config: str,
                       train: bool = True, sample_workers: int = 4,
                       worker_id: int = 0, num_workers: int = 1):
    """ChunkDataLoader counterpart of :func:`am_batch_stream`."""
    from tensorflowasr_tpu.data.chunk_dataloader import ChunkDataLoader

    config = UserConfig(data_config, model_config)
    phone_f, char_f, p2p, pin, pinyin_txt = build_featurizers(config)
    chunk_num = ((config["model_config"] or {})
                 .get("ChunkConformerFront") or {}).get("chunk_num", 16)
    dl = ChunkDataLoader(config, phone_f, char_f, chunk_num=chunk_num,
                         pinyin2phone=p2p, pinyin=pin,
                         transcripts_are_pinyin=pinyin_txt, seed=worker_id)
    if num_workers > 1 and train and len(dl.train_list) >= num_workers:
        dl.train_list = dl.train_list[worker_id::num_workers]
    while True:
        yield dl.generate(train=train, num_workers=sample_workers)


def make_train_iter(args, thread_iter_fn, stream_fn):
    """Choose the train-batch iterator: ``--data_procs`` > 0 spawns
    process workers via MPBatchIterator, else the loader's own
    thread-prefetch generator (``thread_iter_fn()``)."""
    if getattr(args, "data_procs", 0) and args.data_procs > 0:
        import functools

        from tensorflowasr_tpu.data.mp_prefetch import MPBatchIterator

        factory = functools.partial(
            stream_fn, args.data_config, args.model_config, True,
            max(1, args.data_workers // max(1, args.data_procs)))
        return MPBatchIterator(factory, num_workers=args.data_procs,
                               depth=2 * args.data_procs)
    return thread_iter_fn()
