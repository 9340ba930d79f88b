"""Train + eval the REFERENCE framework (Z-yq/TensorflowASR, read-only at
/root/reference) on the shared synthetic corpus — one side of the
head-to-head CER comparison (see README.md here; the other side is
run_ours.py).

Drives the reference's own classes as a library (AM_DataLoader,
CTCTrainer, AMTester — train_asr.py mode-1 flow) with its config-file
format; nothing in the reference checkout is modified. The absent deps
(pypinyin/librosa/...) are provided by thin shims in ./shims so the
reference consumes EXACTLY the same wav files, list files, vocab files,
and phone token sequences as our framework.

Usage:
  python examples/headtohead/run_reference.py \
      --work_dir /tmp/h2h_work --out_dir /tmp/h2h_ref \
      --total_steps 3000 --batch 16
Writes <out_dir>/result.json with phone/char CER + SER.
"""

import argparse
import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))


def _augments_yaml(args):
    """Shared augmenter block: additive file-noise + signal masking (the
    two augmenters whose implementations are semantically identical on
    both frameworks — pure numpy/scipy, no librosa.effects), activated by
    --augment with the same parameters both sides.  The reference draws
    an extra batch//4 augmented samples per batch when any augmenter is
    active (am_dataloader.py:330-391); ours mirrors that draw."""
    aug = bool(args.augment)
    noise = aug and args.noise_list is not None
    return (f"  noise: {{active: {noise}, sample_rate: 16000, "
            f"SNR: [8, 30], noises: '{args.noise_list or ''}'}}\n"
            f"  masking: {{active: {aug}, zone: '(0.1,0.9)', "
            f"mask_ratio: 0.3, mask_with_noise: False}}\n"
            "  pitch: {active: False}\n"
            "  speed: {active: False}\n"
            "  rir: {active: False}\n"
            "  hz: {active: False}\n"
            "  vc: {active: False}\n"
            "  spec_aug: {active: False}")


def write_configs(args):
    data_yml = os.path.join(args.out_dir, "ref_data.yml")
    model_yml = os.path.join(args.out_dir, "ref_model.yml")
    n_train = sum(1 for _ in open(os.path.join(args.work_dir,
                                               "train.list")))
    steps_per_epoch = max(1, n_train // args.batch)
    num_epochs = max(1, -(-args.total_steps // steps_per_epoch))  # ceil
    data = f"""
speech_config:
  mel_layer_type: Melspectrogram
  mel_layer_trainable: False
  add_wav_info: False
  sample_rate: 16000
  frame_ms: 25
  stride_ms: 10
  num_feature_bins: 80
  reduction_factor: 4
  train_list: '{args.work_dir}/train.list'
  eval_list: '{args.work_dir}/{args.eval_list}'
  wav_max_duration: {args.wav_max_duration}
  only_chinese: True
  streaming: {args.streaming}
  streaming_bucket: {args.streaming_bucket}

inp_config:
  vocabulary: '{args.work_dir}/phones.txt'
  blank_at_zero: False
  beam_width: 1
tar_config:
  vocabulary: '{args.work_dir}/chars.txt'
  blank_at_zero: False
  beam_width: 1

augments_config:
{_augments_yaml(args)}

optimizer_config:
  lr: {args.lr}
  warmup_steps: 10000
  beta1: 0.9
  beta2: 0.98
  epsilon: 0.000001

running_config:
  batch_size: {args.batch}
  train_steps_per_batches: 10
  eval_steps_per_batches: 10
  num_epochs: {num_epochs}
  outdir: '{args.out_dir}/logs'
  log_interval_steps: 100
  eval_interval_steps: 100000
  save_interval_steps: {min(500, args.total_steps)}
"""
    model = f"""
model_config:
  name: OfflineConformerCTC
  dmodel: {args.dmodel}
  reduction_factor: 4
  num_blocks: {args.num_blocks}
  head_size: {args.head_size}
  num_heads: {args.num_heads}
  kernel_size: {args.kernel_size}
  fc_factor: 0.5
  dropout: {args.dropout}

  ctcdecoder_num_blocks: 1
  ctcdecoder_kernel_size: {args.kernel_size}
  ctcdecoder_fc_factor: 0.5
  ctcdecoder_dropout: {args.dropout}

  translator_num_blocks: 1
  translator_kernel_size: {args.kernel_size}
  translator_fc_factor: 0.5
  translator_dropout: {args.dropout}
"""
    with open(data_yml, "w") as f:
        f.write(data)
    with open(model_yml, "w") as f:
        f.write(model)
    return data_yml, model_yml


def write_chunk_configs(args):
    """Config pair for the reference's mode-0 ChunkConformer flow
    (asr/configs/chunk_data.yml + chunk_conformerS.yml shapes, scaled to
    the matched head-to-head dims)."""
    data_yml = os.path.join(args.out_dir, "ref_chunk_data.yml")
    model_yml = os.path.join(args.out_dir, "ref_chunk_model.yml")
    data = f"""
speech_config:
  mel_layer_type: Melspectrogram
  mel_layer_trainable: False
  add_wav_info: False
  sample_rate: 16000
  frame_ms: 25
  stride_ms: 10
  num_feature_bins: 80
  reduction_factor: 4
  train_list: '{args.work_dir}/train.list'
  eval_list: '{args.work_dir}/{args.eval_list}'
  wav_max_duration: {args.wav_max_duration}
  only_chinese: True
  streaming: True
  streaming_bucket: 0.16
  pinyin_map: '{args.out_dir}/pinyin2phone_id.map'
  extra_txt_list: ""

inp_config:
  vocabulary: '{args.work_dir}/phones.txt'
  blank_at_zero: False
  beam_width: 1
tar_config:
  vocabulary: '{args.work_dir}/chars.txt'
  blank_at_zero: False
  beam_width: 1

augments_config:
  aug_ratio: {0.25 if args.augment else 0.0}
{_augments_yaml(args)}

optimizer_config:
  lr: {args.lr}
  beta1: 0.9
  beta2: 0.98
  epsilon: 0.000001

running_config:
  batch_size: {args.batch}
  num_epochs: 1
  outdir: '{args.out_dir}/logs'
"""
    stack = (f"dmodel: {args.dmodel}\n    head_size: {args.head_size}\n"
             f"    num_heads: {args.num_heads}\n"
             f"    kernel_size: {args.kernel_size}\n    fc_factor: 0.5\n"
             f"    dropout: {args.dropout}\n    win_front: 36\n")
    model = f"""
model_config:
  name: ChunkConformer
  ChunkConformerFront:
    dmodel: {args.dmodel}
    reduction_factor: 4
    dropout: {args.dropout}
    sample_rate: 16000
    n_mels: 80
    mel_layer_trainable: False
    stride_ms: 10
    chunk_num: 16
  ChunkConformerEncoder:
    {stack}    num_blocks: {args.num_blocks}
    win_back: 0
    name: "chunk_conformer_encoder"
    padding: "causal"
  ChunkCTCPicker:
    {stack}    num_blocks: 1
    num_classes: 0
    win_back: 0
    name: "chunk_ctc_picker"
  ChunkCTCDecoder:
    {stack}    num_blocks: 1
    num_classes: 0
    win_back: 8
    name: "chunk_ctc_decoder"
  ContextHelper:
    {stack}    num_blocks: 2
    num_classes: 0
    win_back: 0
    name: "helper"
"""
    with open(data_yml, "w") as f:
        f.write(data)
    with open(model_yml, "w") as f:
        f.write(model)
    return data_yml, model_yml


def run_chunk(args):
    """Train + eval the reference's ChunkConformer (train_asr.py mode-0
    Keras-fit flow). The reference's own chunk eval entry is broken as
    shipped (Chunk_DataLoader.generator unconditionally unpacks the
    10-field TRAIN batch, so the eval path's 6-field batches crash —
    chunk_dataloader.py:428-436); we drive chunk_tester.AMTester's
    _eval_step directly over generate(False) batches instead."""
    import numpy as np
    import tensorflow as tf
    from asr.dataloaders.chunk_dataloader import Chunk_DataLoader
    from asr.models.chunk_conformer_blocks import ChunkConformer
    from asr.tester import chunk_tester
    from augmentations.augments import Augmentation
    from utils.user_config import UserConfig

    # upstream bug 2: Chunk_DataLoader requires augments_config['aug_ratio']
    # (chunk_dataloader.py:30) but Augmentation.parse (augments.py:196-205)
    # raises on that very key — the shipped chunk_data.yml cannot construct
    # the loader. Strip it for parse only (in-memory; reference untouched).
    orig_parse = Augmentation.parse

    def parse_skipping_ratio(self, config):
        orig_parse(self, {k: v for k, v in (config or {}).items()
                          if k != "aug_ratio"})

    Augmentation.parse = parse_skipping_ratio

    # upstream bug 3: the chunk loader calls extract(tokens, True) for the
    # extra-text branch (chunk_dataloader.py:355-357) but
    # TextFeaturizer.extract(tokens) takes no flag (text_featurizers.py:80).
    # That extra-text branch is also the only caller that skips
    # check_valid, so drop OOV tokens instead of raising (the validated
    # main path never hits the filter).
    from utils import text_featurizers

    def extract_lenient(self, tokens, *_):
        return [self.token_to_index[t] for t in tokens
                if t in self.token_to_index]

    text_featurizers.TextFeaturizer.extract = extract_lenient

    # The pypinyin shim already answers in PHONE units (the offline
    # AM_DataLoader keeps them because it checks the phone VOCAB,
    # am_dataloader.py:69-75; the chunk loader instead routes through
    # pinyin_map, chunk_dataloader.py:76-95). Feed it the recipe map
    # augmented with identity rows so phone units map to themselves —
    # both frameworks then train on identical phone sequences.
    with open(os.path.join(args.work_dir, "pinyin2phone.map"),
              encoding="utf-8") as f:
        map_rows = f.read().rstrip("\n").split("\n")
    with open(os.path.join(args.work_dir, "phones.txt"),
              encoding="utf-8") as f:
        phone_tokens = [ln.strip() for ln in f if ln.strip()]
    with open(os.path.join(args.out_dir, "pinyin2phone_id.map"), "w",
              encoding="utf-8") as f:
        f.write("\n".join(map_rows) + "\n")
        for tok in phone_tokens:
            f.write(f"{tok}\t{tok}\n")

    data_yml, model_yml = write_chunk_configs(args)
    config = UserConfig(data_yml, model_yml)

    dg = Chunk_DataLoader(config)

    model = ChunkConformer(config, dg.phone_featurizer.num_classes,
                           dg.text_featurizer.num_classes)
    model.compile(optimizer=tf.keras.optimizers.Adam(
        learning_rate=args.lr, beta_1=0.9, beta_2=0.98, epsilon=1e-6))

    # Drive the model's own train_step directly: tf_keras 2.21's Sequence
    # adapter unpacks __getitem__'s (batch,) differently than the TF2.2-era
    # Keras this was written for, so fit() hands train_step a tensor where
    # it expects the 10-field sequence (chunk_conformer_blocks.py:1035).
    # Same math, explicit loop.
    # train_step divides metrics by the strategy's replica count; outside
    # fit() the attribute is unset
    model._distribution_strategy = tf.distribute.get_strategy()
    ckpt_dir = os.path.join(args.out_dir, "logs", "all-ckpt")
    os.makedirs(ckpt_dir, exist_ok=True)
    if args.eval_ckpt:
        # eval-only mode: score a previously saved snapshot (from
        # --save_every) — lets a long extended-budget run be harvested
        # at any milestone. Weights are loaded onto the TESTER's runner
        # below (tester.compile() loads latest_checkpoint; we override).
        eval_steps = args.total_steps
    else:
        step_fn = tf.function(lambda data: model.train_step((data,)),
                              reduce_retracing=True)
        for step in range(args.total_steps):
            batch = dg.generate(True)
            logs = step_fn(tuple(tf.constant(a) for a in batch))
            if step % 100 == 0 or step == args.total_steps - 1:
                print(f"step {step}: " + ", ".join(
                    f"{k}={float(v):.4f}" for k, v in logs.items()),
                    flush=True)
            if args.save_every and (step + 1) % args.save_every == 0:
                model.save_weights(
                    os.path.join(ckpt_dir, f"ckpt-step{step + 1}"))
        model.save_weights(os.path.join(ckpt_dir, "ckpt-final"))
        eval_steps = args.total_steps

    # re-read: Augmentation.parse mutates the shared config (pops
    # 'active') — see upstream bug 5 note in main()'s eval stage
    config = UserConfig(data_yml, model_yml)
    tester = chunk_tester.AMTester(config)
    tester.compile()
    if args.eval_ckpt:
        tester.runner.load_weights(args.eval_ckpt).expect_partial()
    dg_eval = Chunk_DataLoader(config, training=False)
    n_batches = max(1, -(-len(dg_eval.test_list) // args.batch))
    for _ in range(n_batches):
        b = dg_eval.generate(False)
        tester._eval_step(tuple(tf.constant(a) for a in b))

    result = {k: float(v.result().numpy())
              for k, v in tester.eval_metrics.items()}
    result["framework"] = "reference"
    result["model_family"] = "chunk"
    result["total_steps"] = eval_steps
    result["batch"] = args.batch
    result["params"] = int(sum(
        int(tf.size(w)) for w in
        (tester.runner if args.eval_ckpt else model).trainable_weights))
    out = os.path.join(args.out_dir, "result.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=2)
    print("RESULT " + json.dumps(result))
    return 0


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--work_dir", required=True,
                   help="prepare.py output (lists + vocabs + pinyin map)")
    p.add_argument("--corpus_lexicon", default=None,
                   help="char<TAB>pinyin TSV (default: "
                        "<work_dir>/../h2h_corpus/lexicon.tsv heuristics "
                        "off; pass explicitly)")
    p.add_argument("--out_dir", required=True)
    p.add_argument("--total_steps", type=int, default=3000)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--eval_list", default="test.list")
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--dmodel", type=int, default=64)
    p.add_argument("--num_blocks", type=int, default=4)
    p.add_argument("--head_size", type=int, default=16)
    p.add_argument("--num_heads", type=int, default=4)
    p.add_argument("--kernel_size", type=int, default=16)
    p.add_argument("--dropout", type=float, default=0.1)
    p.add_argument("--wav_max_duration", type=float, default=7.0)
    p.add_argument("--streaming", action="store_true",
                   help="train the reference's block-streaming family "
                        "(StreamingConformerCTC)")
    p.add_argument("--streaming_bucket", type=float, default=0.5)
    p.add_argument("--chunk", action="store_true",
                   help="train the reference's ChunkConformer family "
                        "(train_asr.py mode-0 Keras fit)")
    p.add_argument("--augment", action="store_true",
                   help="activate the shared noise+masking augmenters "
                        "(the reference's extra batch//4 draw)")
    p.add_argument("--noise_list", default=None,
                   help="noise wav list for the SignalNoise augmenter "
                        "(the corpus generator's noise.list)")
    p.add_argument("--save_every", type=int, default=0,
                   help="(chunk family) also save weights every N steps "
                        "so an extended run can be harvested mid-way")
    p.add_argument("--eval_ckpt", default=None,
                   help="(chunk family) skip training; load these saved "
                        "weights and eval (pass the step count as "
                        "--total_steps so the result is labeled right)")
    p.add_argument("--eval_only", action="store_true",
                   help="(offline/streaming) skip training; eval the "
                        "newest model_<step>.h5 snapshot in out_dir — "
                        "harvests a partially-completed leg")
    args = p.parse_args(argv)

    os.makedirs(args.out_dir, exist_ok=True)
    lex = args.corpus_lexicon
    if lex is None:
        raise SystemExit("--corpus_lexicon is required (the generator's "
                         "lexicon.tsv)")
    os.environ["HEADTOHEAD_LEXICON"] = lex
    os.environ["HEADTOHEAD_PINYIN_MAP"] = os.path.join(
        args.work_dir, "pinyin2phone.map")

    sys.path.insert(0, HERE)
    import refcompat
    refcompat.setup(os.path.join(HERE, "shims"))

    if args.chunk:
        return run_chunk(args)

    import tensorflow as tf
    from asr.dataloaders.am_dataloader import AM_DataLoader
    from asr.trainer import ctc_runners
    from asr.tester import am_tester
    from utils.user_config import UserConfig

    data_yml, model_yml = write_configs(args)
    config = UserConfig(data_yml, model_yml)

    if not args.eval_only:
        # ---- train (reference train_asr.py AM_Trainer mode-1 flow) ----
        dg = AM_DataLoader(config)
        runner = ctc_runners.CTCTrainer(config)
        runner.set_total_train_steps(args.total_steps)
        runner.compile()
        dg.batch = runner.global_batch_size

        option = tf.data.Options()
        option.experimental_distribute.auto_shard_policy = \
            tf.data.experimental.AutoShardPolicy.DATA
        train_ds = tf.data.Dataset.from_generator(
            dg.generator, dg.return_data_types(), dg.return_data_shape(),
            args=(True,)).with_options(option)
        eval_ds = tf.data.Dataset.from_generator(
            dg.generator, dg.return_data_types(), dg.return_data_shape(),
            args=(False,)).with_options(option)
        runner.set_datasets(train_ds, eval_ds)
        while 1:
            runner.fit(epoch=dg.epochs)
            if runner._finished():
                runner.save_checkpoint()
                break

    # ---- eval (reference eval_am.py flow, test split) ----
    # upstream bug 5: Augmentation.parse MUTATES the config (pops
    # 'active', augments.py:207-210), so constructing a second loader
    # from the same UserConfig crashes with KeyError when any augmenter
    # is on. Re-read the config files for the eval stage.
    config = UserConfig(data_yml, model_yml)
    dg_eval = AM_DataLoader(config, training=False)
    tester = am_tester.AMTester(config)
    tester.set_progbar(dg_eval.eval_per_epoch_steps())
    tester.set_all_steps(dg_eval.eval_per_epoch_steps())
    tester.compile()
    test_ds = tf.data.Dataset.from_generator(
        dg_eval.generator, dg_eval.return_data_types(),
        dg_eval.return_data_shape(), args=(False,))
    tester.set_datasets(test_ds)
    tester.run()

    result = {k: float(v.result().numpy())
              for k, v in tester.eval_metrics.items()}
    result["framework"] = "reference"
    result["model_family"] = "streaming" if args.streaming else "offline"
    steps_done = args.total_steps
    if args.eval_only:
        # label the result with the step of the snapshot the tester
        # actually loaded (newest model_<step>.h5 under out_dir)
        snaps = []
        for root, _dirs, files in os.walk(args.out_dir):
            for fn in files:
                if fn.startswith("model_") and fn.endswith(".h5"):
                    try:
                        snaps.append(int(fn[len("model_"):-len(".h5")]))
                    except ValueError:
                        pass
        if snaps:
            steps_done = max(snaps)
    result["total_steps"] = steps_done
    result["batch"] = args.batch
    result["params"] = int(sum(
        int(tf.size(w)) for m in (tester.encoder, tester.ctc_model,
                                  tester.translator)
        for w in m.trainable_weights))
    out = os.path.join(args.out_dir, "result.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=2)
    print("RESULT " + json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
