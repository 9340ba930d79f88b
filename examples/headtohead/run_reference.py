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
  noise: {{active: False}}
  masking: {{active: False}}
  pitch: {{active: False}}
  speed: {{active: False}}
  rir: {{active: False}}
  hz: {{active: False}}
  vc: {{active: False}}
  spec_aug: {{active: False}}

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

    import tensorflow as tf
    from asr.dataloaders.am_dataloader import AM_DataLoader
    from asr.trainer import ctc_runners
    from asr.tester import am_tester
    from utils.user_config import UserConfig

    data_yml, model_yml = write_configs(args)
    config = UserConfig(data_yml, model_yml)

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
    result["total_steps"] = args.total_steps
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
