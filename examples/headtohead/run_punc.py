"""Head-to-head punctuation restoration: the reference's PuncTransformer
(its own Punc_DataLoader + PuncTrainer, keras-bert teacher shimmed to the
shared deterministic pseudo-teacher, see pseudo_bert.py) vs our
PuncTransformer (train_punc with the SAME precomputed teacher features),
on an identical synthetic rule corpus, scored with ONE metric
implementation on identical eval batches.

Corpus rule (learnable, with context dependence): sentences over the
h2h hanzi set; '，' closes a clause whose length depends on its first
character's class, '。' ends declaratives, '？' ends sentences opening
with a question-class character.

Usage:
  python examples/headtohead/run_punc.py --out_dir /tmp/h2h4_punc \
      --total_steps 3000 --batch 32
Writes <out_dir>/result.json with masked punc accuracy for both.
"""

import argparse
import json
import os
import subprocess
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(os.path.dirname(HERE))
sys.path.insert(0, HERE)


def gen_corpus(out_dir, n_chars=300, n_train=4000, n_test=400, seed=11):
    rng = np.random.default_rng(seed)
    chars = [chr(0x4E00 + i) for i in range(n_chars)]
    q_set = set(chars[:n_chars // 10])          # question openers
    short_set = set(chars[: n_chars // 2])      # class -> clause length

    def line():
        n_cl = int(rng.integers(2, 5))
        first = chars[int(rng.integers(n_chars))]
        out = []
        for _ in range(n_cl):
            L = int(rng.integers(3, 6)) if out and out[0][0] in short_set \
                else int(rng.integers(5, 9))
            cl = [chars[int(rng.integers(n_chars))] for _ in range(L)]
            if not out:
                cl[0] = first
            out.append("".join(cl))
        end = "？" if first in q_set else "。"
        return "，".join(out) + end

    tr = os.path.join(out_dir, "punc_train.list")
    te = os.path.join(out_dir, "punc_test.list")
    with open(tr, "w", encoding="utf-8") as f:
        f.write("\n".join(line() for _ in range(n_train)) + "\n")
    with open(te, "w", encoding="utf-8") as f:
        f.write("\n".join(line() for _ in range(n_test)) + "\n")

    # vocab files in the reference dict layout (lm_tokens_*.txt: <S>,
    # </S>, then tokens; blank_at_zero True puts the blank at id 0)
    cv = os.path.join(out_dir, "punc_chars.txt")
    bv = os.path.join(out_dir, "punc_bd.txt")
    with open(cv, "w", encoding="utf-8") as f:
        f.write("\n".join(["<S>", "</S>"] + chars) + "\n")
    with open(bv, "w", encoding="utf-8") as f:
        f.write("\n".join(["<S>", "</S>", "，", "。", "？"]) + "\n")

    # pseudo-BERT vocab + config (shared teacher id space)
    bert_vocab = os.path.join(out_dir, "bert_vocab.txt")
    with open(bert_vocab, "w", encoding="utf-8") as f:
        f.write("\n".join(["[PAD]", "[UNK]", "[CLS]", "[SEP]"] + chars)
                + "\n")
    bert_cfg = os.path.join(out_dir, "bert_config.json")
    with open(bert_cfg, "w") as f:
        json.dump({"vocab_size": 4 + len(chars)}, f)
    return tr, te, cv, bv, bert_vocab, bert_cfg


def config_yaml(args, tr, te, cv, bv, outdir, bert=None):
    bert_s = ""
    if bert:
        bert_s = (f"bert:\n  config_json: '{bert[1]}'\n"
                  f"  bert_ckpt: '/nonexistent'\n"
                  f"  bert_vocab: '{bert[0]}'\n")
    return f"""
punc_vocab:
  model_type: 'LM'
  vocabulary: '{cv}'
  blank_at_zero: True
  beam_width: 1
punc_biaodian:
  model_type: 'LM'
  vocabulary: '{bv}'
  blank_at_zero: True
  beam_width: 1

optimizer_config:
  learning_rate: {args.lr}
  lr: {args.lr}
  beta_1: 0.9
  beta1: 0.9
  beta_2: 0.98
  beta2: 0.98
  epsilon: 0.000001

running_config:
  train_list: '{tr}'
  eval_list: '{te}'
  batch_size: {args.batch}
  train_steps_per_batches: 10
  eval_steps_per_batches: 10
  num_epochs: 10000
  outdir: '{outdir}'
  log_interval_steps: 100
  eval_interval_steps: 1000000
  save_interval_steps: {min(500, args.total_steps)}
  max_len: 64

{bert_s}
model_config:
  name: PuncTransformer
  num_layers: {args.num_layers}
  d_model: {args.d_model}
  enc_embedding_dim: {args.d_model}
  num_heads: {args.num_heads}
  dff: {args.dff}
  pe_input: 1024
  rate: 0.1
"""


def run_ours(args, tr, te, cv, bv, feats_dir):
    out = os.path.join(args.out_dir, "ours")
    os.makedirs(out, exist_ok=True)
    yml = os.path.join(out, "punc.yml")
    with open(yml, "w") as f:
        f.write(config_yaml(args, tr, te, cv, bv,
                            os.path.join(out, "logs")))
    # CPU-pinned after jax import (env JAX_PLATFORMS is overridden by
    # the axon site hook); the tiny punc transformer trains fine on CPU
    script = os.path.join(REPO, "train_punc.py")
    argv = ["--data_config", yml, "--model_config", yml,
            "--total_steps", str(args.total_steps),
            "--bert_feature_dir", feats_dir]
    subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms', 'cpu'); "
         "import runpy, sys; "
         f"sys.argv = [{script!r}] + {argv!r}; "
         f"runpy.run_path({script!r}, run_name='__main__')"],
        check=True, cwd=REPO)
    return yml


def train_reference(args, tr, te, cv, bv, bert_vocab, bert_cfg):
    import refcompat

    refcompat.setup(os.path.join(HERE, "shims"))
    import tensorflow as tf
    from punc_recover.dataloaders.punc_dataloader import Punc_DataLoader
    from punc_recover.trainer import punc_trainer
    from utils.user_config import UserConfig

    # upstream bug 4: Punc_DataLoader.__init__ calls init_all() ->
    # get_sentence() which reads self.running_config BEFORE __init__
    # assigns it (punc_dataloader.py:12-14 vs :87) — the shipped loader
    # cannot construct. Assign it first (in-memory; reference untouched).
    if not getattr(Punc_DataLoader, "_h2h_patched", False):
        orig_init_all = Punc_DataLoader.init_all

        def init_all_with_rc(self, config):
            self.running_config = config["running_config"]
            orig_init_all(self, config)

        Punc_DataLoader.init_all = init_all_with_rc
        Punc_DataLoader._h2h_patched = True

    out = os.path.join(args.out_dir, "reference")
    os.makedirs(os.path.join(out, "logs"), exist_ok=True)
    yml = os.path.join(out, "punc.yml")
    with open(yml, "w") as f:
        f.write(config_yaml(args, tr, te, cv, bv,
                            os.path.join(out, "logs"),
                            bert=(bert_vocab, bert_cfg)))
    config = UserConfig(yml, yml)
    dg = Punc_DataLoader(config)
    runner = punc_trainer.PuncTrainer(config)
    runner.set_total_train_steps(args.total_steps)
    runner.compile()
    option = tf.data.Options()
    option.experimental_distribute.auto_shard_policy = \
        tf.data.experimental.AutoShardPolicy.DATA
    train_ds = tf.data.Dataset.from_generator(
        dg.generator, dg.return_data_types(), dg.return_data_shape(),
        args=(True,)).with_options(option)
    eval_ds = tf.data.Dataset.from_generator(
        dg.eval_generator, dg.eval_return_data_types(),
        dg.eval_return_data_shape()).with_options(option)
    runner.set_datasets(train_ds, eval_ds)
    while 1:
        runner.fit(epoch=dg.epochs)
        if runner._finished():
            runner.save_checkpoint()
            break
    return runner.model, config


def shared_eval(args, ref_model, ours_yml, ref_config):
    """Identical eval batches from the REFERENCE's eval generator (both
    frameworks read the same vocab files, blank_at_zero=True, so the id
    spaces coincide); ONE masked-accuracy implementation for both."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import tensorflow as tf
    from punc_recover.dataloaders.punc_dataloader import Punc_DataLoader

    sys.path.insert(0, REPO)
    from tensorflowasr_tpu.cli.common import build_punc_model, \
        restore_or_warn
    from tensorflowasr_tpu.utils.config import UserConfig

    config = UserConfig(ours_yml, ours_yml)
    _, _, model, state = build_punc_model(config)
    state = restore_or_warn(
        state, config.section("running_config")["outdir"], "punctuation")

    # training=True so the loader carries BOTH lists: its eval_generate
    # pads lines <30 chars with a random train line (punc_dataloader.py:
    # 264-267) and would crash without train_list; the pseudo-BERT init
    # is shimmed and cheap
    dg = Punc_DataLoader(ref_config, training=True)

    def masked_acc(labels, pred_ids):
        mask = labels != 0
        return (float(((labels == pred_ids) & mask).sum()),
                float(mask.sum()))

    hits = {"ours": 0.0, "reference": 0.0}
    total = 0.0
    n_batches = max(1, len(dg.test_list) // args.batch)
    for _ in range(n_batches):
        x, labels = dg.eval_generate()
        x = np.asarray(x)
        labels = np.asarray(labels)
        # reference: its tester's inference path (punc_tester.py:27-38)
        mask = tf.cast(tf.equal(x, 0), tf.float32)[:, None, None, :]
        pred = ref_model.inference(tf.constant(x), mask)
        h, t = masked_acc(labels, np.argmax(np.asarray(pred), -1))
        hits["reference"] += h
        total += t
        logits, _ = model.apply({"params": state.params}, jnp.asarray(x))
        h, _ = masked_acc(labels, np.argmax(np.asarray(logits), -1))
        hits["ours"] += h
    return {"punc_acc_ours": hits["ours"] / max(total, 1),
            "punc_acc_reference": hits["reference"] / max(total, 1),
            "eval_positions": int(total)}


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out_dir", required=True)
    p.add_argument("--total_steps", type=int, default=3000)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--num_layers", type=int, default=3)
    p.add_argument("--d_model", type=int, default=64)
    p.add_argument("--num_heads", type=int, default=8)
    p.add_argument("--dff", type=int, default=64)
    p.add_argument("--n_chars", type=int, default=300)
    args = p.parse_args(argv)

    os.makedirs(args.out_dir, exist_ok=True)
    tr, te, cv, bv, bert_vocab, bert_cfg = gen_corpus(
        args.out_dir, n_chars=args.n_chars)

    # shared teacher features for OUR side (same matrix the shimmed
    # keras_bert serves to the reference)
    import pseudo_bert

    feats_dir = os.path.join(args.out_dir, "bert_feats")
    lines = [ln for path in (tr, te)
             for ln in open(path, encoding="utf-8")]
    pseudo_bert.write_features_for_ours(lines, bert_vocab,
                                        ["，", "。", "？"], feats_dir)

    ours_yml = run_ours(args, tr, te, cv, bv, feats_dir)
    ref_model, ref_config = train_reference(args, tr, te, cv, bv,
                                            bert_vocab, bert_cfg)
    result = shared_eval(args, ref_model, ours_yml, ref_config)
    result.update(task="punc", total_steps=args.total_steps,
                  batch=args.batch)
    with open(os.path.join(args.out_dir, "result.json"), "w") as f:
        json.dump(result, f, indent=2)
    print("RESULT " + json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
