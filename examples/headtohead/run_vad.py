"""Head-to-head VAD: train the reference's CNN_Online_VAD through its own
VADTrainer AND our OnlineVAD through train_vad, on the SAME wav corpus,
then score BOTH on identical eval batches (frame accuracy + F1).

The VAD task is self-supervised: both dataloaders derive frame labels
from the identical energy rule (librosa.effects.split(top_db=20,
frame_length=800, hop_length=80); the shim delegates the reference's
librosa call to our effects_split so the rule is bit-identical).

Usage:
  python examples/headtohead/run_vad.py --corpus /tmp/h2h4_corpus \
      --out_dir /tmp/h2h4_vad --total_steps 1500 --batch 4
Writes <out_dir>/result.json with acc/F1 for both frameworks.
"""

import argparse
import glob
import json
import os
import subprocess
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(os.path.dirname(HERE))


def build_lists(corpus, out_dir):
    train = sorted(glob.glob(os.path.join(corpus, "wav", "train", "*",
                                          "*.wav")))
    test = sorted(glob.glob(os.path.join(corpus, "wav", "test", "*",
                                         "*.wav")))
    assert train and test, f"no wavs under {corpus}/wav"
    tr = os.path.join(out_dir, "vad_train.list")
    te = os.path.join(out_dir, "vad_test.list")
    with open(tr, "w") as f:
        f.write("\n".join(train) + "\n")
    with open(te, "w") as f:
        f.write("\n".join(test) + "\n")
    return tr, te


def speech_cfg(args, tr, te):
    return {
        "sample_rate": 16000, "frame_input": 160, "max_frames": 48000,
        "train_list": tr, "eval_list": te, "voice_thread": 0.4,
        "streaming": True, "streaming_min_frame": 10,
    }


def run_ours(args, tr, te):
    import yaml

    out = os.path.join(args.out_dir, "ours")
    os.makedirs(out, exist_ok=True)
    cfg = {
        "speech_config": speech_cfg(args, tr, te),
        "model_config": {"name": "CNN_Online_VAD", "dmodel": args.dmodel,
                         "streaming": True, "streaming_min_frame": 10},
        "augments_config": {},
        "optimizer_config": {"lr": args.lr, "beta1": 0.9, "beta2": 0.98,
                             "epsilon": 1e-6},
        "running_config": {
            "batch_size": args.batch, "num_epochs": 10000,
            "outdir": os.path.join(out, "logs"),
            "log_interval_steps": 100, "eval_interval_steps": 100000,
            "save_interval_steps": min(500, args.total_steps)},
    }
    data_yml = os.path.join(out, "vad_data.yml")
    with open(data_yml, "w") as f:
        yaml.safe_dump(cfg, f)
    # CPU-pinned after jax import (env JAX_PLATFORMS is overridden by
    # the axon site hook); the 80K-param VAD trains fine on CPU and the
    # TPU stays free for concurrent ASR head-to-head legs
    script = os.path.join(REPO, "train_vad.py")
    argv = ["--data_config", data_yml, "--model_config", data_yml,
            "--total_steps", str(args.total_steps)]
    subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms', 'cpu'); "
         "import runpy, sys; "
         f"sys.argv = [{script!r}] + {argv!r}; "
         f"runpy.run_path({script!r}, run_name='__main__')"],
        check=True, cwd=REPO)
    return data_yml


def train_reference(args, tr, te):
    """Reference train_vad.py flow: its own VADDataLoader + VADTrainer."""
    sys.path.insert(0, HERE)
    import refcompat

    refcompat.setup(os.path.join(HERE, "shims"))

    import tensorflow as tf
    from utils.user_config import UserConfig
    from vad.dataloaders.vad_dataloader import VADDataLoader
    from vad.trainer import vad_trainer

    # TF-version compat: the reference's VAD loss is rank-0 (its
    # MultiResolutionSTFT reduces to a scalar, vad/utils/stft.py:208) and
    # TF 2.2-era compute_average_loss accepted that; modern TF rejects
    # rank 0. Reshape scalars to [1] — same value/global_batch semantics.
    if not getattr(tf.nn.compute_average_loss, "_h2h_rank0", False):
        _orig_cal = tf.nn.compute_average_loss

        def _cal(per_example_loss, **kw):
            if per_example_loss.shape.ndims == 0:
                per_example_loss = tf.reshape(per_example_loss, [1])
            return _orig_cal(per_example_loss, **kw)

        _cal._h2h_rank0 = True
        tf.nn.compute_average_loss = _cal

    out = os.path.join(args.out_dir, "reference")
    os.makedirs(os.path.join(out, "logs"), exist_ok=True)
    data_yml = os.path.join(out, "ref_vad_data.yml")
    with open(data_yml, "w") as f:
        f.write(f"""
speech_config:
  sample_rate: 16000
  frame_input: 160
  max_frames: 48000
  train_list: '{tr}'
  eval_list: '{te}'
  voice_thread: 0.4
augments_config:
  noise: {{active: False}}
  masking: {{active: False}}
  pitch: {{active: False}}
  hz: {{active: False}}
optimizer_config:
  lr: {args.lr}
  beta1: 0.9
  beta2: 0.98
  epsilon: 0.000001
running_config:
  batch_size: {args.batch}
  train_steps_per_batches: 10
  eval_steps_per_batches: 10
  num_epochs: 10000
  outdir: '{out}/logs'
  log_interval_steps: 100
  eval_interval_steps: 1000000
  save_interval_steps: {min(500, args.total_steps)}
model_config:
  name: "online_vad"
  dmodel: {args.dmodel}
  streaming: True
  streaming_min_frame: 10
""")
    config = UserConfig(data_yml, data_yml)
    dg = VADDataLoader(config)
    runner = vad_trainer.VADTrainer(config)
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
    return runner.model


def shared_eval(args, ref_model, ours_yml, te):
    """Identical eval batches (our loader, fixed seed) through both
    models; frame acc + F1 at threshold 0.5, voice = positive."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, REPO)
    from tensorflowasr_tpu.cli.common import build_vad_model, load_config
    from tensorflowasr_tpu.cli.common import restore_or_warn
    from tensorflowasr_tpu.data.vad_dataloader import VADDataLoader
    from tensorflowasr_tpu.utils.config import UserConfig

    config = UserConfig(ours_yml, ours_yml)
    dl = VADDataLoader(config, seed=123)
    model, state = build_vad_model(config)
    state = restore_or_warn(
        state, config.section("running_config")["outdir"], "VAD")

    def metrics(prob, y):
        pred = (prob > 0.5).astype(np.float32)
        acc = float((pred == y).mean())
        tp = float((pred * y).sum())
        prec = tp / max(pred.sum(), 1e-6)
        rec = tp / max(y.sum(), 1e-6)
        f1 = 2 * prec * rec / max(prec + rec, 1e-6)
        return acc, f1

    import jax.numpy as jnp

    accs = {"ours": [], "reference": []}
    f1s = {"ours": [], "reference": []}
    for _ in range(args.eval_batches):
        b = dl.generate(train=False)
        x, y = b["x"], b["labels"]
        logits, _ = model.apply({"params": state.params},
                                jnp.asarray(x))
        p_ours = 1.0 / (1.0 + np.exp(-np.asarray(logits)))
        a, f = metrics(p_ours, y)
        accs["ours"].append(a)
        f1s["ours"].append(f)
        ref_logits, _ = ref_model(x, training=False)
        p_ref = 1.0 / (1.0 + np.exp(-np.asarray(ref_logits)))
        a, f = metrics(p_ref, y)
        accs["reference"].append(a)
        f1s["reference"].append(f)
    return {f"vad_acc_{k}": float(np.mean(v)) for k, v in accs.items()} | \
           {f"vad_f1_{k}": float(np.mean(v)) for k, v in f1s.items()}


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--corpus", required=True,
                   help="synthetic_mandarin corpus root (wav/<split>/...)")
    p.add_argument("--out_dir", required=True)
    p.add_argument("--total_steps", type=int, default=1500)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--dmodel", type=int, default=32)
    p.add_argument("--eval_batches", type=int, default=25)
    args = p.parse_args(argv)

    os.makedirs(args.out_dir, exist_ok=True)
    tr, te = build_lists(args.corpus, args.out_dir)

    ours_yml = run_ours(args, tr, te)          # subprocess: own backend
    ref_model = train_reference(args, tr, te)  # in-process TF CPU
    result = shared_eval(args, ref_model, ours_yml, te)
    result.update(framework="both", task="vad",
                  total_steps=args.total_steps, batch=args.batch)
    with open(os.path.join(args.out_dir, "result.json"), "w") as f:
        json.dump(result, f, indent=2)
    print("RESULT " + json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
