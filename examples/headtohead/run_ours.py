"""Train + eval OUR framework on the shared synthetic corpus — the other
side of the head-to-head CER comparison (see run_reference.py).

Drives the standard CLIs (train_asr.py / eval_am.py) with a data config
derived from the recipe's am_data.yml but matched to the reference run:
same lists, same vocabularies, same batch, same optimizer (fixed-lr
Adam), same total steps, augmentation off, and a model config with
identical dimensions.

Usage:
  python examples/headtohead/run_ours.py \
      --work_dir /tmp/h2h_work --out_dir /tmp/h2h_ours \
      --total_steps 3000 --batch 16
Writes <out_dir>/result.json with phone/char CER + SER.
"""

import argparse
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(os.path.dirname(HERE))


def write_configs(args):
    data_yml = os.path.join(args.out_dir, "ours_data.yml")
    model_yml = os.path.join(args.out_dir, "ours_model.yml")
    # the recipe's am_data.yml supplies lists/vocabs/lexicon; rewrite the
    # run-specific knobs so both frameworks train identically
    import yaml
    with open(os.path.join(args.work_dir, "am_data.yml")) as f:
        data = yaml.safe_load(f)
    data["speech_config"]["eval_list"] = os.path.join(args.work_dir,
                                                      args.eval_list)
    data["speech_config"]["wav_max_duration"] = args.wav_max_duration
    if args.streaming:
        # block-streaming family (StreamingConformerCTC): chunks folded
        # into the batch axis, reference conformer_blocks.py:567-614
        data["speech_config"]["streaming"] = True
        data["speech_config"]["streaming_bucket"] = args.streaming_bucket
    if args.augment:
        # same two augmenters + parameters as run_reference.py's
        # _augments_yaml — semantically identical implementations
        data["augments_config"] = {
            "noise": {"active": args.noise_list is not None,
                      "sample_rate": 16000, "SNR": [8, 30],
                      "noises": args.noise_list or ""},
            "masking": {"active": True, "zone": "(0.1,0.9)",
                        "mask_ratio": 0.3, "mask_with_noise": False},
        }
    else:
        data["augments_config"] = {"spec_aug": {"active": False}}
    data["optimizer_config"] = {
        "lr": args.lr, "beta1": 0.9, "beta2": 0.98, "epsilon": 1e-6,
    }
    data["running_config"] = {
        "batch_size": args.batch,
        "num_epochs": 10000,  # step-bounded via --total_steps
        "outdir": os.path.join(args.out_dir, "logs"),
        "log_interval_steps": 100,
        "eval_interval_steps": 100000,
        "save_interval_steps": min(500, args.total_steps),
    }
    with open(data_yml, "w") as f:
        yaml.safe_dump(data, f, allow_unicode=True)
    if args.chunk:
        stack = {"dmodel": args.dmodel, "head_size": args.head_size,
                 "num_heads": args.num_heads,
                 "kernel_size": args.kernel_size, "fc_factor": 0.5,
                 "dropout": args.dropout, "win_front": 36, "win_back": 0}
        model = {
            "model_config": {
                "name": "ChunkConformer",
                "ChunkConformerFront": {
                    "dmodel": args.dmodel, "reduction_factor": 4,
                    "dropout": args.dropout, "sample_rate": 16000,
                    "n_mels": 80, "mel_layer_trainable": False,
                    "stride_ms": 10, "chunk_num": 16,
                },
                "ChunkConformerEncoder": {
                    **stack, "num_blocks": args.num_blocks},
                "ChunkCTCPicker": {**stack, "num_blocks": 1},
                "ChunkCTCDecoder": {**stack, "num_blocks": 1,
                                    "win_back": 8},
                "ContextHelper": {**stack, "num_blocks": 2},
            }
        }
        with open(model_yml, "w") as f:
            yaml.safe_dump(model, f)
        return data_yml, model_yml
    model = {
        "model_config": {
            "name": "OfflineConformerCTC",
            "dmodel": args.dmodel, "num_blocks": args.num_blocks,
            "head_size": args.head_size, "num_heads": args.num_heads,
            "kernel_size": args.kernel_size, "fc_factor": 0.5,
            "dropout": args.dropout, "reduction_factor": 4,
            "ctcdecoder_num_blocks": 1,
            "ctcdecoder_kernel_size": args.kernel_size,
            "ctcdecoder_fc_factor": 0.5,
            "ctcdecoder_dropout": args.dropout,
            "translator_num_blocks": 1,
            "translator_kernel_size": args.kernel_size,
            "translator_fc_factor": 0.5,
            "translator_dropout": args.dropout,
        }
    }
    with open(model_yml, "w") as f:
        yaml.safe_dump(model, f)
    return data_yml, model_yml


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--work_dir", required=True)
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
                   help="train the block-streaming family "
                        "(StreamingConformerCTC) instead of offline")
    p.add_argument("--streaming_bucket", type=float, default=0.5)
    p.add_argument("--chunk", action="store_true",
                   help="train the ChunkConformer family (3-loss chunk "
                        "trainer) instead of offline")
    p.add_argument("--augment", action="store_true",
                   help="activate the shared noise+masking augmenters")
    p.add_argument("--noise_list", default=None,
                   help="noise wav list for the SignalNoise augmenter")
    p.add_argument("--data_workers", type=int, default=None,
                   help="override train_asr --data_workers (0 = in-process "
                        "loading, which makes the batch sequence "
                        "DETERMINISTIC — multiprocess workers race and "
                        "reorder batches run-to-run)")
    p.add_argument("--cpu", action="store_true",
                   help="force JAX_PLATFORMS=cpu (default: whatever "
                        "backend the session has — TPU here; CER is "
                        "hardware-independent, wall-clock is not)")
    args = p.parse_args(argv)

    os.makedirs(args.out_dir, exist_ok=True)
    data_yml, model_yml = write_configs(args)

    def cli(script, *extra):
        """Launch a repo CLI; --cpu pins the platform AFTER jax import
        (a JAX_PLATFORMS=cpu env var is overridden by the axon site
        hook at import — tests/conftest.py has the same workaround)."""
        if args.cpu:
            return [sys.executable, "-c",
                    "import jax; jax.config.update('jax_platforms', "
                    "'cpu'); import runpy, sys; "
                    f"sys.argv = [{script!r}] + {list(extra)!r}; "
                    f"runpy.run_path({os.path.join(REPO, script)!r}, "
                    "run_name='__main__')"]
        return [sys.executable, os.path.join(REPO, script)] + list(extra)

    train_args = ["--data_config", data_yml, "--model_config", model_yml,
                  "--total_steps", str(args.total_steps)]
    if args.data_workers is not None:
        train_args += ["--data_workers", str(args.data_workers)]
    subprocess.run(cli("train_asr.py", *train_args), check=True, cwd=REPO)
    out = subprocess.run(
        cli("eval_am.py", "--data_config", data_yml,
            "--model_config", model_yml),
        check=True, cwd=REPO, capture_output=True, text=True)
    # eval_am prints one JSON line last
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    result = json.loads(line)
    result["framework"] = "ours"
    result["model_family"] = ("chunk" if args.chunk
                              else "streaming" if args.streaming
                              else "offline")
    result["total_steps"] = args.total_steps
    result["batch"] = args.batch
    with open(os.path.join(args.out_dir, "result.json"), "w") as f:
        json.dump(result, f, indent=2)
    print("RESULT " + json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
