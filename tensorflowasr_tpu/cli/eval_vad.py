"""VAD evaluation CLI — parity with the reference eval_vad.py: frame
accuracy + F1 over the eval list."""

from __future__ import annotations

import json
import sys

import jax
import jax.numpy as jnp

from tensorflowasr_tpu.cli.common import config_parser, load_config


def main(argv=None) -> int:
    parser = config_parser(__doc__)
    parser.add_argument("--max_batches", type=int, default=50)
    args = parser.parse_args(argv)
    config = load_config(args)

    from tensorflowasr_tpu.data.vad_dataloader import VADDataLoader
    from tensorflowasr_tpu.eval.testers import VADTester
    from tensorflowasr_tpu.models.vad import OfflineVAD, OnlineVAD
    from tensorflowasr_tpu.train.state import ASRTrainState, make_optimizer
    from tensorflowasr_tpu.train.vad_trainer import make_vad_eval_step

    sc = config["speech_config"] or {}
    mc = config["model_config"] or {}
    dl = VADDataLoader(config)
    cls = OnlineVAD if (mc["name"] or "CNN_Online_VAD") == "CNN_Online_VAD" \
        else OfflineVAD
    model = cls(dmodel=mc["dmodel"] or 32,
                frame_input=sc["frame_input"] or 80)
    batch = dl.generate(train=False)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(batch["x"]))
    state = ASRTrainState.create(apply_fn=model.apply,
                                 params=variables["params"],
                                 tx=make_optimizer({}))
    # restore newest checkpoint when present
    rc = config["running_config"] or {}
    outdir = rc["outdir"]
    if outdir:
        import os

        from tensorflowasr_tpu.train.checkpoint import CheckpointManager
        ckdir = os.path.join(outdir, "checkpoints")
        if os.path.isdir(ckdir):
            restored = CheckpointManager(ckdir).restore_latest(state)
            if restored is not None:
                state = restored
    tester = VADTester(make_vad_eval_step(model), state)
    result = tester.run(dl.generator(train=False),
                        max_batches=args.max_batches)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
