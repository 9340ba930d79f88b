"""Decompose the ConformerCTC(S) train step on the real TPU.

VERDICT r2 weak-5 asked: where do the 82 ms/step (B=128, 8 s bf16) go,
and why is B=256 *slower* per sample than B=128? This drive measures,
per batch size:

  - full train step (fwd + CTC + dual translate + bwd + Adam), donated
    state, scalar-fetch timing (tunnel-safe, see CLAUDE.md);
  - forward-only loss (no grad, no update);
  - frontend only (log-mel from wav);
  - XLA memory analysis of the compiled step (temp alloc = activation
    footprint; a jump past HBM forces rematerialisation/spills);
  - XLA flop estimate -> achieved TFLOP/s.

Usage (foreground is fine for B<=128; run in background for the sweep):
  python tools/profile_train.py [--batches 64,128,192,256]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, "/root/repo")

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "10")

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batches", default="64,128,192,256")
    p.add_argument("--seconds", type=int, default=8)
    p.add_argument("--reps", type=int, default=6)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--remat", action="store_true",
                   help="profile with model_config.remat_blocks: true")
    p.add_argument("--skip_ablations", action="store_true",
                   help="time only the full step (skip fwd/frontend)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from tensorflowasr_tpu.models.conformer import (
        ConformerCTC, ConformerConfig)
    from tensorflowasr_tpu.train.asr_trainer import (
        _loss_and_metrics, make_train_step)
    from tensorflowasr_tpu.train.state import ASRTrainState, make_optimizer

    print(f"devices: {jax.devices()}", flush=True)

    n_phone, n_char = 231, 9161
    cfg = ConformerConfig(dtype_str="bfloat16", scan_layers=False,
                          remat_blocks=args.remat)
    model = ConformerCTC(cfg, n_phone, n_char)
    sr = 16000
    u_phone, u_char = 64, 32

    def make_batch(b):
        rng = np.random.default_rng(0)
        return {
            "wav": jnp.asarray(rng.standard_normal(
                (b, args.seconds * sr)).astype(np.float32) * 0.1),
            "input_length": jnp.full((b,), args.seconds * 100 // 4,
                                     jnp.int32),
            "phones": jnp.asarray(rng.integers(
                1, n_phone - 1, size=(b, u_phone)).astype(np.int32)),
            "phone_length": jnp.full((b,), u_phone, jnp.int32),
            "chars": jnp.asarray(rng.integers(
                1, n_char, size=(b, u_char)).astype(np.int32)),
        }

    batch1 = make_batch(1)
    variables = model.init(jax.random.PRNGKey(0), batch1["wav"],
                           batch1["phones"])
    tx = make_optimizer({"lr": 1e-4})

    def timed(fn, *a, chain=None, iters=args.iters, reps=args.reps):
        """Best-of timing; ``chain`` threads state through iterations and
        a scalar fetch drains the queue (block_until_ready lies over the
        tunnel). State threads across reps too — the train step DONATES
        its state argument, so resetting to the initial state would reuse
        a deleted buffer."""
        best = float("inf")
        state = a[0]
        for _ in range(reps):
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fn(state, *a[1:])
                if chain:
                    state, scalar = chain(out)
                else:
                    scalar = out
            float(scalar)
            best = min(best, (time.perf_counter() - t0) / iters)
        return best

    blank = n_phone - 1

    # frontend-only: wav -> log-mel (what MelFrontend computes in-graph)
    from tensorflowasr_tpu.ops import frontend as fe

    fcfg = fe.LogMelFrontendConfig(sample_rate=cfg.sample_rate, n_fft=1024,
                                   stride_ms=cfg.stride_ms,
                                   n_mels=cfg.n_mels, padding="same")

    @jax.jit
    def frontend_only(wav):
        feats = fe.log_mel_spectrogram(fe.wav_to_float(wav), fcfg)
        return jnp.sum(feats.astype(jnp.float32))

    # forward-only loss (training=False: no dropout rng, no batch_stats
    # mutation — slightly cheaper than the train forward but same
    # matmul/attention work)
    @jax.jit
    def fwd_only(params, batch):
        total, _ = _loss_and_metrics(model, params,
                                     variables.get("batch_stats"), batch,
                                     jax.random.PRNGKey(0), blank, False)
        return total

    rngk = jax.random.key(1, impl="rbg")

    for b in [int(x) for x in args.batches.split(",")]:
        batch = make_batch(b)
        # fresh COPIES: the donated step deletes the state's buffers, and
        # `variables` must stay alive for fwd_only/frontend_only
        state = ASRTrainState.create(
            apply_fn=model.apply,
            params=jax.tree.map(jnp.copy, variables["params"]), tx=tx,
            batch_stats=jax.tree.map(jnp.copy,
                                     variables.get("batch_stats")))
        step = make_train_step(model, tx, blank_id=blank, donate=True)

        # AOT-compile once; the compiled executable is also what we time
        # (calling the jitted wrapper would trigger a second compile)
        compiled = step.lower(state, batch, rngk).compile()
        mem = compiled.memory_analysis()
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0)) if cost else 0.0

        state, metrics = compiled(state, batch, rngk)
        float(metrics["train_loss"])

        t_step = timed(
            compiled, state, batch, rngk,
            chain=lambda out: (out[0], out[1]["train_loss"]))

        if args.skip_ablations:
            t_fwd = t_fe = float("nan")
        else:
            # forward only
            fb = fwd_only(variables["params"], batch)
            float(fb)
            t_fwd = timed(lambda _s, bb: fwd_only(variables["params"], bb),
                          None, batch)

            # frontend only
            s = frontend_only(batch["wav"])
            float(s)
            t_fe = timed(lambda _s, w: frontend_only(w), None, batch["wav"])

        audio = b * args.seconds
        print(f"B={b:4d} step {t_step*1e3:7.1f} ms  "
              f"fwd {t_fwd*1e3:7.1f} ms  frontend {t_fe*1e3:6.1f} ms  "
              f"audio-sec/s {audio/t_step:8.0f}  "
              f"per-sample {t_step/b*1e3:6.3f} ms", flush=True)
        if mem is not None:
            print(f"       mem: temp {mem.temp_size_in_bytes/2**20:8.1f} MiB"
                  f"  args {mem.argument_size_in_bytes/2**20:8.1f} MiB"
                  f"  output {mem.output_size_in_bytes/2**20:8.1f} MiB"
                  f"  peak-ish {(mem.temp_size_in_bytes + mem.argument_size_in_bytes)/2**30:6.2f} GiB",
                  flush=True)
        if flops:
            print(f"       xla-est flops/step {flops/1e12:.3f} T  "
                  f"achieved {flops/t_step/1e12:6.2f} TFLOP/s", flush=True)


if __name__ == "__main__":
    main()
