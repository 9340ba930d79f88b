"""Decompose the multi-stream serving tick (batched_stream_step) on TPU.

VERDICT r3 #6: capacity plateaus ~5.9k streams because per-tick compute
scales linearly; before building a fused Pallas kernel, measure WHERE
the ~7 ms tick goes at S=256:

  - full tick (picker + feature-pick + t=4 sequential decoder
    micro-steps, the serving program);
  - picker-only tick (front + encoder + picker + CTC argmax) — the
    batched, well-shaped half;
  - decoder share = full - picker (the sequential scan over t
    micro-steps, each running helper(2 blocks)+decoder(1 block) on
    [S, ~1+wb, d] — many tiny kernels);
  - XLA flop/bytes estimates for both programs -> what bound we're at.

Usage:  python tools/profile_tick.py [--streams 256] [--reps 8]
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "10")

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--streams", type=int, default=256)
    p.add_argument("--reps", type=int, default=8)
    p.add_argument("--ticks", type=int, default=25)
    p.add_argument("--scan_unroll", type=int, default=0,
                   help="lax.scan unroll factor for the layer scans "
                        "(stacked params kept; removes per-layer while "
                        "boundaries)")
    p.add_argument("--fused_decoder", action="store_true",
                   help="A/B: vectorized decoder phase "
                        "(model_config.fused_decoder) instead of the "
                        "t sequential micro-steps")
    p.add_argument("--unroll_layers", action="store_true",
                   help="scan_layers=False: unrolled block loops "
                        "(long compile, cached; measures the scan-carry "
                        "overhead seen as 'while'+'copy' in trace_tick)")
    args = p.parse_args()

    import dataclasses

    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from tensorflowasr_tpu.models.chunk_conformer import (
        ChunkConformer, ChunkConformerConfig)

    print("backend:", jax.default_backend(), flush=True)
    base = ChunkConformerConfig(dtype_str="bfloat16")
    scan = not args.unroll_layers

    def st(s):
        return dataclasses.replace(s, scan_layers=scan,
                                   scan_unroll=args.scan_unroll
                                   or s.scan_unroll)

    cfg = dataclasses.replace(
        base, encoder=st(base.encoder), picker=st(base.picker),
        decoder=st(base.decoder), helper=st(base.helper),
        fused_decoder=args.fused_decoder)
    model = ChunkConformer(cfg, 231, 9161)
    S = args.streams
    rng = np.random.default_rng(0)
    chunks = jnp.asarray(rng.standard_normal(
        (S, cfg.chunk_samples)).astype(np.float32) * 0.1)
    variables = model.init(
        jax.random.PRNGKey(0), chunks[:1], jnp.ones((1, 4), jnp.int32), 8,
        False, method=ChunkConformer.train_forward)

    # ---- full tick (caches donated: the ring tree is ~150 MB at S=256;
    # without donation XLA materialises a second copy every dispatch) ---
    @functools.partial(jax.jit, donate_argnums=(2,))
    def tick(v, chunks, caches):
        ph, ch, pv, nf, new = model.apply(
            v, chunks, caches, method=ChunkConformer.batched_stream_step)
        s = (jnp.sum(ph) + jnp.sum(ch) + jnp.sum(pv) + jnp.sum(nf))
        return s.astype(jnp.float32), new

    # ---- picker-only tick -------------------------------------------------
    def picker_one(mdl, wav, caches):
        logits, hidden, n_final, new = mdl.picker_stream_step(wav, caches)
        return (jnp.sum(jnp.argmax(logits, -1)).astype(jnp.float32)
                + jnp.sum(n_final)), new

    pk_keys = ["wav", "sub", "enc_mha", "enc_cnn", "enc_fill",
               "picker_mha", "picker_cnn", "picker_fill", "ring",
               "ring_fill"]
    if cfg.encoder.lookahead > 0:
        pk_keys += ["enc_ring", "enc_ring_fill"]

    vpick = nn.vmap(picker_one, in_axes=(0, 0), out_axes=0,
                    variable_axes={"params": None, "batch_stats": None},
                    split_rngs={"params": False, "dropout": False})

    @jax.jit
    def tick_picker(v, chunks, caches):
        s, new = model.apply(v, chunks[:, None, :], caches,
                             method=lambda mdl, w, c: vpick(mdl, w, c))
        return jnp.sum(s), new

    def full_caches():
        return model.apply(variables, S,
                           method=ChunkConformer.init_multi_stream_caches)

    def picker_caches():
        c = full_caches()
        return {k: c[k] for k in pk_keys}

    def bench(fn, mk_caches, label):
        c = mk_caches()
        s, c = fn(variables, chunks, c)
        float(s)                              # compile + drain
        best = float("inf")
        for _ in range(args.reps):
            c = mk_caches()
            t0 = time.perf_counter()
            for _ in range(args.ticks):
                s, c = fn(variables, chunks, c)
            float(s)
            best = min(best, (time.perf_counter() - t0) / args.ticks)
        print(f"{label}: {best * 1e3:.3f} ms/tick", flush=True)
        return best

    # ---- XLA estimates ----------------------------------------------------
    def analyze(fn, mk_caches, label):
        lowered = fn.lower(variables, chunks, mk_caches())
        compiled = lowered.compile()
        try:
            ca = compiled.cost_analysis()
            ca = ca[0] if isinstance(ca, (list, tuple)) else ca
            flops = ca.get("flops", float("nan"))
            bytes_ = ca.get("bytes accessed", float("nan"))
            print(f"{label}: est {flops / 1e9:.2f} GFLOP, "
                  f"{bytes_ / 1e6:.1f} MB accessed", flush=True)
            return flops, bytes_
        except Exception as e:
            print(f"{label}: cost analysis unavailable: {e!r}", flush=True)
            return None, None

    analyze(tick, full_caches, "full tick   ")
    analyze(tick_picker, picker_caches, "picker only ")
    t_full = bench(tick, full_caches, "full tick   ")
    t_pick = bench(tick_picker, picker_caches, "picker only ")
    print(f"decoder scan share: {(t_full - t_pick) * 1e3:.3f} ms "
          f"({100 * (t_full - t_pick) / t_full:.0f}% of tick)", flush=True)


if __name__ == "__main__":
    main()
