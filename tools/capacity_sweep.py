"""Sweep the multi-stream serving pool size on the real chip: at what S
does batched_stream_step stop amortizing? (bench.py serves S=256; the
tick is only ~8 ms of the 160 ms budget there, so bigger pools may keep
scaling until HBM or tick-deadline binds.)

Usage: python tools/capacity_sweep.py [--pools 256,384,512,768,1024]
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
    p.add_argument("--pools", default="256,384,512,768,1024")
    p.add_argument("--ticks", type=int, default=25)
    p.add_argument("--reps", type=int, default=6)
    args = p.parse_args()

    import dataclasses

    import jax
    import jax.numpy as jnp

    from tensorflowasr_tpu.models.chunk_conformer import (
        ChunkConformer, ChunkConformerConfig)

    print(f"devices: {jax.devices()}", flush=True)

    base = ChunkConformerConfig(dtype_str="bfloat16")
    cfg = dataclasses.replace(
        base,
        encoder=dataclasses.replace(base.encoder, scan_layers=True),
        picker=dataclasses.replace(base.picker, scan_layers=True),
        decoder=dataclasses.replace(base.decoder, scan_layers=True),
        helper=dataclasses.replace(base.helper, scan_layers=True))
    n_phone, n_char = 231, 9161
    model = ChunkConformer(cfg, n_phone, n_char)
    chunk_s = cfg.chunk_samples / cfg.sample_rate

    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, cfg.chunk_samples), jnp.float32),
        jnp.ones((1, 4), jnp.int32), 8, False,
        method=ChunkConformer.train_forward)

    @jax.jit
    def tick(v, chunks, caches):
        phone_ids, char_ids, prov_ids, n_final, new = model.apply(
            v, chunks, caches, method=ChunkConformer.batched_stream_step)
        packed = (jnp.sum(phone_ids) + jnp.sum(char_ids) +
                  jnp.sum(prov_ids) + jnp.sum(n_final))
        return packed.astype(jnp.float32), new

    for s in [int(x) for x in args.pools.split(",")]:
        rng = np.random.default_rng(0)
        chunks = jnp.asarray(rng.standard_normal(
            (s, cfg.chunk_samples)).astype(np.float32) * 0.1)
        try:
            caches = model.apply(variables, s,
                                 method=ChunkConformer.init_multi_stream_caches)
            packed, caches = tick(variables, chunks, caches)
            float(packed)
        except Exception as e:
            print(f"S={s}: FAILED {type(e).__name__}: {e}", flush=True)
            continue
        best = float("inf")
        for _ in range(args.reps):
            c = model.apply(variables, s,
                            method=ChunkConformer.init_multi_stream_caches)
            t0 = time.perf_counter()
            for _ in range(args.ticks):
                packed, c = tick(variables, chunks, c)
            float(packed)
            best = min(best, (time.perf_counter() - t0) / args.ticks)
        cap = s * chunk_s / best
        print(f"S={s:5d}  tick {best*1e3:7.2f} ms  rtf/stream "
              f"{best/chunk_s:7.4f}  capacity {cap:8.0f} streams/chip",
              flush=True)


if __name__ == "__main__":
    main()
