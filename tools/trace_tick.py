"""Per-op breakdown of the serving tick via jax.profiler trace.

Writes a trace, then parses the largest .trace.json.gz for TPU op
durations and prints the top cost centers grouped by op name prefix.
"""

import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "10")

import numpy as np


def main():
    import dataclasses

    import jax
    import jax.numpy as jnp

    from tensorflowasr_tpu.models.chunk_conformer import (
        ChunkConformer, ChunkConformerConfig)

    S = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    base = ChunkConformerConfig(dtype_str="bfloat16")
    cfg = dataclasses.replace(
        base,
        encoder=dataclasses.replace(base.encoder, scan_layers=True),
        picker=dataclasses.replace(base.picker, scan_layers=True),
        decoder=dataclasses.replace(base.decoder, scan_layers=True),
        helper=dataclasses.replace(base.helper, scan_layers=True))
    model = ChunkConformer(cfg, 231, 9161)
    rng = np.random.default_rng(0)
    chunks = jnp.asarray(rng.standard_normal(
        (S, cfg.chunk_samples)).astype(np.float32) * 0.1)
    variables = model.init(
        jax.random.PRNGKey(0), chunks[:1], jnp.ones((1, 4), jnp.int32), 8,
        False, method=ChunkConformer.train_forward)

    @jax.jit
    def tick(v, chunks, caches):
        ph, ch, pv, nf, new = model.apply(
            v, chunks, caches, method=ChunkConformer.batched_stream_step)
        s = (jnp.sum(ph) + jnp.sum(ch) + jnp.sum(pv) + jnp.sum(nf))
        return s.astype(jnp.float32), new

    caches = model.apply(variables, S,
                         method=ChunkConformer.init_multi_stream_caches)
    s, caches = tick(variables, chunks, caches)
    float(s)
    print("compiled; tracing...", flush=True)

    trace_dir = "/tmp/tick_trace"
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        for _ in range(10):
            s, caches = tick(variables, chunks, caches)
        float(s)

    time.sleep(2)
    files = sorted(glob.glob(
        os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True),
        key=os.path.getsize)
    if not files:
        print("no trace files found under", trace_dir)
        return
    path = files[-1]
    print("parsing", path, f"({os.path.getsize(path)//1024} KB)",
          flush=True)
    with gzip.open(path, "rt") as f:
        data = json.load(f)

    # find TPU device op events (pid with 'TPU' in process name; events
    # with dur). Group by name prefix.
    pids = {}
    for ev in data.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pids[ev["pid"]] = ev.get("args", {}).get("name", "")
    tpu_pids = {p for p, n in pids.items()
                if "TPU" in n or "/device" in n.lower()}
    groups = defaultdict(float)
    total = 0.0
    n_ev = 0
    for ev in data.get("traceEvents", []):
        if ev.get("ph") != "X" or ev.get("pid") not in tpu_pids:
            continue
        name = ev.get("name", "")
        dur = ev.get("dur", 0)       # microseconds
        if not dur:
            continue
        n_ev += 1
        total += dur
        # group: strip numeric suffixes and fusion indices
        key = name.split(".")[0]
        groups[key] += dur
    print(f"{n_ev} device events, total {total / 1e3:.2f} ms "
          f"(over 10 ticks => {total / 1e4:.3f} ms/tick)", flush=True)
    for k, v in sorted(groups.items(), key=lambda kv: -kv[1])[:30]:
        print(f"  {v / 1e4:8.4f} ms/tick  {k}")


if __name__ == "__main__":
    main()
