"""Verify drive: BatchingStreamFront liveness fix, real backend.

Tiny ChunkConformer, concurrent clients through the front, including the
close-while-feeding race that hung round 3.  Prints PASS/FAIL lines.
"""
import sys
sys.path.insert(0, "/root/repo")

import threading
import time

import jax
import jax.numpy as jnp
import numpy as np

from tensorflowasr_tpu.models.chunk_conformer import ChunkConformer
from tensorflowasr_tpu.serve.chunk_session import ChunkStreamSession
from tensorflowasr_tpu.serve.multi_session import (
    BatchingStreamFront, MultiStreamChunkServer)

sys.path.insert(0, "/root/repo/tests")
from test_chunk import N_CHAR, N_PHONE, tiny_cfg  # noqa: E402

print("backend:", jax.default_backend(), flush=True)
cfg = tiny_cfg()
model = ChunkConformer(cfg, N_PHONE, N_CHAR)
variables = model.init(
    jax.random.PRNGKey(0),
    jnp.zeros((1, cfg.chunk_samples), jnp.float32),
    jnp.ones((1, 4), jnp.int32), 8, False,
    method=ChunkConformer.train_forward)
print("init done", flush=True)

rng = np.random.default_rng(11)
cs = cfg.chunk_samples
lengths = [3 * cs, cs // 2, 4 * cs + 77, 2 * cs + cs // 3]
wavs = [rng.standard_normal((n,)).astype(np.float32) * 0.1
        for n in lengths]
expected = []
for w in wavs:
    sess = ChunkStreamSession(model, variables)
    sess.feed(w)
    expected.append(sess.flush())
print("single-stream expected computed", flush=True)

server = MultiStreamChunkServer(model, variables, n_slots=4)
front = BatchingStreamFront(server, max_wait_ms=2.0, feed_deadline_s=60.0)
t0 = time.time()
ok = True
for r in range(5):
    results = [None] * len(wavs)
    errors = []

    def client(i):
        try:
            slot = front.open()
            w = wavs[i]
            pkt = cs if i % 2 == 0 else cs // 2 + 13
            for off in range(0, len(w), pkt):
                front.feed(slot, w[off:off + pkt])
            out = front.close(slot)
            results[i] = (out["phone_ids"], out["char_ids"])
        except Exception as e:
            errors.append((i, repr(e)))

    threads = [threading.Thread(target=client, args=(i,), daemon=True)
               for i in range(len(wavs))]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
        if t.is_alive():
            ok = False
            print(f"FAIL round {r}: hung client; {front._debug_state()}",
                  flush=True)
    if errors:
        ok = False
        print(f"FAIL round {r}: {errors}", flush=True)
    for i, (got, want) in enumerate(zip(results, expected)):
        if got is None or got[0] != want["phone_ids"]:
            ok = False
            print(f"FAIL round {r} slot {i}: phone mismatch", flush=True)
        elif got[1] != want["char_ids"]:
            # chars may flip between the batch-1 and batch-S jitted
            # programs on TPU with UNTRAINED weights + noise input (near-
            # uniform char logits -> argmax ties resolved by different
            # tilings); host accumulation is identical code, phones are
            # exact, and CPU asserts exact equality (test_multi_session)
            print(f"WARN round {r} slot {i}: char near-tie divergence "
                  f"{want['char_ids']} vs {got[1]}", flush=True)
    print(f"round {r} done t={time.time()-t0:.1f}s", flush=True)
front.shutdown()
print("PASS front-liveness-on-device" if ok else "FAILED", flush=True)
