"""Quantify TPU batched-vs-single streaming divergence for the drive's
slot-2 wav: is the token mismatch a near-tie argmax flip (numerical) or
structural?"""
import sys
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import jax
import jax.numpy as jnp
import numpy as np

from tensorflowasr_tpu.models.chunk_conformer import ChunkConformer
from test_chunk import N_CHAR, N_PHONE, tiny_cfg

print("backend:", jax.default_backend(), flush=True)
cfg = tiny_cfg()
model = ChunkConformer(cfg, N_PHONE, N_CHAR)
variables = model.init(
    jax.random.PRNGKey(0),
    jnp.zeros((1, cfg.chunk_samples), jnp.float32),
    jnp.ones((1, 4), jnp.int32), 8, False,
    method=ChunkConformer.train_forward)

rng = np.random.default_rng(11)
cs = cfg.chunk_samples
lengths = [3 * cs, cs // 2, 4 * cs + 77, 2 * cs + cs // 3]
wavs = [rng.standard_normal((n,)).astype(np.float32) * 0.1
        for n in lengths]
# pad each to whole chunks like the server does
padded = []
n_chunks = []
for w in wavs:
    pad = (-len(w)) % cs
    w = np.concatenate([w, np.zeros((pad,), np.float32)])
    padded.append(w)
    n_chunks.append(len(w) // cs)
mx = max(n_chunks)
S = len(wavs)

single_ph = [[] for _ in range(S)]
for s in range(S):
    c = model.apply(variables, 1, method=ChunkConformer.init_stream_caches)
    for k in range(n_chunks[s]):
        ph, ch, pv, nf, c = model.apply(
            variables, jnp.asarray(padded[s][k * cs:(k + 1) * cs][None]), c,
            method=ChunkConformer.fused_stream_step)
        single_ph[s].append(np.asarray(ph)[0])

caches = model.apply(variables, S,
                     method=ChunkConformer.init_multi_stream_caches)
step = jax.jit(lambda v, w, c, r, a: model.apply(
    v, w, c, r, a, method=ChunkConformer.batched_stream_step))
none = jnp.zeros((S,), bool)
batch_ph = [[] for _ in range(S)]
for k in range(mx):
    adv = jnp.asarray(np.array([k < n for n in n_chunks]))
    w = np.zeros((S, cs), np.float32)
    for s in range(S):
        if k < n_chunks[s]:
            w[s] = padded[s][k * cs:(k + 1) * cs]
    ph, ch, pv, nf, caches = step(variables, jnp.asarray(w), caches,
                                  none, adv)
    for s in range(S):
        if k < n_chunks[s]:
            batch_ph[s].append(np.asarray(ph)[s])

for s in range(S):
    total = sum(a.size for a in single_ph[s])
    diff = sum(int((a != b).sum())
               for a, b in zip(single_ph[s], batch_ph[s]))
    print(f"slot {s}: {diff}/{total} frame tokens differ", flush=True)
print("done", flush=True)
