"""Fused (vectorized) decoder phase vs the sequential micro-step scan.

``model_config.fused_decoder: true`` replaces fused_stream_step's t
sequential decoder micro-steps with one batched helper+decoder pass
(``ChunkConformer._fused_decoder_phase``) — the serving-tick bottleneck
identified in docs/serving_tick_profile.md. The two paths must agree:
token-exact on every emitted id and allclose on every cache leaf (the
batched path groups matmuls differently, so bit-equality is not
expected — argmax ids and ~1e-5 state agreement are)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from tensorflowasr_tpu.models.chunk_conformer import (
    ChunkConformer,
    ChunkConformerConfig,
    ChunkStackConfig,
)

N_PHONE, N_CHAR = 12, 17


def tiny_cfg(fused: bool, dec_win_back: int = 2):
    stack = dict(dmodel=16, head_size=8, num_heads=2, kernel_size=4,
                 dropout=0.0, win_front=6)
    return ChunkConformerConfig(
        dmodel=16, reduction_factor=4, front_dropout=0.0,
        sample_rate=16000, n_mels=20, stride_ms=10, chunk_num=16,
        encoder=ChunkStackConfig(num_blocks=2, win_back=0, **stack),
        picker=ChunkStackConfig(num_blocks=1, win_back=0, **stack),
        decoder=ChunkStackConfig(num_blocks=1, win_back=dec_win_back,
                                 **stack),
        helper=ChunkStackConfig(num_blocks=2, win_back=0, **stack),
        fused_decoder=fused,
    )


def _run_stream(model, variables, wav, n_chunks, cs):
    caches = model.apply(variables, 1,
                         method=ChunkConformer.init_stream_caches)
    step = jax.jit(lambda w, c: model.apply(
        variables, w, c, method=ChunkConformer.fused_stream_step))
    outs = []
    for i in range(n_chunks):
        chunk = wav[:, i * cs:(i + 1) * cs]
        ph, ch, prov, nf, caches = step(jnp.asarray(chunk), caches)
        outs.append((np.asarray(ph), np.asarray(ch), np.asarray(prov),
                     np.asarray(nf)))
    return outs, caches


def _compare(dec_win_back, seed, n_chunks=8):
    cfg_seq = tiny_cfg(False, dec_win_back)
    cfg_fus = tiny_cfg(True, dec_win_back)
    model_seq = ChunkConformer(cfg_seq, N_PHONE, N_CHAR)
    model_fus = ChunkConformer(cfg_fus, N_PHONE, N_CHAR)
    cs = cfg_seq.chunk_samples
    rng = np.random.default_rng(seed)
    wav = rng.standard_normal((1, cs * n_chunks)).astype(np.float32) * 0.3
    variables = model_seq.init(jax.random.PRNGKey(seed), jnp.asarray(wav),
                               jnp.ones((1, 6), jnp.int32), 10, False,
                               method=ChunkConformer.train_forward)

    outs_a, caches_a = _run_stream(model_seq, variables, wav, n_chunks, cs)
    outs_b, caches_b = _run_stream(model_fus, variables, wav, n_chunks, cs)

    kept_any = False
    for i, ((ph_a, ch_a, pv_a, nf_a), (ph_b, ch_b, pv_b, nf_b)) in \
            enumerate(zip(outs_a, outs_b)):
        assert (ph_a == ph_b).all(), ("phone", i)
        assert (nf_a == nf_b).all(), ("n_final", i)
        assert (ch_a == ch_b).all(), ("char", i, ch_a, ch_b)
        assert (pv_a == pv_b).all(), ("prov", i, pv_a, pv_b)
        kept_any = kept_any or (ch_a >= 0).any()
    assert kept_any, "signal never emitted a final char — weak test"

    flat_a = jax.tree_util.tree_leaves_with_path(caches_a)
    flat_b = {jax.tree_util.keystr(p): v
              for p, v in jax.tree_util.tree_leaves_with_path(caches_b)}
    for p, va in flat_a:
        vb = flat_b[jax.tree_util.keystr(p)]
        np.testing.assert_allclose(
            np.asarray(va, np.float32), np.asarray(vb, np.float32),
            rtol=2e-4, atol=2e-5, err_msg=jax.tree_util.keystr(p))


def test_fused_decoder_matches_sequential():
    _compare(dec_win_back=2, seed=0)


def test_fused_decoder_matches_sequential_no_lookahead():
    _compare(dec_win_back=0, seed=1)


def test_fused_decoder_batched_pool():
    """The vmapped serving form (batched_stream_step) with resets/advance
    gating must match per-stream sequential runs."""
    cfg_fus = tiny_cfg(True, 2)
    cfg_seq = tiny_cfg(False, 2)
    model_f = ChunkConformer(cfg_fus, N_PHONE, N_CHAR)
    model_s = ChunkConformer(cfg_seq, N_PHONE, N_CHAR)
    cs = cfg_fus.chunk_samples
    n_streams, n_chunks = 3, 5
    rng = np.random.default_rng(7)
    wavs = rng.standard_normal(
        (n_streams, cs * n_chunks)).astype(np.float32) * 0.3
    variables = model_s.init(jax.random.PRNGKey(0), jnp.asarray(wavs[:1]),
                             jnp.ones((1, 6), jnp.int32), 10, False,
                             method=ChunkConformer.train_forward)

    pool = model_f.apply(variables, n_streams,
                         method=ChunkConformer.init_multi_stream_caches)
    bstep = jax.jit(lambda w, c: model_f.apply(
        variables, w, c, method=ChunkConformer.batched_stream_step))
    got = [[] for _ in range(n_streams)]
    for i in range(n_chunks):
        ph, ch, prov, nf, pool = bstep(
            jnp.asarray(wavs[:, i * cs:(i + 1) * cs]), pool)
        for s in range(n_streams):
            got[s].append((np.asarray(ph[s]), np.asarray(ch[s])))

    for s in range(n_streams):
        outs, _ = _run_stream(model_s, variables, wavs[s:s + 1],
                              n_chunks, cs)
        for i, (ph_a, ch_a, _, _) in enumerate(outs):
            assert (got[s][i][0] == ph_a).all(), (s, i)
            assert (got[s][i][1] == ch_a).all(), (s, i)
