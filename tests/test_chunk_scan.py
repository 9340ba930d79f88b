"""ChunkConformer with scan_layers: the streaming==offline invariant must
hold identically under the scanned-blocks layout."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from tests.test_chunk import N_CHAR, N_PHONE, tiny_cfg
from tensorflowasr_tpu.models.chunk_conformer import (
    ChunkConformer,
    count_params,
)


def scan_cfg():
    c = tiny_cfg()
    return dataclasses.replace(
        c,
        encoder=dataclasses.replace(c.encoder, scan_layers=True,
                                    num_blocks=3),
        picker=dataclasses.replace(c.picker, scan_layers=True),
        decoder=dataclasses.replace(c.decoder, scan_layers=True),
        helper=dataclasses.replace(c.helper, scan_layers=True),
    )


def test_scan_chunk_streaming_matches_offline():
    cfg = scan_cfg()
    model = ChunkConformer(cfg, N_PHONE, N_CHAR)
    rng = np.random.default_rng(0)
    n_chunks = 4
    wav = jnp.asarray(rng.standard_normal(
        (1, cfg.chunk_samples * n_chunks)).astype(np.float32) * 0.1)
    variables = model.init(jax.random.PRNGKey(0), wav,
                           jnp.ones((1, 4), jnp.int32), 8, False,
                           method=ChunkConformer.train_forward)
    # same count as unrolled at equal depth
    unrolled = ChunkConformer(
        dataclasses.replace(
            cfg,
            encoder=dataclasses.replace(cfg.encoder, scan_layers=False),
            picker=dataclasses.replace(cfg.picker, scan_layers=False),
            decoder=dataclasses.replace(cfg.decoder, scan_layers=False),
            helper=dataclasses.replace(cfg.helper, scan_layers=False)),
        N_PHONE, N_CHAR)
    vu = unrolled.init(jax.random.PRNGKey(0), wav,
                       jnp.ones((1, 4), jnp.int32), 8, False,
                       method=ChunkConformer.train_forward)
    assert count_params(variables["params"]) == count_params(vu["params"])

    off_logits, off_hidden = model.apply(
        variables, wav, False, method=ChunkConformer.encode_to_phones)

    caches = model.apply(variables, 1,
                         method=ChunkConformer.init_picker_caches)
    outs = []
    for i in range(n_chunks):
        chunk = wav[:, i * cfg.chunk_samples:(i + 1) * cfg.chunk_samples]
        logits, hidden, n_final, caches = model.apply(
            variables, chunk, caches,
            method=ChunkConformer.picker_stream_step)
        outs.append(np.asarray(logits))
    stream = np.concatenate(outs, axis=1)
    np.testing.assert_allclose(stream, np.asarray(off_logits),
                               atol=2e-4, rtol=1e-3)


def test_scan_chunk_fused_step_runs():
    cfg = scan_cfg()
    model = ChunkConformer(cfg, N_PHONE, N_CHAR)
    rng = np.random.default_rng(1)
    wav = jnp.asarray(rng.standard_normal(
        (1, cfg.chunk_samples * 2)).astype(np.float32) * 0.1)
    variables = model.init(jax.random.PRNGKey(0), wav,
                           jnp.ones((1, 4), jnp.int32), 8, False,
                           method=ChunkConformer.train_forward)
    caches = model.apply(variables, 1,
                         method=ChunkConformer.init_stream_caches)
    step = jax.jit(lambda v, c, s: model.apply(
        v, c, s, method=ChunkConformer.fused_stream_step))
    for i in range(2):
        chunk = wav[:, i * cfg.chunk_samples:(i + 1) * cfg.chunk_samples]
        phone_ids, char_ids, prov_ids, n_final, caches = step(
            variables, chunk, caches)
    assert np.asarray(phone_ids).shape == (cfg.sub_length,)
    assert np.isfinite(np.asarray(n_final)).all()
