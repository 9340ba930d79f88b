"""Export round-trip tests: serialize StableHLO graphs, reload in-process,
check numerical parity with the live model (the reference's TF-vs-ONNX
parity check, test_chunk_asr.py:180-274)."""

import jax
import jax.numpy as jnp
import numpy as np

from tensorflowasr_tpu.export import (
    export_chunk_streaming,
    export_offline_asr,
    load_exported,
)
from tensorflowasr_tpu.models.conformer import ConformerCTC, ConformerConfig


def test_offline_export_roundtrip(tmp_path):
    cfg = ConformerConfig(dmodel=32, num_blocks=1, head_size=8, num_heads=2,
                          kernel_size=8, dropout=0.0,
                          ctcdecoder_num_blocks=1, translator_num_blocks=1)
    model = ConformerCTC(cfg, 8, 12)
    rng = np.random.default_rng(0)
    wav = jnp.asarray(rng.standard_normal((1, 16000)).astype(np.float32)
                      * 0.1)
    variables = model.init(jax.random.PRNGKey(0), wav,
                           jnp.ones((1, 4), jnp.int32))
    export_offline_asr(model, variables, str(tmp_path / "offline"),
                       batch=1, seconds=1.0, max_phones=16)
    graphs = load_exported(str(tmp_path / "offline"))
    assert set(graphs) == {"encoder", "ctc_model", "translator"}

    enc_live = np.asarray(model.apply(variables, wav,
                                      method=ConformerCTC.encode))
    enc_exp = graphs["encoder"](np.asarray(wav))
    np.testing.assert_allclose(enc_exp, enc_live, atol=1e-5, rtol=1e-4)

    logits_exp = graphs["ctc_model"](enc_exp)
    logits_live = np.asarray(model.apply(variables, jnp.asarray(enc_live),
                                         method=ConformerCTC.ctc_logits))
    np.testing.assert_allclose(logits_exp, logits_live, atol=1e-5,
                               rtol=1e-4)

    ids = rng.integers(0, 8, (1, 16)).astype(np.int32)
    tr_exp = graphs["translator"](ids, enc_exp)
    tr_live = np.asarray(model.apply(variables, jnp.asarray(ids),
                                     jnp.asarray(enc_live),
                                     method=ConformerCTC.translate))
    np.testing.assert_allclose(tr_exp, tr_live, atol=1e-5, rtol=1e-4)


def test_chunk_export_streaming_state_threading(tmp_path):
    from tests.test_chunk import N_CHAR, N_PHONE, tiny_cfg
    from tensorflowasr_tpu.models.chunk_conformer import ChunkConformer

    cfg = tiny_cfg()
    model = ChunkConformer(cfg, N_PHONE, N_CHAR)
    rng = np.random.default_rng(1)
    wav = jnp.asarray(rng.standard_normal(
        (1, cfg.chunk_samples * 3)).astype(np.float32) * 0.1)
    variables = model.init(jax.random.PRNGKey(0), wav,
                           jnp.ones((1, 4), jnp.int32), 8, False,
                           method=ChunkConformer.train_forward)
    export_chunk_streaming(model, variables, str(tmp_path / "chunk"),
                           batch=1, decoder_step=2)
    graphs = load_exported(str(tmp_path / "chunk"))
    assert set(graphs) == {"picker", "decoder"}

    import json
    manifest = json.load(open(tmp_path / "chunk" / "manifest.json"))
    pk_keys = manifest["picker_cache_keys"]

    # run 3 streaming steps through the EXPORTED graph, compare to live
    caches = model.apply(variables, 1,
                         method=ChunkConformer.init_picker_caches)
    flat = [np.asarray(caches[k]) for k in pk_keys]
    exp_logits = []
    for i in range(3):
        chunk = np.asarray(
            wav[:, i * cfg.chunk_samples:(i + 1) * cfg.chunk_samples])
        out = graphs["picker"](chunk, *flat)
        exp_logits.append(out[0])
        flat = out[3:]

    live_caches = model.apply(variables, 1,
                              method=ChunkConformer.init_picker_caches)
    live_logits = []
    for i in range(3):
        chunk = wav[:, i * cfg.chunk_samples:(i + 1) * cfg.chunk_samples]
        lg, hid, nf, live_caches = model.apply(
            variables, chunk, live_caches,
            method=ChunkConformer.picker_stream_step)
        live_logits.append(np.asarray(lg))
    np.testing.assert_allclose(np.concatenate(exp_logits, 1),
                               np.concatenate(live_logits, 1),
                               atol=1e-4, rtol=1e-3)
