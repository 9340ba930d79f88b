"""Model export: serialized StableHLO via ``jax.export``.

Replaces the reference's ONNX/SavedModel export path (test_asr.py:226-259
tf2onnx three-graph export; test_chunk_asr.py:141-157 stateful
picker/decoder export in Z-yq/TensorflowASR) with portable serialized
StableHLO artifacts:

- offline ASR exports the same three graphs as the reference
  (encoder.onnx / ctc_model.onnx / translator.onnx):
    encoder    f32[B, T]            -> f32[B, T', d]
    ctc        f32[B, T', d]        -> f32[B, T', Vp]
    translator i32[B, U], f32[B,T',d] -> f32[B, U, Vc]
- chunk streaming exports the two stateful graphs (picker.onnx /
  decoder.onnx): all ring-buffer caches are explicit inputs/outputs, same
  state-threading contract as the reference's ONNX graphs.

Artifacts are directories of ``<name>.stablehlo`` files + a manifest;
reload with :func:`load_exported` in any process with jax installed (CPU,
GPU or TPU — StableHLO is backend-portable) and call with numpy arrays.
"""

from __future__ import annotations

import json
import os
from typing import Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export


def _export_one(fn: Callable, example_args) -> bytes:
    exp = jax_export.export(jax.jit(fn))(*example_args)
    return exp.serialize()


def save_exported(outdir: str, graphs: Dict[str, bytes],
                  meta: Dict) -> None:
    os.makedirs(outdir, exist_ok=True)
    for name, blob in graphs.items():
        with open(os.path.join(outdir, f"{name}.stablehlo"), "wb") as f:
            f.write(blob)
    with open(os.path.join(outdir, "manifest.json"), "w") as f:
        json.dump({"graphs": sorted(graphs), **meta}, f, indent=2)


def load_exported(outdir: str) -> Dict[str, Callable]:
    """-> dict of callables taking/returning numpy arrays."""
    with open(os.path.join(outdir, "manifest.json")) as f:
        manifest = json.load(f)
    out = {}
    for name in manifest["graphs"]:
        with open(os.path.join(outdir, f"{name}.stablehlo"), "rb") as f:
            exp = jax_export.deserialize(f.read())

        def call(*args, _exp=exp):
            res = _exp.call(*[jnp.asarray(a) for a in args])
            if isinstance(res, (tuple, list)):
                return [np.asarray(r) for r in res]
            return np.asarray(res)

        out[name] = call
    return out


def export_offline_asr(model, variables, outdir: str,
                       batch: int = 1, seconds: float = 7.0,
                       max_phones: int = 64) -> Dict[str, bytes]:
    """Export the three offline graphs at fixed example shapes."""
    from tensorflowasr_tpu.models.conformer import ConformerCTC

    cfg = model.cfg
    quantum = cfg.hop_size * cfg.reduction_factor
    t = int(seconds * cfg.sample_rate) // quantum * quantum
    t_red = t // quantum
    wav = jnp.zeros((batch, t), jnp.float32)
    enc_ex = jnp.zeros((batch, t_red, cfg.dmodel), jnp.float32)
    ids_ex = jnp.zeros((batch, max_phones), jnp.int32)

    graphs = {
        "encoder": _export_one(
            lambda w: model.apply(variables, w,
                                  method=ConformerCTC.encode), (wav,)),
        "ctc_model": _export_one(
            lambda e: model.apply(variables, e,
                                  method=ConformerCTC.ctc_logits),
            (enc_ex,)),
        "translator": _export_one(
            lambda i, e: model.apply(variables, i, e,
                                     method=ConformerCTC.translate),
            (ids_ex, enc_ex)),
    }
    save_exported(outdir, graphs, {
        "kind": "offline_asr", "batch": batch, "wav_samples": t,
        "enc_frames": t_red, "dmodel": cfg.dmodel,
        "max_phones": max_phones,
    })
    return graphs


def export_chunk_streaming(model, variables, outdir: str, batch: int = 1,
                           decoder_step: int = 4) -> Dict[str, bytes]:
    """Export the two stateful streaming graphs with explicit cache IO
    (reference picker_onnx_convert / decoder_onnx_convert,
    chunk_conformer_blocks.py:880-911)."""
    from tensorflowasr_tpu.models.chunk_conformer import ChunkConformer

    cfg = model.cfg
    pk_caches = model.apply(variables, batch,
                            method=ChunkConformer.init_picker_caches)
    dec_caches = model.apply(variables, batch,
                             method=ChunkConformer.init_decoder_caches)
    wav_chunk = jnp.zeros((batch, cfg.chunk_samples), jnp.float32)
    picked = jnp.zeros((batch, decoder_step, cfg.dmodel), jnp.float32)

    # flatten cache dicts to a stable ordered list for the export signature
    pk_keys = sorted(pk_caches)
    dec_keys = sorted(dec_caches)

    def picker_fn(wav, *flat):
        caches = dict(zip(pk_keys, flat))
        logits, hidden, n_final, new = model.apply(
            variables, wav, caches,
            method=ChunkConformer.picker_stream_step)
        return (logits, hidden, n_final) + tuple(new[k] for k in pk_keys)

    def decoder_fn(x, *flat):
        caches = dict(zip(dec_keys, flat))
        logits, provisional, n_final, new = model.apply(
            variables, x, caches,
            method=ChunkConformer.decoder_stream_step)
        return (logits, provisional, n_final) + tuple(new[k]
                                                      for k in dec_keys)

    graphs = {
        "picker": _export_one(
            picker_fn, (wav_chunk,) + tuple(pk_caches[k] for k in pk_keys)),
        "decoder": _export_one(
            decoder_fn, (picked,) + tuple(dec_caches[k] for k in dec_keys)),
    }
    save_exported(outdir, graphs, {
        "kind": "chunk_streaming", "batch": batch,
        "chunk_samples": cfg.chunk_samples, "decoder_step": decoder_step,
        "picker_cache_keys": pk_keys, "decoder_cache_keys": dec_keys,
    })
    return graphs
