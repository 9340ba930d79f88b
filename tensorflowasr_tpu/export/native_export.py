"""Export ConformerCTC weights for the STANDALONE C++ inference engine.

The reference ships a fully Python-free C++ inference path: ONNX graphs
executed by onnxruntime (test_asr.py:226-259 exports, Inference/
CppInference/onnx/src/core/asr_session.cpp consumes). Our TPU artifacts
(StableHLO, export/exporter.py) need a JAX process, so this module writes
a runtime-neutral artifact instead — raw float32 tensors + a JSON
manifest — consumed by cpp/serving's native engine (cpp/serving/src/
native_model.cpp), which re-implements the exact offline pipeline
(log-mel frontend -> conv subsampling -> conformer blocks -> CTC decoder
-> greedy -> translator) in portable C++ with no runtime dependency.

Artifact layout (<outdir>/):
  weights.bin     all tensors, row-major float32, back to back
  manifest.json   {"tensors": [{"name", "shape", "offset"}...],
                   "config": {...model dims...}}
  phones.txt / chars.txt   optional vocab copies for text output
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Dict, List, Tuple

import numpy as np

from tensorflowasr_tpu.models.conformer import ConformerCTC
from tensorflowasr_tpu.ops import frontend as fe


def _flatten(tree, prefix="") -> List[Tuple[str, np.ndarray]]:
    out = []
    if isinstance(tree, dict):
        for k in sorted(tree):
            out.extend(_flatten(tree[k], f"{prefix}{k}/"))
    else:
        out.append((prefix[:-1], np.asarray(tree)))
    return out


def export_native(model: ConformerCTC, variables: dict, outdir: str,
                  phone_vocab: str = None, char_vocab: str = None) -> None:
    """Write the native artifact for the OFFLINE ConformerCTC pipeline."""
    c = model.cfg
    if c.mel_layer_type not in ("Melspectrogram", "Spectrogram"):
        raise ValueError(f"native export supports Melspectrogram/"
                         f"Spectrogram frontends, got {c.mel_layer_type}")
    if c.add_wav_info:
        raise ValueError("native export does not support add_wav_info")
    if c.streaming:
        raise ValueError("native export is for the offline model")
    os.makedirs(outdir, exist_ok=True)

    tensors: List[Tuple[str, np.ndarray]] = []
    params = variables["params"]
    batch_stats = variables.get("batch_stats")
    if c.scan_layers:
        # the C++ engine reads the unrolled conformer_block_{i} layout
        from tensorflowasr_tpu.models.conformer import (
            unstack_encoder_block_params)

        params = dict(params)
        params["encoder"] = unstack_encoder_block_params(params["encoder"])
        if batch_stats and "encoder" in batch_stats:
            batch_stats = dict(batch_stats)
            batch_stats["encoder"] = unstack_encoder_block_params(
                batch_stats["encoder"])
    tensors.extend(_flatten(params, "params/"))
    if batch_stats:
        tensors.extend(_flatten(batch_stats, "batch_stats/"))

    # frontend constants — exported so C++ matches JAX bit-for-bit
    fcfg = fe.LogMelFrontendConfig(
        sample_rate=c.sample_rate, n_fft=1024, stride_ms=c.stride_ms,
        n_mels=c.n_mels, padding="same")
    dft, fb = fe._frontend_constants(fcfg)
    tensors.append(("frontend/dft", dft))          # [n_fft, 2*n_freq]
    if c.mel_layer_type == "Melspectrogram":
        if c.mel_layer_trainable and "mel_layer" in params and \
                "freq2mel" in params.get("mel_layer", {}):
            fb = np.asarray(params["mel_layer"]["freq2mel"])
        tensors.append(("frontend/freq2mel", fb))  # [n_freq, n_mels]

    manifest: Dict = {
        "config": {
            "dmodel": c.dmodel, "reduction_factor": c.reduction_factor,
            "num_blocks": c.num_blocks, "head_size": c.head_size,
            "num_heads": c.num_heads, "kernel_size": c.kernel_size,
            "fc_factor": c.fc_factor,
            "ctcdecoder_num_blocks": c.ctcdecoder_num_blocks,
            "ctcdecoder_kernel_size": c.ctcdecoder_kernel_size,
            "ctcdecoder_fc_factor": c.ctcdecoder_fc_factor,
            "translator_num_blocks": c.translator_num_blocks,
            "translator_kernel_size": c.translator_kernel_size,
            "translator_fc_factor": c.translator_fc_factor,
            "sample_rate": c.sample_rate, "n_mels": c.n_mels,
            "stride_ms": c.stride_ms, "n_fft": 1024,
            "mel_layer_type": c.mel_layer_type,
            "num_phone_classes": model.num_phone_classes,
            "num_char_classes": model.num_char_classes,
        },
        "tensors": [],
    }

    offset = 0
    with open(os.path.join(outdir, "weights.bin"), "wb") as f:
        for name, arr in tensors:
            arr = np.ascontiguousarray(arr, dtype=np.float32)
            manifest["tensors"].append(
                {"name": name, "shape": list(arr.shape), "offset": offset})
            f.write(arr.tobytes())
            offset += arr.nbytes
    with open(os.path.join(outdir, "manifest.json"), "w",
              encoding="utf-8") as f:
        json.dump(manifest, f, indent=1)
    # line-oriented twin of manifest.json for the C++ loader:
    #   "config <key> <value>" then "tensor <name> <offset> <ndim> <dims...>"
    with open(os.path.join(outdir, "manifest.txt"), "w",
              encoding="utf-8") as f:
        for k, v in manifest["config"].items():
            f.write(f"config {k} {v}\n")
        for t in manifest["tensors"]:
            dims = " ".join(str(d) for d in t["shape"])
            f.write(f"tensor {t['name']} {t['offset']} "
                    f"{len(t['shape'])} {dims}\n")
    for src, dst in ((phone_vocab, "phones.txt"), (char_vocab, "chars.txt")):
        if src:
            shutil.copyfile(src, os.path.join(outdir, dst))


def export_native_vad(model, variables: dict, outdir: str) -> None:
    """Write the native artifact for the OnlineVAD voice-logit head.

    Completes the reference's 4-model standalone C++ session
    (Inference/CppInference/onnx/src/core/asr_session.h:7-38 loads
    vad/encoder/ctc/translator onnx): cpp/serving's
    vad_native_model.cpp re-implements the causal CNN
    (models/vad.py::OnlineVAD) so the offline and chunk-streaming native
    engines can gate decoding on VAD with no Python at runtime.
    """
    from tensorflowasr_tpu.models.vad import OnlineVAD

    if not isinstance(model, OnlineVAD):
        raise ValueError("native VAD export supports OnlineVAD (the causal "
                         "streaming variant the serving sessions use)")
    os.makedirs(outdir, exist_ok=True)

    tensors: List[Tuple[str, np.ndarray]] = []
    # only the voice-logit path — the audio_voice_mask recon head is a
    # training-time auxiliary (vad_model.py:44-58 exports logits only)
    for name in ("embed", "dense1", "cnn1", "dense2", "cnn2", "dense3",
                 "fc"):
        sub = variables["params"][name]
        tensors.append((f"params/{name}/kernel", np.asarray(sub["kernel"])))
        tensors.append((f"params/{name}/bias", np.asarray(sub["bias"])))

    manifest: Dict = {
        "config": {
            "kind": "vad",
            "dmodel": model.dmodel,
            "frame_input": model.frame_input,
        },
        "tensors": [],
    }
    offset = 0
    with open(os.path.join(outdir, "weights.bin"), "wb") as f:
        for name, arr in tensors:
            arr = np.ascontiguousarray(arr, dtype=np.float32)
            manifest["tensors"].append(
                {"name": name, "shape": list(arr.shape), "offset": offset})
            f.write(arr.tobytes())
            offset += arr.nbytes
    with open(os.path.join(outdir, "manifest.json"), "w",
              encoding="utf-8") as f:
        json.dump(manifest, f, indent=1)
    with open(os.path.join(outdir, "manifest.txt"), "w",
              encoding="utf-8") as f:
        for k, v in manifest["config"].items():
            f.write(f"config {k} {v}\n")
        for t in manifest["tensors"]:
            dims = " ".join(str(d) for d in t["shape"])
            f.write(f"tensor {t['name']} {t['offset']} "
                    f"{len(t['shape'])} {dims}\n")


def _unstack_chunk_stack(tree: dict) -> dict:
    """scan_layers stack subtree {'block': stacked [L, ...]} ->
    {'block_{i}': ...} (the layout the C++ engine reads)."""
    import jax

    if "block" not in tree:
        return tree
    out = {k: v for k, v in tree.items() if k != "block"}
    stacked = tree["block"]
    n = jax.tree.leaves(stacked)[0].shape[0]
    for i in range(n):
        out[f"block_{i}"] = jax.tree.map(lambda x: x[i], stacked)
    return out


def export_native_chunk(model, variables: dict, outdir: str,
                        phone_vocab: str = None,
                        char_vocab: str = None) -> None:
    """Write the native artifact for the STREAMING ChunkConformer pipeline
    (consumed by cpp/serving/src/chunk_native_model.cpp — standalone C++
    chunk streaming, beyond the reference's offline-only native session)."""
    c = model.cfg
    os.makedirs(outdir, exist_ok=True)

    params = dict(variables["params"])
    batch_stats = variables.get("batch_stats")

    def unstack_all(tree):
        tree = dict(tree)
        if "encoder" in tree:
            tree["encoder"] = _unstack_chunk_stack(dict(tree["encoder"]))
        for mod in ("phone_picker", "decoder", "helper"):
            if mod in tree and "stack" in tree[mod]:
                sub = dict(tree[mod])
                sub["stack"] = _unstack_chunk_stack(dict(sub["stack"]))
                tree[mod] = sub
        return tree

    params = unstack_all(params)
    if batch_stats:
        batch_stats = unstack_all(dict(batch_stats))

    tensors: List[Tuple[str, np.ndarray]] = []
    tensors.extend(_flatten(params, "params/"))
    if batch_stats:
        tensors.extend(_flatten(batch_stats, "batch_stats/"))

    fcfg = fe.LogMelFrontendConfig(
        sample_rate=c.sample_rate, n_fft=1024, stride_ms=c.stride_ms,
        n_mels=c.n_mels, padding="valid")
    dft, fb = fe._frontend_constants(fcfg)
    tensors.append(("frontend/dft", dft))
    if c.mel_layer_trainable and "front" in params and \
            "freq2mel" in params.get("front", {}):
        fb = np.asarray(params["front"]["freq2mel"])
    tensors.append(("frontend/freq2mel", fb))

    config = {
        "kind": "chunk",
        "dmodel": c.dmodel, "reduction_factor": c.reduction_factor,
        "sample_rate": c.sample_rate, "n_mels": c.n_mels,
        "stride_ms": c.stride_ms, "chunk_num": c.chunk_num, "n_fft": 1024,
        "num_phone_classes": model.num_phone_classes,
        "num_char_classes": model.num_char_classes,
    }
    for name, st in (("enc", c.encoder), ("pk", c.picker),
                     ("dec", c.decoder), ("hlp", c.helper)):
        config.update({
            f"{name}_dmodel": st.dmodel,
            f"{name}_num_blocks": st.num_blocks,
            f"{name}_head_size": st.head_size,
            f"{name}_num_heads": st.num_heads,
            f"{name}_kernel_size": st.kernel_size,
            f"{name}_fc_factor": st.fc_factor,
            f"{name}_win_front": st.win_front,
            f"{name}_win_back": st.win_back,
        })

    manifest: Dict = {"config": config, "tensors": []}
    offset = 0
    with open(os.path.join(outdir, "weights.bin"), "wb") as f:
        for name, arr in tensors:
            arr = np.ascontiguousarray(arr, dtype=np.float32)
            manifest["tensors"].append(
                {"name": name, "shape": list(arr.shape), "offset": offset})
            f.write(arr.tobytes())
            offset += arr.nbytes
    with open(os.path.join(outdir, "manifest.json"), "w",
              encoding="utf-8") as f:
        json.dump(manifest, f, indent=1)
    with open(os.path.join(outdir, "manifest.txt"), "w",
              encoding="utf-8") as f:
        for k, v in manifest["config"].items():
            f.write(f"config {k} {v}\n")
        for t in manifest["tensors"]:
            dims = " ".join(str(d) for d in t["shape"])
            f.write(f"tensor {t['name']} {t['offset']} "
                    f"{len(t['shape'])} {dims}\n")
    for src, dst in ((phone_vocab, "phones.txt"), (char_vocab, "chars.txt")):
        if src:
            shutil.copyfile(src, os.path.join(outdir, dst))
