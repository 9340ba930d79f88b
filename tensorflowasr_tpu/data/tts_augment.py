"""TTS / voice-conversion corpus synthesis (optional, model-gated).

Functional parity with the reference's offline corpus augmentation
(augmentations/tts_for_asr/ in Z-yq/TensorflowASR: tts.py:20-40 multi-
speaker ONNX TTS, vc_aug.py:10-21 ONNX voice conversion, tts_augment.py
CLI): given text lines, synthesize wav+transcript pairs to grow the ASR
corpus; given wavs, convert speaker identity.

The reference ships the ONNX checkpoints out-of-band ("download
vc_aug_model_L.onnx..."); same here — this module is a thin host-side
driver that REQUIRES onnxruntime plus user-provided model files and
raises a clear error otherwise. Text normalization
(utils/normalize.py) runs on every line before synthesis.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence

import numpy as np

from tensorflowasr_tpu.utils.audio import write_wav
from tensorflowasr_tpu.utils.normalize import normalize_text


def _require_onnxruntime():
    try:
        import onnxruntime  # type: ignore

        return onnxruntime
    except ImportError as e:
        raise ImportError(
            "TTS/VC augmentation needs the optional 'onnxruntime' package "
            "plus the tts/vc model files (see reference "
            "augmentations/tts_for_asr)") from e


class TTSSynthesizer:
    """Multi-speaker text-to-speech via a user-provided ONNX model
    (tts.py semantics: inputs text ids + speaker id -> waveform)."""

    def __init__(self, model_path: str, vocab: Sequence[str],
                 sample_rate: int = 16000, n_speakers: int = 515):
        ort = _require_onnxruntime()
        if not os.path.exists(model_path):
            raise FileNotFoundError(model_path)
        self.session = ort.InferenceSession(model_path)
        self.token_to_id = {t: i for i, t in enumerate(vocab)}
        self.sample_rate = sample_rate
        self.n_speakers = n_speakers
        self.rng = np.random.default_rng(0)

    def spoken_text(self, text: str) -> str:
        """The string actually synthesized: normalized + vocab-filtered.
        THIS is the transcript that must pair with the audio."""
        return "".join(c for c in normalize_text(text)
                       if c in self.token_to_id)

    def synthesize(self, text: str,
                   speaker: Optional[int] = None) -> np.ndarray:
        spoken = self.spoken_text(text)
        ids = [self.token_to_id[c] for c in spoken]
        if not ids:
            raise ValueError(f"no synthesizable tokens in {text!r}")
        spk = (self.rng.integers(0, self.n_speakers)
               if speaker is None else speaker)
        inputs = {
            self.session.get_inputs()[0].name:
                np.asarray([ids], np.int64),
            self.session.get_inputs()[1].name:
                np.asarray([spk], np.int64),
        }
        wav = self.session.run(None, inputs)[0]
        return np.asarray(wav, np.float32).reshape(-1)


class VoiceConverter:
    """Speaker conversion via a user-provided ONNX model (vc_aug.py)."""

    def __init__(self, model_path: str, n_speakers: int = 1882):
        ort = _require_onnxruntime()
        if not os.path.exists(model_path):
            raise FileNotFoundError(model_path)
        self.session = ort.InferenceSession(model_path)
        self.n_speakers = n_speakers
        self.rng = np.random.default_rng(0)

    def convert(self, wav: np.ndarray,
                speaker: Optional[int] = None) -> np.ndarray:
        spk = (self.rng.integers(0, self.n_speakers)
               if speaker is None else speaker)
        inputs = {
            self.session.get_inputs()[0].name:
                np.asarray(wav, np.float32).reshape(1, -1),
            self.session.get_inputs()[1].name:
                np.asarray([spk], np.int64),
        }
        out = self.session.run(None, inputs)[0]
        return np.asarray(out, np.float32).reshape(-1)


def synthesize_corpus(tts: TTSSynthesizer, texts: Sequence[str],
                      outdir: str, list_path: str,
                      per_text_speakers: int = 1) -> List[str]:
    """Generate wav+transcript pairs and a ``path<TAB>text`` list
    (tts_augment.py CLI semantics)."""
    os.makedirs(outdir, exist_ok=True)
    lines = []
    for i, text in enumerate(texts):
        # transcript = what was actually spoken (normalized + filtered),
        # NOT the raw input — digits etc. are synthesized as hanzi
        spoken = tts.spoken_text(text)
        for k in range(per_text_speakers):
            try:
                wav = tts.synthesize(text)
            except ValueError:
                continue
            path = os.path.join(outdir, f"tts_{i:06d}_{k}.wav")
            write_wav(path, wav, tts.sample_rate)
            lines.append(f"{path}\t{spoken}")
    with open(list_path, "w", encoding="utf-8") as f:
        f.write("\n".join(lines) + ("\n" if lines else ""))
    return lines
