"""Offline (whole-file) ASR session.

Re-designs the reference offline_asr_session.py:15-98: load a wav at 16 kHz,
segment with the (8 kHz) offline VAD, then per segment run block-streaming
ASR decode + punctuation.
"""

from __future__ import annotations

import logging
from typing import List, Optional

import numpy as np

from tensorflowasr_tpu.serve.engines import ASREngine, PuncEngine, VADEngine
from tensorflowasr_tpu.serve.vad_machine import OfflineVADSegmenter
from tensorflowasr_tpu.utils.audio import read_wav

logger = logging.getLogger(__name__)


class OfflineASRSession:
    def __init__(self, asr: ASREngine, vad: Optional[VADEngine] = None,
                 punc: Optional[PuncEngine] = None,
                 sample_rate: int = 16000, vad_sample_rate: int = 8000,
                 min_punc_chars: int = 5):
        self.asr = asr
        self.punc = punc
        self.sample_rate = sample_rate
        self.vad_downsample = max(1, sample_rate // vad_sample_rate)
        self.min_punc_chars = min_punc_chars
        self.segmenter = (OfflineVADSegmenter(
            vad.inference, sample_rate=vad_sample_rate,
            frame_input=vad.frame_input) if vad is not None else None)

    def _decode_segment(self, seg_wav: np.ndarray) -> List[str]:
        chunk = self.asr.chunk_samples
        encs = []
        for start in range(0, len(seg_wav), chunk):
            piece = seg_wav[start:start + chunk]
            if len(piece) < 400:
                continue
            encs.append(self.asr.extract_feature(piece))
        result = self.asr.decode(encs)
        if self.punc is not None and len(result) >= self.min_punc_chars:
            result = self.punc.punc_recover(result)
        return result

    def transcribe_wav(self, wav: np.ndarray) -> List[dict]:
        """float32 waveform at ``sample_rate`` -> list of
        {start_s, end_s, text} segments."""
        if self.segmenter is not None:
            vad_wav = wav[::self.vad_downsample]
            segs = self.segmenter.segment(vad_wav)
            segs = [(s * self.vad_downsample, e * self.vad_downsample)
                    for s, e in segs]
        else:
            segs = [(0, len(wav))]
        out = []
        for s, e in segs:
            text = "".join(self._decode_segment(wav[s:e]))
            out.append({"start_s": s / self.sample_rate,
                        "end_s": e / self.sample_rate, "text": text})
        return out

    def transcribe_file(self, path: str) -> List[dict]:
        wav, _ = read_wav(path, target_sr=self.sample_rate)
        return self.transcribe_wav(wav)
