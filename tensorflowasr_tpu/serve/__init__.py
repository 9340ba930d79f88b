"""Serving layer: JAX inference engines + VAD state machines + streaming /
offline sessions (Python re-design of Inference/PythonInference; the C++
host under serve/cpp mirrors Inference/CppInference)."""

from tensorflowasr_tpu.serve.engines import ASREngine, PuncEngine, VADEngine
from tensorflowasr_tpu.serve.offline_session import OfflineASRSession
from tensorflowasr_tpu.serve.stream_session import StreamASRSession
from tensorflowasr_tpu.serve.vad_machine import (
    OfflineVADSegmenter,
    SilenceDetector,
    TaskContent,
)

__all__ = [
    "ASREngine", "PuncEngine", "VADEngine", "SilenceDetector",
    "TaskContent", "OfflineVADSegmenter", "StreamASRSession",
    "OfflineASRSession",
]
