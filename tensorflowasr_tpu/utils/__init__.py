from tensorflowasr_tpu.utils.config import UserConfig, load_yaml
from tensorflowasr_tpu.utils.text import TextFeaturizer
from tensorflowasr_tpu.utils.audio import SpeechFeaturizer, read_wav, write_wav
from tensorflowasr_tpu.utils.metrics import levenshtein, wer, cer, ErrorRateAccumulator

__all__ = [
    "UserConfig",
    "load_yaml",
    "TextFeaturizer",
    "SpeechFeaturizer",
    "read_wav",
    "write_wav",
    "levenshtein",
    "wer",
    "cer",
    "ErrorRateAccumulator",
]
