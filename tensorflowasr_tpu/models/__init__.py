from tensorflowasr_tpu.models.conformer import (
    ConformerEncoder,
    StreamingConformerEncoder,
    CTCDecoder,
    Translator,
    ConformerCTC,
)

__all__ = [
    "ConformerEncoder",
    "StreamingConformerEncoder",
    "CTCDecoder",
    "Translator",
    "ConformerCTC",
]
