from tensorflowasr_tpu.ops.frontend import (
    LogMelFrontendConfig,
    mel_filterbank,
    stft_kernels,
    frame_signal,
    power_spectrogram,
    log_mel_spectrogram,
    amplitude_to_db,
    chunk_amplitude_to_db,
)
from tensorflowasr_tpu.ops.ctc import (
    ctc_loss,
    ctc_greedy_decode,
    collapse_and_remove_blank,
)

__all__ = [
    "LogMelFrontendConfig",
    "mel_filterbank",
    "stft_kernels",
    "frame_signal",
    "power_spectrogram",
    "log_mel_spectrogram",
    "amplitude_to_db",
    "chunk_amplitude_to_db",
    "ctc_loss",
    "ctc_greedy_decode",
    "collapse_and_remove_blank",
]
