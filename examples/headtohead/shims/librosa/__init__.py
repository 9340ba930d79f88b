"""librosa shim (examples/headtohead): just enough surface for the
reference framework's training path — ``librosa.load`` on 16 kHz PCM
wavs (utils/speech_featurizers.py:12) and the module import in
augmentations/augments.py (whose librosa-using augmenters stay
inactive in the head-to-head config)."""

import numpy as np
from scipy.io import wavfile


def load(path, sr=None, mono=True):
    rate, data = wavfile.read(path)
    if data.dtype == np.int16:
        data = data.astype(np.float32) / 32768.0
    elif data.dtype == np.int32:
        data = data.astype(np.float32) / 2147483648.0
    else:
        data = data.astype(np.float32)
    if data.ndim > 1 and mono:
        data = data.mean(axis=1)
    if sr is not None and sr != rate:
        raise NotImplementedError(
            f"librosa shim: resample {rate}->{sr} not supported "
            f"(head-to-head corpus is already at the target rate)")
    return data, rate


def resample(y, orig_sr, target_sr, **kwargs):
    if orig_sr == target_sr:
        return y
    raise NotImplementedError("librosa shim: resample not supported")


class effects:
    """librosa.effects surface for the reference VAD dataloader
    (vad/dataloaders/vad_dataloader.py:105: energy split at top_db=20).
    Delegates to OUR effects_split so both frameworks label the shared
    VAD corpus with the identical energy rule."""

    @staticmethod
    def split(y, top_db=60, frame_length=2048, hop_length=512, **kwargs):
        import jax
        jax.config.update("jax_platforms", "cpu")
        from tensorflowasr_tpu.data.vad_dataloader import effects_split
        return effects_split(y, top_db=top_db, frame_length=frame_length,
                             hop_length=hop_length)


def stft(*args, **kwargs):
    raise NotImplementedError("librosa shim: stft (SpecAug must be off)")


def istft(*args, **kwargs):
    raise NotImplementedError("librosa shim: istft (SpecAug must be off)")


class _Filters:
    """librosa.filters surface used by the reference's Melspectrogram
    layer (asr/models/layers/backend.py:22,58). The Slaney mel basis is
    OUR implementation (ops/frontend.py mel_filterbank, itself validated
    against tf.signal/librosa goldens) so both frameworks run the exact
    same filterbank."""

    @staticmethod
    def get_window(name, n, fftbins=True):
        assert name == "hann"
        denom = n if fftbins else n - 1
        return (0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / denom))

    @staticmethod
    def mel(sr, n_fft, n_mels=128, fmin=0.0, fmax=None, htk=False, norm=1):
        import jax  # pin to CPU BEFORE our frontend module pulls jax in
        jax.config.update("jax_platforms", "cpu")
        from tensorflowasr_tpu.ops.frontend import mel_filterbank
        return mel_filterbank(sr, n_fft, n_mels=n_mels, fmin=fmin,
                              fmax=fmax, htk=htk, norm=norm).T


filters = _Filters()


def fft_frequencies(sr, n_fft):
    return np.linspace(0.0, sr / 2.0, n_fft // 2 + 1)


class _Util:
    @staticmethod
    def normalize(x, norm=1, axis=1):
        raise NotImplementedError("librosa shim: util.normalize (log "
                                  "filterbank unused)")


util = _Util()
