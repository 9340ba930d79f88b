"""CNN voice-activity-detection models (online causal / offline dilated).

Re-designs the reference's tiny VAD CNNs (vad/models/vad_model.py:6-116 in
Z-yq/TensorflowASR) as flax modules. Input is RAW framed waveform
[B, n_frames, frame_input] (frame_input = 80 samples = 10 ms at 8 kHz);
outputs are (voice logits [B, n_frames, 1], masked-waveform reconstruction
[B, n_frames, frame_input] = inputs * predicted mask) — the second head is
trained with a multi-resolution STFT denoising loss
(vad/trainer/vad_trainer.py:56-57).

~80K params at dmodel=32 (README.md:177-179: 80K params, RTF 0.0001).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from tensorflowasr_tpu.models.layers import keras_kernel_init


class OnlineVAD(nn.Module):
    """Causal variant — streamable frame by frame
    (vad_model.py:6-59: Dense -> pw conv -> causal Conv1D(k=3) stack)."""

    dmodel: int = 32
    frame_input: int = 80
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False):
        h = nn.Dense(self.dmodel, dtype=self.dtype, kernel_init=keras_kernel_init(), name="embed")(x)
        h = nn.relu(nn.Dense(self.dmodel, dtype=self.dtype, kernel_init=keras_kernel_init(), name="dense1")(h))
        h = nn.relu(nn.Conv(self.dmodel * 2, (3,), padding=[(2, 0)],
                            dtype=self.dtype, kernel_init=keras_kernel_init(), name="cnn1")(h))
        h = nn.relu(nn.Dense(self.dmodel, dtype=self.dtype, kernel_init=keras_kernel_init(), name="dense2")(h))
        h = nn.relu(nn.Conv(self.dmodel * 2, (3,), padding=[(2, 0)],
                            dtype=self.dtype, kernel_init=keras_kernel_init(), name="cnn2")(h))
        h = nn.relu(nn.Dense(self.dmodel, dtype=self.dtype, kernel_init=keras_kernel_init(), name="dense3")(h))
        logits = nn.Dense(1, dtype=jnp.float32, kernel_init=keras_kernel_init(), name="fc")(h)
        mask = nn.Dense(self.frame_input, dtype=jnp.float32,
                        kernel_init=keras_kernel_init(), name="audio_voice_mask")(h)
        return logits, x * mask

    def infer(self, x: jnp.ndarray) -> jnp.ndarray:
        """Voice logits only — the exported inference head
        (vad_model.py:44-58)."""
        return self(x, training=False)[0]


class OfflineVAD(nn.Module):
    """Dilated non-causal variant (vad_model.py:61-116: dilations
    1, 2, 4, 8 with SAME padding)."""

    dmodel: int = 32
    frame_input: int = 80
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False):
        h = nn.Dense(self.dmodel, dtype=self.dtype, kernel_init=keras_kernel_init(), name="embed")(x)
        h = nn.relu(nn.Dense(self.dmodel, dtype=self.dtype, kernel_init=keras_kernel_init(), name="dense1")(h))
        for i, d in enumerate((1, 2, 4, 8)):
            h = nn.relu(nn.Conv(self.dmodel, (5,), padding="SAME",
                                kernel_dilation=(d,), dtype=self.dtype,
                                kernel_init=keras_kernel_init(), name=f"cnn{i + 1}")(h))
        h = nn.relu(nn.Dense(self.dmodel, dtype=self.dtype, kernel_init=keras_kernel_init(), name="dense2")(h))
        logits = nn.Dense(1, dtype=jnp.float32, kernel_init=keras_kernel_init(), name="fc")(h)
        mask = nn.Dense(self.frame_input, dtype=jnp.float32,
                        kernel_init=keras_kernel_init(), name="audio_voice_mask")(h)
        return logits, x * mask

    def infer(self, x: jnp.ndarray) -> jnp.ndarray:
        return self(x, training=False)[0]
