"""Offline and block-streaming Conformer-CTC model family.

Re-designs the reference models (asr/models/conformer_blocks.py:277-614 in
Z-yq/TensorflowASR) as flax modules with the in-graph log-mel frontend:

- MelFrontend                in-graph wav -> log-mel (optionally trainable
                             filterbank — the ``mel_layer_trainable`` flag)
- ConformerEncoder           mel -> ConvSubsampling -> N x ConformerBlock
- StreamingConformerEncoder  folds fixed-size time chunks into the batch
                             axis (:567-614) — attention cost linear in
                             audio length, zero cross-chunk context
- CTCDecoder                 Dense -> M x ConformerBlock -> Dense(classes)
- Translator                 phone embedding -> N x RBlock (cross-attention
                             with PE) -> Dense(char classes)
- ConformerCTC               bundle with encode / ctc_logits / translate
                             sub-methods for functional apply

Shapes are fully static; wav inputs are [B, T] float32 (a trailing channel
axis is tolerated).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from tensorflowasr_tpu.models.layers import (
    ConformerBlock,
    ConvSubsampling,
    RBlock,
    ScannedConformerBlocks,
    keras_embedding_init,
    keras_kernel_init,
)
from tensorflowasr_tpu.ops import frontend as fe


@dataclasses.dataclass(frozen=True)
class ConformerConfig:
    """Mirror of the conformerS.yml / Streaming_ConformerS.yml model_config
    plus the speech_config fields the model needs in-graph."""

    # encoder
    dmodel: int = 144
    reduction_factor: int = 4
    num_blocks: int = 13
    head_size: int = 36
    num_heads: int = 4
    kernel_size: int = 32
    fc_factor: float = 0.5
    dropout: float = 0.1
    # ctc decoder
    ctcdecoder_num_blocks: int = 1
    ctcdecoder_kernel_size: int = 32
    ctcdecoder_fc_factor: float = 0.5
    ctcdecoder_dropout: float = 0.1
    # translator
    translator_num_blocks: int = 2
    translator_kernel_size: int = 32
    translator_fc_factor: float = 0.5
    translator_dropout: float = 0.1
    # frontend / speech
    sample_rate: int = 16000
    n_mels: int = 80
    stride_ms: int = 10
    mel_layer_type: str = "Melspectrogram"   # Melspectrogram | Spectrogram | leaf
    mel_layer_trainable: bool = False
    add_wav_info: bool = False               # add WavePickModel features
    # on-device SpecAugment (training only; ops/specaug.py — replaces the
    # reference's host-side STFT hole masking at zero host cost)
    spec_augment: bool = False
    specaug_freq_masks: int = 2
    specaug_freq_width: int = 27
    specaug_time_masks: int = 2
    specaug_time_ratio: float = 0.05
    # streaming (block) variant
    streaming: bool = False
    streaming_bucket: float = 0.5            # seconds per chunk
    # compute
    dtype_str: str = "float32"               # compute dtype for matmuls
    scan_layers: bool = False                # lax.scan over encoder blocks
    #   (stacked [L, ...] params; ~L-fold faster XLA compiles — use for
    #   deep stacks / the 17-minute fused streaming compile; param trees
    #   are NOT checkpoint-compatible with the unrolled layout)
    remat_blocks: bool = False               # jax.checkpoint each encoder
    #   block: backward recomputes block activations instead of storing
    #   them — removes the B>128 HBM activation cliff at ~1/3 extra
    #   backward FLOPs (docs/train_step_profile.md). Unrolled layout only.
    scan_unroll: int = 1                     # lax.scan unroll factor: the
    #   scan backward pays a heavy stacked-grad accumulation on TPU
    #   (70 -> 39 ms fwd+bwd for the 13-block stack when fully unrolled);
    #   set to num_blocks for training, keep 1 for inference compiles

    @property
    def dtype(self):
        return jnp.dtype(self.dtype_str)

    @property
    def hop_size(self) -> int:
        return self.sample_rate * self.stride_ms // 1000

    @property
    def chunk_samples(self) -> int:
        """Samples per streaming chunk, quantized so mel/subsample math is
        exact (reference: StreamingConformerEncoder.add_chunk_size +
        am_dataloader chunk quantization)."""
        quantum = self.hop_size * self.reduction_factor
        raw = int(self.streaming_bucket * self.sample_rate)
        return max(quantum, (raw // quantum) * quantum)

    @classmethod
    def from_user_config(cls, config) -> "ConformerConfig":
        mc = config["model_config"] or {}
        sc = config["speech_config"] or {}

        def g(d, k, default):
            v = d.get(k) if hasattr(d, "get") else None
            return default if v is None else v
        return cls(
            dmodel=g(mc, "dmodel", 144),
            reduction_factor=g(mc, "reduction_factor", 4),
            num_blocks=g(mc, "num_blocks", 13),
            head_size=g(mc, "head_size", 36),
            num_heads=g(mc, "num_heads", 4),
            kernel_size=g(mc, "kernel_size", 32),
            fc_factor=g(mc, "fc_factor", 0.5),
            dropout=g(mc, "dropout", 0.1),
            ctcdecoder_num_blocks=g(mc, "ctcdecoder_num_blocks", 1),
            ctcdecoder_kernel_size=g(mc, "ctcdecoder_kernel_size", 32),
            ctcdecoder_fc_factor=g(mc, "ctcdecoder_fc_factor", 0.5),
            ctcdecoder_dropout=g(mc, "ctcdecoder_dropout", 0.1),
            translator_num_blocks=g(mc, "translator_num_blocks", 2),
            translator_kernel_size=g(mc, "translator_kernel_size", 32),
            translator_fc_factor=g(mc, "translator_fc_factor", 0.5),
            translator_dropout=g(mc, "translator_dropout", 0.1),
            sample_rate=g(sc, "sample_rate", 16000),
            n_mels=g(sc, "num_feature_bins", 80),
            stride_ms=g(sc, "stride_ms", 10),
            mel_layer_type=g(sc, "mel_layer_type", "Melspectrogram"),
            mel_layer_trainable=g(sc, "mel_layer_trainable", False),
            add_wav_info=g(sc, "add_wav_info", False),
            spec_augment=g(sc, "spec_augment", False),
            specaug_freq_masks=g(sc, "specaug_freq_masks", 2),
            specaug_freq_width=g(sc, "specaug_freq_width", 27),
            specaug_time_masks=g(sc, "specaug_time_masks", 2),
            specaug_time_ratio=g(sc, "specaug_time_ratio", 0.05),
            streaming=g(sc, "streaming", False),
            streaming_bucket=g(sc, "streaming_bucket", 0.5),
            scan_layers=g(mc, "scan_layers", False),
            scan_unroll=g(mc, "scan_unroll", 1),
            remat_blocks=g(mc, "remat_blocks", False),
        )


def _encoder_blocks(c: "ConformerConfig", x, training):
    """The N-block conformer stack: unrolled (one named submodule per
    layer) or scanned (stacked params, ~N-fold faster compiles) depending
    on ``scan_layers``."""
    if c.scan_layers:
        return ScannedConformerBlocks(
            num_blocks=c.num_blocks, input_dim=c.dmodel, dropout=c.dropout,
            fc_factor=c.fc_factor, head_size=c.head_size,
            num_heads=c.num_heads, kernel_size=c.kernel_size,
            dtype=c.dtype, unroll=c.scan_unroll,
            name="conformer_blocks")(x, training)
    # static_argnums counts __call__ args with self at 0: training is 2
    block_cls = (nn.remat(ConformerBlock, static_argnums=(2,))
                 if c.remat_blocks else ConformerBlock)
    for i in range(c.num_blocks):
        x = block_cls(
            input_dim=c.dmodel, dropout=c.dropout,
            fc_factor=c.fc_factor, head_size=c.head_size,
            num_heads=c.num_heads, kernel_size=c.kernel_size,
            dtype=c.dtype, name=f"conformer_block_{i}",
        )(x, training)
    return x


class MelFrontend(nn.Module):
    """In-graph wav -> log-mel (or dB spectrogram / LEAF)."""

    cfg: ConformerConfig
    padding: str = "same"

    @nn.compact
    def __call__(self, wav: jnp.ndarray) -> jnp.ndarray:
        if wav.ndim == 3:
            wav = wav[..., 0]
        fcfg = fe.LogMelFrontendConfig(
            sample_rate=self.cfg.sample_rate,
            n_fft=1024,
            stride_ms=self.cfg.stride_ms,
            n_mels=self.cfg.n_mels,
            padding=self.padding,
        )
        if self.cfg.mel_layer_type == "Spectrogram":
            return fe.spectrogram_feature(wav, fcfg)
        if self.cfg.mel_layer_type == "leaf":
            from tensorflowasr_tpu.models.leaf import Leaf

            return Leaf(n_filters=self.cfg.n_mels,
                        sample_rate=self.cfg.sample_rate,
                        window_stride_ms=self.cfg.stride_ms,
                        name="leaf")(wav)
        mel_weights = None
        if self.cfg.mel_layer_trainable:
            init_fb = fe.mel_filterbank(self.cfg.sample_rate, fcfg.n_fft,
                                        self.cfg.n_mels)
            mel_weights = self.param("freq2mel",
                                     lambda key: jnp.asarray(init_fb))
        return fe.log_mel_spectrogram(wav, fcfg, mel_weights=mel_weights)


class ConformerEncoder(nn.Module):
    """wav [B, T(,1)] -> [B, ceil(ceil(T/hop)/rf), dmodel]."""

    cfg: ConformerConfig

    @nn.compact
    def __call__(self, wav: jnp.ndarray, training: bool = False
                 ) -> jnp.ndarray:
        c = self.cfg
        wav = fe.wav_to_float(wav)
        mel = MelFrontend(c, name="mel_layer")(wav)          # [B, F, n_mels]
        if training and c.spec_augment:
            from tensorflowasr_tpu.ops.specaug import spec_augment

            mel = spec_augment(
                mel, self.make_rng("dropout"),
                n_freq_masks=c.specaug_freq_masks,
                freq_width=c.specaug_freq_width,
                n_time_masks=c.specaug_time_masks,
                time_ratio=c.specaug_time_ratio)
        x = mel[..., None]                                    # channel axis
        x = ConvSubsampling(c.dmodel, c.reduction_factor, c.dropout,
                            dtype=c.dtype,
                            name="conv_subsampling")(x, training)
        if c.add_wav_info:
            from tensorflowasr_tpu.models.wav_model import WavePickModel

            wav_feat = WavePickModel(
                c.dmodel, c.hop_size * c.reduction_factor, dtype=c.dtype,
                name="wav_layer")(wav, training)
            x = x + wav_feat[:, :x.shape[1]]
        x = _encoder_blocks(c, x, training)
        return x.astype(jnp.float32)


class StreamingConformerEncoder(nn.Module):
    """Block-streaming encoder: [B, n*chunk, 1] reshaped to [B*n, chunk, 1],
    the offline stack runs per chunk, output reshaped back (reference
    conformer_blocks.py:567-614). Chunk isolation by batching — no
    cross-chunk state, so streaming inference just feeds successive chunks.
    """

    cfg: ConformerConfig

    @nn.compact
    def __call__(self, wav: jnp.ndarray, training: bool = False
                 ) -> jnp.ndarray:
        c = self.cfg
        wav = fe.wav_to_float(wav)
        if wav.ndim == 3:
            wav = wav[..., 0]
        b, t = wav.shape
        chunk = c.chunk_samples
        if t % chunk != 0:
            raise ValueError(f"input length {t} not a multiple of the "
                             f"streaming chunk {chunk}")
        x = wav.reshape(b * (t // chunk), chunk)
        mel = MelFrontend(c, name="mel_layer")(x)
        if training and c.spec_augment:
            # per-chunk masking (the chunk axis is folded into the batch);
            # time_ratio applies to the CHUNK length here
            from tensorflowasr_tpu.ops.specaug import spec_augment

            mel = spec_augment(
                mel, self.make_rng("dropout"),
                n_freq_masks=c.specaug_freq_masks,
                freq_width=c.specaug_freq_width,
                n_time_masks=c.specaug_time_masks,
                time_ratio=c.specaug_time_ratio)
        y = mel[..., None]
        y = ConvSubsampling(c.dmodel, c.reduction_factor, c.dropout,
                            dtype=c.dtype,
                            name="conv_subsampling")(y, training)
        if c.add_wav_info:
            from tensorflowasr_tpu.models.wav_model import WavePickModel

            wav_feat = WavePickModel(
                c.dmodel, c.hop_size * c.reduction_factor, dtype=c.dtype,
                name="wav_layer")(x, training)
            y = y + wav_feat[:, :y.shape[1]]
        y = _encoder_blocks(c, y, training)
        return y.reshape(b, -1, c.dmodel).astype(jnp.float32)


class CTCDecoder(nn.Module):
    """[B, T', dmodel] -> [B, T', num_classes] phone logits
    (conformer_blocks.py:385-438)."""

    cfg: ConformerConfig
    num_classes: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        c = self.cfg
        x = nn.Dense(c.dmodel, dtype=c.dtype,
                     kernel_init=keras_kernel_init(), name="project")(x)
        for i in range(c.ctcdecoder_num_blocks):
            x = ConformerBlock(
                input_dim=c.dmodel, dropout=c.ctcdecoder_dropout,
                fc_factor=c.ctcdecoder_fc_factor, head_size=c.head_size,
                num_heads=c.num_heads, kernel_size=c.ctcdecoder_kernel_size,
                dtype=c.dtype, name=f"decoder_conformer_block_{i}",
            )(x, training)
        return nn.Dense(self.num_classes, dtype=jnp.float32,
                        kernel_init=keras_kernel_init(),
                        name="fully_connected")(x)


class Translator(nn.Module):
    """(phone ids [B, U], enc [B, T', dmodel]) -> char logits [B, U, classes].

    Non-autoregressive single pass: phone embedding attends to the acoustic
    memory via cross-attention RBlocks (conformer_blocks.py:511-566).
    """

    cfg: ConformerConfig
    inp_classes: int
    tar_classes: int

    @nn.compact
    def __call__(self, phone_ids: jnp.ndarray, enc: jnp.ndarray,
                 training: bool = False) -> jnp.ndarray:
        c = self.cfg
        x = nn.Embed(self.inp_classes, c.dmodel, dtype=c.dtype,
                     embedding_init=keras_embedding_init(),
                     name="inp_embedding")(phone_ids)
        enc = enc.astype(c.dtype)
        for i in range(c.translator_num_blocks):
            x = RBlock(
                input_dim=c.dmodel, dropout=c.translator_dropout,
                fc_factor=c.translator_fc_factor, head_size=c.head_size,
                num_heads=c.num_heads, kernel_size=c.translator_kernel_size,
                dtype=c.dtype, name=f"decoder_conformer_block_{i}",
            )(x, enc, training)
        return nn.Dense(self.tar_classes, dtype=jnp.float32,
                        kernel_init=keras_kernel_init(),
                        name="fully_connected")(x)


class ConformerCTC(nn.Module):
    """Encoder + CTCDecoder + Translator bundle.

    apply with ``method=``:
      - __call__(wav, phone_ids, training) -> (enc, ctc_logits, char_logits)
      - encode(wav, training)              -> enc
      - ctc_logits(enc, training)          -> phone logits
      - translate(phone_ids, enc, training)-> char logits
    """

    cfg: ConformerConfig
    num_phone_classes: int
    num_char_classes: int

    def setup(self):
        enc_cls = (StreamingConformerEncoder if self.cfg.streaming
                   else ConformerEncoder)
        self.encoder = enc_cls(self.cfg, name="encoder")
        self.ctc_decoder = CTCDecoder(self.cfg, self.num_phone_classes,
                                      name="ctc_decoder")
        self.translator = Translator(self.cfg, self.num_phone_classes,
                                     self.num_char_classes, name="translator")

    def __call__(self, wav, phone_ids, training: bool = False
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        enc = self.encoder(wav, training)
        ctc = self.ctc_decoder(enc, training)
        char = self.translator(phone_ids, enc, training)
        return enc, ctc, char

    def train_forward(self, wav, phones, input_length,
                      training: bool = True):
        """Single-apply forward for the CTC train step: encoder -> CTC
        logits -> in-graph greedy decode -> translator on BOTH the ground
        truth phones (+5 zero pad) and the decoded phones (parity:
        ctc_runners.py:79-104). One apply keeps batch_stats mutation
        atomic across all submodules."""
        from tensorflowasr_tpu.ops.ctc import collapse_and_remove_blank

        blank_id = self.num_phone_classes - 1
        enc = self.encoder(wav, training)
        ctc_logits = self.ctc_decoder(enc, training)
        ids = jnp.argmax(
            jax.lax.stop_gradient(ctc_logits.astype(jnp.float32)), axis=-1
        ).astype(jnp.int32)
        decoded, _ = collapse_and_remove_blank(ids, input_length, blank_id)
        gt_in = jnp.concatenate(
            [phones, jnp.zeros((phones.shape[0], 5), phones.dtype)], axis=1)
        label_out = self.translator(gt_in, enc, training)
        ctc_out = self.translator(decoded, enc, training)
        return enc, ctc_logits, decoded, label_out, ctc_out

    def encode(self, wav, training: bool = False):
        return self.encoder(wav, training)

    def ctc_logits(self, enc, training: bool = False):
        return self.ctc_decoder(enc, training)

    def translate(self, phone_ids, enc, training: bool = False):
        return self.translator(phone_ids, enc, training)


def stack_encoder_block_params(encoder_tree: dict, num_blocks: int) -> dict:
    """Convert an UNROLLED encoder param/batch_stats subtree
    (conformer_block_0..N-1) to the SCANNED layout
    (conformer_blocks/scan/block with a stacked leading [N, ...] axis) so
    existing checkpoints migrate to ``scan_layers=True``."""
    import jax

    out = {k: v for k, v in encoder_tree.items()
           if not k.startswith("conformer_block_")}
    blocks = [encoder_tree[f"conformer_block_{i}"]
              for i in range(num_blocks)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *blocks)
    out["conformer_blocks"] = {"scan": {"block": stacked}}
    return out


def unstack_encoder_block_params(encoder_tree: dict) -> dict:
    """Inverse of :func:`stack_encoder_block_params`."""
    import jax

    out = {k: v for k, v in encoder_tree.items()
           if k != "conformer_blocks"}
    stacked = encoder_tree["conformer_blocks"]["scan"]["block"]
    n = jax.tree.leaves(stacked)[0].shape[0]
    for i in range(n):
        out[f"conformer_block_{i}"] = jax.tree.map(lambda x: x[i], stacked)
    return out


def count_params(params) -> int:
    """Total parameter count of a pytree (canonical definition; re-exported
    by models.chunk_conformer for backward compatibility)."""
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
