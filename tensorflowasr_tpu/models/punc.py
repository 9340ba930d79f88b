"""Punctuation-recovery transformer with BERT-feature distillation head.

Re-designs the reference PuncTransformer
(punc_recover/models/punc_transformer.py:199-312 in Z-yq/TensorflowASR):

  char ids -> embedding * sqrt(d) + sincos PE
           -> N x [post-LN transformer EncoderLayer -> causal Conv1D(k=3)
              -> outer residual]                       (Encoder :199-235)
  -> Dense(768) BERT-embedding projector               (:263 — distillation
     target against a precomputed keras-bert teacher)
  -> Dense(d)
  -> (N - 1) map-encoder layers
  -> per-token punctuation-class head                  (:268)

Config (punc_settings.yml model_config): num_layers 3, d_model 64,
embedding 64, heads 8, dff 64, pe 1024 → ~600K params (README.md:183-186).

Padding mask = (ids == 0); ids 1/2 are <S>/</S> (startid/endid).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn

from tensorflowasr_tpu.models.layers import (keras_embedding_init,
                                             keras_kernel_init,
                                             positional_encoding)


@dataclasses.dataclass(frozen=True)
class PuncConfig:
    num_layers: int = 3
    d_model: int = 64
    embedding_dim: int = 64
    num_heads: int = 8
    dff: int = 64
    pe_input: int = 1024
    dropout: float = 0.1
    bert_dim: int = 768

    @classmethod
    def from_user_config(cls, config) -> "PuncConfig":
        mc = config["model_config"] or {}
        return cls(
            num_layers=mc.get("num_layers", 3),
            d_model=mc.get("d_model", 64),
            embedding_dim=mc.get("enc_embedding_dim", 64),
            num_heads=mc.get("num_heads", 8),
            dff=mc.get("dff", 64),
            pe_input=mc.get("pe_input", 1024),
            dropout=mc.get("rate", 0.1),
            bert_dim=mc.get("bert_dim", 768),
        )


class EncoderLayer(nn.Module):
    """Post-LN transformer encoder layer (punc_transformer.py:134-159)."""

    d_model: int
    num_heads: int
    dff: int
    dropout: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray,
                 training: bool = False) -> jnp.ndarray:
        # reference punc MHA projections are plain Dense(d_model)
        # (punc_transformer.py:87-91) — flax's flattened (d_in, h*hd)
        # fan equals the Keras Dense fan here, so stock glorot is exact
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, qkv_features=self.d_model,
            out_features=self.d_model, dtype=self.dtype,
            kernel_init=keras_kernel_init(),
            out_kernel_init=keras_kernel_init(), name="mha",
        )(x, inputs_k=x, mask=mask)
        attn = nn.Dropout(self.dropout, deterministic=not training)(attn)
        x = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="ln1")(x + attn)
        y = nn.Dense(self.dff, dtype=self.dtype,
                     kernel_init=keras_kernel_init(), name="ffn1")(x)
        y = nn.relu(y)
        y = nn.Dense(self.d_model, dtype=self.dtype,
                     kernel_init=keras_kernel_init(), name="ffn2")(y)
        y = nn.Dropout(self.dropout, deterministic=not training)(y)
        return nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32,
                            name="ln2")(x + y)


class PuncTransformer(nn.Module):
    """(char ids [B, T]) -> (punc logits [B, T, n_classes],
    bert features [B, T, 768])."""

    cfg: PuncConfig
    vocab_size: int
    num_punc_classes: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, ids: jnp.ndarray, training: bool = False
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        c = self.cfg
        t = ids.shape[1]
        # attention mask: keys at pad positions (id 0) are masked
        # (create_padding_mask, punc_transformer.py:26-33)
        key_ok = (ids != 0)[:, None, None, :]                  # [B,1,1,T]

        x = nn.Embed(self.vocab_size, c.embedding_dim, dtype=self.dtype,
                     embedding_init=keras_embedding_init(),
                     name="embedding")(ids)
        x = x * jnp.sqrt(jnp.asarray(c.d_model, jnp.float32))
        pe = jnp.asarray(positional_encoding(c.pe_input, c.embedding_dim))
        x = x + pe[None, :t]
        x = nn.Dropout(c.dropout, deterministic=not training)(x)
        x = nn.Dense(c.d_model, dtype=self.dtype,
                     kernel_init=keras_kernel_init(),
                     name="input_projecter")(x)
        x = nn.elu(x)
        for i in range(c.num_layers):
            plus = x
            x = EncoderLayer(c.d_model, c.num_heads, c.dff, c.dropout,
                             dtype=self.dtype, name=f"enc_layer_{i}")(
                x, key_ok, training)
            x = nn.relu(nn.Conv(c.d_model, (3,), padding=[(2, 0)],
                                dtype=self.dtype,
                                kernel_init=keras_kernel_init(),
                                name=f"cnn_{i}")(x))
            x = x + plus

        bert_out = nn.Dense(c.bert_dim, dtype=jnp.float32,
                            kernel_init=keras_kernel_init(),
                            name="to_bert_embedding")(x)
        y = nn.Dense(c.d_model, dtype=self.dtype,
                     kernel_init=keras_kernel_init(),
                     name="to_hidden_state")(bert_out)
        for i in range(max(c.num_layers - 1, 1)):
            y = EncoderLayer(c.d_model, c.num_heads, c.dff, c.dropout,
                             dtype=self.dtype, name=f"map_layer_{i}")(
                y, key_ok, training)
        logits = nn.Dense(self.num_punc_classes, dtype=jnp.float32,
                          kernel_init=keras_kernel_init(),
                          name="final_bd_layer")(y)
        return logits, bert_out
