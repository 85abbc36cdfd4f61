"""Listener encoder: VGG/CNN prenet + pyramidal (Bi)LSTM/GRU stack.

Capability parity with the reference's src/module.py:
- VGGExtractor (~module.py VGGExtractor): channel count inferred from the
  feature dim (13/26/39 MFCC -> 1/2/3 ch; 40/80/120 fbank likewise), two
  3x3-conv pairs (64, 128) each followed by 2x2 maxpool => 4x time and 4x
  freq downsampling, output re-flattened to [B, T/4, 128*(D/4)].
- CNNExtractor (~module.py CNNExtractor): two strided 1-D convs, 4x time
  downsample.
- RNNLayer (~module.py RNNLayer): uni/bi LSTM/GRU + optional layer-norm,
  dropout, tanh projection; pyramidal downsampling `sample_rate` with
  sample_style 'drop' (subsample frames) or 'concat' (stack adjacent pairs).
- Encoder (~module.py Encoder): prenet + per-layer list config.

TPU-first notes: recurrences are the masked `lax.scan` cells from
ops/rnn.py (input projections hoisted onto the MXU); pyramid 'concat' keeps
matmul widths MXU-friendly; all downsampling arithmetic is static so XLA
sees fixed shapes, with per-utterance valid lengths carried separately.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from e2e_asr_tpu.config import EncoderConfig
from e2e_asr_tpu.models import layers as L
from e2e_asr_tpu.ops import rnn as rnn_ops

Params = Dict[str, object]


# ---------------------------------------------------------------- VGG prenet
def infer_vgg_channels(feat_dim: int) -> Tuple[int, int]:
    """feat_dim -> (channels, base_dim). ref: VGGExtractor.check_dim."""
    for base in (13, 40, 80):
        if feat_dim % base == 0 and feat_dim // base in (1, 2, 3):
            return feat_dim // base, base
    raise ValueError(f"cannot infer VGG channels from feat_dim={feat_dim}")


def vgg_init(key, feat_dim: int) -> Tuple[Params, int]:
    ch, base = infer_vgg_channels(feat_dim)
    ks = jax.random.split(key, 4)
    p = {
        "conv1": L.conv2d_init(ks[0], 3, 3, ch, 64),
        "conv2": L.conv2d_init(ks[1], 3, 3, 64, 64),
        "conv3": L.conv2d_init(ks[2], 3, 3, 64, 128),
        "conv4": L.conv2d_init(ks[3], 3, 3, 128, 128),
    }
    out_dim = 128 * ((base // 2) // 2)
    return p, out_dim


def vgg_apply(p: Params, x: jnp.ndarray, x_len: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """[B, T, D] -> [B, T//4, 128*(base//4)], len//4."""
    b, t, d = x.shape
    ch, base = infer_vgg_channels(d)
    h = x.reshape(b, t, ch, base).transpose(0, 1, 3, 2)  # NHWC: [B, T, base, ch]
    h = jax.nn.relu(L.conv2d(p["conv1"], h))
    h = jax.nn.relu(L.conv2d(p["conv2"], h))
    h = L.maxpool2d(h)
    h = jax.nn.relu(L.conv2d(p["conv3"], h))
    h = jax.nn.relu(L.conv2d(p["conv4"], h))
    h = L.maxpool2d(h)
    b2, t2, f2, c2 = h.shape
    out = h.transpose(0, 1, 3, 2).reshape(b2, t2, c2 * f2)
    return out, x_len // 4


# ---------------------------------------------------------------- CNN prenet
def cnn_init(key, feat_dim: int, out_dim: int) -> Tuple[Params, int]:
    k1, k2 = jax.random.split(key)
    return (
        {
            "conv1": L.conv1d_init(k1, 3, feat_dim, out_dim),
            "conv2": L.conv1d_init(k2, 3, out_dim, out_dim),
        },
        out_dim,
    )


def cnn_apply(p: Params, x: jnp.ndarray, x_len: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    h = jax.nn.relu(L.conv1d(p["conv1"], x, stride=2))
    h = jax.nn.relu(L.conv1d(p["conv2"], h, stride=2))
    return h, x_len // 4


# ----------------------------------------------------------------- RNN layer
def rnn_layer_init(
    key,
    in_dim: int,
    dim: int,
    module: str,
    bidirectional: bool,
    layer_norm: bool,
    proj: bool,
    sample_rate: int,
    sample_style: str,
) -> Tuple[Params, int]:
    gates = 4 if module.upper() == "LSTM" else 3
    ks = jax.random.split(key, 3)
    p: Params = {"fwd": L.lstm_init(ks[0], in_dim, dim, gates)}
    out_dim = dim
    if bidirectional:
        p["bwd"] = L.lstm_init(ks[1], in_dim, dim, gates)
        out_dim = 2 * dim
    if sample_rate > 1 and sample_style == "concat":
        out_dim = out_dim * sample_rate
    if layer_norm:
        p["ln"] = L.layernorm_init(out_dim)
    if proj:
        p["proj"] = L.dense_init(ks[2], out_dim, out_dim)
    return p, out_dim


def rnn_layer_apply(
    p: Params,
    x: jnp.ndarray,
    x_len: jnp.ndarray,
    module: str,
    sample_rate: int,
    sample_style: str,
    dropout: float,
    rng,
    train: bool,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    cell = "lstm" if module.upper() == "LSTM" else "gru"
    if "bwd" in p:
        # single-scan bidirectional (2B rows per step; see ops/rnn.bidir)
        out = rnn_ops.bidir(x, x_len, p["fwd"], p["bwd"], cell=cell)
    else:
        run = rnn_ops.lstm if cell == "lstm" else rnn_ops.gru
        out = run(x, x_len, p["fwd"])[0]
    # pyramidal time downsample (ref: RNNLayer sample_rate/sample_style)
    if sample_rate > 1:
        b, t, d = out.shape
        t2 = t // sample_rate
        if sample_style == "drop":
            out = out[:, :: sample_rate][:, :t2]
        elif sample_style == "concat":
            out = out[:, : t2 * sample_rate].reshape(b, t2, d * sample_rate)
        else:
            raise ValueError(f"unknown sample_style {sample_style}")
        x_len = x_len // sample_rate
    if "ln" in p:
        out = L.layernorm(p["ln"], out)
    out = L.dropout(out, dropout, rng, train)
    if "proj" in p:
        out = jnp.tanh(L.dense(p["proj"], out))
    # re-mask after downsample/proj so padding stays exactly zero
    mask = (jnp.arange(out.shape[1])[None, :] < x_len[:, None])[..., None]
    return jnp.where(mask, out, 0.0), x_len


# ------------------------------------------------------------------- Encoder
def encoder_init(key, feat_dim: int, cfg: EncoderConfig) -> Tuple[Params, int]:
    p: Params = {}
    dim = feat_dim
    keys = jax.random.split(key, len(cfg.dim) + 1)
    if cfg.prenet == "vgg":
        p["prenet"], dim = vgg_init(keys[0], feat_dim)
    elif cfg.prenet == "cnn":
        p["prenet"], dim = cnn_init(keys[0], feat_dim, cfg.dim[0])
    elif cfg.prenet not in ("", None):
        raise ValueError(f"unknown prenet {cfg.prenet}")
    p["layers"] = []
    for i, ldim in enumerate(cfg.dim):
        lp, dim = rnn_layer_init(
            keys[i + 1],
            dim,
            ldim,
            cfg.module,
            cfg.bidirection,
            cfg.layer_norm[i],
            cfg.proj[i],
            cfg.sample_rate[i],
            cfg.sample_style,
        )
        p["layers"].append(lp)
    return p, dim


def encoder_apply(
    p: Params,
    cfg: EncoderConfig,
    feat: jnp.ndarray,
    feat_len: jnp.ndarray,
    rng=None,
    train: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """[B, T, D] -> (enc [B, S, H], enc_len [B])."""
    x, x_len = feat, feat_len
    if cfg.prenet == "vgg":
        x, x_len = vgg_apply(p["prenet"], x, x_len)
    elif cfg.prenet == "cnn":
        x, x_len = cnn_apply(p["prenet"], x, x_len)
    rngs = jax.random.split(rng, len(p["layers"])) if rng is not None else [None] * len(p["layers"])
    for i, lp in enumerate(p["layers"]):
        x, x_len = rnn_layer_apply(
            lp,
            x,
            x_len,
            cfg.module,
            cfg.sample_rate[i],
            cfg.sample_style,
            cfg.dropout[i],
            rngs[i],
            train,
        )
    return x, jnp.maximum(x_len, 1)


def total_downsample(cfg: EncoderConfig) -> int:
    ds = 4 if cfg.prenet in ("vgg", "cnn") else 1
    for s in cfg.sample_rate:
        ds *= s
    return ds
