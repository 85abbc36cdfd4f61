"""Primitive layers as explicit parameter pytrees + pure apply functions.

Design stance: the model stack is written functionally (params are nested
dicts of jnp arrays, apply functions are pure) rather than through a module
framework. Every sequential loop in this codebase — teacher-forced decoding,
beam search, LM fusion — scans over per-step cell functions while injecting
externally-managed state; explicit pytrees make that trivial and keep the
whole model `jax.jit`/`pjit`-transparent.

Initialization conventions follow the reference's (src/util.py init_weights /
init_gate): uniform fan-in init like torch defaults, LSTM forget-gate bias 1.
"""

from __future__ import annotations

import math
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from e2e_asr_tpu.ops.rnn import LSTMWeights

Params = Dict[str, object]


def uniform(key, shape, bound):
    return jax.random.uniform(key, shape, jnp.float32, -bound, bound)


def dense_init(key, d_in: int, d_out: int, bias: bool = True) -> Params:
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(d_in)
    p = {"w": uniform(kw, (d_in, d_out), bound)}
    if bias:
        p["b"] = uniform(kb, (d_out,), bound)
    return p


def dense(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    y = x @ p["w"].astype(x.dtype)
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def embedding_init(key, vocab: int, dim: int) -> Params:
    return {"table": jax.random.normal(key, (vocab, dim)) * (1.0 / math.sqrt(dim))}


def embed(p: Params, ids: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    return p["table"].astype(dtype)[ids]


def layernorm_init(dim: int) -> Params:
    return {"scale": jnp.ones((dim,)), "bias": jnp.zeros((dim,))}


def layernorm(p: Params, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    mean = jnp.mean(x, -1, keepdims=True)
    var = jnp.mean((x - mean) ** 2, -1, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    return y * p["scale"].astype(x.dtype) + p["bias"].astype(x.dtype)


def lstm_init(
    key, d_in: int, dim: int, gates: int = 4, forget_bias: float = 1.0
) -> LSTMWeights:
    """Torch-style uniform(-1/sqrt(H), 1/sqrt(H)); forget-gate bias -> 1
    (ref: src/util.py init_gate)."""
    k1, k2, k3 = jax.random.split(key, 3)
    bound = 1.0 / math.sqrt(dim)
    b = uniform(k3, (gates * dim,), bound)
    if gates == 4 and forget_bias:
        b = b.at[dim : 2 * dim].set(forget_bias)
    return LSTMWeights(
        uniform(k1, (d_in, gates * dim), bound), uniform(k2, (dim, gates * dim), bound), b
    )


def conv2d_init(key, h: int, w: int, c_in: int, c_out: int) -> Params:
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(h * w * c_in)
    return {"w": uniform(kw, (h, w, c_in, c_out), bound), "b": uniform(kb, (c_out,), bound)}


def conv2d(p: Params, x: jnp.ndarray, stride=(1, 1), padding="SAME") -> jnp.ndarray:
    """x: [B, H, W, C] (NHWC), weights HWIO."""
    y = jax.lax.conv_general_dilated(
        x,
        p["w"].astype(x.dtype),
        window_strides=stride,
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + p["b"].astype(x.dtype)


def conv1d_init(key, k: int, c_in: int, c_out: int) -> Params:
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(k * c_in)
    return {"w": uniform(kw, (k, c_in, c_out), bound), "b": uniform(kb, (c_out,), bound)}


def conv1d(p: Params, x: jnp.ndarray, stride: int = 1, padding="SAME") -> jnp.ndarray:
    """x: [B, T, C]."""
    y = jax.lax.conv_general_dilated(
        x,
        p["w"].astype(x.dtype),
        window_strides=(stride,),
        padding=padding,
        dimension_numbers=("NTC", "TIO", "NTC"),
    )
    return y + p["b"].astype(x.dtype)


def maxpool2d(x: jnp.ndarray, window=(2, 2)) -> jnp.ndarray:
    """[B, H, W, C] floor-mode max pool (torch MaxPool2d semantics)."""
    b, h, w, c = x.shape
    h2, w2 = h // window[0], w // window[1]
    x = x[:, : h2 * window[0], : w2 * window[1]]
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        (1, window[0], window[1], 1),
        (1, window[0], window[1], 1),
        "VALID",
    )


def dropout(x: jnp.ndarray, rate: float, rng: Optional[jax.Array], train: bool) -> jnp.ndarray:
    if not train or rate <= 0.0 or rng is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)
