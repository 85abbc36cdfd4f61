"""loc_features (Toeplitz-matmul conv) vs lax conv1d oracle, incl. grads."""

import numpy as np
import jax
import jax.numpy as jnp

from e2e_asr_tpu.models import layers as L
from e2e_asr_tpu.models.attention import loc_features, toeplitz_bank


def conv_oracle(att, kw, b_):
    # att [B,H,S] -> conv1d NTC input [B,S,H], weights [D,H,K]
    p = {"w": kw, "b": b_}
    return L.conv1d(p, att.transpose(0, 2, 1))


def test_loc_features_matches_conv():
    rng = np.random.RandomState(0)
    for h in (1, 2):
        for d_taps in (5, 21):
            att = jnp.asarray(rng.randn(3, h, 17).astype(np.float32))
            kw = jnp.asarray(rng.randn(d_taps, h, 4).astype(np.float32))
            b_ = jnp.zeros(4)
            ours = loc_features(att, toeplitz_bank(kw, att.shape[-1]))
            gold = conv_oracle(att, kw, b_)
            np.testing.assert_allclose(np.asarray(ours), np.asarray(gold), rtol=1e-4, atol=1e-5)


def test_loc_features_grads_match_conv():
    rng = np.random.RandomState(1)
    att = jnp.asarray(rng.randn(2, 1, 13).astype(np.float32))
    kw = jnp.asarray(rng.randn(7, 1, 3).astype(np.float32))
    g = jnp.asarray(rng.randn(2, 13, 3).astype(np.float32))

    def f_ours(a, k):
        return jnp.sum(loc_features(a, toeplitz_bank(k, a.shape[-1])) * g)

    def f_gold(a, k):
        return jnp.sum(conv_oracle(a, k, jnp.zeros(3)) * g)

    ga_o, gk_o = jax.grad(f_ours, argnums=(0, 1))(att, kw)
    ga_g, gk_g = jax.grad(f_gold, argnums=(0, 1))(att, kw)
    np.testing.assert_allclose(np.asarray(ga_o), np.asarray(ga_g), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gk_o), np.asarray(gk_g), rtol=1e-4, atol=1e-5)
