"""CTC loss (negative log likelihood) on TPU.

The reference trains its CTC head with the cuDNN/ATen native kernel behind
``torch.nn.CTCLoss(blank=0, zero_infinity=False)`` (ref: bin/train_asr.py
set_model, main.py --cudnn-ctc flag). Here:

- `ctc_forward_scan`: the semantics-defining implementation — log-space
  forward (alpha) recursion over the 2L+1 extended label lattice expressed
  as `jax.lax.scan` over time; gradients via JAX autodiff through the scan.
- `ops/ctc_pallas.py`: the production Pallas kernel — alpha+beta passes in
  VMEM with an analytic `jax.custom_vjp` gradient; validated against this
  scan version and against torch.nn.CTCLoss (CPU oracle) in tests.

Conventions follow the reference: blank id 0, per-utterance loss is the
*sum* over the label sequence (torch reduction='none' semantics), invalid
utterances (T < |ext lattice| path requirement) yield +inf unless
`zero_infinity`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1.0e30


def extend_labels(labels: jnp.ndarray) -> jnp.ndarray:
    """[B, L] -> [B, 2L+1] blank-interleaved lattice labels (blank=0)."""
    b, l = labels.shape
    ext = jnp.zeros((b, 2 * l + 1), dtype=labels.dtype)
    return ext.at[:, 1::2].set(labels)


def _logsumexp3(a, b, c):
    m = jnp.maximum(jnp.maximum(a, b), c)
    m_safe = jnp.maximum(m, NEG_INF)
    out = m_safe + jnp.log(
        jnp.exp(a - m_safe) + jnp.exp(b - m_safe) + jnp.exp(c - m_safe)
    )
    return jnp.where(m > NEG_INF / 2, out, NEG_INF)


def _shift_right(x: jnp.ndarray, n: int) -> jnp.ndarray:
    """alpha[..., s] -> alpha[..., s-n] with NEG_INF fill."""
    pad = [(0, 0)] * (x.ndim - 1) + [(n, 0)]
    return jnp.pad(x, pad, constant_values=NEG_INF)[..., : x.shape[-1]]


def ctc_forward_scan(
    log_probs: jnp.ndarray,
    input_len: jnp.ndarray,
    labels: jnp.ndarray,
    label_len: jnp.ndarray,
) -> jnp.ndarray:
    """Per-utterance CTC negative log-likelihood.

    log_probs: [B, T, V] log-softmax outputs. input_len: [B] valid frames.
    labels: [B, L] (0-padded, 0 is blank so padding is inert). label_len: [B].
    Returns [B] nll (may be +inf for infeasible alignments).
    """
    b, t, _ = log_probs.shape
    ext = extend_labels(labels)  # [B, S]
    s = ext.shape[1]
    # gather lattice emissions once: [T, B, S]
    lp_ext = jnp.take_along_axis(log_probs, ext[:, None, :], axis=2)
    lp_ext = jnp.moveaxis(lp_ext, 0, 1)

    allow_skip = (
        (jnp.arange(s)[None, :] >= 2) & (ext != 0) & (ext != _shift_right(ext.astype(jnp.int32), 2))
    )

    # start states: blank at s=0 always, first label at s=1 when it exists
    sidx = jnp.arange(s)[None, :]
    alpha0 = jnp.where((sidx == 0) | ((sidx == 1) & (label_len[:, None] > 0)), lp_ext[0], NEG_INF)

    def step(alpha, inp):
        lp_t, tt = inp
        a1 = alpha
        a2 = _shift_right(alpha, 1)
        a3 = jnp.where(allow_skip, _shift_right(alpha, 2), NEG_INF)
        new = _logsumexp3(a1, a2, a3) + lp_t
        new = jnp.where((tt < input_len)[:, None], new, alpha)
        return new, None

    ts = jnp.arange(1, t)
    alpha, _ = jax.lax.scan(step, alpha0, (lp_ext[1:], ts))

    # log-lik = logsumexp(alpha[2*label_len], alpha[2*label_len - 1])
    end = 2 * label_len
    a_end = jnp.take_along_axis(alpha, end[:, None], axis=1)[:, 0]
    a_pre = jnp.where(
        label_len > 0,
        jnp.take_along_axis(alpha, jnp.maximum(end - 1, 0)[:, None], axis=1)[:, 0],
        NEG_INF,
    )
    m = jnp.maximum(a_end, a_pre)
    m_safe = jnp.maximum(m, NEG_INF)
    ll = jnp.where(
        m > NEG_INF / 2,
        m_safe + jnp.log(jnp.exp(a_end - m_safe) + jnp.exp(a_pre - m_safe)),
        -jnp.inf,
    )
    return -ll


def ctc_loss(
    log_probs: jnp.ndarray,
    input_len: jnp.ndarray,
    labels: jnp.ndarray,
    label_len: jnp.ndarray,
    zero_infinity: bool = False,
    impl: str = "auto",
) -> jnp.ndarray:
    """Batched CTC nll, mean-ready [B]. impl: 'auto' | 'pallas' | 'scan'.

    'auto' = the Pallas lattice kernel on TPU (faster and ~100x cheaper to
    compile than autodiff-through-scan), the scan reference elsewhere
    (Pallas interpret mode on CPU is debug-only slow).

    ref: torch.nn.CTCLoss(blank=0, zero_infinity=False) usage in
    bin/train_asr.py — the reference feeds (T, B, V) log-probs; we keep
    batch-major [B, T, V] (TPU layout: batch outer, lanes on vocab).
    """
    if impl == "auto":
        import os

        impl = os.environ.get(
            "E2E_CTC_IMPL", "pallas" if jax.default_backend() == "tpu" else "scan"
        )
    if impl == "pallas":
        from e2e_asr_tpu.ops.ctc_pallas import ctc_loss_pallas

        nll = ctc_loss_pallas(log_probs, input_len, labels, label_len)
    else:
        nll = ctc_forward_scan(log_probs, input_len, labels, label_len)
    if zero_infinity:
        nll = jnp.where(jnp.isfinite(nll), nll, 0.0)
    return nll
