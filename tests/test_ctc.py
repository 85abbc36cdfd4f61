"""CTC loss tests vs torch.nn.CTCLoss (CPU numerical oracle) and tiny
hand-checkable lattices (SURVEY.md §4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from e2e_asr_tpu.ops.ctc import ctc_forward_scan, ctc_loss, extend_labels


def make_case(rng, b=3, t=20, v=7, lmax=6):
    logits = rng.randn(b, t, v).astype(np.float32)
    log_probs = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    input_len = np.array([t, t - 3, t - 7])[:b]
    labels = rng.randint(1, v, size=(b, lmax)).astype(np.int32)
    label_len = np.array([lmax, lmax - 2, lmax - 4])[:b]
    for i in range(b):
        labels[i, label_len[i] :] = 0
    return logits, log_probs, input_len, labels, label_len


def torch_ctc(logits, input_len, labels, label_len):
    lp = torch.log_softmax(torch.tensor(logits), dim=-1).transpose(0, 1)  # [T,B,V]
    loss = torch.nn.CTCLoss(blank=0, reduction="none", zero_infinity=False)
    targets = torch.tensor(
        np.concatenate([labels[i, : label_len[i]] for i in range(len(labels))])
    )
    return loss(
        lp, targets, torch.tensor(input_len), torch.tensor(label_len)
    ).numpy()


def test_extend_labels():
    ext = extend_labels(jnp.asarray([[3, 5, 0]]))
    np.testing.assert_array_equal(np.asarray(ext), [[0, 3, 0, 5, 0, 0, 0]])


@pytest.mark.parametrize("impl", ["scan", "pallas"])
def test_ctc_matches_torch(impl):
    rng = np.random.RandomState(0)
    logits, log_probs, input_len, labels, label_len = make_case(rng)
    ours = ctc_loss(
        log_probs, jnp.asarray(input_len), jnp.asarray(labels), jnp.asarray(label_len), impl=impl
    )
    gold = torch_ctc(logits, input_len, labels, label_len)
    np.testing.assert_allclose(np.asarray(ours), gold, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("impl", ["scan", "pallas"])
def test_ctc_grad_matches_torch(impl):
    rng = np.random.RandomState(1)
    logits, _, input_len, labels, label_len = make_case(rng, b=2, t=15, v=6, lmax=5)

    def loss_fn(lg):
        lp = jax.nn.log_softmax(lg, axis=-1)
        return ctc_loss(
            lp, jnp.asarray(input_len[:2]), jnp.asarray(labels), jnp.asarray(label_len[:2]), impl=impl
        ).sum()

    g_ours = jax.grad(loss_fn)(jnp.asarray(logits))

    lg_t = torch.tensor(logits, requires_grad=True)
    lp_t = torch.log_softmax(lg_t, dim=-1).transpose(0, 1)
    targets = torch.tensor(
        np.concatenate([labels[i, : label_len[i]] for i in range(2)])
    )
    loss_t = torch.nn.CTCLoss(blank=0, reduction="sum")(
        lp_t, targets, torch.tensor(input_len[:2]), torch.tensor(label_len[:2])
    )
    loss_t.backward()
    np.testing.assert_allclose(np.asarray(g_ours), lg_t.grad.numpy(), rtol=1e-3, atol=1e-4)


def test_ctc_tiny_lattice_by_hand():
    """T=2, single label 'a': P = p1(a)p2(blank)+p1(blank)p2(a)+p1(a)p2(a)."""
    p = np.log(np.array([[[0.6, 0.3, 0.1], [0.5, 0.4, 0.1]]], dtype=np.float32))
    nll = ctc_forward_scan(
        jnp.asarray(p), jnp.asarray([2]), jnp.asarray([[1]]), jnp.asarray([1])
    )
    expected = -np.log(0.3 * 0.5 + 0.6 * 0.4 + 0.3 * 0.4)
    np.testing.assert_allclose(float(nll[0]), expected, rtol=1e-5)


def test_ctc_infeasible_is_inf():
    """Label longer than input frames -> +inf (zero_infinity=False parity)."""
    rng = np.random.RandomState(2)
    lp = jax.nn.log_softmax(jnp.asarray(rng.randn(1, 3, 5).astype(np.float32)), -1)
    nll = ctc_loss(lp, jnp.asarray([3]), jnp.asarray([[1, 2, 1, 2]]), jnp.asarray([4]), impl="scan")
    assert not bool(jnp.isfinite(nll[0]))
    nll0 = ctc_loss(
        lp, jnp.asarray([3]), jnp.asarray([[1, 2, 1, 2]]), jnp.asarray([4]),
        impl="scan", zero_infinity=True,
    )
    assert float(nll0[0]) == 0.0


def test_ctc_padding_invariance():
    """Extra padded time frames must not change the loss."""
    rng = np.random.RandomState(3)
    logits = rng.randn(1, 10, 6).astype(np.float32)
    lp = jax.nn.log_softmax(jnp.asarray(logits), -1)
    lp_padded = jnp.pad(lp, ((0, 0), (0, 7), (0, 0)))
    labels = jnp.asarray([[2, 3, 4, 0]])
    a = ctc_loss(lp, jnp.asarray([10]), labels, jnp.asarray([3]), impl="scan")
    b = ctc_loss(lp_padded, jnp.asarray([10]), labels, jnp.asarray([3]), impl="scan")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_ctc_pallas_small_chunk_matches_scan(monkeypatch):
    """The VMEM-aware chunk picker can drop the batch chunk below 8 (960h
    bucket: T=768, S_pad=1152 -> bc=4), which switches the length vectors
    to full-array specs sliced by program_id. Force that path via the
    E2E_CTC_VMEM_LIMIT test hook and pin value+grad parity vs the scan."""
    rng = np.random.RandomState(7)
    logits, log_probs, input_len, labels, label_len = make_case(rng)
    monkeypatch.setenv("E2E_CTC_VMEM_LIMIT", "1")  # -> bc=1, pid-sliced path

    def loss(lp):
        return jnp.sum(
            ctc_loss(lp, jnp.asarray(input_len), jnp.asarray(labels),
                     jnp.asarray(label_len), impl="pallas")
        )

    v, g = jax.value_and_grad(loss)(log_probs)

    def loss_scan(lp):
        return jnp.sum(
            ctc_loss(lp, jnp.asarray(input_len), jnp.asarray(labels),
                     jnp.asarray(label_len), impl="scan")
        )

    v2, g2 = jax.value_and_grad(loss_scan)(log_probs)
    np.testing.assert_allclose(np.asarray(v), np.asarray(v2), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g2), rtol=1e-3, atol=1e-4)
