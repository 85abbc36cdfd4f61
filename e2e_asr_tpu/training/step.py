"""The jitted joint CTC/attention training step, data-parallel over a mesh.

This is the TPU-native equivalent of the reference's hot loop
(bin/train_asr.py exec: fetch -> forward -> joint loss -> backward -> clip
-> NaN-skip -> step). One XLA program does: on-device Pallas feature
extraction + SpecAugment -> encoder -> both heads -> joint loss -> grads ->
clipped update, with the batch sharded over the mesh's 'data' axis so XLA
emits the gradient all-reduce over ICI (SURVEY §2.2: DP is the primary
scale-out axis; the reference is single-GPU).

Loss conventions (reference parity):
- attention head: cross-entropy with ignore_index=0 semantics (pad masked),
  mean over non-pad target tokens.
- CTC head: torch CTCLoss 'mean' semantics — per-utterance nll divided by
  label length, averaged over utterances. Labels exclude the trailing <eos>
  (the CTC lattice has no eos; divergence from feeding raw txt documented).
- joint: ctc_weight * ctc + (1 - ctc_weight) * att  (bin/train_asr.py).
- NaN/inf loss or grad-norm => the whole update is skipped, optimizer state
  untouched (ref: src/solver.py backward NaN-grad detect -> skip). Combined
  with hparas.ctc_infeasible='skip' this reproduces CTCLoss
  zero_infinity=False end-to-end; 'mask' instead trains on the feasible rows.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from e2e_asr_tpu.config import Config
from e2e_asr_tpu.models import asr as asr_mod
from e2e_asr_tpu.ops.ctc import ctc_loss
from e2e_asr_tpu.ops.frontend import compute_features
from e2e_asr_tpu.ops.specaugment import specaugment


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray  # scalar int32


def _dtype(cfg: Config):
    return jnp.bfloat16 if cfg.hparas.dtype == "bfloat16" else jnp.float32


def resolve_wav(batch: Dict[str, jnp.ndarray], n_samples: int = 0):
    """Waveform view of a batch (TPU-native input path, no ref equivalent).

    Streaming batches carry 'wav' directly (int16 PCM by default — the
    frontend rescales integer input). Device-corpus batches carry only
    'wav_off' [B] plus the HBM-resident flat int16 buffer under 'corpus';
    the waveform is gathered ON DEVICE here, so the host->device link (the
    measured bottleneck: ~50 MB/s through the axon tunnel) moves a few KB
    per step instead of the padded audio. Samples past wav_len are zeroed —
    exact parity with zero-padded streaming batches.
    """
    if batch.get("wav") is not None:
        return batch["wav"], batch["wav_len"]
    assert n_samples > 0, "offsets batch requires static n_samples"
    # per-row contiguous dynamic_slice: lowers to row-DMA copies (4.9 ms at
    # B=128 x 16.3 s) where a general jnp.take gather took 788 ms on this
    # chip. dynamic_slice clamps start to [0, len-n_samples] — flat_corpus
    # pads the buffer tail so a clamp can never misalign a real utterance.
    flat = batch["corpus"]
    wav = jax.vmap(lambda o: jax.lax.dynamic_slice(flat, (o,), (n_samples,)))(
        batch["wav_off"]
    )
    pos = jnp.arange(n_samples, dtype=jnp.int32)[None, :]
    wav = jnp.where(pos < batch["wav_len"][:, None], wav, 0)
    return wav, batch["wav_len"]


def compute_loss(
    params,
    cfg: Config,
    wav: jnp.ndarray,
    wav_len: jnp.ndarray,
    text: jnp.ndarray,
    text_len: jnp.ndarray,
    tf_rate,
    rng: jax.Array,
    train: bool = True,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    m = cfg.model
    r_spec, r_dither, r_fwd = jax.random.split(rng, 3)
    feat, feat_len = compute_features(
        wav, wav_len, cfg.data.audio, rng=r_dither if train else None
    )
    if train and m.specaugment.enable:
        feat = specaugment(feat, feat_len, m.specaugment, r_spec)
    feat = feat.astype(_dtype(cfg))

    out = asr_mod.forward(
        params,
        m,
        feat,
        feat_len,
        decode_step=text.shape[1],
        tf_rate=tf_rate,
        teacher=text,
        rng=r_fwd,
        train=train,
    )
    enc_len = out["enc_len"]
    valid_utt = text_len > 0  # batch-padding rows are fully masked
    n_utt = jnp.maximum(jnp.sum(valid_utt), 1)
    metrics: Dict[str, jnp.ndarray] = {}
    total = jnp.asarray(0.0, jnp.float32)

    if "att_logits" in out:
        logits = out["att_logits"].astype(jnp.float32)  # [B, L, V]
        tok_mask = (jnp.arange(text.shape[1])[None, :] < text_len[:, None]) & valid_utt[:, None]
        if "emb_reg" in params and m.emb_reg.fuse > 0:
            from e2e_asr_tpu.models import plugin as plugin_mod

            logp = plugin_mod.fused_log_probs(
                params["emb_reg"], m.emb_reg, logits, out["att_hidden"]
            )
            logp = jax.nn.log_softmax(logp, -1)  # renormalize the mixture
        else:
            logp = jax.nn.log_softmax(logits, -1)
        nll = -jnp.take_along_axis(logp, text[..., None], axis=-1)[..., 0]
        att_loss = jnp.sum(nll * tok_mask) / jnp.maximum(jnp.sum(tok_mask), 1)
        metrics["att_loss"] = att_loss
        metrics["att_preds"] = jnp.argmax(logp, -1)
        total = total + (1.0 - m.ctc_weight) * att_loss
        if "emb_reg" in params and m.emb_reg.weight > 0:
            from e2e_asr_tpu.models import plugin as plugin_mod

            er = plugin_mod.emb_reg_loss(
                params["emb_reg"], m.emb_reg, out["att_hidden"], text, text_len
            )
            metrics["emb_reg_loss"] = er
            total = total + m.emb_reg.weight * er

    if "ctc_log_probs" in out:
        lp = out["ctc_log_probs"].astype(jnp.float32)
        ctc_label_len = jnp.maximum(text_len - 1, 0)  # strip <eos>
        pos = jnp.arange(text.shape[1])[None, :]
        ctc_labels = jnp.where(pos < ctc_label_len[:, None], text, 0)
        nll = ctc_loss(lp, enc_len, ctc_labels, ctc_label_len, impl="auto")
        # infeasible-utterance policy (hparas.ctc_infeasible):
        #   'skip' (default, reference parity): inf nll propagates into the
        #   batch loss; the NaN/inf step guard then drops the whole update —
        #   torch CTCLoss(zero_infinity=False) -> NaN grads -> skip (ref:
        #   bin/train_asr.py:~75, src/solver.py:~backward).
        #   'mask': exclude only non-finite utterances from the mean.
        # eval always masks (finite dev metrics over the feasible rows);
        # training follows the configured policy
        keep = valid_utt
        if not train or cfg.hparas.ctc_infeasible == "mask":
            keep = keep & jnp.isfinite(nll)
        per_utt = jnp.where(keep, nll / jnp.maximum(ctc_label_len, 1), 0.0)
        ctc_l = jnp.sum(per_utt) / n_utt
        metrics["ctc_loss"] = ctc_l
        metrics["ctc_preds"] = jnp.argmax(lp, -1)
        total = total + m.ctc_weight * ctc_l

    metrics["loss"] = total
    metrics["enc_len"] = enc_len
    return total, metrics


def make_train_step(cfg: Config, tx: optax.GradientTransformation):
    """Returns jitted (state, batch_dict, rng) -> (state, metrics)."""

    def step_fn(
        state: TrainState, batch: Dict[str, jnp.ndarray], rng: jax.Array, n_samples: int = 0
    ):
        from e2e_asr_tpu.optim import tf_rate as tf_sched

        tf = tf_sched(cfg.hparas, state.step)
        wav, wav_len = resolve_wav(batch, n_samples)

        def loss_fn(p):
            return compute_loss(
                p,
                cfg,
                wav,
                wav_len,
                batch["text"],
                batch["text_len"],
                tf,
                rng,
                train=True,
            )

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        gnorm = optax.global_norm(grads)
        metrics["grad_norm"] = gnorm
        metrics["tf_rate"] = tf

        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        # NaN/inf step skip (ref: src/solver.py backward)
        ok = jnp.isfinite(loss) & jnp.isfinite(gnorm)
        metrics["step_skipped"] = 1.0 - ok.astype(jnp.float32)
        new_params = jax.tree.map(
            lambda n, o: jnp.where(ok, n, o), new_params, state.params
        )
        new_opt = jax.tree.map(
            lambda n, o: jnp.where(ok, n, o) if hasattr(n, "dtype") else n,
            new_opt,
            state.opt_state,
        )
        return TrainState(new_params, new_opt, state.step + 1), metrics

    return step_fn


def make_eval_step(cfg: Config):
    """Jitted teacher-forced eval: losses + greedy per-head predictions."""

    def eval_fn(params, batch: Dict[str, jnp.ndarray], n_samples: int = 0):
        wav, wav_len = resolve_wav(batch, n_samples)
        _, metrics = compute_loss(
            params,
            cfg,
            wav,
            wav_len,
            batch["text"],
            batch["text_len"],
            tf_rate=1.0,
            rng=jax.random.PRNGKey(0),
            train=False,
        )
        return metrics

    return eval_fn
