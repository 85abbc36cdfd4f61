"""RNN-LM training solver (ref: bin/train_lm.py).

Text-only batches -> next-token CE -> perplexity logging -> best_ppl ckpt.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax

from e2e_asr_tpu.config import Config
from e2e_asr_tpu.data import corpus as corpus_mod
from e2e_asr_tpu.data.dataset import TextLoader, build_tokenizer
from e2e_asr_tpu.models import lm as lm_mod
from e2e_asr_tpu.optim import build_optimizer
from e2e_asr_tpu.parallel import mesh as mesh_mod
from e2e_asr_tpu.solver import BaseSolver
from e2e_asr_tpu.training.step import TrainState
from e2e_asr_tpu.utils.misc import human_format


def lm_loss(params, cfg, text, text_len, rng, train):
    """Next-token CE over <sos> y_1 ... y_{L-1} -> y."""
    b, l = text.shape
    inputs = jnp.concatenate([jnp.zeros((b, 1), text.dtype), text[:, :-1]], 1)
    logits = lm_mod.apply_seq(params, cfg.lm, inputs, text_len, rng, train).astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, -1)
    nll = -jnp.take_along_axis(logp, text[..., None], -1)[..., 0]
    mask = jnp.arange(l)[None, :] < text_len[:, None]
    loss = jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1)
    return loss, {"loss": loss, "n_tokens": jnp.sum(mask)}


class Solver(BaseSolver):
    def __init__(self, config: Config, paras, mode: str = "train"):
        super().__init__(config, paras, mode)
        self.best_ppl = np.inf
        self.max_step = config.hparas.max_step
        self.valid_step = config.hparas.valid_step

    def load_data(self):
        c = self.config.data.corpus
        tr_utts = corpus_mod.load_corpus(c.name, c.path, c.train_split)
        dv_utts = corpus_mod.load_corpus(c.name, c.path, c.dev_split)
        self.tokenizer = build_tokenizer(self.config.data, tr_utts)
        self.vocab_size = self.tokenizer.vocab_size
        bs = self.config.lm.batch_size
        self.tr_set = TextLoader(
            tr_utts, self.tokenizer, bs,
            process_index=jax.process_index(), process_count=jax.process_count(),
        )
        self.dv_set = TextLoader(dv_utts, self.tokenizer, bs, shuffle=False)
        self.verbose(
            f"LM data: {len(self.tr_set)}/{len(self.dv_set)} tr/dv batches, vocab {self.vocab_size}"
        )
        # pin the derived tokenizer beside the ckpts (same policy as ASR
        # training; fusion at decode time must share the ASR id mapping)
        if self.mode == "train" and jax.process_index() == 0:
            import os

            try:
                self.tokenizer.save(os.path.join(self.ckpdir, "tokenizer.vocab"))
            except NotImplementedError:
                pass

    def set_model(self):
        cfg = self.config
        self.mesh = mesh_mod.make_mesh(cfg.parallel.dp, cfg.parallel.mp)
        self.dp = self.mesh.shape["data"]
        params = lm_mod.lm_init(jax.random.PRNGKey(cfg.hparas.seed), self.vocab_size, cfg.lm)
        self.tx = build_optimizer(cfg.hparas)
        state = TrainState(params, self.tx.init(params), jnp.asarray(0, jnp.int32))
        if self.paras.load:
            restored = self.load_ckpt_payload(
                self.paras.load,
                {"params": state.params, "opt_state": state.opt_state, "step": state.step},
            )
            state = TrainState(restored["params"], restored["opt_state"], jnp.asarray(restored["step"]))
        self.state = jax.device_put(state, mesh_mod.replicated(self.mesh))
        n = sum(x.size for x in jax.tree.leaves(params))
        self.verbose(f"RNNLM: #params={human_format(n)}")

        def train_step(state, batch, rng):
            (loss, m), grads = jax.value_and_grad(lm_loss, has_aux=True)(
                state.params, cfg, batch["text"], batch["text_len"], rng, True
            )
            gnorm = optax.global_norm(grads)
            updates, new_opt = self.tx.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            ok = jnp.isfinite(loss) & jnp.isfinite(gnorm)
            new_params = jax.tree.map(lambda a, b: jnp.where(ok, a, b), new_params, state.params)
            m["grad_norm"] = gnorm
            return TrainState(new_params, new_opt, state.step + 1), m

        self.train_step = jax.jit(train_step, donate_argnums=(0,))
        self.eval_step = jax.jit(
            lambda p, batch: lm_loss(p, cfg, batch["text"], batch["text_len"], None, False)[1]
        )

    def _put(self, batch: Dict[str, np.ndarray]):
        b = batch["text"].shape[0]
        if b % self.dp:
            batch = mesh_mod.pad_batch_to(batch, ((b + self.dp - 1) // self.dp) * self.dp)
        return mesh_mod.shard_batch(self.mesh, batch)

    def exec(self):
        cfg = self.config
        it = self.tr_set.forever()
        while self.step < self.max_step:
            batch = self._put(next(it))
            rng = jax.random.fold_in(jax.random.PRNGKey(cfg.hparas.seed + 2), self.step)
            self.state, m = self.train_step(self.state, batch, rng)
            self.step += 1
            if self.step % cfg.hparas.log_step == 0:
                loss = float(m["loss"])
                self.progress(f"lm loss {loss:.3f} | ppl {np.exp(loss):.1f}")
                self.write_log("lm_loss", loss)
                self.write_log("lm_ppl", float(np.exp(loss)))
            if self.step % self.valid_step == 0:
                self.validate()
        self.save_checkpoint("latest", "step", float(self.step), self.state, block=True)
        self.finish_checkpoints()
        if self.log is not None:
            self.log.close()

    def validate(self):
        tot_nll, tot_tok = 0.0, 0
        for batch in self.dv_set.epoch(0):
            m = self.eval_step(self.state.params, self._put(batch))
            n = float(m["n_tokens"])
            tot_nll += float(m["loss"]) * n
            tot_tok += n
        ppl = float(np.exp(tot_nll / max(tot_tok, 1)))
        self.progress(f"DEV ppl {ppl:.2f}")
        self.write_log("dev_ppl", ppl)
        if ppl < self.best_ppl:
            self.best_ppl = ppl
            self.save_checkpoint("best_ppl", "ppl", ppl, self.state)
        self.save_checkpoint("latest", "step", float(self.step), self.state)
