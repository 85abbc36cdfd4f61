"""Base solver: experiment dirs, logging, checkpointing, progress.

Parity with the reference's src/solver.py BaseSolver (verbose/progress/
write_log/save_checkpoint/load_ckpt, TensorBoard SummaryWriter, exp dirs
log/<name> ckpt/<name>) with TPU-native replacements:

- checkpoints are orbax PyTree saves of {params, opt_state, step} —
  sharding-aware and async-capable — instead of torch.save dicts; the
  best-metric policy (best_att.pth / best_ctc.pth / latest.pth) is kept.
- scalars/text/images go to tensorboardX with the same tag names the
  reference logs, so curves are directly comparable.
"""

from __future__ import annotations

import os
import sys
from typing import Any, Dict, Optional

import jax
import numpy as np

from e2e_asr_tpu.config import Config
from e2e_asr_tpu.utils.timer import Timer

GRAD_CLIP = 5.0  # ref: src/solver.py


class BaseSolver:
    def __init__(self, config: Config, paras, mode: str):
        self.config = config
        self.paras = paras
        self.mode = mode
        self.exp_name = paras.name
        if self.exp_name is None:
            self.exp_name = os.path.basename(paras.config).replace(".yaml", "") if paras.config else "exp"
            self.exp_name += f"_sd{paras.seed}"

        self.logdir = os.path.join(paras.logdir, self.exp_name)
        self.ckpdir = os.path.join(paras.ckpdir, self.exp_name)
        self.outdir = os.path.join(paras.outdir, self.exp_name)
        self.timer = Timer()
        self.step = 0

        if mode == "train" and jax.process_index() == 0:
            os.makedirs(self.ckpdir, exist_ok=True)
            os.makedirs(self.logdir, exist_ok=True)
            from tensorboardX import SummaryWriter

            self.log = SummaryWriter(self.logdir, flush_secs=60)
        elif mode == "train":
            os.makedirs(self.ckpdir, exist_ok=True)  # multi-host non-primary
            self.log = None
        else:
            os.makedirs(self.outdir, exist_ok=True)
            self.log = None

    # ------------------------------------------------------------- messaging
    def verbose(self, msg):
        """ref: BaseSolver.verbose."""
        if self.paras.verbose:
            if isinstance(msg, list):
                for m in msg:
                    self.verbose(m)
            else:
                print("[INFO]", msg, flush=True)

    def progress(self, msg: str):
        if self.paras.verbose:
            sys.stdout.write("\033[K")
            print(f"[{self.step}] {msg}", flush=True)

    def write_log(self, log_name: str, log_dict):
        """Scalars/text/images to TensorBoard (ref: BaseSolver.write_log)."""
        if self.log is None:
            return
        if isinstance(log_dict, dict) and log_dict and all(
            isinstance(v, (int, float, np.floating)) for v in log_dict.values()
        ):
            self.log.add_scalars(log_name, log_dict, self.step)
        elif isinstance(log_dict, (int, float, np.floating)):
            self.log.add_scalar(log_name, log_dict, self.step)
        elif isinstance(log_dict, str):
            self.log.add_text(log_name, log_dict, self.step)
        elif isinstance(log_dict, np.ndarray) and log_dict.ndim == 3:
            self.log.add_image(log_name, log_dict, self.step, dataformats="HWC")

    # ----------------------------------------------------------- checkpoints
    _ckptr = None

    def _checkpointer(self):
        import orbax.checkpoint as ocp

        if BaseSolver._ckptr is None:
            # async: saves overlap the next training steps (SURVEY §5 plan)
            BaseSolver._ckptr = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
        return BaseSolver._ckptr

    def save_checkpoint(self, fname: str, metric: str, score: float, state, block: bool = False) -> None:
        """orbax async save of the full train state + metadata.

        ref: BaseSolver.save_checkpoint(torch.save({'model','optimizer',
        'global_step', metric: score})); async here so the device keeps
        training while the host serializes.
        """
        import orbax.checkpoint as ocp

        # EVERY process must make this call: orbax's AsyncCheckpointer
        # barriers across jax.distributed processes on save commit, so a
        # proc-0-only save deadlocks — proc 0 waits in a barrier no one
        # joins while the others hang in the next train step's collective
        # (observed live: both 2-process loader workers frozen right after
        # the first validate). Orbax's own primary-host logic keeps the
        # actual file writes on process 0.
        path = os.path.abspath(os.path.join(self.ckpdir, fname))
        ckptr = self._checkpointer()
        payload = {
            "params": state.params,
            "opt_state": state.opt_state,
            "step": state.step,
        }
        # D2H on the calling thread: orbax's serialization thread otherwise
        # issues device slice ops (and fresh XLA:CPU compiles) mid-save,
        # which segfaults under load in this jaxlib; handing it host arrays
        # keeps the async part pure file IO.
        payload = jax.device_get(payload)
        ckptr.save(path, args=ocp.args.StandardSave(payload), force=True)
        if block:
            ckptr.wait_until_finished()
        if jax.process_index() == 0:
            with open(path + ".meta", "w") as f:
                f.write(f"{metric} {score}\nglobal_step {int(state.step)}\n")
            # only proc 0 logs: every process calls save (barrier above), but
            # N identical 'Saved checkpoint' lines per save is noise
            self.verbose(
                f"Saved checkpoint (step = {int(state.step)}, {metric} = {score:.2f}) -> {fname}"
            )

    def finish_checkpoints(self) -> None:
        if BaseSolver._ckptr is not None:
            BaseSolver._ckptr.wait_until_finished()

    def latest_ckpt_path(self) -> Optional[str]:
        """Auto-resume support: newest complete 'latest' checkpoint, if any."""
        p = os.path.join(self.ckpdir, "latest")
        return p if os.path.isdir(p) else None

    def load_ckpt_payload(self, path: str, template) -> Any:
        """Restore a checkpoint into the structure of `template`.

        `template` may be a subset of the saved tree (e.g. params only for
        inference — ref: bin/test_asr.py loads model weights without the
        optimizer); missing saved entries are skipped.
        """
        import orbax.checkpoint as ocp

        self.finish_checkpoints()  # never restore a half-written async save
        with ocp.PyTreeCheckpointer() as ckptr:
            return ckptr.restore(
                os.path.abspath(path),
                args=ocp.args.PyTreeRestore(item=template, partial_restore=True),
            )
