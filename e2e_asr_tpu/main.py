"""CLI entry point (ref: main.py).

Usage mirrors the reference:
    python -m e2e_asr_tpu.main --config cfg.yaml [--name exp] [--test] [--lm]
        [--load ckpt] [--seed N] [--njobs N] [--logdir log/] [--ckpdir ckpt/]
        [--outdir result/] [--no-msg]

Dispatches to bin/{train,test}_{asr,lm} solvers; each follows the
reference's Solver(config, paras, mode).load_data()/set_model()/exec()
protocol.
"""

from __future__ import annotations

import argparse

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="TPU-native end-to-end ASR (ref: main.py argparse)")
    p.add_argument("--config", type=str, required=True, help="experiment yaml")
    p.add_argument("--name", default=None, type=str, help="experiment name")
    p.add_argument("--logdir", default="log/", type=str)
    p.add_argument("--ckpdir", default="ckpt/", type=str)
    p.add_argument("--outdir", default="result/", type=str)
    p.add_argument("--load", default=None, type=str, help="ckpt path to resume/test")
    p.add_argument("--seed", default=0, type=int)
    p.add_argument("--njobs", default=2, type=int, help="data prefetch workers")
    p.add_argument("--test", action="store_true", help="evaluation (beam decode)")
    p.add_argument("--lm", action="store_true", help="RNN-LM task")
    p.add_argument("--no-msg", action="store_true")
    p.add_argument(
        "--no-auto-resume", dest="auto_resume", action="store_false",
        help="do not auto-resume from ckpdir/<name>/latest",
    )
    p.add_argument("--cpu", action="store_true", help="force CPU backend")
    p.add_argument("--multihost", action="store_true", help="jax.distributed.initialize()")
    # reference parity flags with TPU-native semantics:
    #   --amp       (ref: torch.cuda.amp)   -> bfloat16 compute dtype
    #   --pure-f32  (inverse)               -> float32 compute dtype
    # (ref --cudnn-ctc picks the cuDNN CTC kernel; here ops/ctc.py impl="auto"
    #  already selects the Pallas lattice kernel on TPU. ref --no-pin is CUDA
    #  pinned-memory plumbing with no TPU analogue.)
    p.add_argument("--amp", action="store_true", help="force bfloat16 compute dtype")
    p.add_argument("--pure-f32", action="store_true", help="force float32 compute dtype")
    p.add_argument(
        "-o", "--override", action="append", default=[], metavar="KEY=VAL",
        help="dotted config override, e.g. -o data.corpus.path=/tmp/libri "
        "-o hparas.max_step=50 (VAL parsed as YAML); applied after --config",
    )
    return p


def apply_overrides(config, overrides):
    """Apply dotted KEY=VAL overrides onto the typed config in place."""
    import yaml

    for ov in overrides:
        key, sep, val = ov.partition("=")
        if not sep:
            raise ValueError(f"--override expects KEY=VAL, got {ov!r}")
        obj = config
        parts = key.split(".")
        for p_ in parts[:-1]:
            obj = getattr(obj, p_)
        if not hasattr(obj, parts[-1]):
            raise AttributeError(f"unknown config key {key!r}")
        setattr(obj, parts[-1], yaml.safe_load(val))
    return config


def main(argv=None):
    paras = build_parser().parse_args(argv)
    paras.verbose = not paras.no_msg
    np.random.seed(paras.seed)

    if paras.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    if paras.multihost:
        import jax

        jax.distributed.initialize()

    from e2e_asr_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from e2e_asr_tpu.config import Config

    config = Config.load(paras.config)
    apply_overrides(config, paras.override)
    config.hparas.seed = paras.seed
    if paras.amp:
        config.hparas.dtype = "bfloat16"
    if paras.pure_f32:
        config.hparas.dtype = "float32"

    if paras.lm:
        assert not paras.test, "LM evaluation is part of --lm training logs"
        from e2e_asr_tpu.bin.train_lm import Solver

        mode = "train"
    elif paras.test:
        from e2e_asr_tpu.bin.test_asr import Solver

        mode = "test"
    else:
        from e2e_asr_tpu.bin.train_asr import Solver

        mode = "train"

    solver = Solver(config, paras, mode)
    solver.load_data()
    solver.set_model()
    solver.exec()


if __name__ == "__main__":
    main()
