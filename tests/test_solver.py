"""Solver integration tests: training CLI, checkpoint bit-exact resume,
LM training path (SURVEY.md §4: checkpoint save/restore bit-exact resume)."""

import os
import types

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from e2e_asr_tpu.config import Config


def make_paras(tmp_path, **kw):
    d = dict(
        config="synthetic.yaml",
        name=kw.pop("name", "t"),
        logdir=str(tmp_path / "log"),
        ckpdir=str(tmp_path / "ckpt"),
        outdir=str(tmp_path / "out"),
        load=None,
        seed=0,
        njobs=0,
        verbose=False,
    )
    d.update(kw)
    return types.SimpleNamespace(**d)


def asr_config(max_step=6, valid_step=5, full_fat=False):
    """Solver-test config. Default is deliberately tiny (single bucket, no
    VGG, dot attention, one BiLSTM layer) — these tests exercise loop
    mechanics (ckpt/resume/validation/decode csvs), while VGG / location /
    multi-bucket coverage lives in test_model/test_loc_features/test_dataset.
    full_fat=True restores the round-1 shape (opt-in via E2E_ASR_FULL)."""
    if full_fat:
        corpus = {
            "train_split": ["train:12"], "dev_split": ["dev:4"],
            "buckets": [208, 416, 816], "token_buckets": [48, 48, 64],
        }
        encoder = {
            "prenet": "vgg", "dim": [32, 32], "dropout": [0.0, 0.0],
            "layer_norm": [False, False], "proj": [True, True],
            "sample_rate": [1, 1], "sample_style": "drop",
        }
        attention = {"mode": "location", "dim": 24, "num_head": 1,
                     "loc_kernel_size": 8, "loc_kernel_num": 4}
    else:
        corpus = {
            "train_split": ["train:16"], "dev_split": ["dev:8"],
            "buckets": [416], "token_buckets": [48],
        }
        encoder = {
            "prenet": "", "dim": [32], "dropout": [0.0],
            "layer_norm": [False], "proj": [True],
            "sample_rate": [2], "sample_style": "drop",
        }
        attention = {"mode": "dot", "dim": 24, "num_head": 1}
    return Config.from_dict(
        {
            "data": {
                "corpus": {"name": "synthetic", "batch_size": 4, **corpus},
                "audio": {"feat_dim": 40, "use_pallas": False},
                "text": {"mode": "character"},
            },
            "hparas": {
                "valid_step": valid_step,
                "max_step": max_step,
                "optimizer": "Adam",
                "lr": 1e-3,
                "dtype": "float32",
                "log_step": 2,
            },
            "model": {
                "ctc_weight": 0.3,
                "encoder": encoder,
                "attention": attention,
                "decoder": {"dim": 32, "layer": 1},
            },
        }
    )


def test_train_solver_runs_and_checkpoints(tmp_path):
    from e2e_asr_tpu.bin.train_asr import Solver

    cfg = asr_config()
    s = Solver(cfg, make_paras(tmp_path), "train")
    s.load_data()
    s.set_model()
    # a 6-step model's greedy ER can exceed the reference's 3.0 best-metric
    # init (ref: bin/train_asr.py best_wer=3.0) — raise the bar so the
    # best-checkpoint save path is exercised deterministically
    s.best_wer = {"att": 100.0, "ctc": 100.0}
    s.exec()
    assert os.path.exists(os.path.join(s.ckpdir, "latest"))
    assert os.path.exists(os.path.join(s.ckpdir, "best_att"))


def test_checkpoint_resume_bit_exact(tmp_path):
    """Train 6 steps == train 3, save, resume 3 (identical data/rng path)."""
    from e2e_asr_tpu.bin.train_asr import Solver

    # run A: 6 straight steps
    cfg = asr_config(max_step=6, valid_step=100)
    sa = Solver(cfg, make_paras(tmp_path, name="a"), "train")
    sa.load_data()
    sa.set_model()
    sa.exec()
    pa = jax.tree.leaves(sa.state.params)

    # run B: 3 steps, checkpoint, fresh solver resumes to 6
    cfg_b = asr_config(max_step=3, valid_step=100)
    sb = Solver(cfg_b, make_paras(tmp_path, name="b"), "train")
    sb.load_data()
    sb.set_model()
    sb.exec()
    ck = os.path.join(sb.ckpdir, "latest")

    cfg_c = asr_config(max_step=6, valid_step=100)
    sc = Solver(cfg_c, make_paras(tmp_path, name="c", load=ck), "train")
    sc.load_data()
    sc.set_model()
    assert int(sc.state.step) == 3 and sc.step == 3
    sc.exec()
    pc = jax.tree.leaves(sc.state.params)

    for a, c in zip(pa, pc):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), rtol=2e-5, atol=1e-6)


def test_lm_solver_trains_and_improves(tmp_path):
    from e2e_asr_tpu.bin.train_lm import Solver

    cfg = Config.from_dict(
        {
            "data": {
                "corpus": {"name": "synthetic", "train_split": ["train:64"], "dev_split": ["dev:16"]},
                "text": {"mode": "character"},
            },
            "hparas": {"valid_step": 30, "max_step": 31, "optimizer": "Adam",
                       "lr": 3e-3, "log_step": 10},
            "lm": {"emb_dim": 32, "dim": 48, "n_layers": 1, "batch_size": 8, "dropout": 0.0},
        }
    )
    s = Solver(cfg, make_paras(tmp_path, name="lm"), "train")
    s.load_data()
    s.set_model()
    s.exec()
    assert s.best_ppl < 30, f"LM ppl did not improve: {s.best_ppl}"
    assert os.path.exists(os.path.join(s.ckpdir, "best_ppl"))


def test_emb_tying_lm():
    from e2e_asr_tpu.config import LMConfig
    from e2e_asr_tpu.models import lm as lm_mod

    cfg = LMConfig(emb_tying=True, emb_dim=16, dim=24, n_layers=1)
    p = lm_mod.lm_init(jax.random.PRNGKey(0), 11, cfg)
    assert "out" not in p and "out_proj" in p
    logits = lm_mod.apply_seq(p, cfg, jnp.ones((2, 5), jnp.int32), jnp.asarray([5, 5]))
    assert logits.shape == (2, 5, 11)
    lp, st = lm_mod.step(p, cfg, jnp.ones((2,), jnp.int32), lm_mod.init_state(2, cfg))
    np.testing.assert_allclose(np.asarray(jnp.exp(lp).sum(-1)), 1.0, rtol=1e-5)


def test_train_solver_subword_mode(tmp_path):
    """BPE tokenizer end-to-end through the training solver."""
    from e2e_asr_tpu.bin.train_asr import Solver

    cfg = asr_config(max_step=2, valid_step=100)
    cfg.data.text.mode = "subword"
    s = Solver(cfg, make_paras(tmp_path, name="sw"), "train")
    s.load_data()
    assert s.tokenizer.token_type == "subword"
    assert s.vocab_size > 10
    s.set_model()
    s.exec()


def test_test_solver_end_to_end(tmp_path):
    """Train 2 steps -> beam decode dev AND test splits via the test solver."""
    import os

    from e2e_asr_tpu.bin.test_asr import Solver as TestSolver
    from e2e_asr_tpu.bin.train_asr import Solver as TrainSolver

    cfg = asr_config(max_step=2, valid_step=100)
    st = TrainSolver(cfg, make_paras(tmp_path, name="tr"), "train")
    st.load_data()
    st.set_model()
    st.exec()

    dcfg = asr_config()
    dcfg.data.corpus.test_split = ["test:6"]  # 4 utts fit the 416 bucket
    dcfg.src.ckpt = os.path.join(st.ckpdir, "latest")
    dcfg.decode.beam_size = 2
    dcfg.decode.max_len_ratio = 0.5
    dcfg.decode.batch_size = 4  # decode re-batching knob (ref has batch=1 only)
    sd = TestSolver(dcfg, make_paras(tmp_path, name="de"), "test")
    sd.load_data()
    sd.set_model()
    ers = sd.exec()
    assert set(ers) == {"dev", "test"}
    for split, n_utts in (("dev", 5), ("test", 4)):
        assert os.path.exists(os.path.join(sd.outdir, f"beam_{split}.csv"))
        with open(os.path.join(sd.outdir, f"output_{split}.csv")) as f:
            lines = f.read().strip().splitlines()
        assert len(lines) == 1 + n_utts, (split, lines)
        # 2-step model babbles: only sanity-bound the ER (hyp len is capped
        # by max_len_ratio, so ER is finite but can exceed 1)
        assert 0.0 <= ers[split] < 50.0


def test_decode_recipe_yaml_cli(tmp_path):
    """The shipped decode recipe drives dev+test decoding from YAML alone
    (shrunk splits to keep CPU runtime down), through the real CLI entry."""
    import yaml

    from e2e_asr_tpu.bin.train_asr import Solver as TrainSolver
    from e2e_asr_tpu.config import Config
    from e2e_asr_tpu.main import main as cli_main

    # validate every shipped recipe parses into the typed Config
    root = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "configs")
    shipped = []
    for dirpath, _, files in os.walk(root):
        shipped += [os.path.join(dirpath, f) for f in files if f.endswith(".yaml")]
    assert len(shipped) >= 6
    for p in shipped:
        Config.load(p)

    # tiny train run to produce a ckpt
    cfg = asr_config(max_step=2, valid_step=100)
    st = TrainSolver(cfg, make_paras(tmp_path, name="tr2"), "train")
    st.load_data()
    st.set_model()
    st.exec()

    # shrink the shipped decode recipe's splits, repoint src at a matching
    # tiny train config, keep everything else as shipped
    with open(os.path.join(root, "synthetic_decode.yaml")) as f:
        d = yaml.safe_load(f)
    train_yaml = tmp_path / "train.yaml"
    cfg.save(train_yaml)
    d["data"]["corpus"].update(
        train_split=["train:16"], dev_split=["dev:8"], test_split=["test:6"],
        buckets=[416], token_buckets=[48],
    )
    d["src"] = {"ckpt": os.path.join(st.ckpdir, "latest"), "config": str(train_yaml)}
    d["decode"]["beam_size"] = 2
    d["decode"]["batch_size"] = 2
    d["decode"]["max_len_ratio"] = 0.4
    decode_yaml = tmp_path / "decode.yaml"
    with open(decode_yaml, "w") as f:
        yaml.safe_dump(d, f)

    outdir = tmp_path / "res"
    cli_main([
        "--config", str(decode_yaml), "--test", "--name", "yamlrec",
        "--outdir", str(outdir), "--ckpdir", str(tmp_path / "ck"),
        "--logdir", str(tmp_path / "lg"), "--njobs", "0", "--no-msg",
    ])
    for split in ("dev", "test"):
        assert os.path.exists(outdir / "yamlrec" / f"output_{split}.csv")


@pytest.mark.skipif(not os.environ.get("E2E_ASR_FULL"), reason="opt-in full-fat run (E2E_ASR_FULL=1)")
def test_train_solver_full_fat(tmp_path):
    """Round-1 shape (VGG + location + 3 buckets) through the solver loop —
    opt-in: the default suite covers these components in their own modules."""
    from e2e_asr_tpu.bin.train_asr import Solver

    cfg = asr_config(full_fat=True)
    s = Solver(cfg, make_paras(tmp_path, name="ff"), "train")
    s.load_data()
    s.set_model()
    s.exec()
    assert os.path.exists(os.path.join(s.ckpdir, "latest"))
    assert os.path.exists(os.path.join(s.ckpdir, "best_att"))
