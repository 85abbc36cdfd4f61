"""Native FLAC decoder vs the from-scratch Python encoder oracle."""

import numpy as np
import pytest

from tests.flac_tools import write_flac

pytestmark = []

try:
    from e2e_asr_tpu.native import get_lib

    get_lib()
    from e2e_asr_tpu.native.audio_io import flac_num_samples, read_flac
except Exception as e:  # pragma: no cover
    pytest.skip(f"native unavailable: {e}", allow_module_level=True)


def pcm(n, seed=0, amp=8000, smooth=True):
    rng = np.random.RandomState(seed)
    x = rng.randn(n)
    if smooth:  # correlated signal so predictors actually predict
        for i in range(1, n):
            x[i] = 0.95 * x[i - 1] + 0.3 * x[i]
    x = (x / np.abs(x).max() * amp).astype(np.int64)
    return [int(v) for v in x]


def check(path, channels, bps=16, atol=0.0):
    got = read_flac(str(path))
    want = np.asarray(channels[0], np.float64) / (1 << (bps - 1))
    assert len(got) == len(channels[0])
    np.testing.assert_allclose(got, want, atol=atol + 1e-9)


@pytest.mark.parametrize("kind,kw", [
    ("constant", {}),
    ("verbatim", {}),
    ("fixed", {"order": 0}),
    ("fixed", {"order": 1}),
    ("fixed", {"order": 2}),
    ("fixed", {"order": 3}),
    ("fixed", {"order": 4}),
    ("lpc", {"lpc_coefs": [900, -200, 60], "lpc_shift": 10, "lpc_precision": 12}),
])
def test_subframe_kinds(tmp_path, kind, kw):
    n = 600
    ch = [pcm(n, seed=1)] if kind != "constant" else [[1234] * n]
    p = tmp_path / "t.flac"
    write_flac(str(p), ch, block_size=256, kind=kind, **kw)
    assert flac_num_samples(str(p)) == n
    check(p, ch)


def test_rice_partitions_and_rice2(tmp_path):
    n = 1024
    ch = [pcm(n, seed=2)]
    p = tmp_path / "t.flac"
    write_flac(str(p), ch, block_size=512, kind="fixed", order=2, porder=2, param=7, method=1)
    check(p, ch)


def test_rice_escape(tmp_path):
    n = 512
    ch = [pcm(n, seed=3)]
    p = tmp_path / "t.flac"
    write_flac(str(p), ch, block_size=512, kind="fixed", order=1, escape_bits=18)
    check(p, ch)


@pytest.mark.parametrize("mode", ["independent", "left_side", "right_side", "mid_side"])
def test_stereo_modes(tmp_path, mode):
    n = 512
    l, r = pcm(n, seed=4), pcm(n, seed=5)
    p = tmp_path / "t.flac"
    write_flac(str(p), [l, r], block_size=256, kind="fixed", order=2, stereo_mode=mode)
    # decoder returns channel 0 (left/mid reconstructed back to left)
    check(p, [l, r])


def test_multiframe_and_lengths(tmp_path):
    n = 3000  # 3 frames of 1024 + remainder 952... blocks: 1024,1024,952
    ch = [pcm(n, seed=6)]
    p = tmp_path / "t.flac"
    write_flac(str(p), ch, block_size=1024, kind="fixed", order=3)
    assert flac_num_samples(str(p)) == n
    check(p, ch)


def test_corpus_flac_ingestion(tmp_path):
    """LibriSpeech-layout corpus with .flac files end-to-end."""
    from e2e_asr_tpu.config import Config
    from e2e_asr_tpu.data.dataset import load_dataset

    root = tmp_path / "train-clean-100" / "9" / "9"
    root.mkdir(parents=True)
    with open(root / "9-9.trans.txt", "w") as f:
        for i in range(3):
            n = 2000 + 800 * i
            write_flac(str(root / f"9-9-{i:04d}.flac"), [pcm(n, seed=10 + i)], kind="fixed", order=2)
            f.write(f"9-9-{i:04d} SOME WORDS {i}\n")
    dev = tmp_path / "dev-clean" / "9" / "8"
    dev.mkdir(parents=True)
    write_flac(str(dev / "9-8-0000.flac"), [pcm(1500, seed=20)], kind="fixed", order=1)
    with open(dev / "9-8.trans.txt", "w") as f:
        f.write("9-8-0000 BYE\n")

    cfg = Config.from_dict({
        "data": {
            "corpus": {"name": "librispeech", "path": str(tmp_path),
                       "train_split": ["train-clean-100"], "dev_split": ["dev-clean"],
                       "batch_size": 4, "buckets": [208], "token_buckets": [32]},
            "audio": {"feat_dim": 40},
            "text": {"mode": "character"},
        }
    })
    tr, dv, _, vocab, tok, msg = load_dataset(cfg.data, num_workers=0)
    assert tr.num_utts == 3 and dv.num_utts == 1
    b = next(tr.epoch(0))
    assert (b.wav_len > 0).sum() >= 1
    for j in range(len(b.uids)):
        if b.uids[j]:
            assert np.abs(b.wav[j, : b.wav_len[j]]).max() > 0
