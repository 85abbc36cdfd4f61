"""Native C++ runtime tests: build, Levenshtein parity, WAV decode/pack."""

import wave

import numpy as np
import pytest

pytest.importorskip("ctypes")


@pytest.fixture(scope="module")
def lib():
    from e2e_asr_tpu.native import NativeUnavailable, get_lib

    try:
        return get_lib()
    except NativeUnavailable as e:  # pragma: no cover
        pytest.skip(f"native toolchain unavailable: {e}")


def write_wav(path, data, sr=16000):
    with wave.open(str(path), "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sr)
        f.writeframes((np.clip(data, -1, 1) * 32767).astype("<i2").tobytes())


def py_lev(a, b):
    la, lb = len(a), len(b)
    dp = list(range(lb + 1))
    for i in range(1, la + 1):
        prev, dp[0] = dp[0], i
        for j in range(1, lb + 1):
            cur = dp[j]
            dp[j] = min(dp[j] + 1, dp[j - 1] + 1, prev + (a[i - 1] != b[j - 1]))
            prev = cur
    return dp[lb]


def test_levenshtein_matches_python(lib):
    from e2e_asr_tpu.native.editdist import distance

    rng = np.random.RandomState(0)
    for _ in range(30):
        a = list(rng.randint(0, 5, rng.randint(0, 12)))
        b = list(rng.randint(0, 5, rng.randint(0, 12)))
        assert distance(a, b) == py_lev(a, b)
    # works on word sequences too
    assert distance("the cat sat".split(), "the bat sat sat".split()) == 2


def test_levenshtein_batch(lib):
    from e2e_asr_tpu.native.editdist import distance_batch

    rng = np.random.RandomState(1)
    pairs = [
        (list(rng.randint(0, 6, rng.randint(1, 20))), list(rng.randint(0, 6, rng.randint(1, 20))))
        for _ in range(50)
    ]
    out = distance_batch(pairs)
    for (a, b), d in zip(pairs, out):
        assert d == py_lev(a, b)


def test_wav_roundtrip(lib, tmp_path):
    from e2e_asr_tpu.native.audio_io import read_wav, wav_num_samples

    rng = np.random.RandomState(2)
    data = (rng.randn(12345) * 0.3).astype(np.float32)
    p = tmp_path / "a.wav"
    write_wav(p, data)
    assert wav_num_samples(str(p)) == 12345
    out = read_wav(str(p))
    np.testing.assert_allclose(out, np.clip(data, -1, 1), atol=1e-4)


def test_pack_batch_parallel(lib, tmp_path):
    from e2e_asr_tpu.native.audio_io import pack_batch

    rng = np.random.RandomState(3)
    datas, paths = [], []
    for i, n in enumerate([4000, 8000, 2500]):
        d = (rng.randn(n) * 0.2).astype(np.float32)
        p = tmp_path / f"u{i}.wav"
        write_wav(p, d)
        datas.append(d)
        paths.append(str(p))
    wav, lens = pack_batch(paths, 6000)
    assert wav.shape == (3, 6000)
    assert list(lens) == [4000, 6000, 2500]  # second is truncated to bucket
    np.testing.assert_allclose(wav[0, :4000], np.clip(datas[0], -1, 1), atol=1e-4)
    assert (wav[0, 4000:] == 0).all()
    assert (wav[2, 2500:] == 0).all()


def test_metrics_use_native(lib):
    from e2e_asr_tpu.utils.metrics import edit_distance

    assert edit_distance([1, 2, 3], [1, 3]) == 1


def test_librispeech_wav_corpus_native_pack(lib, tmp_path):
    """End-to-end: wav-file corpus -> bucketed loader uses the C++ packer."""
    from e2e_asr_tpu.config import Config
    from e2e_asr_tpu.data.dataset import load_dataset

    root = tmp_path / "train-clean-100" / "1" / "2"
    root.mkdir(parents=True)
    rng = np.random.RandomState(4)
    with open(root / "1-2.trans.txt", "w") as f:
        for i in range(4):
            n = 3000 + 500 * i
            write_wav(root / f"1-2-{i:04d}.wav", (rng.randn(n) * 0.2).astype(np.float32))
            f.write(f"1-2-{i:04d} HELLO WORLD {i}\n")
    dev = tmp_path / "dev-clean" / "1" / "3"
    dev.mkdir(parents=True)
    write_wav(dev / "1-3-0000.wav", (rng.randn(2000) * 0.2).astype(np.float32))
    with open(dev / "1-3.trans.txt", "w") as f:
        f.write("1-3-0000 BYE\n")

    cfg = Config.from_dict(
        {
            "data": {
                "corpus": {
                    "name": "librispeech",
                    "path": str(tmp_path),
                    "train_split": ["train-clean-100"],
                    "dev_split": ["dev-clean"],
                    "batch_size": 4,
                    "buckets": [208],
                    "token_buckets": [32],
                },
                "audio": {"feat_dim": 40},
                "text": {"mode": "character"},
            }
        }
    )
    tr, dv, feat_dim, vocab, tok, msg = load_dataset(cfg.data, num_workers=0)
    batches = list(tr.epoch(0))
    assert sum((b.wav_len > 0).sum() for b in batches) == 4
    for b in batches:
        for j in range(len(b.uids)):
            if b.uids[j]:
                assert b.wav_len[j] > 0
                assert np.abs(b.wav[j, : b.wav_len[j]]).max() > 0
