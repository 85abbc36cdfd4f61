"""Host-side dataset assembly: manifests -> fixed-shape bucketed batches.

The reference's pipeline (src/data.py) pads each batch to its own max length
and sorts/buckets dynamically — fine for eager PyTorch, hostile to XLA where
every distinct shape is a recompilation. TPU-native redesign:

- a small set of static (audio_samples, token_len) bucket shapes chosen from
  the duration histogram (config `data.corpus.buckets` in frames); every
  batch is padded to its bucket's shape => one compiled executable per
  bucket, total executables bounded by len(buckets).
- duration-sorted bucketing (ref: load_dataset bucketing) so batch members
  have similar lengths and pad waste stays low; batch shuffling on top.
- the reference's HALF_BATCHSIZE_AUDIO_LEN guard (halve batch when frames >
  ~800) becomes a per-bucket batch-size rule, statically.
- curriculum (ref: hparas.curriculum — length-ascending start) = emit
  buckets in ascending order for the first pass instead of shuffled.
- multi-host data parallel: each process keeps utterances with
  index % process_count == process_index (per-host input sharding).

Batches carry raw waveforms; feature extraction runs on device inside the
jitted train step (the Pallas frontend), unlike the reference's CPU-side
torchaudio transform.
"""

from __future__ import annotations

import threading
import queue as queue_mod
from dataclasses import dataclass
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from e2e_asr_tpu.config import DataConfig
from e2e_asr_tpu.data import corpus as corpus_mod
from e2e_asr_tpu.data import text as text_mod


@dataclass
class Batch:
    """Fixed-shape host batch (all numpy, ready for device_put)."""

    wav: np.ndarray  # [B, N_bucket] f32
    wav_len: np.ndarray  # [B] i32
    text: np.ndarray  # [B, L_bucket] i32 (includes <eos>, 0-padded)
    text_len: np.ndarray  # [B] i32 (includes <eos>)
    uids: Tuple[str, ...]

    @property
    def shape_key(self) -> Tuple[int, int, int]:
        return (self.wav.shape[0], self.wav.shape[1], self.text.shape[1])


def frames_to_samples(frames: int, win: int, shift: int) -> int:
    return (frames - 1) * shift + win


class BucketedLoader:
    """Bucketing batcher over a manifest with background prefetch."""

    def __init__(
        self,
        utts: List[corpus_mod.Utterance],
        tokenizer: text_mod.TextEncoder,
        batch_size: int,
        buckets_frames: Sequence[int],
        token_buckets: Sequence[int],
        win: int,
        shift: int,
        half_batch_len: int = 800,
        drop_remainder: bool = False,
        shuffle: bool = True,
        ascending: bool = False,
        seed: int = 0,
        num_workers: int = 2,
        process_index: int = 0,
        process_count: int = 1,
        cache_bytes: int = 16 << 30,
    ):
        assert len(buckets_frames) == len(token_buckets)
        self.tokenizer = tokenizer
        self.win, self.shift = win, shift
        self.buckets_samples = [frames_to_samples(f, win, shift) for f in buckets_frames]
        self.buckets_frames = list(buckets_frames)
        self.token_buckets = list(token_buckets)
        self.shuffle = shuffle
        self.ascending = ascending
        self.seed = seed
        self.num_workers = num_workers
        # in-memory waveform cache (the reference re-decodes in DataLoader
        # workers every epoch; small corpora fit in host RAM easily)
        self._wav_cache: Dict[int, np.ndarray] = {}
        self._cache_used = 0
        self._cache_cap = cache_bytes

    # per-host shard (multi-host DP input pipeline; SURVEY §2.2)
        utts = [u for i, u in enumerate(utts) if i % process_count == process_index]
        # pre-encode transcripts once (ref: LibriDataset pre-encodes)
        self._items = []
        skipped = 0
        for u in utts:
            ids = tokenizer.encode(u.text)
            bi = self._bucket_index(u.n_samples, len(ids))
            if bi is None:
                skipped += 1
                continue
            self._items.append((u, ids, bi))
        self.skipped = skipped

        # duration-sorted, grouped per bucket (ref: bucketing sorts by len)
        self._items.sort(key=lambda it: it[0].n_samples)
        per_bucket: Dict[int, List[int]] = {}
        for idx, (_, _, bi) in enumerate(self._items):
            per_bucket.setdefault(bi, []).append(idx)
        self._batches: List[Tuple[int, List[int]]] = []
        for bi, idxs in sorted(per_bucket.items()):
            bs = batch_size
            if self.buckets_frames[bi] > half_batch_len:
                bs = max(1, batch_size // 2)  # ref: HALF_BATCHSIZE_AUDIO_LEN
            for s in range(0, len(idxs), bs):
                chunk = idxs[s : s + bs]
                if drop_remainder and len(chunk) < bs:
                    continue
                self._batches.append((bi, chunk))

    def _bucket_index(self, n_samples: int, n_tokens: int) -> Optional[int]:
        for i, (bs, tb) in enumerate(zip(self.buckets_samples, self.token_buckets)):
            if n_samples <= bs and n_tokens <= tb:
                return i
        return None

    def __len__(self) -> int:
        return len(self._batches)

    @property
    def num_utts(self) -> int:
        return len(self._items)

    def _materialize(self, bi: int, idxs: List[int], pad_to_batch: int) -> Batch:
        n_bucket = self.buckets_samples[bi]
        l_bucket = self.token_buckets[bi]
        b = max(len(idxs), 1) if pad_to_batch == 0 else pad_to_batch
        utts = [self._items[idx][0] for idx in idxs]
        wav = None
        if utts and all(u.wav_path for u in utts):
            # native C++ threaded decode+pad (no GIL, no worker forks)
            try:
                from e2e_asr_tpu.native.audio_io import pack_batch

                packed, lens = pack_batch([u.wav_path for u in utts], n_bucket)
                wav = np.zeros((b, n_bucket), np.float32)
                wav_len = np.zeros((b,), np.int32)
                wav[: len(utts)] = packed
                wav_len[: len(utts)] = lens.astype(np.int32)
            except Exception:
                wav = None
        if wav is None:
            wav = np.zeros((b, n_bucket), np.float32)
            wav_len = np.zeros((b,), np.int32)
            for j, idx in enumerate(idxs):
                u = self._items[idx][0]
                x = self._wav_cache.get(idx)
                if x is None:
                    x = u.load()
                    if self._cache_used + x.nbytes <= self._cache_cap:
                        self._wav_cache[idx] = x
                        self._cache_used += x.nbytes
                wav[j, : len(x)] = x[:n_bucket]
                wav_len[j] = min(len(x), n_bucket)
        txt = np.zeros((b, l_bucket), np.int32)
        txt_len = np.zeros((b,), np.int32)
        uids = []
        for j, idx in enumerate(idxs):
            u, ids, _ = self._items[idx]
            txt[j, : len(ids)] = ids[:l_bucket]
            txt_len[j] = min(len(ids), l_bucket)
            uids.append(u.uid)
        # batch padding rows keep wav_len=0/text_len=0 => fully masked
        uids += [""] * (b - len(idxs))
        return Batch(wav, wav_len, txt, txt_len, tuple(uids))

    def epoch(
        self, epoch_idx: int = 0, ascending: Optional[bool] = None, skip_first: int = 0
    ) -> Iterator[Batch]:
        """One epoch of batches, optionally shuffled, prefetched.

        skip_first: skip that many batches *without materializing them* —
        used by resume to fast-forward the data stream deterministically.
        """
        order = list(range(len(self._batches)))
        asc = self.ascending if ascending is None else ascending
        if asc:
            pass  # already duration-ascending by construction
        elif self.shuffle:
            np.random.RandomState(self.seed + epoch_idx).shuffle(order)
        order = order[skip_first:]

        pad_bs = {bi: max(len(c) for b2, c in self._batches if b2 == bi) for bi, _ in self._batches}

        if self.num_workers <= 0:
            for oi in order:
                bi, idxs = self._batches[oi]
                yield self._materialize(bi, idxs, pad_bs[bi])
            return

        q: queue_mod.Queue = queue_mod.Queue(maxsize=4)

        def worker():
            try:
                for oi in order:
                    bi, idxs = self._batches[oi]
                    q.put(self._materialize(bi, idxs, pad_bs[bi]))
            finally:
                q.put(None)

        th = threading.Thread(target=worker, daemon=True)
        th.start()
        while True:
            item = q.get()
            if item is None:
                break
            yield item

    def forever(
        self, start_epoch: int = 0, curriculum_epochs: int = 0, skip_steps: int = 0
    ) -> Iterator[Batch]:
        """Endless step-based iteration (ref: step loop to max_step).

        skip_steps fast-forwards past the batches a resumed run already
        consumed, so checkpoint resume replays the exact data trajectory.
        """
        e = start_epoch
        n = max(len(self._batches), 1)
        e += skip_steps // n
        skip = skip_steps % n
        while True:
            yield from self.epoch(e, ascending=(e < curriculum_epochs), skip_first=skip)
            skip = 0
            e += 1


class TextLoader:
    """LM batches: fixed-shape token buckets (ref: collect_text_batch)."""

    def __init__(
        self,
        utts: List[corpus_mod.Utterance],
        tokenizer: text_mod.TextEncoder,
        batch_size: int,
        token_buckets: Sequence[int] = (32, 64, 128, 256, 512),
        shuffle: bool = True,
        seed: int = 0,
        process_index: int = 0,
        process_count: int = 1,
    ):
        utts = [u for i, u in enumerate(utts) if i % process_count == process_index]
        self.token_buckets = list(token_buckets)
        items: List[Tuple[List[int], int]] = []
        for u in utts:
            ids = tokenizer.encode(u.text)
            for i, tb in enumerate(self.token_buckets):
                if len(ids) <= tb:
                    items.append((ids, i))
                    break
        items.sort(key=lambda it: len(it[0]))
        per_bucket: Dict[int, List[List[int]]] = {}
        for ids, bi in items:
            per_bucket.setdefault(bi, []).append(ids)
        self._batches: List[Tuple[int, List[List[int]]]] = []
        for bi, seqs in sorted(per_bucket.items()):
            for s in range(0, len(seqs), batch_size):
                self._batches.append((bi, seqs[s : s + batch_size]))
        self.shuffle = shuffle
        self.seed = seed
        self.batch_size = batch_size

    def __len__(self):
        return len(self._batches)

    def epoch(self, epoch_idx: int = 0) -> Iterator[Dict[str, np.ndarray]]:
        order = list(range(len(self._batches)))
        if self.shuffle:
            np.random.RandomState(self.seed + epoch_idx).shuffle(order)
        pad_bs = {bi: max(len(c) for b2, c in self._batches if b2 == bi) for bi, _ in self._batches}
        for oi in order:
            bi, seqs = self._batches[oi]
            b = pad_bs[bi]
            l = self.token_buckets[bi]
            txt = np.zeros((b, l), np.int32)
            txt_len = np.zeros((b,), np.int32)
            for j, ids in enumerate(seqs):
                txt[j, : len(ids)] = ids[:l]
                txt_len[j] = min(len(ids), l)
            yield {"text": txt, "text_len": txt_len}

    def forever(self) -> Iterator[Dict[str, np.ndarray]]:
        e = 0
        while True:
            yield from self.epoch(e)
            e += 1


def build_tokenizer(cfg: DataConfig, utts: List[corpus_mod.Utterance]) -> text_mod.TextEncoder:
    """Load tokenizer from vocab_file, or derive one from the corpus."""
    mode, vocab = cfg.text.mode, cfg.text.vocab_file
    if vocab:
        return text_mod.load_text_encoder(mode, vocab)
    texts = [u.text for u in utts]
    if mode == "character":
        return text_mod.CharacterTextEncoder.from_corpus(texts)
    if mode == "word":
        return text_mod.WordTextEncoder.from_corpus(texts)
    if mode == "subword":
        return text_mod.SubwordTextEncoder.train(texts, vocab_size=500)
    if mode == "bert":
        return text_mod.BertTextEncoder.from_corpus(texts)
    raise ValueError(f"unknown text mode {mode}")


def load_dataset(
    cfg: DataConfig,
    ascending: bool = False,
    process_index: int = 0,
    process_count: int = 1,
    num_workers: Optional[int] = None,
):
    """ref: src/data.py load_dataset(...) -> (tr, dv, feat_dim, vocab, tokenizer, msg).

    Returns (train_loader, dev_loader, feat_dim, vocab_size, tokenizer, msg).
    """
    c = cfg.corpus
    win = int(cfg.audio.sample_rate * cfg.audio.frame_length / 1000)
    shift = int(cfg.audio.sample_rate * cfg.audio.frame_shift / 1000)
    tr_utts = corpus_mod.load_corpus(c.name, c.path, c.train_split)
    dv_utts = corpus_mod.load_corpus(c.name, c.path, c.dev_split)
    tokenizer = build_tokenizer(cfg, tr_utts)
    nw = c.num_workers if num_workers is None else num_workers
    common = dict(
        buckets_frames=c.buckets,
        token_buckets=c.token_buckets,
        win=win,
        shift=shift,
        half_batch_len=c.half_batch_len,
        num_workers=nw,
        process_index=process_index,
        process_count=process_count,
    )
    tr = BucketedLoader(
        tr_utts, tokenizer, c.batch_size, shuffle=not ascending, ascending=ascending, **common
    )
    dv = BucketedLoader(dv_utts, tokenizer, c.batch_size, shuffle=False, **common)
    msg = (
        f"corpus {c.name}: {tr.num_utts} train / {dv.num_utts} dev utts "
        f"({tr.skipped}+{dv.skipped} over-bucket skipped), "
        f"{len(tr)}/{len(dv)} batches, vocab={tokenizer.vocab_size} ({cfg.text.mode})"
    )
    return tr, dv, cfg.audio.output_dim, tokenizer.vocab_size, tokenizer, msg


def load_eval_datasets(
    cfg: DataConfig,
    batch_size: Optional[int] = None,
    num_workers: Optional[int] = None,
):
    """Evaluation loaders for BOTH held-out splits (ref: bin/test_asr.py:~30
    loads dev/test loaders; config data.corpus.dev_split/test_split).

    batch_size overrides the corpus batch size — decode batching is its own
    knob (DecodeConfig.batch_size): beam memory scales with B*W*T, unlike
    training. Returns ({split_name: loader}, feat_dim, vocab, tokenizer, msg).
    The tokenizer is derived from the train split (same derivation as
    training) unless data.text.vocab_file pins it.
    """
    c = cfg.corpus
    win = int(cfg.audio.sample_rate * cfg.audio.frame_length / 1000)
    shift = int(cfg.audio.sample_rate * cfg.audio.frame_shift / 1000)
    tokenizer = build_tokenizer(cfg, corpus_mod.load_corpus(c.name, c.path, c.train_split))
    bs = c.batch_size if batch_size is None else batch_size
    nw = c.num_workers if num_workers is None else num_workers
    loaders: Dict[str, BucketedLoader] = {}
    parts = []
    for split_name, splits in (("dev", c.dev_split), ("test", c.test_split)):
        if not splits:
            continue
        utts = corpus_mod.load_corpus(c.name, c.path, splits)
        ld = BucketedLoader(
            utts, tokenizer, bs,
            buckets_frames=c.buckets, token_buckets=c.token_buckets,
            win=win, shift=shift, half_batch_len=c.half_batch_len,
            shuffle=False, num_workers=nw,
        )
        loaders[split_name] = ld
        parts.append(f"{split_name}={ld.num_utts} utts/{len(ld)} batches")
    msg = (
        f"corpus {c.name} eval: {', '.join(parts)}, B={bs}, "
        f"vocab={tokenizer.vocab_size} ({cfg.text.mode})"
    )
    return loaders, cfg.audio.output_dim, tokenizer.vocab_size, tokenizer, msg
