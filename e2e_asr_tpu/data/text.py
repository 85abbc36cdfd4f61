"""Text <-> token-id codecs.

Capability parity with the reference's ``src/text.py:~load_text_encoder``:
character / word / subword modes behind one API. The subword mode is a
self-contained pure-Python BPE (trained from a corpus iterator and stored as
JSON) instead of a sentencepiece binding — sentencepiece is a host-side C++
dependency the reference shells out to; tokenization is pre-processing, not a
device kernel, so a dependency-free implementation keeps the framework
hermetic. Reserved ids follow the reference convention: index 0 doubles as
<sos>/pad/CTC-blank, <eos>=1, <unk>=2 (ref: src/text.py reserved tokens).
"""

from __future__ import annotations

import json
import re
from collections import Counter
from typing import Dict, Iterable, List, Sequence

SOS_ID = 0  # also pad and CTC blank (ref: CTCLoss(blank=0), CE(ignore_index=0))
EOS_ID = 1
UNK_ID = 2
RESERVED = ["<sos>", "<eos>", "<unk>"]


class TextEncoder:
    """Common API: encode/decode/vocab_size (ref: src/text.py)."""

    token_type = "none"

    def encode(self, text: str) -> List[int]:
        raise NotImplementedError

    def decode(self, ids: Sequence[int], ignore_repeat: bool = False) -> str:
        """ids -> text. ``ignore_repeat`` collapses CTC-style repeats."""
        raise NotImplementedError

    @property
    def vocab_size(self) -> int:
        raise NotImplementedError

    @property
    def pad_idx(self) -> int:
        return SOS_ID

    @property
    def sos_idx(self) -> int:
        return SOS_ID

    @property
    def eos_idx(self) -> int:
        return EOS_ID

    @property
    def unk_idx(self) -> int:
        return UNK_ID

    def _strip_ids(self, ids: Sequence[int], ignore_repeat: bool) -> List[int]:
        out: List[int] = []
        prev = -1
        for i in ids:
            i = int(i)
            if i == EOS_ID:
                break
            keep = i not in (SOS_ID,) and not (ignore_repeat and i == prev)
            prev = i
            if keep:
                out.append(i)
        return out


class CharacterTextEncoder(TextEncoder):
    """ref: src/text.py CharacterTextEncoder — vocab is a char list file."""

    token_type = "character"

    def __init__(self, vocab_list: Sequence[str]):
        assert list(vocab_list[:3]) == RESERVED, "vocab must start with reserved tokens"
        self._vocab = list(vocab_list)
        self._idx = {t: i for i, t in enumerate(self._vocab)}

    @classmethod
    def load_from_file(cls, vocab_file: str) -> "CharacterTextEncoder":
        with open(vocab_file) as f:
            vocab = [ln.rstrip("\n") for ln in f if ln.rstrip("\n")]
        if vocab[:3] != RESERVED:
            vocab = RESERVED + vocab
        return cls(vocab)

    @classmethod
    def from_corpus(cls, texts: Iterable[str]) -> "CharacterTextEncoder":
        chars = sorted({c for t in texts for c in t.upper()})
        return cls(RESERVED + chars)

    def encode(self, text: str) -> List[int]:
        return [self._idx.get(c, UNK_ID) for c in text.upper()] + [EOS_ID]

    def decode(self, ids: Sequence[int], ignore_repeat: bool = False) -> str:
        return "".join(self._vocab[i] for i in self._strip_ids(ids, ignore_repeat))

    @property
    def vocab_size(self) -> int:
        return len(self._vocab)

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            f.write("\n".join(self._vocab) + "\n")


class WordTextEncoder(TextEncoder):
    """ref: src/text.py WordTextEncoder — whitespace words, <unk> fallback."""

    token_type = "word"

    def __init__(self, vocab_list: Sequence[str]):
        assert list(vocab_list[:3]) == RESERVED
        self._vocab = list(vocab_list)
        self._idx = {t: i for i, t in enumerate(self._vocab)}

    @classmethod
    def load_from_file(cls, vocab_file: str) -> "WordTextEncoder":
        with open(vocab_file) as f:
            vocab = [ln.rstrip("\n") for ln in f if ln.rstrip("\n")]
        if vocab[:3] != RESERVED:
            vocab = RESERVED + vocab
        return cls(vocab)

    @classmethod
    def from_corpus(cls, texts: Iterable[str], max_vocab: int = 10000) -> "WordTextEncoder":
        counts = Counter(w for t in texts for w in t.upper().split())
        words = [w for w, _ in counts.most_common(max_vocab)]
        return cls(RESERVED + sorted(words))

    def encode(self, text: str) -> List[int]:
        return [self._idx.get(w, UNK_ID) for w in text.upper().split()] + [EOS_ID]

    def decode(self, ids: Sequence[int], ignore_repeat: bool = False) -> str:
        return " ".join(self._vocab[i] for i in self._strip_ids(ids, ignore_repeat))

    @property
    def vocab_size(self) -> int:
        return len(self._vocab)

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            f.write("\n".join(self._vocab) + "\n")


_WORD_BOUNDARY = "▁"  # ▁ word-start marker, sentencepiece-style surface form


class SubwordTextEncoder(TextEncoder):
    """Pure-Python BPE subword codec (sentencepiece-model replacement).

    ref: src/text.py SubwordTextEncoder wraps a sentencepiece C++ model; here
    the merge table is trained in-process (`train`) and persisted to JSON so
    the framework has no native tokenizer dependency. Surface form uses the
    ▁ word-boundary convention so decode() is a simple join+replace.
    """

    token_type = "subword"

    def __init__(self, vocab_list: Sequence[str], merges: Sequence[Sequence[str]]):
        assert list(vocab_list[:3]) == RESERVED
        self._vocab = list(vocab_list)
        self._idx = {t: i for i, t in enumerate(self._vocab)}
        self._merges: Dict[tuple, int] = {tuple(m): r for r, m in enumerate(merges)}
        self._cache: Dict[str, List[str]] = {}

    # -- training ---------------------------------------------------------
    @classmethod
    def train(
        cls, texts: Iterable[str], vocab_size: int = 1000, max_merge_rounds: int = 100000
    ) -> "SubwordTextEncoder":
        word_counts = Counter(
            _WORD_BOUNDARY + w for t in texts for w in t.upper().split()
        )
        # seed vocab: all single characters present
        pieces = {c for w in word_counts for c in w}
        words = {w: list(w) for w in word_counts}
        merges: List[tuple] = []
        while len(pieces) + len(RESERVED) < vocab_size and len(merges) < max_merge_rounds:
            pair_counts: Counter = Counter()
            for w, sym in words.items():
                cnt = word_counts[w]
                for a, b in zip(sym, sym[1:]):
                    pair_counts[(a, b)] += cnt
            if not pair_counts:
                break
            (a, b), n = pair_counts.most_common(1)[0]
            if n < 2:
                break
            merges.append((a, b))
            ab = a + b
            pieces.add(ab)
            for w, sym in words.items():
                out, i = [], 0
                while i < len(sym):
                    if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                        out.append(ab)
                        i += 2
                    else:
                        out.append(sym[i])
                        i += 1
                words[w] = out
        vocab = RESERVED + sorted(pieces)
        return cls(vocab, merges)

    # -- persistence ------------------------------------------------------
    def save(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(
                {
                    "vocab": self._vocab,
                    "merges": [list(m) for m in sorted(self._merges, key=self._merges.get)],
                },
                f,
            )

    @classmethod
    def load_from_file(cls, path: str) -> "SubwordTextEncoder":
        with open(path) as f:
            d = json.load(f)
        return cls(d["vocab"], d["merges"])

    # -- codec ------------------------------------------------------------
    def _bpe(self, word: str) -> List[str]:
        if word in self._cache:
            return self._cache[word]
        sym = list(word)
        while len(sym) > 1:
            ranked = [
                (self._merges.get((a, b), 1 << 60), i)
                for i, (a, b) in enumerate(zip(sym, sym[1:]))
            ]
            rank, i = min(ranked)
            if rank >= 1 << 60:
                break
            sym = sym[:i] + [sym[i] + sym[i + 1]] + sym[i + 2 :]
        self._cache[word] = sym
        return sym

    def encode(self, text: str) -> List[int]:
        ids: List[int] = []
        for w in text.upper().split():
            for piece in self._bpe(_WORD_BOUNDARY + w):
                ids.append(self._idx.get(piece, UNK_ID))
        return ids + [EOS_ID]

    def decode(self, ids: Sequence[int], ignore_repeat: bool = False) -> str:
        surf = "".join(self._vocab[i] for i in self._strip_ids(ids, ignore_repeat))
        return surf.replace(_WORD_BOUNDARY, " ").strip()

    @property
    def vocab_size(self) -> int:
        return len(self._vocab)


_BERT_SPECIALS = {"[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"}


class BertTextEncoder(TextEncoder):
    """WordPiece codec over a BERT-format vocab.txt (ref: src/text.py's
    optional BERT-tokenizer mode, which wraps huggingface BertTokenizer).

    Dependency-free re-implementation: greedy longest-prefix WordPiece with
    '##' continuation pieces, loaded from a standard vocab.txt (one token per
    line; BERT special tokens and [unusedN] slots are dropped and replaced by
    this framework's reserved ids 0=<sos>/pad/blank, 1=<eos>, 2=<unk> so the
    CTC/CE conventions hold for every tokenizer mode). Case is normalized to
    the vocab's dominant case (uncased BERT vocabs are lowercase; ASR
    transcripts are uppercase).
    """

    token_type = "bert"

    def __init__(self, vocab_list: Sequence[str]):
        assert list(vocab_list[:3]) == RESERVED
        self._vocab = list(vocab_list)
        self._idx = {t: i for i, t in enumerate(self._vocab)}
        alpha = [t for t in vocab_list[3:] if t.strip("#").isalpha()]
        lower = sum(1 for t in alpha if t == t.lower())
        self._lower = lower >= len(alpha) / 2
        self._max_piece = max((len(t) for t in self._vocab), default=1)

    @classmethod
    def load_from_file(cls, vocab_file: str) -> "BertTextEncoder":
        with open(vocab_file) as f:
            toks = [ln.rstrip("\n") for ln in f if ln.rstrip("\n")]
        toks = [
            t for t in toks
            if t not in _BERT_SPECIALS and not re.fullmatch(r"\[unused\d+\]", t)
            and t not in RESERVED
        ]
        return cls(RESERVED + toks)

    def _norm(self, text: str) -> str:
        return text.lower() if self._lower else text.upper()

    def _wordpiece(self, word: str) -> List[str]:
        pieces: List[str] = []
        i = 0
        while i < len(word):
            end = min(len(word), i + self._max_piece)
            piece = None
            while end > i:
                cand = ("##" if i else "") + word[i:end]
                if cand in self._idx:
                    piece = cand
                    break
                end -= 1
            if piece is None:
                return ["<unk>"]  # whole word -> unk (BERT convention)
            pieces.append(piece)
            i = end
        return pieces

    def encode(self, text: str) -> List[int]:
        ids: List[int] = []
        for w in self._norm(text).split():
            for piece in self._wordpiece(w):
                ids.append(self._idx.get(piece, UNK_ID))
        return ids + [EOS_ID]

    def decode(self, ids: Sequence[int], ignore_repeat: bool = False) -> str:
        out: List[str] = []
        for i in self._strip_ids(ids, ignore_repeat):
            t = self._vocab[i]
            if t.startswith("##") and out:
                out[-1] += t[2:]
            else:
                out.append(t)
        return " ".join(out)

    @property
    def vocab_size(self) -> int:
        return len(self._vocab)

    @classmethod
    def from_corpus(cls, texts: Iterable[str], vocab_size: int = 1000) -> "BertTextEncoder":
        """Derive a WordPiece vocab from a corpus (chars + frequent words +
        frequent suffix pieces) — lets the mode run without a pretrained
        vocab file, e.g. on the synthetic corpus."""
        counts = Counter(w for t in texts for w in t.upper().split())
        pieces = {c for w in counts for c in w}
        pieces |= {"##" + c for c in pieces}
        for w, _ in counts.most_common(max(0, vocab_size - len(pieces) - 3)):
            pieces.add(w)
        return cls(RESERVED + sorted(pieces))

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            f.write("\n".join(self._vocab) + "\n")


def load_text_encoder(mode: str, vocab_file: str) -> TextEncoder:
    """ref: src/text.py load_text_encoder(mode, vocab_file) dispatch."""
    if mode == "character":
        return CharacterTextEncoder.load_from_file(vocab_file)
    if mode == "word":
        return WordTextEncoder.load_from_file(vocab_file)
    if mode == "subword":
        return SubwordTextEncoder.load_from_file(vocab_file)
    if mode == "bert":
        return BertTextEncoder.load_from_file(vocab_file)
    raise ValueError(f"unknown text mode '{mode}' (character|word|subword|bert)")
