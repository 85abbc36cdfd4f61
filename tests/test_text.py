"""Tokenizer round-trip tests (SURVEY.md §4: tokenizer round-trips)."""

import pytest

from e2e_asr_tpu.data.text import (
    EOS_ID,
    SOS_ID,
    UNK_ID,
    CharacterTextEncoder,
    SubwordTextEncoder,
    WordTextEncoder,
    load_text_encoder,
)

CORPUS = [
    "THE QUICK BROWN FOX JUMPS OVER THE LAZY DOG",
    "SPEECH RECOGNITION IS FUN",
    "THE DOG BARKS AT THE FOX",
    "QUICK QUICK SLOW",
]


def test_char_roundtrip(tmp_path):
    enc = CharacterTextEncoder.from_corpus(CORPUS)
    ids = enc.encode("the quick dog")
    assert ids[-1] == EOS_ID
    assert enc.decode(ids) == "THE QUICK DOG"
    # save/load parity
    p = tmp_path / "vocab.txt"
    enc.save(str(p))
    enc2 = load_text_encoder("character", str(p))
    assert enc2.encode("the quick dog") == ids
    assert enc2.vocab_size == enc.vocab_size


def test_char_unk():
    enc = CharacterTextEncoder.from_corpus(["ABC"])
    assert UNK_ID in enc.encode("ABZ")


def test_word_roundtrip(tmp_path):
    enc = WordTextEncoder.from_corpus(CORPUS)
    ids = enc.encode("the dog barks")
    assert enc.decode(ids) == "THE DOG BARKS"
    p = tmp_path / "words.txt"
    enc.save(str(p))
    enc2 = load_text_encoder("word", str(p))
    assert enc2.encode("the dog barks") == ids


def test_subword_roundtrip(tmp_path):
    enc = SubwordTextEncoder.train(CORPUS, vocab_size=60)
    for text in CORPUS:
        ids = enc.encode(text)
        assert enc.decode(ids) == text
        assert ids[-1] == EOS_ID
    p = tmp_path / "bpe.json"
    enc.save(str(p))
    enc2 = load_text_encoder("subword", str(p))
    for text in CORPUS:
        assert enc2.encode(text) == enc.encode(text)


def test_subword_compression():
    """BPE merges: frequent words should need fewer tokens than chars."""
    enc = SubwordTextEncoder.train(CORPUS * 5, vocab_size=80)
    n_sub = len(enc.encode("THE QUICK"))
    assert n_sub < len("THE QUICK") + 1


def test_ctc_repeat_collapse():
    enc = CharacterTextEncoder.from_corpus(["AB"])
    a, b = enc.encode("A")[0], enc.encode("B")[0]
    # blank(0) separated repeats survive; adjacent repeats collapse
    assert enc.decode([a, a, SOS_ID, a, b, b, EOS_ID], ignore_repeat=True) == "AAB"


def test_reserved_ids():
    enc = CharacterTextEncoder.from_corpus(["A"])
    assert enc.pad_idx == 0 and enc.sos_idx == 0 and enc.eos_idx == 1 and enc.unk_idx == 2


def test_bert_wordpiece_roundtrip(tmp_path):
    """BERT-format vocab.txt -> greedy WordPiece with ## continuations
    (ref: src/text.py optional BERT-tokenizer mode)."""
    from e2e_asr_tpu.data.text import BertTextEncoder, load_text_encoder

    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "[unused0]",
             "the", "quick", "brown", "fox", "jump", "##ed", "##s",
             "over", "lazy", "dog", "a", "b", "##c"]
    p = tmp_path / "vocab.txt"
    p.write_text("\n".join(vocab) + "\n")
    enc = load_text_encoder("bert", str(p))
    assert isinstance(enc, BertTextEncoder)
    assert enc.token_type == "bert"
    # reserved framework ids (0=sos/pad/blank, 1=eos, 2=unk), specials dropped
    assert enc.pad_idx == 0 and enc.eos_idx == 1 and enc.unk_idx == 2
    assert enc.vocab_size == 3 + 13

    ids = enc.encode("THE QUICK FOX JUMPED")  # case-normalized to the vocab
    assert ids[-1] == enc.eos_idx
    assert enc.decode(ids) == "the quick fox jumped"
    # continuation pieces: 'jumped' -> 'jump' + '##ed' (2 ids)
    assert len(ids) == 3 + 2 + 1
    # OOV word collapses to a single <unk>
    ids2 = enc.encode("THE ZZZZ FOX")
    assert ids2.count(enc.unk_idx) == 1
    # save/load round trip
    enc.save(str(tmp_path / "v2.txt"))
    enc2 = load_text_encoder("bert", str(tmp_path / "v2.txt"))
    assert enc2.encode("THE QUICK FOX JUMPED") == ids


def test_bert_from_corpus():
    from e2e_asr_tpu.data.text import BertTextEncoder

    enc = BertTextEncoder.from_corpus(["THE QUICK FOX", "THE LAZY DOG"])
    for s in ("THE QUICK FOX", "THE LAZY DOG", "QUX"):
        ids = enc.encode(s)
        assert enc.decode(ids) == s  # chars + ## chars cover any word
