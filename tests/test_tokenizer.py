"""Tokenizer tests (hermetic fallback vocabulary + BPE machinery)."""

import numpy as np
import pytest

from aiic_tpu.data.tokenizer import (
    CONTEXT_LENGTH,
    VOCAB_SIZE,
    ClipTokenizer,
    bytes_to_unicode,
    tokenize,
    whitespace_clean,
)


def test_bytes_to_unicode_is_reversible():
    m = bytes_to_unicode()
    assert len(m) == 256
    assert len(set(m.values())) == 256


def test_shapes_and_specials():
    out = tokenize(["wnętrze w stylu nowoczesny", "kitchen"])
    assert out.shape == (2, CONTEXT_LENGTH)
    assert out.dtype == np.int32
    assert (out[:, 0] == VOCAB_SIZE - 2).all()  # SOT
    for row in out:
        nz = row[row != 0]
        assert nz[-1] == VOCAB_SIZE - 1  # EOT closes every prompt
    # padding is zeros
    assert (out[0][np.argmax(out[0] == 0):] == 0).all()


def test_eot_is_max_token():
    """encode_text pools at argmax(tokens); EOT must be the max id."""
    out = tokenize(["a test", "wnętrze z drewnem"])
    for row in out:
        eot_pos = int(np.argmax(row))
        assert row[eot_pos] == VOCAB_SIZE - 1


def test_lowercase_and_whitespace():
    assert (tokenize("Living  ROOM ") == tokenize("living room")).all()
    assert whitespace_clean("  a \t b\n") == "a b"


def test_truncation():
    long = "wnętrze " * 200
    out = tokenize([long], truncate=True)
    assert out.shape == (1, CONTEXT_LENGTH)
    assert out[0, -1] == VOCAB_SIZE - 1
    with pytest.raises(ValueError):
        tokenize([long], truncate=False)


def test_decode_roundtrip_hermetic():
    tok = ClipTokenizer()
    text = "nowoczesna kuchnia z wyspą"
    ids = tok.encode(text)
    assert tok.decode(ids) == text


def test_decode_keeps_interior_token_zero():
    """Only trailing zero-padding is stripped: in the real CLIP vocab id 0 is
    the legitimate token '!', so a blanket filter would drop characters."""
    tok = ClipTokenizer()
    ids = tok.encode("ab")
    padded = list(ids) + [0, 0, 0]
    assert tok.decode(padded) == tok.decode(ids)
    tok0 = tok.decoder[0].replace("</w>", "")
    interior = [0] + list(ids)
    assert tok.decode(interior).startswith(tok.decode([0]))
    assert tok0 in tok.decode(interior)


def test_unicode_polish_chars():
    """Polish diacritics must tokenize deterministically (multi-byte UTF-8)."""
    a = tokenize("wnętrze z żółtą ścianą")
    b = tokenize("wnętrze z żółtą ścianą")
    assert (a == b).all()
    assert a.max() == VOCAB_SIZE - 1


def test_bpe_merges_applied_when_vocab_file_present(tmp_path):
    """With a merges file, BPE must merge pairs by rank (real-vocab machinery)."""
    import gzip

    # Minimal merges file: header + two merges covering the word "aab"
    content = "#version\n" + "a a\naa b</w>\n"
    path = tmp_path / "bpe.txt.gz"
    with gzip.open(path, "wt", encoding="utf-8") as f:
        f.write(content)
    tok = ClipTokenizer(bpe_path=str(path))
    assert not tok.hermetic
    assert tok.bpe("aab") == "aab</w>"
    assert tok.bpe("ab") == "a b</w>"
    ids = tok.encode("aab")
    assert len(ids) == 1


def test_word_split_matches_clip_regex_semantics():
    """The regex word splitter must reproduce CLIP's splitting on tricky
    inputs: contractions split off, digits split individually, punctuation
    runs grouped, unicode letters kept together."""
    from aiic_tpu.data.tokenizer import _WORD_PATTERN
    import regex as re

    def split(text):
        return re.findall(_WORD_PATTERN, text.lower())

    assert split("it's") == ["it", "'s"]
    assert split("don't we'll") == ["don", "'t", "we", "'ll"]
    assert split("room123") == ["room", "1", "2", "3"]
    assert split("hello, world!!") == ["hello", ",", "world", "!!"]
    assert split("wnętrze") == ["wnętrze"]
    assert split("a-b") == ["a", "-", "b"]
    assert split("3.5m") == ["3", ".", "5", "m"]


def test_tokenizer_handles_empty_and_whitespace():
    out = tokenize(["", "   "])
    # SOT + EOT only
    for row in out:
        nz = row[row != 0]
        assert list(nz) == [VOCAB_SIZE - 2, VOCAB_SIZE - 1]
