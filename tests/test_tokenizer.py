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


# ---------------------------------------------------------------------------
# Real-merges path (VERDICT r1 item 4)
# ---------------------------------------------------------------------------

# Golden (text -> token ids) pairs for the REAL OpenAI CLIP vocabulary, from
# the canonical clip.tokenize. These run whenever a real merges file is
# present (AIIC_BPE_PATH or bpe_simple_vocab_16e6.txt.gz next to
# tokenizer.py) so the merges code path is proven the moment real weights /
# vocab arrive in an environment.
GOLDEN_REAL_VOCAB = [
    ("a photo of a cat", [49406, 320, 1125, 539, 320, 2368, 49407]),
    ("a photo of a dog", [49406, 320, 1125, 539, 320, 1929, 49407]),
]


def _real_tokenizer():
    tok = ClipTokenizer()
    return None if tok.hermetic else tok


@pytest.mark.parametrize("text,ids", GOLDEN_REAL_VOCAB)
def test_golden_tokens_real_vocab(text, ids):
    tok = _real_tokenizer()
    if tok is None:
        pytest.skip("no real BPE merges file in this environment")
    got = [int(t) for t in tok.encode(text)]
    assert [tok.sot] + got + [tok.eot] == ids


def test_real_vocab_structure():
    tok = _real_tokenizer()
    if tok is None:
        pytest.skip("no real BPE merges file in this environment")
    assert len(tok.encoder) == VOCAB_SIZE
    assert tok.sot == 49406 and tok.eot == 49407
    assert tok.encoder["!"] == 0 and tok.encoder["!</w>"] == 256
    # diacritics and contractions must round-trip through real merges too
    for text in ("wnętrze z żółtą ścianą", "don't stop", "it's l'art"):
        assert tok.decode(tok.encode(text)) == text


def test_bpe_rank_priority_hand_verified(tmp_path):
    """Merges must apply lowest-rank-first (the canonical BPE rule): with
    ranks {(a,b):0, (b,a):1}, 'abab' -> 'ab a b</w>' — a rank-order bug
    would instead produce 'a ba b</w>'."""
    import gzip

    path = tmp_path / "bpe.txt.gz"
    with gzip.open(path, "wt", encoding="utf-8") as f:
        f.write("#version\na b\nb a\n")
    tok = ClipTokenizer(bpe_path=str(path))
    assert tok.bpe("abab") == "ab a b</w>"
    # chained merges collapse a whole word when ranks allow
    path2 = tmp_path / "bpe2.txt.gz"
    with gzip.open(path2, "wt", encoding="utf-8") as f:
        f.write("#version\nh e\nhe l\nhel l\nhell o</w>\n")
    tok2 = ClipTokenizer(bpe_path=str(path2))
    assert tok2.bpe("hello") == "hello</w>"
    assert len(tok2.encode("hello")) == 1


def test_bpe_sha256_enforcement(tmp_path, monkeypatch):
    """AIIC_BPE_SHA256, when set, must reject a mismatched merges file."""
    import gzip
    import hashlib

    path = tmp_path / "bpe.txt.gz"
    with gzip.open(path, "wt", encoding="utf-8") as f:
        f.write("#version\na b\n")
    monkeypatch.setenv("AIIC_BPE_SHA256", "0" * 64)
    with pytest.raises(ValueError, match="sha256"):
        ClipTokenizer(bpe_path=str(path))
    good = hashlib.sha256(path.read_bytes()).hexdigest()
    monkeypatch.setenv("AIIC_BPE_SHA256", good)
    tok = ClipTokenizer(bpe_path=str(path))  # matching hash loads fine
    assert not tok.hermetic


def test_nonstandard_merge_count_warns(tmp_path):
    import gzip
    import warnings as w

    path = tmp_path / "bpe.txt.gz"
    with gzip.open(path, "wt", encoding="utf-8") as f:
        f.write("#version\na b\n")
    with w.catch_warnings(record=True) as rec:
        w.simplefilter("always")
        ClipTokenizer(bpe_path=str(path))
    assert any("48894" in str(r.message) for r in rec)


def test_hermetic_vocab_with_real_weights_warns():
    """InteriorAnalyzer must be loud when real backbone weights meet the
    hermetic fallback vocabulary (silent-wrong-answers configuration)."""
    import warnings as w

    import jax

    from aiic_tpu.engine.analyzer import InteriorAnalyzer
    from aiic_tpu.models import TINY_TEST, init_clip_params

    params = init_clip_params(jax.random.PRNGKey(0), TINY_TEST)
    with w.catch_warnings(record=True) as rec:
        w.simplefilter("always")
        InteriorAnalyzer(params=params, config=TINY_TEST, training_data=[])
    assert any("HERMETIC" in str(r.message) for r in rec)
