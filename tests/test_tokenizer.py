import gzip

import numpy as np
import pytest

from federated_multi_modal_tpu.tokenizer import (
    CONTEXT_LENGTH,
    EOT_TOKEN,
    SOT_TOKEN,
    VOCAB_SIZE,
    ClipTokenizer,
    tokenize,
)
from federated_multi_modal_tpu.tokenizer.bpe import bytes_to_unicode


def test_bytes_to_unicode_reversible():
    b2u = bytes_to_unicode()
    assert len(b2u) == 256
    assert len(set(b2u.values())) == 256
    # printable ascii maps to itself
    assert b2u[ord("a")] == "a"
    assert b2u[ord("!")] == "!"


def test_tokenize_shape_and_specials():
    out = tokenize(["a photo of a cat.", "dog"])
    assert out.shape == (2, CONTEXT_LENGTH)
    assert out.dtype == np.int32
    assert (out[:, 0] == SOT_TOKEN).all()
    for row in out:
        nz = row[row > 0]
        assert nz[-1] == EOT_TOKEN
        # EOT must be the max id so argmax pooling finds it
        assert row.argmax() == len(nz) - 1
    assert (out < VOCAB_SIZE).all()


def test_tokenize_deterministic_and_case_insensitive():
    a = tokenize("A Photo of a CAT")
    b = tokenize("a photo of a cat")
    assert (a == b).all()


def test_tokenize_too_long_raises_and_truncates():
    long_text = "word " * 200
    with pytest.raises(RuntimeError):
        tokenize(long_text)
    out = tokenize(long_text, truncate=True)
    assert out.shape == (1, CONTEXT_LENGTH)
    assert out[0, -1] == EOT_TOKEN


def _write_merges(tmp_path, merges):
    """Create a synthetic merge table in the official file format."""
    lines = ["#version: synthetic"]
    lines += [f"{a} {b}" for a, b in merges]
    # pad out so header arithmetic stays harmless
    path = tmp_path / "merges.txt.gz"
    with gzip.open(path, "wt") as f:
        f.write("\n".join(lines))
    return str(path)


def test_bpe_merge_algorithm_with_synthetic_table(tmp_path):
    # merges: "lo" first, then "low</w>"... exercising greedy lowest-rank order
    merges = [("l", "o"), ("lo", "w</w>"), ("e", "r</w>")]
    path = _write_merges(tmp_path, merges)
    tok = ClipTokenizer(bpe_path=path)
    assert not tok.fallback_mode

    # "low" -> l+o merge, then lo+w</w> merge -> single token "low</w>"
    assert tok.bpe("low") == "low</w>"
    # "lower" -> "lo w e r</w>" -> lo, w, er</w>
    assert tok.bpe("lower") == "lo w er</w>"
    ids = tok.encode("low lower")
    assert tok.decode(ids).strip() == "low lower"


def test_fallback_roundtrip():
    tok = ClipTokenizer(bpe_path="/nonexistent/path")
    assert tok.fallback_mode
    ids = tok.encode("hello world")
    assert all(0 <= i < VOCAB_SIZE for i in ids)
    assert tok.decode(ids).strip() == "hello world"
    # CLIP's word regex splits digits individually ([\p{N}])
    assert tok.decode(tok.encode("123")).strip() == "1 2 3"
