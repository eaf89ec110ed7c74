"""CLIP BPE tokenizer tests with a synthetic merge table."""

import numpy as np
import pytest

from nl_vsgg_tpu.pipelines.tokenizer import SimpleTokenizer, bytes_to_unicode


@pytest.fixture
def tok():
    # tiny merge table: build up "the</w>" and "er"
    merges = [("t", "h"), ("th", "e</w>"), ("e", "r"), ("er", "</w>"),
              ("p", "er"), ("per", "s"), ("pers", "o"), ("perso", "n</w>")]
    return SimpleTokenizer(merges=merges)


def test_byte_unicode_table_bijective():
    t = bytes_to_unicode()
    assert len(t) == 256
    assert len(set(t.values())) == 256


def test_bpe_merges_apply(tok):
    assert tok.bpe("the") == "the</w>"
    assert tok.bpe("person") == "person</w>"
    # unknown word falls back to characters with trailing </w>
    assert tok.bpe("xz") == "x z</w>"


def test_tokenize_framing_and_shapes(tok):
    out = tok.tokenize(["The person!", "the"])
    assert out.shape == (2, 77)
    assert out[0, 0] == tok.sot
    row = out[0][out[0] != 0]
    assert row[-1] == tok.eot
    # "the" encodes to one merged token in both rows
    the_id = tok.encoder["the</w>"]
    assert the_id in out[0] and the_id in out[1]


def test_tokenize_truncation_keeps_eot(tok):
    long = " ".join(["qq"] * 200)
    out = tok.tokenize(long)
    assert out.shape == (1, 77)
    assert out[0, -1] == tok.eot
    assert (out[0] != 0).all()


def test_whitespace_and_case_normalization(tok):
    a = tok.tokenize("THE   PERSON")
    b = tok.tokenize("the person")
    np.testing.assert_array_equal(a, b)


def test_non_ascii_letters_stay_in_word_bucket(tok):
    """CLIP's \\p{L}+ keeps accented words whole; the earlier ASCII-only
    pattern split 'café' into 'caf' + punctuation-'é' (different tokens,
    different text embedding than the reference DAC pipeline)."""
    from nl_vsgg_tpu.pipelines.tokenizer import _PAT
    assert _PAT.findall("café au lait") == ["café", "au", "lait"]
    assert _PAT.findall("naïve person!") == ["naïve", "person", "!"]
    # underscore and digits stay in their CLIP buckets
    assert _PAT.findall("a_b 12") == ["a", "_", "b", "1", "2"]
