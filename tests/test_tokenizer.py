"""Tokenizer tests: CLIP SimpleTokenizer semantics.

Golden values for the BPE machinery that don't need the real 49408-entry
merge table; layout tests (sot/eot/pad/truncate) match open_clip's tokenize
contract used at /root/reference/models/prompt_learner.py:31-33.
"""

import numpy as np
import pytest

from tapclip_tpu.data.tokenizer import (
    SimpleTokenizer,
    bytes_to_unicode,
    whitespace_clean,
)


@pytest.fixture(scope="module")
def tok():
    return SimpleTokenizer()


def test_bytes_to_unicode_bijective():
    m = bytes_to_unicode()
    assert len(m) == 256
    assert len(set(m.values())) == 256


def test_vocab_layout(tok):
    # byte vocab + </w> variants + specials (no merges in fallback mode)
    assert tok.vocab_size == 256 + 256 + 2
    assert tok.sot_token == tok.encoder["<|startoftext|>"]
    assert tok.eot_token == tok.encoder["<|endoftext|>"]
    assert tok.eot_token == tok.vocab_size - 1


def test_tokenize_shape_and_specials(tok):
    ids = tok.tokenize(["a photo of a dog", "hello"])
    assert ids.shape == (2, 77)
    assert ids.dtype == np.int32
    assert (ids[:, 0] == tok.sot_token).all()
    for row in ids:
        nz = row[row != 0]
        assert nz[-1] == tok.eot_token
    # EOT id is the max id -> argmax recovers the EOT position (used by
    # encode_text pooling).
    assert ids[0].argmax() == (ids[0] != 0).sum() - 1


def test_tokenize_deterministic_and_case_insensitive(tok):
    a = tok.tokenize("A Photo of a Dog")
    b = tok.tokenize("a photo of a dog")
    np.testing.assert_array_equal(a, b)


def test_truncation_sets_eot(tok):
    long_text = "word " * 200
    ids = tok.tokenize([long_text], context_length=16)
    assert ids.shape == (1, 16)
    assert ids[0, -1] == tok.eot_token
    assert ids[0, 0] == tok.sot_token


def test_encode_decode_roundtrip(tok):
    text = "a photo of a backpack"
    ids = tok.encode(text)
    assert tok.decode(ids).strip() == text


def test_whitespace_clean():
    assert whitespace_clean("  a   b\t c \n") == "a b c"


def test_bpe_merges_applied():
    # Build a tiny merge table on the fly and verify merge order is respected.
    import tempfile, os

    with tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False) as f:
        f.write("#version\n")
        f.write("h e\n")
        f.write("he l\n")
        f.write("hel l\n")
        f.write("hell o</w>\n")
        path = f.name
    try:
        t = SimpleTokenizer(bpe_path=path)
        assert not t.is_fallback
        assert t.bpe("hello") == "hello</w>"
        word_ids = t.encode("hello")
        assert len(word_ids) == 1
        assert t.decoder[word_ids[0]] == "hello</w>"
    finally:
        os.unlink(path)


def test_class_name_with_underscore(tok):
    # OfficeHome class names like "Alarm_Clock" (train.py:38) must tokenize.
    ids = tok.tokenize("a photo of a Alarm_Clock")
    assert (ids[0] == tok.eot_token).sum() == 1
