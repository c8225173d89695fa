"""Tokenizer property tests (VERDICT round-1 item 5b).

The real ``bpe_simple_vocab_16e6.txt.gz`` is absent from the sandbox (golden
tests against it are gated in test_tokenizer_golden.py); these tests pin the
BPE *machinery* so the real-merge-table path is not first exercised in
production: merge-order semantics on a synthetic table, byte-level
round-trips over random unicode, and the tokenize() output contract.
"""

import random
import string

import numpy as np
import pytest

from tapclip_tpu.data.tokenizer import (
    EOT_TEXT,
    SOT_TEXT,
    SimpleTokenizer,
    basic_clean,
    whitespace_clean,
)


@pytest.fixture(scope="module")
def merge_tok(tmp_path_factory):
    """Tokenizer over a tiny synthetic merge table (rank order matters)."""
    merges = [
        "t h",        # rank 0: t+h -> th
        "th e</w>",   # rank 1: th+e</w> -> the</w>
        "h e",        # rank 2: h+e (non-terminal)
        "e r</w>",    # rank 3
        "he r</w>",   # rank 4 (would apply only if rank 2 fired first)
    ]
    p = tmp_path_factory.mktemp("bpe") / "merges.txt"
    p.write_text("#version: synthetic\n" + "\n".join(merges) + "\n")
    return SimpleTokenizer(bpe_path=str(p), context_length=16)


@pytest.fixture(scope="module")
def fallback_tok():
    return SimpleTokenizer(context_length=16)


def test_merge_rank_order(merge_tok):
    # "the": (t,h,e</w>) -> rank0 (t,h) -> (th, e</w>) -> rank1 -> the</w>
    assert merge_tok.bpe("the") == "the</w>"
    # "he": (h, e</w>) — pair (h, e</w>) is NOT a merge ((h,e) rank2 is
    # non-terminal) -> stays split.
    assert merge_tok.bpe("he") == "h e</w>"
    # "her": (h,e,r</w>) -> rank2 (h,e) -> (he, r</w>) -> rank4 -> her</w>
    # (rank3 (e, r</w>) loses to rank2 at the first step).
    assert merge_tok.bpe("her") == "her</w>"
    # "ther": (t,h,e,r</w>) -> rank0 -> (th,e,r</w>); candidates now
    # (th,e) [none] and (e,r</w>) [rank3] -> (th, er</w>).
    assert merge_tok.bpe("ther") == "th er</w>"


def test_merged_ids_in_vocab(merge_tok):
    for word in ["the", "he", "her", "ther", "hello"]:
        for piece in merge_tok.bpe(word).split(" "):
            assert piece in merge_tok.encoder, piece


def test_encode_decode_byte_roundtrip_random_unicode(fallback_tok, merge_tok):
    rng = random.Random(0)
    alphabet = string.ascii_letters + string.digits + " .,!?'-_" + "éüñ中文😀"
    for tok in (fallback_tok, merge_tok):
        for _ in range(50):
            text = "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 40)))
            cleaned = whitespace_clean(basic_clean(text)).lower()
            if not cleaned:
                continue
            decoded = tok.decode(tok.encode(text))
            # CLIP decode puts a space after every word token; byte content
            # must round-trip exactly modulo whitespace.
            assert decoded.replace(" ", "") == cleaned.replace(" ", "")


def test_tokenize_contract(merge_tok):
    out = merge_tok.tokenize(["the her", ""], 16)
    assert out.shape == (2, 16) and out.dtype == np.int32
    sot, eot = merge_tok.sot_token, merge_tok.eot_token
    for row, n_body in zip(out, (2, 0)):
        assert row[0] == sot
        assert row[1 + n_body] == eot
        assert (row[2 + n_body :] == 0).all()  # zero-padded
    # SOT/EOT are the two largest ids -> argmax finds EOT (encode_text pools
    # on argmax; SOT is at position 0 but EOT id is the larger of the two).
    assert eot == merge_tok.vocab_size - 1 and sot == merge_tok.vocab_size - 2
    assert (out.argmax(axis=1) == np.array([3, 1])).all()


def test_tokenize_truncation_keeps_eot(merge_tok):
    long = " ".join(["hello"] * 50)
    out = merge_tok.tokenize([long], 16)[0]
    assert out[0] == merge_tok.sot_token
    assert out[-1] == merge_tok.eot_token
    assert (out != 0).all()


def test_special_tokens_pass_through(merge_tok):
    ids = merge_tok.encode(f"{SOT_TEXT} the {EOT_TEXT}")
    assert ids[0] == merge_tok.sot_token
    assert ids[-1] == merge_tok.eot_token


def test_cache_consistency(merge_tok):
    first = merge_tok.encode("the ther her")
    second = merge_tok.encode("the ther her")
    assert first == second


def test_fallback_vs_merges_agree_without_applicable_merges(fallback_tok, merge_tok):
    """Words whose pairs never hit the merge table tokenize identically
    (merge vocab appends entries after the byte vocab, so byte ids match)."""
    for word in ["xyz", "qqq", "42"]:
        assert fallback_tok.encode(word) == merge_tok.encode(word)
