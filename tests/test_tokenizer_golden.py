"""Golden-vector tokenizer tests against the REAL CLIP merge table.

Skipped unless ``TAPCLIP_BPE_PATH`` points at ``bpe_simple_vocab_16e6.txt.gz``
(not shipped in this sandbox — zero egress). With the real table the
tokenizer must reproduce OpenAI CLIP token ids exactly.
"""

import os

import numpy as np
import pytest

from tapclip_tpu.data.tokenizer import SimpleTokenizer

BPE = os.environ.get("TAPCLIP_BPE_PATH")

pytestmark = pytest.mark.skipif(
    not (BPE and os.path.exists(BPE)), reason="real BPE merge table not available"
)

# Canonical OpenAI CLIP ids (sot=49406, eot=49407).
GOLDEN = {
    "a photo of a cat": [49406, 320, 1125, 539, 320, 2368, 49407],
    "a photo of a dog": [49406, 320, 1125, 539, 320, 1929, 49407],
    "hello world": [49406, 3306, 1002, 49407],
}


@pytest.fixture(scope="module")
def tok():
    return SimpleTokenizer(bpe_path=BPE)


def test_vocab_size(tok):
    assert tok.vocab_size == 49408
    assert not tok.is_fallback


@pytest.mark.parametrize("text,ids", sorted(GOLDEN.items()))
def test_golden_ids(tok, text, ids):
    out = tok.tokenize([text])[0]
    np.testing.assert_array_equal(out[: len(ids)], ids)
    assert (out[len(ids) :] == 0).all()
