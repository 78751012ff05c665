"""CLIP BPE tokenizer goldens (models/text/tokenizer.py).

The reference pipes prompts through the external sam3 package's CLIP
tokenizer after fetching ``bpe_simple_vocab_16e6.txt.gz``
(saber/pretrained_weights.py:104-148). Zero egress keeps the real merges
file out of this environment, so these tests pin the ALGORITHM instead: a
tiny synthetic merges file with hand-derived BPE outcomes proves the
merge loop, vocab construction, special tokens, fixed-width batching and
decode round-trip all follow CLIP's semantics — with the real file the
only difference is the table size.
"""

import gzip

import numpy as np
import pytest

from saber_tpu.models.text.tokenizer import (CONTEXT_LENGTH, SimpleTokenizer,
                                             bytes_to_unicode)

MERGES = ["l o", "lo w", "e r</w>", "low er</w>"]


@pytest.fixture()
def tok(tmp_path):
    path = tmp_path / "merges.txt.gz"
    with gzip.open(path, "wt", encoding="utf8") as f:
        f.write("#version: bpe\n" + "\n".join(MERGES) + "\n")
    return SimpleTokenizer(str(path))


def test_vocab_layout(tok):
    # 256 bytes + 256 word-final bytes + merges + 2 specials, CLIP order
    n_bytes = len(bytes_to_unicode())
    assert n_bytes == 256
    assert len(tok.encoder) == 512 + len(MERGES) + 2
    assert tok.sot_token == len(tok.encoder) - 2
    assert tok.eot_token == len(tok.encoder) - 1
    assert tok.encoder["lower</w>"] == 512 + 3


def test_bpe_merge_order(tok):
    # hand-derived: ranks favor l+o, then lo+w, then e+r</w>, then full word
    assert tok.bpe("lower") == "lower</w>"
    assert tok.bpe("low") == "lo w</w>"
    assert tok.bpe("lowest") == "low e s t</w>"


def test_encode_decode_roundtrip(tok):
    ids = tok.encode("lower low")
    assert ids == [tok.encoder["lower</w>"], tok.encoder["lo"],
                   tok.encoder["w</w>"]]
    assert tok.decode(ids) == "lower low"


def test_pattern_splits_contractions_and_punct(tok):
    # CLIP's pattern isolates 's and punctuation runs, lowercases first
    ids = tok.encode("Lower's low!!")
    text = tok.decode(ids)
    assert text == "lower 's low !!"


def test_unicode_prompt_survives(tok):
    # non-ASCII goes through the reversible byte mapping; with the regex
    # module installed the \p{L} pattern keeps accented words whole
    ids = tok.encode("café")
    assert tok.decode(ids) == "café"


def test_fixed_width_batch(tok):
    out = tok(["lower", "low lower low"])
    assert out.shape == (2, CONTEXT_LENGTH)
    assert out.dtype == np.int32
    assert out[0, 0] == tok.sot_token
    assert out[0, 2] == tok.eot_token
    assert out[0, 3:].max() == 0
    # truncation still terminates with eot
    long = tok("low " * 200)
    assert long[0, -1] == tok.eot_token or tok.eot_token in long[0]


def test_byte_fallback_without_merges():
    tok = SimpleTokenizer(None)
    ids = tok.encode("hi")
    # no merges: every char is its own byte token, last gets </w>
    assert ids == [tok.encoder["h"], tok.encoder["i</w>"]]
    assert tok.decode(ids) == "hi"
