"""CLIP byte-pair-encoding tokenizer.

Self-contained implementation of the tokenizer the SAM3 text path needs
(the reference fetches the CLIP BPE vocab in
saber/pretrained_weights.py:104-148 and feeds prompts through the sam3
package's Sam3Processor). Loads the standard
``bpe_simple_vocab_16e6.txt.gz`` merges file; without it, falls back to a
byte-level vocabulary so the API stays usable for smoke tests.
"""

import gzip
import html
import os
import re
from functools import lru_cache
from typing import Dict, List, Optional

CONTEXT_LENGTH = 77
VOCAB_URL = ("https://github.com/openai/CLIP/raw/main/clip/"
             "bpe_simple_vocab_16e6.txt.gz")


@lru_cache()
def bytes_to_unicode() -> Dict[int, str]:
    """GPT-2/CLIP reversible byte→unicode mapping."""
    bs = (list(range(ord("!"), ord("~") + 1))
          + list(range(ord("¡"), ord("¬") + 1))
          + list(range(ord("®"), ord("ÿ") + 1)))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def get_pairs(word):
    pairs = set()
    prev = word[0]
    for ch in word[1:]:
        pairs.add((prev, ch))
        prev = ch
    return pairs


def _basic_clean(text: str) -> str:
    return html.unescape(html.unescape(text)).strip()


def _whitespace_clean(text: str) -> str:
    return re.sub(r"\s+", " ", text).strip()


class SimpleTokenizer:
    """CLIP BPE tokenizer (API-compatible with openai/CLIP's)."""

    def __init__(self, bpe_path: Optional[str] = None):
        self.byte_encoder = bytes_to_unicode()
        self.byte_decoder = {v: k for k, v in self.byte_encoder.items()}
        merges: List[tuple] = []
        if bpe_path and os.path.exists(bpe_path):
            with gzip.open(bpe_path, "rt", encoding="utf8") as f:
                lines = f.read().split("\n")[1: 49152 - 256 - 2 + 1]
            merges = [tuple(p) for p in (m.split() for m in lines)
                      if len(p) == 2]
        self._has_merges = bool(merges)

        vocab = list(bytes_to_unicode().values())
        vocab = vocab + [v + "</w>" for v in vocab]
        for m in merges:
            vocab.append("".join(m))
        vocab.extend(["<|startoftext|>", "<|endoftext|>"])
        self.encoder = {v: i for i, v in enumerate(vocab)}
        self.decoder = {i: v for v, i in self.encoder.items()}
        self.bpe_ranks = dict(zip(merges, range(len(merges))))
        self.cache = {"<|startoftext|>": "<|startoftext|>",
                      "<|endoftext|>": "<|endoftext|>"}
        # CLIP's exact pattern needs \p{L}/\p{N} from the third-party
        # ``regex`` module; fall back to a stdlib ASCII form (equivalent
        # for English prompts) when it's absent.
        try:
            import regex
            self.pat = regex.compile(
                r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|"""
                r"""[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+""", regex.IGNORECASE)
        except ImportError:
            self.pat = re.compile(
                r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|"""
                r"""[a-zA-Z]+|[0-9]|[^\sa-zA-Z0-9]+""", re.IGNORECASE)

    @property
    def sot_token(self):
        return self.encoder["<|startoftext|>"]

    @property
    def eot_token(self):
        return self.encoder["<|endoftext|>"]

    def bpe(self, token: str) -> str:
        if token in self.cache:
            return self.cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        if not self._has_merges:
            out = " ".join(word)
            self.cache[token] = out
            return out
        pairs = get_pairs(word)
        if not pairs:
            return token + "</w>"
        while True:
            bigram = min(pairs, key=lambda p: self.bpe_ranks.get(p, 10**10))
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            new_word = []
            i = 0
            while i < len(word):
                try:
                    j = word.index(first, i)
                except ValueError:
                    new_word.extend(word[i:])
                    break
                new_word.extend(word[i:j])
                i = j
                if (word[i] == first and i < len(word) - 1
                        and word[i + 1] == second):
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
            if len(word) == 1:
                break
            pairs = get_pairs(word)
        out = " ".join(word)
        self.cache[token] = out
        return out

    def encode(self, text: str) -> List[int]:
        tokens: List[int] = []
        text = _whitespace_clean(_basic_clean(text)).lower()
        for token in self.pat.findall(text):
            token_b = "".join(self.byte_encoder[b]
                              for b in token.encode("utf-8"))
            tokens.extend(self.encoder[t] for t in self.bpe(token_b).split(" "))
        return tokens

    def decode(self, tokens: List[int]) -> str:
        text = "".join(self.decoder[t] for t in tokens)
        raw = bytearray(self.byte_decoder[c] for c in text
                        if c in self.byte_decoder)
        return raw.decode("utf-8", errors="replace").replace("</w>", " ").strip()

    def __call__(self, texts, context_length: int = CONTEXT_LENGTH):
        """Tokenize to fixed-width (N, context_length) int arrays."""
        import numpy as np
        if isinstance(texts, str):
            texts = [texts]
        out = np.zeros((len(texts), context_length), np.int32)
        for i, t in enumerate(texts):
            ids = [self.sot_token] + self.encode(t)[: context_length - 2] \
                + [self.eot_token]
            out[i, : len(ids)] = ids
        return out


def get_tokenizer() -> SimpleTokenizer:
    """Load the tokenizer, fetching the vocab when the network allows
    (reference pretrained_weights.py:104-148). Resolution — env override,
    cache, download — lives in pretrained_weights.get_clip_bpe_path."""
    from saber_tpu.pretrained_weights import get_clip_bpe_path

    return SimpleTokenizer(get_clip_bpe_path())
