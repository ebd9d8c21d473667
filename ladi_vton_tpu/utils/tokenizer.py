"""Self-contained CLIP BPE tokenizer.

The reference tokenizes with transformers' CLIPTokenizer pulled from the
SD-2 repo (reference: src/inference.py:129,289-291).  This environment
has no network access, so this is a dependency-free implementation of
the CLIP BPE scheme that loads the standard ``vocab.json`` +
``merges.txt`` files from a local directory (any HF tokenizer dump
works).  Falls back to transformers' implementation when its files are
importable and cached.

Key facts relied on elsewhere: '$' encodes to token id 259
(``diffusion.text.VSTAR_TOKEN_ID``), bos=49406, eos=49407, pad=eos for
SD's CLIP, max length 77.
"""

from __future__ import annotations

import html
import json
from functools import lru_cache
from pathlib import Path

import numpy as np
import regex as re


@lru_cache()
def _bytes_to_unicode():
    bs = (list(range(ord("!"), ord("~") + 1))
          + list(range(ord("\xa1"), ord("\xac") + 1))
          + list(range(ord("\xae"), ord("\xff") + 1)))
    cs = bs[:]
    n = 0
    for b in range(2**8):
        if b not in bs:
            bs.append(b)
            cs.append(2**8 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def _get_pairs(word):
    pairs = set()
    prev = word[0]
    for ch in word[1:]:
        pairs.add((prev, ch))
        prev = ch
    return pairs


def _basic_clean(text: str) -> str:
    text = html.unescape(html.unescape(text))
    return text.strip()


def _whitespace_clean(text: str) -> str:
    return re.sub(r"\s+", " ", text).strip()


class CLIPTokenizer:
    """BPE tokenizer compatible with openai/clip + HF CLIPTokenizer."""

    model_max_length = 77
    bos_token_id = 49406
    eos_token_id = 49407

    def __init__(self, vocab: dict[str, int], merges: list[tuple[str, str]]):
        self.encoder = vocab
        self.decoder = {v: k for k, v in vocab.items()}
        self.bpe_ranks = dict(zip(merges, range(len(merges))))
        self.byte_encoder = _bytes_to_unicode()
        self.byte_decoder = {v: k for k, v in self.byte_encoder.items()}
        self.cache = {"<|startoftext|>": "<|startoftext|>",
                      "<|endoftext|>": "<|endoftext|>"}
        # the exact openai/CLIP token pattern (needs the `regex` module
        # for \p classes)
        self.pat = re.compile(
            r"<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|"
            r"[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+",
            re.IGNORECASE,
        )

    @classmethod
    def from_dir(cls, path: str | Path) -> "CLIPTokenizer":
        """Load from a directory holding vocab.json + merges.txt."""
        path = Path(path)
        with open(path / "vocab.json", encoding="utf-8") as f:
            vocab = json.load(f)
        merges_file = path / "merges.txt"
        with open(merges_file, encoding="utf-8") as f:
            lines = f.read().split("\n")
        # first line is the version header
        merges = [tuple(line.split()) for line in lines[1:]
                  if len(line.split()) == 2]
        return cls(vocab, merges)

    def _bpe(self, token: str) -> str:
        if token in self.cache:
            return self.cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        pairs = _get_pairs(word)
        if not pairs:
            return token + "</w>"
        while True:
            bigram = min(
                pairs, key=lambda p: self.bpe_ranks.get(p, float("inf")))
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
            pairs = _get_pairs(word)
        out = " ".join(word)
        self.cache[token] = out
        return out

    def encode(self, text: str) -> list[int]:
        ids = []
        text = _whitespace_clean(_basic_clean(text)).lower()
        for token in re.findall(self.pat, text):
            token_bytes = "".join(
                self.byte_encoder[b] for b in token.encode("utf-8"))
            ids.extend(self.encoder[t] for t in self._bpe(token_bytes).split(" "))
        return ids

    def __call__(self, texts, *, max_length: int | None = None,
                 padding: str = "max_length",
                 truncation: bool = True) -> np.ndarray:
        """Batch-encode to (B, max_length) int32 ids, bos/eos/pad like
        SD's CLIPTokenizer (pad with eos id)."""
        if isinstance(texts, str):
            texts = [texts]
        max_length = max_length or self.model_max_length
        out = np.full((len(texts), max_length), self.eos_token_id, np.int32)
        for i, text in enumerate(texts):
            ids = self.encode(text)
            if truncation:
                ids = ids[: max_length - 2]
            row = [self.bos_token_id] + ids + [self.eos_token_id]
            out[i, : len(row)] = np.asarray(row, np.int32)
        return out
