"""BERT WordPiece tokenizer (for the ImageReward/BLIP text path).

Greedy longest-match-first subword tokenization over a BERT vocab file
(one token per line; ``##`` marks continuations). Lowercases (uncased
convention) and wraps with [CLS]/[SEP], padding with [PAD]. The vocab
file is data — pass ``vocab_path`` (e.g. bert-base-uncased's vocab.txt).
"""

from __future__ import annotations

import os
import re
from typing import List, Sequence

import numpy as np

_PUNCT = re.compile(r"([\.,!?;:()\[\]{}\"'`~@#$%^&*+=|\\/<>-])")


class WordPieceTokenizer:
    def __init__(
        self,
        vocab_path: str = "",
        vocab: Sequence[str] | None = None,
        context_length: int = 35,  # ImageReward truncates prompts to 35
        lowercase: bool = True,
    ):
        if vocab is None:
            if not vocab_path or not os.path.exists(vocab_path):
                raise FileNotFoundError(
                    f"WordPiece vocab not found: {vocab_path!r}"
                )
            with open(vocab_path, encoding="utf-8") as f:
                vocab = [line.rstrip("\n") for line in f]
        self.vocab = {tok: i for i, tok in enumerate(vocab)}
        self.inv_vocab = {i: t for t, i in self.vocab.items()}
        self.context_length = context_length
        self.lowercase = lowercase
        for special in ("[PAD]", "[UNK]", "[CLS]", "[SEP]"):
            if special not in self.vocab:
                raise ValueError(f"vocab missing {special}")
        self.pad = self.vocab["[PAD]"]
        self.unk = self.vocab["[UNK]"]
        self.cls = self.vocab["[CLS]"]
        self.sep = self.vocab["[SEP]"]
        self.vocab_size = len(self.vocab)

    def _split(self, text: str) -> List[str]:
        if self.lowercase:
            text = text.lower()
        text = _PUNCT.sub(r" \1 ", text)
        return text.split()

    def _wordpiece(self, word: str) -> List[int]:
        ids: List[int] = []
        start = 0
        while start < len(word):
            end = len(word)
            cur = None
            while start < end:
                piece = word[start:end]
                if start > 0:
                    piece = "##" + piece
                if piece in self.vocab:
                    cur = self.vocab[piece]
                    break
                end -= 1
            if cur is None:
                return [self.unk]
            ids.append(cur)
            start = end
        return ids

    def encode(self, text: str) -> List[int]:
        ids: List[int] = []
        for word in self._split(text):
            ids.extend(self._wordpiece(word))
        return ids

    def __call__(self, texts: str | Sequence[str]):
        """-> (input_ids, attention_mask) both (B, context_length) int32."""
        if isinstance(texts, str):
            texts = [texts]
        n = self.context_length
        ids = np.full((len(texts), n), self.pad, np.int32)
        mask = np.zeros((len(texts), n), np.int32)
        for i, text in enumerate(texts):
            row = [self.cls] + self.encode(text)[: n - 2] + [self.sep]
            ids[i, : len(row)] = row
            mask[i, : len(row)] = 1
        return ids, mask
