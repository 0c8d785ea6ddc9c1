"""CLIP byte-level BPE tokenizer (from-scratch implementation).

Replaces the HF ``AutoTokenizer``s of the reference trainers and the
vendored open_clip ``SimpleTokenizer`` with one implementation serving
every CLIP in the system (SDXL TE1/TE2, PickScore, CLIP score, HPSv2 —
they all share the 49152-merge CLIP vocabulary).

The merge table is *data*, not code: pass ``bpe_path`` to any gzip'd
merge list in the standard CLIP format (first line is a version header;
merges 1..49152 used). Padding differs per consumer and is an argument:
SDXL tokenizer_1 / HF CLIP pad with <|endoftext|> (49407), SDXL
tokenizer_2 and open_clip pad with 0. Under causal masking and
argmax-EOS pooling both conventions give identical pooled features; pad
choice only affects hidden states at pad positions (which SDXL feeds to
cross-attention, hence the per-encoder defaults).

No ftfy dependency: text cleaning is html-unescape + whitespace collapse,
sufficient for the ascii-clean prompt sets this framework ships with.
"""

from __future__ import annotations

import functools
import gzip
import html
import os
from typing import Iterable, List, Sequence

import numpy as np
import regex as re

def _packaged_bpe_path() -> str:
    """The standard CLIP ``bpe_simple_vocab_16e6.txt.gz`` ships with the
    package (the reference vendors the identical file twice:
    ``open_clip/bpe_simple_vocab_16e6.txt.gz`` and ``hps_bpe.txt.gz``) —
    real tokenization works out of the box; ``PSO_BPE_PATH`` overrides."""
    return os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "assets",
        "bpe_simple_vocab_16e6.txt.gz",
    )


DEFAULT_BPE_PATH = os.environ.get("PSO_BPE_PATH", "") or (
    _packaged_bpe_path() if os.path.exists(_packaged_bpe_path()) else ""
)

_TOKEN_PATTERN = re.compile(
    r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+""",
    re.IGNORECASE,
)


@functools.lru_cache()
def bytes_to_unicode():
    """Reversible byte -> printable-unicode map (standard GPT-2/CLIP table)."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("\xa1"), ord("\xac") + 1))
        + list(range(ord("\xae"), ord("\xff") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, (chr(c) for c in cs)))


def _get_pairs(word: tuple) -> set:
    return set(zip(word[:-1], word[1:]))


def _clean(text: str) -> str:
    text = html.unescape(html.unescape(text))
    return " ".join(text.split()).strip().lower()


class HashTokenizer:
    """Vocab-free fallback: deterministic pseudo-ids from token hashes.

    Lets random-weight smoke runs and throughput benches exercise the full
    tokenize->encode->sample->score pipeline without a BPE merge file.
    NOT a real tokenizer — never use with ported text-encoder weights.
    """

    def __init__(self, context_length: int = 77, vocab_size: int = 49408,
                 pad_token_id: int | None = None):
        self.context_length = context_length
        self.vocab_size = vocab_size
        self.sot = vocab_size - 2
        self.eot = vocab_size - 1
        self.pad_token_id = self.eot if pad_token_id is None else pad_token_id

    def __call__(self, texts: str | Sequence[str]) -> np.ndarray:
        import zlib

        if isinstance(texts, str):
            texts = [texts]
        out = np.full((len(texts), self.context_length), self.pad_token_id, np.int32)
        for i, text in enumerate(texts):
            words = _clean(text).split()[: self.context_length - 2]
            # stable across processes (python's hash() is seed-randomized)
            ids = [
                zlib.crc32(w.encode("utf-8")) % (self.vocab_size - 2) for w in words
            ]
            row = [self.sot] + ids + [self.eot]
            out[i, : len(row)] = row
        return out


class CLIPTokenizer:
    def __init__(
        self,
        bpe_path: str = DEFAULT_BPE_PATH,
        context_length: int = 77,
        pad_token_id: int | None = None,  # None -> eot (HF convention)
        merges: Sequence[str] | None = None,
        use_native: bool = True,
    ):
        if merges is None:
            if not bpe_path or not os.path.exists(bpe_path):
                raise FileNotFoundError(
                    "CLIP BPE merge file not found; pass bpe_path= or set "
                    f"PSO_BPE_PATH (got {bpe_path!r})"
                )
            opener = gzip.open if bpe_path.endswith(".gz") else open
            with opener(bpe_path, "rb") as f:
                lines = f.read().decode("utf-8").split("\n")
            merges = lines[1 : 49152 - 256 - 2 + 1]
        merges = [tuple(m.split()) for m in merges if m]

        self.byte_encoder = bytes_to_unicode()
        vocab = list(self.byte_encoder.values())
        vocab = vocab + [v + "</w>" for v in vocab]
        for m in merges:
            vocab.append("".join(m))
        self.sot_text = "<|startoftext|>"
        self.eot_text = "<|endoftext|>"
        vocab.extend([self.sot_text, self.eot_text])
        self.encoder = {tok: i for i, tok in enumerate(vocab)}
        self.decoder = {i: tok for tok, i in self.encoder.items()}
        self.bpe_ranks = {m: i for i, m in enumerate(merges)}
        self.cache = {
            self.sot_text: self.sot_text,
            self.eot_text: self.eot_text,
        }
        self.context_length = context_length
        self.sot = self.encoder[self.sot_text]
        self.eot = self.encoder[self.eot_text]
        self.pad_token_id = self.eot if pad_token_id is None else pad_token_id
        self.vocab_size = len(self.encoder)

        # native C++ merge engine (exact-parity ids); python fallback
        self._native = None
        if use_native:
            try:
                from ..native.build import load_bpe_library

                lib = load_bpe_library()
                if lib is not None:
                    import ctypes

                    blob = "\n".join(" ".join(m) for m in merges).encode("utf-8")
                    handle = lib.pso_tok_create(blob, len(blob))
                    if lib.pso_tok_vocab_size(handle) == self.vocab_size:
                        self._native = (lib, handle)
                    else:  # defensive: never serve mismatched ids
                        lib.pso_tok_destroy(handle)
            except Exception:
                self._native = None

    # ------------------------------------------------------------------ #

    def _bpe(self, token: str) -> str:
        if token in self.cache:
            return self.cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        pairs = _get_pairs(word)
        if not pairs:
            return token + "</w>"
        while True:
            bigram = min(pairs, key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            new_word: List[str] = []
            i = 0
            while i < len(word):
                try:
                    j = word.index(first, i)
                except ValueError:
                    new_word.extend(word[i:])
                    break
                new_word.extend(word[i:j])
                i = j
                if i < len(word) - 1 and word[i] == first and word[i + 1] == second:
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

    def encode(self, text: str) -> List[int]:
        """Raw BPE ids without special tokens or padding."""
        if self._native is not None:
            import ctypes

            lib, handle = self._native
            # per-CALL output buffer: a shared per-tokenizer buffer would
            # be racy across threads (ctypes releases the GIL; the C++
            # cache itself is mutex-guarded)
            buf = (ctypes.c_int32 * 512)()
            ids: List[int] = []
            for token in _TOKEN_PATTERN.findall(_clean(text)):
                if token in (self.sot_text, self.eot_text):
                    # literal special tokens: the python path resolves
                    # them via the cache; the native merge engine would
                    # byte-map them into ordinary subwords
                    ids.append(self.encoder[token])
                    continue
                raw = token.encode("utf-8")
                n = lib.pso_tok_encode_word(handle, raw, len(raw), buf, 512)
                if n < 0:  # oversized/unexpected word: python fallback
                    mapped = "".join(self.byte_encoder[b] for b in raw)
                    ids.extend(self.encoder[t] for t in self._bpe(mapped).split(" "))
                else:
                    ids.extend(buf[:n])
            return ids
        ids = []
        for token in _TOKEN_PATTERN.findall(_clean(text)):
            token_bytes = "".join(self.byte_encoder[b] for b in token.encode("utf-8"))
            ids.extend(self.encoder[t] for t in self._bpe(token_bytes).split(" "))
        return ids

    def decode(self, ids: Iterable[int]) -> str:
        toks = [self.decoder.get(int(i), "") for i in ids]
        text = "".join(t for t in toks if t not in (self.sot_text, self.eot_text))
        byte_decoder = {v: k for k, v in self.byte_encoder.items()}
        raw = bytearray(byte_decoder[c] for c in text if c in byte_decoder)
        return raw.decode("utf-8", errors="replace").replace("</w>", " ").strip()

    def __call__(self, texts: str | Sequence[str]) -> np.ndarray:
        """Tokenize to (B, context_length) int32 with SOT/EOT + padding,
        truncating long prompts so EOT is always present (HF/open_clip
        behavior)."""
        if isinstance(texts, str):
            texts = [texts]
        out = np.full((len(texts), self.context_length), self.pad_token_id, np.int32)
        for i, text in enumerate(texts):
            ids = [self.sot] + self.encode(text)[: self.context_length - 2] + [self.eot]
            out[i, : len(ids)] = ids
        return out


def make_clip_tokenizers(
    bpe_path: str = "",
    vocab_size: int = 49408,
    with_reward: bool = False,
):
    """The CLIs' shared tokenizer recipe: dual CLIP tokenizers (TE2 pads
    with 0) from ``bpe_path``, falling back to the packaged standard
    vocab for full-size towers, else HashTokenizers (random-weight smoke
    mode — tiny models' embedding tables are smaller than the real
    49408-id space). Returns (tok1, tok2[, reward_tok])."""
    bpe = bpe_path
    if not bpe and vocab_size == 49408:
        bpe = DEFAULT_BPE_PATH
    if bpe and os.path.exists(bpe):
        toks = (CLIPTokenizer(bpe), CLIPTokenizer(bpe, pad_token_id=0))
        if with_reward:
            toks = toks + (CLIPTokenizer(bpe),)
        return toks
    import logging

    logging.getLogger("pso.data").warning(
        "no BPE vocab at %r -- using HashTokenizer (random-weight smoke mode)",
        bpe,
    )
    toks = (
        HashTokenizer(vocab_size=vocab_size),
        HashTokenizer(vocab_size=vocab_size, pad_token_id=0),
    )
    if with_reward:
        toks = toks + (HashTokenizer(vocab_size=vocab_size),)
    return toks
