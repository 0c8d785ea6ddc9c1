"""Native C++ BPE engine: build, exact parity with Python, throughput."""

import os
import time

import numpy as np
import pytest

from pairwise_sample_optimization_tpu.data.tokenizer import CLIPTokenizer
from pairwise_sample_optimization_tpu.native.build import (
    build_bpe_library,
    load_bpe_library,
)

TINY_MERGES = ["c a", "ca t</w>", "d o", "do g</w>", "t h", "th e</w>"]

from pairwise_sample_optimization_tpu.data.tokenizer import DEFAULT_BPE_PATH

# packaged vocab (data/assets) unless PSO_BPE_PATH overrides
REAL_VOCAB = DEFAULT_BPE_PATH if os.path.exists(DEFAULT_BPE_PATH or "") else None


def _toolchain():
    if load_bpe_library() is None:
        pytest.skip("no C++ toolchain / build failed")


def test_builds():
    _toolchain()
    path = build_bpe_library()
    assert path and os.path.exists(path)


def test_tiny_parity():
    _toolchain()
    py = CLIPTokenizer(merges=TINY_MERGES, use_native=False)
    nat = CLIPTokenizer(merges=TINY_MERGES, use_native=True)
    assert nat._native is not None
    for text in ["cat", "dog", "the cat", "catdog the", "zzz"]:
        assert py.encode(text) == nat.encode(text), text


@pytest.mark.skipif(REAL_VOCAB is None, reason="no standard CLIP vocab on disk")
def test_real_vocab_parity_and_golden():
    _toolchain()
    nat = CLIPTokenizer(bpe_path=REAL_VOCAB, use_native=True)
    assert nat._native is not None
    py = CLIPTokenizer(bpe_path=REAL_VOCAB, use_native=False)
    texts = [
        "a photo of a cat",
        "an astronaut riding a horse in photorealistic style",
        "the quick brown fox jumps over the lazy dog!",
        "café über straße 123",
        "supercalifragilisticexpialidocious antidisestablishmentarianism",
        # literal special tokens must resolve to their single ids on
        # BOTH paths (the native engine would otherwise byte-map them)
        "a cat <|endoftext|> dog",
        "<|startoftext|> hello",
    ]
    for t in texts:
        assert py.encode(t) == nat.encode(t), t
    # canonical golden ids survive the native path
    assert nat("a photo of a cat")[0][:7].tolist() == [
        49406, 320, 1125, 539, 320, 2368, 49407,
    ]


@pytest.mark.skipif(REAL_VOCAB is None, reason="no standard CLIP vocab on disk")
def test_native_is_not_slower_uncached():
    _toolchain()
    py = CLIPTokenizer(bpe_path=REAL_VOCAB, use_native=False)
    nat = CLIPTokenizer(bpe_path=REAL_VOCAB, use_native=True)

    def run(tok, salt):
        # fresh cache-busting words every round
        text = " ".join(f"zq{salt}x{i}v{i * 7}" for i in range(300))
        t0 = time.perf_counter()
        tok.encode(text)
        return time.perf_counter() - t0

    if os.getloadavg()[0] > 1.5:
        pytest.skip("host under load — timing comparison meaningless")
    # min over rounds: single-core CI boxes are noisy under load; rounds
    # interleaved so a background load spike hits both tokenizers alike.
    # The bound is deliberately loose (1.5x): this guards against
    # pathological ctypes-boundary overhead, not a perf race — measured
    # idle-host numbers have native ahead, but inside the full suite the
    # 1-core host is never idle and loadavg lags the spike.
    t_py, t_nat = [], []
    for s in range(7):
        t_py.append(run(py, s))
        t_nat.append(run(nat, s + 100))
        if min(t_nat) < min(t_py) * 1.2:
            return
    assert min(t_nat) < min(t_py) * 1.5, (t_nat, t_py)
