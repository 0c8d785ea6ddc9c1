"""ImageReward stack tests: WordPiece, BERT-with-cross-attn, ViT, scorer."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pairwise_sample_optimization_tpu.data.wordpiece import WordPieceTokenizer
from pairwise_sample_optimization_tpu.models.bert import BertConfig, BertEncoder
from pairwise_sample_optimization_tpu.models.vit import ViT, ViTConfig
from pairwise_sample_optimization_tpu.rewards.imagereward import ImageRewardScorer

TINY_VOCAB = [
    "[PAD]", "[UNK]", "[CLS]", "[SEP]",
    "a", "photo", "of", "cat", "dog", "un", "##believ", "##able", ".",
]


class TestWordPiece:
    def _tok(self, **kw):
        return WordPieceTokenizer(vocab=TINY_VOCAB, context_length=10, **kw)

    def test_basic(self):
        tok = self._tok()
        ids = tok.encode("a photo of cat")
        assert ids == [4, 5, 6, 7]

    def test_subword_split(self):
        tok = self._tok()
        assert tok.encode("unbelievable") == [9, 10, 11]

    def test_unknown(self):
        tok = self._tok()
        assert tok.encode("zebra") == [tok.unk]

    def test_call_wraps_and_masks(self):
        tok = self._tok()
        ids, mask = tok(["a cat."])
        assert ids.shape == (1, 10)
        assert ids[0, 0] == tok.cls
        # a, cat, '.' -> 3 tokens + cls + sep = 5
        assert ids[0, 4] == tok.sep
        np.testing.assert_array_equal(mask[0, :5], 1)
        np.testing.assert_array_equal(mask[0, 5:], 0)

    def test_truncation(self):
        tok = WordPieceTokenizer(vocab=TINY_VOCAB, context_length=4)
        ids, mask = tok(["a photo of cat dog"])
        assert ids[0, -1] == tok.sep
        assert mask.sum() == 4


class TestBert:
    def test_forward_with_cross(self):
        cfg = BertConfig.tiny()
        model = BertEncoder(cfg)
        ids = jnp.array([[2, 5, 7, 3, 0]])
        mask = jnp.array([[1, 1, 1, 1, 0]])
        ctx = jax.random.normal(jax.random.key(0), (1, 6, cfg.encoder_width))
        variables = model.init(jax.random.key(1), ids, mask, ctx)
        out = model.apply(variables, ids, mask, ctx)
        assert out.shape == (1, 5, cfg.hidden)
        assert np.isfinite(np.asarray(out)).all()

    def test_mask_blocks_pad_positions(self):
        cfg = BertConfig.tiny()
        model = BertEncoder(cfg)
        ids = jnp.array([[2, 5, 3, 0, 0]])
        mask = jnp.array([[1, 1, 1, 0, 0]])
        ctx = jnp.zeros((1, 6, cfg.encoder_width))
        variables = model.init(jax.random.key(1), ids, mask, ctx)
        out1 = model.apply(variables, ids, mask, ctx)
        ids2 = ids.at[0, 4].set(7)  # change a masked pad position
        out2 = model.apply(variables, ids2, mask, ctx)
        np.testing.assert_allclose(
            np.asarray(out1[0, :3]), np.asarray(out2[0, :3]), atol=1e-5
        )

    def test_cross_attention_uses_context(self):
        cfg = BertConfig.tiny()
        model = BertEncoder(cfg)
        ids = jnp.array([[2, 5, 3]])
        mask = jnp.ones((1, 3), jnp.int32)
        ctx = jax.random.normal(jax.random.key(2), (1, 6, cfg.encoder_width))
        variables = model.init(jax.random.key(1), ids, mask, ctx)
        out1 = model.apply(variables, ids, mask, ctx)
        out2 = model.apply(variables, ids, mask, ctx * 2.0)
        assert np.abs(np.asarray(out1) - np.asarray(out2)).max() > 1e-4


class TestViT:
    def test_all_tokens_returned(self):
        cfg = ViTConfig.tiny()
        model = ViT(cfg)
        px = jax.random.normal(jax.random.key(0), (2, 32, 32, 3))
        variables = model.init(jax.random.key(1), px)
        out = model.apply(variables, px)
        assert out.shape == (2, (32 // 8) ** 2 + 1, cfg.width)


class TestImageRewardScorer:
    def test_score_tiny(self):
        scorer = ImageRewardScorer(
            vit_config=ViTConfig.tiny(), bert_config=BertConfig.tiny()
        )
        tok = WordPieceTokenizer(vocab=TINY_VOCAB, context_length=8)
        ids, mask = tok(["a photo of cat", "a photo of dog"])
        images = jax.random.uniform(
            jax.random.key(3), (2, 32, 32, 3), minval=-1, maxval=1
        )
        s = scorer.score(images, jnp.asarray(ids), jnp.asarray(mask))
        assert s.shape == (2,)
        assert np.isfinite(np.asarray(s)).all()

    def test_standardization(self):
        s0 = ImageRewardScorer(
            vit_config=ViTConfig.tiny(), bert_config=BertConfig.tiny(),
            mean=0.0, std=1.0,
        )
        s1 = ImageRewardScorer(
            vit_config=ViTConfig.tiny(), bert_config=BertConfig.tiny(),
            mean=1.0, std=2.0,
        )
        tok = WordPieceTokenizer(vocab=TINY_VOCAB, context_length=8)
        ids, mask = tok(["a cat"])
        img = jnp.zeros((1, 32, 32, 3))
        a = float(s0.score(img, jnp.asarray(ids), jnp.asarray(mask))[0])
        b = float(s1.score(img, jnp.asarray(ids), jnp.asarray(mask))[0])
        np.testing.assert_allclose((a - 1.0) / 2.0, b, rtol=1e-5)
