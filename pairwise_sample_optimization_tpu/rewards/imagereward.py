"""ImageReward-v1.0 scorer (BLIP backbone + MLP head), TPU-native.

The reference consumes ImageReward via the external ``image-reward`` pip
package at eval time only (``evaluate_sdxl_dmd2.py:43,234``). Rebuilt
here: BLIP ViT-L/16 image tokens cross-attended by a BERT text encoder;
the [CLS] output feeds a 768->1024->128->64->16->1 MLP; scores are
standardized by the released mean/std. Weights port from the released
checkpoint via ``checkpoints.convert``-style state dicts; random init
serves protocol smoke runs.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..models.bert import BertConfig, BertEncoder
from ..models.vit import ViT, ViTConfig
from .preprocess import clip_preprocess

# released normalization of raw MLP outputs (ImageReward-v1.0)
IMAGEREWARD_MEAN = 0.16717362830052426
IMAGEREWARD_STD = 1.0333394966054072


class ImageRewardMLP(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i, feat in enumerate((1024, 128, 64, 16, 1)):
            x = nn.Dense(feat, dtype=self.dtype, name=f"fc{i}")(x)
        return x[..., 0]


class ImageRewardScorer:
    def __init__(
        self,
        vit_variables=None,
        bert_variables=None,
        mlp_variables=None,
        vit_config: Optional[ViTConfig] = None,
        bert_config: Optional[BertConfig] = None,
        mean: float = IMAGEREWARD_MEAN,
        std: float = IMAGEREWARD_STD,
        key: Optional[jax.Array] = None,
        fast_init: bool = False,
    ):
        self.vit_config = vit_config or ViTConfig.blip_large()
        self.bert_config = bert_config or BertConfig.blip_base()
        self.vit = ViT(self.vit_config)
        self.bert = BertEncoder(self.bert_config)
        self.mlp = ImageRewardMLP()
        self.mean = mean
        self.std = std
        key = key if key is not None else jax.random.key(0)
        size = self.vit_config.image_size

        def init(module, *args):
            if fast_init:
                from ..utils.init import zeros_from_shapes

                shapes = jax.eval_shape(lambda: module.init(key, *args))
                return zeros_from_shapes(shapes)
            return module.init(key, *args)

        if vit_variables is None:
            vit_variables = init(self.vit, jnp.zeros((1, size, size, 3)))
        if bert_variables is None:
            n_img = (size // self.vit_config.patch_size) ** 2 + 1
            bert_variables = init(
                self.bert,
                jnp.zeros((1, 4), jnp.int32),
                jnp.ones((1, 4), jnp.int32),
                jnp.zeros((1, n_img, self.vit_config.width)),
            )
        if mlp_variables is None:
            mlp_variables = init(self.mlp, jnp.zeros((1, self.bert_config.hidden)))
        self.vit_variables = vit_variables
        self.bert_variables = bert_variables
        self.mlp_variables = mlp_variables
        # variables as explicit jit ARGUMENTS (not closure constants) so
        # weight loading after a warmup call takes effect — the
        # PickScoreScorer contract
        self._score = jax.jit(self._score_v)

    def _score_v(self, vit_variables, bert_variables, mlp_variables,
                 images, input_ids, attention_mask):
        pixels = clip_preprocess(images, self.vit_config.image_size)
        img_tokens = self.vit.apply(vit_variables, pixels)
        txt = self.bert.apply(
            bert_variables,
            input_ids,
            attention_mask,
            img_tokens,
        )
        raw = self.mlp.apply(mlp_variables, txt[:, 0].astype(jnp.float32))
        return (raw - self.mean) / self.std

    def _score_impl(self, images, input_ids, attention_mask):
        """Inlineable (non-jit) version for callers composing programs."""
        return self._score_v(
            self.vit_variables, self.bert_variables, self.mlp_variables,
            images, input_ids, attention_mask,
        )

    def score(self, images, input_ids, attention_mask):
        """images (B,H,W,3) in [-1,1]; ids/mask from WordPieceTokenizer."""
        return self._score(
            self.vit_variables, self.bert_variables, self.mlp_variables,
            images, input_ids, attention_mask,
        )
