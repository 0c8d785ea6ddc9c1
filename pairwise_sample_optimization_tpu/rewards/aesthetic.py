"""LAION aesthetic predictor: CLIP-L image embedding -> 5-layer MLP.

Rebuild of reference ``pso_pytorch/aesthetic_scorer.py`` (MLP
768 -> 1024 -> 128 -> 64 -> 16 -> 1 over the L2-normalized CLIP-L image
features; weights ``sac+logos+ava1-l14-linearMSE.pth``). Dropout layers
are inference no-ops and are omitted.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..models.clip import CLIPVisionConfig, CLIPVisionTower
from .preprocess import clip_preprocess


class AestheticMLP(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i, feat in enumerate((1024, 128, 64, 16, 1)):
            x = nn.Dense(feat, dtype=self.dtype, name=f"fc{i}")(x)
        return x[..., 0]


def packaged_mlp_path() -> str:
    """The released LAION aesthetic-MLP checkpoint, vendored exactly as
    the reference vendors it (``pso_pytorch/assets/sac+logos+ava1-l14-
    linearMSE.pth``, reference ``aesthetic_scorer.py:38``)."""
    import os

    return os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "assets",
        "sac+logos+ava1-l14-linearMSE.pth",
    )


class AestheticScorer:
    def __init__(
        self,
        vision_variables=None,
        mlp_variables=None,
        vision_config: Optional[CLIPVisionConfig] = None,
        key: Optional[jax.Array] = None,
        use_packaged_mlp: bool = False,
        fast_init: bool = False,
    ):
        """``use_packaged_mlp``: load the vendored released MLP weights
        (``packaged_mlp_path()``; the CLIP-L tower still needs a local
        checkpoint via ``checkpoints.load_clip_vision`` for real scores).
        ``fast_init``: zeros from eval_shape instead of a real random init
        of the ~300M-param CLIP-L tower — use when loaders replace every
        leaf anyway."""
        self.vision_config = vision_config or CLIPVisionConfig.vit_l14()
        self.vision = CLIPVisionTower(self.vision_config)
        self.mlp = AestheticMLP()
        key = key if key is not None else jax.random.key(0)
        size = self.vision_config.image_size
        if vision_variables is None:
            init = lambda: self.vision.init(key, jnp.zeros((1, size, size, 3)))
            if fast_init:
                from ..utils.init import zeros_from_shapes

                vision_variables = zeros_from_shapes(jax.eval_shape(init))
            else:
                vision_variables = init()
        if mlp_variables is not None and use_packaged_mlp:
            raise ValueError(
                "pass either mlp_variables or use_packaged_mlp, not both "
                "(silently preferring one would mis-weight the scorer)"
            )
        if mlp_variables is None:
            mlp_variables = self.mlp.init(
                key, jnp.zeros((1, self.vision_config.projection_dim))
            )
            if use_packaged_mlp:
                from ..checkpoints import load_aesthetic_mlp

                mlp_variables = load_aesthetic_mlp(
                    packaged_mlp_path(), mlp_variables
                )
        self.vision_variables = vision_variables
        self.mlp_variables = mlp_variables
        # variables are explicit jit ARGUMENTS (not closure captures): a
        # bound-method jit would bake the towers in as trace-time
        # constants, so weight loading after a warmup call would be
        # silently ignored (PickScoreScorer has the same contract)
        self._score = jax.jit(self._score_v)

    def _score_v(self, vision_variables, mlp_variables, images):
        pixels = clip_preprocess(images, self.vision_config.image_size)
        embed = self.vision.apply(vision_variables, pixels)
        embed = embed / jnp.linalg.norm(embed, axis=-1, keepdims=True)
        return self.mlp.apply(mlp_variables, embed)

    def _score_impl(self, images):
        """Inlineable (non-jit) version for callers composing programs."""
        return self._score_v(self.vision_variables, self.mlp_variables, images)

    def score(self, images):
        """images (B, H, W, 3) in [-1, 1] -> aesthetic score (B,)."""
        return self._score(self.vision_variables, self.mlp_variables, images)
