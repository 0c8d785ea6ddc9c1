"""PickScore reward: CLIP-H dual encoder, cosine score (primary training reward).

Rebuild of the reference ``pso_pytorch/pickscore_utils.py`` Selector
(HF ``yuvalkirstain/PickScore_v1`` on a ``laion/CLIP-ViT-H-14`` backbone):
score = diag(norm(text) @ norm(image)^T), optional softmax path. The
whole scorer is one jitted program over on-device images — the reference's
uint8/PIL/processor host round-trip is gone.

Weights: port the torch checkpoint with ``checkpoints.convert`` when
available; random init otherwise (throughput benches, tests).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..models.clip import CLIPDualEncoder, CLIPTextConfig, CLIPVisionConfig
from .preprocess import clip_preprocess


class PickScoreScorer:
    def __init__(
        self,
        variables=None,
        text_config: Optional[CLIPTextConfig] = None,
        vision_config: Optional[CLIPVisionConfig] = None,
        key: Optional[jax.Array] = None,
        fast_init: bool = False,
        param_dtype=None,
        preprocess: str = "resize",
    ):
        """``preprocess``: "resize" (square resize, the protocol's square
        images make it identical) or "max_size" (open_clip ResizeMaxSize
        longest-side+pad — exact transform parity for non-square inputs,
        reference ``clip_utils.py:18-37``)."""
        import dataclasses as _dc

        if preprocess not in ("resize", "max_size"):
            raise ValueError(preprocess)
        self.preprocess = preprocess
        self.text_config = text_config or CLIPTextConfig.vit_h14()
        self.vision_config = vision_config or CLIPVisionConfig.vit_h14()
        if param_dtype is not None:
            self.text_config = _dc.replace(self.text_config, param_dtype=param_dtype)
            self.vision_config = _dc.replace(self.vision_config, param_dtype=param_dtype)
        self.model = CLIPDualEncoder(self.text_config, self.vision_config)
        if variables is None:
            key = key if key is not None else jax.random.key(0)
            size = self.vision_config.image_size
            init = lambda: self.model.init(
                key,
                jnp.zeros((1, size, size, 3)),
                jnp.zeros((1, 2), jnp.int32),
            )
            if fast_init:  # zeros from eval_shape: benches/compile checks
                from ..utils.init import zeros_from_shapes

                variables = zeros_from_shapes(jax.eval_shape(init))
            else:
                variables = init()
        self.variables = variables
        # variables are explicit jit args (NOT closure captures) so weight
        # loading after a warmup call takes effect
        self._score = jax.jit(self._score_v, static_argnames=("softmax",))
        self._text_features = jax.jit(self._text_features_v)
        self._image_features = jax.jit(self._image_features_v)

    # --- feature paths (text features are prompt-static; cache per batch) ---

    def _text_features_v(self, variables, input_ids):
        t = self.model.apply(variables, input_ids, method=self.model.text_features)
        return t / jnp.maximum(jnp.linalg.norm(t, axis=-1, keepdims=True), 1e-6)

    def _image_features_v(self, variables, images):
        from .preprocess import clip_preprocess_max_size

        pre = (
            clip_preprocess_max_size
            if self.preprocess == "max_size"
            else clip_preprocess
        )
        pixels = pre(images, self.vision_config.image_size)
        f = self.model.apply(variables, pixels, method=self.model.image_features)
        return f / jnp.maximum(jnp.linalg.norm(f, axis=-1, keepdims=True), 1e-6)

    # inlineable (non-jit) versions for callers composing larger programs
    def _text_features_impl(self, input_ids):
        return self._text_features_v(self.variables, input_ids)

    def _image_features_impl(self, images):
        return self._image_features_v(self.variables, images)

    def text_features(self, input_ids):
        return self._text_features(self.variables, input_ids)

    def image_features(self, images):
        return self._image_features(self.variables, images)

    # --- scoring ---

    def _score_v(self, variables, images, input_ids, softmax: bool = False):
        """``softmax=True`` normalizes across the BATCH dim — only
        meaningful when every row shares one prompt (the reference's
        per-prompt candidate ranking, ``pickscore_utils.py:56-60``);
        on mixed-prompt batches it mixes unrelated pairs."""
        img = self._image_features_v(variables, images)
        txt = self._text_features_v(variables, input_ids)
        scores = jnp.sum(txt * img, axis=-1)  # diag(text @ image^T)
        if softmax:
            logit_scale = jnp.exp(variables["params"]["logit_scale"])
            return jax.nn.softmax(logit_scale * scores, axis=-1)
        return scores

    def _score_impl(self, images, input_ids, softmax: bool = False):
        return self._score_v(self.variables, images, input_ids, softmax)

    def score(self, images, input_ids, softmax: bool = False):
        """images: (B, H, W, 3) in [-1, 1]; input_ids: (B, 77). -> (B,)"""
        return self._score(self.variables, images, input_ids, softmax=softmax)

    def score_with_text_features(self, images, text_features):
        """Hot-loop variant: text features precomputed once per prompt batch."""
        img = self._image_features(self.variables, images)
        return jnp.sum(text_features * img, axis=-1)
