"""Reward scorers, preprocessing, tokenizer, prompt data tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pairwise_sample_optimization_tpu.data import (
    CLIPTokenizer,
    PerPromptStatTracker,
    PromptDataset,
    PromptLoader,
    get_prompt_fn,
)
from pairwise_sample_optimization_tpu.models.clip import (
    CLIPTextConfig,
    CLIPVisionConfig,
)
from pairwise_sample_optimization_tpu.rewards import (
    AestheticScorer,
    PickScoreScorer,
    clip_preprocess,
    get_reward_fn,
)


class TestPreprocess:
    def test_range_and_shape(self):
        imgs = jnp.zeros((2, 32, 32, 3))  # mid-gray in [-1,1]
        out = clip_preprocess(imgs, size=16)
        assert out.shape == (2, 16, 16, 3)
        # value 0 -> 0.5 normalized by CLIP mean/std
        want = (0.5 - np.array([0.48145466, 0.4578275, 0.40821073])) / np.array(
            [0.26862954, 0.26130258, 0.27577711]
        )
        np.testing.assert_allclose(np.asarray(out[0, 0, 0]), want, rtol=1e-5)

    def test_01_range_input(self):
        imgs = jnp.zeros((1, 8, 8, 3))
        a = clip_preprocess(imgs, size=8, value_range=(0.0, 1.0))  # black
        b = clip_preprocess(imgs, size=8, value_range=(-1.0, 1.0))  # mid-gray
        assert np.abs(np.asarray(a) - np.asarray(b)).max() > 0.1

    def test_resize_max_size_square_equals_plain(self):
        """Square inputs: ResizeMaxSize == plain square resize (the
        protocol's generated images are square, so defaults are parity)."""
        from pairwise_sample_optimization_tpu.rewards.preprocess import (
            clip_preprocess_max_size,
        )

        imgs = jnp.asarray(
            np.random.default_rng(0).uniform(-1, 1, (2, 32, 32, 3)), jnp.float32
        )
        a = clip_preprocess(imgs, size=16)
        b = clip_preprocess_max_size(imgs, size=16)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)

    def test_resize_max_size_nonsquare_pads(self):
        """Non-square: longest side scaled to size, the rest center-padded
        with black (open_clip ResizeMaxSize, clip_utils.py:18-37)."""
        from pairwise_sample_optimization_tpu.rewards.preprocess import (
            CLIP_MEAN,
            CLIP_STD,
            clip_preprocess_max_size,
        )

        # white 16x32 image in [-1,1] -> content rows stay white, pad black
        imgs = jnp.ones((1, 16, 32, 3))
        out = np.asarray(clip_preprocess_max_size(imgs, size=16))
        assert out.shape == (1, 16, 16, 3)
        black = (0.0 - np.array(CLIP_MEAN)) / np.array(CLIP_STD)
        white = (1.0 - np.array(CLIP_MEAN)) / np.array(CLIP_STD)
        # scaled content is 8 rows tall, centered: rows 0-3 and 12-15 pad
        np.testing.assert_allclose(out[0, 0, 0], black, rtol=1e-5)
        np.testing.assert_allclose(out[0, 15, 0], black, rtol=1e-5)
        np.testing.assert_allclose(out[0, 8, 8], white, rtol=1e-4)

    def test_scorer_max_size_option(self):
        s = PickScoreScorer(
            text_config=CLIPTextConfig.tiny(),
            vision_config=CLIPVisionConfig.tiny(),
            preprocess="max_size",
        )
        imgs = jnp.asarray(
            np.random.default_rng(1).uniform(-1, 1, (2, 20, 28, 3)), jnp.float32
        )
        ids = jnp.asarray([[1, 5, 2, 0], [3, 9, 2, 0]], jnp.int32)
        scores = s.score(imgs, ids)
        assert np.isfinite(np.asarray(scores)).all()
        # and it actually changes non-square scoring vs plain resize
        s2 = PickScoreScorer(
            text_config=CLIPTextConfig.tiny(),
            vision_config=CLIPVisionConfig.tiny(),
        )
        assert not np.allclose(np.asarray(scores), np.asarray(s2.score(imgs, ids)))


class TestScorers:
    def test_pickscore_tiny(self):
        s = PickScoreScorer(
            text_config=CLIPTextConfig.tiny(), vision_config=CLIPVisionConfig.tiny()
        )
        imgs = jax.random.uniform(jax.random.key(0), (3, 28, 28, 3), minval=-1, maxval=1)
        ids = jnp.array([[1, 999, 0], [3, 999, 0], [5, 999, 0]])
        scores = s.score(imgs, ids)
        assert scores.shape == (3,)
        assert np.all(np.abs(np.asarray(scores)) <= 1.0)  # cosine bound

    def test_precomputed_text_features_match(self):
        s = PickScoreScorer(
            text_config=CLIPTextConfig.tiny(), vision_config=CLIPVisionConfig.tiny()
        )
        imgs = jax.random.uniform(jax.random.key(1), (2, 28, 28, 3), minval=-1, maxval=1)
        ids = jnp.array([[1, 999, 0], [3, 999, 0]])
        direct = s.score(imgs, ids)
        via_feats = s.score_with_text_features(imgs, s.text_features(ids))
        np.testing.assert_allclose(np.asarray(direct), np.asarray(via_feats), rtol=1e-5)

    def test_aesthetic_tiny(self):
        s = AestheticScorer(vision_config=CLIPVisionConfig.tiny())
        imgs = jax.random.uniform(jax.random.key(2), (2, 28, 28, 3), minval=-1, maxval=1)
        scores = s.score(imgs)
        assert scores.shape == (2,)
        assert np.isfinite(np.asarray(scores)).all()


class TestRegistry:
    def test_light_reward(self):
        fn = get_reward_fn("light_reward")
        imgs = jnp.full((2, 4, 4, 3), 0.25)
        r, meta = fn(imgs)
        np.testing.assert_allclose(np.asarray(r), [0.25, 0.25], rtol=1e-6)

    def test_jpeg_rewards_inverse(self):
        inc = get_reward_fn("jpeg_incompressibility")
        com = get_reward_fn("jpeg_compressibility")
        imgs = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (2, 32, 32, 3)))
        r1, _ = inc(imgs)
        r2, _ = com(imgs)
        np.testing.assert_allclose(r1, -r2)
        assert (r1 > 0).all()

    def test_unknown_raises(self):
        with pytest.raises(KeyError):
            get_reward_fn("nope")


TINY_MERGES = ["#version: 0.2", "c a", "ca t</w>", "d o", "do g</w>"]


class TestTokenizer:
    def _tok(self, **kw):
        return CLIPTokenizer(merges=TINY_MERGES[1:], **kw)

    def test_merge_application(self):
        tok = self._tok()
        ids = tok.encode("cat")
        assert len(ids) == 1  # c+a -> ca, ca+t</w> -> cat</w>
        assert tok.decoder[ids[0]] == "cat</w>"

    def test_roundtrip(self):
        tok = self._tok()
        ids = tok.encode("cat dog")
        assert tok.decode(ids) == "cat dog"

    def test_call_pads_and_wraps(self):
        tok = self._tok(context_length=8)
        out = tok(["cat"])
        assert out.shape == (1, 8)
        assert out[0, 0] == tok.sot
        assert out[0, 2] == tok.eot
        assert (out[0, 3:] == tok.pad_token_id).all()
        assert tok.pad_token_id == tok.eot  # HF default

    def test_openclip_zero_padding(self):
        tok = self._tok(context_length=8, pad_token_id=0)
        out = tok(["cat"])
        assert (out[0, 3:] == 0).all()

    def test_truncation_keeps_eot(self):
        tok = self._tok(context_length=4)
        out = tok(["cat dog cat dog cat dog"])
        assert out.shape == (1, 4)
        assert out[0, 0] == tok.sot and out[0, 3] == tok.eot

    def test_unicode_safe(self):
        tok = self._tok()
        ids = tok.encode("café über")  # non-ascii goes through bytes
        assert all(isinstance(i, int) for i in ids)

    def test_golden_real_vocab(self):
        """Known CLIP ids for a canonical phrase, using any available
        standard 49152-merge vocab file."""
        import os

        from pairwise_sample_optimization_tpu.data.tokenizer import (
            DEFAULT_BPE_PATH,
        )

        path = DEFAULT_BPE_PATH if os.path.exists(DEFAULT_BPE_PATH or "") else None
        if path is None:
            pytest.skip("no standard CLIP BPE vocab available")
        tok = CLIPTokenizer(bpe_path=path)
        assert tok.vocab_size == 49408
        ids = tok("a photo of a cat")[0]
        assert ids[:7].tolist() == [49406, 320, 1125, 539, 320, 2368, 49407]
        assert tok.decode(ids) == "a photo of a cat"


class TestPromptData:
    def test_builtin_dataset(self):
        ds = PromptDataset()
        assert len(ds) > 0
        assert isinstance(ds[0], str)

    def test_packaged_4k_training_prompts(self):
        """The reference's training prompt set (protocol data,
        ``pso_pytorch/assets/4k_training_prompts.json``) ships with the
        package and resolves via the "4k" shorthand."""
        from pairwise_sample_optimization_tpu.data import training_prompts_path

        import os

        assert os.path.exists(training_prompts_path())
        ds = PromptDataset("4k")
        assert len(ds) == 4000
        assert all(isinstance(p, str) and p for p in ds.prompts[:10])

    def test_packaged_imagereward_prompts(self):
        """The reference's ImageReward benchmark prompt set
        (``pso_pytorch/assets/imagereward_prompt.txt``, 1000 prompts)
        ships with the package; resolves via the "imagereward"
        shorthand and the generic newline-delimited .txt loader."""
        from pairwise_sample_optimization_tpu.data import (
            imagereward_prompts_path,
        )

        import os

        assert os.path.exists(imagereward_prompts_path())
        ds = PromptDataset("imagereward")
        assert len(ds) == 1000
        assert all(isinstance(p, str) and p for p in ds.prompts[:10])

    def test_txt_dataset(self, tmp_path):
        p = tmp_path / "prompts.txt"
        p.write_text("a cat\n\na dog\n")
        ds = PromptDataset(str(p))
        assert len(ds) == 2 and ds[1] == "a dog"

    def test_json_dataset(self, tmp_path):
        p = tmp_path / "prompts.json"
        p.write_text('[{"caption": "a"}, {"caption": "b"}]')
        ds = PromptDataset(str(p))
        assert len(ds) == 2 and ds[1] == "b"

    def test_hf_dataset_local_export(self, tmp_path):
        """PickaPic via HF ``datasets``: a local save_to_disk export loads
        through the same path that would fetch
        yuvalkirstain/pickapic_v1_no_images from the hub (no network
        here). Covers both a bare Dataset and a DatasetDict with the
        reference's test_unique split."""
        hf = pytest.importorskip("datasets")

        d1 = tmp_path / "flat"
        hf.Dataset.from_dict({"caption": ["x", "y", "z"]}).save_to_disk(str(d1))
        ds = PromptDataset(hf_dataset=str(d1))
        assert ds.prompts == ["x", "y", "z"]

        d2 = tmp_path / "dict"
        hf.DatasetDict(
            {"test_unique": hf.Dataset.from_dict({"caption": ["p", "q"]})}
        ).save_to_disk(str(d2))
        ds = PromptDataset(hf_dataset=str(d2), split="test_unique")
        assert ds.prompts == ["p", "q"]
        with pytest.raises(KeyError):
            PromptDataset(hf_dataset=str(d2), split="nope")

    def test_loader_batching(self):
        tok = CLIPTokenizer(merges=TINY_MERGES[1:], context_length=16)
        ds = PromptDataset()
        loader = PromptLoader(ds, batch_size=4, tokenizer_one=tok, tokenizer_two=tok)
        batches = list(loader.epoch())
        assert len(batches) == len(ds) // 4
        b = batches[0]
        assert b["input_ids_one"].shape == (4, 16)
        assert b["input_ids_two"].shape == (4, 16)
        assert len(b["prompts"]) == 4

    def test_loader_reshuffles(self):
        tok = CLIPTokenizer(merges=TINY_MERGES[1:], context_length=16)
        loader = PromptLoader(PromptDataset(), 4, tok, seed=1)
        e1 = [b["prompts"] for b in loader.epoch()]
        e2 = [b["prompts"] for b in loader.epoch()]
        assert e1 != e2

    def test_prompt_fns(self):
        p, meta = get_prompt_fn("simple_animals")()
        assert isinstance(p, str) and meta == {}


class TestStatTracker:
    def test_advantages_normalize(self):
        t = PerPromptStatTracker(buffer_size=8, min_count=2)
        prompts = ["a", "a", "b", "b"]
        r = np.array([1.0, 3.0, 10.0, 30.0])
        t.update(prompts, r)  # warm the buffers
        adv = t.update(prompts, r)
        assert adv.shape == (4,)
        # per-prompt normalization: each prompt's pair is symmetric
        np.testing.assert_allclose(adv[0], -adv[1], rtol=1e-5)
        stats = t.get_stats()
        assert set(stats) == {"a", "b"}

    def test_ring_keeps_most_recent_window(self):
        # reference semantics: deque(maxlen=buffer_size) keeps the newest
        # `buffer_size` rewards; our ring buffer must match across wraps
        t = PerPromptStatTracker(buffer_size=4, min_count=1)
        t.update(["a"] * 3, np.array([100.0, 100.0, 100.0]))
        t.update(["a"] * 3, np.array([1.0, 2.0, 3.0]))  # wraps: window=[100,1,2,3]
        s = t.get_stats()["a"]
        window = np.array([100.0, 1.0, 2.0, 3.0])
        np.testing.assert_allclose(s["mean"], window.mean())
        np.testing.assert_allclose(s["std"], window.std())
        assert s["count"] == 4
        # oversized batch: only the newest buffer_size survive
        t.update(["a"] * 6, np.arange(6.0))
        np.testing.assert_allclose(t.get_stats()["a"]["mean"], np.mean([2, 3, 4, 5]))

    def test_advantages_preserve_caller_dtype(self):
        # reference np.empty_like semantics: float32 rewards -> float32
        # advantages (internal accumulation stays f64)
        t = PerPromptStatTracker(buffer_size=4, min_count=1)
        adv = t.update(["a", "a"], np.array([1.0, 2.0], np.float32))
        assert adv.dtype == np.float32

    def test_min_count_batch_fallback(self):
        t = PerPromptStatTracker(buffer_size=8, min_count=16)
        r = np.array([1.0, 3.0, 10.0, 30.0])
        adv = t.update(["a", "a", "b", "b"], r)
        # below min_count: normalized by the BATCH mean/std, not per-prompt
        np.testing.assert_allclose(adv, (r - r.mean()) / (r.std() + 1e-6))
