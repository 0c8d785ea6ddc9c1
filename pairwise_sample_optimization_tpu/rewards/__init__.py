from .preprocess import clip_preprocess, CLIP_MEAN, CLIP_STD
from .pickscore import PickScoreScorer
from .clipscore import CLIPScorer
from .aesthetic import AestheticScorer
from .hps import HPSScorer
from .registry import REWARD_FNS, get_reward_fn

__all__ = [
    "clip_preprocess",
    "CLIP_MEAN",
    "CLIP_STD",
    "PickScoreScorer",
    "CLIPScorer",
    "AestheticScorer",
    "HPSScorer",
    "REWARD_FNS",
    "get_reward_fn",
]
