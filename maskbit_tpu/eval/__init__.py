from maskbit_tpu.eval.adm import Evaluator, FIDStatistics
from maskbit_tpu.eval.fid import (
    fid_from_moments,
    frechet_distance,
    inception_score_from_moments,
    load_stats_npz,
)
from maskbit_tpu.eval.inception import InceptionV3, load_inception_params
from maskbit_tpu.eval.streaming import GeneratorEvaluator, TokenizerEvaluator

__all__ = [
    "Evaluator", "FIDStatistics", "frechet_distance", "fid_from_moments",
    "inception_score_from_moments", "load_stats_npz",
    "InceptionV3", "load_inception_params",
    "TokenizerEvaluator", "GeneratorEvaluator",
]
