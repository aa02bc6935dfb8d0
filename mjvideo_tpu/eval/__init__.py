"""Evaluation: reward scorer, benchmark drivers, metrics, baseline judges."""

from .metrics import (  # noqa: F401
    binary_dimension_metrics,
    genai_bench_metrics,
    preference_accuracy,
    tie_aware_pair_score,
)
from .preference import (  # noqa: F401
    IncrementalWriter,
    evaluate_aspects,
    evaluate_genai_bench,
    evaluate_preference,
    filter_safesora_pairs,
)
from .scorer import RewardScorer, round_to_bucket  # noqa: F401
