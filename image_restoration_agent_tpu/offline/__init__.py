from .exploration import exhaust_sequences, explore_fail_rates, expected_tree_counts
from .distill import distill_experience
from .eval_harness import compute_scores, compare_methods

__all__ = [
    "exhaust_sequences", "explore_fail_rates", "expected_tree_counts",
    "distill_experience", "compute_scores", "compare_methods",
]
