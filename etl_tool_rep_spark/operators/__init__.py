from .asof import asof_join
from .dedup import (exact_dedup, minhash_candidate_pairs,
                    ngram_jaccard_pairs, simhash_candidate_pairs)
from .knn import brute_force_topk, ivf_assign, ivf_topk

__all__ = [
    "asof_join", "exact_dedup", "minhash_candidate_pairs",
    "simhash_candidate_pairs", "ngram_jaccard_pairs",
    "brute_force_topk", "ivf_assign", "ivf_topk",
]
