"""Exactness of the bitmask-DP max-weight bipartite matching
(danae_spark/search/matching.py) vs brute-force enumeration."""

from __future__ import annotations

import itertools
import random

from danae_spark.search.matching import _max_weight_matching


def brute_force(qcols, ccols, weights):
    best = 0.0
    for r in range(min(len(qcols), len(ccols)) + 1):
        for qs in itertools.combinations(qcols, r):
            for cs in itertools.permutations(ccols, r):
                s = sum(weights.get((q, c), 0.0) for q, c in zip(qs, cs))
                best = max(best, s)
    return best


def test_matching_matches_bruteforce():
    rng = random.Random(42)
    for _ in range(25):
        nq, nc = rng.randint(1, 5), rng.randint(1, 5)
        qcols = [f"q{i}" for i in range(nq)]
        ccols = [f"c{i}" for i in range(nc)]
        weights = {
            (q, c): round(rng.random(), 3)
            for q in qcols
            for c in ccols
            if rng.random() > 0.3
        }
        dp_score, n = _max_weight_matching(qcols, ccols, weights)
        bf_score = brute_force(qcols, ccols, weights)
        assert abs(dp_score - bf_score) < 1e-9, (qcols, ccols, weights)
        assert 0 <= n <= min(nq, nc)


def test_matching_empty():
    assert _max_weight_matching(["q0"], ["c0"], {}) == (0.0, 0)
