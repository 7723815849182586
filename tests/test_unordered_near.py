"""unordered_near_match property check: the permutation-OR reduction
must agree with a brute-force distinct-position witness search on
random documents, patterns, and slops."""

import itertools
import random
import re

import pyspark.sql.functions as F

from solr_map_reduce_spark.extensions.search import (
    _glob_to_regex,
    unordered_near_match,
)

VOCAB = ["ha", "haz", "join", "spark", "x", "joiner"]


def _matches(pat, tok):
    kind, val = pat
    if kind == "term":
        return tok == val
    return re.match(_glob_to_regex(val), tok) is not None


def _brute_force(tokens, patterns, slop):
    """exists distinct positions p_i (one per pattern) with
    (max - min) - (m - 1) <= slop."""
    m = len(patterns)
    cand = [
        [i for i, t in enumerate(tokens) if _matches(p, t)]
        for p in patterns
    ]
    if any(not c for c in cand):
        return False
    for choice in itertools.product(*cand):
        if len(set(choice)) != m:
            continue
        if (max(choice) - min(choice)) - (m - 1) <= slop:
            return True
    return False


def test_unordered_matches_brute_force(spark):
    rng = random.Random(99)
    docs = [
        (i, [rng.choice(VOCAB) for _ in range(rng.randint(0, 9))])
        for i in range(120)
    ]
    df = spark.createDataFrame(docs, "id int, toks array<string>")
    cases = [
        ([("term", "ha"), ("term", "join")], 0),
        ([("term", "ha"), ("term", "join")], 2),
        ([("glob", "ha*"), ("term", "join")], 1),
        ([("term", "join"), ("term", "join")], 3),          # distinctness
        ([("term", "ha"), ("glob", "jo*"), ("term", "x")], 1),
        ([("glob", "*"), ("term", "spark")], 0),
        ([("term", "ha"), ("term", "haz"), ("term", "join"),
          ("term", "x")], 4),
    ]
    for patterns, slop in cases:
        got = {
            r["id"]
            for r in df.filter(
                unordered_near_match(F.col("toks"), patterns, slop)
            ).collect()
        }
        want = {i for i, toks in docs if _brute_force(toks, patterns, slop)}
        assert got == want, (patterns, slop, got ^ want)
