"""Input randomization (SURVEY §2 A2/A3) — load balancing by shuffling work.

The reference shuffles its input *file list* so mappers receive uniform work:
in-memory ``Collections.shuffle`` with fixed seed 421439783 below 100 001
files (MapReduceIndexerTool.java:961-984, threshold :74-75, :664-667), else a
dedicated MR job mapping each line to ``(random long, line)``
(mr/LineRandomizerMapper.java:38-66).

In Spark this is mostly unnecessary — size-based file splits + AQE balance
work — so the default engine path skips it.  It is kept as an explicit op for
skewed-file-count workloads and for behavioral parity, seeded for
reproducibility.
"""

from __future__ import annotations

import random

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

REFERENCE_SEED = 421439783  # MapReduceIndexerTool.java:74-75


def randomize(df: DataFrame, seed: int = REFERENCE_SEED) -> DataFrame:
    """Deterministically shuffle rows: order by seeded rand.  One shuffle; use
    only when input skew actually matters (Spark's splits already balance)."""
    return df.orderBy(F.rand(seed))


def randomize_file_list(files: list[str], seed: int = REFERENCE_SEED) -> list[str]:
    """Driver-side analog of randomizeFewInputFiles (in-memory, seeded)."""
    shuffled = list(files)
    random.Random(seed).shuffle(shuffled)
    return shuffled
