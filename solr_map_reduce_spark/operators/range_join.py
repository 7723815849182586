"""Range (point-in-interval) join — the second custom join the brief calls
out alongside as-of.

Matches left rows (a timestamp) to right rows (an interval [start, end]),
optionally per key.  The naive formulation — an equi-join on the key with an
inequality filter — degenerates to a per-key cross product before filtering;
with no key it is a full cartesian.  The scale path is **interval binning**:

    left  → bin = floor(ts / bin_seconds)
    right → explode one row per bin the interval covers
    equi-join on (key…, bin) → exact containment filter → dedup

The shuffle is then keyed on (key, bin): each left row meets only the
intervals overlapping its bin, never the whole key group.  Pick
``bin_seconds`` near the typical interval length — an interval spanning B
bins is replicated B times (the classic time-binning trade; Spark's own
optimizer has no equivalent rewrite for DataFrame range predicates).

DuckDB expresses the same join directly (inequality predicates), which
serves as the exact oracle in the query registry.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from solr_map_reduce_spark.functions.timestamps import epoch_seconds

_BIN = "_range_bin"


def range_join(
    left: DataFrame,
    right: DataFrame,
    ts: str,
    start: str,
    end: str,
    on: str | Sequence[str] | None = None,
    bin_seconds: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """Join left rows to right intervals with ``start <= ts <= end``
    (inclusive bounds), equi-keyed on ``on`` when given."""
    if how != "inner":
        # the containment filter runs AFTER the bin equi-join, so an
        # outer join's null-extended rows would be silently dropped —
        # how="left" would behave exactly like inner instead of keeping
        # unmatched left rows.  Refuse loudly rather than lie.
        raise ValueError(
            f"range_join supports how='inner' only (got {how!r}); an outer "
            "range join needs the containment predicate inside the join "
            "condition — anti-join the inner result against the left side "
            "to find unmatched rows"
        )
    keys = [on] if isinstance(on, str) else list(on or [])
    lsec = epoch_seconds(F.col(ts))
    lb = left.withColumn(_BIN, F.floor(lsec / bin_seconds))
    rb = right.withColumn(
        _BIN,
        F.explode(
            F.sequence(
                F.floor(epoch_seconds(F.col(start)) / bin_seconds),
                F.floor(epoch_seconds(F.col(end)) / bin_seconds),
            )
        ),
    )
    joined = lb.join(rb, on=keys + [_BIN], how=how).filter(
        (F.col(ts) >= F.col(start)) & (F.col(ts) <= F.col(end))
    )
    return joined.drop(_BIN)
