"""Per-segment key-range sidecar — file pruning for point lookups.

The reference's artifact is a Lucene index: a point lookup walks each
segment's term dictionary and touches only the segment(s) containing the
key.  This engine's artifact writes key-sorted segment files per shard
(``indexing.write``: ``sortWithinPartitions(shard, key)`` +
``maxRecordsPerFile``), so every segment file covers a contiguous key
range — but a stock parquet scan still lists and opens every file in the
shard to learn that from the footers.  The sidecar hoists those ranges
driver-side:

    out/_KEY_RANGES.json   {"key_type": "long"|"string",
                            "shards": {"0": {"part-...parquet": [min, max, rows]}}}

Build: one column-pruned pass over the key column grouped by
``input_file_name()`` — no shuffle wider than (file, min, max).

Query: ``SearchIndex.get/get_many`` intersect the key with each file's
[min, max] and read ONLY the admitted files (plus the shard partition
filter when the routing mode is reproducible driver-side).  Because the
comparison uses the stored parquet values themselves, pruning has no false
negatives; a file whose range admits the key but lacks it costs one extra
file read.  Under ``routing="native"`` (hash computed inside the JVM, no
driver-side parity) this restores point-lookup pruning entirely from the
sidecar.

Mutation safety: any rewrite changes file names, so a stale sidecar could
MISS rows (false negative).  Every engine mutation path refreshes the
sidecar in the same operation — ``merge_into`` and ``delete_where``
recompute the touched shards, ``compact`` recomputes all (its rewrite
renames every segment).  External mutators that bypass the engine must
call ``write_key_ranges`` or ``drop_key_ranges`` (degrade to the shard
scan) themselves.

At 100 TB: thousands of segments per shard; a point lookup goes from
"open every footer in the shard" to "open one file", and the sidecar
itself stays tiny (two key values per segment).
"""

from __future__ import annotations

import json

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

KEY_RANGES = "_KEY_RANGES.json"

# Spark DataType.simpleString() names (what write_key_ranges stores)
_INT_TYPES = {"tinyint", "smallint", "int", "bigint"}
_FLOAT_TYPES = {"float", "double"}


def _relative_file(full: str, shard: int) -> str:
    """File URI → name relative to its shard dir (artifact-relocatable)."""
    marker = f"shard={shard}/"
    i = full.rfind(marker)
    return full[i + len(marker):] if i >= 0 else full.rsplit("/", 1)[-1]


def write_key_ranges(
    spark: SparkSession, path: str, shards: list[int] | None = None
) -> dict:
    """Compute and persist per-file (min, max, rows) of the unique key.
    ``shards`` restricts the recompute to those shard dirs (partition-pruned
    scan) and merges into the existing sidecar — the ``merge_into`` refresh
    path.  Returns the sidecar dict."""
    from solr_map_reduce_spark.fs import get_fs
    from solr_map_reduce_spark.fs import join as fs_join
    from solr_map_reduce_spark.indexing import MANIFEST, SHARD_COL, read_index

    fs = get_fs(path, spark)
    manifest = json.loads(fs.read_text(fs_join(path, MANIFEST)))
    key = manifest["unique_key"]

    existing: dict = {}
    if shards is not None:
        if fs.exists(fs_join(path, KEY_RANGES)):
            existing = json.loads(
                fs.read_text(fs_join(path, KEY_RANGES))
            ).get("shards", {})
            for s in shards:  # rewritten dirs: old file names are gone
                existing.pop(str(int(s)), None)
        else:
            # no sidecar to merge into: a subset write would cover ONLY the
            # refreshed shards and silently hide every other shard's rows
            # from pruned lookups/count — escalate to a full build (same
            # policy as write_term_blooms)
            shards = None

    idx = read_index(spark, path)
    if shards is not None:
        idx = idx.filter(F.col(SHARD_COL).isin([int(s) for s in shards]))
    per_file = (
        idx.select(
            F.col(SHARD_COL).alias("_s"),
            F.input_file_name().alias("_f"),
            F.col(key).alias("_k"),
        )
        .groupBy("_s", "_f")
        .agg(
            F.min("_k").alias("_lo"),
            F.max("_k").alias("_hi"),
            F.count(F.lit(1)).alias("_n"),
        )
        .collect()
    )

    key_type = idx.schema[key].dataType.simpleString()
    shard_maps: dict = dict(existing)
    for row in per_file:
        s = str(int(row["_s"]))
        shard_maps.setdefault(s, {})[_relative_file(row["_f"], int(row["_s"]))] = [
            row["_lo"], row["_hi"], row["_n"],
        ]
    sidecar = {"key_type": key_type, "shards": shard_maps}
    fs.write_text(fs_join(path, KEY_RANGES), json.dumps(sidecar, default=str))
    return sidecar


def load_key_ranges(spark: SparkSession, path: str) -> dict | None:
    from solr_map_reduce_spark.fs import get_fs
    from solr_map_reduce_spark.fs import join as fs_join

    fs = get_fs(path, spark)
    full = fs_join(path, KEY_RANGES)
    if not fs.exists(full):
        return None
    return json.loads(fs.read_text(full))


def drop_key_ranges(spark: SparkSession, path: str) -> None:
    """Remove the sidecar — the escape hatch for EXTERNAL mutators that
    rewrite artifact files without refreshing (engine paths refresh via
    ``write_key_ranges`` instead); a stale entry would be a false
    negative, absence merely degrades to the shard scan."""
    from solr_map_reduce_spark.fs import get_fs
    from solr_map_reduce_spark.fs import join as fs_join

    fs = get_fs(path, spark)
    full = fs_join(path, KEY_RANGES)
    if fs.exists(full):
        fs.delete(full)


def _coerce(ranges: dict, value):
    """Coerce a bound/key to the key column's comparison domain.  Raises
    (TypeError/ValueError) when the value can't inhabit that domain —
    callers then SKIP pruning rather than risk a divergent comparison.

    String keys require actual ``str`` inputs: Spark compares a string
    column against a numeric literal by CASTING THE COLUMN ("007" == 7
    matches), which lexicographic pruning would wrongly exclude."""
    kt = ranges.get("key_type", "string")
    if kt in _INT_TYPES:
        return int(str(value))  # int("3.5") raises -> no pruning, stays exact
    if kt in _FLOAT_TYPES:
        return float(value)
    if kt.startswith("decimal"):
        from decimal import Decimal

        return Decimal(str(value))
    if kt != "string":
        # timestamp/date/boolean/binary…: Python-side comparison of the
        # json-serialized bounds does NOT reproduce Spark's typed compare
        # (e.g. '2020-01-05 23:00' vs a '2020-01-05T12:00' literal orders
        # by ' ' < 'T') — refuse to prune rather than risk hiding rows
        raise TypeError(f"unprunable key domain {kt!r}")
    if not isinstance(value, str):
        raise TypeError(f"string key domain needs str bounds, got {type(value)}")
    return value


def _is_nan(x) -> bool:
    return isinstance(x, float) and x != x


def candidate_files_range(
    ranges: dict, lo=None, hi=None, hi_exclusive: bool = False
) -> list[tuple[int, str]] | None:
    """(shard, file) pairs whose [min, max] OVERLAPS the key range
    [lo, hi] (either bound may be None = unbounded), or None when the
    sidecar can't answer.  Used for contiguous key scans — with composite
    ids (``root!suffix``, Solr's routing syntax) all of a root's docs are
    both co-sharded and sort-adjacent, so a ``root!`` prefix scan touches
    one shard's few segments."""
    try:
        lo_c = _coerce(ranges, lo) if lo is not None else None
        hi_c = _coerce(ranges, hi) if hi is not None else None
    except (TypeError, ValueError):
        return None
    if _is_nan(lo_c) or _is_nan(hi_c):
        return None  # NaN bound: comparison semantics diverge — no pruning
    out: list[tuple[int, str]] = []
    for s, files in ranges.get("shards", {}).items():
        for fname, (flo, fhi, _n) in files.items():
            flo_c, fhi_c = _coerce(ranges, flo), _coerce(ranges, fhi)
            if _is_nan(flo_c) or _is_nan(fhi_c):
                out.append((int(s), fname))  # unknown span: keep (superset)
                continue
            if lo_c is not None and fhi_c < lo_c:
                continue
            if hi_c is not None and (
                flo_c >= hi_c if hi_exclusive else flo_c > hi_c
            ):
                continue
            out.append((int(s), fname))
    return sorted(out)


def next_prefix(prefix: str) -> str | None:
    """Smallest string strictly greater than every string with ``prefix``
    (increment-with-carry on the last codepoint); None when no such string
    exists (prefix is all U+10FFFF)."""
    chars = list(prefix)
    while chars:
        cp = ord(chars[-1])
        if cp < 0x10FFFF:
            chars[-1] = chr(cp + 1)
            return "".join(chars)
        chars.pop()
    return None


def candidate_files(
    ranges: dict, keys, shard=None
) -> list[tuple[int, str]] | None:
    """(shard, file) pairs whose [min, max] admits ANY of the keys, or None
    when the sidecar can't answer (unknown key type coercion failure).
    ``shard`` (an int or a set of ints) narrows the walk to the shards the
    router already placed the keys in — a key can only live in its routed
    shard, so files elsewhere are skipped even if their span matches."""
    try:
        wanted = [_coerce(ranges, k) for k in keys]
    except (TypeError, ValueError):
        return None
    if any(_is_nan(k) for k in wanted):
        return None  # NaN key: comparison semantics diverge — no pruning
    allowed = None
    if shard is not None:
        allowed = {int(shard)} if isinstance(shard, int) else {int(x) for x in shard}
    out: list[tuple[int, str]] = []
    for s, files in ranges.get("shards", {}).items():
        if allowed is not None and int(s) not in allowed:
            continue
        for fname, (lo, hi, _n) in files.items():
            lo_c, hi_c = _coerce(ranges, lo), _coerce(ranges, hi)
            if _is_nan(lo_c) or _is_nan(hi_c):
                out.append((int(s), fname))  # unknown span: keep (superset)
            elif any(lo_c <= k <= hi_c for k in wanted):
                out.append((int(s), fname))
    return sorted(out)
