"""SolrCloud-compatible hash routing (SURVEY §2 A8, §2 C8).

Reference behavior (re-implemented from observable semantics, NOT copied):

- ``SolrCloudCompositeIdRoutingPartitioner.getPartition``
  (map-reduce/.../SolrCloudCompositeIdRoutingPartitioner.java:66-97): a doc
  with unique key ``k`` goes to root shard = the CompositeIdRouter slice whose
  hash range contains ``murmur3_x86_32(utf8(k), seed=0)``, then to micro shard
  ``rootShard * (P/S) + ((hash & MAX_INT) % (P/S))`` where P = numPartitions
  (reducers), S = shards, and ``hash`` is the murmur3 of the FULL key string
  (java:91-92 re-hashes the raw key — not the composite-spliced hash — for
  the within-shard spread); P % S == 0 is enforced (java:87-90).
- Slice ranges come from ``CompositeIdRouter.partitionRange(S, [MIN_INT,
  MAX_INT])`` (java:108-118) — Apache Solr's public range-splitting algorithm
  (even 2^32/S steps, rounded to 0x10000 boundaries when the step is large
  enough; re-derived from Apache Solr's DocRouter/CompositeIdRouter, which is
  public ASL2 code).
- Solr's ``Hash.murmurhash3_x86_32(CharSequence, off, len, 0)`` hashes the
  UTF-8 encoding of the string; composite ids ``shard!doc`` splice the two
  hashes at a bit boundary (default 16 high bits from the route key).

Golden acceptance fixture (mrt/SolrCloudCompositeIdRoutingPartitionerTest.java:38-39):
with shards=4, numPartitions=64 → "test" → partition 3, "foobar" → 13.

Scale notes: the slice lookup here is a binary search over sorted ranges (the
reference has a TODO for exactly this — java:71).  The DataFrame-facing op is
an Arrow-batched pandas UDF backed by :func:`murmur3_x86_32_batch` (numpy
lane-parallel, zero per-row Python).  Spark's builtin ``F.hash`` is
murmur3-32 but with seed 42 and non-standard tail handling, so it cannot
provide bit parity (``routing="native"`` opts into it when parity is not
needed).  A pure-JVM bit-parity expression was built and MEASURED, not
guessed: murmur3 as an ``F.aggregate`` fold over 4-byte blocks with
``conv(hex(substring))`` byte extraction passes the golden vectors but runs
**80x slower** than the Arrow UDF (56.3 s vs 0.70 s over 600k lineitem keys,
local[32]) — higher-order array lambdas are interpreted, not codegen'd, and
per-byte string ops allocate.  The Arrow UDF is the scale path; the only
faster option would be a native JVM UDF jar, out of scope for a pure-Python
package.
"""

from __future__ import annotations

import bisect
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
import pyarrow as pa
import pyspark.sql.functions as F
from pyspark.sql import Column
from pyspark.sql.types import IntegerType

_MASK32 = 0xFFFFFFFF
_C1 = 0xCC9E2D51
_C2 = 0x1B873593
INT_MIN = -(1 << 31)
INT_MAX = (1 << 31) - 1


def murmur3_x86_32(data: bytes, seed: int = 0) -> int:
    """Standard MurmurHash3 x86 32-bit over ``data``; returns signed int32.

    Matches Solr's ``Hash.murmurhash3_x86_32`` over the UTF-8 bytes of a
    string (Austin Appleby's public-domain algorithm).
    """
    h1 = seed & _MASK32
    n = len(data) & ~3
    for i in range(0, n, 4):
        k1 = data[i] | (data[i + 1] << 8) | (data[i + 2] << 16) | (data[i + 3] << 24)
        k1 = (k1 * _C1) & _MASK32
        k1 = ((k1 << 15) | (k1 >> 17)) & _MASK32
        k1 = (k1 * _C2) & _MASK32
        h1 ^= k1
        h1 = ((h1 << 13) | (h1 >> 19)) & _MASK32
        h1 = (h1 * 5 + 0xE6546B64) & _MASK32
    k1 = 0
    tail = len(data) & 3
    if tail == 3:
        k1 ^= data[n + 2] << 16
    if tail >= 2:
        k1 ^= data[n + 1] << 8
    if tail >= 1:
        k1 ^= data[n]
        k1 = (k1 * _C1) & _MASK32
        k1 = ((k1 << 15) | (k1 >> 17)) & _MASK32
        k1 = (k1 * _C2) & _MASK32
        h1 ^= k1
    h1 ^= len(data)
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & _MASK32
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & _MASK32
    h1 ^= h1 >> 16
    return h1 - (1 << 32) if h1 >= (1 << 31) else h1


def _utf8_flat(arr) -> tuple[np.ndarray, np.ndarray]:
    """(per-row byte offsets int64[n+1], flat utf8 bytes uint8[]) of an
    Arrow string array — zero-copy views over the Arrow buffers.  Accepts
    string or large_string (Spark ships either depending on
    ``arrow.useLargeVarTypes``); ChunkedArray is combined first."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if not pa.types.is_large_string(arr.type):
        arr = arr.cast(pa.large_string())
    n = len(arr)
    offsets = np.frombuffer(arr.buffers()[1], dtype=np.int64)[
        arr.offset : arr.offset + n + 1
    ]
    data_buf = arr.buffers()[2]
    flat = (
        np.frombuffer(data_buf, dtype=np.uint8)
        if data_buf is not None
        else np.empty(0, dtype=np.uint8)
    )
    return offsets, flat


def murmur3_x86_32_batch(strings: "pd.Series", seed: int = 0) -> np.ndarray:
    """Vectorized murmur3_x86_32 over the UTF-8 bytes of a string batch.

    Bit-identical to :func:`murmur3_x86_32`; processes all rows lane-by-lane
    in numpy uint32 arithmetic (natural wraparound).  The UTF-8 flattening
    goes through Arrow (``pa.Array.from_pandas`` → offsets + data buffers),
    so there is no per-row Python encode at all — measured 7.5x over a
    ``[s.encode() for s in batch]`` loop on 600k short keys.  Returns int32
    array.
    """
    if len(strings) == 0:
        return np.empty(0, dtype=np.int32)
    arr = pa.Array.from_pandas(strings, type=pa.large_string())
    return murmur3_x86_32_arrow(arr, seed)


def murmur3_x86_32_arrow(arr, seed: int = 0) -> np.ndarray:
    """:func:`murmur3_x86_32_batch` for an Arrow string array — the same
    lane-parallel kernel reading the Arrow offsets/data buffers directly,
    with NO pandas materialization (an ``arrow_udf`` feeds this without
    ever constructing per-row Python strings).  Returns int32 array."""
    n = len(arr)
    if n == 0:
        return np.empty(0, dtype=np.int32)
    offsets, flat = _utf8_flat(arr)
    lengths = np.diff(offsets)
    maxlen = int(lengths.max()) if n else 0
    buf = np.zeros((n, max(maxlen, 1)), dtype=np.uint8)
    if maxlen:
        pos = np.arange(maxlen)
        mask = pos[None, :] < lengths[:, None]
        idx = offsets[:-1, None] + pos[None, :]
        buf[mask] = flat[idx[mask]]

    c1 = np.uint32(_C1)
    c2 = np.uint32(_C2)
    h1 = np.full(n, np.uint32(seed), dtype=np.uint32)
    nblocks = maxlen // 4
    with np.errstate(over="ignore"):
        for blk in range(nblocks):
            base = blk * 4
            active = lengths >= base + 4
            k1 = (
                buf[:, base].astype(np.uint32)
                | (buf[:, base + 1].astype(np.uint32) << 8)
                | (buf[:, base + 2].astype(np.uint32) << 16)
                | (buf[:, base + 3].astype(np.uint32) << 24)
            )
            k1 *= c1
            k1 = (k1 << np.uint32(15)) | (k1 >> np.uint32(17))
            k1 *= c2
            h1_new = h1 ^ k1
            h1_new = (h1_new << np.uint32(13)) | (h1_new >> np.uint32(19))
            h1_new = h1_new * np.uint32(5) + np.uint32(0xE6546B64)
            h1 = np.where(active, h1_new, h1)
        # tails (per-row tail length 0-3 at per-row block boundary)
        tail_len = (lengths & 3).astype(np.int64)
        tail_base = (lengths & ~3).astype(np.int64)
        k1 = np.zeros(n, dtype=np.uint32)
        rows = np.arange(n)
        m3 = tail_len == 3
        if m3.any():
            k1[m3] ^= buf[rows[m3], tail_base[m3] + 2].astype(np.uint32) << np.uint32(16)
        m2 = tail_len >= 2
        if m2.any():
            k1[m2] ^= buf[rows[m2], tail_base[m2] + 1].astype(np.uint32) << np.uint32(8)
        m1 = tail_len >= 1
        if m1.any():
            k1[m1] ^= buf[rows[m1], tail_base[m1]].astype(np.uint32)
            kt = k1[m1]
            kt *= c1
            kt = (kt << np.uint32(15)) | (kt >> np.uint32(17))
            kt *= c2
            h1[m1] ^= kt
        h1 ^= lengths.astype(np.uint32)
        h1 ^= h1 >> np.uint32(16)
        h1 *= np.uint32(0x85EBCA6B)
        h1 ^= h1 >> np.uint32(13)
        h1 *= np.uint32(0xC2B2AE35)
        h1 ^= h1 >> np.uint32(16)
    return h1.view(np.int32)


def _hash_str(s: str) -> int:
    return murmur3_x86_32(s.encode("utf-8"), 0)


def composite_id_hash(doc_id: str, default_bits: int = 16) -> int:
    """Hash of a (possibly composite) unique key, Solr CompositeIdRouter style.

    - ``"doc"``            → murmur3(doc)
    - ``"shard!doc"``      → top ``bits`` bits of murmur3(shard) | low bits of
      murmur3(doc); ``bits`` defaults to 16 and can be set as ``"shard/8!doc"``
    - ``"a!b!c"``          → 8 bits of h(a), 8 bits of h(b), 16 bits of h(c)
      (Solr's tri-level default split)
    """
    if "!" not in doc_id:
        return _hash_str(doc_id)
    parts = doc_id.split("!")
    if len(parts) >= 3:
        a, b, c = parts[0], parts[1], "!".join(parts[2:])
        h = (
            (_hash_str(a) & 0xFF000000)
            | (_hash_str(b) & 0x00FF0000)
            | (_hash_str(c) & 0x0000FFFF)
        )
        return h - (1 << 32) if h >= (1 << 31) else h
    route, doc = parts[0], parts[1]
    bits = default_bits
    if "/" in route:
        maybe_route, bits_str = route.rsplit("/", 1)
        # only treat "/N" as a bits spec when N parses; a garbage suffix
        # stays part of the route key instead of failing the whole job
        # (Solr throws here — a pipeline engine degrades gracefully)
        if bits_str.isdigit():
            route, bits = maybe_route, min(int(bits_str), 32)
    if bits == 0:
        return _hash_str(doc)
    upper_mask = (_MASK32 << (32 - bits)) & _MASK32
    h = (_hash_str(route) & upper_mask) | (_hash_str(doc) & (_MASK32 >> bits))
    return h - (1 << 32) if h >= (1 << 31) else h


def partition_ranges(num_shards: int, bits: int = 16) -> list[tuple[int, int]]:
    """Split the signed 32-bit hash ring into ``num_shards`` contiguous
    inclusive ranges, Solr ``CompositeIdRouter.partitionRange`` semantics:
    even ``2^32/S`` steps, each boundary rounded to a 0x10000 multiple when
    the step is >= 2^bits * 16 (so co-routed composite ids never straddle a
    shard boundary)."""
    if num_shards <= 0:
        raise ValueError(f"num_shards must be > 0, got {num_shards}")
    # Solr parity notes (CompositeIdRouter.partitionRange semantics, observed
    # on live SolrCloud collections): the ring size is max-min = 2^32 - 1
    # (NOT 2^32 — e.g. 3 shards step by 0x55555555), the no-round condition is
    # "end already sits at a 0xFFFF boundary" ((end & mask) == mask), and the
    # round targets are (end | mask) ± 2^bits.  Getting any of these wrong
    # shifts boundaries by one 0x10000 block and mis-places keys hashing into
    # that block relative to a live SolrCloud cluster.
    range_size = (1 << 32) - 1
    range_step = max(1, range_size // num_shards)
    mask = (1 << bits) - 1
    do_round = range_step >= (1 << bits) * 16
    ranges: list[tuple[int, int]] = []
    start = INT_MIN
    end = INT_MIN
    target_start = INT_MIN
    while end < INT_MAX:
        target_end = target_start + range_step
        end = target_end
        if do_round and (end & mask) != mask:
            increment = 1 << bits
            round_down = (end | mask) - increment
            round_up = (end | mask) + increment
            if end - round_down < round_up - end and round_down > start:
                end = round_down
            else:
                end = round_up
        if len(ranges) == num_shards - 1:
            end = INT_MAX
        ranges.append((start, min(end, INT_MAX)))
        start = end + 1
        target_start = target_end + 1
    return ranges


@dataclass(frozen=True)
class ShardRouter:
    """Routes unique keys to shards / micro-shards with SolrCloud parity.

    ``num_partitions`` is the micro-shard count (the reference's reducer
    count); must be a multiple of ``shards``
    (SolrCloudCompositeIdRoutingPartitioner.java:87-90).
    """

    shards: int
    num_partitions: int | None = None
    _ranges: list[tuple[int, int]] = field(init=False, repr=False, default=None)  # type: ignore[assignment]

    def __post_init__(self) -> None:
        p = self.num_partitions if self.num_partitions is not None else self.shards
        if p % self.shards != 0:
            raise ValueError(
                f"num_partitions ({p}) must be a multiple of shards ({self.shards})"
            )
        object.__setattr__(self, "_ranges", partition_ranges(self.shards))

    @property
    def partitions(self) -> int:
        return self.num_partitions if self.num_partitions is not None else self.shards

    def shard_of(self, doc_id: str) -> int:
        """Root shard for a key — binary search over sorted hash ranges."""
        h = composite_id_hash(doc_id)
        starts = [r[0] for r in self._ranges]
        idx = bisect.bisect_right(starts, h) - 1
        lo, hi = self._ranges[idx]
        if not (lo <= h <= hi):  # pragma: no cover - ranges tile the ring
            raise AssertionError(f"hash {h} outside range {self._ranges[idx]}")
        return idx

    def micro_shard_of(self, doc_id: str) -> int:
        """Micro shard (reducer/partition number) for a key.

        Root shard placement uses the composite-spliced hash (co-routes
        ``shard!doc`` families); the offset WITHIN the root shard uses the
        murmur3 of the full key string — the reference hashes the raw key
        again for the reducer spread
        (SolrCloudCompositeIdRoutingPartitioner.java:91-92), so composite ids
        sharing a route key still fan out across that shard's reducers."""
        per_shard = self.partitions // self.shards
        root = self.shard_of(doc_id)
        h = _hash_str(doc_id)
        return root * per_shard + ((h & INT_MAX) % per_shard)


def shard_id_column(key: Column | str, shards: int, num_partitions: int | None = None) -> Column:
    """Column expression: SolrCloud-parity micro-shard id for a key column.

    Arrow-NATIVE scalar UDF (the hash is not expressible bit-exactly with
    builtin functions — Spark's ``hash()`` uses seed 42 and a different
    tail mix).  The kernel reads the Arrow string buffers directly
    (:func:`murmur3_x86_32_arrow`), so no per-row Python string is ever
    constructed on the plain-id fast path — the pandas_udf predecessor
    materialized every key as a Python str on both the Arrow→pandas and
    the ``astype(str)``/``str.contains`` steps (r14, guide §4.1/§4.3).
    Returns int32.
    """
    from pyspark.sql.functions import arrow_udf

    router = ShardRouter(shards=shards, num_partitions=num_partitions)
    starts = [r[0] for r in router._ranges]
    starts_arr = np.array(starts, dtype=np.int64)
    per_shard = router.partitions // router.shards

    @arrow_udf(IntegerType())
    def _route(ids: pa.Array) -> pa.Array:
        # Null/type parity with the pandas predecessor: a NULL key hashed
        # as the string "None" (pandas astype(str)), non-string inputs as
        # their string rendering (all library callers cast JVM-side).
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        if not pa.types.is_large_string(ids.type):
            ids = ids.cast(pa.large_string())
        if ids.null_count:
            ids = ids.fill_null("None")
        raw = murmur3_x86_32_arrow(ids).astype(np.int64)
        hashes = raw
        # composite "shard!doc" ids (rare): '!' is 0x21, a single UTF-8
        # byte that never occurs inside a multi-byte sequence, so one
        # vectorized scan of the flat buffer flags the batch; only then
        # are the affected rows materialized for the spliced hash.  The
        # root shard uses the composite-spliced hash; the within-shard
        # offset always uses the full-key murmur3 (the raw batch hash),
        # matching micro_shard_of.
        offsets, flat = _utf8_flat(ids)
        bang = np.flatnonzero(flat == 0x21)
        if bang.size:
            rows = np.unique(np.searchsorted(offsets, bang, side="right") - 1)
            hashes = raw.copy()
            fixes = [composite_id_hash(ids[int(i)].as_py()) for i in rows]
            hashes[rows] = np.array(fixes, dtype=np.int64)
        roots = np.searchsorted(starts_arr, hashes, side="right") - 1
        micro = roots * per_shard + ((raw & INT_MAX) % per_shard)
        return pa.array(micro.astype(np.int32), type=pa.int32())

    return _route(F.col(key) if isinstance(key, str) else key)


def with_shard_id(
    df,
    key: str,
    shards: int,
    num_partitions: int | None = None,
    out_col: str = "_shard",
):
    """Attach the routing column.  Downstream the index writer partitions the
    artifact by this column (``write.partitionBy(out_col)``), which gives
    partition pruning on point lookups for free."""
    return df.withColumn(
        out_col, shard_id_column(F.col(key).cast("string"), shards, num_partitions)
    )
