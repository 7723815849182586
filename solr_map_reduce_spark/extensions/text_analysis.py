"""Text analysis for training-data pipelines: language ID, quality scoring,
token counting, document fingerprinting.

Everything here is built from ``pyspark.sql.functions`` only — JVM-side,
whole-stage-codegen'd, no Python in the hot path — and each op has an exact
ANSI-SQL equivalent so the DuckDB oracle can replay it.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from solr_map_reduce_spark.functions.analyzers import ENGLISH_STOP_WORDS

# Tiny high-frequency stopword probes per language (function words only).
LANG_PROBES: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "for", "with", "as"),
    "es": ("el", "la", "de", "que", "y", "los", "del", "las", "por", "un"),
    "fr": ("le", "la", "les", "des", "et", "un", "une", "du", "est", "dans"),
    "de": ("der", "die", "das", "und", "ist", "von", "den", "mit", "des", "ein"),
}


def tokens(col: F.Column) -> F.Column:
    from solr_map_reduce_spark.extensions.text_dedup import tokens_column

    return tokens_column(col)


def ws_tokens(col: F.Column) -> F.Column:
    """Whitespace-split words (the shared token expression behind
    token_count / gopher_rules / chunk_documents — ONE definition so the
    empty/whitespace edge semantics and the DuckDB-oracle mirror can
    never diverge between ops).  Strip-then-split stays in codegen."""
    stripped = F.regexp_replace(col, r"^\s+|\s+$", "")
    return F.when(stripped == "", F.array().cast("array<string>")).otherwise(
        F.split(stripped, r"\s+")
    )


def token_count(col: F.Column) -> F.Column:
    """Whitespace-token count (long)."""
    return F.size(ws_tokens(col)).cast("long")


def word_token_count(col: F.Column) -> F.Column:
    """Letter/digit-run token count (long)."""
    return F.size(tokens(col)).cast("long")


# GPT-2-style pre-tokenizer pattern (Radford et al. 2019, public): English
# contractions, optionally-space-prefixed letter runs / digit runs /
# punctuation runs.  Counting these pre-tokens tracks BPE token counts
# closely enough for corpus budgeting without a vocab.
BPE_PRETOKEN_PATTERN = r"'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+"


def bpe_token_count(col: F.Column) -> F.Column:
    """BPE-ish pre-token count via the GPT-2 split regex (long, JVM-side)."""
    return F.size(F.regexp_extract_all(col, F.lit(BPE_PRETOKEN_PATTERN), 0)).cast(
        "long"
    )


def quality_features(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document quality features + a composite score in [0,1].

    Features: length, token count, alpha ratio, digit ratio, whitespace
    ratio, mean token length, stopword ratio.  The score is a deterministic
    hand-weighted combination (a heuristic filter, not a model).
    """
    t = F.col(text_col)
    n = F.length(t).cast("double")
    alpha = F.length(F.regexp_replace(t, r"[^A-Za-z]", "")).cast("double")
    digit = F.length(F.regexp_replace(t, r"[^0-9]", "")).cast("double")
    space = F.length(F.regexp_replace(t, r"[^ \t\n]", "")).cast("double")
    toks = tokens(t)
    ntok = F.size(toks).cast("double")
    stops = F.array(*[F.lit(w) for w in sorted(ENGLISH_STOP_WORDS)])
    nstop = F.size(F.filter(toks, lambda x: F.array_contains(stops, x))).cast("double")
    safe = F.when(n > 0, n).otherwise(F.lit(1.0))
    safe_tok = F.when(ntok > 0, ntok).otherwise(F.lit(1.0))
    alpha_ratio = alpha / safe
    mean_tok_len = (alpha + digit) / safe_tok
    stop_ratio = nstop / safe_tok
    score = (
        F.least(ntok / F.lit(20.0), F.lit(1.0)) * F.lit(0.4)
        + alpha_ratio * F.lit(0.4)
        + F.least(stop_ratio * F.lit(4.0), F.lit(1.0)) * F.lit(0.2)
    )
    return df.select(
        F.col(id_col),
        n.cast("long").alias("n_chars"),
        ntok.cast("long").alias("n_tokens"),
        alpha_ratio.alias("alpha_ratio"),
        (digit / safe).alias("digit_ratio"),
        (space / safe).alias("space_ratio"),
        mean_tok_len.alias("mean_token_len"),
        stop_ratio.alias("stopword_ratio"),
        score.alias("quality_score"),
    )


# The 8 "must contain >= 2" words from the published Gopher quality rules
# (Rae et al. 2021, "Scaling Language Models: ... Gopher", App. A1.1).
GOPHER_STOP_PROBE = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_rules(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    max_words: int = 100_000,
) -> DataFrame:
    """The published Gopher document-quality rules (Rae et al. 2021,
    App. A1.1) as one JVM-expression pass — per document, every rule's
    measurement plus the combined ``passes`` verdict:

    - word count in [min_words, max_words]
    - mean word length in [3, 10]
    - symbol-to-word ratio (# or ellipsis) <= 0.1
    - <= 90% of lines start with a bullet
    - <= 30% of lines end with an ellipsis
    - >= 80% of words contain an alphabetic character
    - >= 2 of the 8 probe stop words present

    Everything is built from builtin SQL functions (whole-stage codegen;
    the two higher-order ``filter`` lambdas are per-line/per-word
    predicates over already-split arrays), so at 100 TB this is a single
    map-only scan with full column pruning — no shuffle, no Python.

    NULL text reads as an empty document (n_words 0, ``passes`` False) —
    a row must never carry a NULL verdict that escapes both the pass and
    the fail gate."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    words = ws_tokens(t)
    n_words = F.size(words).cast("long")
    safe_w = F.when(n_words > 0, n_words.cast("double")).otherwise(F.lit(1.0))
    # sum of word lengths == non-whitespace characters (words are the
    # whitespace split) — keeps the mean in codegen, no aggregate lambda
    nonspace = F.length(F.regexp_replace(t, r"\s+", "")).cast("double")
    mean_word_len = nonspace / safe_w
    n_hash = (F.length(t) - F.length(F.regexp_replace(t, r"#", ""))).cast("double")
    n_ellipsis = F.size(F.regexp_extract_all(t, F.lit(r"\.\.\."), 0)).cast("double")
    symbol_ratio = (n_hash + n_ellipsis) / safe_w
    lines = F.filter(F.split(t, r"\n"), lambda x: F.trim(x) != "")
    n_lines = F.size(lines).cast("double")
    safe_l = F.when(n_lines > 0, n_lines).otherwise(F.lit(1.0))
    bullet_frac = (
        F.size(
            F.filter(
                lines,
                lambda x: F.trim(x).startswith("•")
                | F.trim(x).startswith("-")
                | F.trim(x).startswith("*"),
            )
        ).cast("double")
        / safe_l
    )
    ellipsis_frac = (
        F.size(F.filter(lines, lambda x: F.trim(x).endswith("..."))).cast("double")
        / safe_l
    )
    alpha_frac = (
        F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]"))).cast("double")
        / safe_w
    )
    toks = tokens(t)
    stop_hits = F.size(
        F.array_intersect(
            F.array_distinct(toks), F.array(*[F.lit(w) for w in GOPHER_STOP_PROBE])
        )
    ).cast("long")
    passes = (
        (n_words >= min_words)
        & (n_words <= max_words)
        & (mean_word_len >= 3.0)
        & (mean_word_len <= 10.0)
        & (symbol_ratio <= 0.1)
        & (bullet_frac <= 0.9)
        & (ellipsis_frac <= 0.3)
        & (alpha_frac >= 0.8)
        & (stop_hits >= 2)
    )
    return df.select(
        F.col(id_col),
        n_words.alias("n_words"),
        mean_word_len.alias("mean_word_len"),
        symbol_ratio.alias("symbol_word_ratio"),
        bullet_frac.alias("bullet_line_frac"),
        ellipsis_frac.alias("ellipsis_line_frac"),
        alpha_frac.alias("alpha_word_frac"),
        stop_hits.alias("stop_hits"),
        passes.alias("passes"),
    )


def lang_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """N-gram/stopword-probe language ID.

    Scores each language by distinct probe-word hits in the token set; CJK
    short-circuits on codepoint class.  Returns (id, lang_pred, lang_score).
    Deterministic ties: language name order.
    """
    toks = F.array_distinct(tokens(F.col(text_col)))
    scores = {
        lang: F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in probes])))
        for lang, probes in LANG_PROBES.items()
    }
    has_cjk = F.length(F.regexp_replace(F.col(text_col), r"[^一-鿿]", "")) > 0
    best_score = F.greatest(*scores.values())
    pred = F.lit("und")
    for lang in sorted(LANG_PROBES, reverse=True):
        pred = F.when(scores[lang] == best_score, F.lit(lang)).otherwise(pred)
    pred = F.when(has_cjk, F.lit("zh")).otherwise(
        F.when(best_score > 0, pred).otherwise(F.lit("und"))
    )
    return df.select(
        F.col(id_col),
        pred.alias("lang_pred"),
        best_score.cast("long").alias("lang_score"),
    )


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Key-collision fingerprint (normalize → sort unique tokens → digest):
    documents with the same fingerprint are permutations/duplicates of the
    same bag of words.  (id, fingerprint)."""
    fp = F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(tokens(F.col(text_col))))))
    return df.select(F.col(id_col), fp.alias("fingerprint"))


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 128,
    overlap: int = 32,
) -> DataFrame:
    """Split each document into overlapping token windows — the standard
    long-document splitting stage upstream of sequence packing (a doc
    longer than the model context becomes stride-spaced windows so no
    span is lost at a window boundary).

    Windows are whitespace-token slices of ``chunk_tokens`` tokens with
    ``overlap`` tokens shared between neighbors (stride = chunk_tokens -
    overlap); the final window is shorter, never dropped; empty documents
    yield no chunks.  Returns ``(id, chunk_idx, chunk_text, n_tokens)``.

    Scale shape: pure builtin expressions (split → sequence → posexplode
    → slice), one map-side pass, no shuffle, no Python — output rows are
    bounded by total-token-count / stride."""
    if overlap >= chunk_tokens:
        raise ValueError(
            f"overlap ({overlap}) must be < chunk_tokens ({chunk_tokens})"
        )
    if overlap < 0:
        # a negative overlap makes stride > chunk_tokens: windows would
        # SKIP tokens between neighbors — silently violating the
        # no-span-lost contract this op exists for
        raise ValueError(f"overlap ({overlap}) must be >= 0")
    stride = chunk_tokens - overlap
    toks = ws_tokens(F.col(text_col))
    n = F.size(toks).cast("long")
    n_chunks = (
        F.when(n <= 0, F.lit(0))
        .when(n <= chunk_tokens, F.lit(1))
        .otherwise(
            ((n - chunk_tokens + stride - 1) / stride).cast("long") + 1
        )
    )
    staged = df.select(
        F.col(id_col), toks.alias("_toks"), n_chunks.alias("_nc")
    ).filter(F.col("_nc") > 0)
    exploded = staged.select(
        F.col(id_col),
        F.posexplode(F.sequence(F.lit(0), F.col("_nc") - 1)).alias(
            "chunk_idx", "_i"
        ),
        F.col("_toks"),
    )
    window = F.slice(
        F.col("_toks"), F.col("_i") * stride + 1, chunk_tokens
    )
    return exploded.select(
        F.col(id_col),
        F.col("chunk_idx"),
        F.concat_ws(" ", window).alias("chunk_text"),
        F.size(window).cast("long").alias("n_tokens"),
    )


def pack_weights(weights, budget: int):
    """The greedy packing kernel: given per-item weights in pack order,
    return the chunk id for each item.  A new chunk starts when adding the
    item would push the running total past ``budget``; an oversized single
    item occupies a chunk alone.  Pure function — property-tested without a
    SparkSession."""
    import numpy as np

    chunks = np.empty(len(weights), dtype=np.int64)
    chunk, filled = 0, 0
    for i, x in enumerate(weights):
        if i > 0 and filled + x > budget:
            chunk += 1
            filled = x
        else:
            filled += x
        chunks[i] = chunk
    return chunks


def pack_sequences(
    df: DataFrame,
    weight_col: str = "n_chars",
    budget: int = 4000,
    group_cols: tuple[str, ...] = ("lang",),
    order_col: str = "doc_id",
    out_col: str = "chunk",
) -> DataFrame:
    """Greedy sequence packing: walk each group in ``order_col`` order and
    assign documents to consecutive chunks, starting a new chunk when the
    running ``weight_col`` total would exceed ``budget`` — the
    fill-the-context-window step that turns a curated corpus into training
    sequences.  An oversized single document gets a chunk to itself.

    Packing is inherently sequential per group (each assignment depends on
    the running total), so it runs as ``applyInPandas`` over ``group_cols``:
    one shuffle, then an O(n) walk per group.  At 100 TB, group by
    (stratum, shard) rather than stratum alone so no single group serializes
    a terabyte through one task — packing quality is unaffected because
    chunks never span groups anyway.

    Returns ``group_cols + (order_col, weight_col, out_col)``; chunk ids are
    dense per group starting at 0.
    """
    import pandas as pd

    out_fields = [df.schema[c] for c in (*group_cols, order_col, weight_col)]
    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in out_fields)
    schema += f", {out_col} bigint"

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col, kind="mergesort")
        out = pdf[[*group_cols, order_col, weight_col]].copy()
        out[out_col] = pack_weights(pdf[weight_col].to_numpy(), budget)
        return out

    cols = [*group_cols, order_col, weight_col]
    return (
        df.select(*cols)
        .groupBy(*group_cols)
        .applyInPandas(_pack, schema=schema)
    )


# PII scrub patterns, restricted to syntax shared by Java regex (Spark) and
# RE2 (DuckDB oracle): no lookaround, no backreferences.  Order matters only
# for overlapping matches; these three are disjoint by construction.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+\d[\d ()-]{7,}\d", "<PHONE>"),
)


def redact_pii(col: F.Column) -> F.Column:
    """Replace email addresses, IPv4 addresses, and international-format
    phone numbers with typed placeholder tokens — the curation scrub pass.
    Pure ``regexp_replace`` chain: JVM-side, codegen'd, no UDF."""
    for _, pattern, token in PII_PATTERNS:
        col = F.regexp_replace(col, pattern, token)
    return col


def redact_pii_sql(expr: str) -> str:
    """The DuckDB-equivalent expression for :func:`redact_pii` (RE2 needs the
    explicit 'g' flag for replace-all)."""
    for _, pattern, token in PII_PATTERNS:
        escaped = pattern.replace("'", "''")
        expr = f"regexp_replace({expr}, '{escaped}', '{token}', 'g')"
    return expr


def repetition_score(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3
) -> DataFrame:
    """Intra-document repetition: the fraction of word n-grams that are
    duplicates of an earlier n-gram in the same document — the
    repeated-passage signal quality filters threshold on (high values mean
    boilerplate/degenerate text).  Pure array expressions, whole-stage
    codegen, no shuffle: ``(id, total_ngrams, dup_frac)``.
    """
    toks = tokens(F.col(text_col))
    gram = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(toks, i + j) for j in range(n)]
    )
    # guard: sequence(1, 0) would DESCEND to [1, 0] and index out of range
    grams = F.when(
        F.size(toks) >= n,
        F.transform(F.sequence(F.lit(1), F.size(toks) - (n - 1)), gram),
    ).otherwise(F.array().cast("array<string>"))
    total = F.size(grams)
    uniq = F.size(F.array_distinct(grams))
    return df.select(
        F.col(id_col),
        total.cast("long").alias("total_ngrams"),
        F.when(total == 0, F.lit(0.0))
        .otherwise((total - uniq).cast("double") / total)
        .alias("dup_frac"),
    )


def cap_per_group(
    df: DataFrame,
    group_col: str,
    order_col: str,
    n: int,
    tiebreak_col: str | None = None,
    descending: bool = True,
) -> DataFrame:
    """Deterministic per-group document cap — the per-domain cap of web
    curation pipelines (keep at most ``n`` docs per source/domain, best
    first), distinct from probabilistic stratified sampling.

    One shuffle keyed on the group column (a window row_number).  Skew
    note: a single hot domain serializes into one task's sort; at 100 TB
    with pathological domains, pre-filter with an approximate per-group
    quantile threshold (operators/stats) so the window only ranks
    survivors.
    """
    from pyspark.sql import Window

    order = [F.desc(order_col) if descending else F.asc(order_col)]
    if tiebreak_col:
        order.append(F.asc(tiebreak_col))
    w = Window.partitionBy(group_col).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n)
        .drop("_rn")
    )


# Regex for tracking query parameters (matched against one `k=v` token,
# anchored at the key): the standard C4/CCNet-style canonicalize-before-
# URL-dedup scrub list.
TRACKING_PARAM_RE = r"^(utm_[^=]*|fbclid|gclid|msclkid|yclid|ref|ref_src)(=|$)"
_URL_PREFIX_RE = r"^[a-zA-Z][a-zA-Z0-9+.\-]*://[^/?#]*"


def normalize_url(col: F.Column) -> F.Column:
    """Canonical form of a URL column: strip the ``#fragment``, lowercase
    the ``scheme://host`` prefix (path/query keep their case — they are
    case-sensitive per RFC 3986), drop tracking query parameters
    (``utm_*``, ``fbclid``, ``gclid``, ``msclkid``, ``yclid``, ``ref``),
    and drop a query string that emptied out.  Web-crawl curation dedups
    on this canonical URL before any content pass (the C4/CCNet URL-dedup
    stage).  Pure JVM string expressions — no UDF."""
    u = F.regexp_replace(col, r"#.*$", "")
    prefix = F.regexp_extract(u, _URL_PREFIX_RE, 0)
    lowered = F.concat(F.lower(prefix), u.substr(F.length(prefix) + 1, F.lit(1 << 30)))
    base = F.regexp_extract(lowered, r"^[^?]*", 0)
    query = F.regexp_extract(lowered, r"\?(.*)$", 1)
    kept = F.filter(
        F.split(query, "&"),
        lambda p: (~p.rlike(TRACKING_PARAM_RE)) & (p != ""),
    )
    return F.when(
        F.size(kept) > 0, F.concat(base, F.lit("?"), F.array_join(kept, "&"))
    ).otherwise(base)


def url_dedup(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """URL-keyed exact dedup: canonicalize with :func:`normalize_url`,
    keep the smallest id per canonical URL (deterministic first-wins), and
    report the duplicate count.  Returns (canonical_url, keep_id, n_dupes).

    Scale shape: one hash aggregation on the canonical URL — only
    (url, id) pairs shuffle, never documents; the canonicalization itself
    is codegen'd into the scan projection."""
    return (
        df.select(normalize_url(F.col(url_col)).alias("canonical_url"), F.col(id_col))
        .groupBy("canonical_url")
        .agg(
            F.min(id_col).alias("keep_id"),
            (F.count(F.lit(1)) - 1).alias("n_dupes"),
        )
    )


def c4_line_filter(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 3,
    min_kept_lines: int = 1,
) -> DataFrame:
    """The C4 line-level cleaning pass (Raffel et al. 2020, the published
    C4 recipe): keep only lines that end in a terminal punctuation mark,
    have at least ``min_words`` words, and do not contain the boilerplate
    markers (``javascript``/``cookie``/``lorem ipsum``); drop documents
    left with fewer than ``min_kept_lines`` surviving lines.  Returns
    (id, clean_text, n_lines_kept, n_lines_dropped).

    Entirely JVM array/string expressions over a line split — no UDF, no
    extra shuffle (a narrow projection; the filter composes into the
    scan's projection at any scale)."""
    lines = F.split(F.col(text_col), "\n")

    def _keep(line):
        t = F.trim(line)
        return (
            t.rlike(r'[.!?"]$')
            & (F.size(F.split(t, r"\s+")) >= min_words)
            & ~F.lower(t).rlike("javascript|lorem ipsum|cookie")
        )

    kept = F.filter(lines, _keep)
    out = df.select(
        F.col(id_col),
        F.array_join(kept, "\n").alias("clean_text"),
        F.size(kept).cast("long").alias("n_lines_kept"),
        (F.size(lines) - F.size(kept)).cast("long").alias("n_lines_dropped"),
    )
    return out.filter(F.col("n_lines_kept") >= min_kept_lines)


def hash_split(
    df: DataFrame,
    key_col: str = "doc_id",
    weights: dict[str, float] | None = None,
    buckets: int = 10_000,
    out_col: str = "split",
) -> DataFrame:
    """Deterministic, key-stable train/val/test assignment: the key's md5
    (first 8 hex digits → integer, mod ``buckets``) lands in cumulative
    weight ranges.  The split is a pure function of the key — re-running,
    appending data, or changing partitioning never moves a document
    between splits (the property random() splits lack), and the SAME rule
    is expressible in any engine with md5 (DuckDB-oracled bit-for-bit).
    Codegen'd string/arith expressions — no UDF, no shuffle."""
    weights = weights or {"train": 0.8, "val": 0.1, "test": 0.1}
    total = sum(weights.values())
    bucket = (
        F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 8), 16, 10)
        .cast("long") % buckets
    )
    expr = None
    acc = 0.0
    for name, w in weights.items():
        acc += w / total
        hi = int(round(acc * buckets))
        cond = bucket < hi
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return df.withColumn(out_col, expr.otherwise(list(weights)[-1]))


def unigram_surprisal(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lm_df: DataFrame | None = None,
    lm_text_col: str | None = None,
) -> DataFrame:
    """Perplexity-PROXY quality scoring with a corpus unigram LM — the
    cheap stand-in for KenLM-style perplexity filtering (CCNet/Gopher use
    an LM over a reference corpus to rank documents; a unigram model
    captures the same "how ordinary are these words" signal with plain
    aggregates).  Returns ``(id, n_tokens, surprisal)`` where
    ``surprisal`` is the mean per-token negative log Laplace-smoothed
    probability ``-ln((cnt_t + 1) / (N + V))`` — perplexity =
    ``exp(surprisal)``; HIGHER = rarer vocabulary.

    ``lm_df`` scores ``df`` under a DIFFERENT corpus's distribution
    (train the LM on held-out reference text, score the crawl — the
    CCNet recipe); unseen tokens get the smoothed OOV mass ``1/(N+V)``.

    100 TB shape: the LM is ONE explode + map-side-combined groupBy
    (token counts); scoring joins the exploded (id, token) stream with
    the count table on the token key — AQE picks broadcast when the
    vocabulary fits, sort-merge otherwise — then one avg by id.  No
    Python anywhere."""
    lm_src = lm_df if lm_df is not None else df
    lm_toks = tokens(F.col(lm_text_col or text_col))
    vocab = (
        lm_src.select(F.explode(lm_toks).alias("_t"))
        .groupBy("_t")
        .agg(F.count(F.lit(1)).alias("_cnt"))
    )
    totals = vocab.agg(
        F.sum("_cnt").alias("_n"), F.count(F.lit(1)).alias("_v")
    )
    doc_toks = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("_t")
    )
    scored = (
        doc_toks.join(vocab, "_t", "left")
        .join(F.broadcast(totals))
        .select(
            id_col,
            (
                -F.log(
                    (F.coalesce(F.col("_cnt"), F.lit(0)) + F.lit(1.0))
                    / (F.col("_n") + F.col("_v"))
                )
            ).alias("_s"),
        )
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.avg("_s").alias("surprisal"),
        )
    )


def bigram_surprisal(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lm_df: DataFrame | None = None,
    lm_text_col: str | None = None,
) -> DataFrame:
    """Conditional (bigram) perplexity proxy — one step closer to the
    KenLM-style filter than :func:`unigram_surprisal`: scores how
    ordinary each word is GIVEN its predecessor, so word-salad text with
    common words but improbable transitions ranks high.  Returns
    ``(id, n_bigrams, surprisal)`` with
    ``-ln p(w2|w1) = -ln((c(w1,w2) + 1) / (c(w1) + V))`` (Laplace)
    averaged over the document's bigrams; unseen transitions get the
    smoothed ``1/(c(w1)+V)`` mass (``c(w1)=0`` for OOV contexts).
    Single-token documents have no bigrams and drop out.

    100 TB shape: the LM is one explode into (w1, w2) pairs + two
    map-side-combined counts (bigram, unigram-context); scoring joins
    the exploded bigram stream on the pair key then the context key —
    AQE broadcasts small models — then one avg by id.  No Python."""
    lm_src = lm_df if lm_df is not None else df

    def _bigrams(toks_expr: F.Column) -> F.Column:
        # clamp at 0: slice() throws on negative length, and an empty /
        # punctuation-only document has zero tokens (same guard as
        # shingles_column)
        n = F.greatest(F.size(toks_expr) - 1, F.lit(0))
        return F.arrays_zip(
            F.slice(toks_expr, 1, n).alias("w1"),
            F.slice(toks_expr, 2, n).alias("w2"),
        )

    lm_toks = tokens(F.col(lm_text_col or text_col))
    lm_pairs = lm_src.select(F.explode(_bigrams(lm_toks)).alias("_p")).select(
        F.col("_p.w1").alias("_w1"), F.col("_p.w2").alias("_w2")
    )
    bi = lm_pairs.groupBy("_w1", "_w2").agg(F.count(F.lit(1)).alias("_c12"))
    uni = (
        lm_src.select(F.explode(lm_toks).alias("_w1"))
        .groupBy("_w1")
        .agg(F.count(F.lit(1)).alias("_c1"))
    )
    totals = uni.agg(F.count(F.lit(1)).alias("_v"))
    doc_pairs = df.select(
        F.col(id_col), F.explode(_bigrams(tokens(F.col(text_col)))).alias("_p")
    ).select(
        id_col, F.col("_p.w1").alias("_w1"), F.col("_p.w2").alias("_w2")
    )
    scored = (
        doc_pairs.join(bi, ["_w1", "_w2"], "left")
        .join(uni, "_w1", "left")
        .join(F.broadcast(totals))
        .select(
            id_col,
            (
                -F.log(
                    (F.coalesce(F.col("_c12"), F.lit(0)) + F.lit(1.0))
                    / (F.coalesce(F.col("_c1"), F.lit(0)) + F.col("_v"))
                )
            ).alias("_s"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.avg("_s").alias("surprisal"),
    )
