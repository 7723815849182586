"""Text-classification tier: Solr's ``features()`` / ``train()`` /
``classify()`` / ``model()`` stream surface, re-expressed Spark-first.

Solr exposes corpus-scale text classification through four /stream
functions (ref guide "Stream Sources" / "Stream Decorators"):
``features()`` (FeaturesSelectionStream — information-gain term
selection), ``train()`` (TextLogitStream — batch logistic regression
over term features, one tuple per iteration), ``model()`` (fetch the
latest stored model by name) and ``classify()`` (score a stream of
documents against a model).  The reference repo itself has no ML tier
(it is an indexing pipeline); this module extends the engine's /stream
surface with the same request shapes because a quality classifier over
a document corpus is a core LLM-training-data operation.

As with ``significantTerms()``, the REQUEST SHAPE is Solr's while the
numeric FORMULAS are ours and pinned here (Solr's internals hide
undocumented constants):

- feature score: information gain ``IG(t) = H(C) - H(C|t)`` over the
  binary outcome, with ``0·log0 = 0`` (natural log);
- ``idf(t) = ln((n_docs + 1) / (df_t + 1))`` over the selection domain;
- document feature value: ``x_t = idf(t)`` when the (analyzed,
  deduplicated) token is present, else 0, plus an intercept of 1;
- training: full-batch gradient descent on mean logistic loss,
  ``w ← w - alpha · Xᵀ(sigmoid(Xw) - y) / n``, reported ``error`` is
  the mean log loss and ``accuracy`` the 0.5-threshold accuracy.

Scale shape (the part that must survive 100 TB):

- ``select_features``: one map-side-combined groupBy(term) over the
  exploded (doc, distinct-term) pairs (the shuffle is bounded by the
  vocabulary) plus a 1-row (n_docs, n_pos) scalar aggregate over the
  same pruned scan, broadcast-crossJoined on; the top-N cut is
  TakeOrdered.  (A rollup-with-countDistinct single pass would pay
  Catalyst's distinct Expand ×3 over every exploded pair — measured
  strictly worse than the second scalar pass.)
- ``train_logistic``: per iteration ONE map-only pass (the margin is a
  ``F.aggregate`` fold over the feature-intersected token array against
  a broadcast weight-map literal — no join, no shuffle) plus ONE
  groupBy(term) whose map-side-combined output is ≤ num_terms + 1 rows
  (a ``__bias__`` sentinel row carries the intercept gradient, loss and
  accuracy, so there is no second doc-level aggregation).  Only that
  tiny gradient vector is ever collected; the feature projection is
  persisted once across iterations.
- ``classify_df``: map-only — one codegen'd Column over the stream.

Everything stays JVM-side; no Python runs per row anywhere.
"""

from __future__ import annotations

import math
from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_BIAS = "__bias__"


def _h(p: Column) -> Column:
    """Binary entropy of a proportion Column, natural log, 0·log0 = 0."""

    def xlogx(x: Column) -> Column:
        return F.when(x > 0, x * F.log(x)).otherwise(F.lit(0.0))

    return -(xlogx(p) + xlogx(F.lit(1.0) - p))


def _outcome_col(outcome: str, positive_label) -> Column:
    return (F.col(outcome) == F.lit(positive_label)).cast("int")


def select_features(
    src,
    outcome: str,
    field: str | None = None,
    q: str = "*:*",
    num_terms: int = 250,
    positive_label=1,
    min_df: int = 1,
) -> DataFrame:
    """Solr ``features()``: the ``num_terms`` terms of the analyzed
    ``field`` with the highest information gain for predicting
    ``outcome == positive_label`` over the docs matching ``q``.

    Returns (term, index, score, idf, df, pos_df) ordered by score desc
    (term asc tiebreak), ``index`` 0-based in that order — the shape
    ``train_logistic`` consumes.  ``score`` and ``idf`` are rounded to
    10 decimals so the result is hash-stable across engines.
    """
    fg = src._query_scan(q) if q != "*:*" else src.df()
    tc = src._tokens_col(field)
    y = _outcome_col(outcome, positive_label)
    # Two map-side-combined aggregations over the same pruned scan: the
    # per-term (df, pos-df) groupBy (ONE exchange, bounded by the
    # vocabulary after map-side combine) and a 1-row (n_docs, n_pos)
    # doc-count broadcast-crossJoined on.  A single rollup with
    # countDistinct totals would pay Catalyst's distinct Expand (×3
    # rows through the exploded pairs) — strictly worse than this
    # second scalar pass over the column-pruned scan.
    pairs = fg.select(
        y.alias("_y"),
        F.explode(F.array_distinct(src._real_toks(tc))).alias("term"),
    )
    agg = pairs.groupBy("term").agg(
        F.count(F.lit(1)).alias("_df"),
        F.sum("_y").alias("_pos"),
    )
    totals = F.broadcast(
        fg.agg(
            F.count(F.lit(1)).cast("double").alias("_nd"),
            F.coalesce(F.sum(y), F.lit(0)).cast("double").alias("_pd"),
        )
    )
    terms = (
        agg.filter(F.col("term").isNotNull())
        .filter(F.col("_df") >= int(min_df))
        .select(
            "term",
            F.col("_df").cast("double").alias("_dfd"),
            F.col("_pos").cast("double").alias("_posd"),
        )
        .crossJoin(totals)
    )
    n, p, df_t, pos_t = (
        F.col("_nd"), F.col("_pd"), F.col("_dfd"), F.col("_posd"),
    )
    h_c = _h(p / n)
    h_present = F.when(df_t > 0, _h(pos_t / df_t)).otherwise(F.lit(0.0))
    h_absent = F.when(
        n - df_t > 0, _h((p - pos_t) / (n - df_t))
    ).otherwise(F.lit(0.0))
    ig = h_c - ((df_t / n) * h_present + ((n - df_t) / n) * h_absent)
    idf = F.log((n + 1.0) / (df_t + 1.0))
    top = (
        terms.select(
            "term",
            F.round(ig, 10).alias("score"),
            F.round(idf, 10).alias("idf"),
            F.col("_dfd").cast("long").alias("df"),
            F.col("_posd").cast("long").alias("pos_df"),
        )
        .orderBy(F.desc("score"), F.asc("term"))
        .limit(int(num_terms))
    )
    # index over the already-bounded top-N only (single-partition window
    # over <= num_terms rows — never the vocabulary)
    w = Window.orderBy(F.desc("score"), F.asc("term"))
    return top.select(
        "term",
        (F.row_number().over(w) - 1).alias("index"),
        "score", "idf", "df", "pos_df",
    )


def _collect_features(features) -> list[tuple[str, float]]:
    """(term, idf) pairs from a features() DataFrame (bounded: the
    caller selected num_terms) or any (term, idf) sequence."""
    if isinstance(features, DataFrame):
        # pin the weight-vector ordering explicitly (collect order is
        # not a DataFrame contract): features() index when present,
        # else term
        order = "index" if "index" in features.columns else "term"
        rows = features.orderBy(order).select("term", "idf").collect()
        return [(r[0], float(r[1])) for r in rows]
    return [(str(t), float(i)) for t, i in features]


def _margin_col(
    toks: Column, w0: float, wmap_items: list[tuple[str, float]]
) -> Column:
    """w0 + Σ_{t ∈ toks ∩ features} w_t·idf_t as ONE codegen fold: the
    weight·idf products ship as a broadcast map literal, the presence
    test and sum run inside ``F.aggregate`` over the (deduplicated)
    token array — map-only, no join, no shuffle."""
    if not wmap_items:
        return F.lit(float(w0))
    wmap = F.create_map(
        *[F.lit(v) for kv in wmap_items for v in kv]
    )
    return F.aggregate(
        F.array_distinct(toks),
        F.lit(float(w0)),
        lambda acc, t: acc + F.coalesce(
            F.element_at(wmap, t), F.lit(0.0)
        ),
    )


def train_logistic(
    src,
    features,
    outcome: str,
    field: str | None = None,
    q: str = "*:*",
    max_iterations: int = 25,
    alpha: float = 0.5,
    positive_label=1,
    name: str = "model",
) -> DataFrame:
    """Solr ``train()``: full-batch logistic regression over the
    information-gain features, one output row per iteration —
    (name, iteration, error, accuracy, alpha, terms, weights, idfs)
    where ``weights[0]`` is the intercept and ``weights[i+1]`` pairs
    with ``terms[i]``/``idfs[i]`` (Solr's model-tuple shape).

    Iterative by nature (each step needs the previous weights), so each
    iteration runs one bounded Spark action: a map-only margin pass
    fused into ONE groupBy(term) over the feature-intersected exploded
    tokens, whose map-side-combined result is ≤ len(features)+1 rows
    (the ``__bias__`` sentinel row carries the intercept gradient, the
    mean log loss and the accuracy — no separate doc-level scan).  Only
    that gradient vector is collected; the feature projection is
    computed once and persisted across iterations.
    """
    feats = _collect_features(features)
    if not feats:
        raise ValueError("train() needs at least one feature term")
    terms = [t for t, _ in feats]
    idfs = [i for _, i in feats]
    fg = src._query_scan(q) if q != "*:*" else src.df()
    tc = src._tokens_col(field)
    y = _outcome_col(outcome, positive_label).cast("double")
    terms_lit = F.array(*[F.lit(t) for t in terms])
    prepared = fg.select(
        y.alias("_y"),
        F.array_intersect(
            F.array_distinct(src._real_toks(tc)), terms_lit
        ).alias("_feats"),
    ).persist()
    try:
        w0 = 0.0
        w = [0.0] * len(terms)
        history: list[tuple] = []
        eps = F.lit(1e-15)
        for it in range(1, int(max_iterations) + 1):
            margin = _margin_col(
                F.col("_feats"), w0,
                [(t, wi * ii) for t, wi, ii in zip(terms, w, idfs)],
            )
            prob = F.lit(1.0) / (F.lit(1.0) + F.exp(-margin))
            err = prob - F.col("_y")
            logloss = -(
                F.col("_y") * F.log(F.greatest(prob, eps))
                + (F.lit(1.0) - F.col("_y"))
                * F.log(F.greatest(F.lit(1.0) - prob, eps))
            )
            correct = (
                (prob >= 0.5).cast("double") == F.col("_y")
            ).cast("double")
            # __bias__ rides every doc exactly once: its group row IS the
            # doc-level aggregate (intercept gradient, loss, accuracy, n)
            grad_rows = (
                prepared.select(
                    err.alias("_e"), logloss.alias("_l"),
                    correct.alias("_c"),
                    F.explode(
                        F.concat(F.array(F.lit(_BIAS)), F.col("_feats"))
                    ).alias("_t"),
                )
                .groupBy("_t")
                .agg(
                    F.sum("_e").alias("_g"),
                    F.sum("_l").alias("_ll"),
                    F.sum("_c").alias("_ok"),
                    F.count(F.lit(1)).alias("_n"),
                )
                .collect()
            )
            by_term = {r["_t"]: r for r in grad_rows}
            bias = by_term[_BIAS]
            n = float(bias["_n"])
            history.append((
                name, it,
                round(float(bias["_ll"]) / n, 10),
                round(float(bias["_ok"]) / n, 10),
                float(alpha), list(terms),
                [round(x, 10) for x in ([w0] + list(w))],
                [round(x, 10) for x in idfs],
            ))
            w0 -= alpha * float(bias["_g"]) / n
            w = [
                wi - alpha * ii * float(by_term[t]["_g"]) / n
                if t in by_term else wi
                for t, wi, ii in zip(terms, w, idfs)
            ]
    finally:
        prepared.unpersist()
    return src.spark.createDataFrame(
        history,
        "name string, iteration int, error double, accuracy double, "
        "alpha double, terms array<string>, weights array<double>, "
        "idfs array<double>",
    )


def latest_model(models: DataFrame, name: str) -> dict:
    """Solr ``model()``: the highest-iteration stored row for ``name``
    (train()'s output shape) as a plain dict — the bounded artifact
    ``classify`` broadcasts."""
    rows = (
        models.filter(F.col("name") == name)
        .orderBy(F.desc("iteration"))
        .limit(1)
        .collect()
    )
    if not rows:
        raise ValueError(f"no stored model named {name!r}")
    r = rows[0].asDict()
    return {
        "name": r["name"],
        "terms": list(r["terms"]),
        "weights": [float(x) for x in r["weights"]],
        "idfs": [float(x) for x in r["idfs"]],
    }


def classify_df(df: DataFrame, toks: Column, model: dict) -> DataFrame:
    """Solr ``classify()``: append ``score`` (the raw margin) and
    ``probability`` (sigmoid, rounded to 10 decimals) to every row of
    ``df``, scoring the analyzed token array ``toks`` against the
    model.  Map-only: the model folds into one codegen Column (the
    ``_margin_col`` shape) — classification adds zero shuffles at any
    corpus size."""
    terms = model["terms"]
    weights = model["weights"]
    idfs = model["idfs"]
    if len(weights) != len(terms) + 1:
        raise ValueError(
            "model weights must be [intercept] + one per term "
            f"(got {len(weights)} weights for {len(terms)} terms)"
        )
    margin = _margin_col(
        toks, weights[0],
        [(t, wi * ii) for t, wi, ii in zip(terms, weights[1:], idfs)],
    )
    prob = F.lit(1.0) / (F.lit(1.0) + F.exp(-margin))
    return df.withColumn("score", F.round(margin, 10)).withColumn(
        "probability", F.round(prob, 10)
    )


def reference_train(
    docs: Sequence[tuple[Sequence[str], int]],
    feats: Sequence[tuple[str, float]],
    max_iterations: int = 25,
    alpha: float = 0.5,
) -> list[dict]:
    """Driver-side pure-Python twin of ``train_logistic`` (same pinned
    formulas, plain floats) — the golden reference the tests compare
    the distributed trainer against.  ``docs`` are (token-list, y)."""
    terms = [t for t, _ in feats]
    idfs = {t: i for t, i in feats}
    w0, w = 0.0, {t: 0.0 for t in terms}
    out = []
    n = float(len(docs))
    for it in range(1, max_iterations + 1):
        g0, g = 0.0, {t: 0.0 for t in terms}
        ll = ok = 0.0
        for toks, y in docs:
            present = set(toks) & set(terms)
            m = w0 + sum(w[t] * idfs[t] for t in present)
            p = 1.0 / (1.0 + math.exp(-m))
            e = p - y
            g0 += e
            for t in present:
                g[t] += e
            pc = min(max(p, 1e-15), 1 - 1e-15)
            ll += -(y * math.log(pc) + (1 - y) * math.log(1 - pc))
            ok += 1.0 if (p >= 0.5) == bool(y) else 0.0
        out.append({
            "iteration": it, "error": ll / n, "accuracy": ok / n,
            "weights": [w0] + [w[t] for t in terms],
        })
        w0 -= alpha * g0 / n
        for t in terms:
            w[t] -= alpha * idfs[t] * g[t] / n
    return out
