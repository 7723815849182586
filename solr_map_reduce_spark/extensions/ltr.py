"""Learning-To-Rank rescoring — the Solr LTR contrib's serving surface
(public Solr `ltr` plugin semantics: features are query/function
expressions, a stored model rescores the main query's top ``rq`` docs),
re-expressed Spark-first.

The reference repo (solr-map-reduce) builds indexes Solr then serves;
LTR is part of that serving surface, so it lives here as an extension
alongside ReRank/elevation (`index_reader.py`).

Spark shape — everything compiles to ONE Column:

- a FEATURE is a Column, a bare field name, or a Solr function-query
  string (compiled through the same grammar as sort-by-function);
  missing values fold to the feature's ``default`` (Solr's feature
  defaultValue contract, 0.0 unless overridden);
- NORMALIZERS are Solr's documented two: MinMax ``(v-min)/(max-min)``
  and Standard ``(v-avg)/std`` — plain arithmetic on the feature
  Column;
- a LinearModel is a weighted sum; a MultipleAdditiveTreesModel is the
  tree ensemble compiled to nested ``CASE WHEN`` (Solr branches LEFT
  when ``feature <= threshold``) times per-tree weights — a single
  whole-stage-codegen expression, no UDF, no per-row Python;
- rescoring is Solr's ReRank contract: the MAIN ranking's top ``rq``
  docs (a bounded pool — TakeOrdered, never a corpus sort) get the
  model score and re-sort by it; docs below the pool keep their
  original order (they are simply not returned here, as in a page-1
  rerank).

At 100 TB the only distributed work is the pool selection (one scan +
TakeOrderedAndProject); the model — however many trees — is constant
per-row compute inside codegen over ``rq`` rows.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence
from dataclasses import dataclass, field

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

__all__ = [
    "Feature",
    "LinearModel",
    "TreeNode",
    "AdditiveTreesModel",
    "load_solr_features",
    "load_solr_model",
    "ltr_rescore",
]


@dataclass(frozen=True)
class Feature:
    """One LTR feature: ``expr`` is a Column, a field name, or a Solr
    function-query string; ``default`` replaces NULL (Solr's feature
    defaultValue); ``norm`` is None or ``{"type": "minmax", "min": m,
    "max": M}`` / ``{"type": "standard", "avg": a, "std": s}``."""

    expr: "Column | str"
    default: float = 0.0
    norm: "Mapping[str, float] | None" = None

    def col(self, context=None) -> Column:
        from solr_map_reduce_spark.extensions.search import (
            parse_function_query,
        )

        c = self.expr
        if isinstance(c, str):
            c = (
                parse_function_query(c, context=context)
                if "(" in c
                else F.col(c)
            )
        c = F.coalesce(c.cast("double"), F.lit(float(self.default)))
        n = self.norm
        if n is None:
            return c
        kind = str(n.get("type", "")).lower()
        if kind == "minmax":
            lo, hi = float(n["min"]), float(n["max"])
            if hi <= lo:
                raise ValueError(f"minmax norm needs max > min, got {n}")
            return (c - F.lit(lo)) / F.lit(hi - lo)
        if kind == "standard":
            avg, std = float(n["avg"]), float(n["std"])
            if std <= 0:
                raise ValueError(f"standard norm needs std > 0, got {n}")
            return (c - F.lit(avg)) / F.lit(std)
        raise ValueError(
            f"unknown normalizer {n!r} (minmax, standard — Solr's two)"
        )


def _features(
    features: "Mapping[str, Feature | Column | str]",
    context=None,
) -> "dict[str, Column]":
    out: dict[str, Column] = {}
    for name, f_ in features.items():
        out[name] = (
            f_.col(context)
            if isinstance(f_, Feature)
            else Feature(f_).col(context)
        )
    if not out:
        raise ValueError("LTR needs at least one feature")
    return out


@dataclass(frozen=True)
class LinearModel:
    """Solr LinearModel: ``score = sum_i w_i * feature_i`` (features
    already normalized per their own spec)."""

    weights: "Mapping[str, float]"

    def score_col(self, feats: "Mapping[str, Column]") -> Column:
        unknown = set(self.weights) - set(feats)
        if unknown:
            raise ValueError(
                f"model weights name unknown features: {sorted(unknown)}"
            )
        if not self.weights:
            raise ValueError("LinearModel needs at least one weight")
        score = None
        for name, w in self.weights.items():
            term = feats[name] * F.lit(float(w))
            score = term if score is None else score + term
        return score


@dataclass(frozen=True)
class TreeNode:
    """One node of a MultipleAdditiveTreesModel tree: a LEAF carries
    ``value``; a BRANCH carries ``feature``/``threshold`` and goes LEFT
    when ``feature <= threshold`` (Solr's documented branch rule)."""

    value: "float | None" = None
    feature: "str | None" = None
    threshold: "float | None" = None
    left: "TreeNode | None" = None
    right: "TreeNode | None" = None

    def is_leaf(self) -> bool:
        return self.value is not None

    @classmethod
    def from_dict(cls, d: "Mapping[str, object]") -> "TreeNode":
        """Solr's model-store JSON node shape (strings allowed for
        numbers, as Solr serializes them)."""
        if "value" in d:
            return cls(value=float(d["value"]))  # type: ignore[arg-type]
        try:
            return cls(
                feature=str(d["feature"]),
                threshold=float(d["threshold"]),  # type: ignore[arg-type]
                left=cls.from_dict(d["left"]),  # type: ignore[arg-type]
                right=cls.from_dict(d["right"]),  # type: ignore[arg-type]
            )
        except KeyError as exc:
            raise ValueError(
                f"tree node needs value= or feature/threshold/left/right: "
                f"missing {exc}"
            ) from None

    def col(self, feats: "Mapping[str, Column]") -> Column:
        if self.is_leaf():
            return F.lit(float(self.value))  # type: ignore[arg-type]
        if self.feature not in feats:
            raise ValueError(f"tree references unknown feature {self.feature!r}")
        assert self.left is not None and self.right is not None
        return F.when(
            feats[self.feature] <= F.lit(float(self.threshold)),  # type: ignore[arg-type]
            self.left.col(feats),
        ).otherwise(self.right.col(feats))


@dataclass(frozen=True)
class AdditiveTreesModel:
    """Solr MultipleAdditiveTreesModel (LambdaMART-style ensembles):
    ``score = sum_t weight_t * tree_t(features)``.  Build from the
    model-store JSON with :meth:`from_json` or hand-assemble trees."""

    trees: "Sequence[tuple[float, TreeNode]]" = field(default_factory=tuple)

    @classmethod
    def from_json(cls, params: "Mapping[str, object]") -> "AdditiveTreesModel":
        """``params`` is the Solr model JSON's ``params`` object:
        ``{"trees": [{"weight": w, "root": {...}}, ...]}``."""
        trees = params.get("trees")
        if not trees:
            raise ValueError("AdditiveTreesModel params need trees=[...]")
        return cls(
            trees=tuple(
                (float(t.get("weight", 1.0)), TreeNode.from_dict(t["root"]))
                for t in trees  # type: ignore[union-attr]
            )
        )

    def score_col(self, feats: "Mapping[str, Column]") -> Column:
        if not self.trees:
            raise ValueError("AdditiveTreesModel needs at least one tree")
        score = None
        for w, root in self.trees:
            term = root.col(feats) * F.lit(float(w))
            score = term if score is None else score + term
        return score


_NORM_CLASSES = {
    "minmaxnormalizer": ("minmax", ("min", "max")),
    "standardnormalizer": ("standard", ("avg", "std")),
}


def _norm_from_store(norm: "Mapping[str, object] | None"):
    """A model-store normalizer object ({"class": "...MinMaxNormalizer",
    "params": {"min": "0", "max": "10"}}) -> a Feature norm dict."""
    if norm is None:
        return None
    cls = str(norm.get("class", "")).rsplit(".", 1)[-1].lower()
    if cls == "identitynormalizer":
        return None
    if cls not in _NORM_CLASSES:
        raise ValueError(
            f"unsupported normalizer class {norm.get('class')!r} "
            "(MinMax, Standard, Identity — Solr's shipped set)"
        )
    kind, keys = _NORM_CLASSES[cls]
    params = norm.get("params") or {}
    try:
        return {"type": kind, **{k: float(params[k]) for k in keys}}  # type: ignore[index]
    except KeyError as exc:
        raise ValueError(
            f"normalizer {norm.get('class')!r} params need {keys}: "
            f"missing {exc}"
        ) from None


def load_solr_features(
    specs: "Sequence[Mapping[str, object]]",
) -> "dict[str, Feature]":
    """Solr LTR FEATURE-STORE JSON (the ``/schema/feature-store``
    upload format, a list of feature objects) -> ``{name: Feature}``.

    Supported classes (public Solr LTR contrib):
    - ``FieldValueFeature`` (``params.field``) — the stored value;
    - ``ValueFeature`` (``params.value``) — a constant;
    - ``SolrFeature`` with a function query in ``params.q``
      (``{!func}...`` or a bare function-query string) — compiled
      through the same grammar as sort-by-function.
    Score-dependent features (OriginalScoreFeature, SolrFeature with a
    full query) have no relational analog here and raise."""
    out: dict[str, Feature] = {}
    for spec in specs:
        name = spec.get("name")
        if not name:
            raise ValueError(f"feature spec needs name=: {spec!r}")
        cls = str(spec.get("class", "")).rsplit(".", 1)[-1].lower()
        params = spec.get("params") or {}
        if cls == "fieldvaluefeature":
            if "field" not in params:
                raise ValueError(
                    f"FieldValueFeature {name!r} needs params.field"
                )
            expr: "str | Column" = str(params["field"])  # type: ignore[index]
        elif cls == "valuefeature":
            if "value" not in params:
                raise ValueError(f"ValueFeature {name!r} needs params.value")
            expr = F.lit(float(params["value"]))  # type: ignore[arg-type]
        elif cls == "solrfeature":
            q = str(params.get("q", ""))
            if q.startswith("{!func}"):
                q = q[len("{!func}"):]
            if not q or ":" in q.split("(")[0]:
                raise ValueError(
                    f"SolrFeature {name!r}: only function-query features "
                    "are supported ({!func}... or a bare function query) "
                    "— full-query/score features have no relational "
                    "analog here"
                )
            expr = q
        else:
            raise ValueError(
                f"unsupported feature class {spec.get('class')!r} for "
                f"{name!r} (FieldValueFeature, ValueFeature, "
                "SolrFeature{!func})"
            )
        out[str(name)] = Feature(
            expr,
            default=float(params.get("defaultValue", 0.0)),  # type: ignore[arg-type]
            norm=None,
        )
    if not out:
        raise ValueError("feature store is empty")
    return out


def load_solr_model(
    model: "Mapping[str, object]",
) -> "tuple[LinearModel | AdditiveTreesModel, dict[str, Mapping | None]]":
    """Solr LTR MODEL-STORE JSON (the ``/schema/model-store`` upload
    format) -> ``(model, per-feature norm specs)``: a user of the
    reference stack can load the very file they PUT to Solr.

    ``model["features"]`` entries may carry a ``norm`` object —
    returned as ``{feature_name: norm-dict-or-None}`` for the caller
    to fold into its Features (norms are model-scoped in Solr)."""
    cls = str(model.get("class", "")).rsplit(".", 1)[-1].lower()
    params = model.get("params") or {}
    norms = {
        str(f["name"]): _norm_from_store(f.get("norm"))  # type: ignore[index]
        for f in (model.get("features") or ())
    }
    if cls == "linearmodel":
        weights = params.get("weights")  # type: ignore[union-attr]
        if not weights:
            raise ValueError("LinearModel params need weights={...}")
        return (
            LinearModel({k: float(v) for k, v in weights.items()}),  # type: ignore[union-attr]
            norms,
        )
    if cls == "multipleadditivetreesmodel":
        return AdditiveTreesModel.from_json(params), norms  # type: ignore[arg-type]
    raise ValueError(
        f"unsupported model class {model.get('class')!r} "
        "(LinearModel, MultipleAdditiveTreesModel)"
    )


def ltr_rescore(
    pool: DataFrame,
    model: "LinearModel | AdditiveTreesModel",
    features: "Mapping[str, Feature | Column | str]",
    k: int | None = None,
    score_col: str = "ltr_score",
    tiebreak: str | None = None,
    context=None,
) -> DataFrame:
    """Rescore an ALREADY-BOUNDED pool (Solr's reRankDocs window — the
    caller selects the top-``rq`` docs by the main ranking first) with
    the model over the features, ordered by the model score descending,
    ``tiebreak`` ascending when given (pass the unique key for
    deterministic pages), truncated to ``k``.

    The model compiles to one Column — whole-stage codegen, no UDF —
    so the rescore costs one projection over ``rq`` rows at any corpus
    size."""
    feats = _features(features, context)
    scored = pool.withColumn(score_col, model.score_col(feats))
    # NaN model scores sort GREATEST under desc, so one sqrt(-x)/pow
    # feature value would TOP every rescored page (the same
    # NaN-is-greatest failure shape as the kNN serving fix; Lucene
    # forbids NaN scores outright).  The feature-level coalesce can't
    # catch it — NaN is not NULL.  Sort on a NaN-nulled twin (desc
    # places NULLs last), keep the raw score column for observability.
    sortable = F.when(~F.isnan(F.col(score_col)), F.col(score_col))
    order = [F.desc(sortable)]
    if tiebreak is not None:
        order.append(F.asc(tiebreak))
    scored = scored.orderBy(*order)
    return scored.limit(int(k)) if k is not None else scored
