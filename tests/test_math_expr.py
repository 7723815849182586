"""Solr math expressions (stream DSL let()/col() + numeric evaluators):
driver-side in-memory numeric tier — numpy-backed, sample moments,
linear-interpolation percentiles, with the hard col() guard."""

import math

import pytest

from solr_map_reduce_spark.extensions.search import QuerySyntaxError
from solr_map_reduce_spark.extensions.stream_expr import StreamCompiler


@pytest.fixture(scope="module")
def comp(spark):
    obs = spark.createDataFrame(
        [(1, 2.0, 10.0), (2, 4.0, 21.0), (3, 6.0, 29.0), (4, 8.0, 41.0)],
        "id long, x double, y double",
    )
    return StreamCompiler({"obs": obs})


def run1(comp, expr):
    rows = comp.run(expr).collect()
    assert len(rows) == 1
    return rows[0]


class TestLet:
    def test_descriptive_stats(self, comp):
        r = run1(
            comp,
            "let(a=search(obs), b=col(a, x), "
            "tuple(n=length(b), m=mean(b), s=stddev(b), "
            "p=percentile(b, 50), mn=min(b), mx=max(b)))",
        )
        xs = [2.0, 4.0, 6.0, 8.0]
        assert r["n"] == 4.0
        assert r["m"] == pytest.approx(5.0)
        # sample stddev (ddof=1) — the stats()/DuckDB convention
        mu = 5.0
        s = math.sqrt(sum((v - mu) ** 2 for v in xs) / 3)
        assert r["s"] == pytest.approx(s)
        assert r["p"] == pytest.approx(5.0)  # linear interpolation
        assert (r["mn"], r["mx"]) == (2.0, 8.0)

    def test_corr_cov_regression(self, comp):
        r = run1(
            comp,
            "let(a=search(obs), x=col(a, x), y=col(a, y), "
            "tuple(c=corr(x, y), v=cov(x, y), sl=slope(x, y), "
            "ic=intercept(x, y), r2=rSquared(x, y)))",
        )
        import numpy as np

        xs = np.array([2.0, 4.0, 6.0, 8.0])
        ys = np.array([10.0, 21.0, 29.0, 41.0])
        assert r["c"] == pytest.approx(float(np.corrcoef(xs, ys)[0, 1]))
        sl = float(np.cov(xs, ys, ddof=1)[0, 1] / np.var(xs, ddof=1))
        assert r["sl"] == pytest.approx(sl)
        assert r["ic"] == pytest.approx(float(ys.mean() - sl * xs.mean()))
        assert 0.99 < r["r2"] <= 1.0

    def test_arrays_and_arithmetic(self, comp):
        r = run1(
            comp,
            "let(a=array(1, 2, 3), b=add(a, 10), s=sequence(3, 0, 5), "
            "tuple(b=b, s=s, rv=rev(a), sc=mult(div(sum(a), 3), 2), "
            "ma=movingAvg(array(1, 2, 3, 4), 2)))",
        )
        assert list(r["b"]) == [11.0, 12.0, 13.0]
        assert list(r["s"]) == [0.0, 5.0, 10.0]
        assert list(r["rv"]) == [3.0, 2.0, 1.0]
        assert r["sc"] == pytest.approx(4.0)
        assert list(r["ma"]) == [1.5, 2.5, 3.5]

    def test_math_over_stream_pipeline(self, comp):
        # a stream decorator inside let: the variable binds the compiled
        # DataFrame, col() pulls from its result
        r = run1(
            comp,
            'let(a=having(search(obs), gt(x, 3)), v=col(a, y), '
            "tuple(n=length(v), m=mean(v)))",
        )
        assert r["n"] == 3.0
        assert r["m"] == pytest.approx((21.0 + 29.0 + 41.0) / 3)

    def test_col_guard_is_loud(self, comp):
        comp.math_max_values = 2
        try:
            with pytest.raises(QuerySyntaxError, match="materialize"):
                comp.run(
                    "let(a=search(obs), b=col(a, x), tuple(m=mean(b)))"
                )
        finally:
            comp.math_max_values = 1_000_000

    def test_errors_are_loud(self, comp):
        with pytest.raises(QuerySyntaxError, match="trailing stream"):
            comp.run("let(a=search(obs))")
        with pytest.raises(QuerySyntaxError, match="tuple"):
            comp.run("let(a=search(obs), sort(search(obs), by=\"id asc\"))")
        with pytest.raises(QuerySyntaxError, match="unknown math evaluator"):
            comp.run("let(a=search(obs), tuple(m=median(col(a, x))))")
        with pytest.raises(QuerySyntaxError, match="unknown math operand"):
            comp.run("let(a=search(obs), tuple(m=mean(ghost)))")
        with pytest.raises(QuerySyntaxError, match="not in the stream"):
            comp.run("let(a=search(obs), tuple(m=mean(col(a, nope))))")
        with pytest.raises(QuerySyntaxError, match="not a bound stream"):
            comp.run("let(a=array(1), tuple(m=mean(col(a, x))))")
