"""Solr PARALLEL SQL (the /sql handler) → DataFrame plans.

Solr ships a SQL interface (backed by Apache Calcite, executed as
streaming expressions) whose documented surface is a focused subset:
``SELECT [DISTINCT] fields|aggregates FROM collection [WHERE ...]
[GROUP BY ...] [HAVING ...] [ORDER BY ...] [LIMIT n [OFFSET m]]`` with
Solr-specific predicate semantics — an equality against an ANALYZED
text field is a full-text (phrase) match, ``LIKE`` maps to a wildcard
query, and everything else is a plain column predicate.  This module
parses that dialect (from scratch — tokenizer + recursive descent, no
Calcite) and compiles each statement to the SAME Catalyst plan the
native API produces:

==================  ====================================================
SQL construct       Spark plan
==================  ====================================================
WHERE col-pred      pushed parquet filter on the collection scan
WHERE text = '...'  the engine's analyzed-query predicate (phrase match
                    over stored token arrays; Bloom shard pruning when
                    the predicate sits in a pure top-level conjunction)
WHERE text LIKE     wildcard term query (% -> *, _ -> ?) over the same
                    stored tokens
GROUP BY + aggs     groupBy + agg — partial (map-side) aggregation,
                    ONE shuffle on the grouping keys
HAVING              filter AFTER the aggregate (hidden aggregate
                    columns computed in the same pass, then dropped)
SELECT DISTINCT     project + distinct (hash aggregate, one shuffle)
ORDER BY + LIMIT    TakeOrderedAndProject — never a full sort at scale
OFFSET              offset() after the sort (deterministic pages: the
                    statement must supply its own tiebreak, same
                    contract as Solr's deep paging)
==================  ====================================================

Scale: the SQL layer introduces ZERO new execution machinery — it is a
front-end over the artifact scan + the existing analyzed-predicate
compiler, so plans inherit predicate pushdown, column pruning, Bloom
shard pruning, partial aggregation, and AQE exactly as the native API
does.  At 100 TB a ``GROUP BY`` statement shuffles only the grouping
keys + partial aggregates, and an ``ORDER BY ... LIMIT k`` ships k rows
per partition to the driver, never the corpus.

Beyond-reference surface (the reference repo has no SQL endpoint); the
dialect follows Solr's public "SQL Query Language" documentation.
"""

from __future__ import annotations

import re
from collections.abc import Mapping
from dataclasses import dataclass, field

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from solr_map_reduce_spark.extensions.search import QuerySyntaxError

__all__ = ["SqlEngine", "parse_sql", "SqlSyntaxError"]


class SqlSyntaxError(QuerySyntaxError):
    """Malformed or unsupported Parallel-SQL statement."""


# ---------------------------------------------------------------------------
# tokenizer
# ---------------------------------------------------------------------------

_TOKEN_RE = re.compile(
    r"""\s*(?:
        (?P<num>-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)
      | (?P<str>'(?:[^']|'')*')
      | (?P<qid>"(?:[^"]|"")*")
      | (?P<id>[A-Za-z_][A-Za-z_0-9.$]*)
      | (?P<op><>|!=|>=|<=|=|<|>|\(|\)|,|\*)
    )""",
    re.VERBOSE,
)

_KEYWORDS = {
    "select", "distinct", "from", "where", "group", "by", "having",
    "order", "limit", "offset", "and", "or", "not", "in", "like",
    "between", "is", "null", "as", "asc", "desc", "count", "sum",
    "min", "max", "avg",
}


@dataclass
class _Tok:
    kind: str  # num | str | id | kw | op
    text: str


def _tokenize(stmt: str) -> list[_Tok]:
    toks: list[_Tok] = []
    pos = 0
    while pos < len(stmt):
        m = _TOKEN_RE.match(stmt, pos)
        if m is None:
            rest = stmt[pos:].strip()
            if not rest:
                break
            raise SqlSyntaxError(f"cannot tokenize SQL at: {rest[:30]!r}")
        pos = m.end()
        if m.lastgroup == "num":
            toks.append(_Tok("num", m.group("num")))
        elif m.lastgroup == "str":
            toks.append(_Tok("str", m.group("str")[1:-1].replace("''", "'")))
        elif m.lastgroup == "qid":
            toks.append(_Tok("id", m.group("qid")[1:-1].replace('""', '"')))
        elif m.lastgroup == "id":
            word = m.group("id")
            kind = "kw" if word.lower() in _KEYWORDS else "id"
            toks.append(_Tok(kind, word))
        else:
            toks.append(_Tok("op", m.group("op")))
    return toks


# ---------------------------------------------------------------------------
# AST
# ---------------------------------------------------------------------------

@dataclass
class Col:
    name: str


@dataclass
class Lit:
    value: object
    quoted: bool = False  # string literal (vs numeric / NULL)


@dataclass
class Agg:
    fn: str          # count | sum | min | max | avg
    arg: object      # Col | "*" (count only)
    distinct: bool = False

    def canonical(self) -> str:
        inner = "*" if self.arg == "*" else self.arg.name
        d = "distinct " if self.distinct else ""
        return f"{self.fn}({d}{inner})"


@dataclass
class Cmp:
    op: str          # = | <> | > | >= | < | <=
    left: Col
    right: Lit


@dataclass
class LikeOp:
    col: Col
    pattern: str
    negate: bool = False


@dataclass
class InList:
    col: Col
    values: list
    negate: bool = False


@dataclass
class BetweenOp:
    col: Col
    lo: Lit
    hi: Lit
    negate: bool = False


@dataclass
class IsNullOp:
    col: Col
    negate: bool = False


@dataclass
class NotOp:
    child: object


@dataclass
class BoolOp:
    op: str          # and | or
    parts: list


@dataclass
class SelectStmt:
    items: list      # [(expr, alias|None)]  expr: Col | Agg | "*"
    table: str
    distinct: bool = False
    where: object = None
    group_by: list = field(default_factory=list)    # [Col]
    having: object = None                            # predicate over aggs
    order_by: list = field(default_factory=list)    # [(expr, "asc"|"desc")]
    limit: int | None = None
    offset: int = 0


# ---------------------------------------------------------------------------
# parser
# ---------------------------------------------------------------------------

def parse_sql(stmt: str) -> SelectStmt:
    """Parse one Parallel-SQL SELECT statement into an AST — loud on
    anything outside the documented dialect."""
    toks = _tokenize(stmt.strip().rstrip(";"))
    p = _Parser(toks)
    out = p.parse_select()
    if p.pos < len(p.toks):
        raise SqlSyntaxError(
            f"unexpected trailing tokens at {p.toks[p.pos].text!r}"
        )
    return out


class _Parser:
    def __init__(self, toks: list[_Tok]):
        self.toks = toks
        self.pos = 0

    # -- cursor helpers -------------------------------------------------
    def peek(self) -> _Tok | None:
        return self.toks[self.pos] if self.pos < len(self.toks) else None

    def take(self) -> _Tok:
        t = self.peek()
        if t is None:
            raise SqlSyntaxError("unexpected end of statement")
        self.pos += 1
        return t

    def kw(self, *words: str) -> bool:
        """Consume the keyword sequence if present."""
        save = self.pos
        for w in words:
            t = self.peek()
            if t is None or t.kind != "kw" or t.text.lower() != w:
                self.pos = save
                return False
            self.pos += 1
        return True

    def expect_kw(self, word: str) -> None:
        if not self.kw(word):
            got = self.peek().text if self.peek() else "<end>"
            raise SqlSyntaxError(f"expected {word.upper()}, got {got!r}")

    def expect_op(self, op: str) -> None:
        t = self.take()
        if t.kind != "op" or t.text != op:
            raise SqlSyntaxError(f"expected {op!r}, got {t.text!r}")

    # -- grammar --------------------------------------------------------
    def parse_select(self) -> SelectStmt:
        self.expect_kw("select")
        distinct = self.kw("distinct")
        items = [self.parse_select_item()]
        while self.peek() and self.peek().kind == "op" and self.peek().text == ",":
            self.take()
            items.append(self.parse_select_item())
        self.expect_kw("from")
        tbl = self.take()
        if tbl.kind not in ("id",):
            raise SqlSyntaxError(f"expected collection name, got {tbl.text!r}")
        out = SelectStmt(items=items, table=tbl.text, distinct=distinct)
        if self.kw("where"):
            out.where = self.parse_or()
        if self.kw("group", "by"):
            out.group_by = [self.parse_col()]
            while self.peek() and self.peek().kind == "op" and self.peek().text == ",":
                self.take()
                out.group_by.append(self.parse_col())
        if self.kw("having"):
            out.having = self.parse_or()
        if self.kw("order", "by"):
            out.order_by = [self.parse_order_item()]
            while self.peek() and self.peek().kind == "op" and self.peek().text == ",":
                self.take()
                out.order_by.append(self.parse_order_item())
        if self.kw("limit"):
            t = self.take()
            if t.kind != "num" or "." in t.text:
                raise SqlSyntaxError(f"LIMIT needs an integer, got {t.text!r}")
            out.limit = int(t.text)
        if self.kw("offset"):
            t = self.take()
            if t.kind != "num" or "." in t.text:
                raise SqlSyntaxError(f"OFFSET needs an integer, got {t.text!r}")
            out.offset = int(t.text)
            if not out.order_by:
                raise SqlSyntaxError(
                    "OFFSET needs ORDER BY — an offset into an unordered "
                    "result set is a different page every run"
                )
        return out

    def parse_select_item(self):
        t = self.peek()
        if t and t.kind == "op" and t.text == "*":
            self.take()
            return ("*", None)
        expr = self.parse_value_expr()
        alias = None
        if self.kw("as"):
            a = self.take()
            if a.kind not in ("id", "kw"):
                raise SqlSyntaxError(f"bad alias {a.text!r}")
            alias = a.text
        return (expr, alias)

    def parse_value_expr(self):
        """A select-item / order-item value: aggregate call or column."""
        t = self.peek()
        if (
            t is not None
            and t.kind == "kw"
            and t.text.lower() in ("count", "sum", "min", "max", "avg")
            and self.pos + 1 < len(self.toks)
            and self.toks[self.pos + 1].kind == "op"
            and self.toks[self.pos + 1].text == "("
        ):
            fn = self.take().text.lower()
            self.expect_op("(")
            distinct = self.kw("distinct")
            inner = self.peek()
            if inner and inner.kind == "op" and inner.text == "*":
                self.take()
                if fn != "count" or distinct:
                    raise SqlSyntaxError(f"{fn}(*) is not valid SQL")
                arg = "*"
            else:
                arg = self.parse_col()
            self.expect_op(")")
            return Agg(fn, arg, distinct)
        return self.parse_col()

    def parse_col(self) -> Col:
        t = self.take()
        if t.kind not in ("id",):
            raise SqlSyntaxError(f"expected a field name, got {t.text!r}")
        return Col(t.text)

    def parse_order_item(self):
        expr = self.parse_value_expr()
        direction = "asc"
        if self.kw("desc"):
            direction = "desc"
        elif self.kw("asc"):
            direction = "asc"
        return (expr, direction)

    # -- predicates -----------------------------------------------------
    def parse_or(self):
        parts = [self.parse_and()]
        while self.kw("or"):
            parts.append(self.parse_and())
        return parts[0] if len(parts) == 1 else BoolOp("or", parts)

    def parse_and(self):
        parts = [self.parse_not()]
        while self.kw("and"):
            parts.append(self.parse_not())
        return parts[0] if len(parts) == 1 else BoolOp("and", parts)

    def parse_not(self):
        if self.kw("not"):
            return NotOp(self.parse_not())
        return self.parse_pred_atom()

    def parse_literal(self) -> Lit:
        t = self.take()
        if t.kind == "str":
            return Lit(t.text, quoted=True)
        if t.kind == "num":
            v = float(t.text) if ("." in t.text or "e" in t.text.lower()) \
                else int(t.text)
            return Lit(v)
        if t.kind == "kw" and t.text.lower() == "null":
            return Lit(None)
        raise SqlSyntaxError(f"expected a literal, got {t.text!r}")

    def parse_pred_atom(self):
        t = self.peek()
        if t and t.kind == "op" and t.text == "(":
            self.take()
            inner = self.parse_or()
            self.expect_op(")")
            return inner
        if (
            t is not None
            and t.kind == "kw"
            and t.text.lower() in ("count", "sum", "min", "max", "avg")
            and self.pos + 1 < len(self.toks)
            and self.toks[self.pos + 1].kind == "op"
            and self.toks[self.pos + 1].text == "("
        ):
            # HAVING's aggregate comparison: count(*) > 2
            left = self.parse_value_expr()
            op = self.take()
            if op.kind != "op" or op.text not in (
                "=", "<>", "!=", ">", ">=", "<", "<="
            ):
                raise SqlSyntaxError(
                    f"expected a comparison after {left.canonical()}, "
                    f"got {op.text!r}"
                )
            return Cmp("<>" if op.text == "!=" else op.text, left,
                       self.parse_literal())
        col = self.parse_col()
        if self.kw("is"):
            neg = self.kw("not")
            self.expect_kw("null")
            return IsNullOp(col, negate=neg)
        neg = self.kw("not")
        if self.kw("like"):
            pat = self.take()
            if pat.kind != "str":
                raise SqlSyntaxError("LIKE needs a string pattern")
            return LikeOp(col, pat.text, negate=neg)
        if self.kw("in"):
            self.expect_op("(")
            vals = [self.parse_literal()]
            while self.peek() and self.peek().kind == "op" and self.peek().text == ",":
                self.take()
                vals.append(self.parse_literal())
            self.expect_op(")")
            return InList(col, vals, negate=neg)
        if self.kw("between"):
            lo = self.parse_literal()
            self.expect_kw("and")
            hi = self.parse_literal()
            return BetweenOp(col, lo, hi, negate=neg)
        if neg:
            raise SqlSyntaxError(
                "NOT here must be followed by LIKE / IN / BETWEEN"
            )
        op = self.take()
        if op.kind != "op" or op.text not in ("=", "<>", "!=", ">", ">=", "<", "<="):
            raise SqlSyntaxError(f"expected a comparison, got {op.text!r}")
        return Cmp("<>" if op.text == "!=" else op.text, col,
                   self.parse_literal())


# ---------------------------------------------------------------------------
# compiler
# ---------------------------------------------------------------------------

def _like_to_wildcard(pattern: str) -> str:
    """SQL LIKE pattern -> Solr wildcard term (% -> *, _ -> ?), per the
    documented Parallel-SQL mapping.

    The translated term is interpolated into an engine query string, so
    characters that would CHANGE ITS PARSE are rejected loudly instead
    of silently injecting clauses (a space splits the pattern into
    separate OR terms; ':'/'['/'(' start fielded/range/group syntax; a
    literal '*'/'?' in the SQL pattern has no escape in this mapping)."""
    import re as _re2

    if _re2.search(r'[\s():"\\~^{}\[\]!+*?]|&&|\|\|', pattern) or \
            pattern.startswith("-"):
        raise SqlSyntaxError(
            f"LIKE pattern {pattern!r} contains characters the wildcard "
            "mapping cannot represent safely (engine query specials / "
            "whitespace / literal * or ?)"
        )
    return pattern.replace("%", "*").replace("_", "?")


class SqlEngine:
    """Runs Parallel-SQL statements against named collections.

    ``sources`` maps collection name -> ``SearchIndex`` (analyzed text
    fields get Solr's full-text predicate semantics and Bloom-pruned
    scans) or plain ``DataFrame`` (every predicate is a column
    predicate).
    """

    def __init__(self, sources: "Mapping[str, object]"):
        self.sources = dict(sources)

    # -- public ---------------------------------------------------------
    def sql(self, statement: str) -> DataFrame:
        stmt = parse_sql(statement)
        if stmt.table not in self.sources:
            raise SqlSyntaxError(
                f"unknown collection {stmt.table!r}; have "
                f"{sorted(self.sources)}"
            )
        src = self.sources[stmt.table]
        is_index = not isinstance(src, DataFrame)
        base = src.df() if is_index else src
        analyzed = (
            dict(getattr(src, "manifest", {}).get("analyzed", {}))
            if is_index else {}
        )

        # WHERE: one Column predicate; text leaves in a pure top-level
        # conjunction ALSO contribute required tokens for Bloom pruning
        if stmt.where is not None:
            pred, prune = self._compile_pred(stmt.where, src, analyzed,
                                             conjunctive=True)
            if prune and is_index:
                fname, req = prune
                scan = src._bloom_pruned(sorted(req), fname, "all")
                base = scan.filter(pred)
            else:
                base = base.filter(pred)

        agg_items = [
            it for it, _a in stmt.items if isinstance(it, Agg)
        ] + [
            e for e, _d in stmt.order_by if isinstance(e, Agg)
        ]
        if self._having_aggs(stmt.having):
            agg_items += self._having_aggs(stmt.having)
        grouped = bool(stmt.group_by) or any(
            isinstance(it, Agg) for it, _a in stmt.items
        )

        agg_names: dict[str, str] = {}
        if grouped:
            out = self._compile_grouped(stmt, base, agg_items, agg_names)
        else:
            if stmt.having is not None:
                raise SqlSyntaxError("HAVING needs GROUP BY or aggregates")
            out = self._compile_plain(stmt, base, src, is_index)

        if stmt.distinct:
            out = out.distinct()

        if stmt.order_by:
            name_of = self._result_namer(stmt, agg_names)
            out = out.orderBy(*[
                F.col(name_of(e)).desc() if d == "desc"
                else F.col(name_of(e)).asc()
                for e, d in stmt.order_by
            ])
        if stmt.offset:
            out = out.offset(stmt.offset)
        if stmt.limit is not None:
            out = out.limit(stmt.limit)
        hidden = [c for c in out.columns if c.startswith("__h")]
        return out.drop(*hidden) if hidden else out

    # -- select compilation ----------------------------------------------
    def _compile_plain(self, stmt: SelectStmt, base: DataFrame, src,
                       is_index: bool) -> DataFrame:
        cols = []
        for it, alias in stmt.items:
            if it == "*":
                data_cols = (
                    [c for c in src.columns
                     if not c.endswith("__tokens")
                     and c not in ("shard", "_version_")]
                    if is_index else base.columns
                )
                cols.extend(F.col(c) for c in data_cols)
            elif isinstance(it, Agg):
                raise SqlSyntaxError("unreachable: aggregate in plain select")
            else:
                cols.append(F.col(it.name).alias(alias) if alias
                            else F.col(it.name))
        return base.select(*cols)

    def _compile_grouped(self, stmt: SelectStmt, base: DataFrame,
                         agg_items: list,
                         agg_names: dict[str, str]) -> DataFrame:
        group_names = [c.name for c in stmt.group_by]
        for it, _a in stmt.items:
            if it == "*":
                raise SqlSyntaxError("SELECT * cannot combine with GROUP BY")
            if isinstance(it, Col) and it.name not in group_names:
                raise SqlSyntaxError(
                    f"non-aggregated column {it.name!r} must appear in "
                    "GROUP BY"
                )
        # canonical agg text -> output column name (explicit alias wins);
        # the caller-shared agg_names dict lets ORDER BY resolve hidden
        # aggregate columns by canonical text
        names = agg_names
        for it, alias in stmt.items:
            if isinstance(it, Agg):
                names.setdefault(it.canonical(), alias or it.canonical())
        hidden: list[str] = []
        agg_cols: list[F.Column] = []
        seen: set[str] = set()
        for a in agg_items:
            canon = a.canonical()
            if canon in seen:
                continue
            seen.add(canon)
            name = names.get(canon)
            if name is None:
                name = f"__h{len(hidden)}"
                hidden.append(name)
                names[canon] = name
            agg_cols.append(self._agg_col(a).alias(name))
        if not agg_cols:
            raise SqlSyntaxError("GROUP BY needs at least one aggregate")
        out = (
            base.groupBy(*group_names).agg(*agg_cols)
            if group_names else base.agg(*agg_cols)
        )
        if stmt.having is not None:
            out = out.filter(self._compile_having(stmt.having, names))
        # project to the declared select order; ORDER-BY-only aggregates
        # ride along as hidden __h columns (sql() drops them at the end),
        # HAVING-only aggregates are dropped here — their filter already
        # ran in the same aggregation pass
        kept = {alias or (it.canonical() if isinstance(it, Agg) else it.name)
                for it, alias in stmt.items if it != "*"}
        order_hidden = []
        for e, _d in stmt.order_by:
            if isinstance(e, Agg):
                n = names[e.canonical()]
                if n not in kept and n not in order_hidden:
                    order_hidden.append(n)
        proj = []
        for it, alias in stmt.items:
            if isinstance(it, Agg):
                proj.append(F.col(names[it.canonical()]))
            else:
                proj.append(F.col(it.name).alias(alias) if alias
                            else F.col(it.name))
        return out.select(*proj, *[F.col(h) for h in order_hidden])

    def _result_namer(self, stmt: SelectStmt, agg_names: dict[str, str]):
        col_alias: dict[str, str] = {}
        for it, alias in stmt.items:
            if isinstance(it, Col) and alias:
                col_alias[it.name] = alias

        def name_of(e) -> str:
            if isinstance(e, Agg):
                canon = e.canonical()
                return agg_names.get(canon, canon)
            return col_alias.get(e.name, e.name)

        return name_of

    def _agg_col(self, a: Agg) -> F.Column:
        if a.fn == "count":
            if a.arg == "*":
                return F.count(F.lit(1))
            return (F.countDistinct(a.arg.name) if a.distinct
                    else F.count(a.arg.name))
        if a.distinct:
            raise SqlSyntaxError(f"DISTINCT inside {a.fn}() is unsupported")
        return getattr(F, {"avg": "avg", "sum": "sum",
                           "min": "min", "max": "max"}[a.fn])(a.arg.name)

    def _having_aggs(self, node) -> list:
        if node is None:
            return []
        if isinstance(node, Cmp) and isinstance(node.left, Agg):
            return [node.left]
        if isinstance(node, BoolOp):
            return [a for p in node.parts for a in self._having_aggs(p)]
        if isinstance(node, NotOp):
            return self._having_aggs(node.child)
        return []

    def _compile_having(self, node, names: dict) -> F.Column:
        if isinstance(node, BoolOp):
            parts = [self._compile_having(p, names) for p in node.parts]
            out = parts[0]
            for p in parts[1:]:
                out = (out & p) if node.op == "and" else (out | p)
            return out
        if isinstance(node, NotOp):
            return ~self._compile_having(node.child, names)
        if isinstance(node, Cmp):
            left = node.left
            col = (F.col(names[left.canonical()]) if isinstance(left, Agg)
                   else F.col(left.name))
            return _cmp_col(node.op, col, F.lit(node.right.value))
        raise SqlSyntaxError(
            f"HAVING supports comparisons over aggregates, got "
            f"{type(node).__name__}"
        )

    # -- WHERE compilation -------------------------------------------------
    def _compile_pred(self, node, src, analyzed: dict, conjunctive: bool):
        """``(Column, prune)`` — prune is ``(field, frozenset(required
        tokens))`` when every text leaf sits in a pure top-level AND
        chain on ONE analyzed field (the Bloom-prunable shape), else
        None."""
        col, leaves = self._pred_col(node, src, analyzed,
                                     conj=conjunctive)
        prune = None
        if leaves and all(l is not None for l in leaves):
            fields = {f for f, _req in leaves}
            if len(fields) == 1:
                req = frozenset().union(*[r for _f, r in leaves])
                if req:
                    prune = (next(iter(fields)), req)
        return col, prune

    def _pred_col(self, node, src, analyzed, conj: bool):
        """Returns (Column, text_leaves) where text_leaves collects
        (field, required_tokens) for text predicates on the conjunctive
        spine, or [None] markers once the spine is broken (OR / NOT)."""
        if isinstance(node, BoolOp):
            parts = [self._pred_col(p, src, analyzed,
                                    conj and node.op == "and")
                     for p in node.parts]
            out = parts[0][0]
            for c, _l in parts[1:]:
                out = (out & c) if node.op == "and" else (out | c)
            leaves = [l for _c, ls in parts for l in ls]
            if node.op == "or":
                leaves = [None] if any(ls for _c, ls in parts) else []
            return out, leaves
        if isinstance(node, NotOp):
            c, ls = self._pred_col(node.child, src, analyzed, False)
            return ~c, ([None] if ls else [])
        if isinstance(node, IsNullOp):
            c = F.col(node.col.name)
            return (c.isNotNull() if node.negate else c.isNull()), []
        if isinstance(node, InList):
            if node.col.name in analyzed:
                # IN on an analyzed field must mean the same as an OR of
                # '=' (full-text matches): the raw-column isin matched
                # only documents whose ENTIRE text equals a value —
                # silently near-empty vs the equivalent equality form
                preds = [
                    self._text_pred(src, node.col.name, str(v.value))[0]
                    for v in node.values
                ]
                c = preds[0]
                for p in preds[1:]:
                    c = c | p
                return (~c if node.negate else c), [None]
            c = F.col(node.col.name).isin([v.value for v in node.values])
            return (~c if node.negate else c), []
        if isinstance(node, BetweenOp):
            if node.col.name in analyzed:
                raise SqlSyntaxError(
                    f"BETWEEN on analyzed text field {node.col.name!r} is "
                    "not supported (a range over stemmed tokens is rarely "
                    "what anyone means); use a stored copy column"
                )
            c = F.col(node.col.name).between(node.lo.value, node.hi.value)
            return (~c if node.negate else c), []
        if isinstance(node, LikeOp):
            if node.col.name in analyzed:
                pred, info = self._text_pred(
                    src, node.col.name,
                    _like_to_wildcard(node.pattern), wildcard=True,
                )
                if node.negate:
                    return ~pred, [None]
                return pred, ([(node.col.name, info)] if conj else [None])
            c = F.col(node.col.name).like(node.pattern)
            return (~c if node.negate else c), []
        if isinstance(node, Cmp):
            fname = node.left.name
            if (
                fname in analyzed
                and node.right.quoted
                and node.op in ("=", "<>")
            ):
                # Solr Parallel SQL: equality on an analyzed field is a
                # full-text match; multi-term literals are PHRASES
                pred, info = self._text_pred(src, fname,
                                             str(node.right.value))
                if node.op == "<>":
                    return ~pred, [None]
                return pred, ([(fname, info)] if conj else [None])
            c = _cmp_col(node.op, F.col(fname), F.lit(node.right.value))
            return c, []
        raise SqlSyntaxError(f"unsupported predicate {type(node).__name__}")

    def _text_pred(self, src, fname: str, value: str,
                   wildcard: bool = False):
        """Compile one full-text leaf through the engine's query parser;
        returns (Column, frozenset(required tokens) for pruning).

        The leaf compiles UNFIELDED with ``fname`` as the default field:
        semantics are identical to the fielded form, but the engine's
        pruning info tracks the DEFAULT field's tokens only — the old
        fielded interpolation made ``required`` always empty, so the
        module's documented Bloom shard-pruning never actually ran.
        Backslashes escape BEFORE quotes: a value containing ``\\\"``
        would otherwise break out of the generated phrase and inject
        arbitrary clauses."""
        if wildcard:
            q = value
        else:
            esc = value.replace("\\", "\\\\").replace('"', '\\"')
            q = f'"{esc}"'
        pred, info, _f = src._compile_predicate(q, fname)
        req = frozenset(info.get("required") or ())
        return pred, req


def _cmp_col(op: str, left: F.Column, right: F.Column) -> F.Column:
    if op == "=":
        return left == right
    if op == "<>":
        return left != right
    if op == ">":
        return left > right
    if op == ">=":
        return left >= right
    if op == "<":
        return left < right
    return left <= right
