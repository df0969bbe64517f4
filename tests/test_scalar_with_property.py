"""Property test for the scalar-WITH rewrite — the highest-blast-radius
clause rewrite (it preprocesses EVERY pasted statement): randomized
scalar/CTE WITH statements must evaluate to the same result as their
hand-substituted equivalents, and statements without scalar entries
must pass through byte-identical."""

from __future__ import annotations

import random

import pytest

from clickhouse_learning_spark.functions.dialect import (
    _rewrite_scalar_with,
    translate,
)

_IDENTS = ["alpha_k", "beta_v", "gamma3", "lim_x", "z_z"]
_EXPRS = [
    "5",
    "2 + 3",
    "'lit AS string'",  # AS inside a string literal must not split
    "CAST(7 AS INT)",  # AS inside parens must not split
    "[1, 2, 3]",  # array literal commas must not split entries
    "(SELECT 41)",  # scalar subquery
]


def _cases(n=40, seed=7):
    rng = random.Random(seed)
    out = []
    for _ in range(n):
        k = rng.randrange(1, 4)
        idents = rng.sample(_IDENTS, k)
        exprs = [rng.choice(_EXPRS) for _ in range(k)]
        out.append(list(zip(exprs, idents)))
    return out


@pytest.mark.parametrize("entries", _cases())
def test_randomized_scalar_with_equals_substitution(spark, entries):
    with_sql = "WITH " + ", ".join(f"{e} AS {i}" for e, i in entries)
    body_cols = ", ".join(
        f"({i}) AS c{n}" for n, (_, i) in enumerate(entries)
    )
    sql = f"{with_sql} SELECT {body_cols}"
    manual = "SELECT " + ", ".join(
        f"(({e})) AS c{n}" for n, (e, _) in enumerate(entries)
    )
    got = spark.sql(translate(sql)).collect()[0]
    want = spark.sql(translate(manual)).collect()[0]
    assert list(got) == list(want), (sql, got, want)


def test_pure_cte_and_plain_statements_pass_through():
    for sql in (
        "SELECT 1 AS a",
        "WITH cte AS (SELECT 1 AS a) SELECT a FROM cte",
        "WITH a AS (SELECT 1 AS x), b AS (SELECT x + 1 AS y FROM a) "
        "SELECT y FROM b",
    ):
        out = _rewrite_scalar_with(sql)
        # plain statements byte-identical; pure-CTE forms may be
        # re-joined but must keep every entry and the body
        if not sql.startswith("WITH"):
            assert out == sql
        else:
            assert out.count("AS (") == sql.count("AS (")
            assert out.split("SELECT")[-1] == sql.split("SELECT")[-1]


def test_alias_inside_string_survives(spark):
    # the alias name occurring INSIDE a string literal must not be
    # substituted
    r = spark.sql(
        translate("WITH 9 AS k SELECT 'k is not k' AS s, k AS v")
    ).collect()[0]
    assert r.s == "k is not k" and r.v == 9


def test_backslash_expression_substitutes_literally(spark):
    # ADVICE r4: pat.sub treated the bound expression as a regex
    # replacement TEMPLATE — '\\s+' had its backslashes halved and
    # '\1' raised re.error. Substitution must be literal.
    sql = (
        r"WITH replaceRegexpAll(txt, '\\s+', ' ') AS norm "
        r"SELECT norm AS c FROM (SELECT 'a  b' AS txt) t"
    )
    out = _rewrite_scalar_with(sql)
    assert r"'\\s+'" in out, out
    got = spark.sql(translate(sql)).collect()[0][0]
    assert got == "a b"
    # backreference-looking literal must not raise
    out2 = _rewrite_scalar_with(
        r"WITH replaceRegexpAll(txt, '(a)', '\\1!') AS norm "
        r"SELECT norm AS c"
    )
    assert r"'\\1!'" in out2, out2
