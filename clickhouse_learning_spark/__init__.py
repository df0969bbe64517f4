"""clickhouse_learning_spark — a PySpark-native analytics engine.

Re-implements, Spark-first, the capabilities of the reference ClickHouse
deployment at IVitamin-C/clickhouse-learning (read-only copy at
/root/reference): columnar partitioned tables with sort keys and TTL,
incrementally-maintained materialized views over mergeable aggregate
states (HLL / sum / exact-median / bitmap), dictionary-style broadcast
enrichment, bitmap-funnel analytics, plus large-scale training-data
pipeline operators (dedup, similarity search, text analysis, multimodal
column plumbing).

Design notes (scale-first):
- Everything is declared via the DataFrame/SQL API so Catalyst handles
  predicate pushdown, column pruning, partition pruning and join
  strategy selection; no hand-scheduled execution.
- Aggregates follow the partial/merge/finalize split (the reference's
  ``-State`` / ``-Merge`` combinator algebra, see
  /root/reference/docs/物化视图的实战经验分享.md:298-316) which maps 1:1
  onto Spark's partial/final hash aggregation.
- Small dimensions are broadcast (the reference's in-memory
  dictionaries, /root/reference/scripts/sql/dim.dict_user_dim.sql:2-20).
"""

from clickhouse_learning_spark.session import get_spark


def __getattr__(name):
    # Lazy convenience exports (keep `import clickhouse_learning_spark`
    # light — pulling MetricSpec eagerly would import pyspark.sql.functions
    # machinery before a session exists in some embedding contexts).
    if name == "MetricSpec":
        from clickhouse_learning_spark.functions.metrics import MetricSpec

        return MetricSpec
    if name == "MaterializedView":
        from clickhouse_learning_spark.mv.engine import MaterializedView

        return MaterializedView
    if name == "Table":
        from clickhouse_learning_spark.tables import Table

        return Table
    if name == "translate":
        from clickhouse_learning_spark.functions.dialect import translate

        return translate
    if name == "deploy":
        from clickhouse_learning_spark.ddl import deploy

        return deploy
    if name == "run_clickhouse":
        from clickhouse_learning_spark.mv.sql_rewrite import run_clickhouse

        return run_clickhouse
    if name == "dialect":
        from clickhouse_learning_spark.functions import dialect

        return dialect
    if name == "MinHashIndex":
        from clickhouse_learning_spark.operators.dedup import MinHashIndex

        return MinHashIndex
    if name == "IvfIndex":
        from clickhouse_learning_spark.operators.similarity import IvfIndex

        return IvfIndex
    raise AttributeError(name)


__all__ = [
    "get_spark",
    "MetricSpec",
    "MaterializedView",
    "Table",
    "translate",
    "deploy",
    "run_clickhouse",
    "dialect",
    "MinHashIndex",
    "IvfIndex",
]
__version__ = "0.5.0"
