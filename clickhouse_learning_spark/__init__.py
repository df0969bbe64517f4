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

__all__ = ["get_spark"]
__version__ = "0.1.0"
