"""PySpark-native analytics engine with the query/data-processing
capabilities of gengstrand/map-reduce-sf-crime, re-expressed Spark-first.

The reference (see SURVEY.md) is a Hadoop-1.x MapReduce pipeline:
two MR jobs (weekly summaries, daily OLAP prep), a star-schema JDBC
loader, and a Mondrian cube. This package rebuilds the same semantics
as declarative DataFrame / Spark SQL plans so Catalyst + Tungsten plan
the physical execution (shuffles, broadcasts, codegen), plus the
large-scale training-data operators (dedup, similarity search, text
analysis, multimodal plumbing) a 100 TB pipeline needs.

Layout:
    functions/   column-expression helpers (calendar, hashing, text, vectors)
    sources/     readers/writers (CSV w/ audit, TSV, parquet, JDBC)
    operators/   the SURVEY §2 operator implementations
    plans/       query registry consumed by __spark_entry__.py
    streaming/   Structured Streaming variants (windows, sessions)
"""

__version__ = "0.1.0"
