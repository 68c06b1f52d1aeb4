"""PySpark-native time-series rollup / downsample / retention engine.

A from-scratch re-expression of the capabilities of the reference Go CLI
``BoringCat/prom-tsdb-copyer`` (time-range-sliced copy, Prometheus label
matchers, relabel/append, epoch-aligned re-blocking, merge-compaction) as
idiomatic PySpark: one declarative DataFrame chain per pipeline, Catalyst
doing the planning, Arrow-vectorized pandas UDFs only for the chunk codec.

Layout:
    session        SparkSession builders (local[N], UTC, AQE on)
    matchers       Prometheus matcher-string parser -> Column predicates
    datagen        deterministic transcripts generator (FIXTURES.md §1)
    operators/     rollup tiers, window algebra, relabel, gap-fill,
                   retention, dedup, similarity, text analysis, multimodal
    functions/     Gorilla XOR / delta-of-delta codec (numpy + Arrow UDFs)
    sources/       partitioned parquet tier tables, checkpoint manifest
    plans/         the flagship copy/rollup job (reference entry point 2)
    streaming/     incremental AvailableNow-style batch runner
"""

__version__ = "0.1.0"
