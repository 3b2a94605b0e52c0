"""bigquery_etl_fork_spark — a PySpark-native CDC / incremental-ingest engine.

A from-scratch re-expression of the capabilities of Mozilla's bigquery-etl
(reference: /root/reference) on Apache Spark:

- ``lake``        — snapshot-manifest table format over bucketed Parquet with
                    atomic commits (the Iceberg-shaped storage layer; analog of
                    BigQuery partitioned/clustered tables + ``$date`` decorators,
                    reference ``bigquery_etl/copy_deduplicate.py:96``).
- ``engine``      — epoch-fenced CDC replay loop with checkpoint manifest and
                    per-partition lineage (analog of the shredder state table,
                    ``bigquery_etl/shredder/delete.py:169-243,713-726``).
- ``operators``   — LWW dedup, merge/upsert, delete-apply, skew salting,
                    text dedup (minhash/simhash), similarity search, bitmaps.
- ``functions``   — the scalar "UDF" library re-expressed as Column builders
                    (analog of ``sql/mozfun`` — zero-runtime-cost macros).
- ``sources``     — change-log and file sources; JSON export and
                    deterministic pre-shuffled training-shard export.
- ``streaming``   — micro-batch / Structured Streaming replay drivers with
                    a post-apply hook for live downstream derivations.
- ``engine.rollup`` — change-feed-driven incremental materialized views
                    (retract/add, version-fenced exactly-once refresh).
- ``plans``       — plan guards (pushdown/pruning asserts) and the
                    dependency-graph Pipeline runner (topological execution
                    with version-aware skipping).
- ``metadata`` / ``views`` — declarative table.yaml binder and
                    schema-enforcing view publishing.
"""

__version__ = "0.1.0"
