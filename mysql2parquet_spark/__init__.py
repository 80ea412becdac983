"""mysql2parquet_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of
debeando/mysql2parquet (reference: /root/reference/main.go, a ~205-LoC Go
CLI that pushes a SQL string to MySQL and streams the result set into a
local Parquet file). The reference owns no relational operators of its own
(main.go:106 — `db.Query(*fQuery)` sends the raw query to the server), so
this engine re-owns the full delegated SQL surface natively on Spark
(DataFrame/SQL/Catalyst), adds the reference's MySQL-source → Parquet-sink
pipeline via Spark JDBC, and extends it with LLM-data-pipeline operators
(dedup, similarity search, text analysis, multimodal columns) designed for
100 TB scale.

Layout:
    session     SparkSession builder (AQE on, sane shuffle defaults)
    io          parquet/JDBC sources, parquet sink, table loaders
    compat      reference type-mapping quirks as an opt-in projection
    cli         CLI mirroring the reference's flag surface (main.go:58-85)
    operators/  relational, dedup, similarity, text, multimodal
    functions/  vector math, hashing helpers (built-in-function first)
    queries/    named correctness queries + DuckDB oracle SQL
    streaming/  structured-streaming sources/sinks/windows/state
"""

__version__ = "0.1.0"
