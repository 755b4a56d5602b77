"""PySpark-native analytics engine with the capabilities of
``YamtalDev/rust-query-engine-greatest`` (a Spark-semantics ``greatest``
kernel on top of a vendored DataFusion v42 query engine).

Design inversion (see SURVEY.md §7): the reference built an engine and
proved Spark-equivalence for one function; here the engine IS Spark
(Catalyst + Tungsten + AQE), and the effort goes into surface parity,
oracle-verified correctness, and 100-TB-scale discipline.

Layout:
    session    — SparkSession factory with scale-sane confs
    sources/   — table catalog + readers/writers (SURVEY §2.1)
    functions/ — compat layer for DataFusion-only scalar fns (§2.8)
    operators/ — join/agg/window/distinct-on/recursive helpers (§2.2-2.7)
    plans/     — plan introspection (pushdown/broadcast assertions)
    pipeline/  — large-scale training-data ops (dedup, ANN, text, multimodal)
    streaming/ — Structured Streaming parity surface (§2.9)
    queries/   — registered query inventory with DuckDB oracle SQL
"""

__version__ = "0.1.0"
