"""flink_gmall_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the ``sikangliu/flink-gmall`` reference
(a Flink 1.12 real-time e-commerce data warehouse), rebuilt Spark-first.

Layering mirrors the reference's warehouse layers (see SURVEY.md):

- ``sources``   — table readers over the driver's parquet star schema.
- ``plans.dwd`` — parse/clean/route (BaseLogApp / BaseDBApp semantics).
- ``plans.dwm`` — derived wide streams (OrderWideApp, PaymentWideApp,
                  UniqueVisitApp, UserJumpDetailApp semantics).
- ``plans.dws`` — windowed aggregate stats tables (VisitorStatsApp,
                  ProductStatsApp, ProvinceStatsSqlApp, KeywordStatsApp).
- ``plans.ads`` — batch query surface (gmall-publisher mapper SQL).
- ``operators`` — LLM-data-pipeline operators beyond the reference:
                  dedup (exact/minhash/simhash/ngram-jaccard), ANN
                  similarity search, text analysis, multimodal columns.
- ``streaming`` — Structured Streaming jobs + ``applyInPandasWithState``
                  stateful operators (T1/T2/T3 of SURVEY §2.6).
- ``registry``  — the single source of truth: every query's DataFrame
                  builder paired with its DuckDB oracle SQL.

Oracle-parity conventions (every query obeys these so that the driver's
order-insensitive value hash matches DuckDB bit-for-bit):

1. Session timezone is forced to UTC at query build time; timestamps are
   rendered to strings (``yyyy-MM-dd HH:mm:ss``), never returned raw.
2. Money/double sums go through ``DECIMAL(18,2)`` (exact, order-independent)
   and the final column is cast back to ``DOUBLE``.
3. Rounded ratios use pure integer arithmetic (HALF_UP at 2dp is
   ``(200*num + den) DIV (2*den)``), never ``round()`` on doubles.
4. Every ``ORDER BY ... LIMIT`` has a total-order tiebreaker.
5. Output types are only BIGINT / STRING / DOUBLE (exactified as above).
"""

from flink_gmall_spark.session import get_spark, tune  # noqa: F401

__version__ = "0.1.0"
