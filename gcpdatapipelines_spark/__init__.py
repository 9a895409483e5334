"""gcpdatapipelines_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and
data-processing capabilities of the reference ETL toolkit
(Bhavani-Rajan/GCPDataPipelines, Apache Beam on GCP Dataflow), per
SURVEY.md. All operators are declared with the DataFrame API so
Catalyst/Tungsten pick the physical strategy; Python UDFs are confined
to genuinely non-relational paths (Arrow-batched where used at all).

Layout:
    session     -- SparkSession factory (AQE, Arrow, sane shuffle sizing)
    io          -- sources (S1-S6) and sinks (K1-K5)
    operators/  -- rows (P*), agg (A*), joins (J*), pivot (§2.7),
                   windows, dedup, similarity, text, multimodal
    queries     -- the driver-facing catalog: queries() + oracle_sql()
"""

__version__ = "0.1.0"
