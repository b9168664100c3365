"""PySpark-native analytics engine with the query/data-processing
capabilities of the reference project alexandrehly/Alstom-Spark-Cassandra
(a Spark/Cassandra + MySQL stored-procedure system for reconstructing
field state from an append-only change log).

Architecture: idiomatic PySpark DataFrame/SQL. The reference's
temp-table stages, correlated-UDF lookups, and WHILE loops are
re-expressed as single lazy Catalyst plans (window argmax, anti-joins,
explode, pivot+LOCF). See SURVEY.md in the repo root for the full
capability map (reference file:line citations live in each module's
docstrings).

Layout:
  session     - SparkSession factory tuned for local[N] + AQE
  sources     - schema registry + parquet/catalog loaders (ref: DataLoader.java)
  operators   - reusable relational building blocks (argmax, as-of,
                set-diff, JSON flatten, LOCF/pivot, dedup, similarity, ...)
  functions   - scalar helpers (filter compiler, text metrics)
  plans       - the public query API mirroring the reference procedures
  streaming   - structured-streaming "online mode" (live latest-value)
"""

__version__ = "0.1.0"
