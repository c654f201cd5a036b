"""etl__project_spark — a PySpark-native star-schema ETL / analytics engine.

Re-implements, Spark-first, the query and data-processing capabilities of
the reference project ``qiaoqiaohejianjian/ETL--Project`` (a pandas-Lambda →
Redshift / Snowflake VideoStart star-schema pipeline), plus the
large-scale training-data-pipeline operators (dedup, similarity search,
text analysis, multimodal plumbing) that a 100 TB deployment needs.

Layout
------
- ``session``    SparkSession factory tuned for local testing / cluster scale
- ``sources``    readers (CSV with reference quote/escape semantics, parquet,
                 JSON) and the test-table loader
- ``functions``  scalar column-expression kit (SURVEY.md §2.3 C1-C12)
- ``operators``  relational operators: filters (F1/F1b/F2), dimension
                 derivation (A1), surrogate keys (I1), SCD1/SCD2 upsert (J1),
                 star fact build (J2), merge-dedup (J3), audits (A3/A4)
- ``plans``      batch orchestration (the reference's two-Lambda pipeline as
                 one DataFrame program)
- ``streaming``  Structured Streaming equivalent of the Snowpipe → stream →
                 task-DAG path (T1-T5)
- ``datapipe``   beyond-the-reference: exact/near dedup, MinHash-LSH,
                 SimHash, ANN similarity, text quality analysis, multimodal
                 column plumbing
"""

__version__ = "0.1.0"
