from etl__project_spark.streaming.pipeline import stream_star_load  # noqa: F401
