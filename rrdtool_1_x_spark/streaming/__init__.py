from rrdtool_1_x_spark.streaming.ingest import StreamingIngest  # noqa: F401
