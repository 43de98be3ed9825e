from rrdtool_1_x_spark.sources.store import DatasetStore  # noqa: F401
