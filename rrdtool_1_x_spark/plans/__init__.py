from rrdtool_1_x_spark.plans.graph import Query, QueryResult  # noqa: F401
