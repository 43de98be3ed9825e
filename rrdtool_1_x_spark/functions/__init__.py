from rrdtool_1_x_spark.functions.nanops import (  # noqa: F401
    addnan,
    cmp_nan,
    if_nan,
    limit,
    max_nan_contaminating,
    min_nan_contaminating,
    nan_to_null,
)
