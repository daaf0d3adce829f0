from flink_gmall_spark.functions.parity import (  # noqa: F401
    dec_sum,
    half_up_x100,
    ts_str,
    window_bounds,
)
from flink_gmall_spark.functions.tokenize import TOKEN_SPLIT_RE, tokens_col, tokenize_udf  # noqa: F401
