from flink_gmall_spark.functions.parity import MONEY, dec_sum, half_up_x100  # noqa: F401
from flink_gmall_spark.functions.tokenize import TOKEN_SPLIT_RE, tokens_col, tokenize_udf  # noqa: F401
