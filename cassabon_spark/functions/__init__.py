from cassabon_spark.functions.pearson import pearson_hash8, pearson_hash8_udf
from cassabon_spark.functions.vectors import cosine_sim_expr, dot_expr, l2_norm_expr
from cassabon_spark.functions import text

__all__ = [
    "pearson_hash8",
    "pearson_hash8_udf",
    "cosine_sim_expr",
    "dot_expr",
    "l2_norm_expr",
    "text",
]
