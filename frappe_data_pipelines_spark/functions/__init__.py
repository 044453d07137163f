from frappe_data_pipelines_spark.functions.vectors import (  # noqa: F401
    cosine_similarity,
    dot_product,
    l2_normalize,
    vector_norm,
)
from frappe_data_pipelines_spark.functions.text import (  # noqa: F401
    detect_language_expr,
    fingerprint_expr,
    punct_ratio_expr,
    stopword_ratio_expr,
    token_count_expr,
    tokens_expr,
)
