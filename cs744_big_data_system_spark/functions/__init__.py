from cs744_big_data_system_spark.functions.vectors import (  # noqa: F401
    cosine_similarity,
    dot,
    l2_norm,
    vec_argmax,
)
from cs744_big_data_system_spark.functions.text import (  # noqa: F401
    normalized_text,
    punct_ratio,
    stopword_ratio,
    token_count,
    tokens,
    word_ngrams,
)
