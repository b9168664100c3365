from .filter_compiler import compile_filter
from .quality_model import (
    feature_bucket,
    hashed_logit_milli,
    score_with_weights,
)
from .text_funcs import (
    doc_fingerprint,
    language_id,
    quality_score,
    token_count,
)

__all__ = [
    "compile_filter",
    "doc_fingerprint",
    "feature_bucket",
    "hashed_logit_milli",
    "language_id",
    "quality_score",
    "score_with_weights",
    "token_count",
]
