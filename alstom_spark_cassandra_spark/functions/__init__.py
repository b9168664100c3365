from .filter_compiler import compile_filter
from .text_funcs import (
    doc_fingerprint,
    language_id,
    quality_score,
    token_count,
)

__all__ = [
    "compile_filter",
    "doc_fingerprint",
    "language_id",
    "quality_score",
    "token_count",
]
