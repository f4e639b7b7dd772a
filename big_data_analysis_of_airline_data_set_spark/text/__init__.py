from .analysis import (
    tokens_col,
    token_count,
    bpe_style_token_count,
    winnowing_fingerprints,
    normalized_text,
    content_fingerprint,
    stopword_count,
    lang_id_expr,
    quality_components,
    LANG_STOPWORDS,
)

__all__ = [
    "tokens_col",
    "token_count",
    "bpe_style_token_count",
    "winnowing_fingerprints",
    "normalized_text",
    "content_fingerprint",
    "stopword_count",
    "lang_id_expr",
    "quality_components",
    "LANG_STOPWORDS",
]
