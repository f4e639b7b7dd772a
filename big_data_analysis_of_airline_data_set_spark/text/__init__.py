from .perplexity import bigrams_col, perplexity_scores
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
    quality_struct,
    gopher_rules_struct,
    stopword_count_of,
    LANG_STOPWORDS,
)

__all__ = [
    "bigrams_col",
    "perplexity_scores",
    "tokens_col",
    "token_count",
    "bpe_style_token_count",
    "winnowing_fingerprints",
    "normalized_text",
    "content_fingerprint",
    "stopword_count",
    "lang_id_expr",
    "quality_components",
    "quality_struct",
    "gopher_rules_struct",
    "stopword_count_of",
    "LANG_STOPWORDS",
]
