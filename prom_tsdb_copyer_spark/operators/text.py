"""Text analysis operators over a documents table (training-data
pipeline): token counting, quality scoring, language ID, fingerprinting.

All pure `pyspark.sql.functions` compositions (codegen'd, no UDFs), each
with a DuckDB-SQL twin for the oracle gate. Regex classes are kept to
portable explicit sets so Java regex and DuckDB (RE2) agree.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import M, hash60, shingle_col

STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "for", "on"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "dans", "pour", "que"],
}
PUNCT = ".,!?;:"


def _tokens(text: Column) -> Column:
    return F.filter(F.split(F.trim(text), r"\s+"), lambda t: t != "")


def token_counts(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, n_chars, n_tokens, n_distinct_tokens) -- whitespace tokenizer
    (the BPE-ish regex variant lives in the quality score's word stats)."""
    toks = _tokens(F.col(text_col))
    return docs.select(
        F.col(id_col),
        F.length(text_col).alias("n_chars"),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        # BPE-ish subword proxy: alnum runs + standalone symbols, the
        # usual pre-tokenizer shape, counted by regexp match (the
        # pattern avoids lookarounds so Java regex and RE2 agree)
        F.regexp_count(
            F.col(text_col), F.lit(r"[A-Za-z0-9]+|[^A-Za-z0-9\s]")
        ).alias("n_subword_tokens"),
    )


def _stopword_hits(toks: Column, lang: str) -> Column:
    words = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(toks, lambda t: F.array_contains(words, F.lower(t))))


def quality_scores(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic quality features + combined score:
    length score (saturating), punctuation density, stopword ratio,
    mean word length -- rounded to 4 for cross-engine hashing."""
    toks = _tokens(F.col(text_col))
    n_chars = F.length(text_col)
    n_tokens = F.size(toks)
    n_punct = n_chars - F.length(
        F.regexp_replace(F.col(text_col), f"[{PUNCT}]", "")
    )
    sw = _stopword_hits(toks, "en")
    punct_ratio = F.round(n_punct / F.greatest(n_chars, F.lit(1)), 4)
    stop_ratio = F.round(sw / F.greatest(n_tokens, F.lit(1)), 4)
    mean_word_len = F.round(
        (n_chars - (n_tokens - 1).cast("double")) / F.greatest(n_tokens, F.lit(1)), 4
    )
    length_score = F.round(F.least(n_chars / F.lit(500.0), F.lit(1.0)), 4)
    score = F.round(
        0.4 * length_score + 0.4 * stop_ratio + 0.2 * (1 - punct_ratio), 4
    )
    return docs.select(
        F.col(id_col),
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stopword_ratio"),
        mean_word_len.alias("mean_word_len"),
        length_score.alias("length_score"),
        score.alias("quality_score"),
    )


def language_id(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """n-gram-free stopword-vote language ID: argmax of per-language
    stopword hits, deterministic priority en > de > fr on ties, 'unk'
    when no list scores > 0."""
    toks = _tokens(F.col(text_col))
    en, de, fr = (_stopword_hits(toks, lang) for lang in ("en", "de", "fr"))
    # CJK: stopword voting is useless for unsegmented scripts -- use the
    # CJK-codepoint character fraction instead
    n_chars = F.greatest(F.length(text_col), F.lit(1))
    cjk_frac = (
        F.length(text_col)
        - F.length(F.regexp_replace(F.col(text_col), "[一-鿿]", ""))
    ) / n_chars
    best = F.greatest(en, de, fr)
    lang = (
        F.when(cjk_frac > 0.3, "zh")
        .when(best == 0, "unk")
        .when(en == best, "en")
        .when(de == best, "de")
        .otherwise("fr")
    )
    return docs.select(F.col(id_col), lang.alias("lang_pred"))


def fingerprints(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Winnowing-style document fingerprint: min over the rolling
    character-shingle hashes (one 30-bit value per doc -- the 1-hash
    degenerate of the minhash signature, cheap dedup prefilter)."""
    sh = docs.select(
        F.col(id_col), F.explode(shingle_col(F.col(text_col))).alias("sh")
    ).select(id_col, (hash60(F.col("sh")) % M).alias("hm"))
    return sh.groupBy(id_col).agg(F.min("hm").alias("fingerprint"))
