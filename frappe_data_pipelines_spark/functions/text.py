"""Text-analysis scalar expressions — all JVM-side built-ins.

Covers the reference's scalar surface (SURVEY §2.H) plus the text-analysis
operators a training-data pipeline needs: tokenization, language ID
(unicode-range heuristic — reference: services/ocr_service.py:189-226),
quality ratios, token counting, and document fingerprinting. Everything here
is a Column expression (whole-stage codegen), deliberately mirrorable in ANSI
SQL for the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# A small fixed English stopword list (deterministic; shared with oracle SQL).
STOPWORDS = ["the", "a", "an", "and", "or", "of", "to", "in", "is", "it"]

# Word tokens: runs of alphanumerics (BPE-ish lower bound for token counting).
TOKEN_PATTERN = "[^a-zA-Z0-9]+"


def tokens_expr(text: Column) -> Column:
    """Lowercased word tokens; empty strings filtered out."""
    return F.filter(F.split(F.lower(text), TOKEN_PATTERN), lambda t: t != "")


def token_count_expr(text: Column) -> Column:
    return F.size(tokens_expr(text)).cast("bigint")


def punct_ratio_expr(text: Column) -> Column:
    """(# non-alnum-non-space chars) / length."""
    stripped = F.regexp_replace(text, "[a-zA-Z0-9\\s]", "")
    return F.try_divide(F.length(stripped).cast("double"), F.length(text))


def stopword_ratio_expr(text: Column) -> Column:
    toks = tokens_expr(text)
    sw = F.array(*[F.lit(s) for s in STOPWORDS])
    n_sw = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return F.try_divide(n_sw.cast("double"), F.size(toks))


def detect_language_expr(text: Column) -> Column:
    """Unicode-range language heuristic (reference ocr_service.py:189-226):
    Arabic block → 'ar', CJK block → 'zh', ASCII letters → 'en',
    else 'unknown'. Returns the single dominant tag (string)."""
    return (
        F.when(text.rlike("[\\u0600-\\u06FF]"), F.lit("ar"))
        .when(text.rlike("[\\u4E00-\\u9FFF]"), F.lit("zh"))
        .when(text.rlike("[a-zA-Z]"), F.lit("en"))
        .otherwise(F.lit("unknown"))
    )


def fingerprint_expr(text: Column) -> Column:
    """Document fingerprint: md5 of whitespace-normalized lowercase text.
    Used by exact dedup; portable to DuckDB as
    ``md5(lower(trim(regexp_replace(text,'\\s+',' ','g'))))``."""
    norm = F.trim(F.regexp_replace(F.lower(text), "\\s+", " "))
    return F.md5(norm.cast("binary"))


def md5_bucket_expr(
    key: Column, salt: str, n_hex: int = 8, mod: int | None = None
) -> Column:
    """The engine's ONE deterministic hash-bucket convention: BIGINT from
    the first ``n_hex`` hex digits of ``md5(salt || key)``, optionally
    ``% mod``. Every split/shard/digest assignment routes through this so
    prefix length, salt placement, and casts can't drift between call
    sites — the DuckDB mirror is
    ``CAST(('0x' || substring(md5('<salt>' || key), 1, n)) AS BIGINT) % m``.
    ``n_hex`` must stay <= 15 so the value fits a signed BIGINT."""
    if not 1 <= n_hex <= 15:
        raise ValueError("n_hex must be in 1..15 (signed BIGINT budget)")
    raw = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt), key.cast("string")).cast("binary")), 1, n_hex
        ),
        16,
        10,
    ).cast("bigint")
    return raw if mod is None else raw % mod


def quality_score_expr(text: Column) -> Column:
    """Composite quality heuristic in [0,1]: rewards mid-length docs, low
    punctuation, presence of stopwords (prose-likeness). Deterministic and
    SQL-mirrorable."""
    length_score = F.least(F.length(text).cast("double") / F.lit(1000.0), F.lit(1.0))
    punct_penalty = F.least(punct_ratio_expr(text) * 5.0, F.lit(1.0))
    sw = stopword_ratio_expr(text)
    prose_score = F.least(sw * 5.0, F.lit(1.0))
    raw = (length_score + (1.0 - punct_penalty) + prose_score) / 3.0
    # floor-based 6-dp cut: deterministic across engines on identical doubles
    # (round()'s half-up tie handling can differ at representation boundaries)
    return F.floor(raw * 1_000_000) / 1_000_000
