"""Text-analysis functions for large-scale training-data pipelines:
tokenization, quality scoring, language ID, fingerprinting.

All pure Catalyst expressions (no Python UDFs): at 100 TB of text the
scan must stay inside whole-stage codegen; a row-at-a-time Python hop
on the hot path would dominate the runtime (SURVEY.md §2.9 rationale).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# A "BPE-ish" pre-tokenizer: letter runs, single digits, single
# punctuation marks. Mirrors the common byte-level BPE pre-split shape.
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"

EN_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")

PUNCT_CLASS = r"[.,!?;:]"


def words(col: Column) -> Column:
    """Whitespace tokenization -> array<string>. NB: Spark's split on
    an EMPTY string yields [""] (one empty token), never [] — callers
    counting or dividing by size(words(x)) must guard length==0
    themselves, as token_count_ws does."""
    return F.split(F.trim(col), r"\s+")


def token_count_ws(col: Column) -> Column:
    """Whitespace token count."""
    return F.when(F.length(F.trim(col)) == 0, F.lit(0)).otherwise(
        F.size(words(col))
    )


def token_count_bpe_ish(col: Column) -> Column:
    """Count of BPE-ish pre-tokens (letter runs / digits / punct marks)."""
    return F.size(F.regexp_extract_all(col, F.lit(BPE_ISH_PATTERN), 0))


def char_count(col: Column) -> Column:
    return F.length(col)


def punct_ratio(col: Column) -> Column:
    """Fraction of characters that are punctuation ([.,!?;:]).
    Denominator floored at 1 (r8): an EMPTY string crashed every
    quality consumer under ANSI divide-by-zero; ''/NULL-safe ratio 0
    is the contract, mirrored in every oracle's greatest(length, 1)."""
    n_punct = F.length(col) - F.length(F.regexp_replace(col, PUNCT_CLASS, ""))
    return n_punct / F.greatest(F.length(col), F.lit(1))


def alpha_ratio(col: Column) -> Column:
    """Fraction of characters that are ASCII letters (0 for the empty
    string — see punct_ratio's denominator note)."""
    n_alpha = F.length(F.regexp_replace(col, r"[^A-Za-z]", ""))
    return n_alpha / F.greatest(F.length(col), F.lit(1))


def stopword_ratio(col: Column, stopwords: tuple[str, ...] = EN_STOPWORDS) -> Column:
    """Fraction of whitespace tokens that are (lowercase) stopwords."""
    toks = words(F.lower(col))
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*stopwords)))
    n = F.size(toks)
    return F.when(n == 0, F.lit(0.0)).otherwise(n_stop / n)


def quality_score(col: Column) -> Column:
    """Composite heuristic quality in [0,1]: rewards alphabetic content
    and mid-range length, penalizes punctuation soup. Deterministic and
    engine-portable (plain arithmetic over the ratios above)."""
    length_term = F.least(F.length(col) / F.lit(500.0), F.lit(1.0))
    q = 0.5 * alpha_ratio(col) + 0.3 * length_term + 0.2 * (1 - punct_ratio(col))
    # floor-truncation, not round(): portable at decimal ties (see the
    # float-output contract note in plans/registry.py's docstring)
    return F.floor(q * 10000) / F.lit(10000.0)


def _marker_count(toks: Column, markers: tuple[str, ...]) -> Column:
    return F.size(F.filter(toks, lambda t: t.isin(*markers)))


LANG_MARKERS = {
    "en": ("the", "a", "is", "and", "of"),
    "de": ("der", "die", "das", "und", "nicht"),
    "fr": ("le", "la", "et", "les", "des"),
    "es": ("el", "los", "y", "que", "una"),
}
CJK_PATTERN = "[一-鿿]"


def lang_id(col: Column) -> Column:
    """n-gram/marker-word language heuristic -> 'zh'|'de'|'fr'|'es'|'en'|'und'.

    Ladder: CJK characters win outright; otherwise the highest
    marker-word count with a fixed precedence (de > fr > es > en) on
    ties; no markers at all -> 'und'(etermined).
    """
    toks = words(F.lower(col))
    s = {k: _marker_count(toks, v) for k, v in LANG_MARKERS.items()}
    has_cjk = col.rlike(CJK_PATTERN)
    no_markers = (s["en"] + s["de"] + s["fr"] + s["es"]) == 0
    return (
        F.when(has_cjk, F.lit("zh"))
        .when(no_markers, F.lit("und"))
        .when((s["de"] >= s["fr"]) & (s["de"] >= s["es"]) & (s["de"] > s["en"]), "de")
        .when((s["fr"] >= s["es"]) & (s["fr"] > s["en"]), "fr")
        .when(s["es"] > s["en"], "es")
        .otherwise(F.lit("en"))
    )


def lang_scores(toks: Column) -> dict[str, Column]:
    """Marker-word count per language over a MATERIALIZED token array
    (see word_shingles' docstring for why: every reference to a
    non-attribute expression re-evaluates it, so callers should stage
    these counts in their own projection before combining them)."""
    return {k: _marker_count(toks, v) for k, v in LANG_MARKERS.items()}


def lang_decision(
    s_en: Column, s_de: Column, s_fr: Column, s_es: Column, has_cjk: Column
) -> Column:
    """The lang_id decision ladder over pre-computed score columns."""
    no_markers = (s_en + s_de + s_fr + s_es) == 0
    return (
        F.when(has_cjk, F.lit("zh"))
        .when(no_markers, F.lit("und"))
        .when((s_de >= s_fr) & (s_de >= s_es) & (s_de > s_en), "de")
        .when((s_fr >= s_es) & (s_fr > s_en), "fr")
        .when(s_es > s_en, "es")
        .otherwise(F.lit("en"))
    )


def fingerprint(col: Column) -> Column:
    """Deterministic document fingerprint: md5 of the
    whitespace-normalized lowercase text. Engine-portable (md5 is
    standard); use ``fingerprint64`` for a cheaper JVM-only variant."""
    return F.md5(F.lower(F.regexp_replace(F.trim(col), r"\s+", " ")))


def fingerprint64(col: Column) -> Column:
    """64-bit xxhash fingerprint -- cheaper than md5 at scale (no hex
    string materialized); Spark-side only (no portable SQL twin)."""
    return F.xxhash64(F.lower(F.regexp_replace(F.trim(col), r"\s+", " ")))
