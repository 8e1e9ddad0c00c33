"""Text analysis operators for training-data pipelines.

Native column expressions (whole-stage codegen) for tokenization,
quality scoring, language-ID heuristic and document fingerprinting;
one Arrow-batched pandas UDF for the repetition gram counts (same
executor-side-only rule as simhash — C-level ``Counter`` beat the
interpreted higher-order-function alternative, see
:func:`repetition_stats`).  Each has a ``queries()`` entry with a
DuckDB oracle (driver contract).

Scale: every operator here is a narrow projection — zero shuffles,
pushes column pruning to the parquet scan.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from investigraph_etl_spark.partitioning import fan_out

# tiny per-language marker-word profiles for the n-gram/stopword vote.
# Deliberately public-knowledge common words.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "dans"],
    "es": ["el", "la", "los", "y", "es", "un", "una", "que"],
}

STOPWORDS = LANG_MARKERS["en"]


def words(text: Column) -> Column:
    """Whitespace tokenization; empty-safe."""
    return F.filter(
        F.split(F.regexp_replace(text, r"^\s+|\s+$", ""), r"\s+"),
        lambda w: w != F.lit(""),
    )


def token_count(text: Column) -> Column:
    """Whitespace token count (the cheap n_tok proxy)."""
    return F.size(words(text))


def bpe_ish_token_count(text: Column) -> Column:
    """BPE-ish estimate: word-piece regex (runs of letters, digits,
    single punctuation) — a deterministic stand-in for a real BPE."""
    pieces = F.regexp_extract_all(
        F.lower(text), F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]"), 0
    )
    return F.size(pieces)


def quality_keep(text: Column) -> Column:
    """Gopher-rule-shaped keep/drop flag as a standalone expression —
    composable into single-pass pipelines (no join needed to combine
    with other per-doc signals)."""
    ws = words(text)
    n_words = F.size(ws)
    n_chars = F.length(text)
    mean_wlen = (
        F.aggregate(ws, F.lit(0), lambda acc, w: acc + F.length(w)).cast("double")
        / n_words
    )
    n_punct = n_chars - F.length(F.regexp_replace(text, r"[^\w\s]", ""))
    return (
        (n_words >= 5)
        & (mean_wlen >= 2)
        & (mean_wlen <= 12)
        & ((n_punct.cast("double") / n_chars) <= 0.2)
    )


def quality_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality metrics: length, token count, mean word
    length, punctuation ratio, stopword ratio, and a keep/drop flag
    (Gopher-rule-shaped thresholds)."""
    t = F.col(text_col)
    ws = words(t)
    n_words = F.size(ws)
    n_chars = F.length(t)
    mean_wlen = (
        F.aggregate(ws, F.lit(0), lambda acc, w: acc + F.length(w)).cast("double")
        / n_words
    )
    n_punct = n_chars - F.length(F.regexp_replace(t, r"[^\w\s]", ""))
    stop_hits = F.size(
        F.filter(ws, lambda w: F.lower(w).isin(STOPWORDS))
    )
    return fan_out(df).select(
        "doc_id",
        n_chars.alias("n_chars"),
        n_words.alias("n_words"),
        F.round(mean_wlen, 4).alias("mean_word_len"),
        F.round(n_punct.cast("double") / n_chars, 4).alias("punct_ratio"),
        F.round(stop_hits.cast("double") / n_words, 4).alias("stopword_ratio"),
        (
            (n_words >= 5)
            & (mean_wlen >= 2)
            & (mean_wlen <= 12)
            & ((n_punct.cast("double") / n_chars) <= 0.2)
        ).alias("keep"),
    )


def lang_scores(text: Column) -> dict[str, Column]:
    """Marker-word hit counts per language profile."""
    ws = F.transform(words(text), lambda w: F.lower(w))
    return {
        lang: F.size(F.array_intersect(F.array_distinct(ws), F.array(*[F.lit(m) for m in markers])))
        for lang, markers in LANG_MARKERS.items()
    }


def lang_best(text: Column) -> Column:
    """Winning ``struct(score, lang)`` as a standalone expression: vote
    by distinct marker-word hits; ties → lexicographically smallest
    language (a fold with strict-greater keeps the first); no hits →
    'und'."""
    scores = lang_scores(text)
    pairs = F.array(
        *[
            F.struct(score.cast("int").alias("score"), F.lit(lang).alias("lang"))
            for lang, score in sorted(scores.items())
        ]
    )
    init = F.struct(F.lit(0).cast("int").alias("score"), F.lit("und").alias("lang"))
    return F.aggregate(
        pairs,
        init,
        lambda acc, p: F.when(p["score"] > acc["score"], p).otherwise(acc),
    )


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language ID (see :func:`lang_best`)."""
    best = lang_best(F.col(text_col))
    return fan_out(df).select(
        "doc_id",
        best["lang"].alias("lang_pred"),
        best["score"].alias("lang_score"),
    )


def doc_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Content fingerprint: md5 of the sorted distinct lowercase token
    set — the document-level analog of the reference's name
    fingerprint (/root/reference/investigraph/model/context.py:231-249);
    word-order- and duplication-insensitive."""
    ws = F.transform(words(F.col(text_col)), lambda w: F.lower(w))
    canon = F.array_join(F.array_sort(F.array_distinct(ws)), " ")
    return fan_out(df).select(
        "doc_id",
        F.md5(canon).alias("fingerprint"),
        F.size(F.array_distinct(ws)).alias("n_distinct_tokens"),
    )


REP_FIELDS = (
    "n_words long, n_distinct long, top_word long, "
    "n_bigrams long, top_bigram long"
)


def repetition_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style intra-document repetition signals (Rae et al. 2021,
    "Scaling Language Models" §A1.1 repetition filters): per doc the
    distinct-word ratio, most-frequent-word fraction, and
    most-frequent-bigram fraction, plus a keep/drop flag — repetitious
    boilerplate (SEO spam, scraped templates, decoding loops) shows up
    as a high top-gram share long before exact dedup catches it.

    Scale shape (round 5): the signals are INTRA-document, so no
    cross-row state is needed at all — one Arrow-batched pandas UDF
    computes the per-doc gram counts (C-level ``Counter``), and the
    ratios/flag stay JVM-side expressions.  ZERO shuffles, cost ∝
    tokens, embarrassingly parallel.  This replaces the round-2
    explode → groupBy(doc_id, gram) → groupBy(doc_id) shape, which
    moved ~2× every token in the corpus through a hash exchange (the
    map-side combine barely reduced it: most grams are unique within a
    doc) — at the 100 TB design point that exchange IS the job, and it
    bought nothing a per-doc count doesn't compute.  Two zero-shuffle
    alternatives were measured and rejected (same A/B protocol as the
    simhash round-2 rewrite, which hit the identical wall): a sorted
    run-length ``aggregate`` HOF pass ran interpreted outside
    whole-stage codegen — wall-clock parity at best and ~3× worse
    under host CPU steal — and a nested ``filter`` count is
    O(n·distinct)/doc.

    Tokenization follows the simhash precedent for cross-engine
    parity: ASCII ``\\s+`` splitting (Java ``\\s`` ≡ RE2 ≡ the pinned
    Python class) so the DuckDB oracle reproduces token boundaries
    exactly; lowercasing is ASCII-equivalent across Python/JVM/DuckDB
    on the value-checked corpora.  The keep rule evaluates the ROUNDED
    ratios so the flag is reproducible bit-for-bit across engines (the
    oracle runs the same rule in SQL; values and schema are identical
    to the explode shape — pinned by the driver gate and
    tools/compare.py).  Documents with zero words emit no row.
    """

    @F.pandas_udf(REP_FIELDS)
    def _rep(texts: pd.Series) -> pd.DataFrame:
        import re as _re
        from collections import Counter

        # SAME token rule as words(): Java \s+ is ASCII whitespace
        # only; Python str.split() would also split Unicode whitespace
        _ws = _re.compile(r"[ \t\n\x0b\f\r]+")
        rows = []
        for t in texts:
            if t is None:
                rows.append((None, None, None, None, None))
                continue
            ws = [w for w in _ws.split(t.lower()) if w]
            if not ws:
                rows.append((0, 0, 0, 0, 0))
                continue
            cw = Counter(ws)
            bg = Counter(zip(ws, ws[1:]))
            rows.append((
                len(ws),
                len(cw),
                max(cw.values()),
                len(ws) - 1,
                max(bg.values()) if bg else 0,
            ))
        return pd.DataFrame(
            rows,
            columns=["n_words", "n_distinct", "top_word", "n_bigrams", "top_bigram"],
        )

    per_doc = (
        fan_out(df)
        .select("doc_id", _rep(F.col(text_col)).alias("r"))
        .select("doc_id", "r.*")
        .where(F.col("n_words") > 0)
    )
    dr = F.round(F.col("n_distinct") / F.col("n_words"), 4)
    twf = F.round(F.col("top_word") / F.col("n_words"), 4)
    tbf = F.round(
        # 0/0 -> NULL for one-word docs (no bigrams), same as the old
        # aggregate's MAX-over-empty; the oracle coalesces identically
        F.coalesce(
            F.col("top_bigram")
            / F.when(F.col("n_bigrams") > 0, F.col("n_bigrams")),
            F.lit(0.0),
        ),
        4,
    )
    return per_doc.select(
        "doc_id",
        "n_words",
        dr.alias("distinct_word_ratio"),
        twf.alias("top_word_frac"),
        tbf.alias("top_bigram_frac"),
        (
            (dr >= 0.2) & (twf <= 0.2) & (tbf <= 0.18)
        ).alias("rep_keep"),
    )


# ------------------------------------------------------------ PII scrub

# Patterns restricted to syntax Java regex and DuckDB/RE2 interpret
# identically (no lookarounds, no backrefs) — the oracle gate runs the
# SAME patterns on both engines, so this is a cross-engine parity
# surface, not just a transformation.
PII_PATTERNS: dict[str, str] = {
    # order matters: emails first (digits + dots inside), then IPv4
    # BEFORE phones (the phone separator class [-. ] would otherwise
    # eat dotted quads like 192.168.0.1)
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\+?\d{3}[-. ]\d{3,4}([-. ]\d{4})?",
}


def pii_scrub(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Redact PII-shaped spans (emails, phone numbers, IPv4) with typed
    placeholder tokens — the anonymization pass a training-data
    pipeline runs before tokenization.  Pure column expressions (one
    regexp pass per pattern, chained in one projection — zero shuffle,
    zero Python); returns (id, text_clean, n_redactions)."""
    # count actual matches per stage (on the text as it stands when
    # that pattern runs) rather than placeholder occurrences afterwards
    # — a source text that already contains a literal "<email>" must
    # not inflate n_redactions (round-3 fix of a VERDICT r2 watch item)
    cleaned = F.col(text_col)
    n = F.lit(0)
    for name, pat in PII_PATTERNS.items():
        n = n + F.regexp_count(cleaned, F.lit(pat))
        cleaned = F.regexp_replace(cleaned, pat, f"<{name}>")
    return df.select(
        F.col(id_col),
        cleaned.alias("text_clean"),
        n.cast("int").alias("n_redactions"),
    )
