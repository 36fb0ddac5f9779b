"""Text analysis operators: language-ID, quality scoring, token
counting, document fingerprinting.

All JVM-side (pyspark.sql.functions only — no Python in the hot
path); ratios exported as integer per-mille values so DuckDB oracles
hash-match without float drift.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pdfwf_spark.operators.dedup import tokens

# tiny deterministic marker vocabularies (n-gram-heuristic stand-in;
# a production list would be per-language frequency tables)
LANG_MARKERS = {
    "en": ("the", "and", "of", "to", "is", "a"),
    "es": ("el", "la", "de", "que", "y", "los"),
    "fr": ("le", "la", "les", "des", "et", "un"),
}

STOPWORDS = ("the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "for", "on")

FP_MOD = 1_000_000_007
FP_BASE = 31


def token_count(text_col: Column) -> Column:
    """Count of NON-EMPTY tokens: split('\\s+') emits '' at whitespace
    edges (and [''] for blank text — including tab/newline-only text
    that a spaces-only trim() check misses), so filter empties instead
    of special-casing blank."""
    return F.size(F.filter(tokens(text_col), lambda x: x != "")).alias("n_tokens")


def _count_in(toks: Column, vocab: tuple[str, ...]) -> Column:
    return F.size(F.filter(toks, lambda x: x.isin(*vocab)))


def with_text_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """n_tokens, n_chars, avg token length (per-mille), stopword and
    punctuation ratios (per-mille) — the quality-score feature row.

    Blank/whitespace-only text counts 0 tokens (split('') -> ['']
    would otherwise claim 1) and zero ratios, agreeing with
    token_count — the two operators must never disagree on a doc."""
    t = tokens(F.col(text_col))
    n_tok = token_count(F.col(text_col))
    blank = n_tok == 0
    n_stop = _count_in(t, STOPWORDS)
    n_punct = F.length(F.col(text_col)) - F.length(
        F.regexp_replace(F.col(text_col), r"[.,;:!?]", "")
    )
    safe_tok = F.greatest(n_tok, F.lit(1))
    return (
        docs.withColumn("n_tokens", n_tok)
        .withColumn("n_chars", F.length(F.col(text_col)))
        .withColumn(
            "avg_token_len_milli",
            F.when(blank, F.lit(0)).otherwise(
                F.round(
                    1000
                    * F.length(F.regexp_replace(F.col(text_col), r"\s+", ""))
                    / safe_tok
                ).cast("int")
            ),
        )
        .withColumn(
            "stopword_milli",
            F.when(blank, F.lit(0)).otherwise(
                F.round(1000 * n_stop / safe_tok).cast("int")
            ),
        )
        .withColumn(
            "punct_milli",
            F.round(1000 * n_punct / F.greatest(F.length(F.col(text_col)), F.lit(1)))
            .cast("int"),
        )
    )


def with_quality_score(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Composite quality heuristic in [0, 1000]: rewards stopword
    presence (real prose), mid-range token length, low punctuation
    noise. Deterministic integer arithmetic; an EMPTY document scores
    0 (not the punct-component's 300)."""
    d = with_text_stats(docs, text_col)
    stop_component = F.least(F.col("stopword_milli") * 3, F.lit(400))
    len_component = F.when(
        (F.col("avg_token_len_milli") >= 3000) & (F.col("avg_token_len_milli") <= 9000),
        F.lit(300),
    ).otherwise(F.lit(0))
    punct_component = F.greatest(F.lit(0), F.lit(300) - F.col("punct_milli") * 3)
    return d.withColumn(
        "quality_milli",
        F.when(F.col("n_tokens") == 0, F.lit(0)).otherwise(
            (stop_component + len_component + punct_component).cast("int")
        ),
    )


def with_lang_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-token language ID: argmax over per-language marker
    counts; 'und' when no markers hit. Ties break in LANG_MARKERS key
    order (deterministic)."""
    t = tokens(F.col(text_col))
    entries = [
        F.struct(
            (-_count_in(t, markers)).alias("neg_score"),
            F.lit(i).alias("ord"),
            F.lit(lang).alias("lang"),
        )
        for i, (lang, markers) in enumerate(LANG_MARKERS.items())
    ]
    best = F.sort_array(F.array(*entries))[0]
    return docs.withColumn(
        "lang_pred",
        F.when(best["neg_score"] < 0, best["lang"]).otherwise(F.lit("und")),
    )


def with_fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Order-sensitive rolling document fingerprint.

    fp = sum_i( h(tok_i) * BASE^(i mod 8) ) mod FP_MOD, with
    h(tok) = first 4 md5 hex digits as int — fully expressible in both
    Spark SQL and DuckDB SQL (oracle parity), overflow-safe in int64.
    """
    t = tokens(F.col(text_col))
    weights = [pow(FP_BASE, p, FP_MOD) for p in range(8)]
    w_arr = F.array(*[F.lit(w) for w in weights])
    terms = F.transform(
        t,
        lambda x, i: (
            F.conv(F.substring(F.md5(x), 1, 4), 16, 10).cast("long")
            * F.element_at(w_arr, (F.pmod(i, F.lit(8)) + 1).cast("int"))
        )
        % F.lit(FP_MOD),
    )
    fp = F.aggregate(terms, F.lit(0).cast("long"), lambda acc, x: (acc + x) % FP_MOD)
    return docs.withColumn("fingerprint", fp)
