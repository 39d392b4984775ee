"""Text-analysis operators over the documents table (SURVEY.md §2 B31).

Language ID, quality scoring, token counting, fingerprinting — all
JVM-side except language ID (an n-gram-profile Pandas UDF, Arrow-
batched).  At 100 TB these are embarrassingly parallel scans: no
shuffle except the term-frequency groupBy, which map-side combines
down to vocabulary size.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from ..functions.exact import davg, sql_davg
from ..io import table
from ..registry import query

#: Stopword set for ratio features (tiny, deterministic, shared with the
#: oracle SQL below).
STOPWORDS = ("the", "a", "of", "and", "in")

_SQL_STOP = "('" + "', '".join(STOPWORDS) + "')"


@query(
    "b31_text_stats",
    oracle=f"""
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars_calc,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           round(CAST(length(replace(text, ' ', '')) AS DOUBLE)
                 / len(string_split(text, ' ')), 4) AS avg_token_len,
           round(CAST(len(list_filter(string_split(text, ' '),
                                      t -> t IN {_SQL_STOP})) AS DOUBLE)
                 / len(string_split(text, ' ')), 4) AS stopword_ratio
    FROM documents
    """,
)
def b31_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B31: per-document quality features — char/token counts, mean
    token length, stopword ratio.  Pure narrow projection."""
    d = table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n_toks = F.size(toks).cast("bigint")
    return d.select(
        "doc_id",
        F.length("text").cast("bigint").alias("n_chars_calc"),
        n_toks.alias("n_tokens"),
        F.round(
            F.length(F.replace("text", F.lit(" "), F.lit(""))).cast("double") / n_toks,
            4,
        ).alias("avg_token_len"),
        F.round(
            F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS))).cast("double")
            / n_toks,
            4,
        ).alias("stopword_ratio"),
    )


@query(
    "b31_quality_score",
    oracle=f"""
    WITH feats AS (
        SELECT doc_id, lang,
               len(string_split(text, ' ')) AS n_tokens,
               CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                   / len(string_split(text, ' ')) AS ttr,
               CAST(len(list_filter(string_split(text, ' '),
                                    t -> t IN {_SQL_STOP})) AS DOUBLE)
                   / len(string_split(text, ' ')) AS stop_ratio
        FROM documents
    )
    SELECT doc_id, lang,
           round(0.4 * least(n_tokens / 100.0, 1.0)
                 + 0.4 * ttr
                 + 0.2 * least(stop_ratio * 5.0, 1.0), 6) AS quality
    FROM feats
    """,
)
def b31_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B31: composite quality score (length + type-token ratio +
    stopword presence), the usual pre-training heuristic filter shape."""
    d = table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n = F.size(toks).cast("double")
    ttr = F.size(F.array_distinct(toks)).cast("double") / n
    stop = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS))).cast("double") / n
    return d.select(
        "doc_id",
        "lang",
        F.round(
            0.4 * F.least(n / 100.0, F.lit(1.0))
            + 0.4 * ttr
            + 0.2 * F.least(stop * 5.0, F.lit(1.0)),
            6,
        ).alias("quality"),
    )


@query(
    "b31_term_freq",
    oracle="""
    SELECT t.token, count(*) AS n, count(DISTINCT doc_id) AS df
    FROM documents, unnest(string_split(text, ' ')) AS t(token)
    GROUP BY t.token
    """,
)
def b31_term_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B31: corpus term + document frequencies (explode → groupBy;
    map-side combine collapses to vocabulary size before the shuffle)."""
    d = table(spark, sf_dir, "documents")
    return (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"), F.countDistinct("doc_id").alias("df"))
    )


@query(
    "b31_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))),
                               ' ')) AS fingerprint
    FROM documents
    """,
)
def b31_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B31: order-insensitive document fingerprint (sorted distinct
    token set → md5) — the cheap bag-of-words content address."""
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5(
            F.array_join(F.array_sort(F.array_distinct(F.split("text", " "))), " ")
        ).alias("fingerprint"),
    )


@query(
    "b31_lang_stats",
    oracle=f"""
    SELECT lang, count(*) AS n_docs, {sql_davg('n_chars')} AS avg_chars
    FROM documents
    GROUP BY lang
    """,
)
def b31_lang_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B31: per-language corpus profile (the filter knob for
    language-targeted training mixes)."""
    d = table(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"), davg("n_chars").alias("avg_chars")
    )


# Character-trigram profiles per language for the heuristic classifier.
# Deterministic and tiny on purpose: the *plumbing* (Arrow-batched
# pandas UDF over a scan) is the engine feature; swap profiles for a
# real model (fastText etc.) in production.
_LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "ing", " th", "ion"),
    "es": ("ión", " de", "los", "ar ", "que"),
    "fr": ("les", " le", "ent", "tion", " de"),
    "de": ("der", "sch", "ein", "ung", "cht"),
    "zh": ("的", "数", "表", "行", "列"),
}


@pandas_udf(T.StringType())
def langid_udf(texts: pd.Series) -> pd.Series:
    def classify(t: str) -> str:
        if t is None:
            return "und"
        best, best_score = "und", 0
        for lang, markers in _LANG_MARKERS.items():
            score = sum(t.count(m) for m in markers)
            if score > best_score:
                best, best_score = lang, score
        return best

    return texts.map(classify)


@query("b31_langid")  # heuristic model → rows-only check
def b31_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B31: n-gram-marker language ID as an Arrow-batched pandas UDF —
    the vectorized slow path, used only because the logic is genuinely
    non-relational.  tests/test_llmops.py asserts ≥80% agreement with
    the corpus lang label on en docs."""
    d = table(spark, sf_dir, "documents")
    return d.select("doc_id", "lang", langid_udf(F.col("text")).alias("lang_pred"))


#: GPT-2-style pre-tokenizer regex, restricted to constructs both Java
#: regex (Spark) and RE2 (DuckDB) support — i.e. no lookahead; the
#: trailing-space refinement BPE uses is immaterial for *counting*.
#: Alternation order matters (leftmost-first in both engines): keep it
#: identical on both sides.
BPE_REGEX = r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"


@query(
    "b31_bpe_token_count",
    oracle=f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{BPE_REGEX.replace("'", "''")}')) AS BIGINT)
               AS n_bpe_tokens,
           CAST(len(list_distinct(regexp_extract_all(text,
                '{BPE_REGEX.replace("'", "''")}'))) AS BIGINT) AS n_unique_tokens
    FROM documents
    """,
)
def b31_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B31: BPE-ish token counting — the LLM-pipeline length signal
    (whitespace counting undercounts punctuation-heavy text).  One
    narrow JVM-side regexp_extract_all projection, hash-checked against
    DuckDB's RE2 on the byte-identical pattern."""
    d = table(spark, sf_dir, "documents")
    toks = F.regexp_extract_all("text", F.lit(BPE_REGEX), 0)
    return d.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_bpe_tokens"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("n_unique_tokens"),
    )


@query(
    "b31_gopher_filters",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, lang,
             string_split(text, ' ') AS toks,
             len(string_split(text, ' ')) AS n_words,
             length(replace(text, ' ', '')) AS n_nonspace
      FROM documents)
    SELECT doc_id, lang, n_words,
           (n_words BETWEEN 5 AND 10000)                          AS ok_len,
           (n_nonspace::DOUBLE / n_words BETWEEN 2 AND 12)        AS ok_word_len,
           (len(list_filter(toks, x -> regexp_matches(x, '[a-z]')))::DOUBLE
              / n_words >= 0.8)                                   AS ok_alpha,
           (len(list_filter(toks, x -> x IN {_SQL_STOP}))::DOUBLE
              / n_words >= 0.01)                                  AS ok_stop,
           ((n_words BETWEEN 5 AND 10000)
            AND (n_nonspace::DOUBLE / n_words BETWEEN 2 AND 12)
            AND (len(list_filter(toks, x -> regexp_matches(x, '[a-z]')))::DOUBLE
                   / n_words >= 0.8)
            AND (len(list_filter(toks, x -> x IN {_SQL_STOP}))::DOUBLE
                   / n_words >= 0.01))                            AS keep
    FROM t
    """,
)
def b31_gopher_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B31: Gopher/C4-style rule-based quality gate (Rae et al. 2021
    §A1-style heuristics, thresholds adapted to the synthetic corpus):
    word-count bounds, mean-word-length bounds, alphabetic-word
    fraction, stopword-presence floor, and the conjunctive keep bit.
    Emitting per-rule booleans (not just the verdict) is deliberate —
    at corpus scale you audit WHICH rule kills documents before you
    trust the gate.  All ratios are integer-count divisions, so the
    threshold comparisons are bit-deterministic cross-engine.  One
    map-side pass, no shuffle, no UDF."""
    d = table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n_words = F.size(toks)
    mean_wl = (
        F.length(F.regexp_replace("text", " ", "")).cast("double") / n_words
    )
    alpha = (
        F.size(F.filter(toks, lambda t: t.rlike("[a-z]"))).cast("double") / n_words
    )
    stop = (
        F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS))).cast("double") / n_words
    )
    ok_len = n_words.between(5, 10000)
    ok_word_len = mean_wl.between(2, 12)
    ok_alpha = alpha >= 0.8
    ok_stop = stop >= 0.01
    return d.select(
        "doc_id",
        "lang",
        n_words.cast("long").alias("n_words"),
        ok_len.alias("ok_len"),
        ok_word_len.alias("ok_word_len"),
        ok_alpha.alias("ok_alpha"),
        ok_stop.alias("ok_stop"),
        (ok_len & ok_word_len & ok_alpha & ok_stop).alias("keep"),
    )
