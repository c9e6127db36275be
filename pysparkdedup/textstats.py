"""Text-analysis operators for training-data pipelines — all JVM-side column
algebra except winnowing (vectorized pandas UDF).

- token_count        : whitespace tokens + a BPE-ish subword estimate
- language-ID        : n-gram/stopword-marker heuristic, argmax over langs
- quality scoring    : length / punctuation / stopword / digit ratios
- fingerprinting     : winnowing (rolling k-gram hashes, window minima)

These generalize the reference's per-row derivation layer (size, timestamps,
normalized forms — ref mail.py:309-439) to web-text curation signals.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "was", "for", "that", "with"],
    "fr": ["le", "la", "et", "les", "des", "une", "dans", "pour", "est", "que"],
    "es": ["el", "la", "los", "las", "una", "para", "es", "con", "del", "por"],
    "de": ["der", "die", "das", "und", "ein", "ist", "von", "mit", "den", "des"],
    "zh": ["de", "shi", "zai", "le", "he", "you", "wei", "yu", "bu", "ta"],
}


def tokens_col(text_col: str = "text") -> Column:
    return F.filter(
        F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), r"\s+"),
        lambda t: t != "",
    )


def token_count(text_col: str = "text") -> Column:
    """Whitespace token count."""
    return F.size(tokens_col(text_col))


def subword_count(text_col: str = "text") -> Column:
    """BPE-ish token estimate: word-piece + digit + punctuation runs."""
    pieces = F.filter(
        F.split(
            F.coalesce(F.col(text_col), F.lit("")),
            r"(?<=[\p{L}])(?=[\p{N}])|(?<=[\p{N}])(?=[\p{L}])|[^\p{L}\p{N}]+",
        ),
        lambda t: t != "",
    )
    # long words split every ~4 chars, the BPE-ish length heuristic
    return F.aggregate(
        pieces, F.lit(0),
        lambda acc, w: acc + F.greatest(
            F.ceil(F.length(w) / F.lit(4)).cast("int"), F.lit(1)),
    )


def lang_scores(text_col: str = "text") -> Column:
    """map<lang, double>: fraction of tokens that are that language's markers."""
    toks = tokens_col(text_col)
    n = F.greatest(F.size(toks), F.lit(1))
    entries = [
        F.struct(
            F.lit(lang).alias("lang"),
            (F.size(F.array_intersect(
                toks, F.array(*[F.lit(w) for w in words])
            )) / n).alias("score"),
        )
        for lang, words in STOPWORDS.items()
    ]
    return F.array(*entries)


def detected_lang(text_col: str = "text") -> Column:
    """argmax language by marker score; 'und' when nothing matches."""
    scores = lang_scores(text_col)
    best = F.array_max(
        F.transform(scores, lambda s: F.struct(s["score"].alias("score"),
                                               s["lang"].alias("lang")))
    )
    return F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und"))


def quality_columns(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append curation-signal columns: n_chars, n_tokens, mean_token_len,
    punct_ratio, digit_ratio, stopword_ratio, uniq_token_ratio, quality_score.
    """
    text = F.coalesce(F.col(text_col), F.lit(""))
    toks = tokens_col(text_col)
    n_chars = F.length(text)
    n_tokens = F.size(toks)
    safe_chars = F.greatest(n_chars, F.lit(1)).cast("double")
    safe_tokens = F.greatest(n_tokens, F.lit(1)).cast("double")
    punct = F.length(F.regexp_replace(text, r"[\p{L}\p{N}\s]", ""))
    digits = F.length(F.regexp_replace(text, r"[^0-9]", ""))
    en_stop = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    stop_hits = F.size(F.filter(toks, lambda t: F.array_contains(en_stop, t)))
    uniq_ratio = F.size(F.array_distinct(toks)) / safe_tokens

    out = (
        df.withColumn("n_chars", n_chars)
        .withColumn("n_tokens", n_tokens)
        .withColumn("mean_token_len",
                    F.round((n_chars - n_tokens + 1) / safe_tokens, 4))
        .withColumn("punct_ratio", F.round(punct / safe_chars, 4))
        .withColumn("digit_ratio", F.round(digits / safe_chars, 4))
        .withColumn("stopword_ratio", F.round(stop_hits / safe_tokens, 4))
        .withColumn("uniq_token_ratio", F.round(uniq_ratio, 4))
    )
    score = (
        F.when(F.col("n_tokens") < 5, 0.0)
        .otherwise(
            F.greatest(
                F.lit(0.0),
                F.lit(1.0)
                - F.col("punct_ratio") * 2
                - F.col("digit_ratio")
                - F.greatest(F.lit(0.3) - F.col("uniq_token_ratio"), F.lit(0.0)),
            )
        )
    )
    return out.withColumn("quality_score", F.round(score, 4))


_WINNOW_SCHEMA = T.StructType([
    T.StructField("url", T.StringType(), False),
    T.StructField("fingerprints", T.ArrayType(T.LongType()), True),
])


def winnowing_fingerprints(df: DataFrame, k: int = 8, window: int = 4,
                           text_col: str = "text") -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al., SIGMOD'03 — public
    algorithm): rolling char k-gram hashes, keep the minimum of each sliding
    window, dedup. Vectorized numpy inside mapInPandas."""
    base = np.uint64(1000003)

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            fps = []
            for text in pdf[text_col].tolist():
                s = (text or "").lower()
                if len(s) < k:
                    fps.append(None)
                    continue
                codes = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32
                                      ).astype(np.uint64)
                n = len(codes) - k + 1
                acc = np.zeros(n, dtype=np.uint64)
                for j in range(k):
                    acc = acc * base + codes[j : j + n]
                if n >= window:
                    m = np.lib.stride_tricks.sliding_window_view(acc, window)
                    mins = m.min(axis=1)
                else:
                    mins = np.array([acc.min()], dtype=np.uint64)
                fps.append(np.unique(mins).astype(np.int64).tolist())
            yield pd.DataFrame({"url": pdf["url"], "fingerprints": fps})

    return df.select("url", text_col).mapInPandas(compute, schema=_WINNOW_SCHEMA)


def vocab_topk(
    df: DataFrame,
    k: int = 1000,
    text_col: str = "text",
    min_count: int = 1,
) -> DataFrame:
    """Corpus token vocabulary: the k most frequent whitespace tokens
    (lowercased, same tokenizer as token_count) with their total counts and
    frequency rank. The BPE-training / stopword-derivation precursor.

    Rank is fully deterministic: (count DESC, token ASC) — ties break
    lexicographically, so the result is stable across partitioning.

    Scale notes (100 TB): the token count is a single partial-aggregated
    groupBy (O(1) state per token, map-side combine absorbs Zipf-head
    tokens); the top-k is ``orderBy(...).limit(k)``, which Spark executes
    as TakeOrderedAndProject — each task keeps a k-sized heap, only
    k-per-partition rows reach the driver-side merge, no global sort. The
    rank window is unpartitioned BY CONSTRUCTION on the post-limit frame:
    it sorts k rows, never data-scale input (the WindowExec single-
    partition warning refers to a k-row frame here).
    """
    counts = (
        df.select(F.explode(
            F.filter(
                F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))),
                        r"\s+"),
                lambda t: t != "",
            )).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= min_count)
    )
    w = Window.orderBy(F.col("n").desc(), F.col("token").asc())
    return (
        counts.orderBy(F.col("n").desc(), F.col("token").asc()).limit(k)
        .withColumn("rank", F.row_number().over(w))
    )
