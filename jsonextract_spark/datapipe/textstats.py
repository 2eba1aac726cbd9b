"""Text analysis operators: token stats, quality features, language ID,
document fingerprints. Everything except langid stays JVM-side
(built-in functions, whole-stage codegen); langid is an Arrow UDF with a
tiny deterministic stopword model.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Column, functions as F
from pyspark.sql.types import LongType, StringType

from jsonextract_spark.functions.urlhash import murmur3_64_batch


def token_count(col) -> Column:
    """Whitespace token count — single-space split, matches the synthetic
    corpus; swap the pattern for \\s+ on messy text."""
    return F.size(F.split(col, " "))


def char_count(col, ch: str) -> Column:
    return F.length(col) - F.length(F.replace(col, F.lit(ch), F.lit("")))


def quality_features(df: DataFrame, text_col: str) -> DataFrame:
    """Cheap quality heuristics, all codegen'd: length, tokens, mean token
    length, space/punct/digit ratios, 'the' stopword hits."""
    t = F.col(text_col)
    n = F.length(t)
    toks = token_count(t)
    return df.withColumns({
        "n_chars_q": n,
        "n_tokens": toks,
        "mean_tok_len": (n - toks + 1) / toks,
        "space_ratio": char_count(t, " ") / n,
        "digit_ratio": (n - F.length(F.regexp_replace(t, "[0-9]", ""))) / n,
        "punct_ratio": (n - F.length(
            F.regexp_replace(t, "[\\.,;:!\\?'\"]", ""))) / n,
        "stopword_hits": F.size(F.filter(
            F.split(t, " "), lambda w: w.isin("the", "a", "of", "and", "in"))),
    })


def char_ngrams(col: Column, n: int) -> Column:
    """All character n-grams of a string column as an array — pure
    JVM (sequence + substr), codegen'd. Strings shorter than ``n``
    yield an empty array (the guard matters: Spark's ``sequence(1,0)``
    COUNTS DOWN rather than returning empty)."""
    grams = F.transform(
        F.sequence(F.lit(1), F.length(col) - (n - 1)),
        lambda i: col.substr(i, F.lit(n)))
    return F.when(F.length(col) >= n, grams) \
            .otherwise(F.array().cast("array<string>"))


def rare_gram_quality(docs, text_col: str = "text", n: int = 3,
                      rare_max_count: int = 100,
                      id_col: str = "doc_id"):
    """Corpus-relative quality signal (the CCNet idea, integer-exact
    instead of a float LM): character n-gram corpus frequencies, then
    per-doc fraction of grams whose corpus count ≤ ``rare_max_count``.
    High rare_frac = unusual character sequences relative to THIS
    corpus — mojibake, boilerplate markup residue, exotic
    transliteration — the cheap first-pass filter before any learned
    model. Integer counts end-to-end (the only division is the final
    BIGINT/BIGINT), so the whole operator restates exactly in SQL.

    Plan at scale: the frequency aggregation partial-aggregates
    map-side (absorbing the Zipf head — 'the'-grams — before the
    wire), so the only gram-keyed exchange carries ≤ |Σ|^n rows per
    map task. The gram table is alphabet-bounded, far below broadcast
    limits for real corpora, so AQE broadcasts it back over the
    streamed exploded grams — the big side never shuffles on gram at
    all (verified: BroadcastExchange over the freq agg, zero exchange
    on the probe side). Past broadcast size both sides hash on the
    same gram key. Per-doc re-aggregation shuffles on doc_id once."""
    grams = docs.select(
        id_col,
        F.explode(char_ngrams(F.lower(F.col(text_col)), n)).alias("gram"))
    freq = grams.groupBy("gram").agg(
        F.count(F.lit(1)).alias("corpus_count"))
    per_doc = (grams.join(freq, "gram")
               .groupBy(id_col)
               .agg(F.count(F.lit(1)).cast("bigint").alias("n_grams"),
                    F.sum(F.when(F.col("corpus_count") <= rare_max_count,
                                 1).otherwise(0))
                     .cast("bigint").alias("n_rare")))
    return per_doc.withColumn(
        "rare_frac", F.col("n_rare") / F.col("n_grams"))


_STOPWORDS = {
    "en": {"the", "and", "of", "to", "in", "is", "that", "it", "for", "was"},
    "de": {"der", "die", "das", "und", "ist", "von", "mit", "den", "nicht",
           "ein"},
    "fr": {"le", "la", "les", "et", "est", "des", "un", "une", "du", "que"},
    "es": {"el", "la", "los", "de", "y", "es", "en", "un", "una", "por"},
    "zh": {"的", "是", "了", "在", "和", "有", "我", "不", "人", "这"},
}


def _langid(text: str) -> str:
    words = set(text.lower().split()[:200])
    best, best_score = "und", 0
    for lang in sorted(_STOPWORDS):
        score = len(words & _STOPWORDS[lang])
        if score > best_score:
            best, best_score = lang, score
    if best == "und":
        # CJK fallback: any han codepoint
        if any("一" <= c <= "鿿" for c in text[:400]):
            return "zh"
    return best


@F.pandas_udf(StringType())
def langid_udf(texts: pd.Series) -> pd.Series:
    return texts.map(lambda t: "und" if not t else _langid(t))


def _norm_text(t: str) -> str:
    """NFKC-normalize, drop control/format codepoints (Cc/Cf — NULs,
    soft hyphens, zero-width junk, bidi controls), collapse all Unicode
    whitespace runs to single spaces, strip. The standard mojibake/
    invisible-character cleaning pass a corpus runs before dedup and
    tokenization — zero-width characters otherwise make visually
    identical documents hash apart."""
    import unicodedata as ud
    n = ud.normalize("NFKC", t)
    # tab/newline/CR are category Cc too — whitespace controls must
    # survive to the collapse step (they become separators), only
    # NON-whitespace Cc/Cf is invisible junk
    n = "".join(c for c in n
                if c.isspace() or ud.category(c) not in ("Cc", "Cf"))
    return " ".join(n.split())


@F.pandas_udf(StringType())
def normalize_text_udf(texts: pd.Series) -> pd.Series:
    return texts.map(lambda t: None if t is None else _norm_text(t))


@F.pandas_udf(LongType())
def fingerprint_udf(texts: pd.Series) -> pd.Series:
    """64-bit document fingerprint over whitespace-normalized lowercase
    text (stable under reflow/case changes). Normalization is cheap
    per-row string work; the hash itself runs batch-vectorized numpy
    murmur3 (one pass over the whole Arrow batch)."""
    valid = texts.notna().to_numpy()
    norm = [" ".join(t.lower().split()) for t in texts[valid]]
    if valid.all():
        return pd.Series(murmur3_64_batch(norm), index=texts.index)
    out = pd.Series([None] * len(texts), index=texts.index, dtype=object)
    if norm:
        out.iloc[valid.nonzero()[0]] = [int(v)
                                        for v in murmur3_64_batch(norm)]
    return out
