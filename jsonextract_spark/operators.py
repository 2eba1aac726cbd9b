"""DataFrame-level operator sugar matching the reference query API.

These are thin, plan-friendly compositions (no UDFs beyond extraction)
so Catalyst sees ordinary Filter/Window/Generate nodes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from jsonextract_spark.functions.udfs import extract_objects_udf


def extract(df: DataFrame, text_col: str = "text",
            out_col: str = "objs") -> DataFrame:
    """pages -> pages + array<string> of extracted JSON values."""
    return df.withColumn(out_col, extract_objects_udf(F.col(text_col)))


def extract_pages(pages: DataFrame, use_html: bool = True) -> DataFrame:
    """The input-contract entry point: a Common-Crawl-style pages table
    (url string, warc_ts timestamp, html binary, text string,
    lang string — ``crawl.tables.PAGES_SCHEMA``) -> one row per
    extracted object with its callback ordinal.

    ``use_html=True`` extracts from the raw bytes (the byte-exact path,
    like the Go reference reading the response body); ``use_html=False``
    uses the text column. Identity/metadata columns ride through; the
    only Python crossing is the extraction UDF."""
    from jsonextract_spark.functions.udfs import extract_objects_bin_udf

    col = (extract_objects_bin_udf(F.col("html")) if use_html
           else extract_objects_udf(F.col("text")))
    return pages.select("url", "warc_ts", "lang",
                        F.posexplode(col).alias("pos", "obj"))


def explode_objects(df: DataFrame, objs_col: str = "objs",
                    id_cols: list[str] | None = None) -> DataFrame:
    """Recover the callback stream: one row per value with its ordinal
    (the reference's callback order, reader.go:104)."""
    id_cols = id_cols or ["url"]
    return df.select(*id_cols,
                     F.posexplode(objs_col).alias("pos", "obj"))


def has_keys(obj_col, keys: list[str]) -> Column:
    """All-keys-present predicate (ObjectOption.match, objects.go:46-53)
    on a JSON string column — JVM-side, no Python."""
    cond = F.lit(True)
    for k in keys:
        cond = cond & F.get_json_object(obj_col, f"$['{k}']").isNotNull()
    return cond


def first_match_per_doc(df: DataFrame, keys: list[str],
                        id_col: str = "url",
                        obj_col: str = "obj",
                        pos_col: str = "pos",
                        k: int = 1) -> DataFrame:
    """`jsonx key1 key2 -limit k` shape: first k key-matching values per
    document in callback order (ErrStop semantics, declaratively)."""
    w = Window.partitionBy(id_col).orderBy(pos_col)
    return (df.filter(has_keys(F.col(obj_col), keys))
              .withColumn("rn", F.row_number().over(w))
              .filter(F.col("rn") <= k)
              .drop("rn"))


def unmarshal_first(df: DataFrame, schema, predicate,
                    id_col: str = "url",
                    obj_col: str = "obj",
                    pos_col: str = "pos") -> DataFrame:
    """Reference ``Unmarshal(pointer, verify)`` (objects.go:15-30):
    decode each value with ``from_json`` (decode errors -> null, exactly
    the 'Unmarshal errors will be ignored' contract), keep the FIRST
    value per document whose decoded struct satisfies ``predicate``.

    predicate: Column -> Column over the decoded struct column 'decoded'.
    """
    decoded = df.withColumn("decoded", F.from_json(F.col(obj_col), schema))
    ok = decoded.filter(F.col("decoded").isNotNull() &
                        predicate(F.col("decoded")))
    w = Window.partitionBy(id_col).orderBy(pos_col)
    return (ok.withColumn("rn", F.row_number().over(w))
              .filter("rn = 1").drop("rn"))


def required_missing(df: DataFrame, keys: list[str],
                     id_col: str = "url",
                     obj_col: str = "obj") -> DataFrame:
    """Per-document `ErrCallbackNeverCalled` surface (objects.go:55-57):
    documents where NO value matched the required key set."""
    hits = (df.filter(has_keys(F.col(obj_col), keys))
              .select(id_col).distinct())
    return df.select(id_col).distinct().join(hits, id_col, "left_anti")
