"""Text-analysis operators (Spark side) + their DuckDB oracle SQL.

Each operator is pure built-in Catalyst expressions generated from the
shared formulas in texthash.py — JVM-side, WholeStageCodegen, zero
Python in the hot path.  ``*_oracle_sql`` emits the identical formula
in DuckDB dialect for the driver's correctness gate.

At 100 TB: these are all narrow (per-row) transformations — no shuffle,
fully pipelined with the parquet scan; column pruning means only
``text`` (+ id) is read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from . import texthash as T

_SPARK = T.Dialect("spark")
_DUCK = T.Dialect("duckdb")


def with_text_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """token_count, stopword_count, lang_pred, quality, fingerprint,
    simhash16 — one pass of built-in expressions."""
    wh = T.whash_arr(_SPARK, text_col)
    return df.select(
        "*",
        F.expr(T.token_count_sql(_SPARK, text_col)).alias("token_count"),
        F.expr(T.stopword_count_sql(_SPARK, text_col)).alias("stopword_count"),
        F.expr(T.lang_id_sql(_SPARK, text_col)).alias("lang_pred"),
        F.expr(T.quality_score_sql(_SPARK, text_col)).alias("quality"),
        F.expr(T.fingerprint_sql(_SPARK, wh)).alias("fingerprint"),
        F.expr(T.simhash_sql(_SPARK, wh)).cast("bigint").alias("simhash16"),
    )


def text_features_oracle_sql(table: str, id_col: str, text_col: str = "text") -> str:
    d = _DUCK
    wh = T.whash_arr(d, text_col)
    return f"""
SELECT {id_col},
       {T.token_count_sql(d, text_col)} AS token_count,
       {T.stopword_count_sql(d, text_col)} AS stopword_count,
       {T.lang_id_sql(d, text_col)} AS lang_pred,
       {T.quality_score_sql(d, text_col)} AS quality,
       {T.fingerprint_sql(d, wh)} AS fingerprint,
       CAST({T.simhash_sql(d, wh)} AS BIGINT) AS simhash16
FROM {table}
"""


def minhash_sigs(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """(id, s0..s{J-1}) minhash signatures over 3-word shingles.

    Shape: word-hash array once per row -> shingle hashes from the
    array (integer ops only) -> explode -> one hash-aggregate with J
    ``min`` columns.  Each shingle is hashed exactly once; Catalyst
    cannot re-inline the array into every signature (the naive per-row
    ``array_min(transform(...))`` formulation recomputed the whole
    shingle pipeline J times — 11x slower, measured at sf0.1).
    Docs with < 3 words have no shingles and drop out (they can never
    produce an LSH candidate pair; the oracle's NULL sigs agree)."""
    wh = T.whash_arr(_SPARK, text_col)
    staged = df.select(id_col, F.expr(wh).alias("_wh"))
    sh = (
        "transform(slice(_wh, 1, size(_wh) - 2), (h0, ixv) -> "
        f"(h0 + 31 * element_at(_wh, ixv + 2) "
        f"+ 961 * element_at(_wh, ixv + 3)) % {T.P})"
    )
    grams = staged.select(id_col, F.explode(F.expr(sh)).alias("_h"))
    aggs = [
        F.min(
            F.expr(f"({T.MINHASH_A[j]} * _h + {T.MINHASH_B[j]}) % {T.P}")
        ).alias(f"s{j}")
        for j in range(T.N_SIG)
    ]
    return grams.groupBy(id_col).agg(*aggs)


def minhash_oracle_select(table: str, id_col: str, text_col: str = "text") -> str:
    """SELECT id, s0.. sJ  (DuckDB dialect), reusable as a CTE body."""
    d = _DUCK
    sigs = ", ".join(
        f"{T.minhash_sig_sql(d, '_sh', j)} AS s{j}" for j in range(T.N_SIG)
    )
    return (
        f"SELECT {id_col}, {sigs} FROM "
        f"(SELECT {id_col}, {T.shingle_arr_sql(d, text_col)} AS _sh FROM {table})"
    )
