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


def with_minhash(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds s0..s{J-1} minhash signature columns over 3-word shingles
    (built-in exprs; the shingle array is computed once per row)."""
    sh = T.shingle_arr_sql(_SPARK, text_col)
    staged = df.withColumn("_sh", F.expr(sh))
    cols = [c for c in df.columns] + [
        F.expr(T.minhash_sig_sql(_SPARK, "_sh", j)).alias(f"s{j}")
        for j in range(T.N_SIG)
    ]
    return staged.select(*cols)


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
