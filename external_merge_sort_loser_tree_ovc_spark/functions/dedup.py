"""Deduplication operators over a document table.

Four families, each with a DuckDB oracle generator sharing the exact
formula (texthash.py):

- exact:        group-by text hash, keep min id (one shuffle on a
                64-ish-bit key; at 100 TB use xxhash64(text) as the
                group key so the shuffle carries 8 bytes, not the text);
- minhash+LSH:  J=8 minhash signatures over 3-word shingles -> 4 bands
                of 2 -> candidate pairs via self-equi-join on
                (band, band_value);
- simhash:      16-bit simhash equality -> near-dup candidate pairs;
- n-gram Jaccard: word-bigram inverted index self-join; the >= tau test
                is integer-exact (q*intersection >= p*union).

Scale notes: pair-generation joins are quadratic in bucket size — hot
buckets (boilerplate docs) are the skew risk at 100 TB; mitigate by
dropping top-frequency grams/bands before the self-join (a standard
df.filter on a broadcast frequency table) — AQE's skew-join split
handles the shuffle side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from . import texthash as T
from .textops import minhash_oracle_select, minhash_sigs, _DUCK


# --- exact ------------------------------------------------------------------

def exact_dedup(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """One surviving id per distinct text: (text-group, survivor_id,
    dup_count).  Shuffles a hash of the text, not the text itself."""
    return (
        df.groupBy(F.xxhash64(F.col(text_col)).alias("text_hash"))
        .agg(
            F.min(id_col).alias("survivor_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )


def exact_dedup_survivors(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """(survivor_id, dup_count) — xxhash64 is Spark-only, so the oracle
    compares on the survivor set keyed by min-id per text."""
    return (
        df.groupBy(text_col)
        .agg(F.min(id_col).alias("survivor_id"), F.count(F.lit(1)).alias("dup_count"))
        .select("survivor_id", "dup_count")
    )


def exact_dedup_oracle_sql(table: str, id_col: str, text_col: str = "text") -> str:
    return (
        f"SELECT MIN({id_col}) AS survivor_id, COUNT(*) AS dup_count "
        f"FROM {table} GROUP BY {text_col}"
    )


# --- minhash + LSH ------------------------------------------------------------

def minhash_lsh_pairs(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """Candidate near-dup pairs (id_a < id_b) from banded minhash.

    Unpivots the J signature columns into (id, band, bv) with one
    ``stack`` projection (no N_BANDS-way union), then a self equi-join
    on (band, bv).  At scale the join shuffles only (id, band, bv)
    triples — 24 bytes/row — never the text."""
    sigs = minhash_sigs(df.select(id_col, text_col), id_col, text_col)
    sig_cols = [f"s{j}" for j in range(T.N_SIG)]
    stack = ", ".join(
        f"{b}, {T.lsh_band_sql(sig_cols, b)}" for b in range(T.N_BANDS)
    )
    bands = sigs.select(
        F.col(id_col),
        F.expr(f"stack({T.N_BANDS}, {stack}) AS (band, bv)"),
    ).select(id_col, "band", "bv")
    a = bands.select(F.col(id_col).alias("id_a"), "band", "bv")
    b_ = bands.select(F.col(id_col).alias("id_b"), "band", "bv")
    return (
        a.join(b_, ["band", "bv"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def minhash_lsh_oracle_sql(table: str, id_col: str, text_col: str = "text") -> str:
    sig_sel = minhash_oracle_select(table, id_col, text_col)
    sig_cols = [f"s{j}" for j in range(T.N_SIG)]
    band_rows = " UNION ALL ".join(
        f"SELECT {id_col}, {b} AS band, {T.lsh_band_sql(sig_cols, b)} AS bv FROM sigs"
        for b in range(T.N_BANDS)
    )
    return f"""
WITH sigs AS ({sig_sel}),
bands AS ({band_rows})
SELECT DISTINCT a.{id_col} AS id_a, b.{id_col} AS id_b
FROM bands a JOIN bands b ON a.band = b.band AND a.bv = b.bv
WHERE a.{id_col} < b.{id_col}
"""


# --- simhash -------------------------------------------------------------------

def simhash_pairs(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """Pairs whose 16-bit simhash is identical (hamming-0 candidates;
    widen by banding the simhash for hamming<=k).  Simhash comes from
    the explode-agg path (one word-hash evaluation per word)."""
    from .textops import with_text_features

    sh = with_text_features(df.select(id_col, text_col), text_col).select(
        F.col(id_col), F.col("simhash16").alias("sh")
    )
    a = sh.select(F.col(id_col).alias("id_a"), "sh")
    b = sh.select(F.col(id_col).alias("id_b"), "sh")
    return (
        a.join(b, "sh").filter(F.col("id_a") < F.col("id_b")).select("id_a", "id_b")
    )


def simhash_pairs_oracle_sql(table: str, id_col: str, text_col: str = "text") -> str:
    d = _DUCK
    wh = T.whash_arr(d, text_col)
    return f"""
WITH sh AS (
  SELECT {id_col}, CAST({T.simhash_sql(d, wh)} AS BIGINT) AS sh FROM {table}
)
SELECT a.{id_col} AS id_a, b.{id_col} AS id_b
FROM sh a JOIN sh b ON a.sh = b.sh AND a.{id_col} < b.{id_col}
"""


# --- n-gram Jaccard -------------------------------------------------------------

def _bigrams_spark(text_col: str) -> str:
    s = f"split({text_col}, ' ')"
    return (
        f"transform(slice({s}, 1, size({s}) - 1), "
        f"(x, ixv) -> concat(x, ' ', element_at({s}, ixv + 2)))"
    )


def _bigrams_duck(text_col: str) -> str:
    s = f"string_split({text_col}, ' ')"
    return (
        f"list_transform(list_slice({s}, 1, len({s}) - 1), "
        f"(x, ixv) -> x || ' ' || {s}[ixv + 1])"
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    *,
    tau_num: int = 1,
    tau_den: int = 2,
) -> DataFrame:
    """Pairs with word-bigram Jaccard >= tau_num/tau_den (integer-exact
    comparison).  Inverted-index self-join, then exact set arithmetic."""
    grams = (
        df.select(F.col(id_col), F.explode(F.expr(_bigrams_spark(text_col))).alias("g"))
        .distinct()
    )
    counts = grams.groupBy(id_col).agg(F.count(F.lit(1)).alias("n"))
    a = grams.select(F.col(id_col).alias("id_a"), "g")
    b = grams.select(F.col(id_col).alias("id_b"), "g")
    inter = (
        a.join(b, "g")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    ca = counts.select(F.col(id_col).alias("id_a"), F.col("n").alias("na"))
    cb = counts.select(F.col(id_col).alias("id_b"), F.col("n").alias("nb"))
    return (
        inter.join(ca, "id_a")
        .join(cb, "id_b")
        .filter(
            F.col("c") * F.lit(tau_den)
            >= F.lit(tau_num) * (F.col("na") + F.col("nb") - F.col("c"))
        )
        .select("id_a", "id_b")
    )


def ngram_jaccard_oracle_sql(
    table: str, id_col: str, text_col: str = "text", *, tau_num: int = 1, tau_den: int = 2
) -> str:
    return f"""
WITH grams AS (
  SELECT DISTINCT {id_col}, unnest({_bigrams_duck(text_col)}) AS g FROM {table}
),
counts AS (SELECT {id_col}, COUNT(*) AS n FROM grams GROUP BY {id_col}),
inter AS (
  SELECT a.{id_col} AS id_a, b.{id_col} AS id_b, COUNT(*) AS c
  FROM grams a JOIN grams b ON a.g = b.g AND a.{id_col} < b.{id_col}
  GROUP BY 1, 2
)
SELECT id_a, id_b
FROM inter
JOIN counts ca ON ca.{id_col} = id_a
JOIN counts cb ON cb.{id_col} = id_b
WHERE c * {tau_den} >= {tau_num} * (ca.n + cb.n - c)
"""
