"""At-scale (sf >= 1) verification: hash-invariant result fingerprints.

At sf1 a gate query's output can be millions of rows; materializing and
diffing both engines' full outputs driver-side stops scaling long
before the engine does.  Instead BOTH engines reduce the result to a
constant-size fingerprint computed with dialect-shared integer
arithmetic (the technique proven by ``q_dedup_exact_scale``,
generalized to arbitrary result schemas):

  - ``n_rows``  — COUNT(*)
  - ``xmix``    — xor-fold of a per-row 31-bit mix (order-independent;
                  any changed / missing / duplicated row flips it with
                  probability 1 - 2^-31)
  - ``smix``    — modular SUM of the same mix (catches the xor-blind
                  case of a value flipping in an EVEN number of rows)

Per-row mix: each column maps to a nonnegative int < 2^31 via
dialect-shared arithmetic —

  * integers: the value itself (mod 2^31-1, sign-adjusted)
  * strings: md5 of the WHOLE string (both engines emit the identical
    32-char lowercase hex digest for identical UTF-8 input), folded to
    an int by parsing two 60-bit hex windows of the digest (Spark
    conv / DuckDB '0x' cast — verified identical) plus the original
    length.  Full-string sensitivity: any byte changing anywhere in
    the string changes the digest, so a changed row flips the mix with
    probability ~1 - 2^-31.  (Round 4 hashed only the first 8 + last 8
    chars + length, so a length-preserving corruption in the MIDDLE of
    a long string — e.g. q_doc_chunks' 64-token chunk_text — passed
    undetected; r4 advice.)
  * dates/timestamps: cast to the dialect's canonical string, then the
    string path (both engines print 'YYYY-MM-DD HH:MM:SS' for
    whole-second timestamps)

then columns combine positionally (sorted by name) with distinct prime
weights and one squaring pass for nonlinearity.  Every intermediate
product stays < 2^62, so ANSI overflow checking (Spark 4 default)
never trips.

Float columns are accepted ONLY through the exact-cents mapping (see
``_kind``): a passthrough double read from the same parquet bits is
identical in both engines and FLOOR(x*100+0.5) on it is one correctly
rounded multiply — but engine-computed floats (different summation
orders) would NOT survive, which is why gate queries keep aggregates
integer-exact.  Arrays/binary are rejected.

Size bound, stated: ``smix`` is a plain SUM of per-row 31-bit mixes,
so it stays inside int64 for results up to 2^32 rows (~4.3e9).  Beyond
that Spark's ANSI sum errors (and DuckDB's HUGEINT->BIGINT cast errors
equally loudly) rather than wrapping silently — a result set that
large should be fingerprinted in partitions anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

M31 = 2_147_483_647  # 2^31 - 1

# positional column weights; 32 distinct odd primes < 2^15
_PRIMES = [
    32749, 32719, 32693, 32687, 32653, 32611, 32609, 32603,
    32587, 32579, 32573, 32569, 32563, 32561, 32537, 32533,
    32531, 32507, 32503, 32497, 32491, 32479, 32467, 32443,
    32441, 32429, 32423, 32413, 32411, 32401, 32381, 32377,
]

_NULL_SENTINEL = -999_983


def _kind(type_name: str) -> str:
    """Map a Spark/DuckDB type name to a fingerprint kind."""
    t = type_name.upper()
    if t in ("BIGINT", "LONG", "INT", "INTEGER", "SMALLINT", "TINYINT",
             "SHORT", "BYTE", "BOOLEAN", "HUGEINT", "UBIGINT", "UINTEGER"):
        return "int"
    if t in ("STRING", "VARCHAR", "TEXT", "CHAR"):
        return "str"
    if t.startswith("TIMESTAMP") or t == "DATE":
        return "ts"
    if t in ("DOUBLE", "FLOAT"):
        # Safe ONLY because gate-result float columns are passthrough /
        # shared-arithmetic values computed from the SAME parquet bits
        # in both engines: FLOOR(x*100 + 0.5) on identical IEEE doubles
        # is identical everywhere (one correctly-rounded multiply).
        # Engine-specific float math (different summation orders) would
        # NOT survive this mapping — gate queries never emit such.
        return "f2"
    raise ValueError(
        f"unsupported fingerprint column type {type_name!r} "
        "(array/binary results need a full compare)"
    )


def _hex_int(hexpr: str, dialect: str) -> str:
    """Parse a <= 15-hex-char string as int64: Spark conv(h, 16, 10)
    and DuckDB CAST('0x' || h AS BIGINT) return the identical value
    (verified: 648541476951500027 for md5('abc')[:15] in both)."""
    if dialect == "spark":
        return f"CAST(conv({hexpr}, 16, 10) AS BIGINT)"
    return f"CAST('0x' || ({hexpr}) AS BIGINT)"


def _str_int(expr: str, dialect: str) -> str:
    """Cross-dialect string -> int in [0, M31) with FULL-string
    sensitivity: md5 the whole string (Spark and DuckDB both emit the
    identical 32-char lowercase hex digest for the same UTF-8 bytes),
    then fold two 15-hex-char (60-bit) windows of the digest by direct
    hex->int64 parsing + the original length.  Any single-byte change
    anywhere in the string flips the digest, unlike a first-8/last-8
    sample (r4 advice).  The hex-parse fold replaced a per-character
    ascii()-polynomial fold that cost ~100 expression evals per string
    per row — 26 s of pure fingerprint overhead on a 1.5M-row sf1 gate
    query, vs ~2 exprs here."""
    d = f"md5({expr})"
    w1 = _hex_int(f"substr({d}, 1, 15)", dialect)
    w2 = _hex_int(f"substr({d}, 16, 15)", dialect)
    return (
        f"((({w1}) % {M31}) + 31 * (({w2}) % {M31})"
        f" + 8191 * length({expr})) % {M31}"
    )


def _col_int(name: str, kind: str, dialect: str) -> str:
    if kind == "int":
        base = f"CAST({name} AS BIGINT)"
    elif kind == "f2":
        # exact integer cents; clamp first so a pathological magnitude
        # can't trip ANSI bigint-overflow instead of failing the gate
        base = (
            f"(CASE WHEN isnan(CAST({name} AS DOUBLE)) OR abs({name}) > 1e15 "
            f"THEN {abs(_NULL_SENTINEL)} "
            f"ELSE CAST(FLOOR(CAST({name} AS DOUBLE) * 100 + 0.5) AS BIGINT) END)"
        )
    else:
        if kind == "ts":
            # normalize through TIMESTAMP first: DuckDB's date_trunc
            # returns DATE (casts to 'YYYY-MM-DD') where Spark returns
            # TIMESTAMP ('YYYY-MM-DD HH:MM:SS') — the double cast makes
            # both print the full form
            cast_t = "STRING" if dialect == "spark" else "VARCHAR"
            s = f"CAST(CAST({name} AS TIMESTAMP) AS {cast_t})"
        else:
            s = name
        base = _str_int(s, dialect)
    nn = f"((({base}) % {M31}) + {M31}) % {M31}"
    return f"(CASE WHEN {name} IS NULL THEN {abs(_NULL_SENTINEL)} ELSE {nn} END)"


def row_mix_sql(cols: list[tuple[str, str]], dialect: str) -> str:
    """Per-row mix expression over (name, type_name) columns.

    Column order is SORTED BY NAME on both sides, matching the driver's
    compare convention, so dialect SELECT order can't skew the hash."""
    ordered = sorted(cols, key=lambda c: c[0])
    if len(ordered) > len(_PRIMES):
        raise ValueError(f"too many columns ({len(ordered)}) to fingerprint")
    terms = [
        f"{_PRIMES[i]} * {_col_int(name, _kind(t), dialect)}"
        for i, (name, t) in enumerate(ordered)
    ]
    lin = f"(({' + '.join(terms)}) % {M31})"
    # one squaring pass for nonlinearity: linear mixes cancel under
    # value swaps across rows; lin < 2^31 so lin*lin < 2^62 (no ANSI
    # overflow in either engine)
    return f"(({lin} * {lin} + 48271 * {lin}) % {M31})"


def spark_fingerprint(df: DataFrame) -> DataFrame:
    """1-row (n_rows, xmix, smix) fingerprint of a Spark result."""
    cols = [(f.name, f.dataType.simpleString()) for f in df.schema.fields]
    mix = F.expr(row_mix_sql(cols, "spark"))
    return df.select(mix.alias("_mix")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.expr("bit_xor(_mix)").cast("bigint").alias("xmix"),
        F.sum("_mix").cast("bigint").alias("smix"),
    )


def duck_fingerprint_sql(inner_sql: str, cols: list[tuple[str, str]]) -> str:
    """Wrap an oracle query so DuckDB computes the same fingerprint."""
    mix = row_mix_sql(cols, "duckdb")
    return f"""
WITH _q AS ({inner_sql}), _m AS (SELECT {mix} AS _mix FROM _q)
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(bit_xor(_mix) AS BIGINT) AS xmix,
       CAST(SUM(_mix) AS BIGINT) AS smix
FROM _m
"""
