"""Portable probabilistic sketches — HyperLogLog distinct counting,
Count-Min frequency estimation, and priority sampling.

These are the sketch operators a 100 TB curation pipeline leans on when
exact answers need a shuffle it can't afford:

* ``hll_distinct`` — per-group distinct-count estimate WITHOUT a
  ``count(distinct)`` (no distinct shuffle at all: the register update
  is a plain map-side-combinable ``max``, so the only exchange is the
  64-buckets-per-group register table, constant-size per group
  regardless of input rows).
* ``cms_probe`` — a d×w Count-Min sketch folded with one groupBy;
  probing a candidate token list is a broadcast join against the
  constant-size sketch.  Estimates are exact-or-over, never under.
* ``priority_sample`` — weight-proportional k-sample per stratum
  (priority sampling, Duffield–Lund–Thorup JACM'07): priority
  q = w / u with u a deterministic uniform from the portable hash; the
  top-k by q is an unbiased weighted sample supporting subset-sum
  estimation with threshold tau = (k+1)-th priority.

Every arithmetic step is chosen for EXACT cross-engine parity with the
DuckDB oracle: 60-bit md5 hashes, bit-length via ``bin()`` string
length (identical in Spark and DuckDB), register powers as BIGINT
shifts, and at most one correctly-rounded float division per value
(the IEEE result is engine-independent), so the gate's value hash
matches bit-for-bit modulo the final explicit ROUND.

Reference parity: the reference has no sketch surface (its metrics are
exact, src/utils.cpp); these extend the engine for corpus-scale
cardinality/frequency questions its users would otherwise answer with
exact aggregations that don't survive 10^12 rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .portable import HASH_P, md5_long, md5_long_sql, shingles_col, shingles_sql

# --- HyperLogLog -----------------------------------------------------------

HLL_P = 6  # 2^6 = 64 registers
HLL_M = 1 << HLL_P
HLL_REM_BITS = 60 - HLL_P  # md5_long is 60 bits wide
# alpha_m * m^2 * 2^(rem_bits+1), embedded as the same double literal on
# both sides (one exact parse, then one correctly-rounded division).
_ALPHA_M = 0.7213 / (1.0 + 1.079 / HLL_M)
_HLL_NUM = _ALPHA_M * HLL_M * HLL_M * float(1 << (HLL_REM_BITS + 1))
_LC_THRESHOLD = 2.5 * HLL_M


def _rho(rem: Column) -> Column:
    """Leading-zero count of the 54-bit remainder, +1 (the HLL rho)."""
    return F.when(rem == 0, F.lit(HLL_REM_BITS + 1)).otherwise(
        F.lit(HLL_REM_BITS + 1) - F.length(F.bin(rem))
    )


def hll_distinct(docs: DataFrame, group_col: str = "source") -> DataFrame:
    """(group, est_distinct) — HLL estimate of distinct word bigrams per
    group.  No distinct shuffle: duplicates can't raise a register max,
    so the explode feeds a map-side-combinable (group, bucket) max and
    the exchange carries ≤64 rows per group.  Raw estimate with
    linear-counting fallback below 2.5m (the standard HLL regime
    switch).  Parity: Z folded as an exact BIGINT sum of 1<<(55-M_j);
    the single float division is correctly rounded in both engines."""
    grams = docs.select(
        F.col(group_col).alias("grp"),
        F.explode(shingles_col(F.col("text"), 2)).alias("g"),
    )
    h = md5_long(F.col("g"))
    regs = (
        grams.select(
            "grp",
            (h % HLL_M).alias("bucket"),
            _rho(F.floor(h / HLL_M).cast("long")).alias("rho"),
        )
        .groupBy("grp", "bucket")
        .agg(F.max("rho").alias("m_j"))
    )
    per_group = regs.groupBy("grp").agg(
        (
            F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {HLL_REM_BITS + 1} - m_j)"))
            + (F.lit(HLL_M) - F.count("*"))
            * F.lit(1 << (HLL_REM_BITS + 1)).cast("long")
        ).alias("z_int"),
        (F.lit(HLL_M) - F.count("*")).cast("long").alias("v_zero"),
    )
    raw = F.lit(_HLL_NUM) / F.col("z_int").cast("double")
    lc = F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / F.col("v_zero").cast("double"))
    est = F.when((raw <= F.lit(_LC_THRESHOLD)) & (F.col("v_zero") > 0), lc).otherwise(raw)
    return per_group.select(
        F.col("grp").alias(group_col), F.round(est, 3).alias("est_distinct")
    ).orderBy(group_col)


def hll_distinct_sql(table: str = "documents", group_col: str = "source") -> str:
    h = md5_long_sql("g")
    pow_top = 1 << (HLL_REM_BITS + 1)
    return f"""
    WITH grams AS (
        SELECT {group_col} AS grp, unnest({shingles_sql("text", 2)}) AS g
        FROM {table}
    ), hashed AS (
        SELECT grp, {h} % {HLL_M} AS bucket,
               CASE WHEN ({h} // {HLL_M}) = 0 THEN {HLL_REM_BITS + 1}
                    ELSE {HLL_REM_BITS + 1} - length(bin({h} // {HLL_M}))
               END AS rho
        FROM grams
    ), regs AS (
        SELECT grp, bucket, max(rho) AS m_j FROM hashed GROUP BY grp, bucket
    ), folded AS (
        SELECT grp,
               SUM(1::BIGINT << ({HLL_REM_BITS + 1} - m_j))::BIGINT
                 + ({HLL_M} - COUNT(*)) * {pow_top} AS z_int,
               ({HLL_M} - COUNT(*))::BIGINT AS v_zero
        FROM regs GROUP BY grp
    )
    SELECT grp AS {group_col},
           ROUND(CASE WHEN {_HLL_NUM!r}::DOUBLE / z_int <= {_LC_THRESHOLD!r}::DOUBLE
                       AND v_zero > 0
                      THEN {float(HLL_M)!r}::DOUBLE * ln({float(HLL_M)!r}::DOUBLE / v_zero)
                      ELSE {_HLL_NUM!r}::DOUBLE / z_int
                 END, 3) AS est_distinct
    FROM folded ORDER BY {group_col}
    """


# --- Count-Min -------------------------------------------------------------

CMS_D = 3
CMS_W = 256


def _cms_bucket(row_id: int, h: Column) -> Column:
    """Row r's bucket for base hash h — the minhash permutation family
    reduced mod w (pairwise-independent enough for CMS guarantees)."""
    a = 2 * row_id + 1
    b = (row_id * 2654435761) % HASH_P
    return ((a * (h % HASH_P) + b) % HASH_P) % CMS_W


def _cms_bucket_sql(row_id: int, h: str) -> str:
    a = 2 * row_id + 1
    b = (row_id * 2654435761) % HASH_P
    return f"(({a} * ({h} % {HASH_P}) + {b}) % {HASH_P}) % {CMS_W}"


def cms_probe(docs: DataFrame, candidates: list[str]) -> DataFrame:
    """(token, est_count) — Count-Min estimate of each candidate token's
    total corpus occurrence count.  The sketch is one groupBy over
    (row, bucket) — d·w = 768 cells regardless of corpus size — and the
    probe broadcasts trivially.  CMS guarantees est ≥ true count, with
    overestimate ≤ corpus_tokens·e/w at probability 1-e^-d."""
    spark = docs.sparkSession
    toks = docs.select(F.explode(F.split("text", " ")).alias("t"))
    h = md5_long(F.col("t"))
    cells = None
    for r in range(CMS_D):
        part = toks.select(F.lit(r).alias("r"), _cms_bucket(r, h).alias("bucket"))
        cells = part if cells is None else cells.unionByName(part)
    sketch = cells.groupBy("r", "bucket").agg(F.count("*").cast("long").alias("cnt"))
    cand = spark.createDataFrame([(c,) for c in candidates], "token string")
    ch = md5_long(F.col("token"))
    probes = None
    for r in range(CMS_D):
        part = cand.select("token", F.lit(r).alias("r"), _cms_bucket(r, ch).alias("bucket"))
        probes = part if probes is None else probes.unionByName(part)
    return (
        probes.join(F.broadcast(sketch), ["r", "bucket"], "left")
        .groupBy("token")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("long").alias("est_count"))
        .orderBy("token")
    )


def cms_probe_sql(candidates: list[str], table: str = "documents") -> str:
    h = md5_long_sql("t")
    ch = md5_long_sql("token")
    rows = " UNION ALL ".join(
        f"SELECT {r} AS r, {_cms_bucket_sql(r, h)} AS bucket FROM toks" for r in range(CMS_D)
    )
    probe_rows = " UNION ALL ".join(
        f"SELECT token, {r} AS r, {_cms_bucket_sql(r, ch)} AS bucket FROM cand"
        for r in range(CMS_D)
    )
    cand_values = ", ".join(f"('{c}')" for c in candidates)
    return f"""
    WITH toks AS (
        SELECT unnest(string_split(text, ' ')) AS t FROM {table}
    ), cells AS ({rows}),
    sketch AS (
        SELECT r, bucket, COUNT(*)::BIGINT AS cnt FROM cells GROUP BY r, bucket
    ), cand(token) AS (VALUES {cand_values}),
    probes AS ({probe_rows})
    SELECT p.token, MIN(COALESCE(s.cnt, 0))::BIGINT AS est_count
    FROM probes p LEFT JOIN sketch s ON p.r = s.r AND p.bucket = s.bucket
    GROUP BY p.token ORDER BY p.token
    """


# --- Priority sampling -----------------------------------------------------

PS_SEED = "ps1:"
_PS_SCALE = float(1 << 60)  # priorities scaled by 2^60 (exact: power of two)


def priority_sample(docs: DataFrame, k: int = 5, stratum: str = "source") -> DataFrame:
    """(stratum, doc_id, weight) — the k highest-priority docs per
    stratum under priority sampling: q = weight / u, u a deterministic
    uniform in (0,1] from the portable hash.  Weight here is n_chars
    (the training-token budget proxy).  Unbiased subset-sum estimates
    follow with tau = the (k+1)-th priority (not materialized).  Parity:
    q = (weight · 2^60) / (h+1) — the multiply by a power of two is
    exact, the division correctly rounded, so ranks agree exactly."""
    h = md5_long(F.concat(F.lit(PS_SEED), F.col("doc_id").cast("string")))
    q = (F.col("n_chars").cast("double") * F.lit(_PS_SCALE)) / (h + 1).cast("double")
    from pyspark.sql import Window

    w = Window.partitionBy(stratum).orderBy(F.desc("q"), F.asc("doc_id"))
    return (
        docs.select(F.col(stratum), "doc_id", F.col("n_chars").alias("weight"), q.alias("q"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(stratum, "doc_id", "weight")
    )


def priority_sample_sql(k: int = 5, stratum: str = "source", table: str = "documents") -> str:
    h = md5_long_sql(f"concat('{PS_SEED}', CAST(doc_id AS VARCHAR))")
    return f"""
    WITH pri AS (
        SELECT {stratum}, doc_id, n_chars AS weight,
               (n_chars::DOUBLE * {_PS_SCALE!r}::DOUBLE) / ({h} + 1) AS q,
               row_number() OVER (PARTITION BY {stratum}
                                  ORDER BY (n_chars::DOUBLE * {_PS_SCALE!r}::DOUBLE)
                                           / ({h} + 1) DESC, doc_id ASC) AS rk
        FROM {table}
    )
    SELECT {stratum}, doc_id, weight FROM pri WHERE rk <= {k}
    """
