"""Text-analysis operators over the `documents` table — training-data
pipeline ops: token counting, quality scoring, language-ID heuristic,
document fingerprinting.

All pure JVM-side column expressions (no Python in the data path); every
op has a mirrored DuckDB SQL builder sharing the same constants.

Scale: each op is a narrow per-row map over the scan — no shuffle at
all except `doc_fingerprint`'s per-doc top-k (a partial-agg-friendly
window over doc_id, which at 100 TB rides the natural file partitioning
of a doc_id-sorted table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .portable import NGRAM_N, md5_long, md5_long_sql, shingles_col, shingles_sql, words_col

# Stopword sets for the lang-ID scoring heuristic (fixed, tiny, broadcast
# as literals).  Deterministic priority order breaks score ties.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "that"),
    "de": ("der", "die", "das", "und", "ist", "ein", "nicht", "mit"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "es"),
    "fr": ("le", "la", "de", "et", "un", "est", "que", "pour"),
    "zh": ("的", "是", "了", "在", "我", "有", "和", "不"),
}
LANG_PRIORITY = ("en", "de", "es", "fr", "zh")

# Quality-score weights: long docs with low digit/punct noise and a sane
# stopword ratio score high.  Purely deterministic arithmetic.
QUALITY_TARGET_STOPWORD_RATIO = 0.4
FINGERPRINT_K = 4


def token_stats(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, n_bpe_ish, avg_token_len) — whitespace tokens
    plus a BPE-ish subword proxy (4-char chunks, the standard ~chars/4
    token estimate)."""
    toks = F.split(F.col("text"), " ")
    n_tokens = F.size(toks)
    n_chars = F.length(F.col("text"))
    return docs.select(
        "doc_id",
        n_tokens.cast("long").alias("n_tokens"),
        F.ceil(n_chars / 4).cast("long").alias("n_bpe_ish"),
        F.round((n_chars - (n_tokens - 1)) / n_tokens, 6).alias("avg_token_len"),
    )


def token_stats_sql(table: str = "documents") -> str:
    return f"""
    SELECT doc_id,
           len(string_split(text, ' '))::BIGINT AS n_tokens,
           CAST(ceil(length(text) / 4.0) AS BIGINT) AS n_bpe_ish,
           ROUND((length(text) - (len(string_split(text, ' ')) - 1))
                 / CAST(len(string_split(text, ' ')) AS DOUBLE), 6) AS avg_token_len
    FROM {table}
    """


def _in_set_fn(words: tuple[str, ...]):
    """Single-arg lambda factory (PySpark higher-order functions dispatch
    on the lambda's arity, so extra bound parameters are not allowed)."""
    return lambda t: _in_set(t, words)


def _in_set(t, words: tuple[str, ...]):
    cond = t == words[0]
    for w in words[1:]:
        cond = cond | (t == w)
    return cond


def _stopword_count_sql(words: tuple[str, ...]) -> str:
    ors = " OR ".join(f"t = '{w}'" for w in words)
    return f"len(list_filter(string_split(text, ' '), t -> {ors}))"


def text_quality(docs: DataFrame) -> DataFrame:
    """(doc_id, stopword_ratio, digit_ratio, punct_ratio, quality) —
    quality = clamp(1 − |stopword_ratio − target| − digit_ratio − punct_ratio, 0, 1),
    rounded to 6."""
    toks = F.split(F.col("text"), " ")
    n_tokens = F.size(toks)
    n_chars = F.length(F.col("text")).cast("double")
    sw = F.size(F.filter(toks, lambda t: _in_set(t, LANG_STOPWORDS["en"])))
    sw_ratio = F.round(sw / n_tokens, 6)
    digit_ratio = F.round((n_chars - F.length(F.regexp_replace("text", "[0-9]", ""))) / n_chars, 6)
    punct_ratio = F.round(
        (n_chars - F.length(F.regexp_replace("text", "[!-/:-@\\[-`{-~]", ""))) / n_chars, 6
    )
    quality = F.round(
        F.greatest(
            F.lit(0.0),
            F.least(
                F.lit(1.0),
                1.0
                - F.abs(sw_ratio - QUALITY_TARGET_STOPWORD_RATIO)
                - digit_ratio
                - punct_ratio,
            ),
        ),
        6,
    )
    return docs.select(
        "doc_id",
        sw_ratio.alias("stopword_ratio"),
        digit_ratio.alias("digit_ratio"),
        punct_ratio.alias("punct_ratio"),
        quality.alias("quality"),
    )


def text_quality_sql(table: str = "documents") -> str:
    sw = _stopword_count_sql(LANG_STOPWORDS["en"])
    n_tokens = "len(string_split(text, ' '))"
    n_chars = "CAST(length(text) AS DOUBLE)"
    sw_ratio = f"ROUND({sw} / CAST({n_tokens} AS DOUBLE), 6)"
    digit = f"ROUND(({n_chars} - length(regexp_replace(text, '[0-9]', '', 'g'))) / {n_chars}, 6)"
    punct = f"ROUND(({n_chars} - length(regexp_replace(text, '[!-/:-@\\[-`{{-~]', '', 'g'))) / {n_chars}, 6)"
    quality = (
        f"ROUND(GREATEST(0.0, LEAST(1.0, 1.0 - ABS({sw_ratio} - {QUALITY_TARGET_STOPWORD_RATIO})"
        f" - {digit} - {punct})), 6)"
    )
    return f"""
    SELECT doc_id, {sw_ratio} AS stopword_ratio, {digit} AS digit_ratio,
           {punct} AS punct_ratio, {quality} AS quality
    FROM {table}
    """


def lang_id(docs: DataFrame) -> DataFrame:
    """(doc_id, lang_pred, lang_score) — stopword-hit scoring heuristic;
    argmax over languages, priority-ordered tie-break."""
    toks = F.split(F.col("text"), " ")
    scored = docs.select(
        "doc_id",
        *[
            F.size(F.filter(toks, _in_set_fn(ws))).alias(f"s_{lang}")
            for lang, ws in LANG_STOPWORDS.items()
        ],
    )
    pred = None
    best = None
    for lang in LANG_PRIORITY:
        cond = None
        for other in LANG_PRIORITY:
            if other == lang:
                continue
            c = F.col(f"s_{lang}") >= F.col(f"s_{other}")
            cond = c if cond is None else cond & c
        pred = F.when(cond, lang) if pred is None else pred.when(cond, lang)
        best = F.when(cond, F.col(f"s_{lang}")) if best is None else best.when(cond, F.col(f"s_{lang}"))
    return scored.select(
        "doc_id", pred.alias("lang_pred"), best.cast("long").alias("lang_score")
    )


def lang_id_sql(table: str = "documents") -> str:
    scores = ", ".join(
        f"{_stopword_count_sql(ws)} AS s_{lang}" for lang, ws in LANG_STOPWORDS.items()
    )
    whens_pred, whens_score = [], []
    for lang in LANG_PRIORITY:
        cond = " AND ".join(
            f"s_{lang} >= s_{other}" for other in LANG_PRIORITY if other != lang
        )
        whens_pred.append(f"WHEN {cond} THEN '{lang}'")
        whens_score.append(f"WHEN {cond} THEN s_{lang}")
    return f"""
    WITH scored AS (SELECT doc_id, {scores} FROM {table})
    SELECT doc_id,
           CASE {" ".join(whens_pred)} END AS lang_pred,
           CAST(CASE {" ".join(whens_score)} END AS BIGINT) AS lang_score
    FROM scored
    """


def doc_fingerprint(docs: DataFrame, k: int = FINGERPRINT_K, n: int = NGRAM_N) -> DataFrame:
    """(doc_id, rank, h) — bottom-k sketch: the k smallest distinct
    shingle hashes per doc (a winnowing-style rolling fingerprint;
    equal fingerprints ⇒ near-identical docs)."""
    sh = (
        docs.select("doc_id", F.explode(shingles_col(F.col("text"), n)).alias("shingle"))
        .distinct()
        .select("doc_id", md5_long(F.col("shingle")).alias("h"))
        .distinct()
    )
    rank = F.row_number().over(Window.partitionBy("doc_id").orderBy(F.asc("h")))
    return sh.select("doc_id", rank.alias("rank"), "h").filter(F.col("rank") <= k)


def doc_fingerprint_sql(table: str = "documents", k: int = FINGERPRINT_K, n: int = NGRAM_N) -> str:
    return f"""
    WITH sh AS (
        SELECT DISTINCT doc_id, {md5_long_sql("shingle")} AS h
        FROM (SELECT DISTINCT doc_id, unnest({shingles_sql("text", n)}) AS shingle FROM {table})
    ),
    ranked AS (
        SELECT doc_id, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY h ASC) AS rank, h
        FROM sh
    )
    SELECT doc_id, rank, h FROM ranked WHERE rank <= {k}
    """


def tfidf_topk(docs: DataFrame, k: int = 5, round_to: int = 6) -> DataFrame:
    """(doc_id, term, tf, score) — top-k TF-IDF terms per document,
    score = tf · ln(N / df), ties broken by term ascending.

    Two groupBys (term frequency per doc, document frequency per term)
    and one join keyed on `term` — the df side is corpus-vocabulary
    sized, broadcastable at any corpus scale. The per-doc top-k window
    partitions by doc_id, so no global sort. N is a driver scalar.
    """
    toks = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("term")
    ).filter(F.col("term") != "")
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").cast("long").alias("tf"))
    df = tf.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    n = docs.count()
    scored = tf.join(F.broadcast(df), "term").select(
        "doc_id",
        "term",
        "tf",
        (F.col("tf") * F.log(F.lit(float(n)) / F.col("df"))).alias("score"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("doc_id", "term", "tf", F.round("score", round_to).alias("score"))
    )


def top_ngrams(docs: DataFrame, k: int = 20) -> DataFrame:
    """(ngram, n) — the corpus-wide top-k token bigrams by count, ties
    broken by ngram ascending (binary string order in both engines).

    One explode + one hash aggregate; the top-k is orderBy+limit, which
    Spark executes as TakeOrdered (per-partition partial top-k, no global
    sort of the ngram vocabulary). The standard corpus-statistics probe a
    training pipeline runs before building filter rules."""
    toks = F.split(F.col("text"), " ")
    sz = F.size(toks)
    grams = F.zip_with(
        F.slice(toks, F.lit(1), sz - 1),
        F.slice(toks, F.lit(2), sz - 1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    return (
        docs.filter(sz >= 2)
        .select(F.explode(grams).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count("*").cast("long").alias("n"))
        .orderBy(F.desc("n"), F.asc("ngram"))
        .limit(k)
    )


def top_ngrams_sql(table: str = "documents", k: int = 20) -> str:
    """DuckDB twin of top_ngrams (1-based list indexing; same tie-break)."""
    return f"""
    WITH toks AS (SELECT string_split(text, ' ') AS t FROM {table}),
    grams AS (
        SELECT unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i + 1]))
               AS ngram
        FROM toks WHERE len(t) >= 2
    )
    SELECT ngram, COUNT(*)::BIGINT AS n FROM grams GROUP BY ngram
    ORDER BY n DESC, ngram ASC LIMIT {k}
    """


def tfidf_topk_sql(table: str = "documents", k: int = 5, round_to: int = 6) -> str:
    return f"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM {table}
    ),
    tf AS (
        SELECT doc_id, term, COUNT(*)::BIGINT AS tf
        FROM toks WHERE term <> '' GROUP BY doc_id, term
    ),
    df AS (SELECT term, COUNT(*)::BIGINT AS df FROM tf GROUP BY term),
    n AS (SELECT COUNT(*)::DOUBLE AS n FROM {table}),
    scored AS (
        SELECT tf.doc_id, tf.term, tf.tf,
               tf.tf * LN((SELECT n FROM n) / df.df) AS score,
               ROW_NUMBER() OVER (
                   PARTITION BY tf.doc_id ORDER BY tf.tf * LN((SELECT n FROM n) / df.df) DESC,
                   tf.term ASC
               ) AS rn
        FROM tf JOIN df ON tf.term = df.term
    )
    SELECT doc_id, term, tf, ROUND(score, {round_to}) AS score
    FROM scored WHERE rn <= {k}
    """


# Knuth's multiplicative-hash constant: spreads consecutive doc_ids
# uniformly over the permille buckets (deterministic, engine-portable —
# unlike xxhash64/DuckDB hash() which disagree across engines)
_MIX_KNUTH = 2654435761
_MIX_BUCKETS = 1000


def stratified_sample(
    docs: DataFrame, rates_permille: dict[str, int], default_permille: int = 1000
) -> DataFrame:
    """(doc_id, ...) — deterministic per-language downsampling: keep doc
    iff (doc_id · KNUTH) mod 1000 < rate‰ for its `lang` stratum. The
    data-MIXING primitive of a training pipeline (down-weight
    over-represented languages/sources); one scan, zero shuffles, and
    the same doc set on every run/engine (no RNG).

    doc_id must stay below ~3.5e9 for the int64 product; shard-local
    re-keying applies above that."""
    rate = F.lit(default_permille)
    for lang, permille in sorted(rates_permille.items()):
        rate = F.when(F.col("lang") == lang, F.lit(permille)).otherwise(rate)
    bucket = F.pmod(F.col("doc_id") * _MIX_KNUTH, F.lit(_MIX_BUCKETS))
    return docs.filter(bucket < rate)


def stratum_counts(docs: DataFrame, rates_permille: dict[str, int]) -> DataFrame:
    """(lang, source, n_total, n_sampled) — audit rollup of
    stratified_sample: how many docs each stratum keeps."""
    sampled = stratified_sample(docs, rates_permille).select(
        "doc_id", F.lit(1).alias("keep")
    )
    return (
        docs.join(sampled.select("doc_id", "keep"), "doc_id", "left")
        .groupBy("lang", "source")
        .agg(
            F.count("*").cast("long").alias("n_total"),
            F.sum(F.coalesce("keep", F.lit(0))).cast("long").alias("n_sampled"),
        )
    )


def stratum_counts_sql(
    rates_permille: dict[str, int],
    table: str = "documents",
    default_permille: int = 1000,
) -> str:
    cases = " ".join(
        f"WHEN lang = '{lang}' THEN {p}" for lang, p in sorted(rates_permille.items())
    )
    return f"""
    SELECT lang, source, COUNT(*)::BIGINT AS n_total,
           SUM(CASE WHEN (doc_id * {_MIX_KNUTH}) % {_MIX_BUCKETS}
                    < (CASE {cases} ELSE {default_permille} END)
               THEN 1 ELSE 0 END)::BIGINT AS n_sampled
    FROM {table}
    GROUP BY lang, source
    """


# ---------------------------------------------------------------------------
# PII scrubbing (redaction pass)
# ---------------------------------------------------------------------------

# Regexes restricted to the Java-regex ∩ RE2 common subset so the Spark
# (Java) and DuckDB (RE2) engines match byte-for-byte.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_LONGNUM_RE = r"[0-9]{6,}"


def pii_scrub(docs: DataFrame) -> DataFrame:
    """(doc_id, n_emails, n_long_numbers, text_scrubbed) — the redaction
    pass a training pipeline runs before tokenization: emails →
    ``<EMAIL>``, 6+-digit runs (phone/account-shaped) → ``<NUM>``, with
    per-doc audit counts. Long-number runs are counted AFTER the email
    scrub so digits inside an address aren't double-counted.

    Pure per-row JVM regex map over the scan — zero shuffles; at 100 TB
    this pipelines with the parquet read (whole-stage codegen keeps the
    regex in the scan stage)."""
    email_scrubbed = F.regexp_replace(F.col("text"), PII_EMAIL_RE, "<EMAIL>")
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(PII_EMAIL_RE), F.lit(0)))
        .cast("long")
        .alias("n_emails"),
        F.size(F.regexp_extract_all(email_scrubbed, F.lit(PII_LONGNUM_RE), F.lit(0)))
        .cast("long")
        .alias("n_long_numbers"),
        F.regexp_replace(email_scrubbed, PII_LONGNUM_RE, "<NUM>").alias("text_scrubbed"),
    )


def pii_scrub_sql(table: str = "documents") -> str:
    """Mirror of pii_scrub (DuckDB RE2 with the 'g' global flag)."""
    email_scrubbed = f"regexp_replace(text, '{PII_EMAIL_RE}', '<EMAIL>', 'g')"
    return f"""
    SELECT doc_id,
           len(regexp_extract_all(text, '{PII_EMAIL_RE}'))::BIGINT AS n_emails,
           len(regexp_extract_all({email_scrubbed}, '{PII_LONGNUM_RE}'))::BIGINT
               AS n_long_numbers,
           regexp_replace({email_scrubbed}, '{PII_LONGNUM_RE}', '<NUM>', 'g')
               AS text_scrubbed
    FROM {table}
    """


def repetition_stats(docs: DataFrame, n: int = NGRAM_N) -> DataFrame:
    """(doc_id, distinct_word_ratio, top_word_frac, dup_ngram_frac) — the
    Gopher-style within-document repetition signals (Rae et al. 2021 §A1:
    duplicate-line/paragraph fractions, most-frequent-word fraction,
    duplicate n-gram fractions) over whitespace words and word n-grams:

    * distinct_word_ratio = |distinct words| / |words|  (low = repetitive)
    * top_word_frac       = occurrences of the most frequent word / |words|
    * dup_ngram_frac      = 1 − |distinct n-grams| / |n-grams|

    Scale shape: two map-side-combinable keyed aggregations (word counts,
    n-gram counts), both partial-aggregated before the doc_id shuffle —
    no window, no join, no Python. Docs shorter than n words have 0
    n-grams; their dup_ngram_frac is 0 by definition (nothing repeats)."""
    words = docs.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
    wc = words.groupBy("doc_id", "w").agg(F.count("*").alias("c"))
    wstats = wc.groupBy("doc_id").agg(
        F.sum("c").alias("total_w"),
        F.count("*").alias("distinct_w"),
        F.max("c").alias("top_w"),
    )
    grams = docs.select("doc_id", F.explode(shingles_col(F.col("text"), n)).alias("g"))
    gc = grams.groupBy("doc_id", "g").agg(F.count("*").alias("c"))
    gstats = gc.groupBy("doc_id").agg(
        F.sum("c").alias("total_g"), F.count("*").alias("distinct_g")
    )
    return (
        wstats.join(gstats, "doc_id", "left")
        .select(
            "doc_id",
            F.round(F.col("distinct_w") / F.col("total_w"), 6).alias("distinct_word_ratio"),
            F.round(F.col("top_w") / F.col("total_w"), 6).alias("top_word_frac"),
            F.round(
                F.when(
                    F.coalesce("total_g", F.lit(0)) > 0,
                    1.0 - F.col("distinct_g") / F.col("total_g"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("dup_ngram_frac"),
        )
    )


def repetition_stats_sql(table: str = "documents", n: int = NGRAM_N) -> str:
    return f"""
    WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM {table}),
    wc AS (SELECT doc_id, w, COUNT(*) AS c FROM w GROUP BY doc_id, w),
    wstats AS (
        SELECT doc_id, SUM(c) AS total_w, COUNT(*) AS distinct_w, MAX(c) AS top_w
        FROM wc GROUP BY doc_id
    ),
    g AS (SELECT doc_id, unnest({shingles_sql("text", n)}) AS g FROM {table}),
    gc AS (SELECT doc_id, g, COUNT(*) AS c FROM g GROUP BY doc_id, g),
    gstats AS (
        SELECT doc_id, SUM(c) AS total_g, COUNT(*) AS distinct_g FROM gc GROUP BY doc_id
    )
    SELECT wstats.doc_id,
           ROUND(distinct_w / CAST(total_w AS DOUBLE), 6) AS distinct_word_ratio,
           ROUND(top_w / CAST(total_w AS DOUBLE), 6) AS top_word_frac,
           ROUND(CASE WHEN COALESCE(total_g, 0) > 0
                      THEN 1.0 - distinct_g / CAST(total_g AS DOUBLE)
                      ELSE 0.0 END, 6) AS dup_ngram_frac
    FROM wstats LEFT JOIN gstats ON wstats.doc_id = gstats.doc_id
    """


# ---------------------------------------------------------------------------
# temperature-based data mixing (α = 0.5)
# ---------------------------------------------------------------------------


def mixture_weights(docs: DataFrame, budget: int) -> DataFrame:
    """(lang, source, n_docs, weight, target_permille) — α-temperature
    data-mixing weights per stratum: w_i ∝ n_i^α with α = 1/2, the
    standard flattening that up-weights rare languages/sources when
    drawing a fixed training budget from an imbalanced corpus.

    α is fixed at 1/2 so the exponent is ``floor(sqrt(n))`` — IEEE sqrt
    is correctly rounded in both engines, so the whole computation stays
    in EXACT integer arithmetic (weights aside): no libm pow() drift
    between the Spark and DuckDB sides.  target_permille is the keep
    rate that lands the stratum at its budget share:
    ``min(1000, (1000·budget·s_i) div (S·n_i))``, computed in
    decimal(38,0)/HUGEINT so a 10^13-doc corpus cannot overflow the
    products.

    One groupBy of the corpus + a 1-row broadcast — no other shuffle.
    """
    strata = docs.groupBy("lang", "source").agg(F.count("*").cast("long").alias("n_docs"))
    strata = strata.withColumn("s_sqrt", F.floor(F.sqrt(F.col("n_docs"))).cast("long"))
    tot = strata.agg(F.sum("s_sqrt").cast("long").alias("s_total"))
    permille = F.least(
        F.lit(1000).cast("long"),
        F.expr(
            f"CAST((CAST({int(budget) * 1000} AS DECIMAL(38,0)) * s_sqrt) div "
            "(CAST(s_total AS DECIMAL(38,0)) * n_docs) AS BIGINT)"
        ),
    )
    return (
        strata.crossJoin(F.broadcast(tot))
        .select(
            "lang",
            "source",
            "n_docs",
            (F.col("s_sqrt") / F.col("s_total")).alias("weight"),
            permille.alias("target_permille"),
        )
    )


def mixture_weights_cte_sql(budget: int, table: str = "documents") -> str:
    """CTE body (strata/tot/mw) mirroring mixture_weights."""
    return f"""
strata AS (
  SELECT lang, source, COUNT(*)::BIGINT AS n_docs,
         CAST(FLOOR(SQRT(COUNT(*))) AS BIGINT) AS s_sqrt
  FROM {table} GROUP BY lang, source
),
tot AS (SELECT SUM(s_sqrt)::BIGINT AS s_total FROM strata),
mw AS (
  SELECT lang, source, n_docs,
         s_sqrt::DOUBLE / s_total AS weight,
         LEAST(1000, CAST(CAST({int(budget) * 1000} AS HUGEINT) * s_sqrt
                          // (CAST(s_total AS HUGEINT) * n_docs) AS BIGINT)) AS target_permille
  FROM strata, tot
)"""


def mixture_weights_sql(budget: int, table: str = "documents") -> str:
    return (
        "WITH "
        + mixture_weights_cte_sql(budget, table)
        + "\nSELECT lang, source, n_docs, weight, target_permille FROM mw"
    )


def temperature_sample(docs: DataFrame, budget: int) -> DataFrame:
    """(doc_id, lang, source) — the deterministic doc-level draw at the
    :func:`mixture_weights` rates: keep iff (doc_id·KNUTH) mod 1000 <
    stratum target_permille.  Zero RNG (same set every run/engine); the
    weights side is a broadcast join, so the draw is one corpus scan."""
    mw = mixture_weights(docs, budget).select("lang", "source", "target_permille")
    bucket = F.pmod(F.col("doc_id") * _MIX_KNUTH, F.lit(_MIX_BUCKETS))
    return (
        docs.join(F.broadcast(mw), ["lang", "source"])
        .filter(bucket < F.col("target_permille"))
        .select("doc_id", "lang", "source")
    )


def temperature_sample_sql(budget: int, table: str = "documents") -> str:
    return f"""WITH {mixture_weights_cte_sql(budget, table)}
SELECT d.doc_id, d.lang, d.source
FROM {table} d JOIN mw USING (lang, source)
WHERE (d.doc_id * {_MIX_KNUTH}) % {_MIX_BUCKETS} < mw.target_permille"""


# ---------------------------------------------------------------------------
# bigram LM quality scoring (CCNet-style perplexity proxy)
# ---------------------------------------------------------------------------


def ngram_lm_score(docs: DataFrame) -> DataFrame:
    """(doc_id, n_bigrams, lm_score) — mean add-one-smoothed bigram
    log-likelihood of each document under the LM trained on the corpus
    itself: the perplexity-proxy quality signal of a CCNet-style
    pipeline (low score ⇒ unnatural word sequences ⇒ drop candidate).

    lm_score = avg over doc bigrams of ln((c2(w1 w2)+1) / (c1(w1)+V)),
    with c2 corpus bigram counts, c1 = Σ c2 over bigrams starting with
    w1, V = corpus distinct-word count.  Docs with fewer than 2 words
    have no bigrams and are absent from the output.

    Scale: the count tables are vocab-bounded aggregates (one row per
    key), so the scoring joins are big-side-only skew — hot bigrams
    ("of the") probe a single build row each; AQE skew-split keeps the
    partitions even, nothing is collected.  V rides as a 1-row
    broadcast.  Rounded to 6 dp (the float-parity contract: both
    engines sum ~1e-16-ulp ln terms in arbitrary order)."""
    bg = docs.select("doc_id", F.explode(shingles_col(F.col("text"), 2)).alias("g"))
    c2 = bg.groupBy("g").agg(F.count("*").cast("long").alias("c2"))
    c1 = (
        c2.withColumn("w1", F.split("g", " ")[0])
        .groupBy("w1")
        .agg(F.sum("c2").cast("long").alias("c1"))
    )
    v = docs.select(F.explode(words_col(F.col("text"))).alias("w")).agg(
        F.count_distinct("w").cast("long").alias("v")
    )
    return (
        bg.join(c2, "g")
        .withColumn("w1", F.split("g", " ")[0])
        .join(c1, "w1")
        .crossJoin(F.broadcast(v))
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            F.round(
                F.avg(F.log((F.col("c2") + 1).cast("double") / (F.col("c1") + F.col("v")))),
                6,
            ).alias("lm_score"),
        )
    )


def ngram_lm_score_sql(table: str = "documents") -> str:
    first = "string_split(g, ' ')[1]"
    return f"""
WITH bg AS (SELECT doc_id, unnest({shingles_sql("text", 2)}) AS g FROM {table}),
c2 AS (SELECT g, COUNT(*)::BIGINT AS c2 FROM bg GROUP BY g),
c1 AS (SELECT {first} AS w1, SUM(c2)::BIGINT AS c1 FROM c2 GROUP BY w1),
v AS (SELECT COUNT(DISTINCT w)::BIGINT AS v
      FROM (SELECT unnest(string_split(text, ' ')) AS w FROM {table}))
SELECT bg.doc_id, COUNT(*)::BIGINT AS n_bigrams,
       ROUND(AVG(LN((c2.c2 + 1.0) / (c1.c1 + v.v))), 6) AS lm_score
FROM bg JOIN c2 USING (g)
        JOIN c1 ON string_split(bg.g, ' ')[1] = c1.w1, v
GROUP BY bg.doc_id"""


def stratum_topk_sample(docs: DataFrame, k: int) -> DataFrame:
    """(doc_id, lang, source, rank) — EXACTLY min(k, n_stratum) docs per
    (lang, source) stratum, chosen uniformly WITHOUT replacement by
    ranking on the portable hash (zero RNG, same set every run/engine).
    The fixed-size counterpart of the rate-based draws
    (stratified_sample / temperature_sample) — quota semantics when the
    budget is per-stratum document COUNTS.

    One hash-partitioned window per stratum (the community_representatives
    pattern). At extreme stratum sizes, pre-thin with a hash-threshold
    filter sized from stratum counts before the exact window — the
    kmeans_centroids sampling note applies."""
    from pyspark.sql import Window

    h = md5_long(F.concat_ws(":", F.lit("topk"), F.col("doc_id").cast("string")))
    w = Window.partitionBy("lang", "source").orderBy(h.asc(), F.col("doc_id").asc())
    return (
        docs.select("doc_id", "lang", "source")
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def stratum_topk_sample_sql(k: int, table: str = "documents") -> str:
    h = md5_long_sql("'topk:' || CAST(doc_id AS VARCHAR)")
    return f"""
    SELECT doc_id, lang, source, rank FROM (
        SELECT doc_id, lang, source,
               ROW_NUMBER() OVER (PARTITION BY lang, source
                                  ORDER BY {h} ASC, doc_id ASC)::BIGINT AS rank
        FROM {table}
    ) WHERE rank <= {k}"""


# DSIR (Data Selection via Importance Resampling, Xie et al. 2023,
# arXiv:2302.03169): score every raw document by the log-likelihood
# ratio of hashed n-gram features under a target-domain bag-of-ngrams
# model vs the raw-corpus model. Docs shaped like the target get high
# weights; resampling by these weights skews a 100 TB crawl toward the
# benchmark/domain distribution without training a classifier.
DSIR_BUCKETS = 10_000


def dsir_importance(
    docs: DataFrame, target: DataFrame, buckets: int = DSIR_BUCKETS
) -> DataFrame:
    """(doc_id, n_feats, dsir_logratio) — per-doc importance log-weight

        Σ over doc bigram occurrences of
            ln( (ct_target(b)+1)/(T+B) ) − ln( (ct_raw(b)+1)/(R+B) )

    where b = portable-hash bucket of the word bigram (mod ``buckets``),
    ct_* are bucket counts in the target / raw corpora, T/R their totals
    and B the bucket count (add-one smoothing).  Docs with fewer than 2
    words have no features and are absent — they carry no evidence.

    Scale shape: both count tables are bucket-bounded aggregates (≤ B
    rows each, broadcastable); the scoring join is big-side-only — hot
    buckets probe one build row each, AQE skew-split keeps partitions
    even; totals ride as a 1-row broadcast.  Rounded to 6 dp (both
    engines sum ~ulp-sized ln terms in arbitrary order).
    """
    feat = lambda df: df.select(
        "doc_id", F.explode(shingles_col(F.col("text"), 2)).alias("g")
    ).select("doc_id", (md5_long(F.col("g")) % buckets).alias("b"))
    raw_f = feat(docs)
    tgt_f = feat(target)
    cr = raw_f.groupBy("b").agg(F.count("*").cast("long").alias("cr"))
    ct = tgt_f.groupBy("b").agg(F.count("*").cast("long").alias("ct"))
    totals = (
        cr.agg(F.sum("cr").cast("long").alias("rt"))
        .crossJoin(ct.agg(F.sum("ct").cast("long").alias("tt")))
    )
    model = cr.join(ct, "b", "left").select(
        "b", "cr", F.coalesce("ct", F.lit(0)).alias("ct")
    )
    return (
        raw_f.join(model, "b")
        .crossJoin(F.broadcast(totals))
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_feats"),
            F.round(
                F.sum(
                    F.log((F.col("ct") + 1).cast("double") / (F.col("tt") + buckets))
                    - F.log((F.col("cr") + 1).cast("double") / (F.col("rt") + buckets))
                ),
                6,
            ).alias("dsir_logratio"),
        )
    )


def dsir_importance_sql(
    target_permille: int, buckets: int = DSIR_BUCKETS, table: str = "documents"
) -> str:
    """DuckDB twin; the gate's target side is a deterministic permille
    coin over doc_id (production passes the real benchmark corpus)."""
    h = md5_long_sql("g")
    coin = md5_long_sql("'dsir:' || CAST(doc_id AS VARCHAR)")
    return f"""
WITH feat AS (
    SELECT doc_id, {h} % {buckets} AS b
    FROM (SELECT doc_id, unnest({shingles_sql("text", 2)}) AS g FROM {table})
),
tgt AS (SELECT f.doc_id, f.b FROM feat f
        JOIN {table} d ON f.doc_id = d.doc_id
        WHERE {coin.replace("doc_id", "d.doc_id")} % 1000 < {target_permille}),
cr AS (SELECT b, COUNT(*)::BIGINT AS cr FROM feat GROUP BY b),
ct AS (SELECT b, COUNT(*)::BIGINT AS ct FROM tgt GROUP BY b),
tot AS (SELECT (SELECT SUM(cr) FROM cr)::BIGINT AS rt,
               (SELECT COALESCE(SUM(ct), 0) FROM ct)::BIGINT AS tt)
SELECT f.doc_id, COUNT(*)::BIGINT AS n_feats,
       ROUND(SUM(LN((COALESCE(ct.ct, 0) + 1.0) / (tot.tt + {buckets}))
               - LN((cr.cr + 1.0) / (tot.rt + {buckets}))), 6) AS dsir_logratio
FROM feat f JOIN cr USING (b) LEFT JOIN ct USING (b), tot
GROUP BY f.doc_id"""


def token_pmi(docs: DataFrame, min_count: int = 20) -> DataFrame:
    """(a, b, pair_count, pmi) — pointwise mutual information of ADJACENT
    token pairs across the corpus: pmi = ln(p(a,b) / (p(a)·p(b))) with
    p(a,b) over the bigram total and p(·) over the unigram total.  High
    PMI surfaces collocations (phrases that travel together); low/negative
    PMI flags template glue.  ``min_count`` drops noise pairs (classic
    PMI degenerates at count 1).

    Scale shape: one bigram count aggregate and one unigram count
    aggregate, both map-side combinable; the unigram table is
    vocab-bounded and broadcast onto the pair table twice — no corpus
    self-join, no window, no Python.  Output is value-filtered (no
    float ranking), so cross-engine ordering cannot flip rows."""
    uni = (
        docs.select(F.explode(F.split("text", " ")).alias("t"))
        .groupBy("t")
        .agg(F.count("*").alias("c"))
    )
    total = uni.agg(F.sum("c").alias("t_total"))
    bi = (
        docs.select(F.explode(shingles_col(F.col("text"), 2)).alias("g"))
        .select(
            F.split_part(F.col("g"), F.lit(" "), F.lit(1)).alias("a"),
            F.split_part(F.col("g"), F.lit(" "), F.lit(2)).alias("b"),
        )
        .groupBy("a", "b")
        .agg(F.count("*").alias("pair_count"))
        .filter(F.col("pair_count") >= min_count)
    )
    ptotal = (
        docs.select(F.explode(shingles_col(F.col("text"), 2)).alias("g"))
        .agg(F.count("*").alias("p_total"))
    )
    ua = uni.select(F.col("t").alias("a"), F.col("c").alias("c_a"))
    ub = uni.select(F.col("t").alias("b"), F.col("c").alias("c_b"))
    return (
        bi.join(F.broadcast(ua), "a")
        .join(F.broadcast(ub), "b")
        .crossJoin(F.broadcast(total))
        .crossJoin(F.broadcast(ptotal))
        .select(
            "a",
            "b",
            "pair_count",
            F.round(
                F.log(
                    (F.col("pair_count").cast("double") * F.col("t_total") * F.col("t_total"))
                    / (F.col("c_a").cast("double") * F.col("c_b") * F.col("p_total"))
                ),
                6,
            ).alias("pmi"),
        )
    )


def token_pmi_sql(table: str = "documents", min_count: int = 20) -> str:
    from .portable import shingles_sql

    return f"""
    WITH uni AS (
        SELECT t, COUNT(*)::BIGINT AS c
        FROM (SELECT unnest(string_split(text, ' ')) AS t FROM {table})
        GROUP BY t
    ),
    tot AS (SELECT SUM(c)::BIGINT AS t_total FROM uni),
    grams AS (SELECT unnest({shingles_sql("text", 2)}) AS g FROM {table}),
    ptot AS (SELECT COUNT(*)::BIGINT AS p_total FROM grams),
    bi AS (
        SELECT split_part(g, ' ', 1) AS a, split_part(g, ' ', 2) AS b,
               COUNT(*)::BIGINT AS pair_count
        FROM grams GROUP BY 1, 2
        HAVING COUNT(*) >= {min_count}
    )
    SELECT bi.a, bi.b, bi.pair_count,
           ROUND(ln((bi.pair_count::DOUBLE * t.t_total * t.t_total)
                    / (ua.c::DOUBLE * ub.c * p.p_total)), 6) AS pmi
    FROM bi
    JOIN uni ua ON bi.a = ua.t
    JOIN uni ub ON bi.b = ub.t
    CROSS JOIN tot t CROSS JOIN ptot p
    """


def boilerplate_strip(
    docs: DataFrame,
    min_df: int = 5,
    n: int = NGRAM_N,
    max_broadcast_grams: int = 10_000_000,
) -> DataFrame:
    """(doc_id, n_tokens, n_kept, keep_ratio, clean_text) — C4/RefinedWeb-
    style boilerplate removal at word-n-gram granularity: an n-gram that
    appears in ≥ ``min_df`` distinct documents is template glue; every
    token position it covers is stripped, and the cleaned text is
    reassembled in original order.  Mirrors the reference's
    curation-before-detection stance (data prep precedes scripts/
    overall_run.cpp's pipeline); sized as an absolute doc count —
    callers at corpus scale pass ~permille·|corpus|.

    Scale shape: the boilerplate gram set is bounded above by
    total_grams / min_df distinct values, so it broadcasts (guarded, as
    in ``decontamination_flags``: above ``max_broadcast_grams`` it falls
    back to a shuffled hash join).  Cost = two linear positional
    explodes + one (doc_id, pos)-keyed join + one doc_id group — no
    corpus self-join, no window, no Python.
    """
    w = words_col(F.col("text"))
    grams = docs.select(
        "doc_id",
        F.posexplode(shingles_col(F.col("text"), n)).alias("pos0", "gram"),
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "gram")
    bp = (
        grams.groupBy("gram")
        .agg(F.countDistinct("doc_id").alias("df"))
        .filter(F.col("df") >= min_df)
        .select("gram")
    )
    if bp.limit(max_broadcast_grams + 1).count() <= max_broadcast_grams:
        bp = F.broadcast(bp)
    covered = (
        grams.join(bp, "gram")
        .select(
            "doc_id",
            F.explode(F.sequence(F.col("pos"), F.col("pos") + (n - 1))).alias("pos"),
        )
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    toks = docs.select(
        "doc_id", F.posexplode(w).alias("pos0", "tok")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "tok")
    kept = F.col("hit").isNull()
    return (
        toks.join(covered, ["doc_id", "pos"], "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(kept.cast("long")).alias("n_kept"),
            F.round(F.sum(kept.cast("double")) / F.count("*"), 6).alias("keep_ratio"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.when(kept, F.struct("pos", "tok")))
                    ),
                    lambda s: s.tok,
                ),
                " ",
            ).alias("clean_text"),
        )
    )


def boilerplate_strip_sql(
    table: str = "documents", min_df: int = 5, n: int = NGRAM_N
) -> str:
    sh = shingles_sql("text", n)
    return f"""
    WITH grams AS (
        SELECT doc_id, unnest({sh}) AS gram,
               generate_subscripts({sh}, 1) AS pos
        FROM {table}
    ),
    bp AS (
        SELECT gram FROM grams GROUP BY gram
        HAVING COUNT(DISTINCT doc_id) >= {min_df}
    ),
    covered AS (
        SELECT DISTINCT doc_id, pos FROM (
            SELECT doc_id,
                   unnest(generate_series(pos, pos + {n - 1})) AS pos
            FROM grams JOIN bp USING (gram)
        )
    ),
    toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
               generate_subscripts(string_split(text, ' '), 1) AS pos
        FROM {table}
    )
    SELECT t.doc_id,
           COUNT(*)::BIGINT AS n_tokens,
           SUM(CASE WHEN c.pos IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_kept,
           ROUND(SUM(CASE WHEN c.pos IS NULL THEN 1 ELSE 0 END)::DOUBLE
                 / COUNT(*), 6) AS keep_ratio,
           COALESCE(string_agg(CASE WHEN c.pos IS NULL THEN t.tok END,
                               ' ' ORDER BY t.pos), '') AS clean_text
    FROM toks t LEFT JOIN covered c USING (doc_id, pos)
    GROUP BY t.doc_id
    """


ZIPF_TOP_RANKS = 100


def corpus_stats(docs: DataFrame, top_ranks: int = ZIPF_TOP_RANKS) -> DataFrame:
    """One-row corpus-health card: (n_tokens, vocab_size, hapax_frac,
    top1_share, zipf_slope) — total token mass, distinct vocabulary,
    fraction of vocabulary seen exactly once (Heaps-law tail; a high
    hapax share on web text usually means OCR noise or boilerplate IDs),
    share of the single most frequent token, and the OLS slope of
    ln(freq) ~ ln(rank) over the top ``top_ranks`` ranks (healthy
    natural-language corpora sit near -1; templated corpora are much
    flatter).

    Scale shape: ONE map-side-combinable token count aggregate over the
    corpus; everything after runs on the vocab-bounded count table (the
    rank window sorts only ``top_ranks`` rows after a count-desc top-k,
    never the corpus).  Ties rank deterministically by (count desc,
    token asc) in both engines.
    """
    counts = (
        docs.select(F.explode(words_col(F.col("text"))).alias("t"))
        .groupBy("t")
        .agg(F.count("*").alias("c"))
    )
    totals = counts.agg(
        F.sum("c").alias("n_tokens"),
        F.count("*").alias("vocab_size"),
        F.sum((F.col("c") == 1).cast("long")).alias("n_hapax"),
        F.max("c").alias("top1"),
    )
    from pyspark.sql import Window as _W

    w = _W.orderBy(F.col("c").desc(), F.col("t").asc())
    top = (
        counts.orderBy(F.col("c").desc(), F.col("t").asc())
        .limit(top_ranks)
        .withColumn("rank", F.row_number().over(w))
        .select(
            F.log(F.col("rank").cast("double")).alias("x"),
            F.log(F.col("c").cast("double")).alias("y"),
        )
    )
    slope = top.agg(
        (
            (F.count("*") * F.sum(F.col("x") * F.col("y")) - F.sum("x") * F.sum("y"))
            / (F.count("*") * F.sum(F.col("x") * F.col("x")) - F.sum("x") * F.sum("x"))
        ).alias("zipf_slope")
    )
    return totals.crossJoin(slope).select(
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("vocab_size").cast("long").alias("vocab_size"),
        F.round(F.col("n_hapax") / F.col("vocab_size"), 6).alias("hapax_frac"),
        F.round(F.col("top1") / F.col("n_tokens"), 6).alias("top1_share"),
        F.round("zipf_slope", 6).alias("zipf_slope"),
    )


def corpus_stats_sql(table: str = "documents", top_ranks: int = ZIPF_TOP_RANKS) -> str:
    return f"""
    WITH counts AS (
        SELECT t, COUNT(*)::BIGINT AS c
        FROM (SELECT unnest(string_split(text, ' ')) AS t FROM {table})
        GROUP BY t
    ),
    totals AS (
        SELECT SUM(c)::BIGINT AS n_tokens, COUNT(*)::BIGINT AS vocab_size,
               SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END)::BIGINT AS n_hapax,
               MAX(c) AS top1
        FROM counts
    ),
    top AS (
        SELECT ln(ROW_NUMBER() OVER (ORDER BY c DESC, t ASC)) AS x,
               ln(c::DOUBLE) AS y
        FROM counts ORDER BY c DESC, t ASC LIMIT {top_ranks}
    ),
    slope AS (
        SELECT (COUNT(*) * SUM(x * y) - SUM(x) * SUM(y))
               / (COUNT(*) * SUM(x * x) - SUM(x) * SUM(x)) AS zipf_slope
        FROM top
    )
    SELECT t.n_tokens, t.vocab_size,
           ROUND(t.n_hapax::DOUBLE / t.vocab_size, 6) AS hapax_frac,
           ROUND(t.top1::DOUBLE / t.n_tokens, 6) AS top1_share,
           ROUND(s.zipf_slope, 6) AS zipf_slope
    FROM totals t CROSS JOIN slope s
    """


LR_ITERS = 10
LR_RATE = 0.5
GRAD_ROUND = 10  # per-iteration gradient rounding: quashes summation-order
#                  float noise so Spark and the unrolled-SQL oracle walk
#                  the exact same IEEE trajectory


def _lr_features(docs: DataFrame):
    """Deterministic (y, x1, x2): label = doc is English; features are
    scaled char/token lengths.  Shared by quality_lr_fit and its oracle
    builder (the SQL twin mirrors these expressions verbatim)."""
    return docs.select(
        (F.col("lang") == "en").cast("double").alias("y"),
        (F.length("text") / F.lit(100.0)).alias("x1"),
        (F.size(words_col(F.col("text"))) / F.lit(20.0)).alias("x2"),
    )


def quality_lr_fit(
    docs: DataFrame, iters: int = LR_ITERS, lr: float = LR_RATE
) -> DataFrame:
    """One-row (wb, w1, w2, logloss) — logistic-regression fit of an
    is-English quality classifier on two scaled length features, by
    ``iters`` full-batch gradient-descent steps from zero init.

    Spark-first shape: each step is ONE map-side-combinable aggregate
    over the corpus (sigmoid + residual stay in whole-stage codegen);
    the only driver traffic is the 3-float gradient per step — the same
    scalar-per-iteration pattern as MLlib's own gradient descent, so the
    op is a single corpus pass per iteration at any scale.  The gradient
    is rounded to {GRAD_ROUND} dp each step, making the weight
    trajectory bit-identical to the unrolled-SQL oracle regardless of
    partial-aggregation order.
    """
    feats = _lr_features(docs).persist()
    try:
        wb = w1 = w2 = 0.0
        for _ in range(iters):
            z = F.lit(wb) + F.lit(w1) * F.col("x1") + F.lit(w2) * F.col("x2")
            p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
            r = feats.agg(
                F.round(F.avg(p - F.col("y")), GRAD_ROUND).alias("gb"),
                F.round(F.avg((p - F.col("y")) * F.col("x1")), GRAD_ROUND).alias("g1"),
                F.round(F.avg((p - F.col("y")) * F.col("x2")), GRAD_ROUND).alias("g2"),
            ).collect()[0]
            wb, w1, w2 = wb - lr * r["gb"], w1 - lr * r["g1"], w2 - lr * r["g2"]
        z = F.lit(wb) + F.lit(w1) * F.col("x1") + F.lit(w2) * F.col("x2")
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
        return feats.agg(
            F.round(F.lit(wb), 6).alias("wb"),
            F.round(F.lit(w1), 6).alias("w1"),
            F.round(F.lit(w2), 6).alias("w2"),
            F.round(
                F.avg(-(F.col("y") * F.log(p) + (1 - F.col("y")) * F.log(1 - p))), 6
            ).alias("logloss"),
        )
    finally:
        feats.unpersist()


def quality_lr_fit_sql(
    table: str = "documents", iters: int = LR_ITERS, lr: float = LR_RATE
) -> str:
    """Unrolled gradient-descent oracle: one gradient CTE + one weight CTE
    per iteration (pagerank_unrolled_sql pattern), gradients rounded
    identically to the Spark side."""
    feats = f"""feats AS (
        SELECT CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y,
               length(text) / 100.0 AS x1,
               len(string_split(text, ' ')) / 20.0 AS x2
        FROM {table}
    )"""
    parts = [feats, "w0 AS (SELECT 0.0 AS wb, 0.0 AS w1, 0.0 AS w2)"]
    for i in range(1, iters + 1):
        parts.append(
            f"""g{i} AS (
        SELECT ROUND(AVG(p - y), {GRAD_ROUND}) AS gb,
               ROUND(AVG((p - y) * x1), {GRAD_ROUND}) AS g1,
               ROUND(AVG((p - y) * x2), {GRAD_ROUND}) AS g2
        FROM (SELECT y, x1, x2,
                     1.0 / (1.0 + exp(-(w.wb + w.w1 * x1 + w.w2 * x2))) AS p
              FROM feats CROSS JOIN w{i - 1} w)
    ),
    w{i} AS (
        SELECT w.wb - {lr} * g.gb AS wb, w.w1 - {lr} * g.g1 AS w1,
               w.w2 - {lr} * g.g2 AS w2
        FROM w{i - 1} w CROSS JOIN g{i} g
    )"""
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f""",
    scored AS (
        SELECT y, 1.0 / (1.0 + exp(-(w.wb + w.w1 * x1 + w.w2 * x2))) AS p,
               w.wb, w.w1, w.w2
        FROM feats CROSS JOIN w{iters} w
    )
    SELECT ROUND(ANY_VALUE(wb), 6) AS wb, ROUND(ANY_VALUE(w1), 6) AS w1,
           ROUND(ANY_VALUE(w2), 6) AS w2,
           ROUND(AVG(-(y * ln(p) + (1 - y) * ln(1 - p))), 6) AS logloss
    FROM scored
    """
    )


def quality_lr_score(
    docs: DataFrame, iters: int = LR_ITERS, lr: float = LR_RATE
) -> DataFrame:
    """(doc_id, p_en, keep) — inference side of quality_lr_fit: score
    every document with the fitted classifier.  The weights come back
    from the fit as ONE driver-side row (scalar collect, house rule);
    scoring is a pure per-row expression on the scan — no shuffle, no
    Python — so the op is a single corpus pass at any scale.  p is
    rounded to 6 decimals before the keep threshold in both engines so
    libm exp() ulp differences cannot flip a decision."""
    w = quality_lr_fit(docs, iters=iters, lr=lr).collect()[0]
    z = (
        F.lit(float(w["wb"]))
        + F.lit(float(w["w1"])) * (F.length("text") / F.lit(100.0))
        + F.lit(float(w["w2"])) * (F.size(words_col(F.col("text"))) / F.lit(20.0))
    )
    p = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6)
    return docs.select("doc_id", p.alias("p_en"), (p >= 0.5).alias("keep"))


def quality_lr_score_sql(
    table: str = "documents", iters: int = LR_ITERS, lr: float = LR_RATE
) -> str:
    """Unrolled fit (same CTE chain as quality_lr_fit_sql, with the
    final 6-dp weight rounding the Spark side consumes) + per-doc
    scoring."""
    feats = f"""feats AS (
        SELECT doc_id,
               length(text) / 100.0 AS x1,
               len(string_split(text, ' ')) / 20.0 AS x2,
               CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y
        FROM {table}
    )"""
    parts = [feats, "w0 AS (SELECT 0.0 AS wb, 0.0 AS w1, 0.0 AS w2)"]
    for i in range(1, iters + 1):
        parts.append(
            f"""g{i} AS (
        SELECT ROUND(AVG(p - y), {GRAD_ROUND}) AS gb,
               ROUND(AVG((p - y) * x1), {GRAD_ROUND}) AS g1,
               ROUND(AVG((p - y) * x2), {GRAD_ROUND}) AS g2
        FROM (SELECT y, x1, x2,
                     1.0 / (1.0 + exp(-(w.wb + w.w1 * x1 + w.w2 * x2))) AS p
              FROM feats CROSS JOIN w{i - 1} w)
    ),
    w{i} AS (
        SELECT w.wb - {lr} * g.gb AS wb, w.w1 - {lr} * g.g1 AS w1,
               w.w2 - {lr} * g.g2 AS w2
        FROM w{i - 1} w CROSS JOIN g{i} g
    )"""
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f""",
    wfin AS (
        SELECT ROUND(wb, 6) AS wb, ROUND(w1, 6) AS w1, ROUND(w2, 6) AS w2
        FROM w{iters}
    ),
    scored AS (
        SELECT doc_id,
               ROUND(1.0 / (1.0 + exp(-(w.wb + w.w1 * x1 + w.w2 * x2))), 6) AS p_en
        FROM feats CROSS JOIN wfin w
    )
    SELECT doc_id, p_en, p_en >= 0.5 AS keep FROM scored
    """
    )


def ngram_coverage(
    docs: DataFrame, n: int = NGRAM_N, val_permille: int = 100, seed: int = 17
) -> DataFrame:
    """One row (val_shingles, covered, coverage) — the fraction of the
    held-out split's DISTINCT word n-grams that also occur in the train
    split, under the same portable-hash doc-level split rule as
    holdout_split.

    Pipeline use: the coverage side of the train/eval divide — low
    coverage means the eval slice probes genuinely unseen text (good for
    generalization measurement), near-1.0 coverage means the split is
    redundant with training data. The dual of decontamination (which
    asks the same question and wants the answer ZERO at the doc level).

    Scale shape: two explode+distinct passes (each a map-side-combinable
    aggregate on the shingle hash); the coverage probe is a LEFT SEMI
    join of the val shingle set (small: permille of the corpus) against
    the train set keyed on the same 60-bit hash — shuffle bounded by
    distinct-shingle cardinality, never the corpus row count; final agg
    is 2 scalars."""
    coin = md5_long(F.concat_ws(":", F.lit(str(seed)), F.col("doc_id").cast("string"))) % 1000
    tagged = docs.select(
        (coin < val_permille).alias("is_val"),
        F.explode(shingles_col(F.col("text"), n)).alias("shingle"),
    ).select("is_val", md5_long(F.col("shingle")).alias("h"))
    train = tagged.filter(~F.col("is_val")).select("h").distinct()
    val = tagged.filter(F.col("is_val")).select("h").distinct()
    covered = val.join(train, "h", "left_semi")
    return (
        val.agg(F.count("*").alias("val_shingles"))
        .crossJoin(covered.agg(F.count("*").alias("covered")))
        .select(
            F.col("val_shingles").cast("long").alias("val_shingles"),
            F.col("covered").cast("long").alias("covered"),
            F.round(F.col("covered") / F.col("val_shingles"), 6).alias("coverage"),
        )
    )


def ngram_coverage_sql(
    n: int = NGRAM_N,
    val_permille: int = 100,
    seed: int = 17,
    table: str = "documents",
) -> str:
    coin = md5_long_sql(f"'{seed}:' || CAST(doc_id AS VARCHAR)") + " % 1000"
    sh = shingles_sql("text", n)
    return f"""
    WITH tagged AS (
        SELECT ({coin}) < {val_permille} AS is_val,
               {md5_long_sql("s.shingle")} AS h
        FROM {table}, UNNEST({sh}) AS s(shingle)
    ),
    train AS (SELECT DISTINCT h FROM tagged WHERE NOT is_val),
    val AS (SELECT DISTINCT h FROM tagged WHERE is_val),
    cov AS (SELECT COUNT(*) AS covered FROM val WHERE h IN (SELECT h FROM train)),
    vn AS (SELECT COUNT(*) AS val_shingles FROM val)
    SELECT val_shingles::BIGINT AS val_shingles, covered::BIGINT AS covered,
           ROUND(covered / CAST(val_shingles AS DOUBLE), 6) AS coverage
    FROM vn, cov
    """


CHUNK_TOKENS = 24
CHUNK_STRIDE = 12


def chunk_windows(
    docs: DataFrame, chunk_tokens: int = CHUNK_TOKENS, stride: int = CHUNK_STRIDE
) -> DataFrame:
    """(doc_id, chunk_idx, n_tokens, chunk_hash) — fixed-size token
    windows with overlap (stride < chunk_tokens), the retrieval-corpus /
    pretraining chunking primitive: chunk i covers tokens
    [i·stride, i·stride + chunk_tokens); the LAST chunk may be short but
    a document never loses its tail; a doc shorter than one chunk emits
    exactly one chunk.  chunk_hash is the 60-bit portable hash of the
    space-rejoined token slice, so downstream exact-dedup of chunks
    works across engines.

    Scale: pure per-row JVM array math (split + slice + hash) riding the
    scan, one explode whose fan-out is ceil(n_tokens/stride) — no
    shuffle, no Python."""
    from .portable import md5_long, words_col

    toks = words_col(F.col("text"))
    n_chunks = F.greatest(
        F.lit(1), F.ceil((F.col("n") - F.lit(chunk_tokens)) / F.lit(stride)) + F.lit(1)
    ).cast("int")
    return (
        docs.select("doc_id", toks.alias("toks"), F.size(toks).alias("n"))
        .select(
            "doc_id",
            "toks",
            F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
        )
        .select(
            "doc_id",
            "chunk_idx",
            F.slice(
                F.col("toks"), F.col("chunk_idx") * stride + 1, chunk_tokens
            ).alias("chunk"),
        )
        .select(
            "doc_id",
            "chunk_idx",
            F.size("chunk").alias("n_tokens"),
            md5_long(F.concat_ws(" ", F.col("chunk"))).alias("chunk_hash"),
        )
    )


def chunk_windows_sql(
    table: str = "documents",
    chunk_tokens: int = CHUNK_TOKENS,
    stride: int = CHUNK_STRIDE,
) -> str:
    from .portable import md5_long_sql

    h = md5_long_sql("array_to_string(chunk, ' ')")
    return f"""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS t, len(string_split(text, ' ')) AS n
        FROM {table}
    ),
    fan AS (
        SELECT doc_id, t, n,
               UNNEST(generate_series(0,
                   GREATEST(1, CEIL((n - {chunk_tokens}) / {stride}.0)::INT + 1) - 1
               )) AS chunk_idx
        FROM toks
    ),
    sliced AS (
        SELECT doc_id, chunk_idx,
               t[chunk_idx * {stride} + 1 : chunk_idx * {stride} + {chunk_tokens}] AS chunk
        FROM fan
    )
    SELECT doc_id, chunk_idx::INT AS chunk_idx,
           len(chunk)::INT AS n_tokens, {h} AS chunk_hash
    FROM sliced
    """


SPAN_LEN = 3
SPAN_RATE_PERMILLE = 150


def span_corruption_spans(
    docs: DataFrame,
    span_len: int = SPAN_LEN,
    rate_permille: int = SPAN_RATE_PERMILLE,
) -> DataFrame:
    """(doc_id, span_idx, start_tok, n_tok, span_hash) — T5/UL2-style
    span-corruption mask selection, RNG-free: tokens are grouped into
    spans of ``span_len``; span g of doc d is masked iff
    md5_60("span:d:g") % 1000 < rate_permille (≈15% token budget at the
    defaults, the T5 recipe).  Deterministic and portable, so the
    denoising targets an engine on the other side of the planet
    regenerates bit-identically — no mask tensors need shipping.
    span_hash fingerprints the masked token slice (the target text).

    Scale: per-row JVM split + one explode of n_tokens/span_len rows +
    a per-row hash filter — no shuffle, no Python."""
    from .portable import md5_long, words_col

    toks = words_col(F.col("text"))
    n_spans = F.ceil(F.size(toks) / F.lit(span_len)).cast("int")
    fan = docs.select(
        "doc_id",
        toks.alias("toks"),
        F.size(toks).alias("n"),
        F.explode(F.sequence(F.lit(0), n_spans - 1)).alias("span_idx"),
    )
    coin = (
        F.pmod(
            md5_long(
                F.concat_ws(
                    ":", F.lit("span"), F.col("doc_id").cast("string"), F.col("span_idx").cast("string")
                )
            ),
            F.lit(1000),
        )
        < rate_permille
    )
    masked = fan.filter(coin).select(
        "doc_id",
        F.col("span_idx").cast("long").alias("span_idx"),
        (F.col("span_idx") * span_len).cast("long").alias("start_tok"),
        F.least(F.lit(span_len), F.col("n") - F.col("span_idx") * span_len)
        .cast("int")
        .alias("n_tok"),
        md5_long(
            F.concat_ws(" ", F.slice(F.col("toks"), F.col("span_idx") * span_len + 1, span_len))
        ).alias("span_hash"),
    )
    return masked


def span_corruption_spans_sql(
    table: str = "documents",
    span_len: int = SPAN_LEN,
    rate_permille: int = SPAN_RATE_PERMILLE,
) -> str:
    from .portable import md5_long_sql

    coin = md5_long_sql("'span:' || CAST(doc_id AS VARCHAR) || ':' || CAST(span_idx AS VARCHAR)")
    h = md5_long_sql("array_to_string(t[span_idx * " + str(span_len) + " + 1 : span_idx * " + str(span_len) + f" + {span_len}], ' ')")
    return f"""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS t, len(string_split(text, ' ')) AS n
        FROM {table}
    ),
    fan AS (
        SELECT doc_id, t, n,
               UNNEST(generate_series(0, CEIL(n / {span_len}.0)::INT - 1)) AS span_idx
        FROM toks
    )
    SELECT doc_id, span_idx::BIGINT AS span_idx,
           (span_idx * {span_len})::BIGINT AS start_tok,
           LEAST({span_len}, n - span_idx * {span_len})::INT AS n_tok,
           {h} AS span_hash
    FROM fan
    WHERE {coin} % 1000 < {rate_permille}
    """


LOGODDS_PRIOR = 100.0
LOGODDS_TOPK = 5


def source_log_odds(
    docs: DataFrame, k: int = LOGODDS_TOPK, prior: float = LOGODDS_PRIOR
) -> DataFrame:
    """(source, rank, token, z) — the top-k DISTINCTIVE tokens per
    source via log-odds with an informative Dirichlet prior (Monroe,
    Colaresi & Quinn 2008, "Fightin' Words"): for token w in source s,

        δ = log[(y_sw+α_w)/(n_s+α0−y_sw−α_w)]
          − log[(y_w−y_sw+α_w)/(n−n_s+α0−y_w+y_sw−α_w)]
        z = δ / sqrt(1/(y_sw+α_w) + 1/(y_w−y_sw+α_w))

    with α_w = α0·y_w/n — the corpus-comparison op that surfaces what
    a source over-uses relative to the rest (crawl-vs-curated drift,
    contamination fingerprints).  Raw frequency top-k would just return
    stopwords; the prior-shrunk z-score is the standard fix.

    Shape: one (source, token) aggregate + one token-keyed corpus join
    (token marginals are a broadcast-scale table after aggregation) +
    a per-source window top-k.  z rounded to 6 dp BEFORE ranking in
    both engines (tie-break token asc)."""
    toks = docs.select(
        "source", F.explode(words_col(F.col("text"))).alias("token")
    )
    sw = toks.groupBy("source", "token").agg(F.count("*").cast("double").alias("ysw"))
    w = toks.groupBy("token").agg(F.count("*").cast("double").alias("yw"))
    ns = toks.groupBy("source").agg(F.count("*").cast("double").alias("ns"))
    n_total = toks.count()
    a0 = prior
    scored = (
        sw.join(F.broadcast(ns), "source")
        .join(w, "token")
        .select(
            "source",
            "token",
            "ysw",
            "yw",
            "ns",
            (F.lit(a0) * F.col("yw") / F.lit(float(n_total))).alias("aw"),
        )
        .select(
            "source",
            "token",
            F.round(
                (
                    F.log(
                        (F.col("ysw") + F.col("aw"))
                        / (F.col("ns") + F.lit(a0) - F.col("ysw") - F.col("aw"))
                    )
                    - F.log(
                        (F.col("yw") - F.col("ysw") + F.col("aw"))
                        / (
                            F.lit(float(n_total))
                            - F.col("ns")
                            + F.lit(a0)
                            - F.col("yw")
                            + F.col("ysw")
                            - F.col("aw")
                        )
                    )
                )
                / F.sqrt(
                    1.0 / (F.col("ysw") + F.col("aw"))
                    + 1.0 / (F.col("yw") - F.col("ysw") + F.col("aw"))
                ),
                6,
            ).alias("z"),
        )
    )
    rank = F.row_number().over(
        Window.partitionBy("source").orderBy(F.desc("z"), F.asc("token"))
    )
    return scored.select("source", rank.alias("rank"), "token", "z").filter(
        F.col("rank") <= k
    )


def source_log_odds_sql(
    table: str = "documents", k: int = LOGODDS_TOPK, prior: float = LOGODDS_PRIOR
) -> str:
    return f"""
    WITH toks AS (
        SELECT source, UNNEST(string_split(text, ' ')) AS token FROM {table}
    ),
    sw AS (SELECT source, token, COUNT(*)::DOUBLE AS ysw FROM toks GROUP BY source, token),
    w AS (SELECT token, COUNT(*)::DOUBLE AS yw FROM toks GROUP BY token),
    ns AS (SELECT source, COUNT(*)::DOUBLE AS ns FROM toks GROUP BY source),
    nt AS (SELECT COUNT(*)::DOUBLE AS n FROM toks),
    scored AS (
        SELECT sw.source, sw.token,
               ROUND((
                   ln((ysw + {prior} * yw / n) / (ns + {prior} - ysw - {prior} * yw / n))
                 - ln((yw - ysw + {prior} * yw / n)
                      / (n - ns + {prior} - yw + ysw - {prior} * yw / n))
               ) / sqrt(1.0 / (ysw + {prior} * yw / n)
                        + 1.0 / (yw - ysw + {prior} * yw / n)), 6) AS z
        FROM sw JOIN ns USING (source) JOIN w USING (token), nt
    )
    SELECT source, rank::INT AS rank, token, z FROM (
        SELECT source, token, z,
               ROW_NUMBER() OVER (PARTITION BY source ORDER BY z DESC, token ASC) AS rank
        FROM scored
    ) WHERE rank <= {k}
    """


def readability_scores(docs: DataFrame, round_to: int = 4) -> DataFrame:
    """(doc_id, n_words, n_sentences, n_syllables, flesch) — Flesch
    reading-ease (Flesch '48, public formula) as a curation signal:
    very high scores flag listicles/boilerplate, very low flag OCR
    garbage and code-as-prose.

        flesch = 206.835 − 1.015·(words/sentences) − 84.6·(syllables/words)

    Counting conventions (identical in both engines, documented here as
    THE definition): words = non-empty space-split tokens; syllables =
    maximal vowel runs ([aeiouAEIOU]+) across the text; sentences =
    maximal terminator runs ([.!?]+), clamped to ≥ 1.  The run counts
    use the marker-replace trick (replace every run with '#', count
    '#') so the whole op is three JVM regex passes on the scan — no
    explode, no shuffle, no Python; docs with zero words are dropped
    (the formula is undefined there).
    """
    def _run_count(col, pattern):
        marked = F.regexp_replace(col, pattern, "#")
        return (
            F.length(marked) - F.length(F.regexp_replace(marked, "#", ""))
        ).cast("long")

    n_words = F.size(F.filter(F.split(F.col("text"), " "), lambda x: x != "")).cast(
        "long"
    )
    n_syll = _run_count(F.col("text"), "[aeiouAEIOU]+")
    n_sent = F.greatest(F.lit(1).cast("long"), _run_count(F.col("text"), r"[.!?]+"))
    return (
        docs.select(
            "doc_id",
            n_words.alias("n_words"),
            n_sent.alias("n_sentences"),
            n_syll.alias("n_syllables"),
        )
        .filter(F.col("n_words") > 0)
        .withColumn(
            "flesch",
            F.round(
                F.lit(206.835)
                - F.lit(1.015) * (F.col("n_words") / F.col("n_sentences"))
                - F.lit(84.6) * (F.col("n_syllables") / F.col("n_words")),
                round_to,
            ),
        )
    )


def readability_scores_sql(table: str = "documents", round_to: int = 4) -> str:
    def _run_count(expr, pattern):
        marked = f"regexp_replace({expr}, '{pattern}', '#', 'g')"
        return f"(length({marked}) - length(replace({marked}, '#', '')))::BIGINT"

    n_words = (
        f"len(list_filter(string_split(text, ' '), x -> x <> ''))::BIGINT"
    )
    n_syll = _run_count("text", "[aeiouAEIOU]+")
    n_sent = f"GREATEST(1::BIGINT, {_run_count('text', '[.!?]+')})"
    return f"""
    WITH counted AS (
        SELECT doc_id,
               {n_words} AS n_words,
               {n_sent} AS n_sentences,
               {n_syll} AS n_syllables
        FROM {table}
    )
    SELECT doc_id, n_words, n_sentences, n_syllables,
           ROUND(206.835 - 1.015 * (n_words::DOUBLE / n_sentences)
                 - 84.6 * (n_syllables::DOUBLE / n_words), {round_to}) AS flesch
    FROM counted WHERE n_words > 0
    """


WINNOW_W = 4


def winnowing_fingerprints(
    docs: DataFrame, n: int = NGRAM_N, w: int = WINNOW_W
) -> DataFrame:
    """(doc_id, fp) — MOSS winnowing fingerprints (Schleimer, Wilkerson
    & Aiken, SIGMOD'03) over word ``n``-gram hashes with window ``w``:
    from each run of ``w`` consecutive shingle hashes the minimum is
    selected, and the per-document fingerprint set is the distinct
    selected hashes.  Guarantee: any shared passage of at least
    ``w + n − 1`` words between two documents yields at least one
    shared fingerprint, while the expected density is only 2/(w+1) of
    all shingles — the robust local-fingerprinting upgrade over
    doc_fingerprint's global-min-k sketch (analysis.py above), and the
    standard plagiarism / clone-detection primitive.

    Docs with fewer than ``n`` words emit no rows (no shingles to
    select from); docs with fewer than ``w`` shingles winnow the whole
    document (one global min).

    Scale shape: pure per-row JVM array math riding the scan — shingle,
    hash, slide, min, distinct all inside whole-stage codegen; ONE
    explode of the per-doc fingerprint set and zero shuffles/Python
    (the pii_scrub discipline).  Matching docs downstream is a plain
    groupBy on fp.
    """
    hs = F.transform(shingles_col(F.col("text"), n), lambda s: md5_long(s))
    d = docs.select("doc_id", hs.alias("hs")).filter(F.size("hs") >= 1)
    n_win = F.greatest(F.lit(1), F.size("hs") - F.lit(w - 1))
    fps = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), n_win),
            lambda s: F.array_min(F.slice(F.col("hs"), s, F.lit(w))),
        )
    )
    return d.select("doc_id", F.explode(fps).alias("fp"))


def winnowing_fingerprints_sql(
    table: str = "documents", n: int = NGRAM_N, w: int = WINNOW_W
) -> str:
    return f"""
    WITH wf_sh AS (SELECT doc_id, {shingles_sql("text", n)} AS sg FROM {table}),
    wf_hs AS (
        SELECT doc_id, list_transform(sg, s -> {md5_long_sql("s")}) AS h
        FROM wf_sh WHERE len(sg) >= 1
    ),
    wf_win AS (
        SELECT doc_id, h,
               UNNEST(generate_series(1, GREATEST(1, len(h) - {w - 1}))) AS s
        FROM wf_hs
    )
    SELECT DISTINCT doc_id, list_aggregate(h[s : s + {w - 1}], 'min') AS fp
    FROM wf_win
    """


# ---------------------------------------------------------------------------
# Gopher rule-based quality filtering (Rae et al. 2021 §A1.1)
# ---------------------------------------------------------------------------

GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WORD_LEN = 3.0
GOPHER_MAX_MEAN_WORD_LEN = 10.0
GOPHER_MAX_SYMBOL_RATIO = 0.1
GOPHER_MIN_ALPHA_FRAC = 0.8
GOPHER_MIN_STOPWORDS = 2


def gopher_rule_flags(docs: DataFrame) -> DataFrame:
    """(doc_id, n_words, mean_word_len, symbol_ratio, alpha_frac,
    n_stopwords, ok_words, ok_word_len, ok_symbols, ok_alpha,
    ok_stopwords, keep) — the Gopher HARD keep/drop rule set (Rae et
    al. 2021 §A1.1), the binary sibling of text_quality's continuous
    score and repetition_stats' repetition signals:

      * 50 <= word count <= 100k
      * 3 <= mean word length <= 10
      * (# + ellipsis) symbols per word <= 0.1
      * >= 80% of words contain an alphabetic character
      * >= 2 English stopwords present

    All signals are per-row JVM expressions riding the scan (zero
    shuffles, the pii_scrub discipline); each ratio is computed from
    exact int counts then 6dp-rounded BEFORE the threshold compare, so
    the keep decision cannot ulp-flip across engines.  The original
    rules also bound bullet-/ellipsis-LINE fractions; the corpus here
    is single-line (no \\n in the testdata documents) so those two
    rules are vacuously true and omitted — add them as two more
    line-array filters when ingesting multi-line corpora.
    """
    toks = F.split(F.col("text"), " ")
    n_words = F.size(toks).cast("long")
    n_chars = F.length(F.col("text"))
    mwl = F.round((n_chars - (n_words - 1)) / n_words, 6)
    hash_cnt = n_chars - F.length(F.replace(F.col("text"), F.lit("#"), F.lit("")))
    ell_cnt = (
        n_chars - F.length(F.replace(F.col("text"), F.lit("..."), F.lit("")))
    ) / 3
    sym_ratio = F.round((hash_cnt + ell_cnt) / n_words, 6)
    alpha = F.size(F.filter(toks, lambda w: w.rlike("[a-zA-Z]"))).cast("long")
    alpha_frac = F.round(alpha / n_words, 6)
    n_stop = F.size(F.filter(toks, _in_set_fn(LANG_STOPWORDS["en"]))).cast("long")
    ok_words = (n_words >= GOPHER_MIN_WORDS) & (n_words <= GOPHER_MAX_WORDS)
    ok_wl = (mwl >= GOPHER_MIN_MEAN_WORD_LEN) & (mwl <= GOPHER_MAX_MEAN_WORD_LEN)
    ok_sym = sym_ratio <= GOPHER_MAX_SYMBOL_RATIO
    ok_alpha = alpha_frac >= GOPHER_MIN_ALPHA_FRAC
    ok_stop = n_stop >= GOPHER_MIN_STOPWORDS
    return docs.select(
        "doc_id",
        n_words.alias("n_words"),
        mwl.alias("mean_word_len"),
        sym_ratio.alias("symbol_ratio"),
        alpha_frac.alias("alpha_frac"),
        n_stop.alias("n_stopwords"),
        ok_words.alias("ok_words"),
        ok_wl.alias("ok_word_len"),
        ok_sym.alias("ok_symbols"),
        ok_alpha.alias("ok_alpha"),
        ok_stop.alias("ok_stopwords"),
        (ok_words & ok_wl & ok_sym & ok_alpha & ok_stop).alias("keep"),
    )


def gopher_rule_flags_sql(table: str = "documents") -> str:
    n_words = "len(string_split(text, ' '))"
    mwl = f"ROUND((length(text) - ({n_words} - 1)) / CAST({n_words} AS DOUBLE), 6)"
    hash_cnt = "(length(text) - length(replace(text, '#', '')))"
    ell_cnt = "((length(text) - length(replace(text, '...', ''))) / 3.0)"
    sym = f"ROUND(({hash_cnt} + {ell_cnt}) / CAST({n_words} AS DOUBLE), 6)"
    alpha = (
        "len(list_filter(string_split(text, ' '),"
        " w -> regexp_matches(w, '[a-zA-Z]')))"
    )
    alpha_frac = f"ROUND({alpha} / CAST({n_words} AS DOUBLE), 6)"
    n_stop = _stopword_count_sql(LANG_STOPWORDS["en"])
    return f"""
    SELECT doc_id,
           {n_words}::BIGINT AS n_words,
           {mwl} AS mean_word_len,
           {sym} AS symbol_ratio,
           {alpha_frac} AS alpha_frac,
           {n_stop}::BIGINT AS n_stopwords,
           ({n_words} >= {GOPHER_MIN_WORDS} AND {n_words} <= {GOPHER_MAX_WORDS}) AS ok_words,
           ({mwl} >= {GOPHER_MIN_MEAN_WORD_LEN} AND {mwl} <= {GOPHER_MAX_MEAN_WORD_LEN}) AS ok_word_len,
           ({sym} <= {GOPHER_MAX_SYMBOL_RATIO}) AS ok_symbols,
           ({alpha_frac} >= {GOPHER_MIN_ALPHA_FRAC}) AS ok_alpha,
           ({n_stop} >= {GOPHER_MIN_STOPWORDS}) AS ok_stopwords,
           (({n_words} >= {GOPHER_MIN_WORDS} AND {n_words} <= {GOPHER_MAX_WORDS})
            AND ({mwl} >= {GOPHER_MIN_MEAN_WORD_LEN} AND {mwl} <= {GOPHER_MAX_MEAN_WORD_LEN})
            AND ({sym} <= {GOPHER_MAX_SYMBOL_RATIO})
            AND ({alpha_frac} >= {GOPHER_MIN_ALPHA_FRAC})
            AND ({n_stop} >= {GOPHER_MIN_STOPWORDS})) AS keep
    FROM {table}
    """
