"""Driver-contract query implementations + DuckDB oracle SQL.

Each query has (a) a Spark implementation built on the alphalens_spark
library and (b) an equivalent ANSI-SQL string for the DuckDB oracle, both
over the derived panel of :mod:`alphalens_spark.datasets`.

Float-parity policy (SURVEY §7 "hard parts"): every double output column is
rounded to 6 dp on BOTH sides, Spark NaN is normalized to NULL (DuckDB
aggregates return NULL where Spark may emit NaN, e.g. stddev_samp of one
row), and oracle-checked queries avoid exp/pow on large magnitudes —
cumulative returns are reported in log space, alpha/beta un-annualized —
so sub-ulp engine differences cannot survive the rounding.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from alphalens_spark import datasets, performance as perf
from alphalens_spark.datasets import ORACLE_PANEL_SQL

PERIOD_COLS = ["1D", "5D"]
ALIAS = {"1D": "1p", "5D": "5p"}
ROUND_DP = 6


def _finalize(df: DataFrame, dp: int = ROUND_DP) -> DataFrame:
    """NaN→NULL, round every double column, normalize -0.0 → +0.0.

    (-0.0 and 0.0 hash/sort differently in string form; adding +0.0 after
    the round forces the IEEE positive zero on both engines.)
    """
    cols = []
    for f in df.schema.fields:
        if isinstance(f.dataType, T.DoubleType):
            c = F.col(f.name)
            c = F.when(F.isnan(c), F.lit(None)).otherwise(c)
            cols.append((F.round(c, dp) + F.lit(0.0)).alias(f.name))
        else:
            cols.append(F.col(f.name))
    return df.select(*cols)


def _fd(spark: SparkSession, sf_dir: str) -> DataFrame:
    return datasets.factor_data(spark, sf_dir)


# --------------------------------------------------------------------------
# Spark-side queries
# --------------------------------------------------------------------------

def q_forward_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    fd = _fd(spark, sf_dir)
    return _finalize(
        fd.select(
            "date",
            "asset",
            F.col("factor"),
            F.col("1D").alias("fwd_1p"),
            F.col("5D").alias("fwd_5p"),
        )
    )


def q_quantize_factor(spark: SparkSession, sf_dir: str) -> DataFrame:
    fd = _fd(spark, sf_dir)
    return fd.select("date", "asset", "factor_quantile")


def q_quantile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-quantile factor stats table (ref plotting.py:182-189)."""
    from pyspark.sql import Window

    fd = _fd(spark, sf_dir)
    out = fd.groupBy("factor_quantile").agg(
        F.min("factor").alias("min_factor"),
        F.max("factor").alias("max_factor"),
        F.avg("factor").alias("mean_factor"),
        F.stddev_samp("factor").alias("std_factor"),
        F.count("factor").alias("count_factor"),
    )
    total = Window.partitionBy()
    out = out.withColumn(
        "count_pct", F.col("count_factor") / F.sum("count_factor").over(total) * 100.0
    )
    return _finalize(out)


def q_mean_return_by_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    fd = _fd(spark, sf_dir)
    out = perf.mean_return_by_quantile(fd, PERIOD_COLS, demeaned=True)
    sel = [F.col("factor_quantile")]
    for c in PERIOD_COLS:
        a = ALIAS[c]
        sel += [
            F.col(f"mean_{c}").alias(f"mean_{a}"),
            F.col(f"std_{c}").alias(f"std_{a}"),
            F.col(f"count_{c}").alias(f"count_{a}"),
            F.col(f"stderr_{c}").alias(f"stderr_{a}"),
        ]
    return _finalize(out.select(*sel))


def q_factor_ic(spark: SparkSession, sf_dir: str) -> DataFrame:
    fd = _fd(spark, sf_dir)
    ic = perf.factor_information_coefficient(fd, PERIOD_COLS)
    return _finalize(
        ic.select(
            "date",
            *[F.col(f"ic_{c}").alias(f"ic_{ALIAS[c]}") for c in PERIOD_COLS],
        )
    )


def q_mean_ic_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    fd = _fd(spark, sf_dir)
    ic = perf.mean_information_coefficient(fd, PERIOD_COLS, by_time="month")
    return _finalize(
        ic.select(
            F.col("time_bucket").alias("month"),
            *[F.col(f"ic_{c}").alias(f"ic_{ALIAS[c]}") for c in PERIOD_COLS],
        )
    )


def q_ic_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    fd = _fd(spark, sf_dir)
    ic = perf.factor_information_coefficient(fd, PERIOD_COLS)
    out = perf.ic_summary(ic, PERIOD_COLS)
    sel = []
    for c in PERIOD_COLS:
        a = ALIAS[c]
        for stat in ("mean", "std", "ir", "tstat", "skew", "kurtosis", "n"):
            sel.append(F.col(f"{stat}_{c}").alias(f"{stat}_{a}"))
    return _finalize(out.select(*sel))


def q_factor_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    fd = _fd(spark, sf_dir)
    out = perf.factor_returns(fd, PERIOD_COLS, demeaned=True)
    return _finalize(
        out.select(
            "date",
            *[F.col(f"ret_{c}").alias(f"ret_{ALIAS[c]}") for c in PERIOD_COLS],
        )
    )


def q_factor_alpha_beta(spark: SparkSession, sf_dir: str) -> DataFrame:
    fd = _fd(spark, sf_dir)
    out = perf.factor_alpha_beta(fd, PERIOD_COLS, annualize=False)
    sel = []
    for c in PERIOD_COLS:
        a = ALIAS[c]
        sel += [
            F.col(f"alpha_{c}").alias(f"alpha_{a}"),
            F.col(f"beta_{c}").alias(f"beta_{a}"),
        ]
    return _finalize(out.select(*sel))


def q_mean_return_spread(spark: SparkSession, sf_dir: str) -> DataFrame:
    fd = _fd(spark, sf_dir)
    by_date = perf.mean_return_by_quantile(fd, PERIOD_COLS, by_date=True, demeaned=True)
    out = perf.compute_mean_returns_spread(by_date, 5, 1, PERIOD_COLS)
    return _finalize(
        out.select(
            "date",
            F.col("spread_1D").alias("spread_1p"),
            F.col("spread_stderr_1D").alias("spread_stderr_1p"),
        )
    )


def q_quantile_turnover(spark: SparkSession, sf_dir: str) -> DataFrame:
    fd = _fd(spark, sf_dir)
    out = perf.quantile_turnover(fd, periods=(1, 5))
    return _finalize(out.select("factor_quantile", "period", "date", "turnover"))


def q_rank_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    fd = _fd(spark, sf_dir)
    out = perf.factor_rank_autocorrelation(fd, period=1)
    return _finalize(out.select("date", "autocorr"))


def q_cumulative_benchmark_log_return(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-space cumulative return of the equal-weight universe benchmark.

    Benchmark = per-date universe mean 1-period forward return (ref
    performance.py:1148-1163 uses the same equal-weight universe). Reported
    as sum(log1p(r)) so the oracle hash compares bounded magnitudes.
    """
    from pyspark.sql import Window

    fd = _fd(spark, sf_dir)
    bench = fd.groupBy("date").agg(F.avg("1D").alias("bench_ret"))
    w = Window.orderBy("date").rowsBetween(Window.unboundedPreceding, 0)
    out = bench.select(
        "date", F.sum(F.log1p("bench_ret")).over(w).alias("cum_log_ret_1p")
    )
    return _finalize(out)


# ---- scale extensions (documents / embeddings) ----------------------------

def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from alphalens_spark.scale.dedup import exact_duplicates

    docs = datasets.load_table(spark, sf_dir, "documents")
    return exact_duplicates(docs)


def q_doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from alphalens_spark.scale.text import token_stats

    docs = datasets.load_table(spark, sf_dir, "documents")
    return _finalize(token_stats(docs))


def q_lang_stopword_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from alphalens_spark.scale.text import stopword_language_id

    docs = datasets.load_table(spark, sf_dir, "documents")
    return _finalize(stopword_language_id(docs))


def q_embedding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from alphalens_spark.scale.similarity import brute_force_topk

    emb = datasets.load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") % 20 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    return _finalize(brute_force_topk(emb, queries, k=5))


# --------------------------------------------------------------------------
# DuckDB oracle SQL
# --------------------------------------------------------------------------

_P = f"WITH {ORACLE_PANEL_SQL}"

# per-date demeaned returns + per-(quantile,date) level-1 means, reused by
# several oracles
_DM = """
dm AS (
  SELECT factor_quantile, date,
         fwd_1p - avg(fwd_1p) OVER (PARTITION BY date) AS d1,
         fwd_5p - avg(fwd_5p) OVER (PARTITION BY date) AS d5
  FROM fd
),
l1 AS (
  SELECT factor_quantile, date,
         avg(d1) AS m1, avg(d5) AS m5,
         stddev_samp(d1) AS s1, stddev_samp(d5) AS s5,
         count(*) AS n
  FROM dm GROUP BY 1, 2
)"""

_RANKS = """
rk AS (
  SELECT date,
         rank() OVER (PARTITION BY date ORDER BY factor)
           + (count(*) OVER (PARTITION BY date, factor) - 1) / 2.0 AS rf,
         rank() OVER (PARTITION BY date ORDER BY fwd_1p)
           + (count(*) OVER (PARTITION BY date, fwd_1p) - 1) / 2.0 AS r1,
         rank() OVER (PARTITION BY date ORDER BY fwd_5p)
           + (count(*) OVER (PARTITION BY date, fwd_5p) - 1) / 2.0 AS r5
  FROM fd
),
ic AS (
  SELECT date, corr(rf, r1) AS ic_1p, corr(rf, r5) AS ic_5p
  FROM rk GROUP BY date
)"""

ORACLES: dict[str, str] = {
    "forward_returns": f"""{_P}
SELECT date, asset, round(factor, 6) AS factor,
       round(fwd_1p, 6) AS fwd_1p, round(fwd_5p, 6) AS fwd_5p
FROM fd""",
    "quantize_factor": f"""{_P}
SELECT date, asset, factor_quantile FROM fd""",
    "quantile_stats": f"""{_P}
SELECT factor_quantile,
       round(min(factor), 6) AS min_factor,
       round(max(factor), 6) AS max_factor,
       round(avg(factor), 6) AS mean_factor,
       round(stddev_samp(factor), 6) AS std_factor,
       count(factor) AS count_factor,
       round(count(factor) * 100.0 / (SELECT count(*) FROM fd), 6) AS count_pct
FROM fd GROUP BY 1""",
    "mean_return_by_quantile": f"""{_P}, {_DM}
SELECT factor_quantile,
       round(avg(m1), 6) AS mean_1p, round(stddev_samp(m1), 6) AS std_1p,
       count(m1) AS count_1p,
       round(stddev_samp(m1) / sqrt(count(m1)), 6) AS stderr_1p,
       round(avg(m5), 6) AS mean_5p, round(stddev_samp(m5), 6) AS std_5p,
       count(m5) AS count_5p,
       round(stddev_samp(m5) / sqrt(count(m5)), 6) AS stderr_5p
FROM l1 GROUP BY 1""",
    "factor_ic": f"""{_P}, {_RANKS}
SELECT date, round(ic_1p, 6) AS ic_1p, round(ic_5p, 6) AS ic_5p FROM ic""",
    "mean_ic_monthly": f"""{_P}, {_RANKS}
SELECT CAST(date_trunc('month', date) AS TIMESTAMP) AS month,
       round(avg(ic_1p), 6) AS ic_1p, round(avg(ic_5p), 6) AS ic_5p
FROM ic GROUP BY 1""",
    "ic_summary": f"""{_P}, {_RANKS}
SELECT
  round(avg(ic_1p), 6) AS mean_1p,
  round(stddev_samp(ic_1p), 6) AS std_1p,
  round(avg(ic_1p) / stddev_samp(ic_1p), 6) AS ir_1p,
  round(avg(ic_1p) / (stddev_samp(ic_1p) / sqrt(count(ic_1p))), 6) AS tstat_1p,
  round(avg(pow(ic_1p - (SELECT avg(ic_1p) FROM ic), 3))
        / pow(stddev_pop(ic_1p), 3), 6) AS skew_1p,
  round(avg(pow(ic_1p - (SELECT avg(ic_1p) FROM ic), 4))
        / pow(var_pop(ic_1p), 2) - 3.0, 6) AS kurtosis_1p,
  count(ic_1p) AS n_1p,
  round(avg(ic_5p), 6) AS mean_5p,
  round(stddev_samp(ic_5p), 6) AS std_5p,
  round(avg(ic_5p) / stddev_samp(ic_5p), 6) AS ir_5p,
  round(avg(ic_5p) / (stddev_samp(ic_5p) / sqrt(count(ic_5p))), 6) AS tstat_5p,
  round(avg(pow(ic_5p - (SELECT avg(ic_5p) FROM ic), 3))
        / pow(stddev_pop(ic_5p), 3), 6) AS skew_5p,
  round(avg(pow(ic_5p - (SELECT avg(ic_5p) FROM ic), 4))
        / pow(var_pop(ic_5p), 2) - 3.0, 6) AS kurtosis_5p,
  count(ic_5p) AS n_5p
FROM ic""",
    "factor_returns": f"""{_P},
w AS (
  SELECT date, fwd_1p, fwd_5p,
         factor - avg(factor) OVER (PARTITION BY date) AS fdm
  FROM fd
),
w2 AS (
  SELECT date, fwd_1p, fwd_5p,
         fdm / NULLIF(sum(abs(fdm)) OVER (PARTITION BY date), 0) AS wt
  FROM w
)
SELECT date, round(sum(wt * fwd_1p), 6) AS ret_1p,
       round(sum(wt * fwd_5p), 6) AS ret_5p
FROM w2 GROUP BY date""",
    "factor_alpha_beta": f"""{_P},
w AS (
  SELECT date, fwd_1p, fwd_5p,
         factor - avg(factor) OVER (PARTITION BY date) AS fdm
  FROM fd
),
w2 AS (
  SELECT date, fwd_1p, fwd_5p,
         fdm / NULLIF(sum(abs(fdm)) OVER (PARTITION BY date), 0) AS wt
  FROM w
),
fr AS (
  SELECT date, sum(wt * fwd_1p) AS y1, sum(wt * fwd_5p) AS y5,
         avg(fwd_1p) AS x1, avg(fwd_5p) AS x5
  FROM w2 GROUP BY date
)
SELECT
  round(avg(y1) - covar_samp(x1, y1) / var_samp(x1) * avg(x1), 6) AS alpha_1p,
  round(covar_samp(x1, y1) / var_samp(x1), 6) AS beta_1p,
  round(avg(y5) - covar_samp(x5, y5) / var_samp(x5) * avg(x5), 6) AS alpha_5p,
  round(covar_samp(x5, y5) / var_samp(x5), 6) AS beta_5p
FROM fr""",
    "mean_return_spread": f"""{_P}, {_DM}
SELECT u.date,
       round(u.m1 - l.m1, 6) AS spread_1p,
       round(sqrt(pow(u.s1 / sqrt(u.n), 2) + pow(l.s1 / sqrt(l.n), 2)), 6)
         AS spread_stderr_1p
FROM l1 u JOIN l1 l ON u.date = l.date
WHERE u.factor_quantile = 5 AND l.factor_quantile = 1""",
    "quantile_turnover": f"""{_P},
didx AS (
  SELECT date, CAST(row_number() OVER (ORDER BY date) AS INT) AS di
  FROM (SELECT DISTINCT date FROM fd) t
),
mem AS (
  SELECT f.factor_quantile AS q, f.asset AS a, d.di, f.date
  FROM fd f JOIN didx d ON f.date = d.date
),
t AS (
  SELECT c.q, 1 AS period, c.date,
         sum(CASE WHEN p.a IS NULL THEN 1 ELSE 0 END) * 1.0 / count(*) AS turnover
  FROM mem c LEFT JOIN mem p ON p.q = c.q AND p.a = c.a AND p.di = c.di - 1
  WHERE c.di > 1 GROUP BY c.q, c.date
  UNION ALL
  SELECT c.q, 5 AS period, c.date,
         sum(CASE WHEN p.a IS NULL THEN 1 ELSE 0 END) * 1.0 / count(*) AS turnover
  FROM mem c LEFT JOIN mem p ON p.q = c.q AND p.a = c.a AND p.di = c.di - 5
  WHERE c.di > 5 GROUP BY c.q, c.date
)
SELECT q AS factor_quantile, period, date, round(turnover, 6) AS turnover FROM t""",
    "rank_autocorr": f"""{_P},
rkd AS (
  SELECT date, asset,
         rank() OVER (PARTITION BY date ORDER BY factor)
           + (count(*) OVER (PARTITION BY date, factor) - 1) / 2.0 AS rnk
  FROM fd
),
didx AS (
  SELECT date, CAST(row_number() OVER (ORDER BY date) AS INT) AS di
  FROM (SELECT DISTINCT date FROM fd) t
),
rkx AS (
  SELECT r.asset, r.rnk, d.di, r.date FROM rkd r JOIN didx d ON r.date = d.date
)
SELECT c.date, round(corr(c.rnk, p.rnk), 6) AS autocorr
FROM rkx c JOIN rkx p ON p.asset = c.asset AND p.di = c.di - 1
GROUP BY c.date""",
    "cumulative_benchmark_log_return": f"""{_P},
bench AS (SELECT date, avg(fwd_1p) AS bench_ret FROM fd GROUP BY date)
SELECT date,
       round(sum(ln(1 + bench_ret)) OVER (ORDER BY date
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)
         AS cum_log_ret_1p
FROM bench""",
    "dedup_exact": """
SELECT md5(text) AS text_hash, min(doc_id) AS keep_id, count(*) AS n_dups
FROM documents GROUP BY 1""",
    "doc_token_stats": r"""
SELECT doc_id,
       length(text) AS n_chars_measured,
       len(string_split_regex(trim(text), '\s+')) AS n_tokens,
       len(list_distinct(string_split_regex(lower(trim(text)), '\s+')))
         AS n_distinct_tokens
FROM documents""",
    "lang_stopword_id": r"""
WITH tok AS (
  SELECT doc_id, lang,
         string_split_regex(lower(trim(text)), '\s+') AS tokens
  FROM documents
),
st AS (
  SELECT doc_id, lang,
         len(tokens) AS n_tokens,
         len(list_filter(tokens,
             t -> list_contains(['the','a','and','of','to','in','is'], t)))
           AS n_stopwords
  FROM tok
)
SELECT doc_id, lang, n_tokens, n_stopwords,
       round(n_stopwords * 1.0 / NULLIF(n_tokens, 0), 6) AS stopword_ratio,
       CASE WHEN n_stopwords * 1.0 / NULLIF(n_tokens, 0) > 0.10
            THEN 'en' ELSE 'other' END AS lang_guess
FROM st""",
    "embedding_topk": """
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qv FROM embeddings
  WHERE vec_id % 20 = 0
),
p AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         list_sum(list_transform(range(1, len(q.qv) + 1),
             i -> CAST(q.qv[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))
         / (sqrt(list_sum(list_transform(q.qv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
            * sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
           AS cs
  FROM q, embeddings e WHERE e.vec_id <> q.query_id
),
r AS (
  SELECT query_id, neighbor_id, cs,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY round(cs, 6) DESC, neighbor_id) AS rnk
  FROM p
)
SELECT query_id, neighbor_id, CAST(rnk AS INT) AS rnk, round(cs, 6) AS cos_sim
FROM r WHERE rnk <= 5""",
}

# -0.0 → +0.0 on the oracle side as well: every round(...) result gets
# +0.0 added (round() only ever appears over double expressions here).
ORACLES = {k: v.replace("round(", "0.0 + round(") for k, v in ORACLES.items()}

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "forward_returns": q_forward_returns,
    "quantize_factor": q_quantize_factor,
    "quantile_stats": q_quantile_stats,
    "mean_return_by_quantile": q_mean_return_by_quantile,
    "factor_ic": q_factor_ic,
    "mean_ic_monthly": q_mean_ic_monthly,
    "ic_summary": q_ic_summary,
    "factor_returns": q_factor_returns,
    "factor_alpha_beta": q_factor_alpha_beta,
    "mean_return_spread": q_mean_return_spread,
    "quantile_turnover": q_quantile_turnover,
    "rank_autocorr": q_rank_autocorr,
    "cumulative_benchmark_log_return": q_cumulative_benchmark_log_return,
    "dedup_exact": q_dedup_exact,
    "doc_token_stats": q_doc_token_stats,
    "lang_stopword_id": q_lang_stopword_id,
    "embedding_topk": q_embedding_topk,
}
