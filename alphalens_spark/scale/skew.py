"""Skew mitigation: salted joins and two-stage aggregation.

This workload is skew-light by construction (per-date groups are
uniform, SURVEY §4.6), but the scale extensions are not: document dedup
joins on n-gram/band keys and event joins on user/type keys follow
power-law frequencies, where one hot key serializes a whole join onto
one task.

Defense layers, in order:
1. AQE skew-join splitting (`spark.sql.adaptive.skewJoin.*`, on by
   default) — handles sort-merge-join skew at runtime; prefer it.
2. Manual salting (here) — for the cases AQE cannot rewrite: skewed
   *aggregations* with non-trivial state, and broadcast-ineligible
   skewed joins on a known-hot key set.

Aggregation note: Spark's hash aggregate already does map-side partial
aggregation, which absorbs key skew for algebraic aggregates (sum/count/
min/max/avg) — salting those buys nothing. Salting pays when the partial
state itself is heavy (collect_list/set, exact percentile buffers).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n: int, cols: Sequence[str] | None = None) -> DataFrame:
    """Deterministic salt in [0, n) from a row-content hash.

    Content-hashed (not rand()) so repeated runs and retried tasks
    produce the same assignment — required for restartable pipelines.
    """
    basis = [F.col(c) for c in (cols or df.columns)]
    return df.withColumn("_salt", F.pmod(F.xxhash64(*basis), F.lit(n)).cast("int"))


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join a skew-keyed big side against a small (but not
    broadcast-small) side by sharding each hot key across ``n_salts``
    tasks.

    Big side: content-hashed salt splits every key's rows ~uniformly.
    Small side: replicated n_salts× via explode, so every (key, salt)
    shard finds its match. Shuffle volume grows |small|·n_salts — the
    price of turning one straggler task into n_salts even ones. Result
    is row-identical to the plain join (salt never changes match
    semantics; it only refines the partition key).
    """
    on = list(on)
    b = with_salt(big, n_salts, cols=[c for c in big.columns if c not in on])
    s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("_salt", F.col("_salt").cast("int"))
    return b.join(s, [*on, "_salt"], how).drop("_salt")


def salted_collect_set(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage collect_set for skewed keys with heavy state.

    Stage 1 groups on (keys, salt) — each hot key's set is built by
    n_salts tasks in parallel; stage 2 merges the per-salt sets with
    flatten + array_distinct. Output: (*keys, values array).
    """
    keys = list(keys)
    staged = (
        with_salt(df, n_salts, cols=[value_col])
        .groupBy(*keys, "_salt")
        .agg(F.collect_set(value_col).alias("_partial"))
    )
    return (
        staged.groupBy(*keys)
        .agg(
            F.array_distinct(F.flatten(F.collect_list("_partial"))).alias(
                f"{value_col}_set"
            )
        )
    )


def skew_report(
    df: DataFrame, key_cols: Sequence[str], top_n: int = 5
) -> DataFrame:
    """Join/agg-key skew diagnostic — run it BEFORE picking a strategy:
    per key-tuple frequencies reduced to the numbers that decide between
    a plain shuffle, AQE skew split, and manual salting. ``skew_factor``
    = hottest key's row count / mean rows per key (1 ≈ uniform; a
    power-law key shows 100+); the ``top_n`` hottest keys come back
    as rows so the hot set can feed :func:`with_salt` directly.

    One groupBy on the key (map-side partial counts absorb the skew this
    report measures) + a TakeOrderedAndProject top-k — no global window,
    no collect. Output: (rank, key string, key_count, n_keys, n_rows,
    mean_per_key, skew_factor).
    """
    counts = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("key_count"))
    stats = counts.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("key_count").alias("n_rows"),
    )
    top = (
        counts.orderBy(F.col("key_count").desc(), *key_cols)
        .limit(top_n)
        .crossJoin(F.broadcast(stats))
    )
    mean = F.col("n_rows").cast("double") / F.col("n_keys")
    w = Window.orderBy(F.col("key_count").desc(), *key_cols)
    return (
        top.withColumn("rank", F.row_number().over(w).cast("int"))
        .select(
            "rank",
            F.concat_ws("|", *[F.col(c).cast("string") for c in key_cols]).alias(
                "key"
            ),
            "key_count",
            "n_keys",
            "n_rows",
            (F.lit(0.0) + F.round(mean, 6)).alias("mean_per_key"),
            (F.lit(0.0) + F.round(F.col("key_count") / mean, 6)).alias(
                "skew_factor"
            ),
        )
    )
