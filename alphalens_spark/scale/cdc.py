"""Change-data-capture primitives: snapshot diff and changelog merge.

A 100 TB training corpus is not rebuilt from scratch per run — it is
maintained: yesterday's snapshot plus a changes feed. Two operators
cover that lifecycle:

- :func:`snapshot_diff` — given two snapshots of the same keyed table,
  classify every key as added / deleted / changed / unchanged and name
  the columns that moved. This is the audit step before promoting a new
  snapshot (and the input to incremental downstream recompute).
- :func:`apply_cdc` — given a base snapshot and an (op, seq) changelog
  (I/U upserts, D deletes), produce the new snapshot: latest change per
  key wins, deletes drop the key.

Scale posture: each operator is ONE key-shuffle. ``snapshot_diff`` is a
single full-outer sort-merge join on the key; column comparison is a
null-safe equality projection (no hashing round-trip, no UDF).
``apply_cdc`` reduces the changelog with one window over the key (latest
seq wins) and joins it to the base on the same key — AQE coalesces both
sides onto the same partitioning, so the join reuses the window's
shuffle. No collect, no broadcast of anything data-sized.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str] | None = None,
    include_unchanged: bool = False,
) -> DataFrame:
    """Classify every key across two snapshots of the same table.

    Output: (*keys, status, changed_cols, n_changed) where status ∈
    {'added', 'deleted', 'changed', 'unchanged'} and changed_cols is a
    comma-joined sorted list of compared columns whose values differ
    (null-safe: NULL→value and value→NULL both count as a change).

    One full-outer join on ``keys``; comparisons are projections on the
    joined row, so the whole diff is a single shuffle regardless of the
    number of compared columns.
    """
    keys = list(keys)
    if compare_cols is None:
        compare_cols = [c for c in old.columns if c not in keys and c in new.columns]
    compare_cols = list(compare_cols)

    # Presence flags must not depend on payload nullability: tag each side
    # with a constant before the join and read the tag after.
    o = old.select(
        *keys, F.lit(1).alias("_o_present"),
        *[F.col(c).alias(f"_o_{c}") for c in compare_cols],
    )
    n = new.select(
        *keys, F.lit(1).alias("_n_present"),
        *[F.col(c).alias(f"_n_{c}") for c in compare_cols],
    )
    j = o.join(n, on=keys, how="full_outer")
    in_old = F.col("_o_present").isNotNull()
    in_new = F.col("_n_present").isNotNull()

    diffs = F.array_compact(
        F.array(
            *[
                F.when(
                    ~F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}")), F.lit(c)
                )
                for c in sorted(compare_cols)
            ]
        )
    ) if compare_cols else F.array()

    status = (
        F.when(in_old & ~in_new, F.lit("deleted"))
        .when(~in_old & in_new, F.lit("added"))
        .when(F.size(diffs) > 0, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    out = j.select(
        *keys,
        status.alias("status"),
        F.when(
            status == "changed", F.array_join(diffs, ",")
        ).otherwise(F.lit("")).alias("changed_cols"),
        F.when(status == "changed", F.size(diffs))
        .otherwise(F.lit(0)).cast("int").alias("n_changed"),
    )
    if not include_unchanged:
        out = out.filter(F.col("status") != "unchanged")
    return out


def latest_changes(
    changes: DataFrame,
    keys: Sequence[str],
    seq_col: str,
) -> DataFrame:
    """Reduce a changelog to its latest row per key (highest ``seq_col``
    wins; ties broken by the full row ordering to stay deterministic).

    One window shuffle on ``keys``.
    """
    keys = list(keys)
    order = [F.col(seq_col).desc()] + [
        F.col(c).desc() for c in changes.columns if c not in (*keys, seq_col)
    ]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        changes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def apply_cdc(
    base: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    op_col: str = "op",
    seq_col: str = "seq",
) -> DataFrame:
    """Merge an (op, seq) changelog into a base snapshot.

    ``changes`` carries the full payload schema of ``base`` plus
    ``op_col`` ('I'/'U' upsert, 'D' delete) and ``seq_col`` (monotone
    change order). Per key, the highest-seq change wins; a winning
    delete removes the key; a winning upsert replaces (or inserts) the
    payload. Keys without changes pass through untouched.

    Plan: one window shuffle reduces the changelog, then one left join
    of base against the reduced changelog on the same key — both
    key-partitioned, so AQE lines them up without an extra exchange.
    Untouched base rows never rewrite their payload columns.
    """
    keys = list(keys)
    payload = [c for c in base.columns if c not in keys]
    latest = latest_changes(changes, keys, seq_col).select(
        *keys,
        F.col(op_col).alias("_op"),
        *[F.col(c).alias(f"_c_{c}") for c in payload],
    )

    merged = base.join(latest, on=keys, how="full_outer")
    surviving = merged.filter(
        (F.col("_op").isNull())  # untouched base row
        | (F.col("_op") != "D")  # upsert (updates base or inserts new key)
    )
    return surviving.select(
        *keys,
        *[
            F.when(F.col("_op").isNotNull(), F.col(f"_c_{c}"))
            .otherwise(F.col(c))
            .alias(c)
            for c in payload
        ],
    )
