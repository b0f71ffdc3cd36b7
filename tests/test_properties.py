"""Property-based invariants (hypothesis) over random panels.

The reference test suite has no property tests (SURVEY §5); these guard
the invariants the golden cases can't sweep: quantile-label monotonicity
in factor, turnover bounds, IC bounds, weight normalization — across
randomized universes with ties, NaNs and varying membership.
"""

import datetime as dt
import math

from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

from alphalens_spark import performance as perf
from alphalens_spark.utils import quantize_factor

D = lambda i: dt.datetime(2020, 1, 1) + dt.timedelta(days=i)

panel_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),              # date index
        st.integers(min_value=0, max_value=9),              # asset id
        st.floats(min_value=-100, max_value=100, allow_nan=False),
        st.floats(min_value=-0.9, max_value=2.0, allow_nan=False),
    ),
    min_size=6,
    max_size=40,
    unique_by=lambda t: (t[0], t[1]),
)


def _fd_from(spark, rows):
    data = [(D(d), f"A{a}", float(r), float(f), 0) for d, a, f, r in rows]
    df = spark.createDataFrame(
        data, "date timestamp, asset string, `1D` double, factor double, factor_quantile int"
    )
    return df.drop("factor_quantile")


@settings(max_examples=12, deadline=None)
@given(panel_strategy)
def test_quantile_labels_monotone_and_bounded(spark, rows):
    fd = _fd_from(spark, rows)
    # no_raise: random panels contain heavy ties whose qcut edges collapse;
    # the reference NaN-drops those cross-sections (we assert that shape)
    out = quantize_factor(fd, quantiles=3, no_raise=True).collect()
    by_date = {}
    for r in out:
        by_date.setdefault(r["date"], []).append((r["factor"], r["factor_quantile"]))
    for vals in by_date.values():
        labels_set = {q for _, q in vals}
        if labels_set == {None}:
            continue  # collapsed-edge partition: wholly dropped, like pd.qcut
        for f, q in vals:
            assert q is not None and 1 <= q <= 3
        # monotone: higher factor never gets a lower label
        vals.sort()
        labels = [q for _, q in vals]
        assert labels == sorted(labels)


@settings(max_examples=12, deadline=None)
@given(panel_strategy)
def test_ntile_labels_partition_evenly(spark, rows):
    fd = _fd_from(spark, rows)
    out = quantize_factor(fd, quantiles=4, method="ntile").collect()
    by_date = {}
    for r in out:
        by_date.setdefault(r["date"], []).append(r["factor_quantile"])
    for labels in by_date.values():
        counts = [labels.count(q) for q in sorted(set(labels))]
        assert max(counts) - min(counts) <= 1  # ntile balance property


@settings(max_examples=10, deadline=None)
@given(panel_strategy)
def test_weights_normalized_per_date(spark, rows):
    fd = _fd_from(spark, rows)
    out = perf.factor_weights(fd).collect()
    by_date = {}
    for r in out:
        if r["weights"] is not None:
            by_date.setdefault(r["date"], []).append(r["weights"])
    for ws in by_date.values():
        gross = sum(abs(w) for w in ws)
        net = sum(ws)
        assert math.isclose(gross, 1.0, rel_tol=1e-9) or gross == 0.0
        if gross > 0:
            assert abs(net) < 1e-9  # demeaned → dollar neutral


@settings(max_examples=10, deadline=None)
@given(panel_strategy)
def test_ic_bounded(spark, rows):
    fd = _fd_from(spark, rows)
    ic = perf.factor_information_coefficient(fd, ["1D"]).collect()
    for r in ic:
        v = r["ic_1D"]
        if v is not None and not math.isnan(v):
            assert -1.0 - 1e-9 <= v <= 1.0 + 1e-9


@settings(max_examples=8, deadline=None)
@given(panel_strategy)
def test_turnover_bounded(spark, rows):
    fd = _fd_from(spark, rows)
    fd = quantize_factor(fd, quantiles=2, method="ntile")
    out = perf.quantile_turnover(fd, periods=(1,)).collect()
    for r in out:
        assert 0.0 <= r["turnover"] <= 1.0


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.floats(min_value=-1000, max_value=1000, allow_nan=False),
        min_size=8, max_size=40, unique=True,
    ),
    st.integers(min_value=2, max_value=6),
)
def test_edges_quantize_matches_pandas_qcut(spark, values, q):
    """method='edges' reproduces pd.qcut labels exactly (tie-free input)."""
    import pandas as pd

    fd = spark.createDataFrame(
        [(D(0), f"A{i}", float(v)) for i, v in enumerate(values)],
        "date timestamp, asset string, factor double",
    )
    got = {r["asset"]: r["factor_quantile"]
           for r in quantize_factor(fd, quantiles=q).collect()}
    expected = pd.qcut(pd.Series(values), q, labels=False) + 1
    for i, v in enumerate(values):
        assert got[f"A{i}"] == expected[i], (v, q)


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.floats(min_value=-1000, max_value=1000, allow_nan=False),
        min_size=8, max_size=40, unique=True,
    ),
    st.integers(min_value=2, max_value=6),
)
def test_bins_quantize_matches_pandas_cut(spark, values, b):
    """bins=int reproduces pd.cut labels (equal-width, right-closed)."""
    import pandas as pd

    fd = spark.createDataFrame(
        [(D(0), f"A{i}", float(v)) for i, v in enumerate(values)],
        "date timestamp, asset string, factor double",
    )
    got = {r["asset"]: r["factor_quantile"]
           for r in quantize_factor(fd, quantiles=None, bins=b).collect()}
    expected = pd.cut(pd.Series(values), b, labels=False) + 1
    for i, v in enumerate(values):
        assert got[f"A{i}"] == expected[i], (v, b)


asof_strategy = st.tuples(
    st.lists(  # left: (key, t)
        st.tuples(st.integers(0, 3), st.integers(0, 50)),
        min_size=1, max_size=25,
    ),
    st.lists(  # right: (key, t) — deduped to unique (key, t) below
        st.tuples(st.integers(0, 3), st.integers(0, 50)),
        min_size=0, max_size=25, unique=True,
    ),
    st.sampled_from(["backward", "forward"]),
    st.booleans(),
)


@settings(max_examples=15, deadline=None)
@given(asof_strategy)
def test_asof_join_matches_merge_asof(spark, case):
    """asof_join == pandas merge_asof on arbitrary key/time multisets,
    both directions, inclusive and exclusive — integer time axis."""
    import pandas as pd

    from alphalens_spark.joins import asof_join

    left_rows, right_rows, direction, exact = case
    left = pd.DataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left_rows)],
        columns=["k", "t", "lid"],
    )
    right = pd.DataFrame(
        [(k, t, 1000 + i) for i, (k, t) in enumerate(sorted(set(right_rows)))],
        columns=["k", "t", "rid"],
    ).astype({"k": "int64", "t": "int64", "rid": "int64"})
    got = {
        (r["k"], r["t"], r["lid"]): r["rid"]
        for r in asof_join(
            spark.createDataFrame(left, "k long, t long, lid long"),
            spark.createDataFrame(right, "k long, t long, rid long"),
            on="t", by=["k"], direction=direction, allow_exact_matches=exact,
        ).collect()
    }
    want_df = pd.merge_asof(
        left.sort_values(["t", "lid"]),
        right.sort_values("t"),
        on="t", by="k", direction=direction, allow_exact_matches=exact,
    )
    want = {
        (r.k, r.t, r.lid): (None if pd.isna(r.rid) else int(r.rid))
        for r in want_df.itertuples(index=False)
    }
    assert got == want
