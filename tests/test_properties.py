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


# ------------------------------------------------- round-2 op invariants
docs_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=9999),  # doc id
        st.lists(
            st.text(alphabet="abcxyz", min_size=1, max_size=4),
            min_size=1, max_size=25,
        ),
    ),
    min_size=1,
    max_size=12,
    unique_by=lambda t: t[0],
)


@settings(max_examples=10, deadline=None)
@given(docs_strategy, st.integers(2, 6), st.integers(1, 6))
def test_chunking_full_coverage_property(spark, docs, size, stride):
    """Every chunk has exactly min(size, n) tokens and matches the source
    slice; for stride <= size (the contract's coverage regime) every
    token index lands in >= 1 chunk. stride > size is documented
    gap-sampling — starts are still the clamped grid."""
    from alphalens_spark.scale.curation import chunk_documents

    rows = [(i, " ".join(toks)) for i, toks in docs]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = chunk_documents(df, size=size, stride=stride).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    for i, toks in docs:
        chunks = by_doc[i]
        n = len(toks)
        covered = set()
        for c in chunks:
            assert c.n_tokens == min(size, n)
            assert c.chunk_text == " ".join(
                toks[c.start_token : c.start_token + size]
            )
            covered.update(range(c.start_token, c.start_token + c.n_tokens))
        if stride <= size:
            assert covered == set(range(n))
        else:
            starts = sorted(c.start_token for c in chunks)
            last = max(n - size, 0)
            grid = list(range(0, last + 1, stride))
            if last > 0 and last % stride:
                grid.append(last)
            assert starts == grid


@settings(max_examples=8, deadline=None)
@given(
    st.lists(st.text(alphabet="abcdef", min_size=1, max_size=6),
             min_size=1, max_size=60),
    st.integers(2, 4),
)
def test_kmv_merge_associativity_property(spark, values, n_splits):
    """KMV of the union == merge of per-split KMVs, for ANY split — the
    mergeability contract the streaming store relies on."""
    from alphalens_spark.scale.profile import kmv_distinct

    k = 8
    whole = spark.createDataFrame([("g", v) for v in values], "g string, v string")
    want = kmv_distinct(whole, ["g"], "v", k=k).collect()[0]
    # simulate the store merge: union of per-split distinct hashes -> same op
    splits = [values[i::n_splits] for i in range(n_splits)]
    parts = [s for s in splits if s]
    merged = spark.createDataFrame(
        [("g", v) for s in parts for v in s], "g string, v string"
    )
    got = kmv_distinct(merged, ["g"], "v", k=k).collect()[0]
    assert (got.n_mins, got.est_distinct) == (want.n_mins, want.est_distinct)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 999), st.floats(0.1, 100, allow_nan=False)),
        min_size=1, max_size=40, unique_by=lambda t: t[0],
    ),
    st.integers(1, 10),
)
def test_weighted_sample_membership_partition_invariance(spark, items, k):
    """A-ES membership is a pure function of (ids, weights, k) — never of
    row order or physical partitioning."""
    from alphalens_spark.scale.curation import weighted_priority_sample

    df = spark.createDataFrame(items, "doc_id bigint, w double")
    a = sorted(r.doc_id for r in weighted_priority_sample(df, "w", k=k).collect())
    b = sorted(
        r.doc_id
        for r in weighted_priority_sample(
            df.orderBy(F.rand(7)).repartition(5), "w", k=k
        ).collect()
    )
    assert a == b
    assert len(a) == min(k, len(items))


@settings(max_examples=8, deadline=None)
@given(st.lists(st.text(alphabet="pqr", min_size=1, max_size=3),
                min_size=1, max_size=50))
def test_cm_never_undercounts_property(spark, items):
    """CM point estimates are upper bounds on true frequencies, for any
    input distribution (Cormode-Muthukrishnan guarantee)."""
    from collections import Counter

    from alphalens_spark.scale.profile import cm_estimate, cm_sketch

    df = spark.createDataFrame([(i,) for i in items], "item string")
    sk = cm_sketch(df, "item", depth=3, width=16)  # tiny: force collisions
    probes = spark.createDataFrame(
        [(i,) for i in set(items)], "item string"
    )
    est = {r.item: r.est_count for r in cm_estimate(sk, probes, width=16, depth=3).collect()}
    truth = Counter(items)
    for it, n in truth.items():
        assert est[it] >= n


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
        min_size=5,
        max_size=40,
    ),
    st.floats(min_value=1e7, max_value=1e9),
)
def test_robust_zscore_spike_magnitude_invariant(spark, values, spike):
    """The masking-resistance property, stated exactly: median and MAD
    depend only on value RANKS, so every other row's robust z is
    IDENTICAL whether the injected outlier is `spike` or 100x `spike` —
    a mean/std z-score would shrink with the outlier's magnitude."""
    from alphalens_spark.scale.profile import robust_zscore

    def zs(extra):
        df = spark.createDataFrame(
            [("g", float(v)) for v in values] + [("g", float(extra))],
            "g string, v double",
        )
        return {
            r.v: r.robust_z
            for r in robust_zscore(df, "v", ["g"]).collect()
            if r.v != float(extra)
        }

    assert zs(spike) == zs(spike * 100.0)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(st.sampled_from(["alpha", "beta", "gamma", "delta"]), min_size=3, max_size=30)
)
def test_tfidf_ranks_dense_and_scores_positive(spark, words):
    from alphalens_spark.scale.text import tfidf_top_terms

    docs = spark.createDataFrame(
        [(0, " ".join(words)), (1, "alpha other words here")],
        "doc_id long, text string",
    )
    out = tfidf_top_terms(docs, n_top=10).collect()
    assert all(r.tfidf > 0 for r in out)
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r.rnk)
    for ranks in by_doc.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))  # dense, unique


@settings(max_examples=6, deadline=None)
@given(st.integers(min_value=1, max_value=6))
def test_heavy_hitters_superset_guarantee(spark, k):
    """CM estimates are upper bounds: the true top-1 item (by a wide
    margin) must always be the first heavy hitter."""
    from pyspark.sql import functions as F

    from alphalens_spark.scale.profile import heavy_hitters

    df = spark.range(300).select(
        F.when(F.col("id") % 3 != 0, F.lit("dominant"))
        .otherwise(F.concat(F.lit("rare"), F.col("id")))
        .alias("item")
    )
    out = heavy_hitters(df, "item", k=k, width=512)
    rows = out.collect()
    assert rows[0].item == "dominant" and rows[0].est_count >= 200
    assert len(rows) == k


# ---------------------------------------------------------------- graph ops

edge_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=12),
        st.integers(min_value=0, max_value=12),
    ),
    min_size=1,
    max_size=40,
)


@settings(max_examples=10, deadline=None)
@given(edge_strategy)
def test_triangle_count_matches_brute(spark, edges):
    import itertools

    from alphalens_spark import graph

    df = spark.createDataFrame(edges, "src int, dst int")
    got = {r["node"]: r["triangles"] for r in graph.triangle_count(df).collect()}
    und = {(min(u, v), max(u, v)) for u, v in edges if u != v}
    adj = {}
    for u, v in und:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    want = {n: 0 for n in adj}
    for a, b, c in itertools.combinations(sorted(adj), 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            want[a] += 1
            want[b] += 1
            want[c] += 1
    assert got == want


@settings(max_examples=10, deadline=None)
@given(edge_strategy, st.integers(min_value=2, max_value=4))
def test_k_core_matches_brute(spark, edges, k):
    from alphalens_spark import graph

    df = spark.createDataFrame(edges, "src int, dst int")
    got = {r["node"]: r["degree"] for r in graph.k_core(df, k).collect()}
    adj = {}
    for u, v in edges:
        if u != v:
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
    changed = True
    while changed:
        changed = False
        for n in list(adj):
            if len(adj[n]) < k:
                for m in adj.pop(n):
                    adj[m].discard(n)
                changed = True
        adj = {n: s for n, s in adj.items() if s}
    want = {n: len(s) for n, s in adj.items() if len(s) >= k}
    assert got == want


basket_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=8),   # basket
        st.integers(min_value=0, max_value=5),   # item id
    ),
    min_size=2,
    max_size=40,
)


@settings(max_examples=10, deadline=None)
@given(basket_strategy)
def test_association_rule_invariants(spark, rows):
    from alphalens_spark.scale.affinity import association_rules

    df = spark.createDataFrame(
        [(b, f"i{i}") for b, i in rows], "basket int, item string"
    )
    out = association_rules(df, "basket", "item").collect()
    for r in out:
        assert 0 < r["support"] <= 1
        assert 0 < r["confidence"] <= 1
        assert r["lift"] > 0
        assert r["pair_baskets"] >= 1


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),
            st.floats(min_value=-50, max_value=50, allow_nan=False),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_rank_normalize_invariants(spark, rows):
    from alphalens_spark.scale.features import rank_normalize

    df = spark.createDataFrame(
        [(f"g{g}", v) for g, v in rows], "grp string, x double"
    )
    out = rank_normalize(df, "x", by=["grp"]).collect()
    by_grp = {}
    for r in out:
        assert 0 < r["pct_rank"] < 1
        by_grp.setdefault(r["grp"], []).append(r["pct_rank"])
    # within each group the mean percentile rank is exactly 0.5
    for vals in by_grp.values():
        assert abs(sum(vals) / len(vals) - 0.5) < 1e-4


@given(
    st.lists(
        st.text(alphabet="ab cd", min_size=0, max_size=400),
        min_size=1,
        max_size=6,
    ),
    st.text(alphabet="xyz ", min_size=1, max_size=40),
)
@settings(max_examples=8, deadline=None)
def test_cdc_chunks_tile_exactly_and_resync(spark, texts, prefix):
    """Property: CDC chunks exactly tile every document (lengths sum to
    len, contiguous, 1-based), and prefixing a document changes at most
    the chunks before the first interior boundary — every digest from
    the second boundary on survives."""
    from alphalens_spark.scale.dedup import content_defined_chunks

    rows = [(i, t) for i, t in enumerate(texts)]
    rows += [(1000 + i, prefix + t) for i, t in enumerate(texts)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {}
    for r in content_defined_chunks(docs, window=8, mask_bits=4).collect():
        out.setdefault(r["doc_id"], []).append(
            (r["chunk_idx"], r["chunk_start"], r["chunk_len"], r["chunk_digest"])
        )
    for i, t in rows:
        if len(t) == 0:
            assert i not in out  # empty doc -> zero-length chunk filtered
            continue
        cs = sorted(out[i])
        assert sum(c[2] for c in cs) == len(t)
        assert cs[0][1] == 1
        for (pi, ps, pl, _), (ci, cs2, cl, _) in zip(cs, cs[1:]):
            assert cs2 == ps + pl and ci == pi + 1
    # resync: digests after the first interior boundary of the prefixed
    # doc form a SUBSET relationship with the original's tail digests
    for i, t in enumerate(texts):
        if len(t) == 0 or i not in out or (1000 + i) not in out:
            continue
        orig = sorted(out[i])
        pref = sorted(out[1000 + i])
        if len(orig) >= 2:
            tail = {c[3] for c in orig[1:]}
            # all original tail chunks whose content lies fully after the
            # first boundary must reappear in the prefixed doc's digests
            pref_digests = {c[3] for c in pref}
            assert tail <= pref_digests


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c"]),
            st.integers(0, 50),
            st.floats(-100, 100, allow_nan=False, allow_infinity=False),
        ),
        min_size=1,
        max_size=60,
        unique_by=lambda r: (r[0], r[1]),
    )
)
def test_ewma_matches_pandas_property(spark, rows):
    """performance.ewma equals pandas ewm(adjust=False).mean() bit for
    bit on arbitrary grouped series (unique (group, t) keys)."""
    import pandas as pd

    df = spark.createDataFrame(rows, "g string, t int, v double")
    got = {
        (r["g"], r["t"]): r["ewma"]
        for r in perf.ewma(df, "v", order_col="t", by="g", span=7.0).collect()
    }
    pdf = pd.DataFrame(rows, columns=["g", "t", "v"]).sort_values(["g", "t"])
    for g, grp in pdf.groupby("g"):
        want = grp["v"].ewm(span=7.0, adjust=False).mean()
        for t, w in zip(grp["t"], want):
            assert got[(g, t)] == w, (g, t)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(1, 5),                    # user
            st.integers(0, 3 * 24 * 60 - 1),      # minute offset in 3 days
        ),
        min_size=1,
        max_size=50,
        unique=True,
    )
)
def test_concurrent_sessions_invariants(spark, evs):
    """Sweep-line invariants on random event sets: per day
    1 <= peak <= n_sessions; total day-session rows >= the number of
    gap-sessions (midnight spans count toward each day); result is
    repartition-invariant."""
    import datetime as _dt

    from alphalens_spark.events import concurrent_sessions, sessionize

    base = _dt.datetime(2024, 3, 1)
    rows = [
        (i, u, base + _dt.timedelta(minutes=m))
        for i, (u, m) in enumerate(evs)
    ]
    ev = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    out = concurrent_sessions(ev, gap_minutes=30).collect()
    n_sess = sessionize(ev, gap_minutes=30).count()
    assert sum(r["n_sessions"] for r in out) >= n_sess
    for r in out:
        assert 1 <= r["peak_concurrent"] <= r["n_sessions"]
    out2 = concurrent_sessions(ev.repartition(7), gap_minutes=30).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))


@given(
    st.integers(1, 3).map(lambda r: r * 8),
    st.integers(1, 24),
    st.integers(0, 2**32 - 1),
)
@settings(max_examples=15, deadline=None)
def test_jpeg_roundtrip_matches_quantization_replay(h, w, seed):
    """Property form of the JPEG invariant: for ANY uint8 grayscale
    raster (multiple-of-8 height, arbitrary width → exercises MCU edge
    padding), parse_jpeg(make_jpeg(img)) equals the independent
    numpy/decimal replay of DCT → snap-6 half-up quantize → dequantize
    → IDCT → +128 clamp. Huffman coding and DC prediction must be
    exactly invertible for this to hold — any bit-level encode/decode
    bug surfaces as a pixel diff."""
    import numpy as np

    from alphalens_spark.scale import multimodal

    rng = np.random.RandomState(seed)
    img = rng.randint(0, 256, (h, w), dtype=np.uint8)
    dec = multimodal.parse_jpeg(multimodal.make_jpeg(img))
    assert dec.shape == (h, w, 1)

    cosb = multimodal._jpeg_cos_basis()
    cs = np.full(8, 0.5)
    cs[0] = 0.5 / np.sqrt(2.0)
    q = np.asarray(multimodal._JPEG_QTABLE, float).reshape(8, 8)
    pw = (w + 7) // 8 * 8
    padded = np.pad(img, ((0, 0), (0, pw - w)), mode="edge")
    for by in range(0, h, 8):
        for bx in range(0, pw, 8):
            block = padded[by:by + 8, bx:bx + 8].astype(float) - 128.0
            m = (cosb.T @ block @ cosb) * np.outer(cs, cs)
            cq = np.array(
                [
                    [
                        multimodal._jpeg_half_up6(m[u, v] / q[u, v])
                        for v in range(8)
                    ]
                    for u in range(8)
                ],
                float,
            )
            rec = cosb @ (cq * q * np.outer(cs, cs)) @ cosb.T
            exp = np.array(
                [
                    [
                        min(
                            255,
                            max(0, multimodal._jpeg_half_up6(rec[y, x]) + 128),
                        )
                        for x in range(8)
                    ]
                    for y in range(8)
                ],
                np.uint8,
            )
            wlim = min(8, w - bx)
            if wlim <= 0:
                continue
            assert (dec[by:by + 8, bx:bx + wlim, 0] == exp[:, :wlim]).all()
