"""Single-node pandas baseline of the headline DAG.

The reference itself cannot run here (its `empyrical` dependency is not
installed), so this measures a faithful pandas implementation of the SAME
operator semantics the reference defines (wide pct_change/shift forward
returns, per-date groupby quantize/IC/weights, set-based turnover) on the
same derived workload as bench.py — the apples-to-apples single-node
number for BASELINE.md.

Usage: python tools/pandas_baseline.py  → one JSON line like bench.py.
"""

from __future__ import annotations

import json
import os
import re
import time

import numpy as np
import pandas as pd


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([\d.]+)", sf_dir)
    sf = float(m.group(1)) if m else None
    timings: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.perf_counter()
        out = fn()
        timings[name] = round(time.perf_counter() - t0, 4)
        return out

    # --- ingestion: panel → wide → forward returns → clean → quantize ---
    def build_factor_data():
        li = pd.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_shipdate", "l_suppkey", "l_quantity", "l_extendedprice", "l_discount"],
        )
        week = li["l_shipdate"].dt.to_period("W-SUN").dt.start_time
        g = li.assign(week=week).groupby(["week", "l_suppkey"])
        panel = pd.DataFrame(
            {
                "price": g["l_extendedprice"].sum() / g["l_quantity"].sum(),
                "factor": (li["l_quantity"] * (1 - li["l_discount"]))
                .groupby([week, li["l_suppkey"]])
                .sum(),
            }
        )
        panel.index.names = ["date", "asset"]
        wide_p = panel["price"].unstack()          # the reference's wide frame
        fwd = {}
        for k in (1, 5):
            fwd[f"{k}D"] = wide_p.pct_change(k, fill_method=None).shift(-k)
        fd = pd.DataFrame({k: v.stack() for k, v in fwd.items()})
        fd["factor"] = panel["factor"]
        fd = fd.dropna()
        # per-date quantile labels (rank-based 5-tile, reference qcut shape)
        fd["factor_quantile"] = (
            fd.groupby(level=0)["factor"]
            .transform(lambda x: pd.qcut(x.rank(method="first"), 5, labels=False) + 1)
            .astype(int)
        )
        return fd

    fd = timed("ingestion_factor_data", build_factor_data)
    cols = ["1D", "5D"]

    def mean_return_by_quantile():
        dm = fd[cols] - fd.groupby(level=0)[cols].transform("mean")
        dm["factor_quantile"] = fd["factor_quantile"]
        l1 = dm.groupby(["factor_quantile", pd.Grouper(level=0)])[cols].mean()
        return l1.groupby(level=0).agg(["mean", "std", "count"])

    timed("mean_return_by_quantile", mean_return_by_quantile)

    def factor_ic():
        def ic(grp):
            r = grp.rank()
            return r[cols].corrwith(r["factor"])
        return fd.groupby(level=0)[["factor", *cols]].apply(ic)

    timed("factor_ic", factor_ic)

    def factor_returns():
        dm = fd["factor"] - fd.groupby(level=0)["factor"].transform("mean")
        w = dm / dm.abs().groupby(level=0).transform("sum")
        return fd[cols].mul(w, axis=0).groupby(level=0).sum()

    rets = timed("factor_returns", factor_returns)

    def alpha_beta():
        out = {}
        uni = fd.groupby(level=0)[cols].mean()
        for c in cols:
            x, y = uni[c].values, rets[c].values
            beta = np.cov(x, y, ddof=1)[0, 1] / np.var(x, ddof=1)
            out[c] = (y.mean() - beta * x.mean(), beta)
        return out

    timed("factor_alpha_beta", alpha_beta)

    def quantile_turnover():
        res = {}
        for p in (1, 5):
            for q in range(1, 6):
                members = (
                    fd[fd["factor_quantile"] == q].reset_index()
                    .groupby("date")["asset"].apply(set)
                )
                new = members.combine(
                    members.shift(p),
                    lambda cur, prev: np.nan
                    if not isinstance(prev, set)
                    else len(cur - prev) / len(cur),
                )
                res[(q, p)] = new
        return res

    timed("quantile_turnover", quantile_turnover)

    def rank_autocorr():
        ranks = fd.groupby(level=0)["factor"].rank().unstack()
        return ranks.corrwith(ranks.shift(1), axis=1)

    timed("rank_autocorr", rank_autocorr)

    total = round(sum(timings.values()), 4)
    print(json.dumps({
        "metric": "pandas single-node baseline (same DAG subset)",
        "value": total, "unit": "sec", "queries": timings, "sf": sf,
    }))


if __name__ == "__main__":
    main()
