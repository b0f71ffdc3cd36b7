"""The plot_* layer computes plot-ready tables without matplotlib.

Each reference plotting function (SURVEY §2: plotting.py computes several
summary tables, not just draws) must return a well-formed pandas frame
from the Spark operator outputs.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from alphalens_spark import datasets, performance as perf, plotting

SF = "/root/testdata/sf0.001"
COLS = ["1D", "5D"]


@pytest.fixture(scope="module")
def fd(spark):
    df = datasets.factor_data(spark, SF).persist()
    df.count()
    yield df
    df.unpersist()


def test_information_plots(spark, fd):
    ic = perf.factor_information_coefficient(fd, COLS)
    ts = plotting.plot_ic_ts(ic, COLS)
    assert {"ic_1D", "ic_roll_1D", "ic_5D", "ic_roll_5D"} <= set(ts.columns)
    # 22-obs rolling mean must be smoother: std of the roll <= std of raw
    assert ts["ic_roll_1D"].std() <= ts["ic_1D"].std()

    hist = plotting.plot_ic_hist(ic, COLS)
    assert len(hist) == len(ts)

    qq = plotting.plot_ic_qq(ic, COLS)
    # theoretical quantiles sorted, sample sorted — both monotone
    assert qq["theoretical_1D"].is_monotonic_increasing
    assert qq["sample_1D"].dropna().is_monotonic_increasing

    table = plotting.plot_information_table(ic, COLS)
    assert table["n_1D"].iloc[0] > 0
    # p-value row (ref plotting.py:172 ttest_1samp, two-sided): present,
    # in (0,1], and consistent with the t-stat via the sf identity
    for c in COLS:
        p, t, n = (table[f"pvalue_{c}"].iloc[0], table[f"tstat_{c}"].iloc[0],
                   table[f"n_{c}"].iloc[0])
        assert 0.0 < p <= 1.0
        assert abs(p - 2.0 * perf.student_t_sf(abs(t), n - 1)) < 1e-12


def test_student_t_sf_closed_forms():
    """sf agrees with the df=1 (arctan) and df=2 (algebraic) closed forms
    to machine precision, and reproduces the classic 5% two-sided
    critical point at df=10."""
    import math

    for t in (0.5, 1.0, 2.0, 5.0):
        assert abs(perf.student_t_sf(t, 1) - (0.5 - math.atan(t) / math.pi)) < 1e-14
        assert abs(
            perf.student_t_sf(t, 2) - 0.5 * (1 - t / math.sqrt(2 + t * t))
        ) < 1e-14
        # symmetry
        assert abs(perf.student_t_sf(-t, 5) - (1 - perf.student_t_sf(t, 5))) < 1e-14
    assert abs(2 * perf.student_t_sf(2.2281388519649385, 10) - 0.05) < 1e-10


def test_monthly_ic_heatmap(spark, fd):
    heat = plotting.plot_monthly_ic_heatmap(
        perf.mean_information_coefficient(fd, COLS, by_time="month").withColumnRenamed(
            "time_bucket", "date"
        ),
        COLS,
    )
    assert set(heat) == set(COLS) and not heat["1D"].empty


def test_returns_plots(spark, fd):
    mrbq = perf.mean_return_by_quantile(fd, COLS)
    by_date = perf.mean_return_by_quantile(fd, COLS, by_date=True)
    spread = perf.compute_mean_returns_spread(by_date, 5, 1, COLS)
    ab = perf.factor_alpha_beta(fd, COLS)

    bar = plotting.plot_quantile_returns_bar(mrbq, COLS)
    assert list(bar.index) == [1, 2, 3, 4, 5] and list(bar.columns) == COLS

    violin = plotting.plot_quantile_returns_violin(by_date, COLS)
    assert len(violin) == by_date.count()

    sp = plotting.plot_mean_quantile_returns_spread_time_series(spread, COLS)
    assert {"spread_1D", "spread_roll_1D", "spread_roll_std_1D"} <= set(sp.columns)

    table = plotting.plot_returns_table(ab, mrbq, spread, COLS)
    assert "Ann. alpha" in table.index and set(table.columns) == set(COLS)

    fr = perf.factor_returns(fd, COLS)
    cum = plotting.plot_cumulative_returns(fr, "1D")
    # synthetic panel returns cross -100% → cum goes null there by design
    # (performance.cumulative_returns docstring); the series must still be
    # complete and non-null up to the first such date
    assert len(cum) == fr.count() and cum["cum_ret"].iloc[0] is not None

    cum_q = plotting.plot_cumulative_returns_by_quantile(by_date, "1D")
    assert set(cum_q.columns) == {1, 2, 3, 4, 5}


def test_turnover_and_event_plots(spark, fd):
    to = perf.quantile_turnover(fd, periods=(1,))
    ac = perf.factor_rank_autocorrelation(fd, 1)

    to_tbl, ac_tbl = plotting.plot_turnover_table(ac, to)
    assert 1 in to_tbl.columns and ac_tbl.loc[1, "mean_autocorr"] <= 1.0

    tb = plotting.plot_top_bottom_quantile_turnover(to, 1)
    assert {"top quantile turnover", "bottom quantile turnover"} == set(tb.columns)

    acp = plotting.plot_factor_rank_auto_correlation(ac, 1)
    assert "autocorr" in acp.columns

    qstats = plotting.plot_quantile_statistics_table(fd)
    assert abs(qstats["count %"].sum() - 100.0) < 1e-6

    acr = perf.average_cumulative_return_by_quantile(
        fd, datasets.prices(spark, SF), 2, 4, demeaned=False
    )
    path = plotting.plot_quantile_average_cumulative_return(acr)
    assert ("mean_ret", 1) in path.columns and len(path) == 7  # offsets −2..4

    dist = plotting.plot_events_distribution(fd.select("date"), num_bars=10)
    assert dist["n_events"].sum() == fd.count()


def test_grid_figure_and_context_run_without_matplotlib():
    with plotting.plotting_context(), plotting.axes_style():
        gf = plotting.GridFigure(rows=2, cols=2)
        assert gf.next_row() is None or True
        assert gf.next_cell() is None or True
        gf.close()

    @plotting.customize
    def f(x):
        return x + 1

    assert f(1) == 2
