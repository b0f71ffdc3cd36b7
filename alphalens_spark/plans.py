"""Physical-plan introspection — programmatic access to the facts the
100 TB posture depends on.

``tests/test_plans.py`` asserts plan shapes with raw string matching;
this module gives the same checks a first-class API so pipelines can
gate deploys on them (``assert_scalable``), notebooks can print a
one-line audit (``plan_summary``), and scan efficiency — column pruning
and predicate pushdown actually reaching parquet — is inspectable
without eyeballing ``explain()`` output.

Everything reads the *executed* (pre-AQE-finalization) physical plan
text: the plan Spark would run, not the unresolved logical tree.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


def _plan_text(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@dataclass
class PlanSummary:
    """Counted plan facts. ``shuffles`` excludes broadcast exchanges —
    a BroadcastExchange ships a small side to every executor (good);
    a shuffle Exchange repartitions the big relation (the thing to
    minimize)."""

    shuffles: int = 0
    broadcasts: int = 0
    sort_merge_joins: int = 0
    broadcast_hash_joins: int = 0
    nested_loop_joins: int = 0
    cartesian_products: int = 0
    generates: int = 0
    windows: int = 0
    # Window operators with NO partition spec: every row moves to ONE
    # partition (the WindowExec warning) — fine for a bounded dimension
    # (distinct-date calendar), fatal for a data-sized input
    global_windows: int = 0
    python_evals: int = 0
    scans: list["ScanInfo"] = field(default_factory=list)

    @property
    def quadratic_joins(self) -> int:
        return self.nested_loop_joins + self.cartesian_products


@dataclass
class ScanInfo:
    """One parquet/file scan: what reached the reader. ``n_paths`` is the
    file-index size — the number the data-skipping layer shrinks."""

    location: str
    read_columns: list[str]
    pushed_filters: list[str]
    n_paths: int | None = None


# Lines that can ONLY come from an already-EXECUTED plan rendering:
# query-stage wrappers, AQE section headers and whole-stage-codegen
# star markers are inserted at execution time, and the frames PLANS.md
# audits are never executed before the audit — so inside a cached
# build's rendering these lines prove we are still INSIDE the build
# even when Spark rebases a nested AdaptiveSparkPlan's section
# indentation SHALLOWER than the InMemoryRelation line that owns it
# (observed on nested caches: graph queries persist frames derived
# from other persisted frames, and the inner cache's "== Final Plan
# ==" printed left of the outer skip threshold, resuming the strip
# mid-build and overcounting scans/shuffles).
_EXECUTED_ONLY = re.compile(
    r"== (?:Final|Initial) Plan ==|QueryStage|AQEShuffleRead|\*\(\d+\)"
)


def strip_cached_builds(plan_text: str) -> str:
    """Drop every InMemoryRelation BUILD subtree from a plan rendering:
    those operators run once at cache materialization, not per query,
    so steady-state audits (PLANS.md) must not count them. The
    InMemoryTableScan line itself survives — that IS the steady-state
    read. Subtree extent is the tree indentation: every following line
    whose operator name starts deeper than the InMemoryRelation's
    belongs to its cached plan — except that nested executed-plan
    sections may print SHALLOWER than the owning InMemoryRelation, so
    any executed-only line (see ``_EXECUTED_ONLY``) keeps the skip
    alive and tightens the threshold to fence in the bare operator
    lines of the section it heads."""
    out = []
    skip_deeper_than = None
    for line in plan_text.splitlines():
        indent = len(re.match(r"^[ :+\-]*", line).group(0))
        if skip_deeper_than is not None:
            if _EXECUTED_ONLY.search(line):
                skip_deeper_than = min(skip_deeper_than, indent - 1)
                continue
            if indent > skip_deeper_than:
                continue
            skip_deeper_than = None
        if "InMemoryRelation" in line:
            skip_deeper_than = indent
            continue
        out.append(line)
    return "\n".join(out)


def plan_summary(df: DataFrame, steady_state: bool = False) -> PlanSummary:
    """Parse the executed plan into counted facts + per-scan details.

    ``steady_state=True`` excludes InMemoryRelation build subtrees (see
    :func:`strip_cached_builds`) — the per-execution cost of a query
    over an already-materialized cache. The default (full text) is what
    the plan GATES audit, so cache-build operators cannot escape gating
    by hiding inside a persist."""
    p = _plan_text(df)
    if steady_state:
        p = strip_cached_builds(p)
    s = PlanSummary(
        # every non-broadcast Exchange is a shuffle — counting uniformly
        # (rather than by partitioning kind) keeps RoundRobinPartitioning
        # from repartition()/rebalance hidden from the max_shuffles gate
        shuffles=p.count("Exchange") - p.count("BroadcastExchange"),
        broadcasts=p.count("BroadcastExchange"),
        sort_merge_joins=p.count("SortMergeJoin"),
        broadcast_hash_joins=p.count("BroadcastHashJoin"),
        nested_loop_joins=p.count("BroadcastNestedLoopJoin"),
        cartesian_products=p.count("CartesianProduct"),
        generates=p.count("Generate"),
        windows=len(re.findall(r"\bWindow\b|RunningWindowFunction", p)),
        # Window lines print [exprs], [partition], [order] with EMPTY
        # groups omitted: 3 groups ⇒ partitioned; 2 groups is partitioned-
        # unordered OR global-ordered — told apart by the last group
        # (order entries carry ASC/DESC, partition columns never do)
        global_windows=sum(
            1
            for line in p.splitlines()
            if re.search(r"\bWindow(?:InPandas)? \[", line)
            and line.count("], [") < 2
            and re.search(r"\], \[[^\[\]]*(?:ASC|DESC)[^\[\]]*\]\s*$", line)
        ),
        python_evals=len(re.findall(r"(?:Batch|Arrow)EvalPython|MapInPandas|FlatMapGroupsInPandas", p)),
    )
    for line in p.splitlines():
        m = re.search(r"FileScan \w+ [^\[]*\[([^\]]*)\]", line)
        if not m:
            continue
        cols = [c.split("#")[0].strip() for c in m.group(1).split(",") if c.strip()]
        loc = ""
        lm = re.search(r"Location: [^\[]*\[([^\]]*)\]", line)
        if lm:
            loc = lm.group(1)
        pf: list[str] = []
        fm = re.search(r"PushedFilters: \[([^\]]*)\]", line)
        if fm and fm.group(1).strip():
            # split on top-level commas only (filter args contain commas)
            pf = re.findall(r"\w+\([^()]*(?:\([^()]*\)[^()]*)*\)", fm.group(1))
        nm = re.search(r"FileIndex\((\d+) paths?\)", line)
        s.scans.append(
            ScanInfo(
                location=loc,
                read_columns=cols,
                pushed_filters=pf,
                n_paths=int(nm.group(1)) if nm else None,
            )
        )
    return s


def assert_scalable(
    df: DataFrame,
    max_shuffles: int | None = None,
    allow_nested_loop: bool = False,
    forbid_python: bool = False,
) -> PlanSummary:
    """Deploy-gate: raise AssertionError if the plan contains a shape
    that stops scaling — a cartesian product always, a nested-loop join
    unless explicitly allowed (1-row stats broadcasts are the legitimate
    case), more shuffles than budgeted, Python evaluation when the
    operator is contractually JVM-only. Returns the summary on success
    so callers can log it."""
    s = plan_summary(df)
    assert s.cartesian_products == 0, f"CartesianProduct in plan: {s}"
    if not allow_nested_loop:
        assert s.nested_loop_joins == 0, f"BroadcastNestedLoopJoin in plan: {s}"
    if max_shuffles is not None:
        assert s.shuffles <= max_shuffles, (
            f"{s.shuffles} shuffles > budget {max_shuffles}"
        )
    if forbid_python:
        assert s.python_evals == 0, f"Python eval in plan: {s}"
    return s


def scan_report(df: DataFrame) -> list[ScanInfo]:
    """Per-scan pruning/pushdown audit: which columns each file scan
    actually reads and which predicates reached the reader. A scan whose
    ``read_columns`` is the full table for a 2-column projection means
    pruning broke."""
    return plan_summary(df).scans
