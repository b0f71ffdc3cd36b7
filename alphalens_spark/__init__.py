"""alphalens_spark — a PySpark-native alpha-factor analytics engine.

A from-scratch re-expression of the capabilities of quantopian/alphalens
(reference at /root/reference, pandas single-node) as idiomatic Spark:

- ONE canonical long DataFrame keyed by (date, asset) replaces the
  reference's MultiIndex frames (reference utils.py:559-589).
- A broadcast trading-calendar dimension table (date, day_idx) replaces
  index-freq side-channel calendar arithmetic (reference utils.py:173-213,
  971-1039); every "shift by N trading periods" becomes integer arithmetic
  on day_idx (lead/lag windows or equi-joins).
- Window functions + equi/broadcast joins replace pandas index alignment.
- Catalyst/AQE supply pruning, pushdown and physical planning the
  reference never had.

Modules:
  calendar_     trading-calendar dim table + day_idx attachment
  utils         ingestion: forward returns, quantization, cleaning
  performance   metrics: IC, factor returns, alpha/beta, turnover, events
  tears         batch drivers mirroring the reference tear sheets
  plotting      the reference's plot_* API, compute-first (render optional)
  joins         generic as-of (point-in-time) join, single-shuffle form
  events        event analytics: sessionize, funnel, cohorts, actives,
                decayed activity, trailing-baseline anomaly z-scores
  storage       bucketed-table layouts for shuffle-free co-located joins,
                partitioned-store small-file compaction, Z-order layout,
                footer-stats manifests + file-level data skipping
  streaming     watermarked windowed aggs, stateful sessionization,
                bounded-state stream-stream interval join, incremental
                near-dup suppression, mergeable sketch-store maintenance
  incremental   append-only factor_data store maintenance
  datasets      derived factor/prices panels from the driver's TPC-H data
  plans         physical-plan introspection: plan_summary, assert_scalable
                deploy gate, per-scan pruning/pushdown reports
  sources       Python DataSource V2: JSONL corpus source/sink with filter
                pushdown; deterministic synthetic events batch + stream
  graph         PageRank, triangle counting / clustering coefficients,
                k-core peeling — each with an unrolled-CTE SQL twin
  scale         LLM-data-pipeline extensions: dedup, similarity (LSH/IVF/
                IVF-PQ/JL), text (quality/BM25/LM-score, BPE training +
                segmentation, inverted-index search, PMI collocations),
                curation (Gopher/C4/spans/chunking/packing/mixing/splits),
                profile (sketches + histogram quantiles), affinity (basket
                co-occurrence / association rules / item similarity),
                linkage (record matching + entity clusters), features
                (target encoding, RFM, purged CV, rank normalization,
                group-wise OLS), cdc, skew, multimodal (REAL netpbm + WAV
                codecs; entropy-coded formats stubbed)
"""

from alphalens_spark import calendar_ as calendar  # noqa: F401
from alphalens_spark import events, joins, performance, utils  # noqa: F401

__version__ = "0.1.0"
