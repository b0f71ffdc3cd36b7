"""Audit DuckDB-side output column types for every oracle.

DuckDB's pandas conversion of exotic numeric types (HUGEINT from
sum(BIGINT), DECIMAL, UHUGEINT) is VERSION-DEPENDENT: 1.0.0 renders
HUGEINT as float64, newer versions changed the conversion. The local
comparator compares numerically so it cannot see the drift, but the
driver's value-hash can — int64(16320) and float64(16320.0) hash
differently. Every oracle output column must therefore be a stable
type: BIGINT/INT/DOUBLE/VARCHAR/BOOLEAN/TIMESTAMP/DATE.

Usage: python tools/type_audit.py [sf_dir] [query ...]
Prints one line per query; flags HUGEINT/UHUGEINT/DECIMAL columns.
Exit 1 if any flagged.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from oracle_check import duckdb_connect_views  # noqa: E402

BAD = ("HUGEINT", "UHUGEINT", "DECIMAL")


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry_mod

    con = duckdb_connect_views(sf_dir)

    oracles = entry_mod.oracle_sql()
    n_flagged = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        try:
            rel = con.sql(sql)
            types = [str(t).upper() for t in rel.types]
            cols = rel.columns
        except Exception as e:  # noqa: BLE001
            print(f"{name}: ERROR {type(e).__name__}: {e}")
            n_flagged += 1
            continue
        bad = [
            f"{c}:{t}" for c, t in zip(cols, types)
            if any(t.startswith(b) for b in BAD)
        ]
        if bad:
            n_flagged += 1
            print(f"{name}: FLAG {', '.join(bad)}")
    print(f"-- {n_flagged} flagged")
    return 1 if n_flagged else 0


if __name__ == "__main__":
    raise SystemExit(main())
