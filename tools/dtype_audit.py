"""Full dtype-kind audit: Spark result schema vs DuckDB .df() dtypes.

The driver's value-hash sees the pandas representation of the oracle
result. DuckDB's pandas conversion of HUGEINT/DECIMAL is version-
dependent, and pandas renders nullable integer columns as float64 —
so a column whose KIND (int/float/bool/object/datetime) differs
between the Spark result and the oracle result is a latent driver
hash mismatch even when values compare numerically equal.

Usage: python tools/dtype_audit.py [sf_dir] [query ...]
Prints one line per query with kind mismatches. Exit 1 if any.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from oracle_check import duckdb_connect_views  # noqa: E402


def spark_kind(dt: str) -> str:
    if dt in ("tinyint", "smallint", "int", "bigint"):
        return "int"
    if dt in ("float", "double"):
        return "float"
    if dt.startswith("decimal"):
        return "float"
    if dt == "boolean":
        return "bool"
    if dt.startswith("timestamp") or dt == "date":
        return "datetime"
    return "object"


def pandas_kind(dtype) -> str:
    k = dtype.kind
    if k in "iu":
        return "int"
    if k == "f":
        return "float"
    if k == "b":
        return "bool"
    if k == "M":
        return "datetime"
    return "object"


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry_mod
    from alphalens_spark.session import get_spark

    spark = get_spark("dtype_audit")
    con = duckdb_connect_views(sf_dir)

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    n_mismatch = 0
    for name in sorted(queries):
        if only and name not in only:
            continue
        if name not in oracles:
            continue
        try:
            sdf = queries[name](spark, sf_dir)
            skinds = {f.name: spark_kind(f.dataType.simpleString())
                      for f in sdf.schema.fields}
            odf = con.execute(oracles[name]).df()
            okinds = {c: pandas_kind(odf[c].dtype) for c in odf.columns}
        except Exception as e:  # noqa: BLE001
            print(f"{name}: ERROR {type(e).__name__}: {e}")
            n_mismatch += 1
            continue
        bad = [
            f"{c}: spark={skinds[c]} oracle={okinds[c]}"
            for c in skinds
            if c in okinds and skinds[c] != okinds[c]
        ]
        if bad:
            n_mismatch += 1
            print(f"{name}: {'; '.join(bad)}")
    print(f"-- {n_mismatch} queries with kind mismatches")
    return 1 if n_mismatch else 0


if __name__ == "__main__":
    raise SystemExit(main())
