import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
    from alphalens_spark.session import get_spark

    s = get_spark("tests", shuffle_partitions=4)
    yield s


def rows_to_dict(rows, key_fields, val_field):
    out = {}
    for r in rows:
        k = tuple(r[f] for f in key_fields)
        out[k if len(k) > 1 else k[0]] = r[val_field]
    return out
