"""Every queries() entry runs at sf0.001 (the driver-contract guard).

Complements tools/check_oracle.py (which verifies values vs DuckDB at
sf0.01 but is not part of pytest): any refactor that breaks a query's
ability to RUN fails here.
"""

import pandas as pd
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


def _queries():
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    import __ray_entry__ as e

    return e.queries()


_QUERIES = None


@pytest.fixture(scope="module")
def queries(ray_session):
    global _QUERIES
    if _QUERIES is None:
        _QUERIES = _queries()
    return _QUERIES


def _names():
    # enumerate without initializing ray (names only)
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from schisma_ray.pipelines import catalog

    return sorted(catalog.QUERIES)


@pytest.mark.parametrize("name", _names())
def test_query_runs(queries, name):
    out = queries[name](SF)
    if isinstance(out, pd.DataFrame):
        n = len(out)
    elif isinstance(out, pa.Table):
        n = out.num_rows
    else:
        n = sum(
            b.num_rows for b in out.iter_batches(batch_format="pyarrow", batch_size=65536)
        )
    assert n >= 0
