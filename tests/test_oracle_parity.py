"""Driver-gate replica: every catalog query with an oracle must match
DuckDB on names, row count, and values (order-insensitive) — the same
comparison CORRECTNESS_r{N}.json records.

Mirrors the reference's golden-value style
(/root/reference/tests/test_statistical.py:213-215) with the oracle as
the golden source.
"""

from __future__ import annotations

import pytest

from pymfe_spark.plans.catalog import load_catalog
from pymfe_spark.testing import assert_frames_match
from tests.conftest import SF_SMOKE

CATALOG = load_catalog()
WITH_ORACLE = sorted(n for n, e in CATALOG.items() if e.oracle is not None)
ROWS_ONLY = sorted(n for n, e in CATALOG.items() if e.oracle is None)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_query_matches_oracle(spark, duck, name):
    entry = CATALOG[name]
    sdf = entry.fn(spark, SF_SMOKE).toPandas()
    ddf = duck.execute(entry.oracle).df()
    assert_frames_match(sdf, ddf, name)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_query_runs(spark, name):
    entry = CATALOG[name]
    df = entry.fn(spark, SF_SMOKE)
    assert df.count() > 0, f"{name} returned no rows"
    assert len(df.schema.fields) > 0


def test_driver_gate_budget_invariants():
    """The driver records at most 50 queries in name order (round 1
    silently dropped four oracle-backed ones past the cap). Invariants:
    at most 50 gate oracles; every non-gate query carries the zz_
    prefix so ALL gate oracles sort inside the record."""
    gate = sorted(
        n for n, e in CATALOG.items() if e.oracle is not None and e.gate_oracle
    )
    rest = sorted(
        n for n, e in CATALOG.items() if e.oracle is None or not e.gate_oracle
    )
    assert len(gate) <= 50, f"{len(gate)} gate oracles exceed the 50-query record"
    assert all(not n.startswith("zz_") for n in gate)
    assert all(n.startswith("zz_") for n in rest), (
        "non-gate queries must zz_-sort past the cap: "
        f"{[n for n in rest if not n.startswith('zz_')]}"
    )
    assert max(gate) < min(rest)  # every gate oracle inside the record
