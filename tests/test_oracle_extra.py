"""Oracle parity for the SECOND-TIER queries (osmix_spark.queries.EXTRA_*).

The driver's correctness window checks only the 50 first-tier queries; the
extra tier (near-duplicate code paths + the A* distance check) keeps its
DuckDB-oracle evidence HERE so CI pins it every run — same compare as the
driver: row count, sorted-column schema, order-insensitive value hash.
"""

from __future__ import annotations

import hashlib

import duckdb
import pandas as pd
import pytest

from osmix_spark import queries as q

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _canon(df: pd.DataFrame) -> tuple[int, list[str], str]:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if s.dtype.kind == "f":
            df[c] = s.round(6).map(lambda v: repr(float(v)))
        elif s.dtype.kind == "M":
            df[c] = s.astype("datetime64[us]").astype(str)
        else:
            df[c] = s.map(repr)
    rows = sorted(df.itertuples(index=False, name=None))
    return len(rows), list(df.columns), hashlib.sha256(repr(rows).encode()).hexdigest()[:16]


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(q.EXTRA_QUERIES))
def test_extra_query_matches_oracle(spark, sf_dir, duck, name):
    sdf = q.EXTRA_QUERIES[name](spark, sf_dir).toPandas()
    odf = duck.sql(q.EXTRA_ORACLES[name]).df()
    assert _canon(sdf) == _canon(odf), f"{name} diverged from its oracle"


def test_first_tier_fits_driver_window():
    """Exactly the driver-checked budget: every first-tier query must have
    an oracle, and the registry must not grow past the 50-query window
    (new queries either replace a first-tier entry or register extra=True)."""
    assert len(q.QUERIES) <= 50
    assert set(q.QUERIES) == set(q.ORACLES)
    assert set(q.EXTRA_QUERIES) == set(q.EXTRA_ORACLES)
    assert not (set(q.QUERIES) & set(q.EXTRA_QUERIES))
