"""Driver-contract conformance: every queries() entry runs at sf0.001
and matches its oracle_sql() via DuckDB, the same comparison the driver
performs at sf0.01 (row-count + schema + order-insensitive values)."""

import duckdb
import pandas as pd
import pytest

from tests.conftest import SF_SMALL

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _con(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _to_df(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


@pytest.mark.parametrize("name", [
    "transcripts_parse",
    "transcripts_route",
    "transcripts_sink_counts",
    "transcripts_tenant_counts",
    "transcripts_heartbeat_stats",
    "transcripts_first_turn",
])
def test_query_matches_oracle(ray_session, name):
    import __ray_entry__ as e

    q = e.queries()[name]
    sql = e.oracle_sql()[name]
    ray_df = _to_df(q(SF_SMALL))
    duck_df = _con(SF_SMALL).execute(sql).df()

    assert sorted(ray_df.columns) == sorted(duck_df.columns), name
    assert len(ray_df) == len(duck_df), name
    cols = sorted(ray_df.columns)
    a = ray_df[cols].sort_values(cols).reset_index(drop=True)
    b = duck_df[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_entry_smoke(ray_session):
    import __ray_entry__ as e

    ds = e.entry()
    assert ds.count() > 0
    assert "sink" in [f.name for f in ds.schema().base_schema]


def test_registry_consistency():
    """Every oracle_sql() key must name a registered query (a typo here
    silently downgrades a query to rows-only in the driver scorecard),
    and every SQL string must at least parse against the sf0.001 views."""
    import __ray_entry__ as e

    qs = e.queries()
    sqls = e.oracle_sql()
    missing = set(sqls) - set(qs)
    assert not missing, missing
    con = _con(SF_SMALL)
    for name, sql in sqls.items():
        con.execute(f"EXPLAIN {sql}")  # parse + bind only, no execution
