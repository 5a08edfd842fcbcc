"""Driver-style oracle check: every SQL-expressible query must match
DuckDB exactly (row count, schema names, order-insensitive values)."""

import math

import duckdb
import pandas as pd
import pytest

SF = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _duck(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con.sql(sql).df()


def _canon(df: pd.DataFrame) -> list[tuple]:
    df = df.reindex(sorted(df.columns), axis=1)
    rows = []
    for row in df.itertuples(index=False):
        canon_row = []
        for v in row:
            if isinstance(v, float):
                canon_row.append(round(v, 6) if not math.isnan(v) else "nan")
            elif isinstance(v, (list, tuple)) or str(type(v)).find("ndarray") >= 0:
                canon_row.append(tuple(v))
            else:
                canon_row.append(v)
        rows.append(tuple(canon_row))
    return sorted(rows, key=repr)


def _to_pandas(obj) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data as rd

    if isinstance(obj, rd.Dataset):
        return obj.to_pandas()
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj


@pytest.fixture(scope="module", autouse=True)
def _ray(ray_session):
    return ray_session


def pairs():
    import __ray_entry__ as entry

    q = entry.queries()
    o = entry.oracle_sql()
    return [(name, q[name], o[name]) for name in sorted(o)]


@pytest.mark.parametrize("name", [p[0] for p in pairs()])
def test_query_matches_oracle(name):
    import __ray_entry__ as entry

    fn = entry.queries()[name]
    sql = entry.oracle_sql()[name]
    got = _to_pandas(fn(SF))
    want = _duck(sql)
    assert len(got) == len(want), (name, len(got), len(want))
    assert sorted(got.columns) == sorted(want.columns), (
        name, sorted(got.columns), sorted(want.columns)
    )
    cg, cw = _canon(got), _canon(want)
    mismatches = [i for i, (a, b) in enumerate(zip(cg, cw)) if a != b]
    assert not mismatches, (name, [(cg[i], cw[i]) for i in mismatches[:3]])
