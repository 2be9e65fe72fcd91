"""Local mirror of the driver's correctness gate: run every queries() entry
at sf0.001 and compare rows against the DuckDB oracle (count + sorted
values). The driver runs the same comparison at sf0.01."""

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
# index-reading oracles (ivf_topk) must point at the same SF as the
# queries; the driver's gate leaves this unset and gets its sf0.01 default
os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = SF_DIR
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return con


def normalize(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                v = round(v, 9)
                if v == -0.0:
                    v = 0.0
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=repr)
    return out


ORACLES = entrymod.oracle_sql()
QUERIES = entrymod.queries()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, ddb, name):
    df = QUERIES[name](spark, SF_DIR)
    got_cols = df.columns
    got = normalize([tuple(r) for r in df.collect()], got_cols)
    if name not in ORACLES:
        assert len(got) >= 0  # rows-only check, like the driver
        return
    res = ddb.execute(ORACLES[name])
    exp_cols = [d[0] for d in res.description]
    exp = normalize(res.fetchall(), exp_cols)
    assert sorted(got_cols) == sorted(exp_cols), f"{name} schema mismatch"
    assert len(got) == len(exp), f"{name}: {len(got)} vs {len(exp)} rows"
    mism = [(g, e) for g, e in zip(got, exp) if g != e]
    assert not mism, f"{name}: first mismatches {mism[:5]}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
