"""Driver-contract parity: run every queries() entry on sf0.001 and
compare against its oracle_sql() in DuckDB — row count, sorted column
names, and order-insensitive values (the driver's check, replicated)."""

import math

import duckdb
import pytest

import wned_spark.entry_queries as EQ

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _normalize(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "nan"
                else:
                    v = round(v, 6)
            if isinstance(v, bool):
                v = int(v)
            vals.append(str(v))
        out.append(tuple(vals))
    return sorted(out)


@pytest.mark.parametrize("name", sorted(EQ.oracle_sql().keys()))
def test_query_matches_oracle(spark, name):
    fn = EQ.queries()[name]
    sdf = fn(spark, SF_DIR)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    con = _duck()
    res = con.execute(EQ.oracle_sql()[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(c.lower() for c in spark_cols) == sorted(c.lower() for c in duck_cols), name
    assert len(spark_rows) == len(duck_rows), f"{name}: {len(spark_rows)} vs {len(duck_rows)}"
    assert _normalize(spark_rows, spark_cols) == _normalize(duck_rows, duck_cols), name


@pytest.mark.parametrize("name", sorted(set(EQ.queries()) - set(EQ.oracle_sql())))
def test_rows_only_queries_run(spark, name):
    fn = EQ.queries()[name]
    df = fn(spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
