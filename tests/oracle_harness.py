"""Differential harness: run each __spark_entry__ query against its
DuckDB oracle the way the driver does (row count + columns + order-
insensitive value comparison). Importable from tests and runnable as a
script for a full report."""

from __future__ import annotations

import math

import duckdb

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def duck_connection(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    return v


def compare(spark_df, con, sql: str) -> dict:
    """Returns {'ok': bool, 'detail': str}."""
    sdf = spark_df.toPandas()
    ddf = con.execute(sql).fetchdf()
    out = {"spark_rows": len(sdf), "duck_rows": len(ddf)}
    s_cols, d_cols = sorted(sdf.columns), sorted(ddf.columns)
    if s_cols != d_cols:
        out.update(ok=False, detail=f"columns differ: {s_cols} vs {d_cols}")
        return out
    if len(sdf) != len(ddf):
        out.update(ok=False,
                   detail=f"row count {len(sdf)} vs {len(ddf)}")
        return out
    s_rows = sorted(
        tuple(_norm(v) for v in row)
        for row in sdf[s_cols].itertuples(index=False, name=None))
    d_rows = sorted(
        tuple(_norm(v) for v in row)
        for row in ddf[d_cols].itertuples(index=False, name=None))
    if s_rows != d_rows:
        diffs = [(a, b) for a, b in zip(s_rows, d_rows) if a != b][:3]
        out.update(ok=False, detail=f"values differ, first: {diffs}")
        return out
    out.update(ok=True, detail="match")
    return out


def run_all(spark, sf_dir: str, only: list[str] | None = None) -> dict:
    import __spark_entry__ as E

    con = duck_connection(sf_dir)
    qs, oracles = E.queries(), E.oracle_sql()
    results = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        df = fn(spark, sf_dir)
        if name in oracles:
            try:
                results[name] = compare(df, con, oracles[name])
            except Exception as exc:  # noqa: BLE001
                results[name] = {"ok": False, "detail": f"ERROR {exc}"}
        else:
            n = df.count()
            results[name] = {"ok": n >= 0, "detail": f"rows-only: {n} rows"}
    return results


if __name__ == "__main__":
    import sys

    sys.path.insert(0, "/root/repo")
    from jaccard_ml_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    spark = get_spark(master="local[8]", shuffle_partitions=16)
    res = run_all(spark, sf_dir, only)
    width = max(len(k) for k in res)
    n_bad = 0
    for k, v in res.items():
        mark = "OK " if v["ok"] else "FAIL"
        n_bad += 0 if v["ok"] else 1
        print(f"{mark} {k:<{width}} {v['detail']}"
              f" [{v.get('spark_rows', '-')}/{v.get('duck_rows', '-')}]")
    print(f"{len(res) - n_bad}/{len(res)} queries match")
    sys.exit(1 if n_bad else 0)
