#!/usr/bin/env python3
"""Bind every oracle SQL in DuckDB and dump its result column names/types.

Usage: oracle_type_lint.py <sqls.json> <parquet_dir> <out.json>

<sqls.json> is {"query_name": "SELECT ..."}; the tables referenced are
created as views over <parquet_dir>/<table>.parquet (the driver's layout).
Binding only — nothing is executed — so this is cheap even for the heavy
oracles. Output: {"query_name": {"cols": [...], "types": [...]}} or
{"query_name": {"error": "..."}}.

This exists because DuckDB types un-cast integer sums as HUGEINT while
Spark emits BIGINT, and the driver's typed hash then mismatches even when
every value agrees (the q163 class of bug). OracleTypeLintSpec runs this
and compares against each query's Spark schema.
"""
import json
import sys

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main() -> None:
    sqls_path, parquet_dir, out_path = sys.argv[1], sys.argv[2], sys.argv[3]
    with open(sqls_path) as f:
        sqls = json.load(f)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{parquet_dir}/{t}.parquet')"
        )
    out = {}
    for name, sql in sqls.items():
        try:
            rel = con.sql(sql)
            out[name] = {"cols": list(rel.columns),
                         "types": [str(t) for t in rel.types]}
        except Exception as e:  # surface bind failures per query
            out[name] = {"error": f"{type(e).__name__}: {e}"}
    with open(out_path, "w") as f:
        json.dump(out, f)


if __name__ == "__main__":
    main()
