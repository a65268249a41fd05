"""Local replica of the driver's correctness gate: run each __spark_entry__
query and its DuckDB oracle at sf0.01, compare row count + columns +
order-insensitive values."""

from __future__ import annotations

import math
import sys

import duckdb

SF_DIR = "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duck_connection(sf_dir: str = SF_DIR) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    if isinstance(v, bool):
        return str(v)
    try:  # Decimal → float formatting
        import decimal

        if isinstance(v, decimal.Decimal):
            return f"{float(v):.9g}"
    except Exception:
        pass
    return str(v) if v is not None else "\x00NULL"


def normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm_cell(r[i]) for i in order) for r in rows)


def compare_query(spark, con, name, fn, sql, sf_dir=SF_DIR):
    sdf = fn(spark, sf_dir)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    res = con.execute(sql)
    d_cols = [c[0] for c in res.description]
    d_rows = res.fetchall()
    problems = []
    if sorted(s_cols) != sorted(d_cols):
        problems.append(f"columns differ: spark={sorted(s_cols)} duck={sorted(d_cols)}")
    if len(s_rows) != len(d_rows):
        problems.append(f"row count differs: spark={len(s_rows)} duck={len(d_rows)}")
    if not problems:
        ns, nd = normalize(s_rows, s_cols), normalize(d_rows, d_cols)
        if ns != nd:
            diff_s = [r for r in ns if r not in set(nd)][:3]
            diff_d = [r for r in nd if r not in set(ns)][:3]
            problems.append(f"values differ; spark-only={diff_s} duck-only={diff_d}")
    return problems


def main(only=None):
    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entrymod
    from json_schema_py_spark.session import get_spark

    spark = get_spark(cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duck_connection()
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name not in oracles:
            try:
                cnt = fn(spark, SF_DIR).count()
                print(f"{name:28s} ROWS-ONLY   rows={cnt}")
            except Exception as e:
                n_fail += 1
                print(f"{name:28s} ERROR       {type(e).__name__}: {str(e)[:160]}")
            continue
        try:
            problems = compare_query(spark, con, name, fn, oracles[name])
        except Exception as e:
            problems = [f"{type(e).__name__}: {str(e)[:300]}"]
        if problems:
            n_fail += 1
            print(f"{name:28s} MISMATCH")
            for p in problems:
                print(f"    {p}")
        else:
            print(f"{name:28s} OK")
    print(f"\n{'ALL OK' if n_fail == 0 else f'{n_fail} FAILURES'}")
    return n_fail


if __name__ == "__main__":
    raise SystemExit(main(set(sys.argv[1:]) or None))
