"""Local stand-in for the driver's CORRECTNESS gate.

Runs each registered Spark query and its DuckDB oracle at sf0.01, compares
row count + column names + order-insensitive value hash (stringified, rows
sorted).  Usage: python tools/compare_oracle.py [name ...]
"""

from __future__ import annotations

import hashlib
import sys

import duckdb

sys.path.insert(0, ".")

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()
SF_DIR = "/root/testdata/sf0.01"


def norm_cell(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if v != v:
            return "NULL"
        if v == 0:
            return "0"  # fold -0.0: sign-of-zero differs between engines
        return f"{v:.6f}".rstrip("0").rstrip(".")
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def frame_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x01".join(norm_cell(r[i]) for i in order) for r in rows)
    return hashlib.md5("\n".join(lines).encode()).hexdigest()


def main(names: list[str]) -> int:
    from opentelemetry_collector_components_spark.queries import ORACLE_SQL, SPARK_QUERIES
    from opentelemetry_collector_components_spark.session import get_spark

    spark = get_spark(app_name="oracle-compare", master="local[8]")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    targets = names or sorted(SPARK_QUERIES)
    failures = 0
    for name in targets:
        sdf = SPARK_QUERIES[name](spark, SF_DIR)
        srows = [tuple(r) for r in sdf.collect()]
        scols = sdf.columns
        if name not in ORACLE_SQL:
            print(f"{name:32s} rows-only: {len(srows)} rows (no oracle)")
            continue
        ores = con.sql(ORACLE_SQL[name])
        ocols = [c for c in ores.columns]
        orows = [tuple(r) for r in ores.fetchall()]
        ok_cols = sorted(scols) == sorted(ocols)
        ok_rows = len(srows) == len(orows)
        ok_hash = frame_hash(scols, srows) == frame_hash(ocols, orows)
        status = "OK" if (ok_cols and ok_rows and ok_hash) else "FAIL"
        if status == "FAIL":
            failures += 1
            print(f"{name:32s} {status} cols={ok_cols} rows={len(srows)}/{len(orows)} hash={ok_hash}")
            if not ok_cols:
                print("   spark:", sorted(scols), "\n   duck: ", sorted(ocols))
            elif srows and orows:
                import itertools

                order_s = sorted(range(len(scols)), key=lambda i: scols[i])
                order_o = sorted(range(len(ocols)), key=lambda i: ocols[i])
                ls = sorted("\x01".join(norm_cell(r[i]) for i in order_s) for r in srows)
                lo = sorted("\x01".join(norm_cell(r[i]) for i in order_o) for r in orows)
                for a, b in itertools.islice(
                    ((a, b) for a, b in zip(ls, lo) if a != b), 3
                ):
                    print("   spark:", a.replace("\x01", " | "))
                    print("   duck :", b.replace("\x01", " | "))
        else:
            print(f"{name:32s} OK   ({len(srows)} rows)")
    return failures


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
