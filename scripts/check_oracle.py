"""Local replica of the driver's correctness gate: run every queries()
entry on Spark AND its oracle_sql() twin on DuckDB at sf0.01; compare
row count, schema (column names, sorted) and an order-insensitive value
hash. Exit nonzero on any mismatch."""

from __future__ import annotations

import hashlib
import math
import sys

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return f"{float(v):.9g}"
    except ImportError:
        pass
    return str(v)


def value_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x1f".join(norm_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "6g")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )

    qs = entrymod.queries()
    sqls = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        try:
            sdf = fn(spark, SF_DIR)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:
            failures.append((name, f"spark error: {e}"))
            print(f"FAIL {name}: spark error: {e}")
            continue
        sql = sqls.get(name)
        if sql is None:
            print(f"ok   {name}: rows={len(srows)} (no oracle — rows-only)")
            continue
        try:
            cur = con.execute(sql)
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
        except Exception as e:
            failures.append((name, f"duckdb error: {e}"))
            print(f"FAIL {name}: duckdb error: {e}")
            continue
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rows {len(srows)} vs {len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols {sorted(scols)} vs {sorted(ocols)}")
        else:
            sh = value_hash(scols, [tuple(r) for r in srows])
            oh = value_hash(ocols, orows)
            if sh != oh:
                problems.append("value-hash mismatch")
                # show a small diff
                so = sorted(
                    ["|".join(norm_cell(x) for x in r) for r in
                     [tuple(rr[scols.index(c)] for c in sorted(scols)) for rr in
                      [tuple(r) for r in srows]]]
                )
                oo = sorted(
                    ["|".join(norm_cell(x) for x in r) for r in
                     [tuple(rr[ocols.index(c)] for c in sorted(ocols)) for rr in orows]]
                )
                diff = [(a, b) for a, b in zip(so, oo) if a != b][:3]
                for a, b in diff:
                    print(f"    spark : {a[:160]}")
                    print(f"    duckdb: {b[:160]}")
        if problems:
            failures.append((name, "; ".join(problems)))
            print(f"FAIL {name}: {'; '.join(problems)}")
        else:
            print(f"ok   {name}: rows={len(srows)}")

    print(f"\n{len(qs) - len(failures)}/{len(qs)} queries match")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
