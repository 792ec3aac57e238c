"""Local replica of the driver's correctness gate: run every queries()
entry on Spark AND its oracle_sql() twin on DuckDB at sf0.01; compare
row count, schema (column names, sorted) and an order-insensitive value
hash. Exit nonzero on any mismatch.

Usage:
    python scripts/check_oracle.py [sf_dir] [only_csv]
    python scripts/check_oracle.py --extra [sf_dir] [only_csv]   # extras only
    python scripts/check_oracle.py --all   [sf_dir] [only_csv]   # 50 + 9
"""

from __future__ import annotations

import hashlib
import math
import sys

sys.path.insert(0, "/root/repo")

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


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


def duck_con(sf_dir: str):
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def check_queries(spark, con, sf_dir, qs, sqls, only=None, verbose=True):
    """Run the Spark-vs-DuckDB comparison; return [(name, problem), ...]."""
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:
            failures.append((name, f"spark error: {e}"))
            if verbose:
                print(f"FAIL {name}: spark error: {e}")
            continue
        sql = sqls.get(name)
        if sql is None:
            if verbose:
                print(f"ok   {name}: rows={len(srows)} (no oracle — rows-only)")
            continue
        try:
            cur = con.execute(sql)
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
        except Exception as e:
            failures.append((name, f"duckdb error: {e}"))
            if verbose:
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
                if verbose:
                    so = sorted(
                        "|".join(
                            norm_cell(rr[scols.index(c)]) for c in sorted(scols)
                        )
                        for rr in (tuple(r) for r in srows)
                    )
                    oo = sorted(
                        "|".join(
                            norm_cell(rr[ocols.index(c)]) for c in sorted(ocols)
                        )
                        for rr in orows
                    )
                    for a, b in [(a, b) for a, b in zip(so, oo) if a != b][:3]:
                        print(f"    spark : {a[:160]}")
                        print(f"    duckdb: {b[:160]}")
        if problems:
            failures.append((name, "; ".join(problems)))
            if verbose:
                print(f"FAIL {name}: {'; '.join(problems)}")
        elif verbose:
            print(f"ok   {name}: rows={len(srows)}")
    return failures


def main():
    args = [a for a in sys.argv[1:]]
    mode = "driver"
    if "--extra" in args:
        mode = "extra"
        args.remove("--extra")
    if "--all" in args:
        mode = "all"
        args.remove("--all")
    sf_dir = args[0] if len(args) > 0 else "/root/testdata/sf0.01"
    only = set(args[1].split(",")) if len(args) > 1 else None

    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod
    from navi_spark import extra_queries

    qs, sqls = {}, {}
    if mode in ("driver", "all"):
        qs.update(entrymod.queries())
        sqls.update(entrymod.oracle_sql())
    if mode in ("extra", "all"):
        qs.update(extra_queries.queries())
        sqls.update(extra_queries.oracle_sql())

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "6g")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duck_con(sf_dir)
    failures = check_queries(spark, con, sf_dir, qs, sqls, only)
    n = len([x for x in qs if not only or x in only])
    print(f"\n{n - len(failures)}/{n} queries match")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
