"""Local mirror of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark at sf0.01 and,
where an ``oracle_sql()`` entry exists, the DuckDB oracle on the same
parquet — compares row count, column names/types, and order-insensitive
values (columns sorted by name, rows sorted, values stringified).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, ".")

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from gdal_spark.session import get_spark  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(val):
    if val is None:
        return "NULL"
    if isinstance(val, float):
        if math.isnan(val):
            return "NaN"
        return repr(val)
    if isinstance(val, bytes):
        return val.hex()
    return str(val)


def canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon(r[i]) for i in order) for r in rows]
    out.sort()
    return [cols[i] for i in order], out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            n_fail += 1
            continue
        t1 = time.time()
        if name not in oracles:
            print(f"ok*   {name}: rows={len(srows)} (rows-only, {t1-t0:.1f}s)")
            n_pass += 1
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            n_fail += 1
            continue
        ok = True
        msgs = []
        if len(srows) != len(orows):
            ok = False
            msgs.append(f"rowcount spark={len(srows)} duckdb={len(orows)}")
        if sorted(scols) != sorted(ocols):
            ok = False
            msgs.append(f"cols spark={sorted(scols)} duckdb={sorted(ocols)}")
        if ok:
            _, sc = canon_rows(scols, [tuple(r) for r in srows])
            _, oc = canon_rows(ocols, orows)
            if sc != oc:
                ok = False
                diff = [i for i, (a, b) in enumerate(zip(sc, oc)) if a != b][:3]
                for i in diff:
                    msgs.append(f"row[{i}] spark={sc[i]} duckdb={oc[i]}")
                if not diff:
                    msgs.append("row set diff (extra/missing rows)")
                    extra = set(sc) - set(oc)
                    missing = set(oc) - set(sc)
                    for r in list(extra)[:2]:
                        msgs.append(f"  spark-only: {r}")
                    for r in list(missing)[:2]:
                        msgs.append(f"  duckdb-only: {r}")
        if ok:
            print(f"PASS  {name}: rows={len(srows)} ({t1-t0:.1f}s)")
            n_pass += 1
        else:
            print(f"FAIL  {name}: " + "; ".join(msgs))
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
