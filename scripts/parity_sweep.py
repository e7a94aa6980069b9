"""Full-registry oracle parity sweep at an arbitrary SF — driver-shaped.

Runs EVERY `queries()` entry against its `oracle_sql()` in DuckDB at the
given SF dir (default sf0.01, the driver's correctness SF), comparing the
way the driver does: columns sorted by name, order-insensitive stringified
rows.  `tests/test_oracle_parity.py` does the same at sf0.001 inside the
pytest suite; this script is the pre-flight for the driver's sf0.01 run.

Usage:
    python scripts/parity_sweep.py [sf_dir] [--only name1,name2] [--json out]
Prints one line per query (PASS/FAIL + row count + seconds) and a summary;
exits non-zero on any mismatch. ``--json`` additionally writes a
machine-readable artifact (the committed PARITY_SELF_r{N}.json files).
"""

from __future__ import annotations

import json
import math
import sys
import time

import duckdb

sys.path.insert(0, ".")

import __spark_entry__ as entrymod  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _duck(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return str(v)


def _norm_rows(columns, rows):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted(tuple(_norm_cell(row[i]) for i in order) for row in rows)


def main() -> int:
    sf_dir = "/root/testdata/sf0.01"
    only = None
    json_out = None
    args = sys.argv[1:]
    while args:
        a = args.pop(0)
        if a == "--only":
            only = set(args.pop(0).split(","))
        elif a == "--json":
            json_out = args.pop(0)
        else:
            sf_dir = a

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("parity-sweep")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "8g")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    con = _duck(sf_dir)

    names = [n for n in qs if only is None or n in only]
    failures = []
    results = {}
    t_all = time.time()
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
            if name not in oracles:
                print(f"  {name:40s} NO-ORACLE rows={len(s_rows)}")
                continue
            res = con.execute(oracles[name])
            o_cols = [d[0] for d in res.description]
            o_rows = res.fetchall()
            ok_cols = sorted(s_cols) == sorted(o_cols)
            sn, on = _norm_rows(s_cols, s_rows), _norm_rows(o_cols, o_rows)
            ok = ok_cols and sn == on
            dt = time.time() - t0
            results[name] = {
                "pass": bool(ok),
                "rows_spark": len(s_rows),
                "rows_oracle": len(o_rows),
                "sec": round(dt, 2),
            }
            print(
                f"  {name:40s} {'PASS' if ok else 'FAIL'} "
                f"rows={len(s_rows)}/{len(o_rows)} {dt:5.1f}s"
            )
            if not ok:
                failures.append(name)
                if not ok_cols:
                    print(f"    cols spark={sorted(s_cols)} oracle={sorted(o_cols)}")
                else:
                    diff_s = [r for r in sn if r not in set(on)][:3]
                    diff_o = [r for r in on if r not in set(sn)][:3]
                    print(f"    spark-only={diff_s}")
                    print(f"    oracle-only={diff_o}")
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            results[name] = {"pass": False, "error": f"{type(exc).__name__}: {exc}"}
            print(f"  {name:40s} ERROR {type(exc).__name__}: {exc}")
    print(
        f"== {len(names) - len(failures)}/{len(names)} pass at {sf_dir} "
        f"in {time.time() - t_all:.0f}s"
    )
    if failures:
        print("FAILURES:", ",".join(failures))
    if json_out:
        artifact = {
            "sf_dir": sf_dir,
            "n_queries": len(names),
            "n_pass": len(names) - len(failures),
            "harness": "driver-shaped: columns sorted by name, "
            "order-insensitive stringified rows",
            "results": results,
        }
        with open(json_out, "w") as fh:
            json.dump(artifact, fh, indent=1, sort_keys=True)
        print(f"wrote {json_out}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
