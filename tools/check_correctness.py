"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on
DuckDB over the same parquet tables, then compares row count, sorted
column names, and the full sorted value multiset (STRICTER than the
driver's hash — if this passes, any order-insensitive hash passes).

Usage:  python tools/check_correctness.py [sf_dir] [name_filter...]
        SPARK_GRAFT_CHECK_ORDER=1  additionally requires IDENTICAL row
        ORDER between engines (covers an order-sensitive driver hash;
        every spec carries unique ORDER BY tie-breaks so this passes)
        SPARK_GRAFT_CHECK_JSON=<path>  additionally writes a per-spec
        JSON artifact (the committed CORRECTNESS_local_r{N}.json —
        the guard for specs outside the driver's sample window)
"""

from __future__ import annotations

import math
import os
import sys
import time
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from dolphinbeat_spark.catalog import TABLES
from dolphinbeat_spark.session import get_spark


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def _canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    name_filter = sys.argv[2:]

    import __spark_entry__ as e

    qs, oracles = e.queries(), e.oracle_sql()
    spark = get_spark("check_correctness")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    n_pass = n_fail = n_rows_only = 0
    results: dict[str, dict] = {}
    for name, fn in sorted(qs.items()):
        if name_filter and not any(f in name for f in name_filter):
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {type(ex).__name__}: {ex}")
            results[name] = {"status": "fail", "err": f"spark: {type(ex).__name__}: {ex}"}
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(srows)} rows  [{time.time()-t0:.1f}s]")
            results[name] = {"status": "rows-only", "spark_rows": len(srows),
                             "sec": round(time.time() - t0, 1)}
            n_rows_only += 1
            continue
        try:
            ddf = con.sql(oracles[name])
            dcols = ddf.columns
            dtypes = [str(t).upper() for t in ddf.types]
            drows = ddf.fetchall()
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {type(ex).__name__}: {ex}")
            results[name] = {"status": "fail", "err": f"duckdb: {type(ex).__name__}: {ex}"}
            n_fail += 1
            continue
        problems = []
        # Guard: the driver's value hash is TYPE-SENSITIVE. DuckDB widens
        # SUM/count_if over BIGINT to HUGEINT (int128), which Spark never
        # emits — such an oracle "passes" our stringified comparison but
        # hash-fails at the driver. Ban the type class outright.
        bad_types = [
            f"{c}:{t}"
            for c, t in zip(dcols, dtypes)
            if "HUGEINT" in t or "INT128" in t
        ]
        if bad_types:
            problems.append(
                f"oracle emits HUGEINT (driver hash-fail class) — add CAST(... AS BIGINT): {bad_types}"
            )
        if len(srows) != len(drows):
            problems.append(f"rowcount spark={len(srows)} duckdb={len(drows)}")
        if sorted(scols) != sorted(c.lower() for c in dcols) and sorted(
            c.lower() for c in scols
        ) != sorted(c.lower() for c in dcols):
            problems.append(f"columns spark={sorted(scols)} duckdb={sorted(dcols)}")
        if not problems and os.environ.get("SPARK_GRAFT_CHECK_ORDER") == "1":
            order = sorted(range(len(scols)), key=lambda i: scols[i])
            s_seq = [tuple(_norm(r[i]) for i in order) for r in srows]
            dmap = {c.lower(): i for i, c in enumerate(dcols)}
            d_order = [dmap[scols[i].lower()] for i in order]
            d_seq = [tuple(_norm(r[i]) for i in d_order) for r in drows]
            if s_seq != d_seq:
                di = next((i for i, (a, b) in enumerate(zip(s_seq, d_seq)) if a != b), 0)
                problems.append(f"ROW ORDER differs at row {di}")
        if not problems:
            sc, dc = _canon(srows, scols), _canon(drows, [c.lower() for c in dcols])
            if sc != dc:
                diff = next(
                    (i for i, (a, b) in enumerate(zip(sc, dc)) if a != b), min(len(sc), len(dc))
                )
                problems.append(
                    f"values differ at sorted-row {diff}:\n  spark : {sc[diff] if diff < len(sc) else '<none>'}\n  duckdb: {dc[diff] if diff < len(dc) else '<none>'}"
                )
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            results[name] = {"status": "fail", "err": "; ".join(problems),
                             "spark_rows": len(srows), "oracle_rows": len(drows)}
            n_fail += 1
        else:
            print(f"PASS {name}: {len(srows)} rows  [{time.time()-t0:.1f}s]")
            results[name] = {"status": "pass", "spark_rows": len(srows),
                             "oracle_rows": len(drows),
                             "sec": round(time.time() - t0, 1)}
            n_pass += 1

    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    if out_path := os.environ.get("SPARK_GRAFT_CHECK_JSON"):
        import json

        Path(out_path).write_text(json.dumps(
            {
                "sf_dir": sf_dir,
                "order_strict": os.environ.get("SPARK_GRAFT_CHECK_ORDER") == "1",
                "n_pass": n_pass, "n_fail": n_fail, "n_rows_only": n_rows_only,
                "specs": results,
            },
            indent=1,
        ) + "\n")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
