"""Wall-time EVERY registry spec once (r17, VERDICT #4).

The bench times 26 specs; the other ~244 had plan audits but no wall
numbers, so "untouched" was unquantified. This makes the full registry
rankable: per spec, a compile/warm pass then N timed noop-sink runs
with steal stamps, one JSON artifact.

Usage: python tools/time_registry.py OUT.json [SF_DIR] [RUNS]
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from dolphinbeat_spark.plans.registry import all_specs  # noqa: E402
from dolphinbeat_spark.session import get_spark  # noqa: E402


def _steal() -> tuple[int, int]:
    with open("/proc/stat") as f:
        vals = [int(v) for v in f.readline().split()[1:]]
    return (vals[7] if len(vals) > 7 else 0), sum(vals)


def main() -> None:
    out_path = Path(sys.argv[1])
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    n_runs = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    spark = get_spark("time_registry")
    spark.read.parquet(f"{sf_dir}/region.parquet").count()  # warm session
    rows: dict[str, dict] = {}
    specs = all_specs()
    for i, (name, spec) in enumerate(sorted(specs.items())):
        rec: dict = {"bench": bool(spec.bench)}
        try:
            runs = []
            steals = []
            for r in range(1 + n_runs):  # run 0 pays codegen, discarded
                jiff = _steal()
                t0 = time.time()
                spec.fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite").save()
                took = round(time.time() - t0, 3)
                s1 = _steal()
                dt = s1[1] - jiff[1]
                steals.append(
                    round(100.0 * (s1[0] - jiff[0]) / dt, 2) if dt else 0.0)
                runs.append(took)
            rec.update({
                "sec": min(runs[1:]),
                "runs": runs,
                "steal_pct_per_run": steals,
            })
        except Exception as ex:  # noqa: BLE001 - evidence, not a gate
            rec["error"] = f"{type(ex).__name__}: {ex}"[:300]
        rows[name] = rec
        print(f"[{i + 1}/{len(specs)}] {name}: "
              f"{rec.get('sec', rec.get('error'))}", flush=True)
    timed = {n: r["sec"] for n, r in rows.items() if "sec" in r}
    artifact = {
        "sf_dir": sf_dir,
        "n_specs": len(rows),
        "n_timed": len(timed),
        "total_sec": round(sum(timed.values()), 3),
        "load1": round(os.getloadavg()[0], 2),
        "top25": sorted(timed, key=timed.get, reverse=True)[:25],
        "specs": rows,
    }
    out_path.write_text(json.dumps(artifact, indent=1) + "\n")
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
