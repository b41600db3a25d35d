"""Interleaved A/B of one spec under runtime SQL-conf overrides.

Usage:
  python tools/ab_spec.py SPEC SF_DIR PAIRS conf=val [conf=val ...]

Alternates baseline (session defaults) and variant (with the given
confs set) noop-sink runs in ONE process, PAIRS times, after a shared
warm-up pair — interleaving cancels host phases the way sequential
captures cannot (r16 methodology). Prints one JSON line with all runs
+ steal stamps. Only runtime-settable SQL confs work here; core confs
(e.g. spark.io.compression.codec) need separate processes.
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
    spec_name, sf_dir, pairs = sys.argv[1], sys.argv[2], int(sys.argv[3])
    confs = dict(arg.split("=", 1) for arg in sys.argv[4:])
    spark = get_spark("ab_spec")
    fn = all_specs()[spec_name].fn
    baseline = {k: spark.conf.get(k, None) for k in confs}

    def set_variant(on: bool) -> None:
        for k, v in confs.items():
            if on:
                spark.conf.set(k, v)
            elif baseline[k] is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, baseline[k])

    def run() -> tuple[float, float]:
        jiff = _steal()
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        took = round(time.time() - t0, 3)
        s1 = _steal()
        dt = s1[1] - jiff[1]
        return took, round(100.0 * (s1[0] - jiff[0]) / dt, 2) if dt else 0.0

    # warm-up pair (codegen both plan shapes), discarded
    set_variant(False)
    run()
    set_variant(True)
    run()
    a_runs, b_runs = [], []
    for _ in range(pairs):
        set_variant(False)
        a_runs.append(run())
        set_variant(True)
        b_runs.append(run())
    set_variant(False)
    print(json.dumps({
        "spec": spec_name,
        "sf_dir": sf_dir,
        "confs": confs,
        "baseline_runs": a_runs,
        "variant_runs": b_runs,
        "baseline_best": min(r[0] for r in a_runs),
        "variant_best": min(r[0] for r in b_runs),
        "load1": round(os.getloadavg()[0], 2),
    }))


if __name__ == "__main__":
    main()
