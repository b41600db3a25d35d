#!/usr/bin/env python3
"""Fresh-process re-run of ONE bench spec against a scaled replica —
the self-proving half of the sf100 attribution story (r14).

Since r10 the occasional above-envelope sf100 wall (q1 especially)
has been attributed to in-bench JVM tail state: the r10 isolation
study measured 54 s fresh-process vs 81 s in-bench on identical
plans, but that study lived in BASELINE.md prose, not in the shipped
artifact. This script IS the isolation: a brand-new driver JVM, one
warm-up + best-of-2 timed runs, plan fingerprint compared against
the reference sf_dir, one JSON line on stdout. bench.py invokes it
automatically for any sf100 spec whose best-of-2 exceeds its
documented envelope and records the result under
``sf100.isolated[<spec>]`` — the attribution becomes measurable in
BENCH_r{N}.json itself instead of a three-round-old narrative.

Usage: python tools/isolated_probe.py <spec> <scaled_dir> <sf_dir>
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    spec_name, scaled_dir, sf_dir = sys.argv[1:4]
    from dolphinbeat_spark.plans.registry import all_specs
    from dolphinbeat_spark.session import get_spark
    from tools.scale_testdata import plan_fingerprint

    spark = get_spark("isolated-probe")
    fn = all_specs()[spec_name].fn
    same_plan = plan_fingerprint(fn(spark, sf_dir)) == plan_fingerprint(
        fn(spark, scaled_dir))
    def steal_jiffies():
        with open("/proc/stat") as f:
            vals = [int(v) for v in f.readline().split()[1:]]
        return (vals[7] if len(vals) > 7 else 0), sum(vals)

    def disk_write_mb():
        # shuffle files and spill land on the same cloud disk; write
        # throughput variance is the remaining IO candidate for the
        # q1-class wall swings (reads measured 0.0 — replica cached)
        total = 0
        try:
            with open("/proc/diskstats") as f:
                for line in f:
                    parts = line.split()
                    if len(parts) > 9 and parts[2][:2] in ("vd", "sd",
                                                           "nv"):
                        total += int(parts[9])
        except OSError:
            return -1.0
        return round(total * 512 / 1e6, 1)

    def disk_read_mb():
        # r16: q1-class sf100 walls vary 2-4x at near-zero steal while
        # the pure-CPU sustained kernel holds ±10%; the variable is
        # how much of the replica's parquet the run re-reads from the
        # (cloud) disk vs page cache. Sum read sectors across real
        # block devices so each run's wall carries its IO footprint.
        total = 0
        try:
            with open("/proc/diskstats") as f:
                for line in f:
                    parts = line.split()
                    if len(parts) > 5 and parts[2][:2] in ("vd", "sd",
                                                           "nv"):
                        total += int(parts[5])
        except OSError:
            return -1.0
        return round(total * 512 / 1e6, 1)

    def cached_gb():
        try:
            with open("/proc/meminfo") as f:
                for line in f:
                    if line.startswith("Cached:"):
                        return round(int(line.split()[1]) / 1e6, 2)
        except OSError:
            pass
        return -1.0

    # r16: the probe measures its OWN sustained-saturation window
    # (bench._CAL_SUSTAINED) right before the timed runs — the factor
    # bench.py uses to normalize this probe's wall, so the envelope
    # verdict reflects the host state of THIS process's window, not
    # the bench process's.
    from bench import _CAL_SUSTAINED, _cal_sustained_kernel
    # short warmup: in a fresh JVM the sustained kernel would
    # otherwise pay executor spin-up + codegen inside its timed
    # window (~6 s measured), biasing the factor low
    spark.range(0, 1_000_000_000, 1, 32).selectExpr(
        "id % 997 AS k", "id % 31 AS v").groupBy("k").agg(
        {"v": "sum"}).collect()
    s0, t0j = steal_jiffies()
    sus_sec = _cal_sustained_kernel(spark)
    s1, t1j = steal_jiffies()
    sustained = {
        "rows": _CAL_SUSTAINED["rows"],
        "sec": round(sus_sec, 3),
        "ref_sec": _CAL_SUSTAINED["ref_sec"],
        "steal_pct": round(100.0 * (s1 - s0) / max(t1j - t0j, 1), 2),
        "factor": round(_CAL_SUSTAINED["ref_sec"] / sus_sec, 4),
    }

    runs = []
    steals = []
    reads = []
    writes = []
    cach = []
    for _ in range(3):  # 1 warm-up + best-of-2, matching sf100_section
        s0, t0j = steal_jiffies()
        r0 = disk_read_mb()
        w0 = disk_write_mb()
        t0 = time.time()
        fn(spark, scaled_dir).write.format("noop").mode("overwrite").save()
        s1, t1j = steal_jiffies()
        runs.append(round(time.time() - t0, 3))
        steals.append(round(100.0 * (s1 - s0) / max(t1j - t0j, 1), 2))
        reads.append(round(disk_read_mb() - r0, 1))
        writes.append(round(disk_write_mb() - w0, 1))
        cach.append(cached_gb())
    print(json.dumps({
        "spec": spec_name,
        "sec": min(runs[1:]),
        "runs": runs,
        "steal_pct_per_run": steals,
        "disk_read_mb_per_run": reads,
        "disk_write_mb_per_run": writes,
        "cached_gb_after_run": cach,
        "same_plan_shape": same_plan,
        "sustained": sustained,
        "load1": round(os.getloadavg()[0], 2),
        "fresh_process": True,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
