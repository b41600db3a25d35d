"""Dump .explain("formatted") for named specs into a directory.

Usage: python tools/dump_plans.py [--executed] OUTDIR SUFFIX [spec ...]

With no spec names, dumps every bench-flagged spec. SUFFIX is
appended to each file name (e.g. "before" -> plans/r16/q1_before.txt).
Default mode is explain-only: nothing executes, so this is safe to run
alongside other work.

--executed (r17, VERDICT #6): RUN each query first (noop sink executes
the df's own QueryExecution via collect()), then dump the formatted
plan of that same QueryExecution — with AQE this is the FINAL plan
(isFinalPlan=true) including ReusedExchange/ReusedSubquery and
AQEShuffleRead nodes, which the pre-execution explain structurally
cannot show (the r16 reuse-cascade claims were unverifiable from
explain-only dumps for exactly this reason).
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from dolphinbeat_spark.plans.registry import all_specs  # noqa: E402
from dolphinbeat_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    executed = args and args[0] == "--executed"
    if executed:
        args = args[1:]
    outdir = Path(args[0])
    suffix = args[1]
    names = args[2:]
    outdir.mkdir(parents=True, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("dump_plans")
    specs = all_specs()
    if not names:
        names = [n for n, s in specs.items() if s.bench]
    for name in names:
        df = specs[name].fn(spark, sf_dir)
        if executed:
            df.collect()  # materializes THIS QueryExecution → AQE-final plan
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        (outdir / f"{name}_{suffix}.txt").write_text(buf.getvalue())
        print(f"wrote {outdir / f'{name}_{suffix}.txt'}")


if __name__ == "__main__":
    main()
