"""Plan-quality gate as a test: the explain_audit checks (no cartesian
products, no unintended broadcast-NLJ, pruned scans) enforced on the
bench headline specs — locks PLANS.md's promises into the suite."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest

from dolphinbeat_spark.plans.registry import all_specs

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bench_specs():
    return {n: s for n, s in all_specs().items() if s.bench}


def test_bench_plans_are_clean(spark, bench_specs):
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    from explain_audit import _BNLJ_OK, audit

    failures = {}
    for name, spec in sorted(bench_specs.items()):
        buf = io.StringIO()
        with redirect_stdout(buf):
            spec.fn(spark, SF_DIR).explain("formatted")
        problems = audit(name, buf.getvalue())
        if problems:
            failures[name] = problems
    assert not failures, f"plan-quality violations: {failures}"
    assert len(bench_specs) >= 15
