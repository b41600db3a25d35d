"""Apply MySQL partial-JSON diffs ({"$json_diff": [...]}) to documents.

The binlog file parser (sources/binlog_file.py) surfaces WL#10570
PARTIAL_JSON after-images as explicit diff documents instead of full
values — the honest wire form, since the binlog genuinely does not
carry the full document. A CDC consumer that maintains state (the
apply-changes snapshot) must MATERIALIZE those diffs against its
current image, exactly like a MySQL replica applies them
(sql/json_diff.cc apply_json_diff; semantics of JSON_REPLACE /
JSON_INSERT / JSON_ARRAY_INSERT / JSON_REMOVE). This module is that
applier: a pure-Python path engine plus the Arrow-batched fold
``apply_changes`` uses on touched keys.

Scale note: diffs only exist on UPDATE ops of JSON columns, and the
fold runs on the merge's touched-key set (already bounded per batch),
never on a full scan — the Python-level work is proportional to
changed rows, like the rest of the merge.
"""

from __future__ import annotations

import json
import re

import pandas as pd

DIFF_KEY = "$json_diff"

_PATH_TOKEN = re.compile(
    r"""\.\s*(?:"((?:[^"\\]|\\.)*)"|([A-Za-z_$][A-Za-z0-9_$]*))  # .member
        |\[\s*(\d+)\s*\]                                         # [index]
    """,
    re.VERBOSE,
)


def parse_path(path: str) -> list:
    """A MySQL JSON path ("$", "$.a.b", '$.a[3]', '$."q key"') into a
    step list: str = object member, int = array index. Raises on
    anything the diff format cannot produce (wildcards, ranges)."""
    if not path.startswith("$"):
        raise ValueError(f"JSON path must start with $: {path!r}")
    steps: list = []
    pos = 1
    while pos < len(path):
        m = _PATH_TOKEN.match(path, pos)
        if not m:
            raise ValueError(f"unsupported JSON path syntax at {pos} in {path!r}")
        if m.group(3) is not None:
            steps.append(int(m.group(3)))
        elif m.group(1) is not None:
            steps.append(re.sub(r"\\(.)", r"\1", m.group(1)))
        else:
            steps.append(m.group(2))
        pos = m.end()
    return steps


def is_diff_doc(text: str | None) -> bool:
    return bool(text) and text.lstrip().startswith('{"' + DIFF_KEY + '"')


def _navigate(doc, steps):
    """Parent container of the addressed slot, or None if any
    intermediate step is missing/mismatched (diff then no-ops, the
    JSON_REPLACE/JSON_REMOVE contract)."""
    cur = doc
    for s in steps[:-1]:
        if isinstance(s, int):
            if not isinstance(cur, list) or s >= len(cur):
                return None
            cur = cur[s]
        else:
            if not isinstance(cur, dict) or s not in cur:
                return None
            cur = cur[s]
    return cur


def apply_diffs(doc, diffs: list) -> object:
    """Fold one diff list into a parsed document; returns the new
    document (the input may be mutated)."""
    for d in diffs:
        op = d["op"]
        steps = parse_path(d["path"])
        if not steps:  # "$": whole-document replace
            if op == "replace":
                doc = d["value"]
            elif op == "remove":
                doc = None
            continue
        parent = _navigate(doc, steps)
        if parent is None:
            continue  # missing intermediate: no-op, like JSON_REPLACE
        last = steps[-1]
        if op == "replace":
            if isinstance(last, int):
                if isinstance(parent, list) and last < len(parent):
                    parent[last] = d["value"]
            elif isinstance(parent, dict) and last in parent:
                parent[last] = d["value"]
        elif op == "insert":
            if isinstance(last, int):
                # JSON_ARRAY_INSERT semantics: insert AT the index,
                # shifting the tail; past-the-end appends
                if isinstance(parent, list):
                    parent.insert(min(last, len(parent)), d["value"])
            elif isinstance(parent, dict) and last not in parent:
                parent[last] = d["value"]
        elif op == "remove":
            if isinstance(last, int):
                if isinstance(parent, list) and last < len(parent):
                    del parent[last]
            elif isinstance(parent, dict):
                parent.pop(last, None)
        else:
            raise ValueError(f"unknown JSON diff op {op!r}")
    return doc


def fold_json_values(start: str | None, values: list) -> str | None:
    """Fold a key's ordered after-image sequence for one JSON column:
    a full document replaces the current value, a diff document
    patches it. Returns compact JSON text (the wire form)."""
    cur = start
    for v in values:
        if v is None:
            cur = None
        elif is_diff_doc(v):
            if cur in (None, ""):
                # a partial-JSON diff against a missing base row is a
                # replica-contract violation (the server only emits
                # diffs when the row existed); fail loud rather than
                # materialize null (ADVICE r7)
                raise ValueError(
                    "partial-JSON diff applied to a missing base "
                    "document (no snapshot value for this key)"
                )
            base = json.loads(cur)
            patched = apply_diffs(base, json.loads(v)[DIFF_KEY])
            cur = json.dumps(patched, separators=(",", ":"), ensure_ascii=False)
        else:
            cur = v
    return cur


def fold_udf():
    """Arrow-batched (old_value, ordered_values) -> materialized value,
    for the apply-changes merge's touched keys."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _fold(old: pd.Series, vals: pd.Series) -> pd.Series:
        out = []
        for o, vs in zip(old, vals):
            seq = list(vs) if vs is not None else []
            out.append(fold_json_values(None if o is None else str(o), seq))
        return pd.Series(out, dtype=object)

    return _fold
