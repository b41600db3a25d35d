#!/usr/bin/env python3
"""Generate tests/fixtures/zstd/dict/* — REAL dictionary-compression
goldens from the reference zstd CLI:

  trained.dict      `zstd --train` over 50 deterministic JSON samples
                    (formatted dictionary: magic, id, entropy tables,
                    repeat offsets, content)
  s07.json/.zst     sample compressed with -19 -D trained.dict
  s23.json/.zst     sample compressed with -1  -D trained.dict
  raw.dict          a raw CONTENT dictionary (no magic)
  s11.json/.zst     sample compressed with -7 -D raw.dict

The from-scratch decoder (operators/zstd_frame.py) must reproduce the
plaintext exactly through the dictionary path: entropy-table seeding,
repeat-offset initialization, and window-prefix matches.
"""

from __future__ import annotations

import pathlib
import random
import subprocess
import tempfile

OUT = pathlib.Path(__file__).resolve().parents[1] / "tests" / "fixtures" / "zstd" / "dict"

WORDS = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
         "golf", "hotel"]


def samples() -> list[bytes]:
    rng = random.Random(3)
    out = []
    for i in range(50):
        doc = {"id": i, "type": "event",
               "payload": " ".join(rng.choices(WORDS, k=30))}
        out.append(str(doc).replace("'", '"').encode())
    return out


if __name__ == "__main__":
    OUT.mkdir(parents=True, exist_ok=True)
    docs = samples()
    with tempfile.TemporaryDirectory() as td:
        tdp = pathlib.Path(td)
        for i, d in enumerate(docs):
            (tdp / f"s{i:02d}.json").write_bytes(d)
        subprocess.run(
            ["zstd", "--train", *sorted(str(p) for p in tdp.glob("s*.json")),
             "-o", str(OUT / "trained.dict"), "-q", "-f"],
            check=True, capture_output=True,
        )
        raw = docs[0] + docs[1] + docs[2]  # raw content dictionary
        (OUT / "raw.dict").write_bytes(raw)
        for name, level, dict_file in (
            ("s07", "-19", OUT / "trained.dict"),
            ("s23", "-1", OUT / "trained.dict"),
            ("s11", "-7", OUT / "raw.dict"),
        ):
            idx = int(name[1:])
            (OUT / f"{name}.json").write_bytes(docs[idx])
            subprocess.run(
                ["zstd", level, "-D", str(dict_file),
                 str(tdp / f"{name}.json"), "-o", str(OUT / f"{name}.zst"),
                 "-q", "-f"],
                check=True, capture_output=True,
            )
    # dictionary-compressed JSONL shards for the jsonl_dict_shards
    # oracle spec: 3 shards x 4 deterministic lines, -D trained.dict
    rng = random.Random(7)
    with tempfile.TemporaryDirectory() as td:
        tdp = pathlib.Path(td)
        for i in range(3):
            lines = []
            for j in range(4):
                doc = {"doc": i * 4 + j, "type": "event",
                       "payload": " ".join(rng.choices(WORDS, k=8))}
                lines.append(str(doc).replace("'", '"'))
            blob = ("\n".join(lines) + "\n").encode()
            (OUT / f"shard{i}.jsonl").write_bytes(blob)
            (tdp / f"shard{i}.jsonl").write_bytes(blob)
            subprocess.run(
                ["zstd", "-9", "-D", str(OUT / "trained.dict"),
                 str(tdp / f"shard{i}.jsonl"),
                 "-o", str(OUT / f"shard{i}.jsonl.zst"), "-q", "-f"],
                check=True, capture_output=True,
            )
    for p in sorted(OUT.iterdir()):
        print(p.name, p.stat().st_size)
