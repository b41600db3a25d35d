#!/usr/bin/env python3
"""Generate tests/fixtures/zip64.zip — a committed forced-Zip64
archive (maxed 32-bit central-directory fields + 0x0001 extras +
EOCD64 record + locator, APPNOTE 4.3.14/4.3.15/4.5.3): the layout a
>4 GiB or >65 535-member dataset bundle has in the wild, at committed
size.

The generator cross-verifies the written bytes with the STDLIB
zipfile module (an independent ZIP implementation) before writing:
member names and contents must round-trip exactly. The expected
member relation is pinned verbatim in the ``archive_zip64_members``
oracle (plans/multimodal_queries.py).
"""

from __future__ import annotations

import io
import pathlib
import sys
import zipfile

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from dolphinbeat_spark.sources.archives import encode_zip  # noqa: E402

MEMBERS = [
    ("docs/readme.txt", b"zip64 fixture member zero"),
    ("data/shard-00.jsonl", b'{"doc": 0, "text": "alpha bravo"}\n' * 3),
    ("data/shard-01.jsonl", b'{"doc": 1, "text": "charlie delta"}\n' * 3),
    ("bin/pattern.bin", bytes(range(256))),
    ("empty.txt", b""),
]


def build() -> bytes:
    blob = encode_zip(MEMBERS, deflate=True, zip64=True)
    zf = zipfile.ZipFile(io.BytesIO(blob))  # independent reader pin
    got = [(i.filename, zf.read(i)) for i in zf.infolist()]
    assert got == MEMBERS, "stdlib zipfile disagrees with the writer"
    return blob


if __name__ == "__main__":
    out = pathlib.Path(__file__).resolve().parents[1] / "tests" / "fixtures" / "zip64.zip"
    out.write_bytes(build())
    print(f"wrote {out} ({out.stat().st_size} bytes, stdlib-verified)")
