"""Generate the committed zstd golden fixtures with the REFERENCE
implementation (the system ``zstd`` CLI): deterministic corpora →
``tests/fixtures/zstd/*.zst``.

Run once (and re-run only to refresh): ``python tools/make_zstd_fixtures.py``.
The corpora function is imported by tests/test_zstd_frame.py so the
decode comparison regenerates the exact plaintext — fixtures carry
only the compressed bytes.

Levels 1/3/19 cover the real spread of table modes: level 1 leans on
raw/RLE literals and predefined sequence tables, 3 emits
FSE-compressed tables and 4-stream Huffman literals, 19 adds long
matches, repeat-table mode, and treeless literals blocks.
"""

from __future__ import annotations

import shutil
import struct
import subprocess
from pathlib import Path

FIXDIR = Path(__file__).resolve().parent.parent / "tests" / "fixtures" / "zstd"


def corpora() -> dict[str, bytes]:
    import numpy as np

    rng = np.random.RandomState(0xD0B)
    text = (
        b"the quick brown fox jumps over the lazy dog. "
        b"pack my box with five dozen liquor jugs. "
    )
    rows = b"".join(
        b'{"k":%d,"name":"user_%d","flags":[%d,%d]}\n'
        % (i, i % 97, i % 7, i % 13)
        for i in range(3000)
    )
    return {
        "empty": b"",
        "tiny": b"a",
        "rle": b"z" * 100_000,
        "text": text * 1500,
        "json_rows": rows,
        "random": rng.bytes(65_536),
        "mixed": text * 40 + bytes(rng.bytes(4096)) + b"\x00" * 10_000
        + rows[:20_000],
    }


def main() -> None:
    cli = shutil.which("zstd")
    if cli is None:
        raise SystemExit("zstd CLI not found — fixtures need the reference "
                         "implementation to be meaningful")
    FIXDIR.mkdir(parents=True, exist_ok=True)
    data = corpora()
    for name, blob in data.items():
        for level in (1, 3, 19):
            out = subprocess.run(
                [cli, f"-{level}", "-c"], input=blob,
                capture_output=True, check=True,
            ).stdout
            (FIXDIR / f"{name}.l{level}.zst").write_bytes(out)
    # long-window mode (--long=27 window descriptors)
    out = subprocess.run(
        [cli, "-19", "--long=27", "-c"], input=data["mixed"],
        capture_output=True, check=True,
    ).stdout
    (FIXDIR / "mixed.long27.zst").write_bytes(out)
    # two concatenated frames — decoders must loop
    f1 = subprocess.run([cli, "-3", "-c"], input=data["text"],
                        capture_output=True, check=True).stdout
    f2 = subprocess.run([cli, "-12", "-c"], input=data["json_rows"],
                        capture_output=True, check=True).stdout
    (FIXDIR / "multiframe.zst").write_bytes(f1 + f2)
    # a skippable frame glued ahead of a normal one
    skip = struct.pack("<II", 0x184D2A50, 4) + b"meta"
    (FIXDIR / "with_skippable.zst").write_bytes(skip + f1)
    total = sum(p.stat().st_size for p in FIXDIR.glob("*.zst"))
    print(f"wrote {len(list(FIXDIR.glob('*.zst')))} fixtures, {total} bytes")


if __name__ == "__main__":
    main()
