#!/usr/bin/env python3
"""Generate tests/fixtures/spanning.ogg — a committed Ogg stream with
packets SPANNING pages (RFC 3533 continuation flags): the layout real
Vorbis comment/setup headers produce on stream open.

One Opus-identified stream, three packets:
  0  the 19-byte OpusHead BOS packet (its own page)
  1  an 1201-byte ASCII packet paginated at a 3-lace cap → spans
     TWO pages (laces [255,255,255] + [255,181]), first page carries
     granule -1 (no packet completes there, per the spec)
  2  a short ASCII tail packet

Expected rows are pinned verbatim in the ``mm_ogg_spanning_packets``
oracle (plans/multimodal_queries.py) — regenerate with this script if
the layout changes, then update the pins (this script prints them).
"""

from __future__ import annotations

import hashlib
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from dolphinbeat_spark.operators.ogg_demux import encode_ogg, parse_ogg  # noqa: E402

HEAD = bytes.fromhex("4f707573486561640102000080bb0000000000")
P1 = (b"S" + b"pan" * 400)  # 1201 bytes
P2 = b"short tail packet"


def build() -> bytes:
    return encode_ogg(
        [{"serial": 11, "packets": [P1, P2], "codec_head": HEAD,
          "granules": [960, 1920, 2880]}],
        packets_per_page=1, max_laces_per_page=3,
    )


if __name__ == "__main__":
    blob = build()
    out = pathlib.Path(__file__).resolve().parents[1] / "tests" / "fixtures" / "spanning.ogg"
    out.write_bytes(blob)
    print(f"wrote {out} ({out.stat().st_size} bytes)")
    (t,) = parse_ogg(blob)
    print("codec", t["codec"], "timescale", t["timescale"])
    for (i, g, off, sz) in t["samples"]:
        parts = (t.get("fragments") or {}).get(i)
        raw = (b"".join(blob[o:o + s] for o, s in parts)
               if parts else blob[off:off + sz])
        print(i, g, sz, len(parts or []) or 1,
              hashlib.md5(raw.hex().encode()).hexdigest())
