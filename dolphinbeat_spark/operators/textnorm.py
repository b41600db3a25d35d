"""Unicode text normalization + cleaning — the canonical-form step a
training pipeline runs before any hashing.

Two byte sequences that RENDER identically must hash identically, or
dedup silently fails: ``é`` as U+00E9 vs ``e``+U+0301 are different
bytes, zero-width characters are invisible but hash-relevant, and C0/
C1 control bytes from broken decoders poison tokenizers. The cleaning
contract here (mirrored exactly by the DuckDB oracle, which ships
``nfc_normalize``):

1. Unicode NFC normalization (canonical composition — the W3C/WHATWG
   recommended interchange form);
2. invisible/control removal: ZERO WIDTH SPACE/NON-JOINER/JOINER
   (U+200B-U+200D), BOM/ZWNBSP (U+FEFF), C0 controls except
   tab/newline, DEL + C1 controls (U+007F-U+009F);
3. NBSP (U+00A0) → plain space.

Counts ride along (``n_removed``) so a corpus health dashboard can
find the shards that needed heavy cleaning.

NFC has no JVM builtin in Spark SQL, so this is a sanctioned Arrow
``mapInPandas`` slow path (map-only; at 100 TB it pipelines with the
scan). Stdlib ``unicodedata`` is the published Unicode character
database — not a codec library.
"""

from __future__ import annotations

import re
import unicodedata
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

#: invisible + control characters removed after NFC (rule 2)
_DROP_RE = re.compile(
    "[\u200b-\u200d\ufeff\x00-\x08\x0b-\x1f\x7f-\x9f]"
)


def clean_text(s: str) -> tuple[str, int]:
    """(cleaned, n_removed) per the module-docstring contract."""
    nfc = unicodedata.normalize("NFC", s)
    dropped = _DROP_RE.sub("", nfc)
    return dropped.replace("\u00a0", " "), len(nfc) - len(dropped)


NORM_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("clean_text", StringType()),
        StructField("n_chars", LongType()),
        StructField("n_removed", LongType()),
    ]
)


def normalize_text(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, text) -> (doc_id, clean_text, n_chars, n_removed) via
    Arrow ``mapInPandas`` — map-only, no shuffle."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for did, s in zip(pdf[id_col], pdf[text_col]):
                cleaned, removed = clean_text(
                    s if isinstance(s, str) else str(s)
                )
                rows.append((did, cleaned, len(cleaned), removed))
            yield pd.DataFrame(
                rows, columns=[f.name for f in NORM_SCHEMA.fields]
            )

    return df.mapInPandas(batches, NORM_SCHEMA)
