"""Python UDTF surface (Spark 4): table-valued functions for row
expansion where Catalyst generators don't fit (per-row Python logic
producing a variable number of typed rows).

The engine prefers explode()/sequence() (JVM) for chunking — see
text_chunking — so the UDTF here covers the escape hatch: a
sentence-splitter with per-sentence stats, the kind of
tokenizer-adjacent logic that would otherwise force a full
mapInPandas round trip.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="sent_idx: int, sentence: string, n_words: int")
class SplitSentences:
    def eval(self, text: str):
        if text is None:
            return
        for i, raw in enumerate(text.replace("!", ".").replace("?", ".").split(".")):
            s = raw.strip()
            if s:
                yield i, s, len(s.split())


def test_udtf_sentence_split(spark):
    spark.udtf.register("split_sentences", SplitSentences)
    rows = spark.sql(
        """
        SELECT t.doc_id, s.sent_idx, s.sentence, s.n_words
        FROM VALUES
            (1, 'Hello world. How are you? Fine!'),
            (2, 'One sentence only'),
            (3, NULL)
            AS t(doc_id, txt),
        LATERAL split_sentences(t.txt) s
        ORDER BY t.doc_id, s.sent_idx
        """
    ).collect()
    got = [(r["doc_id"], r["sent_idx"], r["sentence"], r["n_words"]) for r in rows]
    assert got == [
        (1, 0, "Hello world", 2),
        (1, 1, "How are you", 3),
        (1, 2, "Fine", 1),
        (2, 0, "One sentence only", 3),
    ]
