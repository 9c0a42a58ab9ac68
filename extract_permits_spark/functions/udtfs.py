"""Python user-defined table functions (Spark 3.5+ @udtf).

API-surface completeness, with the honest caveat first: a UDTF is
row-at-a-time Python — the SLOWEST execution path in the engine. Every
operator in this repo's registry deliberately avoids it (posexplode /
transform / mapInPandas cover the same shapes JVM-side or Arrow-batched).
A UDTF earns its place only when the row fan-out logic is genuinely
imperative AND cold-path: ad-hoc parsing in an analyst session, glue in a
notebook, prototyping before the vectorized rewrite.

The example below mirrors text.chunk_documents (the production posexplode
version) so the two can be compared directly in tests — same semantics,
different execution tier.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="chunk_id int, start int, chunk string")
class ChunkWords:
    """Split a document into word chunks of ``size`` words with
    ``overlap`` words carried between consecutive chunks — the LLM
    context-window chunking shape. Yields (chunk_id, word_start, text).
    """

    def eval(self, text: str, size: int, overlap: int):  # noqa: D102
        if text is None or size is None or size <= 0:
            return
        overlap = max(0, min(overlap or 0, size - 1))
        words = [w for w in text.split(" ") if w]
        step = size - overlap
        cid = 0
        for start in range(0, max(len(words), 1), step):
            chunk = words[start : start + size]
            if not chunk:
                break
            yield cid, start, " ".join(chunk)
            cid += 1
            if start + size >= len(words):
                break


def register_udtfs(spark) -> None:
    """Make the UDTFs callable from SQL (``SELECT * FROM chunk_words(...)``)."""
    spark.udtf.register("chunk_words", ChunkWords)
