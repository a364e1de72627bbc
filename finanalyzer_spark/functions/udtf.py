"""Python UDTF surface (Spark 4, Arrow-optimized) — one row in, many
rows out, registered for LATERAL use in SQL.

The reference has no table functions; this rounds out the UDF/UDAF/
UDTF inventory (SURVEY.md §2.9-2.10) with the third kind. The demo
kernel chunks a document into fixed-size token windows — the canonical
LLM-pipeline pre-tokenization step. Where the same shape is expressible
with JVM explode (pack_token_batches is the codegen twin), prefer the
built-in; the UDTF is for genuinely imperative row-expansion logic
(stateful parsers, tokenizer libraries) and runs Arrow-batched
(`useArrow=True`), never row-at-a-time pickling.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf

CHUNK_TOKENS = 64


@udtf(returnType="chunk_no int, n_tokens int, chunk string", useArrow=True)
class ChunkDocument:
    """LATERAL chunk_document(text, size): split a whitespace-token
    stream into consecutive windows of `size` tokens."""

    def eval(self, text: str, size: int):  # noqa: D102 — UDTF contract
        if text is None:
            return
        toks = text.split(" ")
        for i in range(0, len(toks), size):
            window = toks[i : i + size]
            yield (i // size, len(window), " ".join(window))


def register_udtfs(spark: SparkSession) -> None:
    """Idempotently register the UDTF surface on a session."""
    spark.udtf.register("chunk_document", ChunkDocument)
