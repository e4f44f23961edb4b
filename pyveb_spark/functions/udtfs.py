"""Python user-defined table functions (Spark 4 UDTF API).

Completes the §2.12 surface matrix: scalar exprs (native), Arrow batch maps
(mapInPandas), grouped maps (applyInPandas / cogroup), and — here — TABLE
functions: one input row → many output rows, usable from both the DataFrame
API and SQL (``SELECT t.* FROM docs, LATERAL chunk_text(text, 12) t``).

A UDTF is the right tool when the fan-out logic is genuinely imperative
Python; when a Catalyst expression exists (``explode``/``posexplode`` +
``slice``, as in ``dedup.chunk_stats``) the native form wins — same rule as
everywhere else in this engine. ``ChunkText`` intentionally mirrors
``chunk_stats``'s chunking so tests can pin UDTF == native equivalence.

Scale: UDTFs run per-partition on executors (Arrow-batched in/out); no
driver state, no shuffle beyond what the query adds.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf

__all__ = ["ChunkText", "register_udtfs"]


@udtf(returnType="chunk_id int, chunk string")
class ChunkText:
    """Explode a document into fixed-size token chunks:
    ``chunk_text(text, chunk_tokens)`` → (chunk_id, chunk) rows.
    Empty/NULL text yields a single empty chunk (parity with
    ``split('')`` semantics in the native path)."""

    def eval(self, text: str, chunk_tokens: int):
        toks = (text or "").split(" ")
        n = max(int(chunk_tokens), 1)
        for i in range(0, len(toks), n):
            yield i // n, " ".join(toks[i : i + n])


def register_udtfs(spark) -> None:
    """Register every engine UDTF for SQL use (idempotent per session)."""
    spark.udtf.register("chunk_text", ChunkText)
