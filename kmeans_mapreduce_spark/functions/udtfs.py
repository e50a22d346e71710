"""Python user-defined table functions (UDTF surface, SURVEY §2.11).

The reference has no user extensibility at all (map/reduce bodies are
compiled-in RPC methods, worker.go:217); Spark's UDTF is the table-
valued end of that missing surface.  Policy unchanged from UDFs: the
hot path stays in Catalyst (posexplode/sequence cover most fan-outs —
see lateral_pos_tokens / generator_order_years); a UDTF is for fan-outs
whose per-row logic genuinely needs Python.

chunk_text is the real-world instance: overlapping token-window
chunking for retrieval/embedding pipelines — stateful per-row logic
(window stride bookkeeping) that has no clean single-expression form.
"""

from __future__ import annotations

from pyspark.sql.functions import lit, udtf


@udtf(returnType="chunk_id: int, n_tokens: int, chunk: string")
class ChunkText:
    """Emit overlapping whitespace-token windows of `size` tokens with
    `overlap` tokens shared between consecutive chunks.

    Deterministic, pure per-row fan-out; the final short window is
    emitted iff it adds at least one new token."""

    def eval(self, text: str, size: int, overlap: int):
        if text is None or size <= 0 or not 0 <= overlap < size:
            return
        toks = [t for t in text.split(" ") if t]
        stride = size - overlap
        cid = 0
        for start in range(0, max(len(toks) - overlap, 1), stride):
            window = toks[start : start + size]
            if not window:
                break
            yield cid, len(window), " ".join(window)
            cid += 1
            if start + size >= len(toks):
                break


@udtf
class NGrams:
    """Token n-grams with a DYNAMIC output schema: `analyze()` (the
    Spark 4 polymorphic-UDTF hook) derives the result columns from the
    constant `n` argument — gram_1..gram_n plus the joined form — so
    callers get typed, named columns without a stringly schema.  This
    is the API surface a generic table function library needs:
    schema-from-arguments, resolved at plan time, not runtime.
    """

    @staticmethod
    def analyze(text, n):
        from pyspark.sql.functions import AnalyzeResult
        from pyspark.sql.types import (
            IntegerType,
            StringType,
            StructType,
        )

        if not isinstance(n.value, int) or n.value < 1:
            raise ValueError("n must be a constant positive int")
        schema = StructType().add("pos", IntegerType())
        for i in range(n.value):
            schema = schema.add(f"gram_{i + 1}", StringType())
        schema = schema.add("ngram", StringType())
        return AnalyzeResult(schema=schema)

    def eval(self, text: str, n: int):
        if text is None:
            return
        toks = [t for t in text.split(" ") if t]
        for pos in range(len(toks) - n + 1):
            window = toks[pos : pos + n]
            yield (pos, *window, " ".join(window))


def chunk_documents(df, text_col: str = "text", size: int = 32, overlap: int = 8):
    """documents -> one row per (doc, chunk): [doc_id, chunk_id,
    n_tokens, chunk].  lateralJoin keeps the doc id beside the UDTF
    fan-out, mirroring LATERAL VIEW."""
    from pyspark.sql import functions as F

    return df.lateralJoin(
        ChunkText(F.col(text_col).outer(), lit(size), lit(overlap))
    ).select("doc_id", "chunk_id", "n_tokens", "chunk")
