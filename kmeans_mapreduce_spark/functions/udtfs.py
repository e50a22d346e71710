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


def chunk_documents(df, text_col: str = "text", size: int = 32, overlap: int = 8):
    """documents -> one row per (doc, chunk): [doc_id, chunk_id,
    n_tokens, chunk].  lateralJoin keeps the doc id beside the UDTF
    fan-out, mirroring LATERAL VIEW."""
    from pyspark.sql import functions as F

    return df.lateralJoin(
        ChunkText(F.col(text_col).outer(), lit(size), lit(overlap))
    ).select("doc_id", "chunk_id", "n_tokens", "chunk")
