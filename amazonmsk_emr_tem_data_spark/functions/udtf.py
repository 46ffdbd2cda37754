"""Python UDTF (Spark 4 user-defined table function) surface.

One real table function — overlapping token-window chunking, the
RAG-ingest splitter — registered so it composes in SQL as
``LATERAL chunk_text(text, size, overlap)``. UDTFs are the 1→N row
API that plain UDFs can't express and explode() can't parameterize;
this module exists to keep that Spark 4 surface covered with a tested,
deterministic example (the production chunker for the registry's
oracle-checked pipeline remains queries.doc_chunking — built-in
functions beat Python in the hot path; a UDTF earns its place when the
row-expansion logic needs real Python, e.g. a tokenizer library).

Arrow-optimized (useArrow=True): batches cross the JVM↔Python boundary
columnar, the same transport tier as the pandas UDFs in
operators/multimodal.py.
"""

from __future__ import annotations

from pyspark.sql.functions import lit, udtf
from pyspark.sql.session import SparkSession


@udtf(returnType="chunk_idx int, chunk string, n_tokens int", useArrow=True)
class ChunkText:
    """Overlapping token windows: size tokens per chunk, stepping
    size − overlap. Empty/NULL text yields one empty chunk (row
    identity is preserved — every document produces ≥ 1 chunk, the
    contract downstream packing relies on)."""

    def eval(self, text: str, size: int, overlap: int):  # noqa: D102
        if int(size) <= 0:
            raise ValueError(f"chunk size must be positive, got {size}")
        toks = (text or "").split()
        step = max(1, int(size) - int(overlap))
        if not toks:
            yield 0, "", 0
            return
        idx = 0
        i = 0
        while i < len(toks):
            window = toks[i : i + int(size)]
            yield idx, " ".join(window), len(window)
            if i + int(size) >= len(toks):
                break
            idx += 1
            i += step


def register_udtfs(spark: SparkSession) -> None:
    """Register all module UDTFs on a session (idempotent)."""
    spark.udtf.register("chunk_text", ChunkText)


def chunk_text_df(df, text_col: str, size: int, overlap: int):
    """DataFrame-API form: the input row's columns PLUS one row per
    chunk, via lateralJoin (calling a UDTF with another DataFrame's
    column outside a lateral join leaves the column unresolvable —
    the plan roots at OneRowRelation)."""
    from pyspark.sql.functions import col

    return df.lateralJoin(
        ChunkText(col(text_col).outer(), lit(size), lit(overlap))
    )
