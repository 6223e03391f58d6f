"""Document chunking for training pipelines: split long documents into
token-bounded overlapping chunks, preserving per-chunk provenance.

The LLM-data counterpart of the reference's per-region extraction rows —
training corpora are consumed as fixed-budget chunks, not whole documents.
Pure JVM expressions (split → sequence → transform/slice → explode): one
narrow projection, no Python, no shuffle; chunk grids are a deterministic
function of the token count, so replays are byte-identical.

At 10^12 documents this is embarrassingly parallel on scan partitions; the
explode multiplies rows by ~n_tokens/step but each output row is narrow
(the fat source text never crosses a shuffle unless a consumer asks)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 64,
    overlap: int = 8,
) -> DataFrame:
    """(id, text) → (id, chunk_idx, chunk_text, n_tokens): whitespace
    tokens in ``chunk_tokens`` windows stepping ``chunk_tokens - overlap``.
    A trailing short chunk keeps the remainder ONLY when it contributes
    tokens beyond the previous window (a start inside the overlap region
    would duplicate data); empty/NULL texts produce no rows. Tokenization
    is the engine-wide whitespace convention (``split(trim(text),
    '\\s+')``)."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    step = chunk_tokens - overlap
    # materialize the token array BEFORE the transform lambda: an expression
    # captured inside a HOF lambda re-evaluates per element (the split would
    # re-tokenize the document once per chunk — the shingles_of lesson)
    base = df.filter(
        F.col(text_col).isNotNull() & (F.length(F.trim(F.col(text_col))) > 0)
    ).select(F.col(id_col), F.split(F.trim(F.col(text_col)), r"\s+").alias("_toks"))
    toks = F.col("_toks")
    n = F.size(toks)
    # grid stops at n - overlap - 1 (never below 0): a start within the
    # previous window's overlap region would yield a chunk FULLY contained
    # in it — zero new tokens, pure duplicated training data
    last_start = F.greatest(n - overlap - 1, F.lit(0))
    chunks = F.transform(
        F.sequence(F.lit(0), last_start, F.lit(step)),
        lambda s: F.struct(
            F.floor(s / step).cast("int").alias("chunk_idx"),
            F.array_join(F.slice(toks, s + 1, chunk_tokens), " ").alias("chunk_text"),
            F.least(F.lit(chunk_tokens), n - s).cast("int").alias("n_tokens"),
        ),
    )
    return base.select(F.col(id_col), F.explode(chunks).alias("c")).select(
        id_col, "c.chunk_idx", "c.chunk_text", "c.n_tokens"
    )
