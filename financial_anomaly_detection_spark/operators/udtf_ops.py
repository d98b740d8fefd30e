"""Python UDTF surface (SURVEY.md §2.9).

The engine's rule stands: built-in expressions for every hot path
(the production chunker, operators/textops.chunk_text, is pure JVM
higher-order functions). A user-defined TABLE function is still part
of the API surface a Spark engine must support — the escape hatch for
row→many-rows logic no expression tree can state — so this module
ships one real UDTF wired through the LATERAL-join form, with an
exact-agreement pytest against the Catalyst chunker
(tests/test_udtf.py), the same dual-tier discipline as the PQ
encoder's Arrow/Catalyst agreement pin.

Scale notes: a Python UDTF executes in the Python worker pool
(Arrow-batched when spark.sql.execution.pythonUDTF.arrow.enabled is
set); a LATERAL correlated call fans each input row out
partition-locally — no shuffle is introduced, but every row crosses
the JVM↔Python boundary, which is why the Catalyst form is the
default tier and this one is the extension point.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def chunk_text_udtf(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 64,
    overlap: int = 8,
) -> DataFrame:
    """UDTF tier of operators/textops.chunk_text — identical contract
    and output (pinned by test), executed as a Python table function
    in a LATERAL join.

    Tokenization mirrors ``tokens_col`` exactly, including the Spark
    edge case where ``split(trim(''), '\\s+')`` yields one empty
    token (size 1), not an empty array.
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be < chunk_tokens")
    step = chunk_tokens - overlap
    spark = df.sparkSession

    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_idx bigint, chunk_text string, n_chunk_tokens bigint")
    class ChunkDocs:
        def eval(self, text: str):  # noqa: ANN001 - UDTF contract
            stripped = (text or "").strip()
            # Spark's split(trim(x), '\s+') on empty input is [''] —
            # one empty token — never []
            toks = stripped.split() if stripped else [""]
            n = len(toks)
            n_chunks = max(-(-(n - overlap) // step), 1)
            for i in range(n_chunks):
                window = toks[i * step : i * step + chunk_tokens]
                yield i, " ".join(window), min(n - i * step, chunk_tokens)

    spark.udtf.register("chunk_docs_udtf", ChunkDocs)
    view = f"_chunk_udtf_in_{abs(hash((id_col, text_col, chunk_tokens, overlap))) % 10**8}"
    df.select(id_col, text_col).createOrReplaceTempView(view)
    return spark.sql(
        f"""
        SELECT t.{id_col},
               CAST(c.chunk_idx AS BIGINT) AS chunk_idx,
               c.chunk_text,
               CAST(c.n_chunk_tokens AS BIGINT) AS n_chunk_tokens
        FROM {view} t, LATERAL chunk_docs_udtf(t.{text_col}) c
        """
    )


__all__ = ["chunk_text_udtf"]
