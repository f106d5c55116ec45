"""Python UDTF (user-defined TABLE function) extension point — the
third letter of SURVEY.md §2.9's "UDF / UDAF / UDTF surface".

The reference defines none (its Spark apps are built-ins only); this
engine exposes the Spark 4 UDTF API for row-expanding custom logic
that doesn't fit a generator expression. Like every Python-row path it
is the SLOW lane: the engine's default for chunking is the pure-JVM
expression form (plans/curation_queries.py:doc_chunking); the UDTF twin
below exists to prove the API contract and is value-checked against
the same DuckDB oracle.
"""

from __future__ import annotations

import hashlib
import re

from pyspark.sql.functions import udtf


@udtf(returnType="chunk_idx: bigint, n_tokens: int, chunk_md5: string")
class ChunkTextUDTF:
    """Row-expanding 64-token / stride-48 chunker, semantics identical
    to plans/curation_queries.py:doc_chunking (same tokenization, same
    block math, same md5-of-joined-tokens digest)."""

    CHUNK = 64
    STRIDE = 48

    def eval(self, text: str):  # noqa: D102
        if text is None:
            return
        toks = re.split(r"\s+", text.strip().lower())
        n = len(toks)
        import math

        last = max(math.ceil((n - self.CHUNK) / self.STRIDE), 0)
        for idx in range(last + 1):
            piece = toks[idx * self.STRIDE : idx * self.STRIDE + self.CHUNK]
            digest = hashlib.md5(" ".join(piece).encode("utf-8")).hexdigest()
            yield idx, len(piece), digest
