"""Quantized-first-pass ANN: int8 scoring → exact rerank.

The production two-stage retrieval shape for a 100 TB vector corpus:
score every vector with cheap int8 dot products (4× less memory
traffic than float32, SIMD-friendly integer math), keep a candidate
pool ~3× the requested k, then rerank only the pool with exact float
cosine. Complements the bucketed paths (similarity/lsh.py, ivf.py):
those prune WHICH vectors get scored, this cheapens HOW each one is
scored — real deployments stack both.

Engine-exact by construction, so the DuckDB oracle replays the whole
pipeline rather than assuming it equals brute force:

- codes = floor(x · 127/max|x| + 0.5) — the same engine-neutral
  rounding contract as similarity/quantize.py (round() half-case
  behavior differs across engines; floor(+0.5) does not);
- int_score = Σ qᵢcᵢ over int8-range codes: |score| ≤ d·127² — exact
  in int64 (and in IEEE doubles, which is how SQL list_dot_product
  over floor()-valued lists computes it);
- candidate pool = top-``candidates`` by (int_score DESC, id ASC),
  executed as TakeOrderedAndProject (per-partition heaps, no global
  sort);
- final = exact double cosine over the pool only, round(6).

Quantization happens in an Arrow-batched pandas UDF for the same
reason quantize.py documents: the per-vector scale referenced inside a
JVM higher-order-function lambda is re-evaluated per element (O(d²)
per row); numpy does the batch in O(n·d) with one Arrow transfer and
no shuffle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType

from ..dedup.embedding import cosine_sim_expr


def _int8_codes(x: np.ndarray) -> np.ndarray:
    m = np.max(np.abs(x)) if x.size else 0.0
    if m == 0.0:
        return np.zeros(x.size, dtype=np.int64)
    return np.floor(x * (127.0 / m) + 0.5).astype(np.int64)


def quantized_rerank_topk(
    df: DataFrame,
    query_vec: list[float],
    *,
    id_col: str,
    vec_col: str,
    k: int = 10,
    candidates: int = 30,
) -> DataFrame:
    """(id, int_score, cosine) of the top-``k`` rows by exact cosine
    among the ``candidates``-sized int8-dot-product pool."""
    qc = _int8_codes(np.asarray(query_vec, dtype=np.float64))

    @pandas_udf(LongType())
    def int8_dot(vecs: pd.Series) -> pd.Series:
        out = []
        for v in vecs:
            c = _int8_codes(np.asarray(v, dtype=np.float64))
            out.append(int(c @ qc) if c.size == qc.size else 0)
        return pd.Series(out, dtype="int64")

    q = F.array(*[F.lit(float(x)) for x in query_vec])
    pool = (
        df.select(
            F.col(id_col).alias("id"),
            F.col(vec_col).alias("_v"),
            int8_dot(F.col(vec_col).cast("array<double>")).alias("int_score"),
        )
        .orderBy(F.desc("int_score"), F.asc("id"))
        .limit(candidates)
    )
    return (
        pool.select(
            "id",
            "int_score",
            F.round(cosine_sim_expr(F.col("_v"), q), 6).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc("id"))
        .limit(k)
    )
