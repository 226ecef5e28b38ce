"""Blocked-BLAS dense similarity scoring (SURVEY §7.2 M5 north-star;
SCALE.md §4 "Python boundary").

Dense all-pairs cosine is the one workload where a Catalyst
zip_with/aggregate fold loses to Arrow + BLAS by an order of magnitude:
the fold evaluates one generated-code multiply-add per element per
pair, while a matmul over an Arrow batch runs vendored SIMD kernels.
This module is the mapInPandas escape hatch for exactly that case —
the QUERY side (a small filtered subset, the same side the pure-column
variant broadcasts with F.broadcast) ships to every task once; the
CORPUS side streams through in Arrow batches and never shuffles.

Scale stance (100 TB): cost is corpus_rows × n_queries × dim flops,
linear in the corpus with a small broadcast — the same asymptotics as
the broadcast-nested-loop plan it replaces, just with a vastly better
constant. For corpus×corpus pairing, use the SRP-LSH bucketed variant
(plans/northstar.py:ns_embedding_neardup_lsh); this path is the
recall/score oracle over a query subset.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType, StructField, StructType

PAIR_SCHEMA = StructType(
    [
        StructField("query_id", LongType()),
        StructField("match_id", LongType()),
        StructField("cos_sim", DoubleType()),
    ]
)


def blocked_cosine_pairs(
    corpus: DataFrame,
    queries: DataFrame,
    threshold: float,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All (query, corpus) pairs with round(cosine, 6) ≥ ``threshold``,
    excluding self-pairs. ``queries`` must be small enough to broadcast
    (it is collected via Arrow and task-broadcast, like a broadcast
    join's build side). Output matches the pure-column broadcast-join
    formulation row for row — rounding to 6 decimals absorbs the
    summation-order difference between BLAS and a sequential fold."""
    qpd = queries.select(id_col, vec_col).toPandas()
    q_ids = qpd[id_col].to_numpy(dtype=np.int64)
    q_mat = np.stack(qpd[vec_col].to_numpy()).astype(np.float64)
    q_nrm = np.linalg.norm(q_mat, axis=1)
    sc = corpus.sparkSession.sparkContext
    bc = sc.broadcast((q_ids, q_mat, q_nrm))

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids_q, mat_q, nrm_q = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            ids_c = pdf[id_col].to_numpy(dtype=np.int64)
            mat_c = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            nrm_c = np.linalg.norm(mat_c, axis=1)
            # (batch × dim) @ (dim × nq) — the BLAS call the fold can't be
            sims = (mat_c @ mat_q.T) / np.outer(nrm_c, nrm_q)
            sims = np.round(sims, 6)
            keep = (sims >= threshold) & (ids_c[:, None] != ids_q[None, :])
            ci, qi = np.nonzero(keep)
            yield pd.DataFrame(
                {
                    "query_id": ids_q[qi],
                    "match_id": ids_c[ci],
                    "cos_sim": sims[ci, qi],
                }
            )

    return corpus.select(id_col, vec_col).mapInPandas(score, PAIR_SCHEMA)
