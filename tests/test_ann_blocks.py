"""operators/ann.py: budget-bounded blocked-GEMM sizing (VERDICT r03
next-step 4) and B-invariance of the exact edge list."""

from __future__ import annotations

import math
import random

from pyspark.sql import functions as F

from matt3r_data_ingestion_serverless_spark.operators.ann import (
    _MIN_BLOCKS,
    _TARGET_BLOCK_BYTES,
    blocked_cosine_edges,
    derive_num_blocks,
)

_DIM = 128


def test_block_count_grows_with_corpus_and_bounds_task_memory():
    prev_b = 0
    for n_rows in (1_000, 60_000, 5_000_000, 400_000_000, 30_000_000_000):
        b = derive_num_blocks(n_rows, _DIM)
        assert b >= prev_b, "B must be monotone in corpus size"
        prev_b = b
        per_side = math.ceil(n_rows / b) * _DIM * 8
        # one row of slack for the ceil
        assert per_side <= _TARGET_BLOCK_BYTES + _DIM * 8, (
            f"per-task side {per_side} exceeds budget at n={n_rows}"
        )
    assert derive_num_blocks(10, _DIM) == _MIN_BLOCKS  # parallelism floor
    # 1000× the test corpus: B scales, memory doesn't
    big = derive_num_blocks(60_000_000, _DIM)
    assert big > derive_num_blocks(60_000, _DIM) or big > _MIN_BLOCKS


def test_edges_invariant_to_block_count(spark):
    rng = random.Random(7)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(60)
    ]
    corpus = spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<DOUBLE>")

    def edge_set(nb):
        return {
            (r.u, r.w)
            for r in blocked_cosine_edges(corpus, 0.3, num_blocks=nb).collect()
        }

    e2, e5, derived = edge_set(2), edge_set(5), edge_set(None)
    assert e2 == e5 == derived
    assert e2, "seeded corpus must produce at least one edge"
    assert all(u < w for u, w in e2)
