"""Brute-force property tests for plans/breadth_r20.py."""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict

from matt3r_data_ingestion_serverless_spark.plans.breadth_r20 import (
    _TPL_PREFIX,
    _VG_CHECKPOINTS,
    ns_template_mining,
    ns_vocab_growth_curve,
)
from matt3r_data_ingestion_serverless_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE

P31 = 2_147_483_647
B = 1_000_003


def _fp(tokens: list[str]) -> int:
    acc = 7
    for t in tokens[:_TPL_PREFIX]:
        h = int(hashlib.md5(t.encode()).hexdigest()[:15], 16) % P31
        acc = (acc * B + h) % P31
    return acc


def test_template_mining_matches_python(spark):
    docs = load_table(spark, SF_SMOKE, "documents").collect()
    clusters = defaultdict(lambda: [0, set(), None, 0])
    for d in docs:
        toks = d.text.lower().split(" ")
        fp = _fp(toks)
        c = clusters[fp]
        c[0] += 1
        c[1].add(d.source)
        c[2] = d.doc_id if c[2] is None else min(c[2], d.doc_id)
        c[3] += len(toks)
    expected = {
        fp: (n, len(srcs), ex) for fp, (n, srcs, ex, _) in clusters.items() if n >= 3
    }
    got = {
        r.prefix_fp: (r.n_docs, r.n_sources, r.example_doc)
        for r in ns_template_mining(spark, SF_SMOKE).collect()
    }
    assert got == expected


def test_vocab_growth_is_monotone_and_exact(spark):
    docs = load_table(spark, SF_SMOKE, "documents").collect()
    first_seen = {}
    tokens_by_doc = {}
    for d in docs:
        toks = d.text.lower().split(" ")
        tokens_by_doc[d.doc_id] = len(toks)
        for t in toks:
            if t not in first_seen or d.doc_id < first_seen[t]:
                first_seen[t] = d.doc_id
    got = {r.checkpoint: r for r in ns_vocab_growth_curve(spark, SF_SMOKE).collect()}
    prev = 0
    for cp in _VG_CHECKPOINTS:
        if not any(did <= cp for did in tokens_by_doc):
            assert cp not in got
            continue
        vocab = sum(1 for fd in first_seen.values() if fd <= cp)
        mass = sum(n for did, n in tokens_by_doc.items() if did <= cp)
        r = got[cp]
        assert (r.vocab_size, r.tokens_seen) == (vocab, mass), cp
        assert r.vocab_size >= prev  # monotone growth
        prev = r.vocab_size
