"""Brute-force property tests for plans/breadth_r18.py."""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict

from matt3r_data_ingestion_serverless_spark.plans.breadth_r18 import (
    _CDC_MOD,
    funnel_time_to_convert,
    ns_content_defined_chunking,
)
from matt3r_data_ingestion_serverless_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE

P31 = 2_147_483_647
B = 1_000_003


def test_funnel_ttc_matches_python(spark):
    ev = load_table(spark, SF_SMOKE, "events").collect()
    firsts = defaultdict(lambda: [None, None])
    for r in ev:
        us = int(r.ts.timestamp() * 1_000_000)
        f = firsts[r.user_id]
        if r.event_type == "view":
            f[0] = us if f[0] is None else min(f[0], us)
        elif r.event_type == "purchase":
            f[1] = us if f[1] is None else min(f[1], us)
    delays = sorted(
        (f[1] - f[0]) // 60_000_000
        for f in firsts.values()
        if f[0] is not None and f[1] is not None and f[1] > f[0]
    )
    got = {r.q: r for r in funnel_time_to_convert(spark, SF_SMOKE).collect()}
    for q in (0.5, 0.9):
        r = got[q]
        assert r.n_converters == len(delays)
        assert r.minutes_to_convert == delays[math.ceil(q * len(delays)) - 1], q


def _chunks_of(tokens: list[str]) -> list[tuple[int, int]]:
    th = [int(hashlib.md5(t.encode()).hexdigest()[:15], 16) % P31 for t in tokens]
    n = len(th)
    edges = [0] + [i for i in range(1, n) if th[i - 1] % _CDC_MOD == 0] + [n]
    fps = []
    for lo, hi in zip(edges, edges[1:]):
        acc = 7
        for x in th[lo:hi]:
            acc = (acc * B + x) % P31
        fps.append((acc, hi - lo))
    return fps


def test_cdc_chunking_matches_python(spark):
    docs = load_table(spark, SF_SMOKE, "documents").collect()
    counts = defaultdict(lambda: [0, set(), 0])
    for d in docs:
        for fp, ntok in _chunks_of(d.text.lower().split(" ")):
            c = counts[fp]
            c[0] += 1
            c[1].add(d.doc_id)
            c[2] = max(c[2], ntok)
    expected = {
        fp: (n, len(ds), mx) for fp, (n, ds, mx) in counts.items() if n > 1
    }
    got = {
        r.chunk_fp: (r.n_occurrences, r.n_docs, r.n_tokens)
        for r in ns_content_defined_chunking(spark, SF_SMOKE).collect()
    }
    assert got == expected
    assert got  # the fixture's planted near-dups share chunks


def test_cdc_boundary_shift_is_local():
    """The defining CDC property: prepending tokens changes chunking
    only BEFORE the first boundary at/after the edit — downstream
    chunks are identical (what makes edits cheap for storage dedup)."""
    base = [f"w{i}" for i in range(200)]
    edited = ["zzz", "yyy"] + base
    fps_base = [fp for fp, _ in _chunks_of(base)]
    fps_edit = [fp for fp, _ in _chunks_of(edited)]
    # all base chunks except possibly the first must survive the edit
    assert set(fps_base[1:]) <= set(fps_edit)
