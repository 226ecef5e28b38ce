"""Brute-force property tests for plans/breadth_r78.py."""

from __future__ import annotations

from collections import defaultdict

from matt3r_data_ingestion_serverless_spark.plans.breadth_r78 import (
    _PAGE_SIZE,
    _PAGES,
    _PHRASE,
    keyset_pagination_pages,
    locf_imputation,
    ohlc_daily_bars,
    phrase_match_positional,
)
from matt3r_data_ingestion_serverless_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def test_ohlc_matches_bruteforce(spark):
    ev = load_table(spark, SF_SMOKE, "events").collect()
    days = defaultdict(list)
    for r in ev:
        if r.value is not None:
            days[r.ts.date()].append(
                ((int(r.ts.timestamp() * 1e6), r.event_id), round(r.value * 100))
            )
    rows = {r.day: r for r in ohlc_daily_bars(spark, SF_SMOKE).collect()}
    assert set(rows) == {d.strftime("%Y-%m-%d") for d in days}
    for d, ticks in days.items():
        ticks.sort()
        r = rows[d.strftime("%Y-%m-%d")]
        vals = [v for _, v in ticks]
        assert (r.open_cents, r.close_cents) == (ticks[0][1], ticks[-1][1])
        assert (r.high_cents, r.low_cents) == (max(vals), min(vals))
        assert (r.n_ticks, r.volume_cents) == (len(vals), sum(vals))


def test_phrase_match_matches_bruteforce(spark):
    docs = load_table(spark, SF_SMOKE, "documents").collect()
    want = {}
    for r in docs:
        ws = r.text.split(" ")
        hits = [
            i + 1
            for i in range(len(ws) - 1)
            if ws[i] == _PHRASE[0] and ws[i + 1] == _PHRASE[1]
        ]
        if hits:
            want[r.doc_id] = (len(hits), hits[0], hits[-1])
    got = {
        r.doc_id: (r.n_hits, r.first_pos, r.last_pos)
        for r in phrase_match_positional(spark, SF_SMOKE).collect()
    }
    assert want, "smoke corpus must contain the phrase"
    assert got == want


def test_locf_matches_bruteforce(spark):
    ev = load_table(spark, SF_SMOKE, "events").collect()
    per_user = defaultdict(list)
    for r in ev:
        per_user[r.user_id].append(
            (
                (int(r.ts.timestamp() * 1e6), r.event_id),
                None
                if r.value is None or r.event_id % 7 == 0
                else round(r.value * 100),
            )
        )
    rows = {r.user_id: r for r in locf_imputation(spark, SF_SMOKE).collect()}
    any_missing = False
    for uid, items in per_user.items():
        items.sort()
        last, total, missing, imputed = None, 0, 0, 0
        for _, v in items:
            if v is None:
                missing += 1
                if last is not None:
                    imputed += 1
            else:
                last = v
            if (v if v is not None else last) is not None:
                total += v if v is not None else last
        r = rows[uid]
        assert (r.n_events, r.n_missing, r.n_imputed) == (
            len(items),
            missing,
            imputed,
        )
        assert r.sum_filled_cents == (total if total or last is not None else None)
        any_missing = any_missing or missing > 0
    assert any_missing, "events must contain null values for LOCF to repair"


def test_keyset_pages_match_bruteforce(spark):
    orders = load_table(spark, SF_SMOKE, "orders").collect()
    ranked = sorted(
        ((-round(r.o_totalprice * 100), r.o_orderkey), r) for r in orders
    )[: _PAGE_SIZE * _PAGES]
    got = sorted(
        (r.page, r.cents, r.o_orderkey)
        for r in keyset_pagination_pages(spark, SF_SMOKE).collect()
    )
    want = sorted(
        (i // _PAGE_SIZE + 1, -k[0], k[1]) for i, (k, _) in enumerate(ranked)
    )
    assert got == want
