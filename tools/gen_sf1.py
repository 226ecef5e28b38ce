"""Generate sf1 fixtures (10x sf0.1) for the scale-sensitivity sweep
(VERDICT r05 next-step 5 / r04 #6).

The driver's testdata generator is not available, so this regenerates
the same SCHEMA with distributions measured from /root/testdata/sf0.1
(see the per-table notes below). Correctness at sf1 does not depend on
distributional fidelity — Spark and DuckDB read the SAME parquet — but
threshold sensitivity does: the point of the sweep is that the ~30
data-calibrated constants (setsim tau, LSH bands, DBSCAN eps, histogram
edges) still produce NON-VACUOUS, hash-matching results at 10x the
rows, so the shapes below match the measured originals:

- documents: 10..100 words uniform from the same 31-token vocab,
  lang {en .41, zh/es/fr .15, de .14}, 20 sources; 0.16% exact
  duplicates planted (sf0.1 has 8/5000) plus 0.2% single-token-edit
  near-dups so the jaccard >= 0.8 family keeps non-trivial rows.
- embeddings: iid unit-norm N(0,1)^64 float32, labels uniform 0..9 —
  measured sf0.1 within-label cosine == between-label (~0), i.e. the
  similarity thresholds are calibrated to the natural random tail
  (P[cos >= 0.4] ~ 7e-4/pair at dim 64), which scales with n^2.
- events: 1M rows over 2024-01-01..31, 15k users (events/user held at
  ~67), 5 uniform types, value ~ Exp(mean 50) 2dp (measured: mean 50,
  max ~ 500 at 100k rows), props {"k": 0..99}.
- TPC-H-ish star: same key ranges x10, same enums, uniform money at
  integer cents, lineitem lines/order uniform 1..7, shipdate =
  orderdate + 1..95 days.

Scale note: relational + stream tables are a full 10x (lineitem 6M,
orders 1.5M, events 1M). documents (4x = 20k) and embeddings (3x =
6k) are bounded by the ORACLE's cost, not the engine's: several
threshold queries are graded against brute-force pair-join DuckDB SQL
that is O(n^2) in those tables (e.g. the 31-token vocab saturates the
3-gram shingle space, so the oracle's inverted-index join grows
quadratically); 4x docs is a 16x pair-count stress, which is the
signal the sweep needs.

Writes to the directory given as argv[1] (default /root/repo/.sf1data).
Deterministic: numpy PCG64 seed 4242. Not committed (gitignored) — the
committed artifacts are this script and CORRECTNESS_sf1.json.
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.sf1data"
# SCALE 10 = sf1 (the default, byte-identical to the round-5 fixtures);
# SCALE 100 = sf10 for the magnitude-prone sweep (VERDICT r08 #4) —
# relational + events scale linearly, documents/embeddings stay at the
# oracle-bounded sf1 sizes (they are not in the magnitude family).
SCALE = int(sys.argv[2]) if len(sys.argv) > 2 else 10
MULT = SCALE // 10
rng = np.random.default_rng(4242)

DAY_US = 86_400_000_000


def write(name: str, table: pa.Table) -> None:
    pq.write_table(table, os.path.join(OUT, f"{name}.parquet"))
    print(name, table.num_rows)


def ts_us(arr_us: np.ndarray) -> pa.Array:
    return pa.array(arr_us.astype("datetime64[us]"), type=pa.timestamp("us"))


def cents(lo: float, hi: float, n: int) -> np.ndarray:
    return rng.integers(int(lo * 100), int(hi * 100) + 1, n) / 100.0


def main() -> None:
    os.makedirs(OUT, exist_ok=True)

    # region / nation: fixed dimensions — copy verbatim from sf0.1
    for t in ("region", "nation"):
        tb = pq.read_table(os.path.join(SRC, f"{t}.parquet"))
        write(t, tb)

    n_cust, n_supp, n_part = 150_000 * MULT, 10_000 * MULT, 200_000 * MULT
    n_orders, n_events = 1_500_000 * MULT, 1_000_000 * MULT
    n_users = 15_000 * MULT
    n_docs, n_vecs = 20_000, 6_000

    # customer -----------------------------------------------------------
    segs = np.array(["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"])
    write(
        "customer",
        pa.table(
            {
                "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
                "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
                "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
                "c_acctbal": cents(-1000, 10_000, n_cust),
                "c_mktsegment": segs[rng.integers(0, 5, n_cust)],
            }
        ),
    )

    # supplier -----------------------------------------------------------
    write(
        "supplier",
        pa.table(
            {
                "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
                "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
                "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
                "s_acctbal": cents(-1000, 10_000, n_supp),
            }
        ),
    )

    # part ----------------------------------------------------------------
    names = [
        r[0]
        for r in duckdb.sql(
            f"select distinct p_name from '{SRC}/part.parquet' order by 1"
        ).fetchall()
    ]
    types = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
    pname = np.array(names)[rng.integers(0, len(names), n_part)]
    write(
        "part",
        pa.table(
            {
                "p_partkey": pa.array(np.arange(n_part), pa.int64()),
                "p_name": pname,
                "p_brand": np.array([f"Brand#{b}" for b in range(25)])[
                    rng.integers(0, 25, n_part)
                ],
                "p_type": np.array(types)[rng.integers(0, 6, n_part)],
                "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
                "p_retailprice": 900.0 + (np.arange(n_part) % 1000) / 10.0,
            }
        ),
    )

    # orders ----------------------------------------------------------------
    d0 = np.datetime64("1995-01-01").astype("datetime64[us]").astype(np.int64)
    d1 = np.datetime64("2001-08-01").astype("datetime64[us]").astype(np.int64)
    odate_us = (
        d0 + rng.integers(0, (d1 - d0) // DAY_US + 1, n_orders) * DAY_US
    )
    write(
        "orders",
        pa.table(
            {
                "o_orderkey": pa.array(np.arange(n_orders), pa.int64()),
                "o_custkey": pa.array(rng.integers(0, n_cust, n_orders), pa.int64()),
                "o_orderstatus": np.array(["O", "P", "F"])[
                    rng.integers(0, 3, n_orders)
                ],
                "o_totalprice": cents(1000, 500_000, n_orders),
                "o_orderdate": ts_us(odate_us),
                "o_orderpriority": np.array(
                    [
                        "1-URGENT",
                        "2-HIGH",
                        "3-MEDIUM",
                        "4-NOT SPECIFIED",
                        "5-LOW",
                    ]
                )[rng.integers(0, 5, n_orders)],
            }
        ),
    )

    # lineitem ----------------------------------------------------------------
    lines_per = rng.integers(1, 8, n_orders)
    l_orderkey = np.repeat(np.arange(n_orders), lines_per)
    n_li = len(l_orderkey)
    l_linenumber = (
        np.arange(n_li) - np.repeat(np.cumsum(lines_per) - lines_per, lines_per) + 1
    )
    ship_us = (
        np.repeat(odate_us, lines_per)
        + rng.integers(1, 96, n_li) * DAY_US
    )
    write(
        "lineitem",
        pa.table(
            {
                "l_orderkey": pa.array(l_orderkey, pa.int64()),
                "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
                "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
                "l_linenumber": pa.array(l_linenumber, pa.int32()),
                "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
                "l_extendedprice": cents(900, 105_000, n_li),
                "l_discount": rng.integers(0, 11, n_li) / 100.0,
                "l_tax": rng.integers(0, 9, n_li) / 100.0,
                "l_returnflag": np.array(["A", "N", "R"])[rng.integers(0, 3, n_li)],
                "l_linestatus": np.array(["O", "F"])[rng.integers(0, 2, n_li)],
                "l_shipdate": ts_us(ship_us),
            }
        ),
    )

    # events ----------------------------------------------------------------
    e0 = np.datetime64("2024-01-01").astype("datetime64[us]").astype(np.int64)
    e1 = np.datetime64("2024-01-31").astype("datetime64[us]").astype(np.int64)
    ev_ts = np.sort(rng.integers(e0, e1, n_events))
    etypes = np.array(["click", "error", "purchase", "signup", "view"])
    write(
        "events",
        pa.table(
            {
                "event_id": pa.array(np.arange(n_events), pa.int64()),
                "ts": ts_us(ev_ts),
                "user_id": pa.array(rng.integers(0, n_users, n_events), pa.int64()),
                "event_type": etypes[rng.integers(0, 5, n_events)],
                "value": np.round(rng.exponential(50.0, n_events), 2),
                "props": [f'{{"k": {k}}}' for k in rng.integers(0, 100, n_events)],
            }
        ),
    )

    # documents ----------------------------------------------------------------
    vocab = [
        r[0]
        for r in duckdb.sql(
            "select distinct unnest(string_split(lower(text), ' ')) t "
            f"from '{SRC}/documents.parquet' order by 1"
        ).fetchall()
    ]
    vocab = np.array(vocab)
    langs = np.array(["en", "zh", "es", "fr", "de"])
    lang_p = np.array([0.41, 0.15, 0.15, 0.15, 0.14])
    texts: list[str] = []
    for i in range(n_docs):
        nw = rng.integers(10, 101)
        texts.append(" ".join(vocab[rng.integers(0, len(vocab), nw)]))
    # planted exact duplicates (~0.16%, matching sf0.1's 8/5000)
    for i in range(32):
        texts[n_docs - 1 - i] = texts[i]
    # planted single-token-edit near-dups (~0.2%) for the jaccard family
    for i in range(40):
        base = texts[200 + i].split(" ")
        base[len(base) // 2] = vocab[int(rng.integers(0, len(vocab)))]
        texts[n_docs - 200 - i] = " ".join(base)
    # planted dup clusters of size >= 3 (r08): the real sf0.1 testdata
    # carries multi-copy duplicates (its LSH dup graph has 13
    # triangles), and graph_triangles / clustering-coefficient grade
    # vacuously without them — 8 triples + 2 quads, ~0.17% of docs
    for c in range(10):
        src = 500 + 7 * c
        copies = 3 if c < 8 else 4
        for j in range(1, copies):
            texts[n_docs - 1000 - 11 * c - j] = texts[src]
    write(
        "documents",
        pa.table(
            {
                "doc_id": pa.array(np.arange(n_docs), pa.int64()),
                "text": texts,
                "lang": langs[rng.choice(5, n_docs, p=lang_p)],
                "source": [f"src{s}" for s in rng.integers(0, 20, n_docs)],
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
    )

    # embeddings ----------------------------------------------------------------
    X = rng.standard_normal((n_vecs, 64))
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    write(
        "embeddings",
        pa.table(
            {
                "vec_id": pa.array(np.arange(n_vecs), pa.int64()),
                "embedding": pa.array(
                    list(X.astype(np.float32)), pa.list_(pa.float32())
                ),
                "label": pa.array(rng.integers(0, 10, n_vecs), pa.int32()),
            }
        ),
    )


if __name__ == "__main__":
    main()
