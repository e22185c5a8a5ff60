"""Deterministic TPC-H-ish table generator at arbitrary scale factor.

The driver ships sf{0.001,0.01,0.1} under /root/testdata (read-only,
TESTDATA.md). VERDICT r5 ask #5 wants the full oracle sweep at sf1 —
volume-dependent bugs (broadcast-threshold flips, AQE plan changes,
int32 overflow in counting oracles) are invisible at sf0.1. This script
synthesizes the SAME ten-table schema at any sf, seeded, so
`check_contract.py <dir>` can replay every paired oracle on it. Values
need not equal the driver's (the contract compares Spark vs DuckDB on
the same files); distributions and categorical domains mirror sf0.1 so
every registry filter still selects non-trivial rows.

Usage: python scripts/make_sf.py [sf] [out_dir]
Defaults: sf=1, out_dir=data/sf<sf>.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
STATUSES = ["O", "P", "F"]
ETYPES = ["click", "view", "purchase", "signup", "error"]
PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
PNAME_ADJ = ["large", "small", "hot", "cold", "blue", "red", "green", "dim"]
PNAME_NOUN = ["ring", "bolt", "nut", "gear", "rod", "cap", "pin", "disk"]
LANGS = ["en", "de", "es", "fr", "zh"]
LANG_W = [0.41, 0.1475, 0.1475, 0.1475, 0.1475]
VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup", "fast",
    "filter", "group", "hash", "join", "key", "line", "merge", "order",
    "part", "query", "row", "scan", "slow", "small", "sort", "spark",
    "stream", "table", "the", "value", "vector", "window",
]
EMB_DIM = 64
N_LABELS = 10


def _make_vocab(rng: np.random.Generator, n_words: int) -> list[str]:
    """Deterministic syllable-composed vocabulary (2-4 syllables/word,
    unique words, lowercase ascii) — large enough that unrelated documents
    share few character 3-grams."""
    cons = list("bcdfghjklmnprstvwz")
    vow = list("aeiou")
    syll = [c + v for c in cons for v in vow] + [c + v + "n" for c in cons[:10] for v in vow]
    out: list[str] = []
    seen: set[str] = set()
    while len(out) < n_words:
        k = int(rng.integers(2, 5))
        w = "".join(syll[int(rng.integers(0, len(syll)))] for _ in range(k))
        if w not in seen:
            seen.add(w)
            out.append(w)
    return out


def _write(out_dir: str, name: str, table: pa.Table) -> None:
    path = os.path.join(out_dir, f"{name}.parquet")
    pq.write_table(table, path, row_group_size=1 << 20)
    print(f"  {name}: {table.num_rows} rows -> {path}", flush=True)


def _days(rng: np.random.Generator, n: int, lo: str, hi: str) -> np.ndarray:
    base = np.datetime64(lo)
    span = int((np.datetime64(hi) - base) / np.timedelta64(1, "D"))
    return (base + rng.integers(0, span + 1, n).astype("timedelta64[D]")).astype(
        "datetime64[us]"
    )


def gen(sf: float, out_dir: str, seed: int = 4242) -> None:
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)

    n_cust = max(10, int(150_000 * sf))
    n_supp = max(5, int(10_000 * sf))
    n_part = max(10, int(200_000 * sf))
    n_ord = max(20, int(1_500_000 * sf))
    n_line = max(40, int(6_000_000 * sf))
    n_evt = max(50, int(1_000_000 * sf))
    n_users = max(10, int(15_000 * sf))
    n_doc = max(20, int(50_000 * sf))
    n_emb = max(20, int(20_000 * sf))

    _write(out_dir, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": REGIONS,
    }))
    _write(out_dir, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))

    _write(out_dir, "customer", pa.table({
        "c_custkey": pa.array(np.arange(n_cust, dtype=np.int64)),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust).astype(np.int32)),
        "c_acctbal": np.round(rng.uniform(-1000.0, 10_000.0, n_cust), 2),
        "c_mktsegment": pa.array(np.array(SEGMENTS)[rng.integers(0, 5, n_cust)]),
    }))

    _write(out_dir, "supplier", pa.table({
        "s_suppkey": pa.array(np.arange(n_supp, dtype=np.int64)),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp).astype(np.int32)),
        "s_acctbal": np.round(rng.uniform(-1000.0, 10_000.0, n_supp), 2),
    }))

    adj = np.array(PNAME_ADJ)[rng.integers(0, len(PNAME_ADJ), n_part)]
    noun = np.array(PNAME_NOUN)[rng.integers(0, len(PNAME_NOUN), n_part)]
    _write(out_dir, "part", pa.table({
        "p_partkey": pa.array(np.arange(n_part, dtype=np.int64)),
        "p_name": pa.array(np.char.add(np.char.add(adj, " "), noun)),
        "p_brand": pa.array(
            np.char.add("Brand#", (rng.integers(1, 26, n_part)).astype(str))
        ),
        "p_type": pa.array(np.array(PTYPES)[rng.integers(0, len(PTYPES), n_part)]),
        "p_size": pa.array(rng.integers(1, 51, n_part).astype(np.int32)),
        "p_retailprice": np.round(rng.uniform(900.0, 1000.0, n_part), 2),
    }))

    odate = _days(rng, n_ord, "1995-01-01", "2001-08-01")
    _write(out_dir, "orders", pa.table({
        "o_orderkey": pa.array(np.arange(n_ord, dtype=np.int64)),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord).astype(np.int64)),
        "o_orderstatus": pa.array(
            np.array(STATUSES)[rng.choice(3, n_ord, p=[0.49, 0.02, 0.49])]
        ),
        "o_totalprice": np.round(rng.uniform(1000.0, 500_000.0, n_ord), 2),
        "o_orderdate": pa.array(odate, pa.timestamp("us")),
        "o_orderpriority": pa.array(
            np.array(PRIORITIES)[rng.integers(0, 5, n_ord)]
        ),
    }))

    lok = np.sort(rng.integers(0, n_ord, n_line).astype(np.int64))
    # l_linenumber = per-order running index + 1 (orderkeys sorted above)
    starts = np.flatnonzero(np.r_[True, lok[1:] != lok[:-1]])
    lineno = (np.arange(n_line) - np.repeat(starts, np.diff(np.r_[starts, n_line]))) + 1
    # drop lines past an order's 7th instead of clamping the index: the old
    # np.minimum(lineno, 7) gave ~5% of orders duplicate (l_orderkey,
    # l_linenumber) pairs, breaking the TPC-H primary key the driver's
    # tables honor — a query relying on that uniqueness would pass the
    # self-consistent Spark-vs-DuckDB contract here while being wrong on
    # real-shaped data (ADVICE r6). Drops ~0.3% of lines; 1–7 lines/order.
    keep = lineno <= 7
    lok, lineno, n_line = lok[keep], lineno[keep], int(keep.sum())
    qty = rng.integers(1, 51, n_line).astype(np.float64)
    ship = odate[lok] + rng.integers(1, 122, n_line).astype("timedelta64[D]").astype(
        "timedelta64[us]"
    )
    _write(out_dir, "lineitem", pa.table({
        "l_orderkey": pa.array(lok),
        "l_partkey": pa.array(rng.integers(0, n_part, n_line).astype(np.int64)),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_line).astype(np.int64)),
        "l_linenumber": pa.array(lineno.astype(np.int32)),
        "l_quantity": qty,
        "l_extendedprice": np.round(qty * rng.uniform(900.0, 2100.0, n_line), 2),
        "l_discount": np.round(rng.integers(0, 11, n_line) / 100.0, 2),
        "l_tax": np.round(rng.integers(0, 9, n_line) / 100.0, 2),
        "l_returnflag": pa.array(
            np.array(["A", "N", "R"])[rng.choice(3, n_line, p=[0.25, 0.5, 0.25])]
        ),
        "l_linestatus": pa.array(np.array(["F", "O"])[rng.integers(0, 2, n_line)]),
        "l_shipdate": pa.array(ship, pa.timestamp("us")),
    }))

    ts0 = np.datetime64("2024-01-01T00:00:00", "us")
    ts = ts0 + rng.integers(0, 30 * 86_400_000_000, n_evt).astype("timedelta64[us]")
    _write(out_dir, "events", pa.table({
        "event_id": pa.array(np.arange(n_evt, dtype=np.int64)),
        "ts": pa.array(np.sort(ts), pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, n_users, n_evt).astype(np.int64)),
        "event_type": pa.array(np.array(ETYPES)[rng.integers(0, 5, n_evt)]),
        "value": np.round(rng.exponential(50.0, n_evt), 2),
        "props": pa.array(
            np.char.add(np.char.add('{"k": ', rng.integers(0, 100, n_evt).astype(str)), "}")
        ),
    }))

    # documents: Zipf-weighted word salad over a LARGE synthetic vocabulary
    # (~8k syllable words) so pairwise character-3-gram Jaccard between
    # unrelated docs is web-corpus-like (low), plus ~2% near-dup clones (one
    # word substituted) and ~0.2% exact dups so minhash/simhash/exact dedup
    # queries return non-trivial matches at every sf.
    #
    # Deliberate divergence from the driver's 31-word vocab: on THAT corpus
    # typical pairwise char-3-gram Jaccard is ~0.43 (p90 0.58), so any
    # threshold-0.6 near-dup query has a quadratically-sized TRUE answer —
    # at 50k docs that is ~10^8 candidate pairs, an adversarial flood no
    # engine should sweep without the bucket_cap guard (which the paired
    # oracle cannot replay). The large vocab tests the operators at sf1 in
    # the regime they exist for; the flood regime is exercised separately
    # (scripts/flood_guard_ab.py).
    vocab = _make_vocab(rng, 8000)
    ranks = np.arange(1, len(vocab) + 1, dtype=np.float64)
    zipf_p = (1.0 / ranks) / np.sum(1.0 / ranks)
    lens = rng.integers(8, 100, n_doc)
    flat = rng.choice(len(vocab), size=int(lens.sum()), p=zipf_p)
    texts: list[str] = []
    off = 0
    for i in range(n_doc):
        texts.append(" ".join(vocab[j] for j in flat[off : off + lens[i]]))
        off += lens[i]
    n_near = n_doc // 50
    near_src = rng.integers(0, n_doc, n_near)
    near_dst = rng.integers(0, n_doc, n_near)
    for s, d in zip(near_src, near_dst):
        if s == d:
            continue
        w = texts[s].split()
        w[int(rng.integers(0, len(w)))] = vocab[int(rng.integers(0, len(vocab)))]
        texts[d] = " ".join(w)
    n_exact = max(4, n_doc // 500)
    ex_src = rng.integers(0, n_doc, n_exact)
    ex_dst = rng.integers(0, n_doc, n_exact)
    for s, d in zip(ex_src, ex_dst):
        if s != d:
            texts[d] = texts[s]
    _write(out_dir, "documents", pa.table({
        "doc_id": pa.array(np.arange(n_doc, dtype=np.int64)),
        "text": texts,
        "lang": pa.array(np.array(LANGS)[rng.choice(len(LANGS), n_doc, p=LANG_W)]),
        "source": pa.array(
            np.char.add("src", rng.integers(0, 20, n_doc).astype(str))
        ),
        "n_chars": pa.array(np.array([len(t) for t in texts], dtype=np.int64)),
    }))

    labels = rng.integers(0, N_LABELS, n_emb).astype(np.int32)
    # iid normal, normalized — the DRIVER's regime (sf0.1 measured: off-diag
    # cosine mean 0.000, p99 0.287 ≈ 2.33/√64, max 0.60, frac≥0.45 ≈ 1e-4).
    # A clustered draw (centers + noise) puts ~10% of ALL pairs above the
    # registry's 0.45 threshold → the sim-pair queries' true answers go
    # quadratic (20M rows at sf1) and their exact oracles grind for hours.
    vecs = rng.normal(0.0, 1.0, (n_emb, EMB_DIM)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    _write(out_dir, "embeddings", pa.table({
        "vec_id": pa.array(np.arange(n_emb, dtype=np.int64)),
        "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        "label": pa.array(labels),
    }))


if __name__ == "__main__":
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    out = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "data",
        f"sf{sf:g}",
    )
    print(f"generating sf={sf} -> {out}")
    gen(sf, out)
