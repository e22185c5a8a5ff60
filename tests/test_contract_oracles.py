"""In-pytest oracle parity: run a representative subset of the driver
contract (queries() vs oracle_sql() through DuckDB) at sf0.001 so the
official gate — `python -m pytest -x -q` — exercises the Spark↔SQL parity
machinery end-to-end. The full all-query sweep lives in
scripts/check_contract.py (same comparison code path)."""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402
from scripts.check_contract import compare  # noqa: E402  (same code path as the local gate)

SF_DIR = "/root/testdata/sf0.001"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

SUBSET = [
    "q1_pricing_summary",
    "q5_nation_volume",
    "window_top3_orders_per_customer",
    "rollup_lineitem_flags",
    "utm_zone_histogram",
    "cell_encode_events",
    "docs_lang_id",
    "docs_jaccard_consecutive",
    "emb_topk_cosine",
    "img_tile_assignments",
    "img_knn_anchors",
    "img_slope_shade_stats",
    "docs_pack_sequences",
    "docs_incremental_dedup",
    "docs_decontam",
    "docs_global_shuffle",
    "docs_mixture_sample",
]


def canon(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v)
        elif df[c].dtype.kind == "f":
            df[c] = df[c].round(9)
    return sorted(map(tuple, df.itertuples(index=False, name=None)))


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_oracle(spark, duck, name):
    sdf = entry.queries()[name](spark, SF_DIR).toPandas()
    odf = duck.execute(entry.oracle_sql()[name]).df()
    assert compare(sdf, odf) == []


def test_compare_flags_uncast_duckdb_sum(duck):
    """VERDICT r4 #2: an oracle surfacing SUM(int) without a cast comes back
    HUGEINT -> pandas float64, so the driver hashes 3.0 against Spark's int64
    3 and fails even though values are equal. The local gate's compare() must
    catch that dtype-kind mismatch BEFORE value comparison (which would pass:
    3 == 3.0 in Python)."""
    import pandas as pd

    sdf = pd.DataFrame({"k": ["a"], "n": pd.array([3], dtype="int64")})
    uncast = duck.execute("SELECT 'a' AS k, SUM(x) AS n FROM (VALUES (1),(2)) t(x)").df()
    assert uncast["n"].dtype.kind == "f", "expected the HUGEINT->float64 materialization"
    problems = compare(sdf, uncast)
    assert problems and "dtype kinds differ" in problems[0]

    cast = duck.execute(
        "SELECT 'a' AS k, CAST(SUM(x) AS BIGINT) AS n FROM (VALUES (1),(2)) t(x)"
    ).df()
    assert compare(sdf, cast) == []


def test_docs_repeated_passages_oracle_dtypes(spark, duck):
    """The r4 driver-red row: n_repeated must now materialize as an integer
    kind on BOTH sides (the CAST AS BIGINT fix), and the full frames must
    pass the dtype-aware compare."""
    sdf = entry.queries()["docs_repeated_passages"](spark, SF_DIR).toPandas()
    odf = duck.execute(entry.oracle_sql()["docs_repeated_passages"]).df()
    assert odf["n_repeated"].dtype.kind in "iu", odf.dtypes
    assert sdf["n_repeated"].dtype.kind in "iu", sdf.dtypes
    assert compare(sdf, odf) == []


def test_all_oracles_dtype_kinds_match(spark, duck):
    """Sweep EVERY paired oracle at sf0.001 for per-column dtype-kind parity
    with the Spark result — the cheap projection of the full driver hash
    check that catches any other uncast DuckDB aggregate (SUM/HUGEINT, AVG
    on ints) without the cost of re-running values comparison here (the
    sf0.01 value sweep lives in scripts/check_contract.py)."""
    from scripts.check_contract import dtype_kinds

    qs, oracles = entry.queries(), entry.oracle_sql()
    bad = {}
    for name, sql in oracles.items():
        sdf = qs[name](spark, SF_DIR).toPandas()
        odf = duck.execute(sql).df()
        if len(sdf) == 0 or len(odf) == 0:
            continue
        sk, ok = dtype_kinds(sdf), dtype_kinds(odf)
        mism = {c: (sk.get(c), ok.get(c)) for c in sk if sk.get(c) != ok.get(c)}
        if mism:
            bad[name] = mism
    assert not bad, f"dtype-kind mismatches (spark vs oracle): {bad}"


def test_every_query_has_oracle_or_documented_reason(spark):
    qs = entry.queries()
    oracles = entry.oracle_sql()
    missing = set(qs) - set(oracles)
    # rows-only BY DESIGN — every entry here is genuinely un-replayable in
    # DuckDB (HLL sketch internals / xxhash64, which DuckDB lacks); keep the
    # list explicit so a forgotten oracle fails loudly. emb_lsh/ivf_topk and
    # dtm_pipeline_metrics graduated to real oracles in round 3 (materialized
    # planes/centroids + golden-clone metrics parquet).
    # r4 gave docs_minhash_near_dups and docs_simhash real oracles (md5
    # signature/bucket flavors replayable in DuckDB); only the HLL sketch
    # remains genuinely un-replayable
    allowed_rows_only = {
        "approx_distinct_users",
    }
    assert missing == allowed_rows_only
    assert not (set(oracles) - set(qs)), "oracle without a query"


def test_ann_oracle_decision_margins():
    """The LSH/IVF oracles replay the engine's bucket/list decisions with
    DuckDB's SEQUENTIAL list_dot_product, while the Arrow UDFs use numpy's
    BLAS matmul — not bit-identical summations. A decision flips only when a
    dot product sits within reduction-order error (~1e-13) of its boundary;
    assert the committed fixtures keep every decision far from a boundary,
    so the hash comparison cannot be ulp-flipped (CLAUDE.md arithmetic rule,
    applied to discrete decisions)."""
    import pyarrow.parquet as pq

    import __spark_entry__ as e

    e._ensure_contract_tables()
    emb = pq.read_table(os.path.join(SF_DIR.replace("sf0.001", "sf0.01"), "embeddings.parquet"))
    m = np.array(emb.column("embedding").to_pylist(), dtype=np.float64)

    planes_t = pq.read_table(e._ANN_PLANES_PQ).to_pylist()
    planes = np.array([r["plane"] for r in planes_t], dtype=np.float64)  # (48, 64)
    dots = m @ planes.T
    assert np.abs(dots).min() > 1e-9, "an LSH sign bit sits on the boundary"

    cents_t = pq.read_table(e._ANN_CENTROIDS_PQ).to_pylist()
    cents = np.array([r["centroid"] for r in cents_t], dtype=np.float64)  # (16, 64)
    sims = np.sort(m @ cents.T, axis=1)[:, ::-1]  # descending per vector
    # corpus assignment uses rank-1 vs rank-2; query probing rank-4 vs rank-5
    assert (sims[:, 0] - sims[:, 1]).min() > 1e-9, "IVF top-1 assignment on a boundary"
    assert (sims[:, 3] - sims[:, 4]).min() > 1e-9, "IVF nprobe-4 cut on a boundary"


def test_contract_tables_match_regeneration(tmp_path):
    """The committed data/contract parquet must equal fresh generation — the
    oracle files and the seeded generator cannot drift apart silently."""
    import pandas as pd
    import pyarrow.parquet as pq

    from dsm2dtm_spark import synth

    committed = pq.read_table(entry._IMAGES_PQ).to_pandas()
    fresh = synth.image_table(n_rows=80, seed=42, sizes=(50, 64, 80), dup_fraction=0.05)
    assert list(committed.columns) == list(fresh.columns)
    pd.testing.assert_frame_equal(committed, fresh)
