"""In-pytest oracle parity: run a representative subset of the driver
contract (queries() vs oracle_sql() through DuckDB) at sf0.001 so the
official gate — `python -m pytest -x -q` — exercises the Spark↔SQL parity
machinery end-to-end. The full 34-query sweep lives in
scripts/check_contract.py (same comparison code path)."""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402

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
    assert len(sdf) == len(odf), f"rowcount {len(sdf)} vs {len(odf)}"
    assert sorted(sdf.columns) == sorted(odf.columns)
    assert canon(sdf) == canon(odf)


def test_every_query_has_oracle_or_documented_reason(spark):
    qs = entry.queries()
    oracles = entry.oracle_sql()
    missing = set(qs) - set(oracles)
    # rows-only BY DESIGN — every entry here is genuinely un-replayable in
    # DuckDB (HLL sketch internals / xxhash64, which DuckDB lacks); keep the
    # list explicit so a forgotten oracle fails loudly. emb_lsh/ivf_topk and
    # dtm_pipeline_metrics graduated to real oracles in round 3 (materialized
    # planes/centroids + golden-clone metrics parquet).
    allowed_rows_only = {
        "approx_distinct_users",
        "docs_minhash_near_dups",
        "docs_simhash",
    }
    assert missing == allowed_rows_only
    assert not (set(oracles) - set(qs)), "oracle without a query"


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
