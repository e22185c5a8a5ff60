"""Distributed-determinism tests (SURVEY §5 parity axis): the DTM results
must be byte-identical regardless of how the input is partitioned — the
in-sandbox stand-in for local[8] ≡ local[32] executor-count invariance
(same property: results cannot depend on task boundaries)."""

from __future__ import annotations

import pytest

from dsm2dtm_spark import synth
from dsm2dtm_spark.plans import dtm_transform


@pytest.fixture(scope="module")
def images(spark):
    pdf = synth.image_table(n_rows=12, seed=99, sizes=(50, 64))
    return spark.createDataFrame(pdf.drop(columns=["scenario"]))


def _result_map(df):
    return {r.image_id: (bytes(r.bytes), r.caption, r.phash) for r in df.collect()}


def test_dtm_invariant_to_partitioning(spark, images):
    a = _result_map(dtm_transform(images, radius_m=40.0, min_parallelism=2))
    b = _result_map(dtm_transform(images, radius_m=40.0, min_parallelism=16))
    assert a == b


def test_dtm_invariant_to_input_order(spark, images):
    a = _result_map(dtm_transform(images, radius_m=40.0))
    b = _result_map(dtm_transform(images.orderBy("phash"), radius_m=40.0))
    assert a == b


def test_graph_and_hamming_ops_invariant_to_partitioning(spark):
    """The iterative/bucketed operators added in round 2 must also be
    partitioning-invariant: connected components (driver-loop convergence)
    and the pigeonhole hamming join (banded equi-join + dedup)."""
    import numpy as np
    import pandas as pd

    from dsm2dtm_spark.operators.dedup import connected_components, hamming_near_dup_pairs

    rng = np.random.default_rng(17)
    hashes = rng.integers(-(2**63), 2**63, 80, dtype=np.int64)
    hashes[40] = hashes[5] ^ np.int64(3)
    pdf = pd.DataFrame({"image_id": [f"i{k}" for k in range(80)], "phash": hashes})
    for parts in (2, 16):
        sdf = spark.createDataFrame(pdf).repartition(parts)
        got = {(r.left_id, r.right_id, r.hamming) for r in hamming_near_dup_pairs(sdf, 3).collect()}
        if parts == 2:
            base = got
        else:
            assert got == base

    verts = pd.DataFrame({"id": range(60)})
    edges = pd.DataFrame({"left_id": list(range(0, 58, 2)), "right_id": list(range(1, 59, 2))})
    for parts in (2, 16):
        v = spark.createDataFrame(verts).repartition(parts)
        e = spark.createDataFrame(edges).repartition(parts)
        got = {(r.id, r.cluster_id) for r in connected_components(v, e, id_col="id").collect()}
        if parts == 2:
            cc_base = got
        else:
            assert got == cc_base
