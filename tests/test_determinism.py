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
