"""Incremental cross-snapshot dedup (operators.incremental): fresh batches
dedup against the committed corpus state without the corpus ever being
re-shingled — the highest-leverage operator for a production training-data
pipeline (VERDICT r3 #1)."""

from __future__ import annotations

import pandas as pd
import pytest

from dsm2dtm_spark.operators.incremental import (
    SignatureStore,
    band_buckets,
    dedup_against,
    incremental_dedup,
    minhash_signatures_md5,
    sign_documents,
)

CORPUS = [
    (0, "the quick brown fox jumps over the lazy dog in the morning sun"),
    (1, "pack my box with five dozen liquor jugs before the long journey"),
    (2, "sphinx of black quartz judge my vow said the tired old archivist"),
    (3, "a completely different document about distributed query engines"),
]
FRESH_1 = [
    (100, "the quick brown fox jumps over the lazy dog in the morning sun"),  # exact dup of 0
    (101, "pack my box with five dozen liquor jugs before the long journeys"),  # near dup of 1
    (102, "totally novel content discussing alpine meadows and glacier melt"),
    (103, "another unrelated text on sparse matrix factorization methods"),
]
FRESH_2 = [
    (200, "totally novel content discussing alpine meadows and glacier melt"),  # exact dup of 102
    (201, "fresh snowfall covered the quiet village before dawn broke gently"),
]


def _df(spark, rows):
    return spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))


@pytest.mark.parametrize("method", ["xxhash64", "md5"])
class TestIncrementalDedup:
    def test_verdicts_and_store_growth(self, spark, tmp_path, method):
        store = SignatureStore(str(tmp_path / f"store_{method}"))
        boot = incremental_dedup(store, _df(spark, CORPUS), method=method)
        assert {r.verdict for r in boot.collect()} == {"keep"}
        assert store.read_signatures(spark).count() == 4

        d1 = {r.doc_id: r.verdict for r in incremental_dedup(store, _df(spark, FRESH_1), method=method).collect()}
        assert d1[100] == "exact"
        assert d1[101] == "near"
        assert d1[102] == "keep" and d1[103] == "keep"
        # only kept rows' signatures were committed
        assert store.read_signatures(spark).count() == 6

        # batch 2 dedups against corpus + batch 1 (the store grew)
        d2 = {r.doc_id: r.verdict for r in incremental_dedup(store, _df(spark, FRESH_2), method=method).collect()}
        assert d2 == {200: "exact", 201: "keep"}
        assert store.read_signatures(spark).count() == 7
        assert store.read_bands(spark).count() == 7 * 4

    def test_corpus_never_reshingled(self, spark, tmp_path, method):
        """The committed side must enter the plan as parquet scans of the
        signature/band tables only — shingling (sequence/substring explode)
        may appear for the FRESH side exclusively."""
        store = SignatureStore(str(tmp_path / f"plan_{method}"))
        incremental_dedup(store, _df(spark, CORPUS), method=method)
        decisions, keep_sigs = dedup_against(
            _df(spark, FRESH_1),
            store.read_signatures(spark),
            store.read_bands(spark),
            method=method,
            materialize_fresh=False,  # keep the raw lineage plan-inspectable
        )
        plan = decisions._jdf.queryExecution().optimizedPlan().toString()
        # every shingle explode in the plan hangs off the fresh in-memory
        # relation, never off a FileScan of the store: count the shingle
        # markers and the store scans independently
        n_shingle = plan.count("sequence(1, greatest(")
        assert n_shingle >= 1  # fresh side is shingled (sign + verify feed)
        assert "Relation" in plan and "parquet" in plan  # store scanned
        # the store's parquet subtrees contain no shingle expression: a
        # shingle marker always references the fresh text column
        for chunk in plan.split("Relation")[1:]:
            head = chunk[:400]
            if "parquet" in head:
                assert "sequence(1, greatest(" not in head

    def test_deterministic_across_partitioning(self, spark, tmp_path, method):
        store = SignatureStore(str(tmp_path / f"det_{method}"))
        incremental_dedup(store, _df(spark, CORPUS), method=method)
        a = dedup_against(
            _df(spark, FRESH_1), store.read_signatures(spark), store.read_bands(spark), method=method
        )[0]
        b = dedup_against(
            _df(spark, FRESH_1).repartition(7),
            store.read_signatures(spark).repartition(5),
            store.read_bands(spark),
            method=method,
        )[0]
        assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


class TestStoreParamGuard:
    def test_mismatched_params_fail_fast(self, spark, tmp_path):
        store = SignatureStore(str(tmp_path / "guard"))
        incremental_dedup(store, _df(spark, CORPUS), method="md5", n_hashes=16)
        with pytest.raises(ValueError, match="incomparable"):
            incremental_dedup(store, _df(spark, FRESH_1), method="md5", n_hashes=32)
        with pytest.raises(ValueError, match="incomparable"):
            incremental_dedup(store, _df(spark, FRESH_1), method="xxhash64", n_hashes=16)
        # matching params still work
        out = incremental_dedup(store, _df(spark, FRESH_1), method="md5", n_hashes=16)
        assert out.count() == 4


class TestMd5SignatureProperties:
    def test_md5_signature_is_permutation_invariant_and_text_keyed(self, spark):
        sigs = {
            r.doc_id: r.signature
            for r in minhash_signatures_md5(_df(spark, CORPUS + [(9, CORPUS[0][1])])).collect()
        }
        assert sigs[0] == sigs[9]  # same text → same signature
        assert sigs[0] != sigs[1]
        assert len(sigs[0]) == 16 and all(len(c) == 32 for c in sigs[0])

    def test_band_buckets_shape_and_agreement(self, spark):
        sigs = sign_documents(_df(spark, [(0, CORPUS[0][1]), (1, CORPUS[0][1]), (2, CORPUS[1][1])]), method="md5")
        bb = band_buckets(sigs).collect()
        assert len(bb) == 3 * 4
        by_doc = {}
        for r in bb:
            by_doc.setdefault(r.doc_id, {})[r.band] = r.bucket
        assert by_doc[0] == by_doc[1]  # identical text: all bands agree
        assert by_doc[0] != by_doc[2]

    def test_bucket_cap_drops_flood_buckets(self, spark, tmp_path):
        # 50 near-identical boilerplate docs in the corpus: with a cap the
        # flooded buckets leave candidate generation, so a fresh boilerplate
        # doc is NOT flagged near (degraded recall, bounded join) — without
        # the cap it is
        flood = [(i, f"standard legal boilerplate footer text {i % 2}") for i in range(50)]
        store = SignatureStore(str(tmp_path / "flood"))
        incremental_dedup(store, _df(spark, flood), method="md5")
        fresh = _df(spark, [(999, "standard legal boilerplate footer text 0 extra")])
        uncapped, _ = dedup_against(
            fresh, store.read_signatures(spark), store.read_bands(spark), method="md5"
        )
        capped, _ = dedup_against(
            fresh, store.read_signatures(spark), store.read_bands(spark), method="md5", bucket_cap=3
        )
        assert [r.verdict for r in uncapped.collect()] == ["near"]
        assert [r.verdict for r in capped.collect()] == ["keep"]
