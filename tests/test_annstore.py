"""AnnIndexStore (VERDICT r5 #4): the persisted, incrementally-maintained
ANN index. The committed index must return EXACTLY what the in-flight
operators (ivf_topk/lsh_topk with the same quantizer parameters) compute,
queries must not re-hash the corpus (plan-pinned: zero Arrow UDF on the
postings side), and the store must survive reopening in a fresh process —
centroids/planes come from the committed bytes, never regenerated."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from dsm2dtm_spark import synth
from dsm2dtm_spark.operators import simsearch as S
from dsm2dtm_spark.operators.annstore import AnnIndexStore


@pytest.fixture(scope="module")
def corpus(spark):
    pdf = synth.embedding_table(300, dim=32, n_clusters=12, noise=0.05, dup_fraction=0.05, seed=9)
    sdf = spark.createDataFrame(pdf[["vec_id", "embedding"]]).localCheckpoint(eager=True)
    queries = sdf.filter("vec_id < 20").selectExpr("vec_id as query_id", "embedding")
    return sdf, queries


def _pairs(rows):
    return {(r.query_id, r.neighbor_id, r.cosine, r.rank) for r in rows}


class TestAnnIndexStoreIVF:
    def test_matches_inflight_ivf_exactly(self, spark, tmp_path, corpus):
        """Persisted index ≡ ivf_topk with the same (n_centroids, seed,
        nprobe) — full tuples including rounded cosine and rank, and the
        second APPENDED batch's vectors are first-class neighbors."""
        sdf, queries = corpus
        store = AnnIndexStore.create(str(tmp_path / "ivf"), kind="ivf", n_centroids=16)
        assert store.append(sdf.filter("vec_id % 2 = 0")) > 0
        assert store.append(sdf.filter("vec_id % 2 = 1")) > 0
        assert store.row_count() == 300
        got = _pairs(store.topk(spark, queries, k=10, nprobe=4).collect())
        want = _pairs(S.ivf_topk(sdf, queries, k=10, n_centroids=16, nprobe=4).collect())
        assert got == want
        odd = {n for (_, n, _, _) in got if n % 2 == 1}
        assert odd  # appended-batch vectors are retrievable

    def test_query_reads_committed_index_no_rehash(self, spark, tmp_path, corpus, monkeypatch):
        """The point of persisting: query time must not re-derive the
        quantizer (monkeypatched to explode) nor run ANY Arrow UDF over the
        corpus side — exactly one ArrowEvalPython in the plan, feeding the
        query batch."""
        sdf, queries = corpus
        store = AnnIndexStore.create(str(tmp_path / "ivfplan"), kind="ivf")
        store.append(sdf)
        import dsm2dtm_spark.operators.annstore as A

        monkeypatch.setattr(A, "make_centroids", lambda *a, **k: (_ for _ in ()).throw(AssertionError("regenerated quantizer at query time")))
        out = store.topk(spark, queries, k=5, nprobe=4)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert plan.count("ArrowEvalPython") == 1
        assert out.count() > 0

    def test_reopen_from_disk(self, spark, tmp_path, corpus):
        """A fresh store object (new spark-submit session) queries the
        committed bytes; mismatched append dim fails fast."""
        sdf, queries = corpus
        root = str(tmp_path / "reopen")
        AnnIndexStore.create(root, kind="ivf").append(sdf)
        reopened = AnnIndexStore(root)
        assert reopened.params()["dim"] == 32
        want = _pairs(S.ivf_topk(sdf, queries, k=10, n_centroids=16, nprobe=4).collect())
        assert _pairs(reopened.topk(spark, queries, k=10, nprobe=4).collect()) == want
        bad = spark.createDataFrame(
            pd.DataFrame({"vec_id": [9999], "embedding": [[0.1] * 16]})
        )
        with pytest.raises(ValueError, match="32-dim"):
            reopened.append(bad)

    def test_trained_centroids_commit(self, spark, tmp_path, corpus):
        """create(centroids=train_centroids(...)) commits the TRAINED
        quantizer; queries replay it from parquet (≡ ivf_topk given the
        same matrix)."""
        sdf, queries = corpus
        cents = S.train_centroids(sdf, n_centroids=8, sample_size=300)
        store = AnnIndexStore.create(str(tmp_path / "trained"), kind="ivf", centroids=cents)
        store.append(sdf)
        got = _pairs(store.topk(spark, queries, k=10, nprobe=3).collect())
        want = _pairs(S.ivf_topk(sdf, queries, k=10, centroids=cents, nprobe=3).collect())
        assert got == want

    def test_postings_partitioned_by_list(self, spark, tmp_path, corpus):
        """The inverted lists ARE the directory layout (hive partition
        dirs), so a probe's file set shrinks with nprobe."""
        import os

        sdf, _ = corpus
        store = AnnIndexStore.create(str(tmp_path / "layout"), kind="ivf")
        store.append(sdf)
        data_dir = store.postings.data_dir
        assert any(d.startswith("list_id=") for d in os.listdir(data_dir))

    def test_compact_folds_appends(self, spark, tmp_path, corpus):
        sdf, queries = corpus
        store = AnnIndexStore.create(str(tmp_path / "cmp"), kind="ivf")
        for m in range(3):
            store.append(sdf.filter(f"vec_id % 3 = {m}"))
        want = _pairs(store.topk(spark, queries, k=10, nprobe=4).collect())
        res = store.compact(spark, small_file_bytes=1 << 30)
        assert res["postings"] > 0
        assert _pairs(store.topk(spark, queries, k=10, nprobe=4).collect()) == want

    def test_create_guards(self, tmp_path):
        root = str(tmp_path / "g")
        AnnIndexStore.create(root, kind="ivf")
        with pytest.raises(ValueError, match="already holds"):
            AnnIndexStore.create(root, kind="lsh")
        with pytest.raises(ValueError, match="kind must be"):
            AnnIndexStore.create(str(tmp_path / "g2"), kind="hnsw")


class TestAnnIndexStoreLSH:
    def test_matches_inflight_lsh_exactly(self, spark, tmp_path, corpus):
        sdf, queries = corpus
        store = AnnIndexStore.create(str(tmp_path / "lsh"), kind="lsh", n_planes=6, n_tables=8)
        store.append(sdf.filter("vec_id < 150"))
        store.append(sdf.filter("vec_id >= 150"))
        got = _pairs(store.topk(spark, queries, k=10).collect())
        want = _pairs(S.lsh_topk(sdf, queries, k=10, n_planes=6, n_tables=8).collect())
        assert got == want

    def test_recall_on_clustered(self, spark, tmp_path, corpus):
        """Same recall gate as the in-flight path: ≥0.9 at k=10 on the
        clustered fixture."""
        sdf, queries = corpus
        store = AnnIndexStore.create(str(tmp_path / "rec"), kind="lsh", n_planes=6, n_tables=8)
        store.append(sdf)
        exact = {
            (r.query_id, r.neighbor_id) for r in S.brute_force_topk(sdf, queries, k=10).collect()
        }
        got = {(r.query_id, r.neighbor_id) for r in store.topk(spark, queries, k=10).collect()}
        assert len(exact & got) / len(exact) >= 0.9

    def test_rerank_broadcasts_carry_no_pairwise_qvec(self, spark, tmp_path, corpus):
        """VERDICT r6 #1 plan pin: the rerank's broadcast build sides are
        either the ID-ONLY candidate set or the query batch — never a
        relation holding qvec duplicated per (query, neighbor) pair (whose
        size grows with corpus size: the broadcast-ceiling scale-killer).
        Concretely: no BroadcastExchange output may contain BOTH the query
        vector and a neighbor id."""
        sdf, queries = corpus
        store = AnnIndexStore.create(str(tmp_path / "bplan"), kind="lsh", n_planes=6, n_tables=8)
        store.append(sdf)
        out = store.topk(spark, queries, k=10)
        plan = out._jdf.queryExecution().executedPlan().toString()
        lines = plan.splitlines()
        n_exchanges = 0
        for i, ln in enumerate(lines):
            if "BroadcastExchange" not in ln:
                continue
            n_exchanges += 1
            # the exchange's DIRECT child (next line) shows the broadcast
            # relation's output columns: the old scale-killer shape had
            # Project [query_id, qvec, neighbor_id] here — qvec duplicated
            # per candidate pair
            child = lines[i + 1]
            assert not ("qvec" in child and "neighbor_id" in child), child
        assert n_exchanges >= 2  # candidate-id broadcast + query broadcast
        # and the results are still the in-flight operator's
        got = _pairs(out.collect())
        want = _pairs(S.lsh_topk(sdf, queries, k=10, n_planes=6, n_tables=8).collect())
        assert got == want

    def test_postings_are_narrow(self, spark, tmp_path, corpus):
        """n_tables rows per vector but embeddings NOT duplicated per table:
        postings carry (vec_id, bucket) only; vectors live once."""
        sdf, _ = corpus
        store = AnnIndexStore.create(str(tmp_path / "narrow"), kind="lsh", n_tables=8)
        store.append(sdf)
        postings = store.postings.read(spark)
        assert postings.columns == ["vec_id", "bucket"]
        assert postings.count() == 300 * 8
        assert store.vectors.read(spark).count() == 300
