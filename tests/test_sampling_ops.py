"""Deterministic global shuffle + mixture sampling (operators.sampling):
training-order permutation and per-source mixture draws must be pure
functions of (data, seed) — invariant to partitioning, rerun, and cluster
size (VERDICT r3 next-round #4)."""

from __future__ import annotations

import hashlib

import pandas as pd
import pytest

from dsm2dtm_spark.operators.sampling import (
    global_shuffle,
    mixture_sample,
    rate_threshold_hex,
    temperature_rates,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, f"src{i % 4}", f"text number {i}") for i in range(1000)]
    return spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "source", "text"]))


class TestGlobalShuffle:
    def test_rank_is_dense_total_and_matches_reference_order(self, spark, docs):
        out = global_shuffle(docs, "doc_id", seed=5).select("doc_id", "shuffle_rank").collect()
        ranks = sorted(r.shuffle_rank for r in out)
        assert ranks == list(range(1, 1001))  # dense 1..n, no ties/gaps
        # matches the single-threaded definition: order by md5('5:'+id)
        want = sorted(
            (hashlib.md5(f"5:{i}".encode()).hexdigest(), i) for i in range(1000)
        )
        want_rank = {i: pos + 1 for pos, (_, i) in enumerate(want)}
        assert {r.doc_id: r.shuffle_rank for r in out} == want_rank

    def test_invariant_to_partitioning(self, spark, docs):
        a = {r.doc_id: r.shuffle_rank for r in global_shuffle(docs, "doc_id", seed=9).collect()}
        b = {
            r.doc_id: r.shuffle_rank
            for r in global_shuffle(docs.repartition(17), "doc_id", seed=9).collect()
        }
        c = {
            r.doc_id: r.shuffle_rank
            for r in global_shuffle(docs.coalesce(1), "doc_id", seed=9).collect()
        }
        assert a == b == c

    def test_n_buckets_changes_parallel_width_not_result(self, spark, docs):
        # n_buckets sizes the hash-prefix ranges (ADVICE r4: the parameter
        # used to be dead); the rank is a pure function of data + seed, so
        # any width must yield the identical permutation
        from dsm2dtm_spark.operators.sampling import _bucket_prefix_len

        base = {r.doc_id: r.shuffle_rank for r in global_shuffle(docs, "doc_id", seed=3).collect()}
        for n in (16, 4096):
            got = {
                r.doc_id: r.shuffle_rank
                for r in global_shuffle(docs, "doc_id", seed=3, n_buckets=n).collect()
            }
            assert got == base
        # the prefix length actually derives from n_buckets (rounded up to
        # whole hex chars)
        assert [_bucket_prefix_len(n) for n in (1, 16, 17, 256, 257, 4096)] == [1, 1, 2, 2, 3, 3]
        with pytest.raises(ValueError, match="n_buckets"):
            _bucket_prefix_len(0)

    def test_seed_changes_order(self, spark, docs):
        a = {r.doc_id: r.shuffle_rank for r in global_shuffle(docs, "doc_id", seed=1).collect()}
        b = {r.doc_id: r.shuffle_rank for r in global_shuffle(docs, "doc_id", seed=2).collect()}
        assert a != b

    def test_no_single_task_global_sort(self, spark, docs):
        # the plan must rank per hash-prefix bucket (parallel windows), not
        # via one empty-partitionBy window over everything
        plan = global_shuffle(docs, "doc_id", seed=5)._jdf.queryExecution().executedPlan().toString()
        big_windows = [
            ln for ln in plan.splitlines()
            if "Window" in ln and "_skey" in ln and "_bucket" not in ln
        ]
        assert not big_windows, big_windows


class TestMixtureSample:
    def test_rates_respected_and_deterministic(self, spark, docs):
        rates = {"src0": 1.0, "src1": 0.5, "src2": 0.0}
        out = mixture_sample(docs, rates, source_col="source", seed=3).collect()
        by_src = {}
        for r in out:
            by_src.setdefault(r.source, []).append(r.doc_id)
        assert len(by_src.get("src0", [])) == 250  # rate 1.0: all rows
        assert "src2" not in by_src  # rate 0.0: none
        assert "src3" not in by_src  # absent from rates → default_rate 0
        assert 80 <= len(by_src.get("src1", [])) <= 170  # ~125 expected
        again = mixture_sample(docs.repartition(13), rates, source_col="source", seed=3).collect()
        assert sorted(r.doc_id for r in again) == sorted(r.doc_id for r in out)

    def test_sample_is_stable_under_corpus_growth(self, spark, docs):
        # curation invariant: adding NEW rows never flips old rows' draws
        rates = {"src0": 0.4, "src1": 0.4, "src2": 0.4, "src3": 0.4}
        small = {r.doc_id for r in mixture_sample(docs.filter("doc_id < 500"), rates, "source", seed=11).collect()}
        grown = {r.doc_id for r in mixture_sample(docs, rates, "source", seed=11).collect()}
        assert small == {i for i in grown if i < 500}

    def test_threshold_hex_edges(self):
        assert rate_threshold_hex(0.0) == "0" * 13
        assert rate_threshold_hex(1.0) is None
        assert rate_threshold_hex(0.5) == "8" + "0" * 12
        with pytest.raises(ValueError):
            rate_threshold_hex(1.5)

    def test_temperature_rates_rebalance(self, spark):
        rows = [(i, "big", "t") for i in range(900)] + [(900 + i, "small", "t") for i in range(100)]
        df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "source", "text"]))
        natural = temperature_rates(df, temperature=1.0)
        flat = temperature_rates(df, temperature=0.0)
        # T=1: rates equalize per-row inclusion across sources (proportional
        # draw); T=0: per-SOURCE totals equalize, so the small source's rate
        # is ~9x the big one's
        assert natural["big"] == pytest.approx(natural["small"])
        assert flat["small"] == pytest.approx(1.0)
        assert flat["big"] == pytest.approx(100 / 900)
        sampled = mixture_sample(df, flat, "source", seed=2)
        counts = {r[0]: r[1] for r in sampled.groupBy("source").count().collect()}
        assert counts["small"] == 100
        assert 60 <= counts["big"] <= 140  # ~100 expected
