"""Training-mix job (jobs/prepare_training_mix.py): decontam → temperature
mixture → global shuffle → packing, fully deterministic in (corpus, seed)."""

from __future__ import annotations

import os
import sys

import pandas as pd
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "jobs"))

from prepare_training_mix import prepare_training_mix  # noqa: E402


@pytest.fixture(scope="module")
def corpus(spark):
    rows = []
    for i in range(300):
        src = "web" if i < 240 else "books"
        rows.append((i, src, f"document {i} from {src} with reasonably varied token content {i * 7 % 13}"))
    return spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "source", "text"]))


class TestPrepareTrainingMix:
    def test_end_to_end_shape_and_metrics(self, spark, corpus):
        out, m = prepare_training_mix(spark, corpus, temperature=0.0, seed=3, budget_tokens=64, n_buckets=8)
        assert m["input"] == 300
        # T=0 equalizes per-source totals at min_count * n_sources = 120
        assert 90 <= m["sampled"] <= 150
        assert m["rates"]["books"] == 1.0 and m["rates"]["web"] == 0.25
        rows = out.collect()
        assert len(rows) == m["sampled"]
        ranks = sorted(r.shuffle_rank for r in rows)
        assert ranks == list(range(1, m["sampled"] + 1))  # dense training order
        assert all(0 <= r.offset_in_pack < 64 for r in rows)
        assert m["total_tokens"] == sum(r.n_tokens for r in rows)
        assert m["packs"] >= 1

    def test_deterministic_across_partitioning(self, spark, corpus):
        a, _ = prepare_training_mix(spark, corpus, temperature=0.5, seed=9, budget_tokens=64, n_buckets=8)
        b, _ = prepare_training_mix(
            spark, corpus.repartition(13), temperature=0.5, seed=9, budget_tokens=64, n_buckets=8
        )
        key = lambda r: (r.doc_id, r.shuffle_rank, r.bucket, r.pack_idx, r.offset_in_pack)  # noqa: E731
        assert sorted(map(key, a.collect())) == sorted(map(key, b.collect()))

    def test_pack_layout_follows_shuffle_order(self, spark, corpus):
        out, _ = prepare_training_mix(spark, corpus, temperature=1.0, seed=5, budget_tokens=48, n_buckets=4)
        rows = sorted(out.collect(), key=lambda r: (r.bucket, r.shuffle_rank))
        # within a bucket, cumulative tokens in SHUFFLE order reproduce
        # pack_idx/offset exactly (greedy concat-then-chunk)
        from collections import defaultdict

        cum = defaultdict(int)
        for r in rows:
            assert r.pack_idx == cum[r.bucket] // 48
            assert r.offset_in_pack == cum[r.bucket] % 48
            cum[r.bucket] += r.n_tokens

    def test_decontam_stage_drops_leaks(self, spark, corpus):
        ev = spark.createDataFrame(pd.DataFrame(
            [(0, "document 7 from web with reasonably varied token content 10 extra pad pad pad")],
            columns=["eval_id", "text"],
        ))
        _, m = prepare_training_mix(spark, corpus, eval_docs=ev, temperature=1.0, seed=1, ngram=10)
        assert m["after_decontam"] == 299  # doc 7 shares a complete 10-gram
