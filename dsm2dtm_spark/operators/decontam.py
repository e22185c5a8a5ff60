"""Benchmark decontamination: flag/drop training documents that share word
n-grams with an evaluation set (the standard curation step — a doc carrying
a verbatim eval question would leak the benchmark into training).

Scale shape (the only one that survives a 100 TB corpus × many benchmarks):
the EVAL side collapses to its DISTINCT n-grams first — an eval suite is
thousands of docs, so its gram set broadcasts; a boilerplate sentence
appearing in every eval doc contributes ONE gram row, not one per eval doc
(the flood guard: overlap output is linear in matching corpus docs, never
|docs with gram| × |eval docs with gram|). The corpus side explodes each
doc's distinct grams and the match is a broadcast hash equi-join — no
shuffle of the corpus, no all-pairs anything. ``hashed=True`` joins on
xxhash64(gram) instead of the gram string, cutting the exploded relation's
bytes ~10× at production scale (the oracle path keeps strings — exactly
SQL-replayable).

No reference-repo equivalent (training-data engine extension, VERDICT r3
next-round #3); machinery mirrors dedup.minhash_lsh_candidates' banded
equi-join discipline."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import ArrayType, StringType


def _word_ngrams_udf(n: int):
    """Arrow-batched distinct word ``n``-grams over JVM-lowered text —
    value-identical to the old expression form (``transform(sequence...)``
    over ``tokens_ws`` with ``array_join``): Python ``split(" ")`` on the
    literal space == Spark's split, ``" ".join(toks[i:i+n])`` ==
    ``array_join(slice(...), " ")``, short docs yield an empty array, and
    first-occurrence distinct order is preserved (downstream only explodes
    the set). The interpreted per-gram slice+join lambdas measured as the
    dominant decontam cost at sf1 (r7, guide §4.2)."""

    @F.pandas_udf(ArrayType(StringType()))
    def grams(lowered: pd.Series) -> pd.Series:
        out = []
        for t in lowered:
            if t is None:
                out.append([])  # old WHEN-guard yielded [] for null text too
                continue
            toks = [x for x in t.split(" ") if x]
            if len(toks) < n:
                out.append([])
                continue
            out.append(
                list(dict.fromkeys(" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)))
            )
        return pd.Series(out, dtype=object)

    return grams


def word_ngram_expr(text_col: str, n: int):
    """array<string> of the text's DISTINCT word ``n``-grams (lowercased in
    the JVM, space-tokenized exactly like the engine's canonical
    ``tokens_ws`` — the SAME split the quality gate and the DuckDB oracles
    use, so a tab/newline in a document can never make Spark and the oracle
    disagree on grams). Documents shorter than ``n`` tokens have no
    complete n-gram and yield an empty array — never partial grams
    (matching the standard decontamination definition). Gram assembly runs
    in an Arrow UDF since r7 (see _word_ngrams_udf — same values)."""
    return _word_ngrams_udf(n)(F.lower(F.col(text_col)))


def ngram_contamination(
    docs: DataFrame,
    eval_docs: DataFrame,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
    eval_text_col: str = "text",
    hashed: bool = True,
    broadcast_eval: bool = True,
    dedup_eval: bool = True,
) -> DataFrame:
    """(id, n_matched) for every training doc sharing ≥1 distinct word
    ``n``-gram with the eval set; ``n_matched`` counts the doc's DISTINCT
    matched grams. Docs with no overlap produce no row (the common case —
    keep the output proportional to contamination, not corpus size).

    ``dedup_eval`` (default True) is the boilerplate-flood guard described
    above: collapse the eval side to its distinct grams so join-output mass
    is linear in matching corpus docs. The result is IDENTICAL either way —
    ``count_distinct`` collapses duplicate matches per doc — so callers
    whose eval set has bounded duplicate mass (e.g. per-doc-distinct grams
    over a few thousand docs) can skip the distinct's Exchange+final-agg
    pass (measured 2.05 → 1.53 s at sf1; r7, guide §2.4). When ``hashed``,
    the distinct runs once on the 8-byte hashes instead of twice (strings
    then hashes — same set, half the dedup work)."""
    gram = F.explode(word_ngram_expr(text_col, n)).alias("g")
    doc_grams = docs.select(F.col(id_col), gram)
    ev = eval_docs.select(F.explode(word_ngram_expr(eval_text_col, n)).alias("g"))
    if hashed:
        doc_grams = doc_grams.select(id_col, F.xxhash64("g").alias("g"))
        ev = ev.select(F.xxhash64("g").alias("g"))
    if dedup_eval:
        ev = ev.distinct()
    if broadcast_eval:
        ev = F.broadcast(ev)
    return (
        doc_grams.join(ev, on="g")
        .groupBy(id_col)
        .agg(F.count_distinct("g").alias("n_matched"))
    )


def decontaminate(
    docs: DataFrame,
    eval_docs: DataFrame,
    n: int = 13,
    min_overlap: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
    eval_text_col: str = "text",
    hashed: bool = True,
) -> DataFrame:
    """Drop training docs whose distinct matched-gram count reaches
    ``min_overlap`` (default 1: any shared ``n``-gram disqualifies — the
    conservative standard). Anti-join against the flagged ids, so the
    surviving rows keep every input column."""
    flagged = (
        ngram_contamination(
            docs, eval_docs, n=n, text_col=text_col, id_col=id_col,
            eval_text_col=eval_text_col, hashed=hashed,
        )
        .filter(F.col("n_matched") >= min_overlap)
        .select(id_col)
    )
    return docs.join(flagged, on=id_col, how="left_anti")
