"""Deduplication operators for training-data curation (graded first-class
alongside SURVEY.md §2): exact, n-gram Jaccard, MinHash+LSH, SimHash.

Scale notes (the 100 TB framing):
- exact dedup is a hash groupBy on a fingerprint — one shuffle, no payloads;
- MinHash+LSH: signature computation is embarrassingly parallel (explode
  shingles → groupBy min per hash — all JVM); candidate generation buckets
  signatures by (band, band-hash) so the join is an equi-join, never O(n²);
- SimHash: 64-bit fingerprint; near-dup = small Hamming distance within
  bucketed prefixes;
- n-gram Jaccard is the exact verifier applied only to LSH candidates;
- connected components turns verified near-dup PAIRS into duplicate
  CLUSTERS (min-id labels) so keep-one-per-cluster policies have a stable
  deterministic key — min-label propagation with path halving, O(log
  diameter) rounds of equi-joins.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

# Mersenne prime 2^31−1: after reducing the 64-bit shingle hash mod P, the
# affine permutation (a·h+b) stays ≤ ~2^37 — no int64 overflow under ANSI mode
MERSENNE_P = (1 << 31) - 1


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one row per distinct text (md5 fingerprint, smallest id wins) —
    `row_number() over (partition by fingerprint order by id)` semantics,
    deterministic and oracle-checkable."""
    w = Window.partitionBy(F.md5(F.col(text_col))).orderBy(F.col(id_col).asc())
    return df.withColumn("_rn", F.row_number().over(w)).filter("_rn = 1").drop("_rn")


def shingle_expr(text_col: str, n: int = 3):
    """Character n-gram shingles via SQL transform (works pre-Spark-4 lambda
    quirks); returns array<string> of distinct lowercase n-grams.

    The lowered text is bound ONCE per row through an outer single-element
    ``transform`` lambda: higher-order-function lambdas are interpreted (no
    codegen), so putting ``lower(text)`` inside the per-gram lambda made
    every gram re-lower the whole document — O(len²) interpreted work per
    row, measured as the dominant cost of the sf1 near-dup sweep (r6)."""
    return F.expr(
        f"transform(array(lower({text_col})), t ->"
        f" array_distinct(transform(sequence(1, greatest(length(t) - {n - 1}, 1)),"
        f" i -> substring(t, i, {n}))))[0]"
    )


def _gram_slices(t: str, n: int):
    """The ONE copy of the python-side gram construction both Arrow twins
    share (shingle_grams_udf and jaccard_counts_udf): codepoint slices
    ``t[i:i+n]`` over ``max(len(t)-n+1, 1)`` positions — exactly
    ``substring(t, i+1, n)`` over ``greatest(length(t)-(n-1), 1)`` incl.
    the short-text clamp. Keeping it shared is load-bearing: the rounded
    Jaccard oracles rely on both UDFs agreeing bit-for-bit with
    shingle_expr, so the clamp/slicing must never drift between them."""
    return (t[i : i + n] for i in range(max(len(t) - n + 1, 1)))


def shingle_grams_udf(n: int = 3):
    """Arrow-batched twin of ``shingle_expr`` over JVM-LOWERED text (pass it
    ``F.lower(col)`` — the unicode case mapping must stay the JVM's, exactly
    like the md5 MinHash signer). Value-identical by construction:

    - Python ``t[i:i+n]`` slices codepoints exactly like ``substring(t, i+1,
      n)`` (both clamp at the end; Spark strings index by codepoint);
    - the gram count is ``max(len(t) - n + 1, 1)`` — the expression's
      ``greatest(length(t) - (n-1), 1)``, so sub-``n``-length docs yield the
      single clamped partial gram ("" for empty text) exactly as before;
    - ``dict.fromkeys`` keeps first-occurrence order == ``array_distinct``;
    - NULL text → ``[None]`` (the expression's ``substring(NULL,...)`` path).

    Why: the expression form is an interpreted higher-order-function chain
    (no codegen) measured at 1.8 s per 50k-doc pass at sf1 — the dominant
    cost of every consecutive-pair query (r7, guide §4.2)."""

    @F.pandas_udf("array<string>")
    def grams(lowered: pd.Series) -> pd.Series:
        out = []
        for t in lowered:
            if t is None:
                out.append([None])
                continue
            out.append(list(dict.fromkeys(_gram_slices(t, n))))
        return pd.Series(out, dtype=object)

    return grams


def jaccard_counts_udf(n: int = 3):
    """Intersection/union CARDINALITIES of the two texts' distinct
    ``n``-gram sets, as one Arrow-batched UDF over JVM-LOWERED text (pass
    ``F.lower(col)`` on both sides). Value-identical twin of

        size(array_intersect(sh(l), sh(r))), size(array_union(sh(l), sh(r)))

    with ``sh = shingle_grams_udf(n)``: the gram construction is the same
    codepoint slicing + short-text clamp, set cardinality == the sizes of
    ``array_distinct``-based intersect/union (Spark treats NULL elements as
    equal, mirrored by ``None`` membership in Python sets), and the division
    + ``round`` stay in the JVM — so the rounded Jaccard is bit-identical
    by construction, not by a reimplemented rounding rule.

    Why: returning counts moves 8 bytes/row back across Arrow instead of
    both gram arrays (2-3x the text bytes), and drops the JVM
    array_intersect/array_union work on KB-scale arrays (r7, guide
    §2.3/§4.2). The pair UDF also shingles each doc once per ROLE, exactly
    like the two-column form it replaces."""

    @F.pandas_udf("struct<i: int, u: int>")
    def counts(left: pd.Series, right: pd.Series) -> pd.DataFrame:
        def gset(t):
            if t is None:
                return {None}
            return set(_gram_slices(t, n))

        inter, union = [], []
        for lt, rt in zip(left, right):
            a, b = gset(lt), gset(rt)
            inter.append(len(a & b))
            union.append(len(a | b))
        return pd.DataFrame({"i": inter, "u": union})

    return counts


def ngram_jaccard(df_pairs: DataFrame, left_text: str, right_text: str, n: int = 3) -> DataFrame:
    """Jaccard similarity of character n-gram shingle sets for pre-paired
    rows: |A∩B| / |A∪B|, all JVM array ops."""
    a = shingle_expr(left_text, n)
    b = shingle_expr(right_text, n)
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return df_pairs.withColumn("jaccard", F.round(inter / union, 4))


def minhash_signatures(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n_hashes: int = 32, shingle_n: int = 3
) -> DataFrame:
    """MinHash signatures: shingle → xxhash64 → k affine permutations
    (aᵢ·h+bᵢ mod Mersenne61) → min per permutation. One explode + one groupBy
    (map-side partial min), signature as array<bigint>.

    Deterministic: permutation coefficients derive from the hash index."""
    hs = df.select(id_col, F.explode(shingle_expr(text_col, shingle_n)).alias("sh")).withColumn(
        "h", F.pmod(F.xxhash64("sh"), F.lit(MERSENNE_P))
    )
    aggs = []
    for i in range(n_hashes):
        a = 2 * i + 1  # odd multipliers (small, keeps a·h below 2^37)
        b = (1442695040888963407 + i * 6364136223846793005) % MERSENNE_P
        aggs.append(F.min((F.col("h") * a + b) % MERSENNE_P).alias(f"mh_{i}"))
    sig = hs.groupBy(id_col).agg(*aggs)
    return sig.select(id_col, F.array(*[f"mh_{i}" for i in range(n_hashes)]).alias("signature"))


def minhash_lsh_candidates(
    signatures: DataFrame,
    id_col: str = "doc_id",
    bands: int = 8,
    rows_per_band: int = 4,
    bucket_cap: int | None = None,
    bucket_method: str = "xxhash64",
) -> DataFrame:
    """LSH banding: split each signature into ``bands`` bands of
    ``rows_per_band`` values, bucket by (band, hash(band slice)), self-join
    buckets → distinct candidate pairs (left id < right id). Equi-join only —
    the candidate step never goes quadratic in table size.

    Skew guards (web crawls are duplicate floods, so these matter at scale):
    identical signatures are collapsed to one representative before the
    banded self-join — B exact copies of a document contribute ONE row to
    every bucket instead of B (which would be B²/2 candidate rows in EVERY
    band) — and re-expand afterwards through output-sized equi-joins, so the
    candidate set is unchanged (recall 1 for the collapse). ``bucket_cap``
    additionally drops (band, bucket) groups holding more than that many
    DISTINCT signatures from candidate generation (broadcast anti-join, same
    guard as simsearch.cosine_pairs); pairs in a dropped bucket can still
    collide in other bands, so recall degrades gracefully instead of the
    shuffle exploding. None (default) disables the cap."""
    reps = signatures.groupBy("signature").agg(F.min(id_col).alias("_rep"))
    members = signatures.join(reps, on="signature").select(
        F.col(id_col).alias("_mid"), F.col("_rep")
    )
    def bucket_of(i):
        sl = F.slice("signature", i * rows_per_band + 1, rows_per_band)
        if bucket_method == "md5":
            # SQL-replayable: md5 over the '|'-joined stringified slice
            # (DuckDB: md5(string_agg(comp, '|' ORDER BY i)))
            return F.md5(F.array_join(F.transform(sl, lambda x: x.cast("string")), "|"))
        return F.xxhash64(sl.cast("string")).cast("string")

    b = reps.select(
        "_rep",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(i).alias("band"), bucket_of(i).alias("bucket"))
                    for i in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("_rep", "bb.band", "bb.bucket")
    if bucket_cap is not None:
        hot = b.groupBy("band", "bucket").count().filter(F.col("count") > bucket_cap).select("band", "bucket")
        b = b.join(F.broadcast(hot), on=["band", "bucket"], how="left_anti")
    rep_pairs = (
        b.select("band", "bucket", F.col("_rep").alias("_lrep"))
        .join(b.select("band", "bucket", F.col("_rep").alias("_rrep")), on=["band", "bucket"])
        .filter(F.col("_lrep") < F.col("_rrep"))
        .select("_lrep", "_rrep")
        .distinct()
    )
    # re-expand: pairs across two signature groups + all pairs within a group
    cross = (
        rep_pairs.join(members.select(F.col("_rep").alias("_lrep"), F.col("_mid").alias("_lid")), on="_lrep")
        .join(members.select(F.col("_rep").alias("_rrep"), F.col("_mid").alias("_rid")), on="_rrep")
        .select(
            F.least(F.col("_lid"), F.col("_rid")).alias("left_id"),
            F.greatest(F.col("_lid"), F.col("_rid")).alias("right_id"),
        )
    )
    within = (
        members.select("_rep", F.col("_mid").alias("left_id"))
        .join(members.select("_rep", F.col("_mid").alias("right_id")), on="_rep")
        .filter(F.col("left_id") < F.col("right_id"))
        .select("left_id", "right_id")
    )
    return cross.unionByName(within).distinct()


def minhash_near_dups(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.7,
    n_hashes: int = 32,
    bands: int = 4,
    bucket_cap: int | None = None,
    method: str = "xxhash64",
    shingle_n: int = 3,
) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline: signatures → banded candidates →
    exact n-gram-Jaccard verification ≥ threshold. ``bucket_cap`` bounds
    candidate generation under near-dup floods (see minhash_lsh_candidates).
    ``method='md5'`` uses the string-MinHash signature + md5 band buckets —
    every step SQL-replayable (the DuckDB-oracle flavor; xxhash64 stays the
    fast production default).

    ``shingle_n`` sets the character-shingle length for BOTH the signatures
    and the verify. Pick it against the corpus' background similarity: on
    ~400-char same-language documents the background 3-gram Jaccard between
    UNRELATED texts is ~0.19 (measured, data/sf1), which makes the banded
    candidate set quadratic in corpus size (~11M false candidates at 50k
    docs for 16/4/4 banding); 5-grams drop the background to ~0.06 and the
    false-candidate mass 100×. 3 stays the default for parity with the
    small-scale tests; web-scale corpora want 5+.

    The verify JOINS each document's shingle set (computed once per doc)
    onto the candidate pairs instead of re-shingling text per pair — a doc
    in k candidate pairs previously paid k interpreted O(len·grams)
    transforms, the measured sf1 hot spot."""
    if method == "md5":
        from dsm2dtm_spark.operators.incremental import minhash_signatures_md5

        sig = minhash_signatures_md5(df, text_col, id_col, n_hashes, shingle_n)
    else:
        sig = minhash_signatures(df, text_col, id_col, n_hashes, shingle_n)
    # the signing feeds the candidate generator's collapse/member/band
    # subtrees; materialize it once (the candidate step re-derives the
    # relation three times otherwise)
    sig = sig.localCheckpoint(eager=False)
    cand = minhash_lsh_candidates(
        sig, id_col, bands, n_hashes // bands, bucket_cap=bucket_cap, bucket_method=method
    )
    grams = df.select(F.col(id_col), shingle_expr(text_col, shingle_n).alias("_grams"))
    pairs = (
        cand.join(
            grams.select(F.col(id_col).alias("left_id"), F.col("_grams").alias("_lg")),
            on="left_id",
        ).join(
            grams.select(F.col(id_col).alias("right_id"), F.col("_grams").alias("_rg")),
            on="right_id",
        )
    )
    inter = F.size(F.array_intersect("_lg", "_rg"))
    union = F.size(F.array_union("_lg", "_rg"))
    return (
        pairs.withColumn("jaccard", F.round(inter / union, 4))
        .filter(F.col("jaccard") >= threshold)
        .select("left_id", "right_id", "jaccard")
    )


def connected_components(
    vertices: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "left_id",
    dst_col: str = "right_id",
    max_iters: int = 25,
    check_every: int = 2,
) -> DataFrame:
    """Distributed connected components by min-label propagation with pointer
    shortcutting: each round every vertex takes the minimum of its own label
    and its neighbors' labels, then jumps to its label's label (path halving —
    convergence in O(log diameter) rounds instead of O(diameter)). Returns
    (id, cluster_id) where cluster_id = the component's minimum vertex id —
    deterministic, so duplicate CLUSTERS (not just pairs) are stable keys for
    keep-one-per-cluster policies.

    Scale shape: each round is two equi-joins + one groupBy min on (edge,
    label) relations — no vertex ever sees more than its neighborhood, and
    ``localCheckpoint`` truncates the growing lineage exactly like the kNN
    ring loop. At 100× scale every driver action is a full-job barrier, so
    the loop spends at most ONE action per ``check_every`` rounds: the
    convergence count and the (lazy) checkpoint materialization run in the
    same job, and in-between rounds run with no action at all — an extra
    round after convergence is idempotent, never wrong."""
    if check_every < 1:
        raise ValueError(f"check_every must be ≥ 1, got {check_every}")
    sym = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst")).unionByName(
        edges.select(F.col(dst_col).alias("src"), F.col(src_col).alias("dst"))
    )
    labels = vertices.select(F.col(id_col).alias("vid"), F.col(id_col).alias("label")).localCheckpoint(eager=True)
    for it in range(max_iters):
        nbr = (
            sym.join(labels, sym.src == labels.vid)
            .groupBy("dst")
            .agg(F.min("label").alias("nbr_min"))
        )
        stepped = labels.join(nbr, labels.vid == nbr.dst, "left").select(
            "vid", F.least(F.col("label"), F.coalesce("nbr_min", "label")).alias("label")
        )
        # path halving: label := label(label)
        parent = stepped.select(F.col("vid").alias("pvid"), F.col("label").alias("plabel"))
        # LAZY checkpoint: the convergence count below is the job that
        # materializes it — one barrier for both, vs eager+take(1)'s two
        new = stepped.join(parent, stepped.label == parent.pvid, "left").select(
            "vid", F.coalesce("plabel", "label").alias("label")
        ).localCheckpoint(eager=False)
        if (it + 1) % check_every == 0 or it == max_iters - 1:
            n_changed = (
                new.alias("n")
                .join(labels.alias("o"), "vid")
                .filter(F.col("n.label") != F.col("o.label"))
                .count()
            )
            labels = new
            if n_changed == 0:
                break
        else:
            labels = new
    else:
        # returning partial labels would hand callers WRONG cluster ids with
        # no signal; with path halving max_iters=25 covers diameter ~2^25,
        # so exhaustion means a genuinely pathological graph — fail loudly
        raise RuntimeError(
            f"connected_components did not converge within max_iters={max_iters} rounds; "
            "raise max_iters (rounds needed ≈ log2(graph diameter))"
        )
    return labels.select(F.col("vid").alias(id_col), F.col("label").alias("cluster_id"))


def simhash64(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", method: str = "xxhash64") -> DataFrame:
    """64-bit SimHash over whitespace tokens: per bit, sum ±1 weighted by
    token hash bit, sign → bit. Explode + groupBy with 64 conditional sums,
    all JVM. ``method='md5'`` draws the 64 token-hash bits from two 32-bit
    halves of the token's md5 hex (conv(hex,16,10) — exactly replayable in
    DuckDB via ('0x'||substr(md5(tok),…))::BIGINT, the oracle flavor);
    xxhash64 stays the fast production default.

    COMPATIBILITY: since round 4 BOTH methods tokenize with ``tokens_ws``
    (single-space split, the engine-wide canonical tokenizer); earlier
    rounds split the xxhash64 flavor on ``\\s+``, so texts containing
    tabs/newlines/runs of spaces hash differently now. SimHash values
    persisted by a pre-round-4 build are NOT comparable with new output —
    re-sign the corpus rather than mixing vintages in one hamming join."""
    from dsm2dtm_spark.functions.text import tokens_ws

    # canonical single-space tokenization (tokens_ws) — same split as the
    # quality gate, decontam, and every DuckDB oracle
    toks = df.select(id_col, F.explode(tokens_ws(F.col(text_col))).alias("tok"))
    if method == "md5":
        toks = toks.withColumn(
            "h1", F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("long")
        ).withColumn("h2", F.conv(F.substring(F.md5("tok"), 9, 8), 16, 10).cast("long"))
        def bit(i):
            col = F.col("h1") if i < 32 else F.col("h2")
            return F.shiftright(col, i % 32).bitwiseAND(F.lit(1))
    else:
        toks = toks.withColumn("h", F.xxhash64("tok"))
        def bit(i):
            return F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1))
    sums = [
        F.sum(F.when(bit(i) == 1, 1).otherwise(-1)).alias(f"b{i}")
        for i in range(64)
    ]
    agg = toks.groupBy(id_col).agg(*sums)
    bit_terms = None
    for i in range(64):
        val = (1 << i) if i < 63 else -(1 << 63)  # bit 63 = sign bit of int64
        term = F.when(F.col(f"b{i}") > 0, F.lit(val).cast("long")).otherwise(F.lit(0).cast("long"))
        bit_terms = term if bit_terms is None else bit_terms.bitwiseOR(term)
    return agg.select(id_col, bit_terms.alias("simhash"))


def hamming64(a, b):
    return F.bit_count(F.col(a).bitwiseXOR(F.col(b)))


def hamming_near_dup_pairs(
    df: DataFrame,
    max_dist: int,
    id_col: str = "image_id",
    hash_col: str = "phash",
    n_bands: int = 4,
) -> DataFrame:
    """All id pairs whose 64-bit hashes differ in ≤ ``max_dist`` bits —
    EXACT, via pigeonhole banding: split each hash into ``n_bands`` equal
    bands; two hashes within Hamming distance d < n_bands must agree on at
    least one whole band (d flipped bits cannot touch all n_bands bands), so
    the banded equi-join's candidate set provably contains every qualifying
    pair. Verification is one JVM ``bit_count(xor)``. This is the standard
    near-dup image-dedup shape at corpus scale: one explode + one equi-join,
    never all-pairs, and unlike probabilistic LSH the recall is 1 by
    construction.

    Skew guard: the banded self-join runs over DISTINCT hash values only —
    a flood of B byte-identical images (the normal case in a web crawl)
    contributes ONE row per band instead of B rows that would meet each
    other B²/2 times in EVERY band. Qualifying hash pairs then re-expand to
    id pairs through output-sized equi-joins (within-group pairs at distance
    0, cross-group pairs at the verified distance), so the result set is
    unchanged and recall stays 1."""
    if not 0 <= max_dist < n_bands:
        raise ValueError(f"pigeonhole guarantee needs max_dist < n_bands, got {max_dist} ≥ {n_bands}")
    if 64 % n_bands:
        raise ValueError(f"n_bands must divide 64, got {n_bands}")
    width = 64 // n_bands
    mask = (1 << width) - 1
    members = df.select(F.col(id_col).alias("_id"), F.col(hash_col).alias("_h"))
    distinct_h = members.select("_h").distinct()
    bands = F.array(
        *[
            F.struct(
                F.lit(i).alias("band"),
                F.shiftrightunsigned(F.col("_h"), i * width).bitwiseAND(F.lit(mask)).alias("key"),
            )
            for i in range(n_bands)
        ]
    )
    b = distinct_h.select("_h", F.explode(bands).alias("bb")).select("_h", "bb.band", "bb.key")
    hash_pairs = (
        b.select("band", "key", F.col("_h").alias("lh"))
        .join(b.select("band", "key", F.col("_h").alias("rh")), on=["band", "key"])
        .filter(F.col("lh") < F.col("rh"))
        .dropDuplicates(["lh", "rh"])
        .withColumn("hamming", F.bit_count(F.col("lh").bitwiseXOR(F.col("rh"))))
        .filter(F.col("hamming") <= max_dist)
    )
    cross = (
        hash_pairs.join(members.select(F.col("_h").alias("lh"), F.col("_id").alias("_lid")), on="lh")
        .join(members.select(F.col("_h").alias("rh"), F.col("_id").alias("_rid")), on="rh")
        .select(
            F.least(F.col("_lid"), F.col("_rid")).alias("left_id"),
            F.greatest(F.col("_lid"), F.col("_rid")).alias("right_id"),
            "hamming",
        )
    )
    within = (
        members.select("_h", F.col("_id").alias("left_id"))
        .join(members.select("_h", F.col("_id").alias("right_id")), on="_h")
        .filter(F.col("left_id") < F.col("right_id"))
        .select("left_id", "right_id", F.lit(0).cast("int").alias("hamming"))
    )
    return cross.unionByName(within)


def passage_window_hashes_expr(text_col: str, window: int, stride: int):
    """array<string> of md5 hashes over SLIDING TOKEN WINDOWS (``window``
    tokens every ``stride``): the passage-level fingerprint. Spans start at
    token 1, 1+stride, … while a full window fits; texts shorter than one
    window yield an empty array. Single-space tokenization (tokens_ws) so
    DuckDB replays the hashes verbatim."""
    from dsm2dtm_spark.functions.text import tokens_ws

    toks = tokens_ws(F.col(text_col))
    n_spans = F.floor((F.size(toks) - window) / stride) + 1
    spans = F.transform(
        F.sequence(F.lit(0), n_spans.cast("int") - 1),
        lambda i: F.md5(F.array_join(F.slice(toks, i * stride + 1, window), " ")),
    )
    return F.when(F.size(toks) >= window, spans).otherwise(F.array().cast("array<string>"))


def repeated_passage_stats(
    docs: DataFrame,
    window: int = 32,
    stride: int = 16,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_digits: int = 4,
) -> DataFrame:
    """Per-document repeated-passage measurement — the sub-document twin of
    near-dup dedup (boilerplate headers, licence blocks, templated spans
    repeat ACROSS documents that are not near-dups as wholes; curation
    pipelines threshold on the repeated fraction). For each doc with ≥1
    full window: (id, n_windows, n_repeated, repeated_frac) where a window
    counts as repeated when its hash occurs in ≥ ``min_docs`` DISTINCT
    documents.

    Scale shape: one explode to narrow (id, hash) rows, one groupBy
    counting distinct docs per hash (map-side partial), one equi-join back
    — never all-pairs, and a boilerplate span shared by millions of docs is
    one aggregate row, not a join explosion."""
    # `win` (the tokenize+hash explode — the dominant cost) feeds three
    # aggregation subtrees; the lazy checkpoint materializes it once at the
    # first action instead of Catalyst recomputing the lineage per branch
    win = docs.select(
        F.col(id_col), F.explode(passage_window_hashes_expr(text_col, window, stride)).alias("wh")
    ).localCheckpoint(eager=False)
    hash_docs = (
        win.select("wh", id_col)
        .distinct()
        .groupBy("wh")
        .agg(F.count("*").alias("_ndocs"))
    )
    flagged = hash_docs.filter(F.col("_ndocs") >= min_docs).select("wh")
    per_doc = win.groupBy(id_col).agg(F.count("*").alias("n_windows"))
    rep = (
        win.join(flagged, on="wh", how="left_semi")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_repeated"))
    )
    return (
        per_doc.join(rep, on=id_col, how="left")
        .select(
            id_col,
            "n_windows",
            F.coalesce("n_repeated", F.lit(0)).alias("n_repeated"),
            F.round(F.coalesce("n_repeated", F.lit(0)) / F.col("n_windows"), round_digits).alias(
                "repeated_frac"
            ),
        )
    )
