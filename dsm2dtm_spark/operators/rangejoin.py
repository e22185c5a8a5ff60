"""Interval (range) join: points × [lo, hi) ranges, scale-safe.

Spark plans a plain non-equi join predicate (``p >= lo AND p < hi``) as a
BroadcastNestedLoopJoin — O(|points| × |ranges|) comparisons, a scale-killer
whenever the range side outgrows a broadcast. The standard fix, implemented
here: quantize the value axis into fixed-width bins, explode each range to
the bins it covers, bin each point once, equi-join on the bin id, then apply
the exact predicate to the (tightly bounded) candidates. Each point meets
only ranges overlapping its bin, so candidate count scales with overlap
density instead of |ranges| — the same cover→equi-join→refine shape as the
spatial join (SURVEY.md E6), one dimension down.

Bin width trades duplication for selectivity exactly like the cell
resolution in the spatial join: ranges explode to ~(len/bin + 1) rows,
points to 1 row; pick bin ≈ the typical range length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def range_join(
    points: DataFrame,
    ranges: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bin_size: float,
    how: str = "inner",
) -> DataFrame:
    """Rows of ``points`` joined to every range with lo ≤ point < hi.
    Returns all columns of both inputs (names must not collide). Exact:
    the binned equi-join only generates candidates; the real predicate
    decides membership."""
    if bin_size <= 0:
        raise ValueError("bin_size must be positive")
    if how != "inner":
        # The exact predicate runs as a post-join filter; NULL-extended rows
        # from an outer join would always fail it, silently collapsing outer
        # semantics to inner. Refuse rather than lie.
        raise ValueError("range_join supports how='inner' only")
    p = points.withColumn("_bin", F.floor(F.col(point_col) / bin_size).cast("long"))
    lo_bin = F.floor(F.col(lo_col) / bin_size).cast("long")
    # hi is exclusive, but a range ending exactly on a bin boundary may
    # safely claim the boundary bin: the spurious candidates it generates
    # are removed by the exact predicate below. (An epsilon nudge here
    # would MISS matches for hi values a hair above a boundary.)
    hi_bin = F.floor(F.col(hi_col) / bin_size).cast("long")
    r = ranges.filter(F.col(hi_col) > F.col(lo_col)).withColumn(
        "_bin", F.explode(F.sequence(lo_bin, hi_bin))
    )
    joined = p.join(r, on="_bin", how="inner").filter(
        (F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) < F.col(hi_col))
    )
    return joined.drop("_bin")
