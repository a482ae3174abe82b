"""Per-group convex hulls over integer-quantized point sets.

The reference never computes hulls, but its dissolve/union family
(GreenExp/availability.py geometry prep) is the same "collapse a point
cloud to a summary geometry" shape; the hull operator extends it with
the classic district-footprint statistic a webtext×geo corpus needs
(per-district extent of geocoded documents).

Design for scale: the kernel is an Arrow ``applyInPandas`` over the
group key, so per-task memory is the group's (already subsampled /
deduplicated) point count — callers bound it with a hash-ranked top-K
per group before calling (the gate query caps at 48/block).  For
un-capped corpora the standard two-level refinement applies unchanged:
per-partition hull → union of hull vertices (≤ ~50 per partition) →
final hull per group; the kernel below serves both levels.

Exactness: coordinates must arrive as **integers** (quantized upstream)
so every orientation test and the shoelace area are exact int64
arithmetic — no FP epsilon, and the result is hash-comparable against a
closed-form O(n³) hull-edge oracle in DuckDB.  Collinear boundary
points are INCLUDED as hull vertices (pops only on `cross < 0`): the
fixture geocoder is LCG-structured, so arithmetic doc-id progressions
land collinear routinely and a strict-hull rule would be
oracle-ambiguous.  The matching oracle edge rule: (a,b) is a hull edge
iff no other point lies strictly right of a→b and none lies strictly
between a and b on the segment.  Groups whose hull is degenerate
(area 0: < 3 distinct points, or all collinear) are dropped on both
sides.
"""

from __future__ import annotations

from typing import Iterable, List, Sequence, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def _monotone_chain(pts: np.ndarray) -> np.ndarray:
    """Andrew's monotone chain over lexicographically sorted unique
    int64 points; returns hull vertices in counter-clockwise order,
    collinear boundary points INCLUDED (pops only on a strict right
    turn, `cross < 0`)."""

    def half(it: Iterable[np.ndarray]) -> List[np.ndarray]:
        h: List[np.ndarray] = []
        for p in it:
            while len(h) >= 2:
                ox, oy = h[-2]
                ax, ay = h[-1]
                if (ax - ox) * (p[1] - oy) - (ay - oy) * (p[0] - ox) < 0:
                    h.pop()
                else:
                    break
            h.append(p)
        return h

    lower = half(pts)
    upper = half(pts[::-1])
    return np.array(lower[:-1] + upper[:-1], dtype=np.int64)


def hull_stats_rows(
    pts: np.ndarray,
) -> Tuple[int, int, int, int] | None:
    """(n_pts, n_hull, area2, perim_q) for one group's unique int64
    points, or None when the hull is degenerate (zero area: < 3
    distinct points, or all collinear).  ``area2`` is the exact doubled
    shoelace area (CCW ⇒ positive); ``perim_q`` sums each boundary
    edge's length rounded half-up to an integer — order-free, and
    bit-reproducible against ``floor(sqrt(...) + 0.5)`` in SQL."""
    n = len(pts)
    if n < 3:
        return None
    hull = _monotone_chain(pts)
    if len(hull) < 3:
        return None
    nxt = np.roll(hull, -1, axis=0)
    area2 = int(np.sum(hull[:, 0] * nxt[:, 1] - hull[:, 1] * nxt[:, 0]))
    if area2 <= 0:
        return None
    d = (nxt - hull).astype(np.float64)
    perim_q = int(np.sum(np.floor(np.sqrt(d[:, 0] ** 2 + d[:, 1] ** 2) + 0.5)))
    return n, len(hull), area2, perim_q


def convex_hull_stats(
    df: DataFrame,
    group_cols: Sequence[str],
    x_col: str = "qx",
    y_col: str = "qy",
) -> DataFrame:
    """Per-group hull summary: ``n_pts`` (distinct points), ``n_hull``
    (hull boundary vertices, collinear included), ``area2`` (exact
    doubled area), ``perim_q`` (integer-rounded perimeter).  Groups with
    a degenerate (zero-area) hull are dropped — mirroring the oracle's
    positive-area filter."""
    gcols = list(group_cols)
    schema = ", ".join(f"{c} long" for c in gcols) + (
        ", n_pts long, n_hull long, area2 long, perim_q long"
    )

    def _kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pts = np.unique(
            pdf[[x_col, y_col]].to_numpy(dtype=np.int64), axis=0
        )
        row = hull_stats_rows(pts)
        if row is None:
            return pd.DataFrame(
                columns=gcols + ["n_pts", "n_hull", "area2", "perim_q"]
            )
        keys = [pdf[c].iloc[0] for c in gcols]
        return pd.DataFrame(
            [keys + list(row)],
            columns=gcols + ["n_pts", "n_hull", "area2", "perim_q"],
        )

    return df.groupBy(*gcols).applyInPandas(_kernel, schema=schema)


def district_diameter(
    df: DataFrame,
    group_cols: Sequence[str],
    x_col: str = "qx",
    y_col: str = "qy",
) -> DataFrame:
    """Per-group point-set DIAMETER: ``n_pts`` (distinct points),
    ``diam2`` (exact max squared distance, int64), ``diam_q`` (its
    sqrt, half-up at 3 dp via the floor(x·1000 + 0.5) convention the
    perimeter uses) — the farthest-pair footprint statistic beside
    :func:`convex_hull_stats`' area/perimeter.

    The diameter of a finite set is attained between convex-hull
    vertices, so the kernel reduces the (already capped) group to its
    monotone-chain hull first and scans pairs only there — h ≪ n, and
    collinear/degenerate groups fall back to the raw unique points
    (their chain is the whole set anyway).  Self-pairs are included,
    so singleton groups report diameter 0 — mirroring the oracle's
    unrestricted pair join.  Integer coordinates in, exact int64
    squared distances out; the only FP is one sqrt + round."""
    gcols = list(group_cols)
    schema = ", ".join(f"{c} long" for c in gcols) + (
        ", n_pts long, diam2 long, diam_q double"
    )

    def _kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pts = np.unique(
            pdf[[x_col, y_col]].to_numpy(dtype=np.int64), axis=0
        )
        cand = _monotone_chain(pts) if len(pts) >= 3 else pts
        if len(cand) < 3:
            cand = pts
        d = cand[:, None, :] - cand[None, :, :]
        diam2 = int((d[..., 0] ** 2 + d[..., 1] ** 2).max())
        keys = [pdf[c].iloc[0] for c in gcols]
        return pd.DataFrame(
            [keys + [len(pts), diam2,
                     float(np.floor(np.sqrt(diam2) * 1000.0 + 0.5)
                           / 1000.0)]],
            columns=gcols + ["n_pts", "diam2", "diam_q"],
        )

    return df.groupBy(*gcols).applyInPandas(_kernel, schema=schema)
