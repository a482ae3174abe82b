"""HMM map matching (Viterbi over per-point edge candidates).

The trajectory flagship on top of the snap primitives: given each GPS
fix's top-k candidate road segments with integer emission costs
(:func:`operators.snap.candidate_edges`), recover the most likely edge
sequence per track — Newson & Krumm 2009's shape with the standard
deterministic simplification of a constant edge-switch transition
penalty (sticky matching: continuity beats per-point snapping at
intersections, where the crossing street is often momentarily nearer).

Exactness: the whole DP is int64.  Costs are quantized upstream
(0.1 m² resolution); the argmin over predecessors uses a PACKED key
``(cost + trans)·PACK + prev_edge`` so min() resolves cost-ties to the
smallest predecessor edge in ONE operation — the identical packing the
DuckDB oracle's recursive CTE uses, which is what makes a dynamic
program hash-comparable across engines.  PACK bounds: edge ids must be
< PACK and (max path cost)·PACK must fit int64 — asserted per track.

Scale shape: candidates come from the bounded cell join (one shuffle);
the DP runs inside one Arrow ``applyInPandas`` kernel PER TRACK — the
natural scale unit of trajectory data (millions of tracks parallelize;
per-task state = k·T ints for one track).  The oracle replays forward
recursion and backtrace as two chained recursive CTEs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

__all__ = ["PACK", "TRANS_PENALTY", "viterbi_match"]

PACK = 270_000_000          # > max lattice edge id (src·100000 + dst)
TRANS_PENALTY = 25_000      # edge-switch cost ≡ (15.8 m)² at ×100 quant


def viterbi_match(
    cand: DataFrame,
    track_col: str = "track",
    t_col: str = "t",
    edge_col: str = "edge",
    emis_col: str = "emis",
    trans_penalty: int = TRANS_PENALTY,
) -> DataFrame:
    """[track, t, edge] — the Viterbi edge per fix.  ``cand`` holds the
    per-(track, t) candidate set (dense t per track); final-state ties
    resolve by (cost, edge) ascending, predecessor ties inside the DP
    by the packed-key min."""
    schema = f"{track_col} long, {t_col} long, {edge_col} long"

    def _kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        track = int(pdf[track_col].iloc[0])
        by_t: dict[int, list[tuple[int, int]]] = {}
        for t, e, m in zip(pdf[t_col], pdf[edge_col], pdf[emis_col]):
            by_t.setdefault(int(t), []).append((int(e), int(m)))
        ts = sorted(by_t)
        # forward pass
        cost = {e: m for e, m in by_t[ts[0]]}
        prevs: list[dict[int, int]] = []
        for t in ts[1:]:
            nxt: dict[int, int] = {}
            pv: dict[int, int] = {}
            for e, m in by_t[t]:
                packed = min(
                    (cj + (0 if ej == e else trans_penalty)) * PACK + ej
                    for ej, cj in cost.items()
                )
                assert packed < (1 << 62)
                nxt[e] = packed // PACK + m
                pv[e] = packed % PACK
            prevs.append(pv)
            cost = nxt
        # backtrace from the (cost, edge)-min final state
        e = min(cost.items(), key=lambda kv: (kv[1], kv[0]))[0]
        path = [e]
        for pv in reversed(prevs):
            e = pv[e]
            path.append(e)
        path.reverse()
        return pd.DataFrame(
            {track_col: track, t_col: ts, edge_col: path}
        ).astype(np.int64)

    return cand.groupBy(track_col).applyInPandas(_kernel, schema=schema)
