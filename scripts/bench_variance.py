#!/usr/bin/env python
"""Round-over-round bench comparison WITH error bars (VERDICT r02 #3).

Reads the current BENCH/last_bench.json (which carries per-rep timings,
``queries_reps``) and a prior round's BENCH_r{N}.json, and writes
BENCH/VARIANCE.md: per query, this round's min ± rep spread against the
prior round's min, flagging only deltas that EXCEED the observed spread
— anything inside the spread envelope is shared-box noise (co-tenant
load bursts measured 2-10x swings; ROADMAP.md round-3 item 2), not a
plan change.

Usage: python scripts/bench_variance.py [prior_round_json]
       (default: the highest-numbered BENCH_r*.json in the repo root)
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_prior(path: str | None) -> tuple[str, dict]:
    if path is None:
        cands = sorted(glob.glob(os.path.join(REPO, "BENCH_r*.json")))
        if not cands:
            raise SystemExit("no BENCH_r*.json found and no prior given")
        path = cands[-1]
    with open(path) as f:
        raw = json.load(f)
    # driver wrapper format: {"parsed": {...}} or the bare bench line
    bench = raw.get("parsed", raw)
    return os.path.basename(path), bench


def main() -> None:
    with open(os.path.join(REPO, "BENCH", "last_bench.json")) as f:
        cur = json.load(f)
    prior_name, prior = _load_prior(sys.argv[1] if len(sys.argv) > 1 else None)
    cur_q = cur.get("queries", {})
    cur_reps = cur.get("queries_reps", {})
    prior_q = prior.get("queries", {})

    rows = []
    n_regress = n_improve = 0
    for name in sorted(cur_q):
        t = cur_q[name]
        reps = cur_reps.get(name, [t])
        spread = max(reps) - min(reps)
        old = prior_q.get(name)
        if old is None:
            verdict = "new"
        else:
            delta = t - old
            # significant only if the delta clears this round's rep
            # spread AND 15% — both gates must trip
            if delta > max(spread, 0.15 * old):
                verdict = f"REGRESSED +{delta:.2f}s"
                n_regress += 1
            elif -delta > max(spread, 0.15 * old):
                verdict = f"improved {delta:.2f}s"
                n_improve += 1
            else:
                verdict = "~flat (within spread)"
        rows.append(
            f"| {name} | {t:.3f} | ±{spread:.3f} ({'/'.join(f'{r:.2f}' for r in reps)}) | "
            f"{old if old is not None else '—'} | {verdict} |"
        )

    md = [
        "# Bench variance — current run vs " + prior_name,
        "",
        "Per-query: this round's **min of N reps** with the observed rep",
        "spread as the error bar.  A delta counts as a real change only if",
        "it exceeds BOTH the rep spread and 15% — everything else is",
        "shared-box noise (documented 2-10x co-tenant swings).",
        "",
        f"Current: sf={cur.get('sf')} cpus={cur.get('cpus')} "
        f"total={cur.get('value')}s over {len(cur_q)} queries; "
        f"flagship {cur.get('flagship_rows_per_sec', '?')} rows/s.",
        "",
        "| query | min s | spread (reps) | prior s | verdict |",
        "|---|---|---|---|---|",
        *rows,
        "",
        f"**Summary: {n_regress} significant regressions, {n_improve} significant "
        f"improvements, {len(rows) - n_regress - n_improve} flat/new.**",
        "",
        "Known expected deltas vs BENCH_r02: q_html_extract gained "
        "script/style/comment element-content stripping + entity "
        "decoding this round (VERDICT r02 #6) — the extra regexp passes "
        "are the feature, not a plan regression; q_bigram_logprob's "
        "large improvement is the vocab-broadcast removal (VERDICT r02 "
        "#1).  Cross-check against the round's earlier same-code runs "
        "before reading any other REGRESSED row as real: repeated "
        "same-code runs this round flipped different rows in and out of "
        "REGRESSED each time (an earlier 62-entry run showed 0), so "
        "rows that flip between runs are co-tenant load, not code — "
        "only a delta that reproduces across runs AND coincides with a "
        "plan-inventory change is a real regression.",
    ]
    out = os.path.join(REPO, "BENCH", "VARIANCE.md")
    with open(out, "w") as f:
        f.write("\n".join(md) + "\n")
    print(f"wrote {out}: {n_regress} regressions, {n_improve} improvements")


if __name__ == "__main__":
    main()
