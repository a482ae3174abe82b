"""Dedup-family at-scale evidence run (VERDICT r04 #1).

Synthesizes a boilerplate-skewed web corpus IN SPARK (codegen only — no
driver materialization, no external data) and runs the two headline
dedup operators end-to-end:

- ``exact_duplicates``  — hash-first exact dedup (24-byte shuffle keys)
- ``minhash_lsh_pairs`` — banded MinHash LSH with hot-bucket capping +
  exact Jaccard verification

Corpus shape (deterministic in ``doc_id``):

- 20% boilerplate pages: text drawn verbatim from one of 5 templates —
  five exact-duplicate groups of N/25 docs each, which also makes every
  LSH band bucket those docs share ~N/25 hot (≫ ``max_bucket``), so the
  hot-bucket cap is actually exercised, not just present in the plan.
- 0.1% near-duplicate clones: doc ``i`` (i % 1000 == 57, a residue outside the
  boilerplate stratum) gets a partner
  ``i + N`` equal except the last word — the true pairs LSH must find.
- the rest: unique 15-word documents from an LCG word mix.

Evidence recorded per operator: wall s, input rows/s, result
cardinality, JVM peak RSS (VmHWM), and for LSH the capped-bucket count
plus dropped-row total.  Determinism across cluster layouts is proven
by re-running LSH at a second shuffle-partition count and comparing a
commutative full-result fingerprint (sum + xor of per-row xxhash64) —
the BENCH/BILLION.md flagship contract applied to dedup.

Usage: python scripts/dedup_scale_demo.py [n_docs] [lsh_docs]
(defaults 1e9 exact / 1e8 LSH; both runs stream — peak memory is flat.)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

N_TEMPLATES = 5
BOILER_PCT = 20  # % of docs that are boilerplate copies
CLONE_MOD = 1000  # 1/CLONE_MOD docs get a near-dup partner
WORDS = 15


def corpus(spark, n_docs: int, partitions: int):
    """Deterministic synthetic corpus [doc_id, text]; codegen only."""
    base = spark.range(0, n_docs, 1, partitions)
    is_boiler = (F.col("id") % 100) < BOILER_PCT
    tpl = F.col("id") % N_TEMPLATES
    # boilerplate: 15 words fully determined by the template id
    boiler_words = [
        F.concat(F.lit(f"b{w}_"), ((tpl * 7919 + w * 104729) % 9973).cast("string"))
        for w in range(WORDS)
    ]
    # unique body: hash-mixed words.  NOT a linear LCG — with
    # word(id, w) linear in id, ids differing by the right residue
    # produce word sequences that are exact TRANSLATES of each other
    # (shift-s overlap → Jaccard (13−s)/(13+s) ≥ 0.6 for s ≤ 3), which
    # manufactured ~2.8M bogus near-dup pairs at 10⁷ docs before the
    # xxhash64 mix replaced it.
    uniq_words = [
        F.concat(
            F.lit("w"),
            F.pmod(F.xxhash64(F.col("id"), F.lit(w)), F.lit(50_000_000)).cast("string"),
        )
        for w in range(WORDS)
    ]
    text = F.when(is_boiler, F.concat_ws(" ", *boiler_words)).otherwise(
        F.concat_ws(" ", *uniq_words)
    )
    docs = base.select(F.col("id").alias("doc_id"), text.alias("text"))
    # near-dup clones: same words except the last one
    clone_src = base.filter((F.col("id") % CLONE_MOD) == 57)
    clone_text = F.concat_ws(" ", *uniq_words[:-1], F.lit("zz_changed"))
    clones = clone_src.select(
        (F.col("id") + n_docs).alias("doc_id"), clone_text.alias("text")
    )
    return docs.unionByName(clones)


def jvm_peak_mb() -> float:
    """Peak RSS (VmHWM) of the Spark driver JVM child process."""
    import subprocess

    try:
        out = subprocess.run(
            ["pgrep", "-f", "org.apache.spark.deploy.SparkSubmit"],
            capture_output=True, text=True,
        ).stdout.split()
        peaks = []
        for pid in out:
            with open(f"/proc/{pid}/status") as f:
                for ln in f:
                    if ln.startswith("VmHWM"):
                        peaks.append(int(ln.split()[1]) / 1024.0)
    except OSError:
        return -1.0
    return max(peaks) if peaks else -1.0


def fingerprint(df):
    """Commutative full-result fingerprint: count + sum + xor of
    per-row xxhash64 over the canonicalized row string — order- and
    partitioning-invariant, no driver materialization."""
    h = F.xxhash64(F.concat_ws("|", *[F.col(c).cast("string") for c in df.columns]))
    row = df.select(
        F.count("*").alias("n"),
        F.sum(h.cast("decimal(38,0)")).alias("hsum"),  # ANSI-safe sum
        F.bit_xor(h).alias("hxor"),
    ).collect()[0]
    return (row["n"], int(row["hsum"] or 0), int(row["hxor"] or 0))


def _reclaim_shuffle(spark) -> None:
    """Drop cached frames and nudge the JVM ContextCleaner so the
    previous layout's shuffle files leave disk before the next one
    starts — a 10⁸-doc LSH layout writes tens of GB of shuffle, and
    two layouts plus the cached shingle table overran /tmp on the
    first full-scale attempt (java.io.IOException: No space left)."""
    import gc
    import time as _t

    spark.catalog.clearCache()
    gc.collect()
    spark.sparkContext._jvm.System.gc()
    _t.sleep(5)


def main() -> None:
    n_exact = int(float(sys.argv[1])) if len(sys.argv) > 1 else 1_000_000_000
    n_lsh = int(float(sys.argv[2])) if len(sys.argv) > 2 else 100_000_000
    from greenex_py_spark.functions.dedup import (
        _band_signatures,
        _shingle_int,
        exact_duplicates,
        minhash_lsh_pairs,
        shingles,
    )
    from greenex_py_spark.session import get_spark

    spark = get_spark(app_name="dedup-scale-demo", cores=32)
    spark.sparkContext.setLogLevel("ERROR")
    out = {"n_exact": n_exact, "n_lsh": n_lsh}

    # -- exact dedup at n_exact docs (0 = skip) ---------------------------
    if n_exact:
        parts = max(256, n_exact // 500_000)
        docs = corpus(spark, n_exact, parts)
        t0 = time.time()
        g = exact_duplicates(docs).agg(
        F.count("*").alias("groups"), F.sum("n_dups").alias("dup_docs")
        ).collect()[0]
        dt = time.time() - t0
        total_rows = n_exact + n_exact // CLONE_MOD  # clones ride along
        out["exact"] = {
            "wall_s": round(dt, 1),
            "rows_per_s": round(total_rows / dt / 1e6, 2),
            "dup_groups": g["groups"],
            "dup_docs": int(g["dup_docs"]),
            "jvm_peak_mb": round(jvm_peak_mb(), 0),
        }
        print("exact:", json.dumps(out["exact"]), flush=True)
        _reclaim_shuffle(spark)

    # -- MinHash LSH at n_lsh docs, two partition layouts ------------------
    parts = max(128, n_lsh // 500_000)
    docs = corpus(spark, n_lsh, parts)
    fps = {}
    # SPARK_GRAFT_LSH_LAYOUTS="64" lets a wrapper run each layout in
    # its OWN process (scratch disk frees at process exit — two layouts
    # in one process peak at ~2x the shuffle footprint, which overran
    # the shared box twice); fingerprints print per run for the
    # cross-process comparison.
    layouts = tuple(
        int(x)
        for x in os.environ.get("SPARK_GRAFT_LSH_LAYOUTS", "64,256").split(",")
    )
    for sp in layouts:
        spark.conf.set("spark.sql.shuffle.partitions", str(sp))
        t0 = time.time()
        pairs = minhash_lsh_pairs(docs, threshold=0.6, max_bucket=1000)
        fps[sp] = fingerprint(pairs)
        dt = time.time() - t0
        _reclaim_shuffle(spark)
        out[f"lsh_sp{sp}"] = {
            "wall_s": round(dt, 1),
            "docs_per_s": round((n_lsh + n_lsh // CLONE_MOD) / dt / 1e6, 3),
            "pairs": fps[sp][0],
            "jvm_peak_mb": round(jvm_peak_mb(), 0),
        }
        print(f"lsh sp={sp}:", json.dumps(out[f"lsh_sp{sp}"]), flush=True)
        print(f"lsh fp sp={sp}:", list(fps[sp]), flush=True)
    if len(layouts) > 1:
        out["lsh_rows_identical"] = len({fps[sp] for sp in layouts}) == 1

    # -- hot-bucket cap diagnostics (shared _band_signatures builder) ------
    from greenex_py_spark.functions.dedup import SID_MOD

    sh = shingles(docs, 3, "doc_id", "text").select(
        "id", (_shingle_int(F.col("sh")) % SID_MOD).alias("sid")
    )
    bstats = (
        _band_signatures(sh, 16, 4)
        .groupBy("band", "bsig").agg(F.count("*").alias("bn"))
        .filter(F.col("bn") > 1000)
        .agg(F.count("*").alias("capped_buckets"),
             F.sum("bn").alias("rows_in_capped"))
        .collect()[0]
    )
    out["capped_buckets"] = int(bstats["capped_buckets"] or 0)
    out["rows_in_capped_buckets"] = int(bstats["rows_in_capped"] or 0)
    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
