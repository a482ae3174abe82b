"""Text-analysis operators for the web-pages pipeline.

Language-ID, quality scoring, token stats, and document fingerprinting —
the per-document text passes a 100 TB training-data pipeline runs before
spatial enrichment.  Everything here is **pure relational/codegen** Spark
(split/explode/groupBy/window + built-in hash functions); no Python UDFs,
so whole-stage codegen handles the hot path and every operator has an
exact DuckDB oracle.

The byte-identity invariant (BASELINE.json input_hint): none of these
operators rewrite ``text`` — they only derive columns keyed by doc/url,
verified in tests via md5(text) round-trips.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# stopword sets for the language-ID heuristic (deterministic, tiny)
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "to", "and", "in"),
    "de": ("der", "die", "das", "und", "nicht", "ist"),
    "nl": ("de", "het", "een", "en", "niet", "is"),
    "es": ("el", "la", "de", "y", "que", "es"),
    "fr": ("le", "la", "et", "les", "des", "est"),
}

STOPWORDS_EN = ("the", "a", "of", "to", "and", "in", "for", "on", "with", "at", "by", "from")


def tokens(df: DataFrame, text_col: str = "text") -> DataFrame:
    """+ ``toks array<string>`` (single-space tokenizer — the corpus
    contract; a BPE-ish regex variant is `tokens_regex`)."""
    return df.withColumn("toks", F.split(F.col(text_col), " "))


def tokens_regex(df: DataFrame, text_col: str = "text") -> DataFrame:
    """BPE-ish tokenizer: splits on non-alphanumerics, keeps them
    (regexp-based; for corpora with punctuation)."""
    return df.withColumn(
        "toks",
        F.filter(F.split(F.col(text_col), r"(?=[^\w])|(?<=[^\w])"), lambda t: t != ""),
    )


def token_stats(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """[id, n_tokens, n_chars, avg_token_len, stop_ratio] — token counting
    + stopword ratio, all codegen (no explode: array higher-order fns)."""
    t = tokens(df.select(id_col, text_col), text_col)
    n_tok = F.size("toks")
    n_stop = F.size(F.filter("toks", lambda x: x.isin(*STOPWORDS_EN)))
    return t.select(
        id_col,
        n_tok.alias("n_tokens"),
        F.length(text_col).alias("n_chars"),
        F.round(
            (F.length(text_col) - n_tok + 1) / n_tok.cast("double"), 3
        ).alias("avg_token_len"),
        F.round(n_stop / n_tok.cast("double"), 3).alias("stop_ratio"),
    )


def quality_score(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """[id, quality] — deterministic 0..1 quality heuristic:
    length factor × (1 − stopword excess) × short-token penalty.

    Mirrors the Gopher/C4-style filters' *shape* (length, stop ratio,
    mean word length) with an exactly-reproducible formula.
    """
    t = tokens(df.select(id_col, text_col), text_col)
    return t.select(
        id_col, F.round(quality_expr(text_col, "toks"), 3).alias("quality")
    )


def quality_expr(text_col: str, toks_col: str):
    """The quality formula as a column expression over a text column and
    its materialized token array — shared by `quality_score` and
    `domain_stats` so the two cannot drift."""
    n_tok = F.size(toks_col).cast("double")
    n_stop = F.size(
        F.filter(toks_col, lambda x: x.isin(*STOPWORDS_EN))
    ).cast("double")
    mean_len = (F.length(text_col) - n_tok + 1) / n_tok
    len_f = F.least(n_tok / 64.0, F.lit(1.0))
    stop_f = F.lit(1.0) - F.least(n_stop / n_tok * 4.0, F.lit(1.0))
    word_f = F.when((mean_len >= 3.0) & (mean_len <= 10.0), 1.0).otherwise(0.5)
    return len_f * stop_f * word_f


def unigram_logprob(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """[id, avg_logprob] — mean per-token log₁₀ unigram probability under
    the corpus's own empirical distribution (the CCNet-style LM-quality
    signal: boilerplate scores high, gibberish scores low).

    The only text operator needing a **corpus-level statistic**: one
    token explode → groupBy(token) count (map-side combined) → rejoin to
    the token stream → per-doc mean.  The vocabulary table carries NO
    broadcast hint: on a 100 TB corpus the vocabulary grows with corpus
    size and a forced broadcast OOMs executors, so the scale plan is a
    shuffle join on ``tok`` — AQE still picks a broadcast at small SF
    where the dim genuinely fits (size-based, the right call both ways).
    The scalar grand total IS broadcast (1 row by construction) and is
    computed from the document stream (sum of per-doc token counts,
    map-side partial agg) rather than a second pass over the vocabulary.
    """
    toks = df.select(
        F.col(id_col).alias("_id"), F.explode(F.split(F.col(text_col), " ")).alias("tok")
    )
    freqs = toks.groupBy("tok").agg(F.count("*").alias("tf"))
    total = df.agg(
        F.sum(F.size(F.split(F.col(text_col), " "))).alias("_total")
    )
    lp = F.log10(F.col("tf").cast("double") / F.col("_total"))
    scored = toks.join(freqs, "tok").crossJoin(F.broadcast(total))
    return (
        scored.groupBy("_id")
        .agg(F.round(F.avg(lp), 6).alias("avg_logprob"))
        .withColumnRenamed("_id", id_col)
    )


def language_id(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """[id, pred_lang] — stopword-vote language ID with deterministic
    tie-break (score desc, then language code asc)."""
    t = tokens(df.select(id_col, text_col), text_col)

    def _in(sw):  # closure factory: the lambda must be unary for F.filter
        return lambda x: x.isin(*sw)

    scores = [
        F.size(F.filter("toks", _in(sw))).alias(f"s_{lang}")
        for lang, sw in LANG_STOPWORDS.items()
    ]
    scored = t.select(id_col, *scores)
    # argmax via greatest + chained when (deterministic tie-break by code)
    langs = sorted(LANG_STOPWORDS)
    best = F.greatest(*[F.col(f"s_{lg}") for lg in langs])
    pred = None
    for lg in langs:
        cond = F.col(f"s_{lg}") == best
        pred = F.when(cond, lg) if pred is None else pred.when(cond, lg)
    return scored.select(id_col, pred.alias("pred_lang"))


def fingerprint(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """[id, fp] — 64-bit document fingerprint (xxhash64 of the exact text
    bytes).  The rolling-hash shingle variant lives in dedup.simhash."""
    return df.select(id_col, F.xxhash64(F.col(text_col)).alias("fp"))


# winnowing constants (Karp–Rabin base/modulus; portable int64 arithmetic:
# Horner acc < P ≈ 1e9, acc·B + tok < 1e15+2³² — far inside int64)
FP_B = 1_000_003
FP_P = 1_000_000_007


def winnow_fingerprints(
    df: DataFrame,
    k: int = 5,
    window: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """[id, fp] — winnowing document fingerprints (Schleimer/Wilkerson/
    Aiken, the MOSS algorithm): token k-gram Karp–Rabin rolling hashes,
    then the minimum hash of every `window` consecutive grams, distinct.

    Guarantees: any shared token run of length ≥ k+window−1 between two
    documents yields a shared fingerprint — the standard copy-detection
    primitive a training-data pipeline runs corpus-wide.

    Shape: ``posexplode`` the token stream, hash each token **once**,
    build the k-gram Horner hash from ``lead()`` columns, take the
    window minimum as ``least()`` of lead'ed gram hashes — one shuffle
    (hash-partition by document id), every md5 computed exactly once,
    all arithmetic JVM-side.  (A first cut used nested array
    higher-order functions — transform/aggregate/slice — but lambda
    bodies are *interpreted* and re-evaluate their subtree per element,
    which made the expression O(n³) md5 calls per document; the window
    formulation is the scalable one.)  The token hash is md5-derived so
    DuckDB reproduces it bit-for-bit.  Documents shorter than k tokens
    emit no fingerprints.
    """
    toksed = df.select(
        F.col(id_col).alias("_id"),
        F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "tok"),
    ).withColumn("th", F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("long"))
    wseq = Window.partitionBy("_id").orderBy("pos")
    # Horner fold over the k tokens starting at pos, via lead columns
    # (null past the end of the document → gh null → dropped, so docs
    # shorter than k tokens produce no grams)
    gh = F.pmod(F.col("th"), F.lit(FP_P))
    for j in range(1, k):
        gh = F.pmod(gh * FP_B + F.lead("th", j).over(wseq), F.lit(FP_P))
    grams = toksed.select("_id", "pos", gh.alias("gh")).filter(F.col("gh").isNotNull())
    # winnow: fp(j) = min(gh[j..j+w-1]); least() skips trailing nulls, so
    # documents with fewer than w grams yield one fp = min of all grams
    gw = Window.partitionBy("_id").orderBy("pos")
    fp = F.least(*[F.lead("gh", j).over(gw) for j in range(window)])
    out = grams.select(
        "_id",
        fp.alias("fp"),
        F.row_number().over(gw).alias("_rn"),
        F.count("*").over(Window.partitionBy("_id")).alias("_gc"),
    ).filter(F.col("_rn") <= F.greatest(F.col("_gc") - (window - 1), F.lit(1)))
    return out.select(F.col("_id").alias(id_col), "fp").distinct()


def gopher_quality(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
) -> DataFrame:
    """[id, n_words, mean_word_len, stop_distinct, alpha_frac, keep] —
    Gopher-style document-level quality rules (Rae et al. 2021, table
    A1), the word-shape half (the repetition half is
    `gopher_repetition`):

    - word count in [min_words, max_words],
    - mean word length in [3, 10] characters,
    - >= 2 DISTINCT stopwords present (Gopher's "contains at least two
      of a small stop set" rule),
    - >= 80% of words contain an alphabetic character.

    Symbol-ratio rules (hashtag/ellipsis) and line rules (bullet
    prefixes) are omitted: the corpus contract is single-space prose
    with no lines, so they'd be constants here.

    ``keep`` is int (0/1) so the hash never depends on bool dtype.
    ``mean_word_len`` uses the single-space identity
    (chars - (n-1)) / n and is compared UNROUNDED (both engines compute
    the identical double from identical ints), rounded only for output.
    All codegen: one projection over the scan, array ops on a
    materialized token array — no explode, no shuffle, no UDF.
    """
    t = tokens(df.select(id_col, text_col), text_col)
    n = F.size("toks")
    mean_len = (F.length(text_col) - n + 1) / n.cast("double")
    stop_distinct = F.size(
        F.array_intersect(
            F.array_distinct("toks"), F.array(*[F.lit(s) for s in STOPWORDS_EN])
        )
    )
    alpha_frac = (
        F.size(F.filter("toks", lambda x: x.rlike("[a-zA-Z]"))) / n.cast("double")
    )
    keep = (
        n.between(min_words, max_words)
        & (mean_len >= 3.0)
        & (mean_len <= 10.0)
        & (stop_distinct >= 2)
        & (alpha_frac >= 0.8)
    )
    return t.select(
        id_col,
        n.alias("n_words"),
        F.round(mean_len, 6).alias("mean_word_len"),
        stop_distinct.alias("stop_distinct"),
        F.round(alpha_frac, 6).alias("alpha_frac"),
        keep.cast("int").alias("keep"),
    )


def gopher_repetition(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """[id, top2_frac, top3_frac, dup2_frac] — Gopher-style within-document
    repetition signals (Rae et al. 2021, "Scaling Language Models", table
    A1: fraction of content in the most common 2-/3-gram and in duplicated
    n-grams).  Token-based variant (the corpus contract tokenizes on a
    single space):

    - ``top2_frac`` = (count of the most frequent bigram × 2) / n_tokens
    - ``top3_frac`` = (count of the most frequent trigram × 3) / n_tokens
    - ``dup2_frac`` = bigram occurrences in bigrams seen ≥ 2× / n_bigrams

    Documents with fewer than 3 tokens are dropped (no trigram exists).
    All three are round-6 so FP summation order can't flip downstream
    filters.

    Shape: the token array is materialized once; bigrams/trigrams are
    eval-once relational ``slice`` + ``arrays_zip`` + explode (no
    interpreted higher-order-function lambdas).  Per-document n-gram
    counting is a two-level keyed aggregation — map-side partial combine
    on (doc, gram), then a per-doc rollup — so state is bounded by the
    document, never the corpus: the shape survives 100 TB unchanged.
    """
    t = df.select(
        F.col(id_col).alias("_id"), F.split(F.col(text_col), " ").alias("_toks")
    ).filter(F.size("_toks") >= 3)
    n2 = F.size("_toks") - 1
    n3 = F.size("_toks") - 2
    grams = t.select(
        "_id",
        F.explode(
            F.arrays_zip(
                F.slice("_toks", 1, n2).alias("w1"),
                F.slice("_toks", 2, n2).alias("w2"),
                # trigram third token: null on the final bigram position
                F.slice(
                    F.concat("_toks", F.array(F.lit(None).cast("string"))), 3, n2
                ).alias("w3"),
            )
        ).alias("g"),
    ).select("_id", F.col("g.w1").alias("w1"), F.col("g.w2").alias("w2"), F.col("g.w3").alias("w3"))
    c2 = grams.groupBy("_id", "w1", "w2").agg(F.count("*").alias("c2"))
    a2 = c2.groupBy("_id").agg(
        F.max("c2").alias("mx2"),
        F.sum(F.when(F.col("c2") >= 2, F.col("c2")).otherwise(F.lit(0))).alias("dup2"),
        F.sum("c2").alias("nb"),
    )
    c3 = (
        grams.filter(F.col("w3").isNotNull())
        .groupBy("_id", "w1", "w2", "w3")
        .agg(F.count("*").alias("c3"))
    )
    a3 = c3.groupBy("_id").agg(F.max("c3").alias("mx3"))
    ntok = F.col("nb") + 1
    return (
        a2.join(a3, "_id")
        .select(
            F.col("_id").alias(id_col),
            F.round(F.col("mx2") * 2 / ntok.cast("double"), 6).alias("top2_frac"),
            F.round(F.col("mx3") * 3 / ntok.cast("double"), 6).alias("top3_frac"),
            F.round(F.col("dup2") / F.col("nb").cast("double"), 6).alias("dup2_frac"),
        )
    )


# entity decode order is part of the contract: &amp; LAST, so escaped
# entity references (&amp;lt;) decode to the literal entity text (&lt;)
# instead of cascading into markup.  Shared with the oracle generator.
HTML_ENTITIES: tuple[tuple[str, str], ...] = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
)


def html_extract_text(
    df, html_col: str = "html", out_col: str = "extracted",
):
    """+ [out_col] — text extracted from the crawl page's raw ``html``
    binary: UTF-8 decode → drop ``<script>``/``<style>`` element
    **content** (a bare tag-strip would leak JS/CSS bodies into the
    text, and un-quoted ``<`` inside scripts corrupts the tag regex) →
    drop ``<!-- -->`` comment content (ad markers, conditional IE
    blocks — comments may hold tags, so they go before the tag strip) →
    strip tags → decode the common entities (named five + nbsp;
    ``&amp;`` LAST so ``&amp;lt;`` yields the literal text ``&lt;``,
    and decode AFTER the strip so escaped markup stays text) →
    collapse runs of whitespace → trim.  Pure codegen
    (decode/regexp_replace/trim — zero Python), the first stage of every
    HTML-corpus pipeline; swap the regex chain for a real DOM extractor
    (trafilatura-style) behind the same column contract on a cluster
    image.  Script/style/comment bodies are replaced by a single space
    (block elements — their removal must not glue adjacent words)."""
    from pyspark.sql import functions as F

    decoded = F.decode(F.col(html_col), "UTF-8")
    no_script = F.regexp_replace(decoded, "(?is)<script\\b[^>]*>.*?</script\\s*>", " ")
    no_style = F.regexp_replace(no_script, "(?is)<style\\b[^>]*>.*?</style\\s*>", " ")
    no_comment = F.regexp_replace(no_style, "(?s)<!--.*?-->", " ")
    stripped = F.regexp_replace(no_comment, "<[^>]*>", "")
    ent = stripped
    for pat, rep in HTML_ENTITIES:
        ent = F.regexp_replace(ent, pat, rep)
    return df.withColumn(
        out_col, F.trim(F.regexp_replace(ent, "\\s+", " "))
    )


def bigram_logprob(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """[id, avg_logprob2] — mean per-transition log₁₀ conditional bigram
    probability  P(wᵢ | wᵢ₋₁) = count(wᵢ₋₁ wᵢ)/count(wᵢ₋₁·)  under the
    corpus's own empirical distribution (the order-2 step toward the
    CCNet 5-gram LM; unigram_logprob is order 1).  Self-trained, so no
    transition in a scored document is unseen — no smoothing needed for
    the in-corpus scoring signal.  Single-token documents have no
    transitions and emit null.

    Shape: one bigram explode feeds both the numerator counts (groupBy
    bigram) and, re-aggregated, the denominator counts (groupBy first
    token) — rejoined onto the bigram stream.  The bigram table carries
    NO broadcast hint: bigram vocabulary grows roughly with corpus size,
    so at 100 TB a forced broadcast OOMs executors — the scale plan is a
    shuffle join on ``(w1, w2)``, and AQE downgrades it to a broadcast
    only at small SF where the dim genuinely fits (size-based).  To
    bound the LM table instead (CCNet-style), pre-filter ``c2`` with
    ``sketches.heavy_hitters`` top-K before the rejoin.

    Bigram construction is eval-once relational: the token array is
    materialized ONCE per row, then ``slice`` + ``arrays_zip`` + explode
    — no interpreted higher-order-function lambda (those re-evaluate
    their subtree per element: the old ``transform(sequence(...),
    i -> element_at(split(...), i))`` cost O(tokens × doc_len) per
    document).
    """
    t = df.select(
        F.col(id_col).alias("_id"), F.split(F.col(text_col), " ").alias("_toks")
    ).filter(F.size("_toks") >= 2)
    n1 = F.size("_toks") - 1
    pairs = t.select(
        "_id",
        F.slice("_toks", 1, n1).alias("w1s"),
        F.slice("_toks", 2, n1).alias("w2s"),
    )
    bi = pairs.select("_id", F.explode(F.arrays_zip("w1s", "w2s")).alias("g")).select(
        "_id", F.col("g.w1s").alias("w1"), F.col("g.w2s").alias("w2")
    )
    c2 = bi.groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    c1 = c2.groupBy("w1").agg(F.sum("c2").alias("c1"))
    dim = c2.join(c1, "w1")
    scored = bi.join(dim, ["w1", "w2"])
    return (
        scored.groupBy("_id")
        .agg(F.round(F.avg(F.log10(F.col("c2").cast("double") / F.col("c1"))), 6).alias("avg_logprob2"))
        .withColumnRenamed("_id", id_col)
    )


# PII patterns, ordered: email first (its local part may contain digits a
# later pattern would half-eat), then dotted IPv4, then phone-shaped digit
# runs.  The dialect is the Java-regex ∩ RE2 common subset ([...], \d, \b,
# {m,n} — no lookaround, no backrefs) so the DuckDB oracle can run the
# SAME patterns verbatim.
PII_PATTERNS = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    (r"\+?\d[\d -]{7,}\d", "<PHONE>"),
)


def redact_pii(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "redacted",
) -> DataFrame:
    """[id, redacted, n_pii] — PII scrubbing for crawl curation: emails,
    dotted-quad IPs and phone-shaped digit runs are replaced with typed
    placeholder tokens (the C4/RefinedWeb release practice; reference
    GreenEx_Py has no text pipeline — this is beyond-reference curation
    surface).  ``n_pii`` counts replacements across all three classes.

    Pure whole-stage-codegen ``regexp_replace``/``regexp_count`` chain —
    no shuffle, no Python; embarrassingly parallel at any corpus size.
    Replacement is sequential per PII_PATTERNS order, so a phone number
    inside an already-redacted email is never double-counted.
    """
    out = F.col(text_col)
    n = F.lit(0)
    for pat, tok in PII_PATTERNS:
        n = n + F.regexp_count(out, F.lit(pat))
        out = F.regexp_replace(out, pat, tok)
    return df.select(
        F.col(id_col),
        out.alias(out_col),
        n.cast("long").alias("n_pii"),
    )


def domain_stats(
    df: DataFrame,
    domain_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """[domain, n_docs, n_dup_docs, mean_quality, mean_tokens] — per-domain
    reputation table, the crawl-curation signal used to allow/block whole
    hosts (CCNet §4 aggregates quality per domain; RefinedWeb blocklists
    by URL host).  ``n_dup_docs`` counts documents whose exact text
    (md5 + byte length, the `exact_duplicates` hash-first contract)
    appears more than once ANYWHERE in the corpus — cross-domain
    duplication damns the domain that hosts it.

    Shape: per-doc quality/token columns are doc-bounded projections;
    the corpus-wide dup flag is one digest-keyed groupBy (24-byte keys,
    never text) whose output joins back to docs on digest — AQE sizes
    that join (dup digests ≪ corpus).  Final rollup is a single
    per-domain aggregation.  The output is a genuine dimension table
    (domains ≪ documents) — safe to broadcast downstream.
    """
    t = df.select(
        F.col(domain_col).alias("domain"),
        F.col(id_col).alias("_id"),
        F.md5(F.col(text_col)).alias("_digest"),
        F.octet_length(F.col(text_col)).alias("_len"),
        F.split(F.col(text_col), " ").alias("_toks"),
        F.col(text_col).alias("_text"),
    )
    # per-doc quality is carried as an exact milli-int so the domain
    # rollup sums INTEGERS — order-independent across partitions, unlike
    # a float avg whose low bits depend on FP summation order
    scored = t.select(
        "domain", "_id", "_digest", "_len",
        F.round(F.round(quality_expr("_text", "_toks"), 3) * 1000)
        .cast("long").alias("_qm"),
        F.size("_toks").cast("long").alias("_nt"),
    )
    dups = (
        scored.groupBy("_digest", "_len")
        .agg(F.count("*").alias("_n"))
        .filter(F.col("_n") >= 2)
        .select("_digest", "_len")
    )
    flagged = scored.join(
        dups.withColumn("_dup", F.lit(1)), ["_digest", "_len"], "left"
    )
    n = F.count("*")
    return (
        flagged.groupBy("domain")
        .agg(
            n.alias("n_docs"),
            F.sum(F.coalesce("_dup", F.lit(0))).alias("n_dup_docs"),
            F.round(F.sum("_qm") / 1000.0 / n, 6).alias("mean_quality"),
            F.round(F.sum("_nt") / n.cast("double"), 6).alias("mean_tokens"),
        )
    )


def length_quantiles(
    df: DataFrame,
    group_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """[group, n_docs, p50, p90, p99] — per-group token-length
    distribution, the corpus-health dashboard every curation run reads
    before setting Gopher-style length cutoffs.  Exact linear-
    interpolation quantiles (both Spark `percentile` and DuckDB
    `quantile_cont` implement Hyndman–Fan type 7, so the oracle is
    closed-form).

    Scale note: exact percentile collects the per-group value MULTISET
    on one reducer — fine for token lengths (ints, millions per group
    compress to a count-map), and grouped by language so no single
    reducer sees the whole corpus.  For heavy-tailed value domains at
    100 TB the approximate twin is `percentile_approx` (t-digest,
    bounded state); the exact form is kept here because the gate
    demands bit-reproducibility.
    """
    t = df.select(
        F.col(group_col).alias("grp"),
        F.size(F.split(F.col(text_col), " ")).alias("n"),
    )
    q = t.groupBy("grp").agg(
        F.count("*").alias("n_docs"),
        F.percentile("n", F.lit([0.5, 0.9, 0.99])).alias("_q"),
    )
    return q.select(
        F.col("grp").alias(group_col),
        "n_docs",
        F.round(F.col("_q")[0], 6).alias("p50"),
        F.round(F.col("_q")[1], 6).alias("p90"),
        F.round(F.col("_q")[2], 6).alias("p99"),
    )


def pmi_bigrams(
    df: DataFrame,
    min_count: int = 5,
    top_k: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """[w1, w2, c2, pmi, rank] — top-k collocations by pointwise mutual
    information, PMI = ln(c₂·N / (c₁(w1)·c₁(w2))) with N = total token
    count (Church & Hanks 1990) — the classic phrase-mining signal for
    tokenizer vocab construction.

    Scale shape: bigram/unigram counts are keyed two-phase aggregations
    (the `bigram_logprob` machinery without the per-doc rejoin);
    ``min_count`` prunes the tail BEFORE the global top-k sort, so the
    ordered window sees only frequent pairs (≪ corpus).  PMI is rounded
    to 6 dp before ranking and ties break on (w1, w2) — ranking can
    never be flipped by FP noise (CLAUDE.md convention).
    """
    t = df.select(F.split(F.col(text_col), " ").alias("_toks")).filter(
        F.size("_toks") >= 2
    )
    n1 = F.size("_toks") - 1
    bi = (
        t.select(
            F.explode(
                F.arrays_zip(
                    F.slice("_toks", 1, n1).alias("w1"),
                    F.slice("_toks", 2, n1).alias("w2"),
                )
            ).alias("g")
        )
        .select(F.col("g.w1").alias("w1"), F.col("g.w2").alias("w2"))
    )
    c2 = bi.groupBy("w1", "w2").agg(F.count("*").alias("c2")).filter(
        F.col("c2") >= min_count
    )
    uni = (
        df.select(F.explode(F.split(F.col(text_col), " ")).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c1"))
    )
    tot = df.agg(
        F.sum(F.size(F.split(F.col(text_col), " "))).alias("nt")
    )  # 1 row
    scored = (
        c2.join(uni.withColumnsRenamed({"w": "w1", "c1": "c1a"}), "w1")
        .join(uni.withColumnsRenamed({"w": "w2", "c1": "c1b"}), "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "w1", "w2", "c2",
            F.round(
                F.log(
                    F.col("c2") * F.col("nt")
                    / (F.col("c1a") * F.col("c1b")).cast("double")
                ),
                6,
            ).alias("pmi"),
        )
    )
    w = Window.orderBy(F.desc("pmi"), "w1", "w2")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
    )


def ccnet_buckets(
    df: DataFrame,
    group_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """[id, group, avg_logprob, bucket] — CCNet-style quality bucketing
    (Wenzek et al. 2020 §4.3): per-language LM score tertiles split the
    corpus into head / middle / tail; training pipelines keep head+middle
    or re-weight by bucket.  The LM signal is `unigram_logprob` (higher
    log-prob = more fluent under the corpus's own distribution, CCNet's
    lower-perplexity = head orientation).

    Cutoffs are the exact type-7 tertiles of the ROUND-6 per-doc scores
    (rounding before the quantile keeps the cutoff arithmetic identical
    across engines); they are computed as a window aggregate over the
    language partition, NOT a groupBy+join-back — Catalyst does not reuse
    common subtrees across join arms, so the join-back shape would
    re-evaluate the whole two-pass unigram LM (token explode + vocab agg)
    a second time (CLAUDE.md anti-join convention; measured 2x the LM
    subtree in the physical plan).  One language = one window partition,
    the same per-language locality any grouping needs; per-doc state is
    one score.  Boundary docs (score == cutoff) land in the better
    bucket (>=).
    """
    lp = unigram_logprob(df, id_col=id_col, text_col=text_col)
    scored = df.select(
        F.col(id_col), F.col(group_col).alias("grp")
    ).join(lp, id_col)
    w = Window.partitionBy("grp")
    return (
        scored.withColumn(
            "_q", F.percentile("avg_logprob", F.lit([1 / 3, 2 / 3])).over(w)
        )
        .select(
            id_col,
            F.col("grp").alias(group_col),
            "avg_logprob",
            F.when(F.col("avg_logprob") >= F.col("_q")[1], "head")
            .when(F.col("avg_logprob") >= F.col("_q")[0], "middle")
            .otherwise("tail")
            .alias("bucket"),
        )
    )


# GPT-2-ish pretokenizer in the Java∩RE2 portable dialect: letter runs,
# digit runs, punctuation runs, each with an optional leading space
# (GPT-2's \p{L}/\p{N} classes and the trailing-space lookahead are not
# portable; ASCII classes + no lookahead keep Spark and DuckDB
# bit-identical).  Alternatives are first-char disjoint, so Java's and
# RE2's leftmost-first alternation agree.
# Flesch reading-ease: sentence suffixes planted per doc_id % 3 (the
# fixture corpus carries no punctuation), regex patterns shared with the
# oracle generator so the two sides cannot drift.  Classes only — no
# lookarounds/backrefs — so Java (Spark) and RE2 (DuckDB) agree.
FLESCH_SUFFIXES: tuple[str, ...] = (". the end is here.", "! done now", "?")
FLESCH_WORD_RE = "[a-z]+"
FLESCH_SYLL_RE = "[aeiouy]+"
FLESCH_SENT_RE = "[.!?]+"


def flesch_reading_ease(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """[id, n_words, n_sents, n_sylls, flesch] — Flesch reading-ease

        206.835 - 1.015 * (words/sentences) - 84.6 * (syllables/words)

    with vowel-group syllable approximation (the standard heuristic —
    each maximal ``[aeiouy]+`` run is one syllable) and ``[.!?]+`` runs
    as sentence breaks.  A readability band is a stock quality-filter
    signal (C4 kept 3 <= FRE grade bands; Gopher reports it).

    Pure codegen: three ``regexp_count`` per doc — no explode, no
    shuffle, whole-stage-generated at any corpus size.  The sentence
    count is floored at 1 so punctuation-free docs stay defined.
    """
    v = F.col(text_col)
    n_w = F.regexp_count(v, F.lit(FLESCH_WORD_RE))
    n_sy = F.regexp_count(v, F.lit(FLESCH_SYLL_RE))
    n_se = F.greatest(F.regexp_count(v, F.lit(FLESCH_SENT_RE)), F.lit(1))
    flesch = (
        F.lit(206.835)
        - F.lit(1.015) * (n_w.cast("double") / n_se)
        - F.lit(84.6) * (n_sy.cast("double") / F.nullif(n_w, F.lit(0)))
    )
    return df.select(
        id_col,
        n_w.cast("long").alias("n_words"),
        n_se.cast("long").alias("n_sents"),
        n_sy.cast("long").alias("n_sylls"),
        F.round(flesch, 6).alias("flesch"),
    )


def bpe_pair_counts(
    df: DataFrame, text_col: str = "text", top_n: int = 20
) -> DataFrame:
    """[pair, cnt] — one BPE-training merge round: the ``top_n`` most
    frequent ADJACENT CHARACTER PAIRS over the corpus, weighted by word
    frequency (ties broken by pair asc, so the cut is a total order).

    This is the distributed core of tokenizer training (Sennrich 2016;
    HF tokenizers does exactly this per merge): a map-side-combinable
    word-frequency aggregation over the corpus, then pair extraction
    over the *vocabulary* — bounded by distinct-word count, not corpus
    size — so each merge round touches the 100 TB corpus exactly once
    (in practice once total, with rounds iterating on the vocab table).

    Pair positions come from ``explode(sequence(1, len-1))`` +
    ``substr`` — no interpreted array-lambda over the word subtree.
    """
    words = (
        df.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .filter(F.col("word") != "")
    )
    wf = words.groupBy("word").agg(F.count(F.lit(1)).alias("wf"))
    pairs = (
        wf.filter(F.length("word") >= 2)
        .withColumn("i", F.explode(F.sequence(F.lit(1), F.length("word") - 1)))
        .select(F.col("word").substr(F.col("i"), F.lit(2)).alias("pair"), "wf")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("wf").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("pair").asc())
        .limit(top_n)
    )


BPE_PATTERN = " ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+"


def bpe_token_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """[id, n_bpe_tokens, n_ws_tokens, fertility, bytes_per_token] —
    token counting under a BPE-style regex pretokenizer vs plain
    whitespace.  ``fertility`` (regex tokens per whitespace word) and
    ``bytes_per_token`` are the standard tokenizer-efficiency signals a
    curation pipeline budgets with (compression-ratio quality filters,
    per-language token accounting for mixture planning).

    Pure codegen: one regexp_extract_all + size per doc, no explode, no
    shuffle — the scan stays whole-stage-generated at any corpus size.
    """
    n_bpe = F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_PATTERN), 0))
    n_ws = F.size(F.split(F.col(text_col), " "))
    return df.select(
        id_col,
        n_bpe.alias("n_bpe_tokens"),
        n_ws.alias("n_ws_tokens"),
        F.round(n_bpe / n_ws.cast("double"), 6).alias("fertility"),
        F.round(F.length(text_col) / n_bpe.cast("double"), 6).alias(
            "bytes_per_token"
        ),
    )


# cp1252-misdecoded UTF-8 sequences → the character they originally
# encoded (the ftfy "mojibake" core table, restricted to sequences whose
# every byte IS mapped in cp1252 so the corruption is reversible).
# Entries are prefix-disjoint (Ã/â/Â lead-ins with distinct followers)
# and no replacement re-creates a pattern, so sequential literal
# replaces in ANY order equal one simultaneous pass — the oracle
# generator still mirrors this exact order.
MOJIBAKE_TABLE: tuple[tuple[str, str], ...] = (
    ("â€™", "’"),  # right single quote
    ("â€œ", "“"),  # left double quote
    ("â€“", "–"),  # en dash
    ("â€”", "—"),  # em dash
    ("â€¦", "…"),  # ellipsis
    ("Ã©", "é"),
    ("Ã¨", "è"),
    ("Ã¼", "ü"),
    ("Ã¶", "ö"),
    ("Ã¤", "ä"),
    ("Ã§", "ç"),
    ("Ã±", "ñ"),
    ("Ã¡", "á"),
    ("Ã³", "ó"),
    ("Ãº", "ú"),
    ("Â°", "°"),
    ("Â«", "«"),
    ("Â»", "»"),
)


def fix_mojibake(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """[id, text_fixed, n_fixed] — encoding repair for the classic crawl
    corruption (UTF-8 bytes decoded as cp1252: "cafÃ©" for "café",
    "â€™" for a right quote — what ftfy fixes): a literal
    replace chain over MOJIBAKE_TABLE, counting repairs per document.
    Literal `replace` (not regexp) keeps the chain regex-dialect-free —
    bit-identical across Spark and any SQL engine — and whole-stage
    codegen'd; ``n_fixed`` counts occurrences in the ORIGINAL text
    (valid because table entries are mutually non-creating).
    """
    fixed = F.col(text_col)
    counts = []
    for seq, rep in MOJIBAKE_TABLE:
        counts.append(
            (
                (F.length(text_col) - F.length(F.replace(F.col(text_col), F.lit(seq), F.lit(""))))
                / F.lit(len(seq))
            ).cast("long")
        )
        fixed = F.replace(fixed, F.lit(seq), F.lit(rep))
    n_fixed = counts[0]
    for c in counts[1:]:
        n_fixed = n_fixed + c
    return df.select(
        id_col, fixed.alias("text_fixed"), n_fixed.alias("n_fixed")
    )


# Deterministic "trained" weights for the hashed linear classifier: the
# hashing-trick bucket count and an LCG that maps bucket -> integer
# weight in [-CLS_SCALE, CLS_SCALE].  Integer-exact end to end (portable
# across Spark/DuckDB); only the FINAL per-doc mean divides.
CLS_BUCKETS = 4096
CLS_A = 1103515245
CLS_C = 12345
CLS_M = 2 * 1000 + 1  # odd modulus -> weights in [-1000, 1000]
CLS_SCALE = 1000


def hashed_classifier_score(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """[id, n_toks, quality_score, keep] — fastText-style linear quality
    classifier INFERENCE (the CCNet/LLaMA "Wikipedia-reference"
    keep/drop filter stage): each ws token is hashed into one of
    CLS_BUCKETS hashing-trick buckets (md5-derived, engine-portable),
    each bucket carries a deterministic weight (LCG over the bucket id,
    standing in for trained coefficients), and the document score is the
    mean token weight; ``keep`` is the sign test on the EXACT integer
    weight sum, so no float threshold can flip on summation order.

    Shape: zero shuffles — split once, one single-level ``transform``
    over the token array (md5 evaluated once per token; never nested,
    per the HOF mandate), one integer ``aggregate``.  A pure map stage:
    embarrassingly parallel at any corpus size, no vocabulary table to
    broadcast or join (the hashing trick is WHY fastText scales).
    """
    t = df.select(
        F.col(id_col).alias("_id"), F.split(F.col(text_col), " ").alias("_toks")
    )
    weights = F.transform(
        "_toks",
        lambda tok: (
            F.conv(F.substring(F.md5(tok), 1, 7), 16, 10).cast("long")
            % CLS_BUCKETS
            * CLS_A
            + CLS_C
        )
        % CLS_M
        - CLS_SCALE,
    )
    s = F.aggregate(weights, F.lit(0).cast("long"), lambda acc, x: acc + x)
    n = F.size("_toks")
    # UNROUNDED on purpose (exception to the round-6 convention): s and
    # n are exact integers, so the single division is bit-identical on
    # any IEEE engine — rounding would CREATE cross-engine ties (a
    # score of -0.0641875 at 6 dp: Spark HALF_UPs the decimal string,
    # DuckDB rounds the binary double; caught by the sf0.1 sweep).
    return t.select(
        F.col("_id").alias(id_col),
        n.cast("long").alias("n_toks"),
        (s / (F.lit(float(CLS_SCALE)) * n)).alias("quality_score"),
        (s > 0).alias("keep"),
    )


def zipf_slope(
    df: DataFrame,
    top_r: int = 50,
    n_salts: int = 8,
    domain_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """[domain, zipf_slope, n_terms] — per-domain Zipf exponent: the
    regression slope of log10(frequency) on log10(rank) over the top_r
    most frequent terms (natural text sits near -1; templated/spammy
    domains flatten — a corpus-health signal curation dashboards track).

    The top-k is TWO-PHASE exact: term counts are salted into n_salts
    sub-partitions, each takes its local top_r by (count desc, token
    asc) in a window, and only those n_salts x top_r survivors per
    domain meet the final window — the global top_r is always a subset
    of the union of per-salt top_rs, so no single task ever sorts a
    domain's full vocabulary (the naive PARTITION BY domain window
    would; vocabularies reach 1e8+ terms per domain at corpus scale).
    Ranking ties break on the token string, so the rank-boundary cut is
    engine-deterministic.
    """
    cnt = (
        df.select(
            F.col(domain_col).alias("domain"),
            F.explode(F.split(F.col(text_col), " ")).alias("tok"),
        )
        .groupBy("domain", "tok")
        .agg(F.count("*").alias("cnt"))
    )
    salt = F.pmod(F.xxhash64("tok"), F.lit(n_salts))
    w1 = Window.partitionBy("domain", "_salt").orderBy(
        F.col("cnt").desc(), F.col("tok").asc()
    )
    cand = (
        cnt.withColumn("_salt", salt)
        .withColumn("_rn", F.row_number().over(w1))
        .filter(F.col("_rn") <= top_r)
        .drop("_salt", "_rn")
    )
    w2 = Window.partitionBy("domain").orderBy(
        F.col("cnt").desc(), F.col("tok").asc()
    )
    top = cand.withColumn("rank", F.row_number().over(w2)).filter(
        F.col("rank") <= top_r
    )
    return top.groupBy("domain").agg(
        F.round(F.regr_slope(F.log10("cnt"), F.log10("rank")), 6).alias(
            "zipf_slope"
        ),
        F.count("*").alias("n_terms"),
    )


# accent-fold table (single codepoint -> ASCII, so one translate() call
# suffices in both engines); shared by the operator and the oracle
ACCENT_FROM = "áàâäãåçéèêëíìîïñóòôöõúùûüýÿ"
ACCENT_TO = "aaaaaaceeeeiiiinooooouuuuyy"


def normalize_text(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """[id, norm] — crawl-side text normalization: accent folding via a
    single shared-table ``translate`` (one codepoint -> one ASCII char,
    the NFD-strip core for Latin scripts), whitespace runs collapsed to
    one space, ends trimmed.  Pure codegen; the companion of
    `fix_mojibake` (bytes-level repair) one stage later in the pipeline.
    """
    t = F.translate(F.col(text_col), ACCENT_FROM, ACCENT_TO)
    t = F.regexp_replace(t, r"\s+", " ")
    return df.select(id_col, F.trim(t).alias("norm"))


def chunk_windows(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    win: int = 32,
    stride: int = 24,
) -> DataFrame:
    """[id, chunk_id, n_tok, chunk] — overlapping token windows (the
    RAG / embedding-ingestion splitter): window ``win`` tokens long,
    starts every ``stride`` tokens, last window keeps its natural
    (shorter) tail.  chunk_id = start // stride.

    Shape: the token array is MATERIALIZED once per row (withColumn)
    before any array op — never re-split per window (the interpreted-HOF
    rule) — then one ``posexplode(sequence(...))`` fans out window
    starts and ``slice()`` takes column-typed (start, length), all
    JVM-side.  Fan-out factor is ~n_tok/stride (bounded by the doc
    length cap upstream), and chunks inherit the document partitioning,
    so the op is shuffle-free map-side work.
    """
    if win <= 0 or stride <= 0:
        raise ValueError("win and stride must be positive")
    t = df.select(id_col, F.split(F.col(text_col), " ").alias("_toks"))
    n = F.size(F.col("_toks"))
    starts = F.sequence(F.lit(0), F.floor((n - 1) / stride).cast("int") * stride, F.lit(stride))
    e = t.select(
        id_col,
        F.col("_toks"),
        n.alias("_n"),
        F.posexplode(starts).alias("chunk_id", "_start"),
    )
    take = F.least(F.lit(win), F.col("_n") - F.col("_start"))
    return e.select(
        id_col,
        F.col("chunk_id"),
        take.alias("n_tok"),
        F.array_join(F.slice(F.col("_toks"), F.col("_start") + 1, take), " ").alias(
            "chunk"
        ),
    )


def oov_rate(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 5,
) -> DataFrame:
    """[id, n_tok, n_oov, oov_rate] — out-of-vocabulary fraction per
    document against a CORPUS-DERIVED vocabulary (tokens with global
    count >= ``min_count``): the tokenizer-coverage health metric run
    before committing to a vocab/tokenizer at corpus scale.

    Scale shape: the vocabulary grows with the corpus, so it is NOT
    broadcast (the bigram-LM lesson, functions/text.py r02 verdict) —
    the probe joins it on the token key and AQE picks the join; both
    sides are already token-partitioned from their shared explode, and
    the final per-doc aggregate is two-phase.  round-6 on the one FP
    division only.
    """
    tok = df.select(
        id_col, F.explode(F.split(F.col(text_col), " ")).alias("tok")
    )
    vocab = (
        tok.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("_c"))
        .filter(F.col("_c") >= min_count)
        .select("tok", F.lit(1).alias("_known"))
    )
    j = tok.join(vocab, "tok", "left")
    oov = F.when(F.col("_known").isNull(), 1).otherwise(0)
    return (
        j.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tok"),
            F.sum(oov).cast("long").alias("n_oov"),
        )
        .select(
            id_col,
            "n_tok",
            "n_oov",
            F.round(F.col("n_oov").cast("double") / F.col("n_tok"), 6).alias(
                "oov_rate"
            ),
        )
    )


def salient_terms(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    top_k: int = 5,
    min_tf: int = 3,
) -> DataFrame:
    """[group, term, tf, df_groups, score, rank] — the top-k tf-idf
    terms that DISTINGUISH each group (domain profiling / corpus-card
    summaries): tf = term count within the group, idf = ln(G / df) over
    the G groups, score = tf·idf.

    ``min_tf`` prunes the hapax tail BEFORE the idf join, which is what
    keeps the per-group term table bounded at corpus scale (tf ≥ k
    survivors per group are at most group_tokens/k).  tf and df are
    exact integers; ln runs once per surviving (group, term) on both
    engines (same libm-class call the entropy/zipf family already
    relies on), and the score is rounded to 6 dp BEFORE the (score
    desc, term asc) ranking.  Shape: one explode + two two-phase
    aggregates sharing the term key, one window per group.
    """
    from pyspark.sql import Window

    tok = df.select(
        F.col(group_col).alias("grp"),
        F.explode(F.split(F.col(text_col), " ")).alias("term"),
    )
    tf = (
        tok.groupBy("grp", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .filter(F.col("tf") >= min_tf)
    )
    gdf = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df_groups"))
    n_groups = df.select(group_col).distinct().count()
    w = Window.partitionBy("grp").orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        tf.join(gdf, "term")
        .withColumn(
            "score",
            F.round(
                F.col("tf")
                * F.log(F.lit(float(n_groups)) / F.col("df_groups")),
                6,
            ),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select(
            F.col("grp").alias(group_col),
            "term", "tf", "df_groups", "score",
            F.col("rank").cast("long").alias("rank"),
        )
    )


def ngram_novelty(
    old: DataFrame,
    new: DataFrame,
    n: int = 5,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """[group, n_grams, n_novel, novelty_rate] — what fraction of the
    NEW snapshot's distinct word n-grams were never seen in the old
    snapshot (per group, against the GLOBAL old gram set): the
    freshness metric an incremental recrawl uses to decide whether a
    domain is producing new text or re-serving boilerplate.

    Grams travel as md5 digests (payload text never crosses the
    shuffle — the CDC hash-first rule); novelty is a LEFT join flag,
    not an anti-join, so the expensive new-gram subtree is evaluated
    once.  Docs shorter than n tokens contribute nothing (guarded —
    Spark's sequence() would otherwise run DESCENDING on a negative
    span and fabricate grams).
    """
    def grams(df, keep_group: bool):
        cols = [F.col(group_col)] if keep_group else []
        t = df.select(*cols, F.split(F.col(text_col), " ").alias("_tk"))
        t = t.filter(F.size("_tk") >= n)
        e = t.select(
            *cols, "_tk",
            F.posexplode(
                F.sequence(F.lit(0), F.size("_tk") - n)
            ).alias("_p", "_i"),
        )
        g = F.md5(F.array_join(F.slice(F.col("_tk"), F.col("_i") + 1, n), " "))
        return e.select(*cols, g.alias("g"))

    old_g = grams(old, False).distinct().withColumn("_seen", F.lit(1))
    new_g = grams(new, True).distinct()
    novel = F.when(F.col("_seen").isNull(), 1).otherwise(0)
    return (
        new_g.join(old_g, "g", "left")
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(novel).cast("long").alias("n_novel"),
        )
        .select(
            group_col, "n_grams", "n_novel",
            F.round(
                F.col("n_novel").cast("double") / F.col("n_grams"), 6
            ).alias("novelty_rate"),
        )
    )


def source_vocab_jaccard(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """[src_a, src_b, n_a, n_b, n_common, jaccard] — pairwise
    vocabulary overlap between groups (corpus-comparison / domain-
    similarity matrix; which sources speak the same language?).

    Shape: the distinct (group, token) table self-joins on the TOKEN
    key, so per-token fan-out is bounded by groups² regardless of
    corpus size — the output and all intermediate pair state scale
    with the (tiny) group dim, never the corpus; group vocabulary
    sizes ride in via two broadcast joins of the groups-sized dim.
    Counts exact; union by inclusion-exclusion; one round-6 division.
    """
    v = df.select(
        F.col(group_col).alias("g"),
        F.explode(F.split(F.col(text_col), " ")).alias("tok"),
    ).distinct()
    sizes = v.groupBy("g").agg(F.count(F.lit(1)).alias("nv"))
    a = v.select(F.col("g").alias("ga"), "tok")
    b = v.select(F.col("g").alias("gb"), "tok")
    inter = (
        a.join(b, "tok")
        .filter(F.col("ga") < F.col("gb"))
        .groupBy("ga", "gb")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("g").alias("ga"), F.col("nv").alias("n_a"))
    sb = sizes.select(F.col("g").alias("gb"), F.col("nv").alias("n_b"))
    u = F.col("n_a") + F.col("n_b") - F.col("n_common")
    return (
        inter.join(F.broadcast(sa), "ga")
        .join(F.broadcast(sb), "gb")
        .select(
            F.col("ga").alias("src_a"),
            F.col("gb").alias("src_b"),
            "n_a", "n_b", "n_common",
            F.round(F.col("n_common").cast("double") / u.cast("double"), 6)
            .alias("jaccard"),
        )
    )


def lexical_diversity(
    df: DataFrame, group_col: str = "source", text_col: str = "text"
) -> DataFrame:
    """[group, n_bigrams, n_distinct, diversity] — distinct-bigram
    ratio per group (the templated-content detector: boilerplate-heavy
    sources repeat the same word transitions, pushing diversity toward
    0, while organic prose stays near 1 — the within-corpus
    counterpart of cross-snapshot ``ngram_novelty``).

    Bigrams use the eval-once slice + arrays_zip construction (the
    bigram_logprob convention — no interpreted HOF lambda); documents
    under 2 tokens contribute nothing.  ``diversity`` divides two
    exact int64 counts, so the double is engine-portable unrounded.

    Distributed shape: one explode + one grouped aggregate whose
    count-distinct is Catalyst's two-phase Expand de-dup — partial
    per-partition de-dup happens map-side, so the shuffle carries at
    most the distinct bigrams per group, not the corpus.
    """
    t = df.select(
        F.col(group_col).alias("g"),
        F.split(F.col(text_col), " ").alias("_toks"),
    ).filter(F.size("_toks") >= 2)
    n1 = F.size("_toks") - 1
    bi = (
        t.select(
            "g",
            F.slice("_toks", 1, n1).alias("w1s"),
            F.slice("_toks", 2, n1).alias("w2s"),
        )
        .select("g", F.explode(F.arrays_zip("w1s", "w2s")).alias("p"))
        .select("g", F.col("p.w1s").alias("w1"), F.col("p.w2s").alias("w2"))
    )
    return (
        bi.groupBy("g")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.countDistinct("w1", "w2").cast("long").alias("n_distinct"),
        )
        .select(
            F.col("g").alias("source"),
            "n_bigrams",
            "n_distinct",
            (
                F.col("n_distinct").cast("double")
                / F.col("n_bigrams").cast("double")
            ).alias("diversity"),
        )
    )


# jusText-style block classifier thresholds: a block is CONTENT iff its
# tag-stripped text is >= _BP_MIN_LEN chars AND its link density is
# < 1/3 — the density test runs as the INTEGER comparison
# 3·link_chars < text_len (no division, no FP anywhere)
_BP_MIN_LEN = 20
_BP_ANCHOR = "(?is)<a\\b[^>]*>.*?</a\\s*>"


def _bp_strip(col):
    from pyspark.sql import functions as F

    return F.trim(
        F.regexp_replace(F.regexp_replace(col, "<[^>]*>", ""), "\\s+", " ")
    )


def boilerplate_blocks(df, page_col: str = "page", id_col: str = "doc_id"):
    """[id, n_blocks, n_content, content_md5] — jusText/readability-
    class line-block boilerplate removal: the page splits into
    newline-delimited blocks, each block classifies as content iff its
    stripped text is long enough AND link-poor (link chars = stripped
    length minus the anchor-removed stripped length; the 1/3-density
    test is the exact integer comparison 3·link < len).  Kept blocks
    concatenate in document order into the extracted main content.

    One posexplode + one groupBy(id) — pure codegen per block (no
    Python, no interpreted HOF over expensive subtrees: every regexp
    chain runs on a materialized block column).  The step between the
    q_html_extract tag-strip and a DOM-aware trafilatura swap-in."""
    from pyspark.sql import functions as F

    blocks = df.select(
        id_col, F.posexplode(F.split(F.col(page_col), "\n")).alias("pos", "block")
    )
    b = blocks.withColumn("txt", _bp_strip(F.col("block"))).withColumn(
        "nolink",
        _bp_strip(F.regexp_replace(F.col("block"), _BP_ANCHOR, " ")),
    )
    tl = F.length("txt")
    ll = tl - F.length("nolink")
    m = b.withColumn(
        "is_content",
        (tl >= _BP_MIN_LEN) & (3 * ll < tl),
    )
    kept = F.array_sort(
        F.collect_list(
            F.when(F.col("is_content"), F.struct("pos", "txt"))
        )
    )
    return m.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_blocks"),
        F.sum(F.col("is_content").cast("long")).cast("long").alias("n_content"),
        F.md5(
            F.array_join(F.transform(kept, lambda s: s["txt"]), " ")
        ).alias("content_md5"),
    )


def boilerplate_sql(pages_cte: str, id_col: str = "doc_id") -> str:
    """DuckDB twin of :func:`boilerplate_blocks` over a CTE named
    ``pages_cte`` with columns (id, page) — same strip chains, same
    integer density test, same order-preserving concatenation."""
    strip = (
        "trim(regexp_replace(regexp_replace({x}, '<[^>]*>', '', 'g'), "
        "'\\s+', ' ', 'g'))"
    )
    anchor = _BP_ANCHOR.replace("\\", "\\")
    return f"""
lst AS (SELECT {id_col}, string_split(page, chr(10)) AS l FROM {pages_cte}),
ix AS (SELECT {id_col}, l, generate_subscripts(l, 1) AS pos FROM lst),
blk AS (SELECT {id_col}, pos, l[pos] AS block FROM ix),
m AS (SELECT {id_col}, pos,
             {strip.format(x='block')} AS txt,
             {strip.format(x=f"regexp_replace(block, '{anchor}', ' ', 'g')")}
               AS nolink
      FROM blk),
cl AS (SELECT {id_col}, pos, txt,
              (length(txt) >= {_BP_MIN_LEN}
               AND 3 * (length(txt) - length(nolink)) < length(txt))
                AS is_content
       FROM m)
SELECT {id_col},
       CAST(count(*) AS BIGINT) AS n_blocks,
       CAST(count(*) FILTER (WHERE is_content) AS BIGINT) AS n_content,
       md5(coalesce(string_agg(txt, ' ' ORDER BY pos)
                    FILTER (WHERE is_content), '')) AS content_md5
FROM cl GROUP BY {id_col}
"""


RAKE_Q = 10**6  # per-word score quantum (deg/freq as integer micro-units)


def rake_top_phrases(
    df: DataFrame,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """[grp, phrase, n_words, score] — the top RAKE keyword phrase per
    group (Rose et al. 2010), corpus-calibrated: candidate phrases are
    maximal runs of content tokens between stopword/punctuation
    delimiters (gaps-and-islands over the token stream — island id =
    running stopword count, the q_staypoints segmentation applied to
    text); each WORD scores deg/freq where freq counts its phrase
    occurrences and deg sums the lengths of the phrases containing it
    (co-occurrence degree, self included), computed CORPUS-WIDE so
    rare-but-collocated vocabulary wins; a PHRASE scores the sum of
    its member word scores.

    Exactness: deg and freq are exact counts; each word score is
    quantized to 1/RAKE_Q by integer division, so phrase scores are
    order-free integer sums and the only FP is the display division +
    round-6.  Ties break lexicographically on the phrase.

    Shape: one shuffle keys tokens by document for the island window,
    one (word) aggregate builds the score dim, one join prices the
    members, and the per-group top-1 is a window over the dim-sized
    distinct-phrase frame.  Never all-pairs; the token explode is the
    same map-side explode the shingle family uses."""
    toks = df.select(
        F.col(group_col).alias("grp"),
        F.col(id_col).alias("did"),
        F.posexplode(F.split(F.lower(F.col(text_col)), "[^a-z]+")).alias(
            "pos", "tok"
        ),
    ).filter(F.col("tok") != "")
    flagged = toks.withColumn(
        "stop", F.col("tok").isin(*STOPWORDS_EN).cast("int")
    )
    wisl = (
        Window.partitionBy("did").orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    members = (
        flagged.withColumn("island", F.sum("stop").over(wisl))
        .filter(F.col("stop") == 0)
        .select("grp", "did", "island", "pos", "tok")
    )
    plen = members.groupBy("did", "island").agg(
        F.count(F.lit(1)).alias("plen")
    )
    m = members.join(plen, ["did", "island"])
    wdim = m.groupBy("tok").agg(
        F.count(F.lit(1)).alias("freq"),
        F.sum("plen").alias("deg"),
    ).select(
        "tok", F.expr(f"(deg * CAST({RAKE_Q} AS BIGINT)) div freq").alias("sq")
    )
    phr = (
        m.join(wdim, "tok")
        .groupBy("grp", "did", "island")
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "tok"))
                    ),
                    lambda s: s["tok"],
                ),
            ).alias("phrase"),
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum("sq").cast("long").alias("score_q"),
        )
    )
    dp = phr.select("grp", "phrase", "n_words", "score_q").distinct()
    wtop = Window.partitionBy("grp").orderBy(
        F.col("score_q").desc(), F.col("phrase").asc()
    )
    return (
        dp.withColumn("rn", F.row_number().over(wtop))
        .filter(F.col("rn") == 1)
        .select(
            "grp", "phrase", "n_words",
            F.round(
                F.col("score_q").cast("double") / F.lit(float(RAKE_Q)), 6
            ).alias("score"),
        )
    )


HEAPS_Q = 1_000_000  # 1e-6 quantizer for the log10 regression inputs


def heaps_law(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_checkpoints: int = 10,
) -> DataFrame:
    """One row [n_docs, n_points, token_total, vocab_total, heaps_beta,
    heaps_logk] — Heaps'-law fit V(N) = k·N^β of vocabulary growth
    against cumulative token count, the corpus-growth companion to
    q_zipf_slope's frequency law: "how fast does the vocabulary still
    grow?" is the standard saturation diagnostic when deciding whether
    another crawl snapshot adds lexical value.

    Checkpoints are rank-deciles of crawl order (doc id ascending via
    the two-phase :func:`~greenex_py_spark.engine.rank.global_rank`,
    never a single-task window); a token's first appearance is
    ``min(decile)`` over the exploded corpus (map-side combinable), so
    the cumulative vocabulary at checkpoint d counts tokens first seen
    at or before d.  The log10 regression inputs are 1e-6-quantized to
    exact longs on the identical IEEE expression in both engines;
    slope = (D·Sxy − Sx·Sy)/(D·Sxx − Sx²) is a ratio of exact int64
    products (quantizer cancels), shipped unrounded, and the intercept
    repeats the same IEEE chain off that slope.

    Scale: the only corpus-sized shuffles are the rank range exchange
    and one groupBy(token); everything after is a ≤n_checkpoints-row
    frame.  Cited behavior: Heaps (1978) β≈0.5 for natural text — the
    LCG fixture's closed vocabulary saturates (β→0 in late deciles),
    visible in the fitted slope."""
    from ..engine.rank import global_rank

    docs = df.select(
        F.col(id_col).alias("doc_id"),
        F.split(F.col(text_col), " ").alias("toks"),
    )
    ranked = global_rank(docs, ["doc_id"], out_col="rk")
    nd = docs.agg(F.count(F.lit(1)).cast("long").alias("nd"))
    dd = (
        ranked.crossJoin(F.broadcast(nd))
        .withColumn(
            "dec",
            F.floor(
                ((F.col("rk") - 1) * n_checkpoints).cast("double")
                / F.col("nd").cast("double")
            ).cast("long"),
        )
        .withColumn("n_tok", F.size("toks").cast("long"))
    )
    fo = (
        dd.select("dec", F.explode("toks").alias("tok"))
        .groupBy("tok")
        .agg(F.min("dec").alias("fd"))
    )
    vc = fo.groupBy(F.col("fd").alias("dec")).agg(
        F.count(F.lit(1)).cast("long").alias("v")
    )
    tc = dd.groupBy("dec").agg(F.sum("n_tok").cast("long").alias("tk"))
    w = Window.orderBy("dec").rowsBetween(Window.unboundedPreceding, 0)
    pts = (
        tc.join(vc, "dec", "left")
        .withColumn("cum_n", F.sum("tk").over(w).cast("long"))
        .withColumn(
            "cum_v", F.sum(F.coalesce("v", F.lit(0))).over(w).cast("long")
        )
    )
    qz = pts.select(
        "cum_n",
        "cum_v",
        F.floor(
            F.log10(F.col("cum_n").cast("double")) * HEAPS_Q + F.lit(0.5)
        ).cast("long").alias("xq"),
        F.floor(
            F.log10(F.col("cum_v").cast("double")) * HEAPS_Q + F.lit(0.5)
        ).cast("long").alias("yq"),
    )
    s = qz.agg(
        F.count(F.lit(1)).cast("long").alias("dpts"),
        F.sum("xq").cast("long").alias("sx"),
        F.sum("yq").cast("long").alias("sy"),
        F.sum(F.col("xq") * F.col("yq")).cast("long").alias("sxy"),
        F.sum(F.col("xq") * F.col("xq")).cast("long").alias("sxx"),
        F.max("cum_n").alias("token_total"),
        F.max("cum_v").alias("vocab_total"),
    )
    beta = (
        (F.col("dpts") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
        / (F.col("dpts") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    )
    logk = (F.col("sy").cast("double") - beta * F.col("sx").cast("double")) / (
        F.col("dpts").cast("double") * F.lit(float(HEAPS_Q))
    )
    return s.crossJoin(F.broadcast(nd)).select(
        F.col("nd").alias("n_docs"),
        F.col("dpts").alias("n_points"),
        "token_total",
        "vocab_total",
        beta.alias("heaps_beta"),
        logk.alias("heaps_logk"),
    )


NB_Q = 1_000_000_000  # 1e-9 quantizer for every ln() term in the NB score


def _qln(col):
    """floor(ln(x)·1e9 + 0.5) as int64 — the shared engine-portable
    log quantizer (identical IEEE expression in Spark and DuckDB)."""
    return F.floor(F.log(col.cast("double")) * NB_Q + F.lit(0.5)).cast("long")


def naive_bayes_predict(
    df: DataFrame, id_col: str = "doc_id",
    text_col: str = "text", label_col: str = "lang",
) -> DataFrame:
    """[doc_id, lang, pred_lang] — per-document argmax of a multinomial naive
    Bayes text classifier TRAINED AND SCORED distributed on the same
    corpus (resubstitution eval): per-class Laplace-smoothed token
    likelihoods ln((c(t,l)+1)/(T_l+V)) plus a class prior ln(N_l/N) —
    the classic fastText-free baseline every curation pipeline fits
    before paying for a neural classifier.

    Exactness: every ln() term is 1e-9-quantized to int64 on the
    identical IEEE expression in both engines, the per-document score
    is decomposed as prior_q + Σ_t m_t·qln(c+1) − n_tok·qln(T_l+V) so
    that absent (token, class) pairs contribute qln(1) = 0 exactly,
    and the argmax over classes compares exact integers (ties broken
    by class ascending) — no float ordering anywhere.

    Scale: one explode shuffle builds the model (vocab×L bounded);
    scoring joins per-doc token counts to the model with a SHUFFLE
    hash join on token — the model table grows with corpus vocabulary
    and is deliberately NOT broadcast (the q_bigram_logprob lesson);
    only the L-row priors/totals dim broadcasts.  The final window is
    partitioned per document over L rows."""
    docs = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(label_col).alias("lang"),
        F.split(F.col(text_col), " ").alias("toks"),
    )
    toks = docs.select(
        "doc_id", "lang", F.explode("toks").alias("tok")
    )
    c = toks.groupBy("tok", "lang").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    model = c.select(
        "tok", F.col("lang").alias("cls"), _qln(F.col("c") + 1).alias("qc")
    )
    vocab = c.select("tok").distinct().agg(
        F.count(F.lit(1)).cast("long").alias("v")
    )
    cls = (
        toks.groupBy("lang")
        .agg(F.count(F.lit(1)).cast("long").alias("t_l"))
        .join(
            docs.groupBy("lang").agg(
                F.count(F.lit(1)).cast("long").alias("n_l")
            ),
            "lang",
        )
        .crossJoin(F.broadcast(vocab))
        .crossJoin(
            F.broadcast(
                docs.agg(F.count(F.lit(1)).cast("long").alias("n"))
            )
        )
        .select(
            F.col("lang").alias("cls"),
            (_qln(F.col("n_l").cast("double") / F.col("n").cast("double"))
             ).alias("prior_q"),
            _qln(F.col("t_l") + F.col("v")).alias("qden"),
        )
    )
    dtok = toks.groupBy("doc_id", "tok").agg(
        F.count(F.lit(1)).cast("long").alias("m")
    )
    part = (
        dtok.join(model, "tok")  # shuffle join: model is vocab-scale
        .groupBy("doc_id", "cls")
        .agg(F.sum(F.col("m") * F.col("qc")).cast("long").alias("sum_q"))
    )
    base = docs.select(
        "doc_id", "lang", F.size("toks").cast("long").alias("n_tok")
    )
    scored = (
        base.crossJoin(F.broadcast(cls))
        .join(part, ["doc_id", "cls"], "left")
        .select(
            "doc_id", "lang", "cls",
            (F.col("prior_q") + F.coalesce(F.col("sum_q"), F.lit(0))
             - F.col("n_tok") * F.col("qden")).alias("score_q"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("score_q"), F.asc("cls")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "lang", F.col("cls").alias("pred_lang"))
    )


def dunning_collocations(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_n: int = 20,
) -> DataFrame:
    """[w1, w2, n11, g2] — the top-N bigram collocations by Dunning's
    log-likelihood ratio G² (Dunning 1993), the tie-robust
    significance companion to q_pmi_bigrams' strength score: for each
    adjacent word pair the 2×2 contingency (bigram vs its margins over
    all bigram positions) scored by G² = 2·Σ O·ln(O/E) — the standard
    collocation extractor for building phrase lexicons from a crawl.

    Exactness: every O·ln(O/E) term (O > 0; zero cells contribute 0)
    is 1e-9-quantized on the identical IEEE chain — expectations as
    (row·col)/N double products of exact int64 margins — and summed as
    exact integers, so the top-N ORDER BY (g2q DESC, w1, w2) compares
    integers; g2 ships as g2q·2/1e9 (one identical multiply/divide).

    Scale: bigram formation is posexplode + lead over per-doc windows
    (the interpreted-HOF ban); margins are two dim-sized aggregates of
    the bigram table re-joined by key (vocab-bounded — deliberately no
    broadcast hint, the q_bigram_logprob lesson); top-N is a
    TakeOrdered."""
    toks = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "w"),
    )
    wd = Window.partitionBy("id").orderBy("pos")
    bi = (
        toks.select("id", "pos", "w", F.lead("w").over(wd).alias("w2"))
        .filter(F.col("w2").isNotNull())
        .select(F.col("w").alias("w1"), "w2")
    )
    c = bi.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("n11")
    )
    everything = Window.partitionBy()
    row = c.groupBy("w1").agg(F.sum("n11").cast("long").alias("r1"))
    col = c.groupBy("w2").agg(F.sum("n11").cast("long").alias("c1"))
    j = (
        c.join(row, "w1")
        .join(col, "w2")
        .withColumn("nn", F.sum("n11").over(everything).cast("long"))
    )

    def term(o, e):
        od = o.cast("double")
        return F.when(
            o > 0,
            F.floor(od * F.log(od / e) * 1000000000.0 + 0.5).cast("long"),
        ).otherwise(F.lit(0).cast("long"))

    nd = F.col("nn").cast("double")
    r1d, c1d = F.col("r1").cast("double"), F.col("c1").cast("double")
    o11 = F.col("n11")
    o12 = F.col("r1") - F.col("n11")
    o21 = F.col("c1") - F.col("n11")
    o22 = F.col("nn") - F.col("r1") - F.col("c1") + F.col("n11")
    g2q = (
        term(o11, r1d * c1d / nd)
        + term(o12, r1d * (nd - c1d) / nd)
        + term(o21, (nd - r1d) * c1d / nd)
        + term(o22, (nd - r1d) * (nd - c1d) / nd)
    )
    scored = j.select("w1", "w2", "n11", g2q.alias("g2q"))
    return (
        scored.orderBy(F.desc("g2q"), F.asc("w1"), F.asc("w2"))
        .limit(top_n)
        .select(
            "w1", "w2", "n11",
            (F.col("g2q").cast("double") * 2.0 / 1000000000.0).alias("g2"),
        )
    )


def naive_bayes_confusion(
    df: DataFrame, id_col: str = "doc_id",
    text_col: str = "text", label_col: str = "lang",
) -> DataFrame:
    """[lang, pred_lang, n] — resubstitution confusion matrix over
    :func:`naive_bayes_predict` (see there for the scale/exactness
    contract)."""
    return naive_bayes_predict(df, id_col, text_col, label_col).groupBy(
        "lang", "pred_lang"
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))


BURROWS_Q = 100_000_000  # 1e-8 quantizer for relative function-word rates


def burrows_delta(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    marker_words: tuple = STOPWORDS_EN,
) -> DataFrame:
    """[src_a, src_b, delta] — Burrows' Delta stylometric distance
    between every pair of sources (Burrows 2002): per source the
    relative frequency of each function/marker word, z-scored against
    the cross-source population, Delta = mean |z_a − z_b| over the
    marker set — the standard authorship/provenance-attribution
    distance ("do two crawl sources share a house style?").

    Exactness: each rate is 1e-8-quantized to int64 (one c/T double
    division), so the population mean/std assemble from exact integer
    S = Σfq and Q = Σfq²; z = (n·fq − S)/sqrt(n·Σfq² − S²) is one
    fixed IEEE chain per (source, word) (degenerate spread → z = 0),
    z is 1e-6-quantized, and Delta sums exact |zq| differences with
    one final division.

    Scale: one token explode filtered to the marker dim (map-side),
    one (source, word)-keyed aggregate; everything after is
    sources×words dim-sized."""
    toks = df.select(
        F.col(group_col).alias("src"),
        F.explode(F.split(F.col(text_col), " ")).alias("w"),
    )
    tot = toks.groupBy("src").agg(
        F.count(F.lit(1)).cast("long").alias("t")
    )
    mk = list(marker_words)
    cnts = (
        toks.filter(F.col("w").isin(*mk))
        .groupBy("src", "w")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    srcs = tot.select("src")
    words = cnts.sparkSession.createDataFrame(
        [(w,) for w in mk], "w string"
    )
    grid = (
        srcs.crossJoin(F.broadcast(words))
        .join(cnts, ["src", "w"], "left")
        .join(tot, "src")
        .select(
            "src", "w",
            F.floor(
                F.coalesce("c", F.lit(0)).cast("double")
                / F.col("t").cast("double") * BURROWS_Q + 0.5
            ).cast("long").alias("fq"),
        )
    )
    ww = Window.partitionBy("w")
    z = grid.select(
        "src", "w", "fq",
        F.count(F.lit(1)).over(ww).cast("long").alias("n"),
        F.sum("fq").over(ww).cast("long").alias("s"),
        F.sum(F.col("fq") * F.col("fq")).over(ww).cast("long").alias("qq"),
    )
    den2 = F.col("n") * F.col("qq") - F.col("s") * F.col("s")
    zval = F.when(den2 <= 0, F.lit(0.0)).otherwise(
        (F.col("n") * F.col("fq") - F.col("s")).cast("double")
        / F.sqrt(den2.cast("double"))
    )
    zq = z.select(
        "src", "w",
        F.floor(zval * 1000000.0 + F.lit(0.5)).cast("long").alias("zq"),
    )
    a = zq.select(F.col("src").alias("src_a"), "w",
                  F.col("zq").alias("za"))
    b = zq.select(F.col("src").alias("src_b"), "w",
                  F.col("zq").alias("zb"))
    return (
        a.join(b, "w")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(
            (F.sum(F.abs(F.col("za") - F.col("zb"))).cast("double")
             / (len(mk) * 1000000.0)).alias("delta")
        )
    )


def yules_k(
    df: DataFrame, group_col: str = "source", text_col: str = "text"
) -> DataFrame:
    """[src, n_tokens, n_types, yules_k] — Yule's characteristic K per
    source (Yule 1944): K = 10⁴·(Σ_m m²·V_m − N)/N² over the token
    frequency spectrum (V_m = types occurring m times) — the
    length-robust vocabulary-richness/repetitiveness constant
    (boilerplate-heavy sources score high) beside q_lexical_diversity's
    distinct-bigram rate and q_heaps_law's growth exponent.

    Exactness: the spectrum reduces to Σ m²·V_m = Σ_types tf², an
    exact int64 over per-type counts; K is one fixed
    (s2−N)·10⁴/(N·N) IEEE chain, shipped unrounded.

    Scale: one token explode → (source, token) count (map-side
    combinable) → per-source int sums."""
    toks = df.select(
        F.col(group_col).alias("src"),
        F.explode(F.split(F.col(text_col), " ")).alias("w"),
    )
    tf = toks.groupBy("src", "w").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    s = tf.groupBy("src").agg(
        F.sum("tf").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.sum(F.col("tf") * F.col("tf")).cast("long").alias("s2"),
    )
    return s.select(
        "src",
        F.col("n").alias("n_tokens"),
        "n_types",
        ((F.col("s2") - F.col("n")).cast("double") * 10000.0
         / (F.col("n").cast("double") * F.col("n").cast("double")))
        .alias("yules_k"),
    )


def ngram_clip_stats(
    df: DataFrame,
    source_col: str,
    id_col: str,
    cand_col: str,
    ref_col: str,
    max_n: int = 4,
) -> DataFrame:
    """[source, n, matches, total_cand, total_ref] — corpus-level
    CLIPPED n-gram overlap statistics between a candidate and a
    reference text column for n = 1..max_n: per document and order,
    ``matches`` sums min(count_cand(g), count_ref(g)) over the shared
    grams (the BLEU modified-precision / ROUGE-recall numerator), and
    the totals are each side's n-gram counts.  All counts exact int64.

    Shape: one posexplode per side, ONE per-doc window pass producing
    lead(1..max_n−1) columns, then an array-of-structs explode builds
    every order without re-evaluating the window (the interpreted-HOF
    rule); the clip join is an equi-join on (doc, n, gram), the same
    key as the counts' groupBy — co-partitioned, no extra shuffle at
    scale."""
    sides = []
    for tag, col in (("c", cand_col), ("r", ref_col)):
        toks = df.select(
            F.col(source_col).alias("src"),
            F.col(id_col).alias("doc"),
            F.posexplode(F.split(F.col(col), " ")).alias("pos", "tok"),
        )
        w = Window.partitionBy("doc").orderBy("pos")
        leads = toks.select(
            "src", "doc", "pos", "tok",
            *[F.lead("tok", k).over(w).alias(f"l{k}") for k in range(1, max_n)],
        )
        parts = [F.struct(F.lit(1).alias("n"), F.col("tok").alias("g"))]
        for n in range(2, max_n + 1):
            gram = F.concat_ws(
                " ", F.col("tok"), *[F.col(f"l{k}") for k in range(1, n)]
            )
            parts.append(
                F.struct(
                    F.when(F.col(f"l{n-1}").isNotNull(), F.lit(n))
                    .otherwise(F.lit(None)).alias("n"),
                    gram.alias("g"),
                )
            )
        g = (
            leads.select(
                "src", "doc", F.explode(F.array(*parts)).alias("s")
            )
            .select("src", "doc", F.col("s.n").alias("n"), F.col("s.g").alias("g"))
            .filter(F.col("n").isNotNull())
        )
        sides.append(
            g.groupBy("src", "doc", "n", "g").agg(
                F.count(F.lit(1)).cast("long").alias(f"c_{tag}")
            )
        )
    cand, ref = sides
    m = (
        cand.join(ref, ["src", "doc", "n", "g"])
        .groupBy("src", "n")
        .agg(F.sum(F.least("c_c", "c_r")).cast("long").alias("matches"))
    )
    tc = cand.groupBy("src", "n").agg(F.sum("c_c").cast("long").alias("total_cand"))
    tr = ref.groupBy("src", "n").agg(F.sum("c_r").cast("long").alias("total_ref"))
    return (
        tc.join(tr, ["src", "n"])
        .join(m, ["src", "n"], "left")
        .select(
            F.col("src").alias("source"),
            F.col("n").cast("long").alias("n"),
            F.coalesce("matches", F.lit(0)).cast("long").alias("matches"),
            "total_cand", "total_ref",
        )
    )


def corpus_bleu4(
    df: DataFrame,
    source_col: str,
    id_col: str,
    cand_col: str,
    ref_col: str,
) -> DataFrame:
    """[source, m1..m4, t1..t4, bleu] — corpus-level BLEU-4 between a
    LENGTH-PRESERVING candidate transform and its reference (token
    counts equal per doc → brevity penalty exactly 1, keeping the whole
    score inside exact IEEE arithmetic: products of int64 ratios under
    two sqrt calls, no exp/ln).  The machine-translation metric applied
    to curation: how much n-gram structure does a lossy normalization
    destroy?  Ships unrounded."""
    stats = ngram_clip_stats(df, source_col, id_col, cand_col, ref_col, 4)
    wide = stats.groupBy("source").agg(
        *[
            F.sum(F.when(F.col("n") == n, F.col("matches")).otherwise(0))
            .cast("long").alias(f"m{n}")
            for n in range(1, 5)
        ],
        *[
            F.sum(F.when(F.col("n") == n, F.col("total_cand")).otherwise(0))
            .cast("long").alias(f"t{n}")
            for n in range(1, 5)
        ],
    )
    p = (
        (F.col("m1").cast("double") / F.col("t1").cast("double"))
        * (F.col("m2").cast("double") / F.col("t2").cast("double"))
        * (F.col("m3").cast("double") / F.col("t3").cast("double"))
        * (F.col("m4").cast("double") / F.col("t4").cast("double"))
    )
    return wide.select(
        "source", "m1", "m2", "m3", "m4", "t1", "t2", "t3", "t4",
        F.sqrt(F.sqrt(p)).alias("bleu"),
    )


def rouge_n_recall(
    df: DataFrame,
    source_col: str,
    id_col: str,
    cand_col: str,
    ref_col: str,
    max_n: int = 2,
) -> DataFrame:
    """[source, n, matches, total_ref, rouge_n] — corpus-level ROUGE-N
    recall of an extractive candidate against the full reference text
    (clipped matches over reference n-gram count) — the summarization
    eval twin of :func:`corpus_bleu4`'s precision view.  Two exact
    int64 counts divide once; portable unrounded."""
    stats = ngram_clip_stats(df, source_col, id_col, cand_col, ref_col, max_n)
    return stats.select(
        "source", "n", "matches", "total_ref",
        (F.col("matches").cast("double") / F.col("total_ref").cast("double"))
        .alias("rouge_n"),
    )


def _ngram_clip_sql(
    cand_expr: str, ref_expr: str, max_n: int, cap: int = 1001
) -> str:
    """Shared DuckDB CTE body for the clipped n-gram stats (same
    1000-position cap convention as the other n-gram oracles — safe
    under the documented ≤79-word corpus invariant)."""
    side_sql = []
    for tag, expr in (("c", cand_expr), ("r", ref_expr)):
        grams = []
        for n in range(1, max_n + 1):
            gram = " || ' ' || ".join(
                f"tk[i.range + {k}]" for k in range(n)
            ).replace("tk[i.range + 0]", "tk[i.range]")
            grams.append(
                f"SELECT src, doc, {n} AS n, {gram} AS g, i.range AS p "
                f"FROM t_{tag}, range(1, {cap}) i "
                f"WHERE i.range <= len(tk) - {n - 1}"
            )
        side_sql.append(
            f"t_{tag} AS (SELECT source AS src, doc_id AS doc, "
            f"string_split({expr}, ' ') AS tk FROM documents),\n"
            f"g_{tag} AS ({' UNION ALL '.join(grams)}),\n"
            f"cnt_{tag} AS (SELECT src, doc, n, g, "
            f"CAST(count(*) AS BIGINT) AS c_{tag} "
            f"FROM g_{tag} GROUP BY src, doc, n, g)"
        )
    return (
        "WITH "
        + ",\n".join(side_sql)
        + """,
m AS (SELECT a.src, a.n, CAST(sum(least(a.c_c, b.c_r)) AS BIGINT) AS matches
      FROM cnt_c a JOIN cnt_r b
        ON a.src = b.src AND a.doc = b.doc AND a.n = b.n AND a.g = b.g
      GROUP BY a.src, a.n),
tc AS (SELECT src, n, CAST(sum(c_c) AS BIGINT) AS total_cand
       FROM cnt_c GROUP BY src, n),
tr AS (SELECT src, n, CAST(sum(c_r) AS BIGINT) AS total_ref
       FROM cnt_r GROUP BY src, n),
stats AS (
  SELECT tc.src AS source, CAST(tc.n AS BIGINT) AS n,
         CAST(coalesce(m.matches, 0) AS BIGINT) AS matches,
         tc.total_cand, tr.total_ref
  FROM tc JOIN tr ON tc.src = tr.src AND tc.n = tr.n
  LEFT JOIN m ON m.src = tc.src AND m.n = tc.n
)
"""
    )


def corpus_bleu4_sql(cand_expr: str, ref_expr: str) -> str:
    """DuckDB twin of :func:`corpus_bleu4`."""
    return (
        _ngram_clip_sql(cand_expr, ref_expr, 4)
        + """
SELECT source,
       CAST(sum(CASE WHEN n = 1 THEN matches ELSE 0 END) AS BIGINT) AS m1,
       CAST(sum(CASE WHEN n = 2 THEN matches ELSE 0 END) AS BIGINT) AS m2,
       CAST(sum(CASE WHEN n = 3 THEN matches ELSE 0 END) AS BIGINT) AS m3,
       CAST(sum(CASE WHEN n = 4 THEN matches ELSE 0 END) AS BIGINT) AS m4,
       CAST(sum(CASE WHEN n = 1 THEN total_cand ELSE 0 END) AS BIGINT) AS t1,
       CAST(sum(CASE WHEN n = 2 THEN total_cand ELSE 0 END) AS BIGINT) AS t2,
       CAST(sum(CASE WHEN n = 3 THEN total_cand ELSE 0 END) AS BIGINT) AS t3,
       CAST(sum(CASE WHEN n = 4 THEN total_cand ELSE 0 END) AS BIGINT) AS t4,
       sqrt(sqrt(
         (CAST(sum(CASE WHEN n = 1 THEN matches ELSE 0 END) AS DOUBLE)
          / CAST(sum(CASE WHEN n = 1 THEN total_cand ELSE 0 END) AS DOUBLE))
         * (CAST(sum(CASE WHEN n = 2 THEN matches ELSE 0 END) AS DOUBLE)
          / CAST(sum(CASE WHEN n = 2 THEN total_cand ELSE 0 END) AS DOUBLE))
         * (CAST(sum(CASE WHEN n = 3 THEN matches ELSE 0 END) AS DOUBLE)
          / CAST(sum(CASE WHEN n = 3 THEN total_cand ELSE 0 END) AS DOUBLE))
         * (CAST(sum(CASE WHEN n = 4 THEN matches ELSE 0 END) AS DOUBLE)
          / CAST(sum(CASE WHEN n = 4 THEN total_cand ELSE 0 END) AS DOUBLE))
       )) AS bleu
FROM stats GROUP BY source
"""
    )


def rouge_n_sql(cand_expr: str, ref_expr: str, max_n: int = 2) -> str:
    """DuckDB twin of :func:`rouge_n_recall`."""
    return (
        _ngram_clip_sql(cand_expr, ref_expr, max_n)
        + """
SELECT source, n, matches, total_ref,
       CAST(matches AS DOUBLE) / CAST(total_ref AS DOUBLE) AS rouge_n
FROM stats
"""
    )


def nfc_normalize_arrow(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """[id, norm, changed] — Unicode NFC canonicalization of the text
    column in an Arrow ``mapInPandas`` kernel (pandas
    ``Series.str.normalize``, the same unicodedata tables DuckDB's
    nfc_normalize uses) — the canonical-equivalence dedup precondition
    for crawl text where 'é' may arrive composed or decomposed
    (byte-different, canonically equal).  ``changed`` flags rows the
    normalization actually rewrote.

    NOT ``pc.utf8_normalize``: pyarrow 16.1's NFC form fails to
    compose (e+COMBINING ACUTE stays decomposed, diverging from
    Python/DuckDB NFC) — verified in tests; revisit when the container
    ships a fixed Arrow.  Scale shape: pure map-side work (0
    shuffles), per-task memory one Arrow batch."""
    import pandas as pd

    def _kernel(pdfs):
        for pdf in pdfs:
            norm = pdf[text_col].str.normalize("NFC")
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "norm": norm,
                    "changed": norm != pdf[text_col],
                }
            )

    return df.select(id_col, text_col).mapInPandas(
        _kernel, f"{id_col} long, norm string, changed boolean"
    )


def utf8_audit_arrow(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """[id, n_bytes, n_chars, is_ascii] — UTF-8 byte/codepoint audit of
    the text column through the raw ``mapInArrow`` surface: the kernel
    receives ``pyarrow.RecordBatch``es and runs only vectorized C++
    compute (binary_length on the bytes view, utf8_length on
    codepoints) — no pandas boxing, no per-row Python; the zero-copy
    tier BELOW mapInPandas in the Arrow UDF ladder (this function is
    the template for plugging any pyarrow C++ kernel into a plan).
    is_ascii = bytes == codepoints is the cheap mojibake-risk flag a
    crawl pipeline computes before charset repair.

    Scale shape: pure map-side work (0 shuffles); per-task memory is
    one batch (spark.sql.execution.arrow.maxRecordsPerBatch)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def _kernel(batches):
        for batch in batches:
            txt = batch.column(text_col)
            n_bytes = pc.binary_length(pc.cast(txt, pa.binary()))
            n_chars = pc.utf8_length(txt)
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column(id_col),
                    pc.cast(n_bytes, pa.int64()),
                    pc.cast(n_chars, pa.int64()),
                    pc.equal(n_bytes, n_chars),
                ],
                names=[id_col, "n_bytes", "n_chars", "is_ascii"],
            )

    return df.select(id_col, text_col).mapInArrow(
        _kernel, f"{id_col} long, n_bytes long, n_chars long, is_ascii boolean"
    )
