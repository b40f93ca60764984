"""Text-analysis operators for the training-data pipeline (task brief):
language ID, quality scoring, token counting, document fingerprinting.

All hot-path math is JVM-side (split/filter/aggregate higher-order
functions, codegen'd); the only pandas UDF here is the demonstrative
vectorized normalizer (D1). Every operator is a pure function of the
row, so it scales embarrassingly: no shuffle at all until a later agg.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

STOPWORDS = ["the", "a", "and", "of", "to", "in", "is", "it", "for", "on"]

_TOKEN_SPLIT = r"\s+"


def tokens(col: Column) -> Column:
    return F.split(F.trim(col), _TOKEN_SPLIT)


def token_count(col: Column) -> Column:
    """Whitespace token count."""
    return F.size(tokens(col))


def bpe_ish_token_count(col: Column) -> Column:
    """BPE-ish sub-word proxy: count word pieces after splitting on
    non-alphanumerics AND on letter-digit boundaries, ~4 chars/piece.
    Deterministic and cheap — a capacity-planning estimator, not a real
    tokenizer."""
    pieces = F.split(F.regexp_replace(F.lower(col), r"[^a-z0-9]+", " "), " ")
    chars = F.aggregate(
        pieces, F.lit(0), lambda acc, x: acc + F.length(x)
    )
    return (chars + F.lit(3)) / F.lit(4)


# GPT-2-style tokenizer categories, restricted to a regex dialect that
# Java (Spark codegen) and RE2 (DuckDB oracle) interpret identically:
# a leading-space word run, digit run, punctuation run, or space run.
# Real BPE merges within these pieces; counting the pieces themselves is
# the standard pre-tokenization granularity.
BPE_SPLIT = " ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+| +"


def regex_token_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document token stats from a GPT-2-style regex
    pre-tokenization of the normalized text: total pieces, alphabetic
    pieces, numeric pieces, and total characters covered. All JVM-side
    (regexp_extract_all + higher-order array ops, zero shuffle); the
    token array is materialized in its own projection because codegen
    re-evaluates non-materialized expressions once per reference
    [SURVEY §2 F-row notes]."""
    norm = docs.select(
        F.col(id_col),
        F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ").alias(
            "_norm"
        ),
    )
    toks = norm.select(
        F.col(id_col),
        F.regexp_extract_all("_norm", F.lit(BPE_SPLIT), 0).alias("_tk"),
    )
    tk = F.col("_tk")
    return toks.select(
        F.col(id_col),
        F.size(tk).cast("long").alias("n_pieces"),
        F.size(F.filter(tk, lambda t: t.rlike("^ ?[a-z]+$")))
        .cast("long")
        .alias("n_alpha"),
        F.size(F.filter(tk, lambda t: t.rlike("^ ?[0-9]+$")))
        .cast("long")
        .alias("n_num"),
        F.aggregate(
            tk, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
        ).alias("n_chars"),
    )


def stopword_ratio(col: Column) -> Column:
    toks = tokens(F.lower(col))
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    stops = F.filter(toks, lambda t: F.array_contains(stop_arr, t))
    return F.size(stops) / F.greatest(F.size(toks), F.lit(1))


def punct_ratio(col: Column) -> Column:
    no_punct = F.regexp_replace(col, r"[^\w\s]", "")
    return (F.length(col) - F.length(no_punct)) / F.greatest(F.length(col), F.lit(1))


def quality_score(col: Column) -> Column:
    """Composite quality heuristic in [0,1]: length score × (1 - punct
    overload) × stopword plausibility. Mirrors the C4/Gopher-style rule
    family (length/punct/stopword ratios) in a deterministic form."""
    n_tok = token_count(col)
    len_score = F.least(n_tok / F.lit(50.0), F.lit(1.0))
    punct_penalty = F.lit(1.0) - F.least(punct_ratio(col) * 5, F.lit(1.0))
    stop = stopword_ratio(col)
    stop_score = F.when(stop > 0.02, F.lit(1.0)).otherwise(F.lit(0.5))
    return F.round(len_score * punct_penalty * stop_score, 6)


def lang_id(col: Column) -> Column:
    """Character-class n-gram heuristic: script detection first (CJK,
    Cyrillic, Arabic), then an English-stopword ratio gate. Returns an
    ISO-ish tag. Deterministic, JVM-regex only."""
    has_cjk = F.length(F.regexp_replace(col, r"[^一-鿿]", "")) > 0
    has_cyr = F.length(F.regexp_replace(col, r"[^Ѐ-ӿ]", "")) > 0
    has_ar = F.length(F.regexp_replace(col, r"[^؀-ۿ]", "")) > 0
    en_ish = stopword_ratio(col) > 0.02
    return (
        F.when(has_cjk, F.lit("zh"))
        .when(has_cyr, F.lit("ru"))
        .when(has_ar, F.lit("ar"))
        .when(en_ish, F.lit("en"))
        .otherwise(F.lit("other"))
    )


def fingerprint(col: Column) -> Column:
    """Document fingerprint: md5 of the whitespace-normalized lowercase
    text — the exact-dedup key. See :func:`rolling_fingerprint` for the
    order-sensitive polynomial variant."""
    norm = F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")
    return F.md5(norm)


# Rolling-hash constants, pinned for cross-engine parity: with
# mod = 2^31-1 (prime) the accumulator stays < 2^31, so
# acc*base + token_hash < 2^38 + 2^32 — exact in signed-64 arithmetic
# in BOTH Spark and DuckDB (list_reduce with a prepended 0 init).
ROLL_BASE = 131
ROLL_MOD = 2_147_483_647


def rolling_fingerprint(col: Column) -> Column:
    """Order-sensitive document fingerprint: polynomial rolling hash
    over the token stream, h = fold(h*B + md5_32(token) mod M). Unlike
    the md5 bag fingerprint this distinguishes permuted documents, and
    it extends to windowed/chunk fingerprints by the classic rolling
    update. Pure higher-order fold — codegen'd long math, zero Python,
    zero shuffle."""
    toks = tokens(F.lower(col))
    hs = F.transform(
        toks, lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long")
    )
    return F.aggregate(
        hs,
        F.lit(0).cast("long"),
        lambda acc, h: (acc * ROLL_BASE + h) % ROLL_MOD,
    )


def chunk_fingerprints(
    docs: DataFrame,
    text_col: str = "text",
    window: int = 16,
    stride: int = 8,
) -> DataFrame:
    """Passage-level rolling fingerprints: the token stream is cut into
    overlapping ``window``-token chunks every ``stride`` tokens and each
    chunk gets the polynomial rolling hash — the basis for fuzzy
    CONTAINMENT detection (a copied passage inside an otherwise-new
    document matches on its chunk fingerprints even when whole-document
    hashes differ). All higher-order array ops, one explode, zero
    Python; the shuffle (if any downstream) carries (doc_id, win, fp)
    longs only, never text."""
    # hash the token stream in its OWN projection: referencing a
    # non-materialized array expression inside every window slice makes
    # codegen recompute the md5 of ALL tokens once per window.
    hashed = docs.select(
        F.col("doc_id"),
        F.transform(
            tokens(F.lower(F.col(text_col))),
            lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long"),
        ).alias("_hs"),
    )
    hs = F.col("_hs")
    starts = F.sequence(
        F.lit(1),
        F.greatest(F.size(hs) - F.lit(window) + 1, F.lit(1)),
        F.lit(stride),
    )
    fps = F.transform(
        starts,
        lambda i: F.struct(
            ((i - 1) / stride).cast("int").alias("win"),
            F.aggregate(
                F.slice(hs, i, window),
                F.lit(0).cast("long"),
                lambda acc, h: (acc * ROLL_BASE + h) % ROLL_MOD,
            ).alias("fp"),
        ),
    )
    return hashed.select(
        F.col("doc_id"), F.explode(fps).alias("c")
    ).select("doc_id", F.col("c.win").alias("win"), F.col("c.fp").alias("fp"))


# Redaction patterns chosen to parse identically under Java regex
# (Spark) and RE2 (DuckDB): no backrefs, no lookaround.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def redact_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Training-data hygiene: replace email addresses and IPv4 literals
    with fixed tags and count the redactions per document. Pure JVM
    regexp — at 100 TB this runs inside whole-stage codegen with zero
    shuffle (counts are per-row, not aggregated here)."""
    c = F.col(text_col)
    n_email = F.regexp_count(c, F.lit(EMAIL_RE)).cast("long")
    redacted1 = F.regexp_replace(c, EMAIL_RE, "<EMAIL>")
    n_ip = F.regexp_count(redacted1, F.lit(IPV4_RE)).cast("long")
    return docs.select(
        "doc_id",
        F.regexp_replace(redacted1, IPV4_RE, "<IP>").alias("redacted"),
        n_email.alias("n_emails"),
        n_ip.alias("n_ips"),
    )


def hash_split(
    df: DataFrame,
    id_col: str,
    splits: dict[str, float] | None = None,
    seed: int = 42,
) -> DataFrame:
    """Deterministic dataset splitting (train/val/test): each row's
    split is a pure function of (seed, id), so the assignment is
    reproducible across runs, machines, engines and orderings — the
    production alternative to RNG sampling, whose draw depends on
    partitioning. Adds a ``split`` column.

    u = first 8 md5 hex digits of "seed|id" scaled to [0, 1); the row
    lands in the first split whose cumulative share exceeds u. Zero
    shuffle, codegen'd; mirrored bit-for-bit in DuckDB by the demo
    oracle."""
    splits = splits or {"train": 0.9, "val": 0.05, "test": 0.05}
    total = sum(splits.values())
    assert abs(total - 1.0) < 1e-9, f"split shares must sum to 1, got {total}"
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws("|", F.lit(seed), F.col(id_col).cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("double")
        / float(1 << 32)
    )
    expr = None
    acc = 0.0
    names = list(splits)
    for name in names[:-1]:
        acc += splits[name]
        clause = F.when(u < acc, name)
        expr = clause if expr is None else expr.when(u < acc, name)
    expr = (
        F.lit(names[0]) if expr is None else expr.otherwise(names[-1])
    )
    return df.withColumn("split", expr)


def _normalize_kernel(s: pd.Series) -> pd.Series:
    return (
        s.fillna("")
        .str.replace("\r\n", "\n", regex=False)
        .str.replace("\t", "    ", regex=False)
        .str.replace(r"[ ]+\n", "\n", regex=True)
        .str.strip()
    )


def normalize_content(col) -> Column:
    """D1 vectorized content normalizer (Arrow batches): line endings,
    tabs, trailing whitespace. Reference analog: Ruspell content
    rewriting [PK: tartare/processes/contributor/ruspell.py] — heavy
    string surgery belongs in pandas, one batch at a time, never per-row
    Python. The pandas_udf is built lazily at call time: a module-level
    ``@pandas_udf`` decorator needs an active SparkSession just to
    import the module."""
    return pandas_udf(_normalize_kernel, "string")(col)


def vocab_topk(docs: DataFrame, text_col: str = "text", k: int = 50) -> DataFrame:
    """Corpus vocabulary: top-k lowercase whitespace tokens by document
    frequency and total count. The training-data 'build a vocab' op:
    explode → groupBy(token) with map-side combine → TakeOrdered(k) —
    the shuffle carries one (token, partial counts) row per distinct
    token per partition, never raw text."""
    toks = docs.select(
        F.col("doc_id"), F.explode(tokens(F.lower(F.col(text_col)))).alias("tok")
    ).filter(F.col("tok") != "")
    return (
        toks.groupBy("tok")
        .agg(
            F.count("*").alias("n_total"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .orderBy(F.desc("n_total"), F.asc("tok"))
        .limit(k)
    )


def corpus_quality_report(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """One-row corpus health report: volume, exact-dup rate, quality
    distribution — the go/no-go summary before a training run. Single
    aggregation pass (the fingerprint dup-rate rides a subaggregate)."""
    c = F.col(text_col)
    per_doc = docs.select(
        fingerprint(c).alias("fp"),
        token_count(c).alias("n_tok"),
        quality_score(c).alias("q"),
    )
    return per_doc.agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("fp").alias("n_unique"),
        F.round(F.lit(1.0) - F.countDistinct("fp") / F.count("*"), 6).alias("dup_rate"),
        F.sum("n_tok").alias("total_tokens"),
        F.round(F.avg("q"), 6).alias("mean_quality"),
        F.round(F.min("q"), 6).alias("min_quality"),
    )


def document_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    c = F.col(text_col)
    return docs.select(
        "doc_id",
        token_count(c).alias("n_tokens"),
        F.round(bpe_ish_token_count(c), 2).alias("n_bpe_tokens"),
        F.round(stopword_ratio(c), 6).alias("stop_ratio"),
        quality_score(c).alias("quality"),
        lang_id(c).alias("lang_pred"),
        fingerprint(c).alias("fp"),
    )


def gopher_repetition(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_dup_2gram_frac: float = 0.05,
    max_top_2gram_frac: float = 0.08,
    min_tokens: int = 20,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
) -> DataFrame:
    """Gopher-style repetition / quality signals per document (the Rae
    et al. 2021 repetition rules, re-expressed as pure row functions):
    duplicate-2-gram fraction, top-2-gram fraction, mean word length,
    token count, and the resulting keep/drop decision.

    Everything is a per-row array expression (split -> 2-gram build ->
    array_distinct / sorted-run fold), so the operator is codegen'd,
    shuffle-free, and scales embarrassingly: at 100 TB it is a map-only
    pass whose output is five scalars per doc — the text itself never
    moves. The top-gram count folds over the SORTED gram array with a
    (prev, run, best) struct accumulator: O(g log g) per doc instead of
    the O(g^2) re-scan of counting each distinct gram against the array.
    The token and gram arrays are materialized in their own projections
    (codegen re-evaluates non-materialized array expressions once per
    reference — SURVEY §2 F-row notes).
    """
    toks = docs.select(
        F.col(id_col),
        F.split(F.trim(F.lower(F.col(text_col))), _TOKEN_SPLIT).alias("_t"),
    )
    t = F.col("_t")
    grams_expr = F.when(
        F.size(t) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(t) - 1),
            lambda i: F.concat(
                F.element_at(t, i), F.lit(" "), F.element_at(t, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    base = toks.select(
        F.col(id_col),
        F.size(t).cast("long").alias("n_tok"),
        F.aggregate(t, F.lit(0).cast("long"), lambda a, x: a + F.length(x)).alias(
            "_chars"
        ),
        grams_expr.alias("_g"),
    )
    g = F.col("_g")
    n_gram = F.size(g).cast("long")
    # longest run in the sorted gram array == count of the modal 2-gram
    run_fold = F.aggregate(
        F.array_sort(g),
        F.struct(
            F.lit("").alias("prev"),
            F.lit(0).cast("long").alias("run"),
            F.lit(0).cast("long").alias("best"),
        ),
        lambda a, x: F.struct(
            x.alias("prev"),
            F.when(x == a["prev"], a["run"] + 1).otherwise(F.lit(1).cast("long")).alias("run"),
            F.greatest(
                a["best"],
                F.when(x == a["prev"], a["run"] + 1).otherwise(F.lit(1).cast("long")),
            ).alias("best"),
        ),
        lambda a: a["best"],
    )
    stats = base.select(
        F.col(id_col),
        F.col("n_tok"),
        F.round(F.col("_chars") / F.col("n_tok"), 4).alias("mean_word_len"),
        F.round(
            (n_gram - F.size(F.array_distinct(g)).cast("long"))
            / F.greatest(n_gram, F.lit(1).cast("long")),
            6,
        ).alias("dup_2gram_frac"),
        F.round(run_fold / F.greatest(n_gram, F.lit(1).cast("long")), 6).alias(
            "top_2gram_frac"
        ),
    )
    # coalesce makes the verdict TOTAL: a NULL-text doc yields NULL
    # stats, and a NULL keep would silently vanish from BOTH
    # `filter(keep)` and `filter(~keep)` downstream — it must be an
    # explicit drop.
    return stats.withColumn(
        "keep",
        F.coalesce(
            (F.col("n_tok") >= min_tokens)
            & (F.col("dup_2gram_frac") <= max_dup_2gram_frac)
            & (F.col("top_2gram_frac") <= max_top_2gram_frac)
            & (F.col("mean_word_len") >= min_mean_word_len)
            & (F.col("mean_word_len") <= max_mean_word_len),
            F.lit(False),
        ),
    )


def unigram_logprob(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_logprob: float = -8.0,
) -> DataFrame:
    """Corpus-self unigram language-model score per document (the
    KenLM-perplexity proxy every pre-training pipeline runs, reduced to
    its order-0 core): build the corpus unigram distribution, then score
    each document by its mean token log-probability
    ``mean(ln(count(tok)/N))``; documents of rare-token gibberish score
    far below prose drawn from the corpus head and are flagged for drop.

    Scale shape (100 TB): two shuffles, text never moves after
    tokenization. (1) tokens are pre-collapsed to DISTINCT
    ``(doc, tok, k)`` pairs map-side, so the vocab join carries one row
    per distinct token per doc — NOT one per occurrence; stopword keys
    shrink from O(total tokens) to O(docs) and the residual head skew is
    AQE-splittable (a production run would broadcast the bounded top-V
    head and shuffle-join only the tail). (2) the per-doc rollup sums an
    exact DECIMAL(18,6) fold — per-token log-probs are rounded to 6dp
    then summed in decimal, so the sum is order-independent and
    bit-identical cross-engine (float summation order can differ
    between engines/partitionings; decimals cannot).
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens(F.lower(F.col(text_col)))).alias("tok"),
    ).filter(F.col("tok") != "")
    doc_tok = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("k"))
    vocab = doc_tok.groupBy("tok").agg(F.sum("k").alias("c"))
    n = vocab.agg(F.sum("c").cast("long").alias("n_corpus"))
    scored = doc_tok.join(vocab, "tok").select(
        "doc_id",
        "k",
        (F.col("k") * F.round(F.log("c"), 6).cast("decimal(18,6)")).alias("lp"),
    )
    per = scored.groupBy("doc_id").agg(
        F.sum("k").cast("long").alias("n_tok"), F.sum("lp").alias("slp")
    )
    mean_lp = F.round(
        F.col("slp").cast("double") / F.col("n_tok")
        - F.round(F.log("n_corpus"), 6),
        4,
    )
    return (
        per.crossJoin(F.broadcast(n))
        .select(
            F.col("doc_id").alias(id_col),
            "n_tok",
            mean_lp.alias("mean_logprob"),
        )
        .withColumn("keep", F.col("mean_logprob") >= min_logprob)
    )


def quality_tiers(
    docs: DataFrame,
    n_tiers: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """CCNet-style quality tiering (Wenzek et al. 2020): score every
    document with the corpus-self unigram LM (:func:`unigram_logprob`)
    and split the corpus into ``n_tiers`` equal-size tiers by score —
    tile 1 is the best-scoring slice ("head" in CCNet's head/middle/
    tail: keep head for training, middle for augmentation, drop tail).
    Returns ``(id_col, n_tok, mean_logprob, tile)``; the demo maps
    tiles to the head/middle/tail labels.

    Scale shape: the tiering itself is the O4 two-phase global ntile —
    order-monotone coarse buckets over the NEGATED score, per-bucket
    counts, bucket-partitioned window — so the corpus-wide quantile
    split never plans a SinglePartition window, and the scoring's two
    shuffles dominate. Ties (same rounded score) break on id, so the
    tier of every boundary document is deterministic cross-engine.
    """
    from tartare_spark.operators.sort import global_ntile

    scored = unigram_logprob(docs, id_col=id_col, text_col=text_col).drop(
        "keep"
    )
    # mean_logprob DESC == -mean_logprob ASC; floor() of the sort key is
    # the order-monotone coarse bucket the two-phase rank needs.
    # Persist the narrow scored frame first: global_ntile's eager
    # per-bucket count pass would otherwise re-run the whole scoring
    # pipeline (two shuffles over the corpus) a second time when the
    # tiled result is finally acted on — the cache holds only
    # (id, n_tok, score) rows, never text.
    neg = scored.withColumn("_qt_neg", -F.col("mean_logprob")).persist()
    tiled = global_ntile(
        neg,
        bucket=F.floor(F.col("_qt_neg")),
        order_cols=["_qt_neg", id_col],
        n=n_tiers,
    )
    return tiled.drop("_qt_neg")


def mixture_weights(
    docs: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    target: dict | None = None,
    rounded: bool = True,
) -> DataFrame:
    """Training-mixture rebalancing weights per corpus group (domain /
    source): measure each group's share of corpus tokens, compare to the
    target mixture (uniform across observed groups when ``target`` is
    None), and emit the per-group sampling weight
    ``target_share / token_share`` that a downstream sampler (tx9 /
    tx10) multiplies into its rates — the DoReMi-lite operator every
    multi-source pre-training run needs.

    A target key with NO corpus presence still gets a row (n_docs=0,
    token_share=0, sample_weight=NULL — the requested share is
    unrealizable and a downstream sampler must see that loudly, not
    discover it by a missing row).

    Scale shape: ONE map-side-combined aggregation over the corpus
    (the shuffle carries one partial row per group per partition);
    everything after runs on |groups| rows with the 1-row total
    broadcast — no second corpus pass, no window over the data.
    """
    per_group = docs.groupBy(F.col(group_col).alias("grp")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_count(F.col(text_col))).cast("long").alias("group_tokens"),
    )
    if target is not None:
        missing = docs.sparkSession.createDataFrame(
            [(k,) for k in sorted(target)], f"grp {docs.schema[group_col].dataType.simpleString()}"
        )
        per_group = (
            per_group.join(missing, "grp", "full")
            .select(
                "grp",
                F.coalesce(F.col("n_docs"), F.lit(0)).cast("long").alias("n_docs"),
                F.coalesce(F.col("group_tokens"), F.lit(0))
                .cast("long")
                .alias("group_tokens"),
            )
        )
    tot = per_group.agg(
        F.sum("group_tokens").cast("long").alias("total_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_groups"),
    )
    if target is None:
        tgt = F.lit(1.0) / F.col("n_groups")
    else:
        mapping = F.create_map(
            *[F.lit(x) for kv in target.items() for x in kv]
        )
        tgt = F.coalesce(mapping[F.col("grp")], F.lit(0.0))
    share = F.try_divide(F.col("group_tokens"), F.col("total_tokens"))
    # rounded=True (default) is the report shape: 6dp for display and
    # cross-engine hash stability. rounded=False is the COMPOSITION
    # shape (apply_mixture): raw IEEE doubles, bit-identical on any
    # engine because every step is a correctly-rounded double division
    # of exactly-representable long sums — rounding would only add a
    # halfway-semantics seam between engines.
    _r = (lambda c: F.round(c, 6)) if rounded else (lambda c: c)
    return (
        per_group.crossJoin(F.broadcast(tot))
        .select(
            F.col("grp").alias(group_col),
            "n_docs",
            "group_tokens",
            _r(share).alias("token_share"),
            _r(tgt).alias("target_share"),
            # try_divide: a zero-share group's weight is NULL (ANSI
            # divide-by-zero would throw), the loud unrealizable signal
            _r(F.try_divide(tgt, share)).alias("sample_weight"),
        )
    )
