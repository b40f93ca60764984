"""End-to-end corpus curation: the composed pre-training data pipeline.

Chains the individually-oracle-checked stages — exact near-identity
dedup (dd1 family) FIRST, then Gopher repetition rules (tx12),
cross-document span dedup (dd10), and corpus-self unigram LM scoring
(tx13) over the exact-dedup survivors — into the one report a
data-curation run actually ships: per-source candidate counts,
survivor counts, and surviving token volume (which then feeds the
mixture-weight / sampler stages tx14/tx9/tx10).

Stage ORDER is load-bearing: exact dedup must run before the
cross-document stages, because a pair of identical docs marks every
span of BOTH copies as cross-doc-shared (and skews the unigram
distribution) — running span dedup on the raw corpus would discard
all copies instead of keeping one. The row-local gopher stage is
order-independent; it runs on survivors only to avoid wasted work.

Scale shape: every stage output is a narrow (doc_id, flag) frame — the
text column never leaves its own stage's scan — and the final join
keys all stages on doc_id, so after the first shuffle the joins
co-partition. tx12 is map-only; the exact-dup window, dd10's fp
window, and tx13's vocab join are each one-to-two exchanges carrying
longs/flags. At 100 TB the row-local stages would fuse into a single
projection; they are kept as separate composable frames here because
each is independently oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup_docs import span_dedup
from .text import fingerprint, gopher_repetition, unigram_logprob


def curate_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "source",
    min_logprob: float = -3.5,
) -> DataFrame:
    """Per-``group_col`` curation report: candidates in, survivors of
    exact-dedup → (gopher ∧ span-unique ∧ LM-score) out, with the
    surviving token budget. Survivor of the exact stage = the smallest
    ``id_col`` in each normalized-text fingerprint group (same greedy
    rule as dd1/sim4); ``n_docs`` counts ALL candidates, so
    ``n_docs - n_kept`` is the total drop volume per group."""
    did = F.col(id_col)
    w = Window.partitionBy(fingerprint(F.col(text_col)))
    survivors = (
        docs.select(
            did,
            F.col(text_col),
            F.col(group_col),
            (did == F.min(did).over(w)).alias("_keep_exact"),
        )
        .where(F.col("_keep_exact"))
        .drop("_keep_exact")
    )
    g = gopher_repetition(survivors, id_col=id_col, text_col=text_col).select(
        did, F.col("keep").alias("keep_gopher")
    )
    sp = span_dedup(survivors, id_col=id_col, text_col=text_col).select(
        F.col("doc_id").alias(id_col), F.col("keep").alias("keep_span")
    )
    lm = unigram_logprob(
        survivors, id_col=id_col, text_col=text_col, min_logprob=min_logprob
    ).select(did, "n_tok", F.col("keep").alias("keep_lm"))
    surv = (
        survivors.select(did, F.col(group_col))
        .join(g, id_col)
        .join(sp, id_col)
        .join(lm, id_col)
        .select(
            group_col,
            "n_tok",
            (F.col("keep_gopher") & F.col("keep_span") & F.col("keep_lm")).alias(
                "keep_all"
            ),
        )
    )
    kept = surv.groupBy(group_col).agg(
        F.sum(F.col("keep_all").cast("long")).alias("n_kept"),
        F.sum(F.when(F.col("keep_all"), F.col("n_tok")).otherwise(F.lit(0)))
        .cast("long")
        .alias("tokens_kept"),
    )
    candidates = docs.groupBy(F.col(group_col)).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    return (
        candidates.join(kept, group_col, "left")
        .select(
            group_col,
            "n_docs",
            F.coalesce(F.col("n_kept"), F.lit(0)).cast("long").alias("n_kept"),
            F.round(
                F.coalesce(F.col("n_kept"), F.lit(0)) / F.col("n_docs"), 6
            ).alias("kept_frac"),
            F.coalesce(F.col("tokens_kept"), F.lit(0))
            .cast("long")
            .alias("tokens_kept"),
        )
    )
