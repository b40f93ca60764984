"""Corpus-composition operators for a training-data pipeline:
stratified sampling, per-domain quota caps, and sequence packing.

Reference analog: tartare's preprocess chain decides WHICH fetched
rows flow into an export (coverage filters) [SURVEY §2.2 P2]; at LLM
corpus scale the same decision is made by composition operators —
"keep 30% of English, 5% of everything else", "at most N documents
per source", "pack documents into fixed-size training sequences".

Design rules (shared with text.hash_split):

* Every random choice is a pure function of (seed, id) via md5 —
  reproducible across runs, engines, orderings and partitionings, and
  mirrored bit-for-bit by the DuckDB demo oracles. RNG sampling (e.g.
  ``df.sample``) depends on the physical partitioning and is therefore
  unreproducible at 100 TB where partitioning is never stable.
* Zero-shuffle where semantics allow (stratified_sample is a pure
  filter); where a shuffle is inherent (quota = per-group top-k,
  packing = per-shard prefix sum) the plan is the bounded one: a
  WindowGroupLimit-trimmed top-k, or a window whose partition count
  (num_shards) scales with the cluster, never a global sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def hash_u(id_col: Column | str, seed: int = 42, salt: str = "smp") -> Column:
    """Deterministic uniform-[0,1) draw per id: first 8 md5 hex digits
    of ``"{salt}{seed}|{id}"`` scaled by 2^-32. The salt decorrelates
    this stream from other md5-derived draws over the same ids (e.g.
    hash_split's train/val/test assignment)."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return (
        F.conv(
            F.substring(F.md5(F.concat_ws("|", F.lit(f"{salt}{seed}"), c.cast("string"))), 1, 8),
            16,
            10,
        ).cast("double")
        / float(1 << 32)
    )


def hash_shard(id_col: Column | str, num_shards: int, seed: int = 42) -> Column:
    """Deterministic shard in [0, num_shards): the same md5 stream as
    :func:`hash_u` taken mod num_shards (salt ``"shard"``)."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    h = F.conv(
        F.substring(F.md5(F.concat_ws("|", F.lit(f"shard{seed}"), c.cast("string"))), 1, 8),
        16,
        10,
    ).cast("long")
    return F.pmod(h, F.lit(num_shards)).cast("int")


def stratified_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    seed: int = 42,
) -> DataFrame:
    """Per-stratum deterministic sampling: keep a row iff its hash draw
    u(seed, id) < rate(stratum). Corpus rebalancing ("upweight rare
    languages, downsample English") as a pure codegen'd FILTER — zero
    shuffle, pushes down to the scan like any predicate, and at 100 TB
    the sample is identical no matter how the input is partitioned.

    Unknown strata get ``default_rate`` (0.0 = drop)."""
    for name, r in rates.items():
        assert 0.0 <= r <= 1.0, f"rate for {name!r} out of [0,1]: {r}"
    assert 0.0 <= default_rate <= 1.0
    u = hash_u(id_col, seed)
    rate = None
    for name, r in rates.items():
        clause = (F.col(strata_col) == name, F.lit(float(r)))
        rate = F.when(*clause) if rate is None else rate.when(*clause)
    rate = F.lit(float(default_rate)) if rate is None else rate.otherwise(float(default_rate))
    return df.where(u < rate)


def quota_cap(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    cap: int,
    seed: int = 42,
) -> DataFrame:
    """Keep at most ``cap`` rows per stratum, chosen by deterministic
    hash order (a reproducible uniform draw, tie-broken by id) —
    per-domain balancing ("no source may contribute more than N docs").

    Scale shape: per-group top-k. Spark plans the row_number filter as
    a WindowGroupLimit, which trims every MAP-side partition to its
    local top-``cap`` BEFORE the shuffle — so the exchange carries at
    most cap·num_input_partitions rows per stratum, not the raw corpus.
    A hot domain with 10^9 rows still ships only O(cap) per input split
    (plan pinned in tests/test_operators.py)."""
    u = hash_u(id_col, seed)
    w = Window.partitionBy(strata_col).orderBy(F.col("_u"), F.col(id_col))
    return (
        df.withColumn("_u", u)
        .withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= cap)
        .drop("_u", "_rk")
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    weight_col: Column | str,
    capacity: int,
    num_shards: int,
    seed: int = 42,
) -> DataFrame:
    """Sequence packing for training: concatenate documents (in
    deterministic id order) into fixed-``capacity`` token sequences and
    report, per document, which sequences it lands in. Documents are
    first hash-sharded into ``num_shards`` independent streams — the
    scale unit: each shard packs alone, so a 1000-executor cluster
    packs 1000 shards in parallel and no global sort/prefix-sum ever
    happens. Within a shard the running token offset is one window
    (ONE shuffle on ``_shard``; partition size = corpus/num_shards, so
    pick num_shards ≈ cluster cores at 100 TB).

    Emits ``_shard``, ``off_begin`` (the document's first token's
    global offset within its shard stream), ``seq_first``/``seq_last``
    (the capacity-sized sequence indices the document spans — a doc
    longer than ``capacity`` spans several) and ``n_seqs``. All
    arithmetic is exact long DIV/MOD, never double division (large
    offsets beyond 2^53 stay exact).

    Weights are clamped to ≥ 1 in here (an empty document still
    occupies one slot, keeping offsets strictly increasing — a 0 or
    negative weight would otherwise silently yield seq_last < seq_first
    and non-increasing offsets)."""
    wcol = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    wcol = F.greatest(wcol.cast("long"), F.lit(1).cast("long"))
    out = df.withColumn("_w", wcol).withColumn(
        "_shard", hash_shard(id_col, num_shards, seed)
    )
    win = (
        Window.partitionBy("_shard")
        .orderBy(F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = out.withColumn("_off_end", F.sum("_w").over(win))
    off_begin = (F.col("_off_end") - F.col("_w")).alias("off_begin")
    return (
        out.select(
            F.col(id_col),
            F.col("_shard").alias("shard"),
            off_begin,
            F.col("_w").alias("weight"),
            F.expr(f"(_off_end - _w) DIV {capacity}").cast("long").alias("seq_first"),
            F.expr(f"(_off_end - 1) DIV {capacity}").cast("long").alias("seq_last"),
        )
        .withColumn("n_seqs", (F.col("seq_last") - F.col("seq_first") + F.lit(1)).cast("long"))
    )


def apply_mixture(
    docs: DataFrame,
    weights: DataFrame,
    id_col: str = "doc_id",
    group_col: str = "source",
    weight_col: str = "sample_weight",
    rate_scale: float = 1.0,
    seed: int = 42,
) -> DataFrame:
    """Materialize a training mixture: turn per-group sampling weights
    (``mixture_weights(rounded=False)`` output, or any (group, weight)
    frame) into the deterministic per-row acceptance filter
    ``u(seed, id) < least(1, rate_scale * weight)`` — the step that
    takes tx14's DoReMi-lite weights from a report to an actual
    rebalanced corpus. ``rate_scale`` trades corpus size for mixture
    fidelity (a weight > 1 cannot be realized by subsampling alone, so
    scale the whole mixture down until the largest weight fits).

    Groups ABSENT from ``weights`` and groups whose weight is NULL
    (tx14's unrealizable-target marker) are DROPPED — loudly absent
    from the output rather than silently passed through at full rate
    (Spark's ``least`` skips NULLs, so the NULL guard is explicit).

    Scale shape: the weights side is |groups| rows and is broadcast;
    the corpus side takes NO shuffle — the broadcast hash join and the
    hash draw evaluate scan-adjacent, so at 100 TB this is one streamed
    pass, exactly like :func:`stratified_sample` with derived rates.
    The draw is a pure function of (seed, id): the sample is identical
    on any engine / partitioning / cluster size.
    """
    rates = weights.select(
        F.col(group_col).alias("_mx_grp"),
        (F.col(weight_col) * F.lit(float(rate_scale))).alias("_mx_w"),
    )
    u = hash_u(id_col, seed)
    joined = docs.join(
        F.broadcast(rates), F.col(group_col) == F.col("_mx_grp"), "inner"
    )
    rate = F.least(F.lit(1.0), F.col("_mx_w"))
    return joined.where(F.col("_mx_w").isNotNull() & (u < rate)).drop(
        "_mx_grp", "_mx_w"
    )


def leakage_safe_split(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    splits: dict[str, float] | None = None,
    seed: int = 42,
) -> DataFrame:
    """Train/val/test assignment that is CONSTANT within each exact-dup
    group: the split is drawn from the group REPRESENTATIVE (min id
    over the normalized-content fingerprint), not the document id —
    so two copies of the same document can never land one in train and
    one in test. Splitting per-document (text.hash_split) leaks: at
    web-crawl dup rates a few percent of any held-out set has a
    byte-identical twin in train, and eval scores measure memorization.
    Adds ``rep_id`` (the group representative) and ``split``.

    Scale shape: one shuffle on the content fingerprint (same key as
    exact dedup — at 100 TB these share a pass), then the pure
    (seed, rep_id) hash draw; no second shuffle, no driver state. For
    NEAR-dup safety, substitute the dd7 cluster representative for the
    fingerprint min — the draw is unchanged.
    """
    from tartare_spark.operators.dedup_docs import _norm
    from tartare_spark.operators.text import hash_split

    fp = docs.withColumn("_lss_fp", F.md5(_norm(F.col(text_col))))
    rep = F.min(id_col).over(Window.partitionBy("_lss_fp"))
    tagged = hash_split(
        fp.withColumn("rep_id", rep), "rep_id", splits=splits, seed=seed
    )
    return tagged.drop("_lss_fp")
