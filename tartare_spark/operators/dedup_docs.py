"""Document deduplication for training-data pipelines (task brief):
exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale design (the 100 TB story):
- **exact**: hash-groupBy on a normalized fingerprint — one shuffle of
  (hash, id) pairs only, map-side combined.
- **MinHash+LSH**: shingle → K minhashes → B bands → band-bucket
  self-join. The self-join is on (band, band_hash) — candidate pairs
  only, never the O(n²) cross product. Hash fn is md5-hex→int so the
  DuckDB oracle can reproduce it bit-for-bit.
- **SimHash**: 64-bit majority-vote signature via higher-order array
  ops; near-dups = equal signatures on rotated bands (Hamming ≤ r).
- **n-gram Jaccard**: exact verification joined on shared shingles;
  used to verify LSH candidates (and as a standalone exact near-dup op
  on bounded inputs).

Everything is built-in functions — zero Python in any hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _norm(col):
    return F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")


# ----------------------------------------------------------------------
# exact dedup
# ----------------------------------------------------------------------
def _dup_groups(keyed: DataFrame, key_col: str, id_col: str) -> DataFrame:
    """Shared dup-group reducer: one row per key with >1 member,
    carrying the member count and the min-id keeper — the contract
    every exact-key dedup variant (content fingerprint, canonical URL)
    shares. One map-side-combined hash groupBy."""
    return (
        keyed.groupBy(key_col)
        .agg(F.count("*").alias("n_dups"), F.min(id_col).alias("keep_id"))
        .filter(F.col("n_dups") > 1)
    )


def exact_dedup_groups(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Groups of byte-identical (post-normalization) documents: one row
    per duplicated fingerprint with the member count and the keeper
    (min id)."""
    fp = docs.select(F.col(id_col), F.md5(_norm(F.col(text_col))).alias("fp"))
    return _dup_groups(fp, "fp", id_col)


# ----------------------------------------------------------------------
# shingling + oracle-reproducible hashing
# ----------------------------------------------------------------------
def word_shingles(col, n: int = 3):
    """n-word shingles as an array<string> (distinct).

    NOTE: this single-expression form references the tokenized array
    once per shingle word, and codegen re-evaluates the regexp+split
    for every reference (~6× slower than materializing tokens first).
    Hot paths should use :func:`shingle_rows` instead; this stays for
    expression-level composition."""
    toks = F.split(_norm(col), " ")
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    sh = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, (i + j + 1).cast("int")) for j in range(n)]
        ),
    )
    return F.array_distinct(
        F.when(F.size(toks) >= n, sh).otherwise(F.array(_norm(col)))
    )


def shingle_rows(docs: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """Exploded (id, shingle) rows — the hot-path shingler. Tokens are
    materialized in their OWN projection first: the shingle expression
    references the token array n+2 times, and whole-stage codegen
    re-evaluates a non-materialized split+regexp per reference
    (measured ~6× at sf0.1). Same output values as word_shingles."""
    t = docs.select(
        F.col(id_col), F.split(_norm(F.col(text_col)), " ").alias("_tk")
    )
    toks = F.col("_tk")
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    sh = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, (i + j + 1).cast("int")) for j in range(n)]
        ),
    )
    expr = F.array_distinct(
        # joining the tokens back with single spaces == the normalized
        # text (norm collapsed whitespace), so values match word_shingles
        F.when(F.size(toks) >= n, sh).otherwise(F.array(F.concat_ws(" ", toks)))
    )
    return t.select(F.col(id_col), F.explode(expr).alias("s"))


def md5_int(col):
    """First 15 hex digits of md5 as a BIGINT — reproducible in DuckDB
    as CAST('0x'||substr(md5(x),1,15) AS BIGINT)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def md5_int32(col):
    """First 8 hex digits of md5 as a BIGINT in [0, 2^32) — the base
    hash for the affine MinHash family (DuckDB:
    CAST('0x'||substr(md5(x),1,8) AS BIGINT))."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


# Affine universal-hash family over the 32-bit base hash:
# h_i(s) = (A[i]*md5_32(s) + B[i]) mod 2^32. One md5 per shingle instead
# of k (the K-seeded-md5 variant recomputes the digest k times — at
# 100 TB the digest IS the dominant cost). A[i] odd and < 2^30 keeps
# A*h + B < 2^62: exact in signed-64 arithmetic in BOTH Spark and DuckDB
# (DuckDB raises on BIGINT overflow, so staying in range is part of the
# oracle contract). Constants are pinned literals for bit-parity.
MINHASH_MOD = 2**32
MINHASH_A = [(1000003 * (2 * i + 1)) % 2**30 | 1 for i in range(16)]
MINHASH_B = [(777767777 * (i + 1)) % 2**32 for i in range(16)]


# ----------------------------------------------------------------------
# MinHash + LSH
# ----------------------------------------------------------------------
def minhash_signature(docs: DataFrame, id_col: str, text_col: str, k: int = 12, shingle_n: int = 3) -> DataFrame:
    """K minhashes per doc as an array column ``sig`` of length k:
    h_i = min over shingles of (A[i]*md5_32(shingle) + B[i]) mod 2^32.

    Shape: explode shingles → ONE md5 per shingle → groupBy(doc) with k
    min-aggregates over cheap affine transforms (codegen'd long math).
    The explode multiplies rows by |shingles| but every min() is
    map-side combined, so the shuffle carries exactly k longs per doc —
    the standard MinHash-on-Spark plan at any scale. The earlier
    k-seeded-md5 variant recomputed the digest k times per shingle;
    the digest dominates, so this is ~k× less hashing."""
    assert k <= len(MINHASH_A)
    sh = shingle_rows(docs, id_col, text_col, shingle_n).select(
        F.col(id_col), md5_int32(F.col("s")).alias("h")
    )
    aggs = [
        F.min(
            (F.lit(MINHASH_A[i]) * F.col("h") + F.lit(MINHASH_B[i]))
            % F.lit(MINHASH_MOD)
        ).alias(f"_h{i}")
        for i in range(k)
    ]
    packed = sh.groupBy(id_col).agg(*aggs)
    return packed.select(
        F.col(id_col), F.array(*[F.col(f"_h{i}") for i in range(k)]).alias("sig")
    )


def _band_rows(
    sig: DataFrame, id_col: str, k: int, bands: int
) -> DataFrame:
    """(id, band, bkey) rows from a minhash signature frame: the banded
    LSH bucketing shared by the self-join (:func:`lsh_candidates`) and
    the persisted incremental index (:func:`build_minhash_index`)."""
    r = k // bands
    return sig.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.concat_ws(
                            ",", *[F.col("sig")[b * r + j].cast("string") for j in range(r)]
                        ).alias("bkey"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(F.col(id_col), F.col("bb.band"), F.col("bb.bkey"))


def lsh_candidates(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 12,
    bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """Candidate near-duplicate pairs via banded LSH: docs sharing ANY
    band of the minhash signature. Returns (id_a, id_b) with id_a < id_b,
    distinct. rows/band = k // bands."""
    assert k % bands == 0, f"k={k} must divide evenly into bands={bands}"
    sig = minhash_signature(docs, id_col, text_col, k, shingle_n)
    band_rows = _band_rows(sig, id_col, k, bands)
    a = band_rows.alias("a")
    b = band_rows.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )
    return pairs


def build_minhash_index(
    docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 12,
    bands: int = 12,
    shingle_n: int = 3,
) -> None:
    """One-time persisted MinHash band index over a corpus — the
    incremental-dedup shape a training pipeline actually runs at 100 TB:
    the existing corpus is shingled/hashed ONCE and its band rows land
    under ``path/bands/band=<b>/`` (parquet, partitioned by band); each
    arriving batch then hashes only ITSELF and equi-joins the index
    (:func:`query_minhash_index`) instead of re-running LSH over
    corpus ∪ batch per ingest. Hash-family parameters and the schema go
    in ``path/meta.json`` so queries hash identically and read with an
    explicit schema (no footer sampling — same discipline as the
    sign-LSH/IVF indexes in operators/similarity.py)."""
    assert k % bands == 0, f"k={k} must divide evenly into bands={bands}"
    import json as _json
    import os as _os

    sig = minhash_signature(docs, id_col, text_col, k, shingle_n)
    br = _band_rows(sig, id_col, k, bands)
    br.write.partitionBy("band").mode("overwrite").parquet(f"{path}/bands")
    _os.makedirs(path, exist_ok=True)
    with open(f"{path}/meta.json", "w") as f:
        _json.dump(
            {
                "id_col": id_col,
                "k": k,
                "bands": bands,
                "shingle_n": shingle_n,
                "schema": br.schema.jsonValue(),
            },
            f,
        )


def query_minhash_index(
    spark,
    path: str,
    new_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    probe_bands: list[int] | None = None,
) -> DataFrame:
    """Candidate near-dup pairs (``new_id``, ``idx_id``) between a new
    batch and the persisted corpus index: the batch is hashed with the
    SAVED parameters and its band rows equi-join the index on
    (band, bkey) — per-ingest cost is O(batch), never O(corpus).
    ``probe_bands`` restricts the join to a subset of bands: the index
    scan partition-prunes to those ``band=`` directories (a cheaper,
    lower-recall probe — recall falls from 1-(1-s^r)^bands to the same
    expression over |probe_bands|)."""
    import json as _json

    from pyspark.sql.types import StructType

    with open(f"{path}/meta.json") as f:
        meta = _json.load(f)
    idx_id = meta["id_col"]
    idx = spark.read.schema(
        StructType.fromJson(meta["schema"])
    ).parquet(f"{path}/bands")
    sig = minhash_signature(
        new_docs, id_col, text_col, meta["k"], meta["shingle_n"]
    )
    nb = _band_rows(sig, id_col, meta["k"], meta["bands"])
    if probe_bands is not None:
        idx = idx.filter(F.col("band").isin(list(probe_bands)))
        nb = nb.filter(F.col("band").isin(list(probe_bands)))
    n, c = nb.alias("n"), idx.alias("c")
    return (
        n.join(
            c,
            (F.col("n.band") == F.col("c.band"))
            & (F.col("n.bkey") == F.col("c.bkey")),
        )
        .select(
            F.col(f"n.{id_col}").alias("new_id"),
            F.col(f"c.{idx_id}").alias("idx_id"),
        )
        .distinct()
    )


def jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    threshold: float = 0.8,
    max_df: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs ≥ threshold, computed by
    joining on shared shingles (never materializing non-overlapping
    pairs). |A∩B| from the join; |A|,|B| from per-doc shingle counts.

    ``max_df`` guards the self-join against ubiquitous shingles (e.g. a
    license-header line shared by every file): any shingle appearing in
    more than ``max_df`` documents is dropped from the shingle space
    BEFORE the join — without it one high-document-frequency shingle
    makes the join quadratic in corpus size. Jaccard is then computed
    over the filtered shingle space (both intersection and sizes), which
    also improves precision by ignoring boilerplate."""
    sh = shingle_rows(docs, id_col, text_col, shingle_n)
    if max_df is not None:
        dfreq = sh.groupBy("s").agg(F.count("*").alias("_df"))
        sh = sh.join(dfreq.filter(F.col("_df") <= max_df).select("s"), "s")
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("sz"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .groupBy(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .agg(F.count("*").alias("inter"))
    )
    out = (
        inter.join(sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a")), "id_a")
        .join(sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b")), "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 6
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return out


# ----------------------------------------------------------------------
# SimHash
# ----------------------------------------------------------------------
def simhash(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 32) -> DataFrame:
    """SimHash signature: for each bit, majority vote over token hashes.
    Pure higher-order-function implementation (no UDF): token → md5_int,
    bit b of the signature = 1 iff #tokens with bit b set > #tokens/2."""
    toks = docs.select(
        F.col(id_col),
        F.explode(F.array_distinct(F.split(_norm(F.col(text_col)), " "))).alias("t"),
    )
    h = toks.select(F.col(id_col), md5_int(F.col("t")).alias("h"))
    # per-bit set counts in ONE groupBy (bits sum-aggregates, map-side
    # combined); then the signature is plain column arithmetic.
    aggs = [F.count("*").alias("_n")] + [
        F.sum(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1))).alias(f"_b{b}")
        for b in range(bits)
    ]
    counts = h.groupBy(id_col).agg(*aggs)
    sig = None
    for b in range(bits):
        term = F.when(
            F.col(f"_b{b}") * 2 > F.col("_n"), F.lit(1 << b).cast("long")
        ).otherwise(F.lit(0).cast("long"))
        sig = term if sig is None else sig + term
    return counts.select(F.col(id_col), sig.alias("simhash"))


def simhash_near_dups_banded(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 32,
    r: int = 3,
) -> DataFrame:
    """Near-dup pairs at Hamming distance ≤ r via pigeonhole banding:
    the ``bits``-bit signature is split into r+1 disjoint bands, so any
    pair within distance r agrees EXACTLY on at least one band.
    Candidates are the equi-self-join on (band, band_value) — the same
    bucketed join shape as MinHash LSH, never all-pairs — then verified
    with ``bit_count(sig_a XOR sig_b) <= r`` (codegen'd long math).

    Returns (id_a, id_b, hamming) with id_a < id_b, distinct."""
    n_bands = r + 1
    base, rem = divmod(bits, n_bands)
    widths = [base + 1] * rem + [base] * (n_bands - rem)
    offsets = [sum(widths[:b]) for b in range(n_bands)]

    s = simhash(docs, id_col, text_col, bits)
    bands = s.select(
        F.col(id_col),
        F.col("simhash"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright(F.col("simhash"), offsets[b])
                        .bitwiseAND(F.lit((1 << widths[b]) - 1).cast("long"))
                        .alias("bval"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bb"),
    ).select(F.col(id_col), F.col("simhash"), F.col("bb.band"), F.col("bb.bval"))
    a, c = bands.alias("a"), bands.alias("c")
    cand = (
        a.join(
            c,
            (F.col("a.band") == F.col("c.band"))
            & (F.col("a.bval") == F.col("c.bval"))
            & (F.col(f"a.{id_col}") < F.col(f"c.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"c.{id_col}").alias("id_b"),
            F.col("a.simhash").alias("_sa"),
            F.col("c.simhash").alias("_sb"),
        )
        .distinct()
    )
    return (
        cand.select(
            "id_a",
            "id_b",
            F.bit_count(F.col("_sa").bitwiseXOR(F.col("_sb"))).cast("int").alias("hamming"),
        )
        .filter(F.col("hamming") <= r)
    )


def dup_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Connected components over a candidate-pair graph — the step a
    dedup pipeline needs BETWEEN pair generation (minhash/simhash/
    jaccard candidates) and "keep one document per duplicate group":
    near-duplication is transitive through chains (A≈B, B≈C ⇒ one
    group), so pairwise output alone under-deletes.

    Returns ``(doc_id, cluster_id)`` for every id appearing in a pair,
    where ``cluster_id`` is the MINIMUM doc id in the component —
    deterministic, order-insensitive, and oracle-able as a recursive
    transitive closure.

    Algorithm: iterative min-label propagation with POINTER JUMPING —
    each round every node takes the min of its own label, its
    neighbors' labels, and its label's label (path shortcutting, the
    doubling trick from the MapReduce connected-components literature).
    Per round: one edges⋈labels join + min-agg, one labels⋈labels
    self-join — all shuffle-partitioned on node id, no driver-side
    graph. Shortcutting makes rounds O(log diameter) instead of
    O(diameter): a 40-node chain converges in ~6 rounds, and real
    near-dup components (dense cliques with stragglers) in 2–3. The
    only driver-side value per round is the scalar convergence count.
    Raises if ``max_iter`` rounds don't converge (never silently
    returns partial labels)."""
    e = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    edges = (
        e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .persist()
    )
    # localCheckpoint (NOT persist) each round: an iterative dataflow's
    # logical plan otherwise grows by a self-join per round — Catalyst
    # re-analyzes the whole lineage every iteration and the driver dies
    # in plan bookkeeping long before the data is big. Checkpointing
    # materializes the ~|V|-row label table and truncates the plan, so
    # every round starts from a flat scan.
    labels = (
        edges.select("src")
        .distinct()
        .select(F.col("src"), F.col("src").alias("label"))
        .localCheckpoint()
    )
    try:
        for _ in range(max_iter):
            nbr_min = (
                edges.join(
                    labels.select(
                        F.col("src").alias("dst"), F.col("label").alias("dlabel")
                    ),
                    on="dst",
                )
                .groupBy("src")
                .agg(F.min("dlabel").alias("nmin"))
            )
            prop = labels.join(nbr_min, on="src", how="left").select(
                "src",
                F.least(
                    F.col("label"), F.coalesce("nmin", F.col("label"))
                ).alias("label"),
            )
            # pointer jumping: follow the label one hop (labels are node
            # ids, so L(v)'s own label exists) — L(L(v)) ≤ L(v) always
            new_labels = (
                prop.join(
                    prop.select(
                        F.col("src").alias("label"), F.col("label").alias("ll")
                    ),
                    on="label",
                    how="left",
                )
                .select("src", F.coalesce("ll", "label").alias("label"))
                .localCheckpoint(eager=False)
            )
            # ONE job per round: the convergence count materializes the
            # (lazy) checkpoint as a side effect
            changed = (
                new_labels.join(
                    labels.select("src", F.col("label").alias("old")), on="src"
                )
                .filter(F.col("label") != F.col("old"))
                .count()
            )
            labels = new_labels
            if changed == 0:
                return labels.select(
                    F.col("src").alias("doc_id"), F.col("label").alias("cluster_id")
                )
        raise RuntimeError(
            f"dup_clusters did not converge in {max_iter} rounds; the "
            "component diameter exceeds 2^rounds — raise max_iter"
        )
    finally:
        edges.unpersist()


def simhash_near_dups(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 32) -> DataFrame:
    """Near-dup pairs with IDENTICAL simhash (Hamming 0 fast path); use
    :func:`simhash_near_dups_banded` for the Hamming ≤ r search."""
    s = simhash(docs, id_col, text_col, bits)
    a, b = s.alias("a"), s.alias("b")
    return (
        a.join(
            b,
            (F.col("a.simhash") == F.col("b.simhash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
    )


def contamination_report(
    train: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    min_overlap: int = 1,
) -> DataFrame:
    """Benchmark decontamination: find training documents that share at
    least ``min_overlap`` distinct n-gram shingles with any evaluation/
    benchmark document — the standard pre-training hygiene pass (eval
    answers leaking into the corpus inflate scores).

    Scale shape: shingle both sides (one md5-free pass each), equi-join
    on the shingle STRING with the benchmark side broadcast (eval sets
    are tiny by definition — thousands of docs vs a 100 TB corpus), and
    count shared shingles per (train, bench) pair. The corpus is
    streamed through a broadcast hash join: no shuffle of the corpus,
    no all-pairs comparison, cost O(corpus shingles). ``shingle_rows``
    emits DISTINCT shingles per doc, so ``count(*)`` per pair IS the
    distinct-overlap count."""
    tr = shingle_rows(train, id_col, text_col, shingle_n).withColumnRenamed(
        id_col, "train_id"
    )
    be = shingle_rows(bench, id_col, text_col, shingle_n).withColumnRenamed(
        id_col, "bench_id"
    )
    return (
        tr.join(F.broadcast(be), "s")
        .groupBy("train_id", "bench_id")
        .agg(F.count("*").alias("n_shared"))
        .where(F.col("n_shared") >= min_overlap)
    )


def span_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 8,
    max_shared_frac: float = 0.5,
    stride: int | None = None,
) -> DataFrame:
    """Cross-document duplicated-SPAN accounting (the RefinedWeb /
    exact-substring-dedup shape at span granularity): cut every doc
    into ``window``-token spans every ``stride`` tokens, fingerprint
    each span with the rolling hash (text.chunk_fingerprints), and mark
    a span SHARED when the same fingerprint occurs in more than one
    document. Docs whose shared-span fraction reaches
    ``max_shared_frac`` are flagged for drop — the remedy for
    boilerplate and mirrored passages that whole-document dedup
    (dd1/dd2) cannot see.

    ALIGNMENT CAVEAT — the default ``stride=window`` (non-overlapping
    spans) only detects duplication aligned to the same offset mod
    ``window`` in both docs: prepend one token to a copied passage and
    every grid span differs. That default is the cheap screening pass
    (1/window-th the span volume). For offset-INDEPENDENT detection set
    ``stride=1``: every window-gram is fingerprinted, so any copied run
    of >= 2*window-1 tokens is guaranteed to produce a shared
    fingerprint regardless of alignment, at window× the span volume
    (still only (doc_id, fp) longs — the true exact-substring-dedup
    shape short of a suffix array).

    Scale shape: the shuffle never carries text — only (doc_id, fp)
    longs. Cross-doc sharing is decided with min(doc_id) != max(doc_id)
    over a fingerprint-partitioned window (self-repetition within one
    doc does NOT count), so the whole operator is TWO exchanges: one on
    fp, one for the per-doc rollup — no join against a shared-fp list
    (the join form costs a third shuffle of the span table). At 100 TB
    the fp exchange is uniform by construction (rolling hash), so no
    skew handling is needed.
    """
    from pyspark.sql import Window

    from .text import chunk_fingerprints

    spans = chunk_fingerprints(
        docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("_sd_text")),
        text_col="_sd_text",
        window=window,
        stride=window if stride is None else stride,
    )
    w = Window.partitionBy("fp")
    marked = spans.select(
        "doc_id",
        (F.min("doc_id").over(w) != F.max("doc_id").over(w)).alias("_cross"),
    )
    per_doc = marked.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum(F.col("_cross").cast("long")).alias("n_shared"),
    )
    return per_doc.select(
        "doc_id",
        "n_spans",
        "n_shared",
        F.round(F.col("n_shared") / F.col("n_spans"), 6).alias("shared_frac"),
        (F.col("n_shared") / F.col("n_spans") < max_shared_frac).alias("keep"),
    )


# ----------------------------------------------------------------------
# URL-canonicalization dedup
# ----------------------------------------------------------------------
def canonical_url(col):
    """Canonical form of a crawl URL: lowercase, scheme and ``www.``
    prefix stripped, query string / fragment stripped, trailing slashes
    stripped. Pure codegen'd regexp chain — evaluated scan-adjacent,
    zero shuffle, identical on any engine with anchored RE2-portable
    patterns."""
    c = F.lower(F.trim(col))
    c = F.regexp_replace(c, r"^https?://", "")
    c = F.regexp_replace(c, r"^www\.", "")
    c = F.regexp_replace(c, r"[?#].*$", "")
    return F.regexp_replace(c, r"/+$", "")


def canonical_url_dedup(
    docs: DataFrame, id_col: str = "doc_id", url_col: str = "url"
) -> DataFrame:
    """URL dedup (the RefinedWeb/CCNet first-pass dedup step, run
    BEFORE any content hashing because it needs no document bytes at
    all): group crawl records by canonical URL, keep the min-id record
    per group. One row per duplicated canonical URL with the member
    count and the keeper.

    Scale shape (same as :func:`exact_dedup_groups`): one hash
    groupBy with map-side partial aggregation — the shuffle carries
    (canon_url, id) pairs only, never content. Canonical URLs are
    near-uniform hash keys, so no skew handling is needed; at 100 TB
    this is the cheapest dedup pass in the pipeline and should run
    first to shrink everything downstream.
    """
    c = docs.select(
        F.col(id_col), canonical_url(F.col(url_col)).alias("canon_url")
    )
    return _dup_groups(c, "canon_url", id_col)


# ----------------------------------------------------------------------
# C4-style duplicate-span REMOVAL (rewrite, not just accounting)
# ----------------------------------------------------------------------
def span_remove(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 8,
) -> DataFrame:
    """C4-style exact duplicate-span REMOVAL: cut every document into
    non-overlapping ``window``-token spans, keep only the globally
    FIRST occurrence of each span (lowest ``(doc_id, position)``), and
    reconstruct each document's text from its surviving spans — the
    rewrite step C4 describes as "we removed all but one of any
    three-sentence span occurring more than once", at token-span
    granularity. :func:`span_dedup` (dd10) only ACCOUNTS shared spans
    per doc; this operator produces the cleaned corpus.

    Returns (doc_id, clean_text, n_spans, n_removed) — one row per
    input document (documents reduced to nothing keep an empty
    clean_text rather than vanishing).

    Scale shape (three exchanges, only ONE carries text):
    - the first-occurrence decision runs over (doc_id, pos, fp) longs
      only — the span text never enters the fp-partitioned window
      shuffle (fp = xxhash64(span); a 64-bit collision falsely merges
      two distinct spans, ~n²/2^65 — the standard C4/RefinedWeb
      trade, negligible below ~10^9 spans and still only a single
      over-removed span each beyond);
    - span rows and keep-flags are then both repartitioned by doc_id,
      so the flag join (keys doc_id+pos — HashPartitioning on the
      doc_id subset satisfies the clustered distribution) and the
      final per-doc reconstruction groupBy run exchange-free on top
      of that single text-carrying repartition.
    - first-occurrence order is encoded as doc_id*2^32+pos for a
      single-long min; ids must fit 31 bits and positions 32 (swap in
      a struct-ordered min for wider domains).
    """
    from pyspark.sql import Window

    n = F.size("_tk")
    spans = F.when(
        n > 0,
        F.transform(
            F.sequence(F.lit(0), F.ceil(n / window).cast("int") - 1),
            lambda i: F.struct(
                (i * window + 1).cast("long").alias("pos"),
                F.array_join(
                    F.slice("_tk", i * window + 1, window), " "
                ).alias("span"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<pos:long,span:string>>"))
    # materialize the token array in its own projection (a referenced
    # non-materialized array expression is re-evaluated per element)
    from .text import tokens

    tk = docs.select(
        F.col(id_col).alias("doc_id"),
        F.filter(
            tokens(F.lower(F.col(text_col))), lambda x: x != ""
        ).alias("_tk"),
    )
    sp = (
        tk.select("doc_id", F.explode_outer(spans).alias("_s"))
        .select("doc_id", F.col("_s.pos").alias("pos"), F.col("_s.span").alias("span"))
    )
    k = (F.col("doc_id") * F.lit(4294967296)) + F.col("pos")
    lean = sp.filter(F.col("pos").isNotNull()).select(
        "doc_id", "pos", F.xxhash64("span").alias("fp"), k.alias("_k")
    )
    flags = (
        lean.withColumn("_first", F.min("_k").over(Window.partitionBy("fp")))
        .select(
            "doc_id", "pos", (F.col("_k") == F.col("_first")).alias("_keep")
        )
        .repartition("doc_id")
    )
    joined = sp.repartition("doc_id").join(flags, ["doc_id", "pos"], "left")
    return (
        joined.groupBy("doc_id")
        .agg(
            F.count("pos").alias("n_spans"),
            (
                F.count("pos") - F.coalesce(
                    F.sum(F.col("_keep").cast("long")), F.lit(0)
                )
            ).alias("n_removed"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("_keep"),
                                F.struct(F.col("pos"), F.col("span")),
                            )
                        )
                    ),
                    lambda x: x["span"],
                ),
                " ",
            ).alias("clean_text"),
        )
        .select("doc_id", "clean_text", "n_spans", "n_removed")
    )
