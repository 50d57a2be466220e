"""Corpus-level deduplication for training-data pipelines.

Exact (fingerprint groupBy), MinHash + LSH banding, SimHash with
hamming-banded candidate pairs, exact n-gram Jaccard verification, and
embedding-cosine near-dup — each expressed shuffle-minimal:

- signatures are one explode + one groupBy (map-side combined);
- candidate generation is always an equi-join on a band/bucket hash
  (skew-safe, AQE-eligible), never a cross join;
- verification joins only the candidate pairs back to the shingle sets.

Portable md5-based hashing (functions/hashing.portable_hash64) keeps every
stage reproducible in the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text
from ..functions.hashing import portable_hash64, portable_hash64_pair

_MOD = 1_000_000_007


def exact_dedupe(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Survivor per normalized-text fingerprint (min id), with dup counts."""
    return (
        docs.select(F.col(id_col), text.fingerprint(F.col(text_col)).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.min(id_col).alias("survivor"), F.count(F.lit(1)).alias("n_dups"))
    )


def shingle_set(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                k: int = 3) -> DataFrame:
    """(id, sh) distinct word-k-shingles; tokens materialized first (see
    functions/text.shingles_from_tokens)."""
    return (
        docs.select(F.col(id_col), text.tokens(F.col(text_col)).alias("toks"))
        .select(id_col, F.explode(text.shingles_from_tokens(F.col("toks"), k)).alias("sh"))
        .distinct()
    )


def minhash_signatures(shingles: DataFrame, id_col: str = "doc_id",
                       num_hashes: int = 8) -> DataFrame:
    """One pass: H min-hash columns h0..h{H-1} per document.

    ONE md5 per shingle, H derived hashes h_i = h1 + i*h2
    (Kirsch-Mitzenmacher) — at corpus scale the signature stage is
    hash-bound, so this is an Hx cut in per-shingle CPU."""
    if not 1 <= num_hashes <= 8:
        # h1 + i*h2 is proven < 2^63 only for i <= 7 (portable_hash64_pair
        # sizes h1/h2 for that bound); beyond it Spark's non-ANSI bigint
        # silently wraps while the DuckDB oracle errors — never allow the
        # divergence to happen quietly
        raise ValueError("num_hashes must be in [1, 8] for the "
                         "overflow-free Kirsch-Mitzenmacher derivation")
    h1, h2 = portable_hash64_pair(F.col("sh"))
    return shingles.groupBy(id_col).agg(
        *[F.min(h1 + F.lit(i) * h2).alias(f"h{i}") for i in range(num_hashes)]
    )


def lsh_candidate_pairs(sig: DataFrame, id_col: str = "doc_id",
                        num_hashes: int = 8, bands: int = 4) -> DataFrame:
    """Banding: docs sharing any band hash become a candidate pair.
    rows_per_band = num_hashes // bands."""
    rpb = num_hashes // bands
    parts = []
    for b in range(bands):
        bh = F.lit(0).cast("long")
        for r in range(rpb):
            bh = (bh * 1000003 + F.col(f"h{b * rpb + r}") % _MOD) % _MOD
        parts.append(sig.select(F.col(id_col), F.lit(b).alias("band"), bh.alias("bh")))
    bands_df = parts[0]
    for p in parts[1:]:
        bands_df = bands_df.unionByName(p)
    a = bands_df.select(F.col(id_col).alias("id_a"), "band", "bh")
    b_ = bands_df.select(F.col(id_col).alias("id_b"), "band", "bh")
    return (
        a.join(b_, ["band", "bh"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def jaccard_verify(shingles: DataFrame, pairs: DataFrame,
                   id_col: str = "doc_id", threshold: float = 0.0) -> DataFrame:
    """Exact |A∩B| / |A∪B| for candidate pairs only (semi-joined shingle
    sets — the corpus never cross-joins)."""
    sizes = shingles.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    sa = shingles.select(F.col(id_col).alias("id_a"), "sh")
    sb = shingles.select(F.col(id_col).alias("id_b"), "sh")
    inter = (
        pairs.join(sa, "id_a").join(sb, ["id_b", "sh"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    out = (
        pairs.join(inter, ["id_a", "id_b"], "left")
        .na.fill({"n_inter": 0})
        .join(sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a")), "id_a")
        .join(sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b")), "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_inter") / (F.col("sz_a") + F.col("sz_b") - F.col("n_inter")), 6
            ),
        )
        .select("id_a", "id_b", "jaccard")
    )
    return out.filter(F.col("jaccard") >= threshold) if threshold > 0 else out


def simhash(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
            bits: int = 16) -> DataFrame:
    """SimHash over whitespace tokens: per bit, sum of +/-1 weighted by the
    token's portable hash bit; sign -> fingerprint bit. One explode + one
    groupBy with `bits` conditional sums."""
    toks = (
        docs.select(F.col(id_col), F.explode(text.tokens(F.col(text_col))).alias("tok"))
        .withColumn("h", portable_hash64(F.col("tok"), "simhash"))
    )
    sums = toks.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(F.shiftrightunsigned(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"s{b}")
            for b in range(bits)
        ]
    )
    fp = F.lit(0).cast("long")
    for b in range(bits):
        fp = fp + F.when(F.col(f"s{b}") > 0, F.lit(1 << b)).otherwise(0)
    return sums.select(F.col(id_col), fp.alias("simhash"))


def simhash_near_dupes(sim: DataFrame, id_col: str = "doc_id",
                       bits: int = 16, bands: int = 4,
                       max_hamming: int = 3) -> DataFrame:
    """Candidate pairs by banded simhash (hamming <= bands-1 guaranteed to
    share a band); verified with exact popcount hamming distance."""
    bw = bits // bands
    mask = (1 << bw) - 1
    parts = []
    for b in range(bands):
        band_val = F.shiftrightunsigned(F.col("simhash"), b * bw).bitwiseAND(F.lit(mask))
        parts.append(sim.select(F.col(id_col), F.col("simhash"), F.lit(b).alias("band"), band_val.alias("bv")))
    bands_df = parts[0]
    for p in parts[1:]:
        bands_df = bands_df.unionByName(p)
    a = bands_df.select(F.col(id_col).alias("id_a"), F.col("simhash").alias("sh_a"), "band", "bv")
    b_ = bands_df.select(F.col(id_col).alias("id_b"), F.col("simhash").alias("sh_b"), "band", "bv")
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        a.join(b_, ["band", "bv"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", hamming.alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def embedding_near_dupes(emb: DataFrame, id_col: str = "vec_id",
                         vec_col: str = "embedding", bucket_col: str | None = None,
                         threshold: float = 0.9) -> DataFrame:
    """Cosine-similar pairs within a bucket (a label, an LSH bucket from
    operators/similarity.lsh_signature, or a cluster id). Exact cosine on
    the bucket-joined candidates."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    base = emb.select(
        F.col(id_col),
        v.alias("v"),
        *( [F.col(bucket_col).alias("bucket")] if bucket_col else [F.lit(0).alias("bucket")] ),
    )
    norm = F.sqrt(F.aggregate(F.transform(F.col("v"), lambda x: x * x), F.lit(0.0), lambda a, x: a + x))
    base = base.withColumn("n", norm)
    a = base.select(F.col(id_col).alias("id_a"), F.col("v").alias("va"), F.col("n").alias("na"), "bucket")
    b = base.select(F.col(id_col).alias("id_b"), F.col("v").alias("vb"), F.col("n").alias("nb"), "bucket")
    dot = F.aggregate(F.zip_with("va", "vb", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)
    return (
        a.join(b, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", F.round(dot / (F.col("na") * F.col("nb")), 6))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def connected_components(pairs: DataFrame, a: str = "id_a", b: str = "id_b",
                         max_iters: int = 30) -> DataFrame:
    """Duplicate-cluster labeling: connected components over candidate
    pairs, label = MIN id reachable. Returns (id, component) for every id
    appearing in `pairs`.

    The survivor-selection step of a dedup pipeline (keep one doc per
    near-dup cluster): iterative min-label propagation — each round every
    node takes the min of its own label and its neighbors' labels — which
    converges in O(diameter) rounds — and each round ALSO pointer-jumps
    (component <- label(component), path compression), which halves label
    chains and brings convergence to O(log diameter). Per round: one join
    (labels x edges) + one groupBy(node) min + one self-join on the label
    — all keyed on ids, shuffle-partitionable; loop-invariant edges are
    localCheckpointed once and labels re-checkpointed per round
    (O(1)-deep plans).

    The fixpoint is exactly the transitive closure's min — asserted against
    a recursive-CTE oracle (text_dedupe_clusters)."""
    edges = pairs.select(F.col(a).alias("src"), F.col(b).alias("dst"))
    edges = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct().localCheckpoint()
    labels = (
        edges.select(F.col("src").alias("id")).distinct()
        .withColumn("component", F.col("id"))
        .localCheckpoint()
    )
    converged = False
    for _ in range(max_iters):
        neigh = (
            labels.join(edges, labels.id == edges.src)
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("component").alias("n_comp"))
        )
        merged = (
            labels.join(neigh, "id", "left")
            .select(
                "id",
                F.least(F.col("component"), F.coalesce("n_comp", "component")).alias("component"),
                (F.coalesce("n_comp", "component") < F.col("component")).alias("__chg"),
            )
            # materialize ONCE: changed, stepped, and comp_map all derive
            # from this frame — without the checkpoint the round's join +
            # groupBy lineage would execute three times
            .localCheckpoint()
        )
        changed = merged.filter(F.col("__chg"))
        stepped = merged.drop("__chg")
        # pointer jumping: component <- label(component); labels only ever
        # DECREASE toward the component minimum, so compression never
        # overshoots it
        comp_map = stepped.select(
            F.col("id").alias("component"), F.col("component").alias("__c2")
        )
        new_labels = stepped.join(comp_map, "component", "left").select(
            "id", F.coalesce("__c2", "component").alias("component")
        ).localCheckpoint()
        if changed.isEmpty():
            labels = new_labels
            converged = True
            break
        labels = new_labels
    if not converged:
        # silently returning unconverged labels would hand dedupe_clusters
        # wrong survivors with no signal; pointer jumping makes the round
        # count O(log diameter), so hitting the cap means pathology
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} rounds; "
            "raise max_iters (components of diameter > ~2^rounds)"
        )
    return labels


def dedupe_clusters(docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id",
                    a: str = "id_a", b: str = "id_b") -> DataFrame:
    """Full-corpus cluster table: every document labeled with its near-dup
    component (singletons = their own id), cluster sizes, and the survivor
    flag (min id per cluster survives — the conventional keep-one rule).
    Returns (doc_id, component, cluster_size, is_survivor)."""
    comp = connected_components(pairs, a, b)
    labeled = (
        docs.select(F.col(id_col))
        .join(comp.withColumnRenamed("id", id_col), id_col, "left")
        .withColumn("component", F.coalesce("component", F.col(id_col)))
    )
    sizes = labeled.groupBy("component").agg(F.count(F.lit(1)).alias("cluster_size"))
    return (
        labeled.join(sizes, "component")
        .select(
            id_col, "component", "cluster_size",
            (F.col(id_col) == F.col("component")).alias("is_survivor"),
        )
    )


def substring_dup_spans(docs: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text", window: int = 4,
                        min_count: int = 2) -> DataFrame:
    """Exact substring deduplication at token granularity (the
    training-data op popularized by "Deduplicating Training Data Makes
    Language Models Better": repeated spans get stripped before
    training, not whole documents): every maximal token span whose
    length-`window` windows each occur >= min_count times corpus-wide.

    Plan shape — all equi-keyed, no cross join:
      1. one posexplode of (doc, pos, window-hash);
      2. one groupBy(hash) count (map-side combined);
      3. one equi-join back on hash (AQE/skew-eligible: a boilerplate
         window repeated millions of times is one hot hash key);
      4. one per-doc gaps-and-islands window to merge overlapping
         duplicated windows into maximal spans.
    Windows ride as 60-bit portable hashes (8 shuffle bytes instead of
    ~window*7 string bytes); the DuckDB oracle derives the identical
    md5-based hash, so parity is exact, not probabilistic-modulo-oracle.

    Returns (doc_id, span_start, span_end, n_windows): 0-based token
    positions, end exclusive; touching/overlapping windows merge.
    """
    from pyspark.sql.window import Window

    toks = docs.select(F.col(id_col), text.tokens(F.col(text_col)).alias("toks"))
    n = F.size(F.col("toks"))
    # guard n < window explicitly: Spark's sequence(1, 0) yields the
    # DESCENDING [1, 0], which would fabricate two garbage windows
    idx = F.when(n >= window, F.sequence(F.lit(1), n - (window - 1))) \
        .otherwise(F.array().cast("array<int>"))
    shingle = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(F.col("toks"), i + j) for j in range(window)])
    # one select, explode directly: a withColumn("w", ...) + select pair
    # collapses into a projection that re-inlines tokens(text) once per
    # element_at — the O(len^2) trap shingles_from_tokens documents
    # (measured 31s -> 3.6s at sf0.1 for this operator)
    sh = (
        toks.select(id_col, F.posexplode(F.transform(idx, shingle)).alias("pos", "sh"))
        .select(id_col, "pos", portable_hash64(F.col("sh"), "ssd").alias("h"))
    )
    counts = sh.groupBy("h").agg(F.count(F.lit(1)).alias("n"))
    dup = sh.join(counts.filter(F.col("n") >= min_count).select("h"), "h")
    w = Window.partitionBy(id_col).orderBy("pos")
    islands = (
        dup.withColumn("prev", F.lag("pos").over(w))
        .withColumn(
            "brk",
            F.when(F.col("prev").isNull()
                   | (F.col("pos") - F.col("prev") > window), 1).otherwise(0),
        )
        .withColumn("island", F.sum("brk").over(w))
    )
    return (
        islands.groupBy(id_col, "island")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + window).alias("span_end"),
            F.count(F.lit(1)).alias("n_windows"),
        )
        .select(id_col, "span_start", "span_end", "n_windows")
    )
