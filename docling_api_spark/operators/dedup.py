"""Deduplication suite (training-data-pipeline extension scope).

The reference dedups embeddings by cache key (core/cache.py:22-50) and
rows by existence checks (api/routes/collections.py:154-161); a 100 TB
corpus engine needs real content dedup. Four strategies, all built on
the portable md5-prefix-32 hash family (functions/hashing.py) so every
one is exactly verifiable against the DuckDB oracle:

* **exact** — hash-groupBy on content hash, keep min(doc_id). One
  shuffle on a 32-bit+ key; at scale this is the cheapest pass and
  runs first to shrink the corpus for the fuzzy passes.
* **MinHash + LSH** — distinct word shingles → k-minima signature →
  banded bucket join → exact Jaccard verification. The band explode
  costs bands× rows but each row is (band_key, doc_id) — narrow; the
  self-join is per-bucket, never all-pairs. Verification re-joins the
  shingle sets only for surviving candidate pairs.
* **SimHash** — 32-bit signatures via per-bit majority vote of token
  hashes; near-dups = small Hamming distance. Signature is a single
  shuffle-free expression; banding the 32 bits into q-bit chunks
  gives the scale path for Hamming-radius search.
* **Embedding cosine** — SRP-LSH buckets (operators/search.py) then
  exact cosine ≥ τ verification inside buckets.

Candidate-pair convention everywhere: (a, b) with a < b, deduped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from docling_api_spark.functions.hashing import (
    band_hash,
    cosine,
    md5_long,
    minhash_from_hashes,
    shingle_hashes,
    srp_planes,
    srp_signature,
    tokens,
    word_shingles,
)


def dedup_exact(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup: one survivor (min id) per distinct content hash.
    Returns (content_hash, keep_id, n_copies)."""
    return (
        docs.select(md5_long(F.col(text_col)).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n_copies"))
    )


def shingle_table(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3
) -> DataFrame:
    """(id, shingles) — distinct word n-gram shingles per doc."""
    return docs.select(
        F.col(id_col).alias("id"),
        word_shingles(tokens(F.col(text_col)), n).alias("shingles"),
    )


def banded_keys(
    shingled: DataFrame, num_hashes: int = 32, bands: int = 16
) -> DataFrame:
    """(id, band, bkey) LSH band keys from MinHash signatures — the
    shared probe structure of the intra-corpus self-join
    (:func:`minhash_candidate_pairs`) and the batch-vs-corpus
    incremental join (:func:`incremental_near_dup`)."""
    rows_per_band = num_hashes // bands
    # two-step projection: md5 once per shingle, then the cheap affine
    # family — the hash array materializes between the two selects
    sig = shingled.select(
        "id", shingle_hashes(F.col("shingles")).alias("hs")
    ).select("id", minhash_from_hashes(F.col("hs"), num_hashes).alias("sig"))
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                band_hash(F.col("sig"), b, rows_per_band).alias("bkey"),
            )
            for b in range(bands)
        ]
    )
    return sig.select("id", F.explode(band_structs).alias("bk")).select(
        "id", F.col("bk.band").alias("band"), F.col("bk.bkey").alias("bkey")
    )


def minhash_candidate_pairs(
    shingled: DataFrame, num_hashes: int = 32, bands: int = 16
) -> DataFrame:
    """LSH candidate pairs (a < b) from banded MinHash signatures.

    One narrow explode (bands rows per doc, each just band_key+id),
    one per-bucket self-join. Skew guard: buckets are md5-keyed, so
    only true near-dup clusters concentrate — exactly the rows we want.
    """
    banded = banded_keys(shingled, num_hashes, bands)
    # persist: the bucket self-join reads this tree from BOTH sides —
    # without the cache each side recomputes the whole signature chain
    # (md5 per shingle + num_hashes affine mins), the dominant cost of
    # the candidate stage (measured 2x at sf0.1). The cached rows are
    # narrow (id, band, bkey) — bands rows per doc, no payload.
    banded = banded.persist()
    left = banded.alias("l")
    right = banded.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bkey") == F.col("r.bkey"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(F.col("l.id").alias("a"), F.col("r.id").alias("b"))
        .dropDuplicates(["a", "b"])
    )


def verify_jaccard(
    pairs: DataFrame,
    shingled: DataFrame,
    threshold: float,
    scale: int = 4,
    shingled_b: DataFrame | None = None,
) -> DataFrame:
    """Exact Jaccard over candidate pairs: re-join the shingle sets
    (only for candidates — payloads never ride through the band
    shuffle), filter ≥ threshold. Returns (a, b, jac). Pass
    ``shingled_b`` when the ``b`` side comes from a different table
    (batch-vs-corpus incremental dedup)."""
    sa = shingled.select(F.col("id").alias("a"), F.col("shingles").alias("sh_a"))
    sb = (shingled_b if shingled_b is not None else shingled).select(
        F.col("id").alias("b"), F.col("shingles").alias("sh_b")
    )
    joined = pairs.join(sa, "a").join(sb, "b")
    # guard: two empty-shingle docs (empty/NULL text) share every LSH
    # band, land here as a candidate pair, and 0/0 is a hard
    # DIVIDE_BY_ZERO under ANSI mode. Jaccard is undefined on empty
    # sets — NULL fails the >= threshold filter, matching the
    # brute-force ground-truth semantics (0/0 pairs excluded).
    union_sz = F.size(F.array_union("sh_a", "sh_b"))
    jac_raw = F.when(
        union_sz > 0,
        F.size(F.array_intersect("sh_a", "sh_b")) / union_sz.cast("double"),
    )
    # filter on the UNROUNDED value (matches the ground-truth oracle's
    # predicate); round only the reported column
    return (
        joined.select("a", "b", jac_raw.alias("jac_raw"))
        .filter(F.col("jac_raw") >= threshold)
        .select("a", "b", F.round("jac_raw", scale).alias("jac"))
    )


def incremental_near_dup(
    new_docs: DataFrame,
    corpus_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    num_hashes: int = 32,
    bands: int = 16,
    threshold: float = 0.8,
    caches: list | None = None,
) -> DataFrame:
    """Batch-vs-corpus near-dup (the daily-ingest shape): for each NEW
    doc, verified Jaccard ≥ threshold matches against the EXISTING
    corpus only — intra-batch pairs are the cascade's job. Returns
    (a=new id, b=corpus id, jac); ids must be disjoint across inputs.

    Scale shape: both sides collapse to narrow (id, band, bkey) keys
    before the join, so the probe shuffles ``bands`` small rows per
    doc and never a payload; candidate verification re-reads shingles
    for candidate ids only. At 100 TB the corpus-side band keys are a
    precomputed index maintained across ingest cycles (one pass per
    cycle to extend it with the accepted batch) — this operator
    derives them inline because the sandbox has no persistent index
    store; the join/verify shape is identical either way. The small
    batch side persists (read by both the band probe and the verify);
    the corpus side is deliberately NOT cached — caching 100 TB of
    shingles is worse than the extra scan. A repeated caller (the
    streaming foreachBatch twin) passes ``caches`` to receive the
    persisted handle and unpersist it once its action completes —
    otherwise one pinned shingle table leaks per invocation."""
    sh_new = shingle_table(new_docs, text_col, id_col, shingle_n).persist()
    if caches is not None:
        caches.append(sh_new)
    sh_old = shingle_table(corpus_docs, text_col, id_col, shingle_n)
    b_new = banded_keys(sh_new, num_hashes, bands)
    b_old = banded_keys(sh_old, num_hashes, bands)
    cands = (
        b_new.alias("n")
        .join(
            b_old.alias("o"),
            (F.col("n.band") == F.col("o.band")) & (F.col("n.bkey") == F.col("o.bkey")),
        )
        .select(F.col("n.id").alias("a"), F.col("o.id").alias("b"))
        .dropDuplicates(["a", "b"])
    )
    return verify_jaccard(cands, sh_new, threshold, shingled_b=sh_old)


def dedup_minhash(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    num_hashes: int = 32,
    bands: int = 16,
    threshold: float = 0.8,
    persist: bool = True,
) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline → verified pairs (a,b,jac).

    The shingle table feeds three plan branches (signatures + both
    sides of the verification join); ``persist`` caches it so shingles
    compute once per partition instead of three times (measured 2× on
    the cold path). The cache is left in place — it belongs to the
    returned plan; callers managing memory can ``unpersist`` after the
    action or ``spark.catalog.clearCache()``."""
    shingled = shingle_table(docs, text_col, id_col, shingle_n)
    if persist:
        shingled = shingled.persist()
    cands = minhash_candidate_pairs(shingled, num_hashes, bands)
    return verify_jaccard(cands, shingled, threshold)


def jaccard_to_reference(
    docs: DataFrame,
    ref_id,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    scale: int = 4,
) -> DataFrame:
    """Linear n-gram Jaccard of every doc against one reference doc
    (the SQL-oracle-friendly projection of the similarity measure)."""
    shingled = shingle_table(docs, text_col, id_col, shingle_n)
    ref = shingled.filter(F.col("id") == ref_id).select(F.col("shingles").alias("ref_sh"))
    joined = shingled.crossJoin(F.broadcast(ref))
    union_sz = F.size(F.array_union("shingles", "ref_sh"))
    return joined.select(
        F.col("id").alias(id_col),
        F.round(
            F.when(  # NULL for the undefined empty-vs-empty case (ANSI-safe)
                union_sz > 0,
                F.size(F.array_intersect("shingles", "ref_sh")) / union_sz.cast("double"),
            ),
            scale,
        ).alias("jac"),
    )


def embedding_dup_pairs(
    vectors: DataFrame,
    dim: int,
    threshold: float = 0.9,
    n_bits: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    scale: int = 6,
) -> DataFrame:
    """Embedding near-dup pairs: SRP-LSH bucket → within-bucket pairs
    → exact cosine ≥ threshold. Identical vectors always share a
    bucket, so exact-dup recall is 1.0 by construction."""
    planes = srp_planes(dim, n_bits)
    # persist: the bucket self-join reads this tree from both sides —
    # without the cache each side recomputes all n_bits projections
    b = vectors.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        srp_signature(F.col(vec_col), planes).alias("bucket"),
    ).persist()
    left = b.alias("l")
    right = b.alias("r")
    pairs = left.join(
        right,
        (F.col("l.bucket") == F.col("r.bucket")) & (F.col("l.id") < F.col("r.id")),
    ).select(
        F.col("l.id").alias("a"),
        F.col("r.id").alias("b"),
        cosine(F.col("l.v"), F.col("r.v"), scale).alias("cos"),
    )
    return pairs.filter(F.col("cos") >= threshold)


def boilerplate_line_dedup(
    docs: DataFrame,
    max_df: int = 100,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Line-level boilerplate removal (CCNet/RefinedWeb-style): a line
    occurring in more than ``max_df`` DISTINCT documents (cookie
    banners, copyright footers, nav text the HTML strip missed) is
    dropped from every document; each document's text is rebuilt from
    its surviving lines in original order.

    Returns (id, clean_text, n_removed) — one row per INPUT document.
    NULL text coerces to "" up front: ``posexplode(split(NULL))``
    yields no rows, so a NULL-text doc would otherwise VANISH from the
    output (silent row loss — and the curation cascade's audit, which
    infers the drop stage from a missing rebuild row, would then
    mislabel it as a dedup drop). Coerced, it flows exactly like an
    empty-text doc already does.

    Scale shape: lines shuffle/group on the 32-bit md5-prefix line
    hash (never the line text as a key); the doc-frequency table joins
    back on the same narrow key; the rebuild is one hash aggregation
    per doc with a JVM-side array_sort — two shuffles total, both on
    narrow keys. Grouping by hash (not raw line) is mirrored exactly
    in the oracle, so the rare 32-bit collision is part of the defined
    semantics on both engines, not a divergence.
    """
    lines = docs.select(
        F.col(id_col).alias("id"),
        F.posexplode(
            F.split(F.coalesce(F.col(text_col), F.lit("")), "\n")
        ).alias("pos", "line"),
    ).select("id", "pos", "line", md5_long(F.col("line")).alias("h"))
    # persist: the doc-frequency aggregate AND the join both read this
    # explode+hash subtree — without the cache the full-corpus md5 pass
    # runs twice (same multi-branch pattern as dedup_minhash's shingle
    # table)
    lines = lines.persist()
    line_df = lines.groupBy("h").agg(
        F.count_distinct("id").alias("line_df")
    )
    joined = lines.join(line_df, "h")
    keep = F.col("line_df") <= max_df
    return joined.groupBy("id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.when(keep, F.struct("pos", "line")))),
                lambda x: x["line"],
            ),
            "\n",
        ).alias("clean_text"),
        F.sum(F.when(~keep, 1).otherwise(0)).alias("n_removed"),
    )


def decontaminate_against(
    docs: DataFrame,
    eval_texts: DataFrame,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark decontamination: flag every training document sharing
    at least one n-word shingle (the standard 13-gram check) with a
    held-out evaluation set. Returns (id, n_hits, contaminated) for
    ALL documents — the clean subset is ``~contaminated``.

    Scale shape: the eval set's distinct gram hashes are tiny and
    BROADCAST (eval suites are MBs, corpora are TBs), so the corpus
    side is a map-only semi probe — no corpus shuffle; the only
    exchange is the per-doc hit-count aggregation on the id key.
    """
    eval_grams = (
        eval_texts.select(
            F.explode(word_shingles(tokens(F.col(text_col)), n)).alias("g")
        )
        .select(md5_long(F.col("g")).alias("h"))
        .distinct()
    )
    corpus_grams = docs.select(
        F.col(id_col).alias("id"),
        F.explode(word_shingles(tokens(F.col(text_col)), n)).alias("g"),
    ).select("id", md5_long(F.col("g")).alias("h"))
    hits = (
        corpus_grams.join(F.broadcast(eval_grams), "h")
        .groupBy("id")
        .agg(F.count_distinct("h").alias("n_hits"))
    )
    return (
        docs.select(F.col(id_col).alias("id"))
        .join(hits, "id", "left")
        .select(
            "id",
            F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
            (F.coalesce("n_hits", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def semdedup(
    vectors: DataFrame,
    dim: int,
    n_cells: int = 16,
    threshold: float = 0.9,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    scale: int = 6,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication by clustering embeddings and dropping, inside each
    cluster, every vector whose cosine to a LOWER-id cluster-mate is
    at or above ``threshold`` (keep-first survivor rule).

    This variant assigns clusters with the md5-derived deterministic
    coarse quantizer (functions/hashing.py:ivf_centroids, the same
    grid ``ivf_fixed_topk`` probes) — argmax rounded-cosine with
    (cos desc, cell asc) tie-break — so the whole pipeline is exactly
    reproducible against the SQL oracle. A production run swaps KMeans
    centroids behind the identical plan shape (the paper's choice of
    clusterer only affects which pairs get compared, not the rule).

    Returns (id, cell, dropped).

    Scale shape: cell assignment is the ZERO-shuffle argmax
    (operators/search.py:assign_cells — the old per-id window shape
    multiplied every vector n_cells× and shuffled the payload arrays
    through a row_number sort); ``cell`` is the only shuffle key
    afterwards, and the pairwise check is the paper's within-cluster
    O(m²) — bounded by cluster size, never corpus-wide. Identical
    vectors always share a cell, so exact-dup recall is 1.0 by
    construction.
    """
    from docling_api_spark.functions.hashing import ivf_centroids

    from docling_api_spark.operators.search import assign_cells

    cents = ivf_centroids(dim, n_cells)
    # persist: the within-cell self-join reads the assignment from
    # both sides; without the cache each side recomputes all n_cells
    # centroid cosines. The L2 norm is computed ONCE per vector here so
    # the per-pair predicate below is a single dot product — value-
    # identical to cosine() (sqrt(na)·sqrt(nb) is the same float
    # expression either way), at a third of the per-pair HOF work.
    norm = F.sqrt(
        F.aggregate(
            F.transform("v", lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    assigned = (
        assign_cells(
            vectors.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v")),
            cents,
            "v",
            scale,
            score_col=None,
        )
        .select("id", "v", "cell", norm.alias("nrm"))
        .persist()
    )
    left, right = assigned.alias("l"), assigned.alias("r")
    dot = F.aggregate(
        F.zip_with(
            F.col("l.v"), F.col("r.v"), lambda x, y: x.cast("double") * y.cast("double")
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    # CASE-guarded like functions/hashing.py:cosine — a zero-norm
    # vector pair sharing a cell must yield NULL (undefined, fails the
    # threshold), not an ANSI DIVIDE_BY_ZERO job abort; `< inf`
    # additionally rejects NaN/inf norms from corrupt components (NaN
    # compares greater, so it fails `< inf`). The guard rides INSIDE
    # the similarity expression (not a separate .filter) so the
    # division is conditionally evaluated regardless of how Catalyst
    # reorders conjunctive predicates.
    _inf = F.lit(float("inf"))
    sim = F.when(
        (F.col("l.nrm") > 0)
        & (F.col("l.nrm") < _inf)
        & (F.col("r.nrm") > 0)
        & (F.col("r.nrm") < _inf),
        F.round(dot / (F.col("l.nrm") * F.col("r.nrm")), scale),
    )
    dropped = (
        left.join(
            right,
            (F.col("l.cell") == F.col("r.cell")) & (F.col("l.id") < F.col("r.id")),
        )
        .filter(sim >= threshold)
        .select(F.col("r.id").alias("id"))
        .distinct()
        .withColumn("dropped", F.lit(True))
    )
    return assigned.join(dropped, "id", "left").select(
        "id", "cell", F.coalesce("dropped", F.lit(False)).alias("dropped")
    )
