"""Deduplication operator family for LLM training-data pipelines.

[extension] (SURVEY.md §2.6) — exact, MinHash+LSH, SimHash, n-gram Jaccard,
and embedding-cosine near-dup.  All are shuffle-architected for scale:

* exact: one hash-agg on a 64-bit digest of the normalized text — shuffle
  carries (digest, id), never the document bodies.
* MinHash LSH: per-doc signature (map-side, no shuffle) → explode to
  (band, band_hash) keys → self-join *within buckets only*.  The classic
  O(n²) pair space collapses to the bucket-collision pair space.
* SimHash: 64-bit signature; candidate generation by banding the bits,
  verification by popcount(XOR) ≤ radius.
* embedding: random-hyperplane sign buckets → cosine verify within bucket.

Everything is a native expression (xxhash64, HOFs) — no Python in the hot
path; the only tunables are (num_perm, bands) and thresholds.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from advanced_etl_pipelines_spark.functions.text import word_ngrams, word_tokens
from advanced_etl_pipelines_spark.functions.vectors import as_double
from advanced_etl_pipelines_spark.operators.caching import (
    tracked_persist,
)


def normalize_text(c: Column | str) -> Column:
    """Canonical form for exact dedup: lowercase, collapse whitespace, trim."""
    col = F.col(c) if isinstance(c, str) else c
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Keep one representative (min id) per normalized text.

    Window row_number over the digest partition: one shuffle keyed by a
    64-bit hash, not by the full text.  (A groupBy-min + semi-join is the
    alternative; the window form keeps every original column.)
    """
    digest = F.xxhash64(normalize_text(text_col)).alias("__digest")
    w = Window.partitionBy("__digest").orderBy(F.asc(id_col))
    return (
        df.withColumn("__digest", digest)
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__digest", "__rn")
    )


def exact_dup_stats(df: DataFrame, text_col: str, group_col: str) -> DataFrame:
    """Per-group doc/unique/dup counts on normalized text."""
    norm = normalize_text(text_col)
    return df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_distinct(norm).alias("n_unique"),
        (F.count(F.lit(1)) - F.count_distinct(norm)).alias("n_dups"),
    )


# --- MinHash -----------------------------------------------------------------


def minhash_signature_frame(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_perm: int = 64,
    shingle_n: int = 3,
) -> DataFrame:
    """(id, sig) frame: num_perm-wide MinHash signature over distinct word
    shingles.  "Permutation" i is xxhash64(shingle, i); the signature
    element is the min over the doc's shingles.

    Shape: a SHUFFLE-FREE per-row fold — ``aggregate(shingles, [MAX]*p,
    (acc, s) -> zip_with(acc, hashes(s), least))``.  The signature is
    computed map-side in one pass over each document; nothing is
    exploded and nothing shuffles.  (History: a naive nested-HOF version
    re-tokenized the document once per permutation — Spark re-evaluates
    expressions referenced inside lambda bodies, see
    ``functions.text.bind_once`` — and an explode + 64-min-aggregates
    groupBy fixed that at the cost of a shuffle; the bound fold beats
    both.)  Docs too short to shingle are dropped.
    """
    from advanced_etl_pipelines_spark.functions.text import bind_once

    max_long = (1 << 63) - 1
    perm_idx = F.sequence(F.lit(0), F.lit(num_perm - 1))

    def fold(shingles: Column) -> Column:
        init = F.array_repeat(F.lit(max_long).cast("bigint"), num_perm)

        def step(acc: Column, s: Column) -> Column:
            hashes = F.transform(perm_idx, lambda i: F.xxhash64(s, i))
            return F.zip_with(acc, hashes, lambda a, b: F.least(a, b))

        return F.aggregate(shingles, init, step)

    grams = df.select(
        F.col(id_col).alias("id"),
        F.array_distinct(word_ngrams(word_tokens(text_col), shingle_n)).alias(
            "g"
        ),
    ).where(F.size("g") > 0)
    return grams.select("id", bind_once(F.col("g"), fold).alias("sig"))


def minhash_bands(sig: Column, bands: int, rows: int) -> Column:
    """LSH banding: hash each ``rows``-wide slice -> array of band hashes."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.xxhash64(F.slice(sig, b * rows + 1, rows), b),
    )


def minhash_near_dups(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
    shingle_n: int = 3,
) -> DataFrame:
    """Candidate pairs from band-bucket collisions, scored by estimated
    Jaccard (matching signature fraction), filtered at ``threshold``.

    Returns (id_a, id_b, est_jaccard) with id_a < id_b.  The self-join is
    keyed on (band_index, band_hash): only colliding docs ever meet, so
    the shuffle is proportional to bucket sizes, not n².
    """
    rows = num_perm // bands
    # Materialize (id, sig) ONCE: the signature is the expensive map-side
    # pass (num_perm × shingles hashes per doc); without persist, the
    # self-join below would recompute it for each side.  At warehouse scale
    # this persist becomes a materialized signature table on disk.
    base = minhash_signature_frame(
        df, text_col, id_col, num_perm, shingle_n
    ).transform(tracked_persist)
    # Slim (id, band, band_hash) rows for the bucket join — signatures are
    # NOT carried through the shuffle.
    banded = base.select(
        "id",
        F.posexplode(minhash_bands(F.col("sig"), bands, rows)).alias(
            "band", "band_hash"
        ),
    )
    left = banded.alias("l")
    right = banded.alias("r")
    cand = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.band_hash") == F.col("r.band_hash"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    sig_a = base.select(F.col("id").alias("id_a"), F.col("sig").alias("sig_a"))
    sig_b = base.select(F.col("id").alias("id_b"), F.col("sig").alias("sig_b"))
    matches = F.size(
        F.filter(
            F.zip_with(F.col("sig_a"), F.col("sig_b"), lambda a, b: a == b),
            lambda x: x,
        )
    )
    est = matches * F.lit(1.0) / F.lit(float(num_perm))
    return (
        cand.join(sig_a, "id_a")
        .join(sig_b, "id_b")
        .withColumn("est_jaccard", est)
        .where(F.col("est_jaccard") >= threshold)
        .select("id_a", "id_b", "est_jaccard")
    )


POLY_P = 1_000_000_007  # shared with the CMS sketch (registry_profiling)


def poly_hash(c: Column) -> Column:
    """Engine-portable polynomial string hash: fold ``(acc*131 +
    ascii(char)) mod 1e9+7`` over the characters.  Identical in Spark
    (``F.aggregate`` over split chars) and DuckDB (``list_reduce``), so
    operators built on it are DuckDB-oracle-checkable — the same scheme
    the count-min sketch rollup uses (`plans/registry_profiling.py`).
    ~10× slower per string than ``xxhash64`` (per-char fold vs one JVM
    intrinsic); use it where cross-engine reproducibility is the point.
    """
    return F.aggregate(
        F.split(c, ""),
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * F.lit(131) + F.ascii(ch)) % F.lit(POLY_P),
    )


def minhash_portable_signature_frame(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_perm: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """(id, sig) MinHash signature frame with the ENGINE-PORTABLE hash
    family: base ``h = poly_hash(shingle)``; "permutation" i is the
    affine map ``((2i+1)·h + i·40503) mod 1e9+7`` (odd multipliers keep
    the maps distinct; same constants as the CMS bucket family).  The
    signature is the min over the doc's distinct word shingles, computed
    as the same shuffle-free per-row fold as
    `minhash_signature_frame` (plan-asserted exchange-free)."""
    from advanced_etl_pipelines_spark.functions.text import bind_once

    perm_idx = F.sequence(F.lit(0), F.lit(num_perm - 1))

    def fold(shingles: Column) -> Column:
        init = F.array_repeat(F.lit(POLY_P).cast("long"), num_perm)

        def step(acc: Column, s: Column) -> Column:
            hashes = bind_once(
                poly_hash(s),
                lambda h: F.transform(
                    perm_idx,
                    lambda i: ((2 * i + 1) * h + i * F.lit(40503))
                    % F.lit(POLY_P),
                ),
            )
            return F.zip_with(acc, hashes, lambda a, b: F.least(a, b))

        return F.aggregate(shingles, init, step)

    grams = df.select(
        F.col(id_col).alias("id"),
        F.array_distinct(word_ngrams(word_tokens(text_col), shingle_n)).alias(
            "g"
        ),
    ).where(F.size("g") > 0)
    return grams.select("id", bind_once(F.col("g"), fold).alias("sig"))


def minhash_portable_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_perm: int = 16,
    bands: int = 8,
    threshold: float = 0.25,
    shingle_n: int = 3,
) -> DataFrame:
    """MinHash+LSH near-dup pairs with an ENGINE-PORTABLE hash family, so
    the full pipeline — signatures, band collisions, estimated Jaccard —
    is bit-reproducible in any SQL engine (and hence oracle-checked,
    where `minhash_near_dups`'s xxhash64 form is rows-only).

    Candidate generation bands the signature into ``bands`` slices and
    self-joins on (band index, slice) equality — the slice ARRAY is the
    join key, so banding involves no second hash and therefore no
    engine-specific collision behavior: a pair collides iff some band of
    the two signatures is identical, a pure function of the signatures.
    Estimated Jaccard = matching-element fraction, filtered at
    ``threshold``.  Same bucket-collision join shape as the xxhash64
    path: shuffle ∝ bucket sizes, never n².
    """
    rows = num_perm // bands
    base = minhash_portable_signature_frame(
        df, text_col, id_col, num_perm, shingle_n
    ).transform(tracked_persist)
    banded = base.select(
        "id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.slice(F.col("sig"), b * rows + 1, rows),
            )
        ).alias("band", "bslice"),
    )
    l, r = banded.alias("l"), banded.alias("r")
    cand = (
        l.join(
            r,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bslice") == F.col("r.bslice"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    sig_a = base.select(F.col("id").alias("id_a"), F.col("sig").alias("sig_a"))
    sig_b = base.select(F.col("id").alias("id_b"), F.col("sig").alias("sig_b"))
    est = (
        F.size(
            F.filter(
                F.zip_with(
                    F.col("sig_a"), F.col("sig_b"), lambda a, b: a == b
                ),
                lambda x: x,
            )
        )
        / F.lit(float(num_perm))
    )
    return (
        cand.join(sig_a, "id_a")
        .join(sig_b, "id_b")
        .withColumn("est_jaccard", est)
        .where(F.col("est_jaccard") >= threshold)
        .select("id_a", "id_b", "est_jaccard")
    )


# --- SimHash -----------------------------------------------------------------


def simhash_portable_frame(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n_bits: int = 48,
    shingle_n: int = 3,
) -> DataFrame:
    """(id, sh) frame: ``n_bits``-bit SimHash over word ``shingle_n``-grams
    with the ENGINE-PORTABLE hash family — bit b comes from the PARITY of
    the affine map ``((2b+1)·poly_hash(gram) + b·40503) mod 1e9+7``,
    frequency-weighted (each gram occurrence votes ±1), bit set when the
    vote sum is positive.  The portable twin of ``simhash_frame``
    (xxhash64, 63-bit): same SHUFFLE-FREE per-row fold shape — one
    poly_hash per gram, one array accumulator pass — but reproducible in
    any SQL engine, so the registry query carries a DuckDB oracle
    (round-2 VERDICT item 7).  Docs with fewer than ``shingle_n`` tokens
    are dropped (no grams → no signal; they would otherwise all collide
    on sh=0)."""
    from advanced_etl_pipelines_spark.functions.text import bind_once

    bit_idx = F.sequence(F.lit(0), F.lit(n_bits - 1))

    def fold(grams: Column) -> Column:
        init = F.array_repeat(F.lit(0).cast("long"), n_bits)

        def step(acc: Column, s: Column) -> Column:
            contribs = bind_once(
                poly_hash(s),
                lambda h: F.transform(
                    bit_idx,
                    lambda b: F.when(
                        ((2 * b + 1) * h + b * F.lit(40503))
                        % F.lit(POLY_P)
                        % 2
                        == 1,
                        F.lit(1),
                    )
                    .otherwise(F.lit(-1))
                    .cast("long"),
                ),
            )
            return F.zip_with(acc, contribs, lambda a, c: a + c)

        sums = F.aggregate(grams, init, step)

        def pack(ss: Column) -> Column:
            out = F.lit(0).cast("long")
            for b in range(n_bits):  # static unroll: shift amounts are ints
                out = out + F.when(
                    F.element_at(ss, b + 1) > 0,
                    F.lit(1 << (n_bits - 1 - b)).cast("long"),
                ).otherwise(F.lit(0).cast("long"))
            return out

        return bind_once(sums, pack)

    grams = df.select(
        F.col(id_col).alias("id"),
        word_ngrams(word_tokens(text_col), shingle_n).alias("g"),
    ).where(F.size("g") > 0)
    return grams.select("id", bind_once(F.col("g"), fold).alias("sh"))


def simhash_portable_near_dups(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_hamming: int = 3,
    n_bits: int = 48,
    bands: int = 4,
    sim: DataFrame | None = None,
) -> DataFrame:
    """(id_a, id_b, hamming) pairs with portable-SimHash Hamming distance
    <= ``max_hamming``, found through band LSH: with ``bands`` blocks of
    ``n_bits/bands`` bits, any pair within ``bands - 1`` differing bits
    shares at least one identical band (pigeonhole), so the
    bucket-collision join is EXACT for ``max_hamming < bands`` — never
    an all-pairs product."""
    base = sim if sim is not None else simhash_portable_frame(
        df, text_col, id_col, n_bits=n_bits
    )
    band_bits = n_bits // bands
    banded = base.select(
        "id",
        "sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright(F.col("sh"), b * band_bits)
                        .bitwiseAND(F.lit((1 << band_bits) - 1))
                        .alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "sh", "bb.band", "bb.bucket")
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.bit_count(
                F.col("a.sh").bitwiseXOR(F.col("b.sh"))
            ).alias("hamming"),
        )
        .dropDuplicates(["id_a", "id_b"])
        .where(F.col("hamming") <= max_hamming)
    )


def simhash_frame(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, sh) frame: 63-bit SimHash over word tokens — bit b of ``sh`` is
    1 when the sum over tokens of sign(bit b of xxhash64(token)) is
    positive.  Bit 63 (the sign bit) is dropped so ``sh`` stays
    non-negative.

    SHUFFLE-FREE per-row fold: ``aggregate(tokens, [0]*63, (acc, t) ->
    zip_with(acc, signbits(xxhash64(t)), +))`` then reassemble the long
    from the sign sums.  Each token is hashed exactly once (the hash is
    bound via ``bind_once`` before the per-bit transform).  Docs with no
    tokens fold the empty array to all-zero sums → sh = 0 (the all-zero-
    bit definition), with no join needed.
    """
    from advanced_etl_pipelines_spark.functions.text import bind_once

    masks = F.lit([1 << b for b in range(63)])
    bit_idx = F.sequence(F.lit(1), F.lit(63))  # 1-based for element_at

    def fold(tokens: Column) -> Column:
        init = F.array_repeat(F.lit(0).cast("bigint"), 63)

        def step(acc: Column, t: Column) -> Column:
            bits = bind_once(
                F.xxhash64(t),
                lambda h: F.transform(
                    bit_idx,
                    lambda b: F.when(
                        h.bitwiseAND(F.element_at(masks, b)) != 0, F.lit(1)
                    )
                    .otherwise(F.lit(-1))
                    .cast("bigint"),
                ),
            )
            return F.zip_with(acc, bits, lambda a, x: a + x)

        sums = F.aggregate(tokens, init, step)
        return F.aggregate(
            F.zip_with(
                sums,
                masks,
                lambda s, m: F.when(s > 0, m).otherwise(F.lit(0).cast("bigint")),
            ),
            F.lit(0).cast("bigint"),
            lambda a, x: a + x,
        )

    toks = df.select(
        F.col(id_col).alias("id"), word_tokens(text_col).alias("t")
    )
    return toks.select("id", bind_once(F.col("t"), fold).alias("sh"))


def simhash_near_dups(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_hamming: int = 8,
    bands: int | None = None,
    sim: DataFrame | None = None,
) -> DataFrame:
    """Near-dup pairs by SimHash: band the 64 bits into ``bands`` chunks,
    join on band equality, verify popcount(a XOR b) <= max_hamming.

    Default ``bands = max_hamming + 1``: by pigeonhole, any pair within the
    radius has at least one untouched band, so recall is 100% within
    ``max_hamming``.  More bands -> smaller chunks -> bigger buckets ->
    more candidate pairs to verify; callers with huge corpora can pass a
    smaller ``bands`` to trade recall for join size.  Chunk width is the
    real scale lever: 13 bands of 4 bits give 16-value buckets (the corpus
    divided 16 ways meets itself), while 4 bands of 16 bits keep buckets
    near-singleton — prefer small radii (Manku et al.'s 64-bit SimHash web
    dedup uses k=3).

    Pass ``sim`` to reuse an already-computed (persisted) signature frame
    instead of recomputing it from the text."""
    bands = bands if bands is not None else max_hamming + 1
    chunk = 64 // bands
    if sim is None:
        sim = simhash_frame(df, text_col, id_col)
    banded = sim.select(
        "id",
        "sh",
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("sh"), b * chunk).bitwiseAND(
                        F.lit((1 << chunk) - 1).cast("bigint")
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band", "band_val"),
    )
    l, r = banded.alias("l"), banded.alias("r")
    hamming = F.bit_count(F.col("l.sh").bitwiseXOR(F.col("r.sh")))
    return (
        l.join(
            r,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.band_val") == F.col("r.band_val"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            hamming.alias("hamming"),
        )
        .dropDuplicates(["id_a", "id_b"])
        .where(F.col("hamming") <= max_hamming)
    )


# --- exact n-gram Jaccard ----------------------------------------------------


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    block_col: str,
    n: int = 3,
    threshold: float = 0.1,
    hashed_postings: bool = False,
    materialize_grams: bool = True,
) -> DataFrame:
    """Exact Jaccard over distinct word n-grams via an inverted-index
    (posting-list) self-join.  Returns (id_a, id_b, jaccard).

    Shape: explode each doc's distinct grams to (gram, id, |g|) postings,
    self-join on (block, gram), count shared grams per id pair, then
    |A∩B| / (|A| + |B| − |A∩B|).  Only pairs sharing ≥1 gram ever meet,
    and the shuffle carries slim posting rows — never the gram arrays and
    never the O(n²) blocked pair space.  (A naive block-join with
    array_intersect per pair measured 230 s at sf0.1; this shape runs the
    identical result in seconds.)

    Scale notes: the candidate blowup risk is a gram shared by k docs
    producing k² join rows.  Training-data dedup drops ultra-frequent
    shingles (they carry no signal); here the block column (language)
    plus 3-gram sparsity bounds it.  For open-domain corpora, cap posting
    lengths or use minhash_near_dups as the blocking stage instead.

    ``hashed_postings=True`` is the 100 TB shuffle diet: postings carry
    ``xxhash64(gram)`` (8 bytes) instead of the gram string (~25 bytes),
    cutting posting shuffle volume ~3×.  Hash collisions can only MERGE
    grams (overcounting the intersection → false-positive candidates,
    never false negatives), so candidates are re-verified with an exact
    ``array_intersect`` over the few surviving pairs — output identical
    to the string-join path (pinned by test).
    """
    grams = df.select(
        F.col(id_col).alias("id"),
        F.col(block_col).alias("blk"),
        F.array_distinct(word_ngrams(word_tokens(text_col), n)).alias("g"),
    ).where(F.size("g") > 0)
    if materialize_grams:
        # Both self-join sides (and the hashed-postings re-verify) read
        # the gram frame; without materialization tokenize+ngram runs
        # once PER CONSUMER (AQE broadcasts one posting side, so
        # exchange reuse does not save it — measured 2× gram-gen at
        # sf0.1).  At 100 TB this is the standard build-the-inverted-
        # index-once pattern; flip off only for single-consumer plans
        # where recompute beats the materialization write.
        grams = grams.localCheckpoint(eager=False)
    gram_key = (
        F.xxhash64("gram").alias("gram") if hashed_postings else F.col("gram")
    )
    posting = grams.select(
        "id", "blk", F.size("g").alias("sz"), F.explode("g").alias("gram")
    ).select("id", "blk", "sz", gram_key)
    l, r = posting.alias("l"), posting.alias("r")
    pairs = (
        l.join(
            r,
            (F.col("l.blk") == F.col("r.blk"))
            & (F.col("l.gram") == F.col("r.gram"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .groupBy(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            F.col("l.sz").alias("sz_a"),
            F.col("r.sz").alias("sz_b"),
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    jac = F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter"))
    cand = pairs.select("id_a", "id_b", jac.alias("jaccard")).where(
        F.col("jaccard") >= threshold
    )
    if not hashed_postings:
        return cand
    # Exact re-verify of the (few) candidates: join their gram arrays
    # back and recompute Jaccard without hashing.
    ga = grams.select(F.col("id").alias("id_a"), F.col("g").alias("ga"))
    gb = grams.select(F.col("id").alias("id_b"), F.col("g").alias("gb"))
    inter = F.size(F.array_intersect(F.col("ga"), F.col("gb")))
    union = F.size(F.array_union(F.col("ga"), F.col("gb")))
    return (
        cand.drop("jaccard")
        .join(ga, "id_a")
        .join(gb, "id_b")
        .select(
            "id_a", "id_b", (inter * F.lit(1.0) / union).alias("jaccard")
        )
        .where(F.col("jaccard") >= threshold)
    )


# --- embedding cosine near-dup ----------------------------------------------


def embedding_near_dups(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    planes: list[list[float]],
    threshold: float = 0.95,
) -> DataFrame:
    """Near-duplicate vectors: random-hyperplane sign bucket (all planes
    agree) as the blocking key, exact cosine verify within bucket.

    ``threshold`` is compared against the QUANTIZED cosine,
    ``ROUND(cos_sim + 1e-9, 6)`` — i.e. membership resolves at 1e-6;
    thresholds finer than that are meaningless here.  The returned
    ``cos_sim`` column is the raw (unquantized) similarity.

    ``planes`` must be generated deterministically (seeded) by the caller.
    Projections come from the Arrow matmul seam
    (``similarity.with_projections`` — one BLAS call per batch instead of
    a per-plane expression fold), and L2 norms are per-row columns so the
    within-bucket pair verify pays only the dot-product fold.
    """
    from advanced_etl_pipelines_spark.functions.vectors import dot
    from advanced_etl_pipelines_spark.operators.similarity import (
        band_buckets,
        with_projections,
    )

    base = with_projections(
        df, vec_col, id_col, planes, "id", "v", "n", "proj"
    ).select(
        "id",
        "v",
        "n",
        F.element_at(band_buckets("proj", len(planes), 1), 1).alias("bucket"),
    )
    l, r = base.alias("l"), base.alias("r")
    denom = F.col("l.n") * F.col("r.n")
    cos = F.when(
        denom > 0, dot(F.col("l.v"), F.col("r.v")) / denom
    ).otherwise(F.lit(None).cast("double"))
    # MEMBERSHIP is decided on the quantized ROUND(cos_sim + 1e-9, 6)
    # (round-9, same rule as semdedup / SCALE.md §17 addendum): a
    # threshold-straddling pair can't flip between this plan and a
    # replay that sums the dot product in a different order — the
    # ~1e-15 accumulation noise sits 9 orders below the quantum.  The
    # RETURNED cos_sim column stays raw (round-9 ADVICE): quantizing
    # the output too would silently shift the similarity for any
    # future caller consuming it as a value or passing a threshold
    # finer than 1e-6.  Contract: ``threshold`` is compared at 1e-6
    # resolution; callers replaying the predicate in another engine
    # must apply the same ROUND(x + 1e-9, 6).
    return (
        l.join(
            r,
            (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            cos.alias("cos_sim"),
        )
        .where(F.round(F.col("cos_sim") + F.lit(1e-9), 6) >= threshold)
    )


def choose_lsh_params(
    threshold: float, num_perm: int = 128
) -> tuple[int, int]:
    """Pick (bands, rows) for MinHash LSH so the S-curve inflection
    ``(1/b)^(1/r)`` sits closest to the target Jaccard ``threshold``.

    The collision probability of a pair with true similarity s under
    (b bands × r rows) banding is ``1 - (1 - s^r)^b``; its steepest
    point is ~``(1/b)^(1/r)``, so matching that to the threshold
    balances false positives (verified away later, costing compute)
    against false negatives (lost forever).  Only divisors of
    ``num_perm`` are considered so every permutation is used."""
    best: tuple[int, int] | None = None
    best_err = float("inf")
    for bands in range(1, num_perm + 1):
        if num_perm % bands:
            continue
        rows = num_perm // bands
        inflection = (1.0 / bands) ** (1.0 / rows)
        err = abs(inflection - threshold)
        if err < best_err:
            best, best_err = (bands, rows), err
    assert best is not None
    return best
