"""Deduplication operators for large-scale document corpora.

Beyond-reference surface (mandated as first-class): exact, MinHash+LSH,
SimHash, n-gram Jaccard, embedding-cosine near-dup.

Scale design notes (100 TB posture):
  * exact_dedup: hash-groupBy on a 128-bit fingerprint — one shuffle of
    (16-byte key, id), the minimum possible.
  * minhash_lsh_candidates: the only near-dup path that scales — cost is
    O(N * num_perm) map-side + a shuffle keyed by (band, band-signature);
    only same-bucket docs are ever paired.  Verification re-checks exact
    Jaccard on candidates only.
  * ngram_jaccard_pairs: exact all-pairs O(N^2) — the *oracle*/baseline
    path, capped for sanity; at scale it's what LSH approximates.
  * simhash: 60-bit md5-derived signature, near-dup = small Hamming
    distance; banded into 4x15-bit blocks for candidate generation.
  * embedding near-dup: hyperplane-LSH bucketed candidates + exact
    cosine verify (embedding_cosine_pairs_lsh) — every join an equi-join;
    the all-pairs form is kept only as the recall ground truth.

All hash material derives from md5 hex (engine-portable); no Python UDFs
anywhere — signatures are built from Catalyst array/lambda expressions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from kmeans_mapreduce_spark.functions.distance import cosine_similarity
from kmeans_mapreduce_spark.functions.text import fingerprint, word_shingles

# MinHash parameters: xxhash64(shingle, seed=p) per permutation.
MINHASH_NUM_PERM = 32
MINHASH_BANDS = 8  # 8 bands x 4 rows: catches J>=~0.5 with high prob
MINHASH_ROWS_PER_BAND = MINHASH_NUM_PERM // MINHASH_BANDS


def sig_agreement(
    left_sig: Column | str,
    right_sig: Column | str,
    num_perm: int = MINHASH_NUM_PERM,
) -> Column:
    """Fraction of MinHash positions on which two signatures agree —
    THE near-similarity estimator of the streaming dedup faces (the
    standalone dedup stream and the composed curation pipeline share
    this one definition, in-batch and vs-index, so a pair's fate cannot
    depend on which consumer or which side of a batch boundary saw it)."""
    left_sig = F.col(left_sig) if isinstance(left_sig, str) else left_sig
    right_sig = F.col(right_sig) if isinstance(right_sig, str) else right_sig
    return F.size(
        F.filter(F.zip_with(left_sig, right_sig, lambda p, q: p == q),
                 lambda v: v)
    ) / F.lit(num_perm)


def banded_signatures(
    df: DataFrame,
    bands: int = MINHASH_BANDS,
    num_perm: int = MINHASH_NUM_PERM,
) -> DataFrame:
    """Explode an [id, sig] frame into its LSH band keys: one row per
    (id, band) with the band's rows concatenated into a string key —
    the candidate-join layout both streaming dedup faces build, and the
    layout the composed pipeline PERSISTS as its pre-banded index
    sibling (so the key format has exactly one definition)."""
    rows = num_perm // bands
    return df.select(
        "id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.concat_ws(
                            ",",
                            *[
                                F.col("sig")[b * rows + r].cast("string")
                                for r in range(rows)
                            ],
                        ).alias("key"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select("id", "sig", "bk.band", "bk.key")


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Canonical-winner exact dedup: groups by content fingerprint, keeps
    the lowest id; returns [keep_id, dup_count] one row per distinct text.

    At 100 TB: a single hash-partition shuffle on the 128-bit digest.
    (dropDuplicates gives the same plan but a nondeterministic winner;
    min(id) pins the survivor so results are replayable.)
    """
    return (
        df.select(F.col(id_col).alias("id"), fingerprint(text_col).alias("fp"))
        .groupBy("fp")
        .agg(F.min("id").alias("keep_id"), F.count("*").alias("dup_count"))
        .select("keep_id", "dup_count")
    )


def minhash_signature_from_shingles(sh: Column | str, num_perm: int = MINHASH_NUM_PERM) -> Column:
    """array<bigint> minhash signature over an ALREADY-MATERIALIZED
    shingle-array column.

    Permutation p's hash of shingle s is xxhash64(s, p) — independent
    64-bit hash families keyed by seed, all JVM-side.

    Take a stored column, not the shingle *expression*: this Column is
    referenced num_perm times, and Catalyst inlines (re-evaluates) the
    input expression into every reference — passing word_shingles(text)
    directly multiplies tokenization cost by num_perm (measured ~30x
    wall-clock on the sf0.1 corpus).  See _shingle_frame.
    """
    sh = F.col(sh) if isinstance(sh, str) else sh
    return F.array(
        *[F.array_min(F.transform(sh, lambda s: F.xxhash64(s, F.lit(p)))) for p in range(num_perm)]
    )


def minhash_signature(text: Column | str, num_perm: int = MINHASH_NUM_PERM, n: int = 2) -> Column:
    """Signature straight from a text column — null for empty shingle sets.

    Convenience/test surface only: O(num_perm) re-evaluation of the
    shingle expression per row.  Pipelines use _shingle_frame +
    minhash_signature_from_shingles (one shingle pass, cached).
    """
    sh = word_shingles(text, n=n)
    sig = minhash_signature_from_shingles(sh, num_perm)
    return F.when(F.size(sh) == 0, F.lit(None)).otherwise(sig)


def _shingle_frame(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """Cached [id, sh: array<string>] with empty shingle sets dropped.

    The materialization barrier that makes every downstream signature /
    verification expression read stored arrays instead of re-running
    tokenization (projection collapse would otherwise inline it into
    each of the num_perm signature slots AND both join sides).
    """
    from kmeans_mapreduce_spark.session import ensure_parallelism

    return (
        ensure_parallelism(df)
        .select(F.col(id_col).alias("id"), word_shingles(text_col, n=n).alias("sh"))
        .where(F.size("sh") > 0)
        .cache()
    )


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_perm: int = MINHASH_NUM_PERM,
    bands: int = MINHASH_BANDS,
    shingle_n: int = 2,
) -> DataFrame:
    """Candidate near-dup pairs [id_a < id_b] via banded MinHash LSH.

    Plan shape: per-row signature (narrow) -> explode to `bands` rows ->
    groupBy (band, slice-of-signature) via a self-join on the band key.
    Only same-bucket pairs are generated, so the N^2 blowup never
    materializes; shuffle volume is N * bands small rows.
    """
    rows = num_perm // bands
    # Two materialization barriers, both load-bearing (see the module
    # docstrings): shingles computed once per row, then signatures once
    # per row; without them projection collapse re-evaluates tokenization
    # O(num_perm) times per row and the whole signature again per band
    # slot on both self-join sides (measured 546s -> ~7s at sf0.1).
    sh = _shingle_frame(df, id_col, text_col, shingle_n)
    sig = sh.select(
        "id", minhash_signature_from_shingles("sh", num_perm).alias("sig")
    ).cache()
    banded = sig.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.concat_ws(
                            ",", *[F.col("sig")[b * rows + r].cast("string") for r in range(rows)]
                        ).alias("key"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select("id", "bk.band", "bk.key")
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def minhash_dedup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.8,
    shingle_n: int = 2,
    num_perm: int = MINHASH_NUM_PERM,
    bands: int = MINHASH_BANDS,
) -> DataFrame:
    """LSH candidates verified by exact shingle-Jaccard >= threshold.

    Returns [id_a, id_b, jaccard(rounded 6)].  This is the scalable
    near-dup pipeline: LSH prunes, exact Jaccard confirms — candidates
    only, never all pairs.  False positives cost verification work;
    false NEGATIVES are silent (a qualifying pair that never shares a
    band bucket is lost), so num_perm/bands must be sized to the
    corpus and threshold, not left at the test default.

    Parameter guidance (P[candidate] = 1-(1-J^r)^b, r = num_perm/bands
    rows per band; the s-curve midpoint sits near (1/b)^(1/r)):

      num_perm  bands  r   midpoint  use when
      --------  -----  --  --------  --------------------------------
        32        8    4     0.59    <=~10M docs, t >= 0.7 (default;
                                     P(cand|J=0.8) ~ 0.98)
        64       16    4     0.50    ~100M docs, t >= 0.7 — doubles
                                     bands to hold recall as the
                                     corpus (and near-miss mass) grows
       128       32    4     0.42    ~1B docs / t >= 0.6; midpoint
                                     drops, catching more borderline
                                     pairs at higher verify cost
       128       16    8     0.71    1B+ docs, t >= 0.85 only —
                                     r=8 suppresses the candidate
                                     explosion exact-duplicate-heavy
                                     web corpora produce

    Scale costs are linear in the knobs: signature build is
    O(N*num_perm) map-side work, the shuffle carries N*bands band
    keys, and candidate volume (the verify join) follows the s-curve
    tail below the threshold.  tests/test_dedup_similarity.py pins
    recall == 1.0 vs the exact PPJoin ground truth at two corpus
    scales (sf0.001 and sf0.01) for the default AND the 64/16
    scale-up setting.
    """
    cands = minhash_lsh_candidates(
        df, id_col, text_col, num_perm=num_perm, bands=bands, shingle_n=shingle_n
    )
    # Identical plan to the frame inside minhash_lsh_candidates -> Spark's
    # CacheManager resolves it to the same InMemoryRelation; shingles are
    # computed exactly once for candidates + verification.
    sh = _shingle_frame(df, id_col, text_col, shingle_n)
    j = (
        F.size(F.array_intersect(F.col("sa"), F.col("sb"))).cast("double")
        / F.size(F.array_union(F.col("sa"), F.col("sb"))).cast("double")
    )
    return (
        cands.join(sh.withColumnsRenamed({"id": "id_a", "sh": "sa"}), "id_a")
        .join(sh.withColumnsRenamed({"id": "id_b", "sh": "sb"}), "id_b")
        .select("id_a", "id_b", F.round(j, 6).alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.8,
    n: int = 2,
) -> DataFrame:
    """EXACT n-gram Jaccard near-dup pairs: [id_a, id_b, jaccard >= t].

    Not all-pairs: a prefix-filtered similarity join (the PPJoin-family
    construction).  Under any fixed global shingle order, two sets with
    Jaccard >= t must overlap in >= ceil(t*|S|) elements, so each doc
    only needs to index its first |S| - ceil(t*|S|) + 1 shingles in
    rarest-first order — any qualifying pair shares one of those prefix
    shingles.  Candidates = equi-join on prefix shingles (pairs sharing
    rare shingles only), then exact intersect/union verification.

    Scale shape: shuffles are (a) shingle document frequencies, (b) the
    prefix inverted index keyed by shingle, (c) candidate verification —
    all linear-ish in data + true-pair count.  The naive all-pairs cross
    join this replaces took 24 min at sf0.1 (12.5M pairs); this produces
    the identical result (same DuckDB all-pairs oracle) from ~thousands
    of candidates.  Rarest-first ordering also defuses the hot-shingle
    skew a plain inverted index would hit on stopword bigrams.
    """
    sh = _shingle_frame(df, id_col, text_col, n)
    sized = sh.select("id", "sh", F.size("sh").alias("len"))
    ex = sized.select("id", "len", F.explode("sh").alias("s"))
    freq = ex.groupBy("s").agg(F.count("*").alias("df"))
    w = Window.partitionBy("id").orderBy(F.asc("df"), F.asc("s"))
    prefix_len = F.col("len") - F.ceil(F.lit(threshold) * F.col("len")) + 1
    prefix = (
        ex.join(freq, "s")
        .withColumn("r", F.row_number().over(w))
        .where(F.col("r") <= prefix_len)
        .select("id", "s", "r", "len")
    )
    a, b = prefix.alias("a"), prefix.alias("b")
    la, lb = F.col("a.len"), F.col("b.len")
    # PPJoin pruning on top of the prefix match:
    #  * length filter: J >= t forces t*|A| <= |B| <= |A|/t;
    #  * positional filter: overlap reachable from match positions
    #    (min(|A|-rA, |B|-rB) + 1) must cover the required overlap
    #    ceil(t/(1+t) * (|A|+|B|)).
    required = F.ceil(F.lit(threshold / (1.0 + threshold)) * (la + lb))
    reachable = F.least(la - F.col("a.r"), lb - F.col("b.r")) + 1
    cands = (
        a.join(
            b,
            (F.col("a.s") == F.col("b.s"))
            & (F.col("a.id") < F.col("b.id"))
            & (lb >= F.lit(threshold) * la)
            & (la >= F.lit(threshold) * lb)
            & (reachable >= required),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    j = (
        F.size(F.array_intersect(F.col("sa"), F.col("sb"))).cast("double")
        / F.size(F.array_union(F.col("sa"), F.col("sb"))).cast("double")
    )
    return (
        cands.join(sh.withColumnsRenamed({"id": "id_a", "sh": "sa"}), "id_a")
        .join(sh.withColumnsRenamed({"id": "id_b", "sh": "sb"}), "id_b")
        .select("id_a", "id_b", F.round(j, 6).alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )


SIMHASH_BITS = 60  # 15 md5 hex digits — fits a signed 64-bit in BOTH engines
SIMHASH_BLOCKS = 4  # 4 x 15-bit bands for candidate generation


def portable_hash60(col: Column | str) -> Column:
    """60-bit hash as bigint from the first 15 md5 hex digits.

    The engine-portable replacement for xxhash64 (absent in DuckDB):
    DuckDB computes the identical value as
    ('0x' || substr(md5(s), 1, 15))::BIGINT, which is what lets SimHash
    carry an exact SQL oracle.  15 digits (not 16) so the value stays
    below 2^60 — no sign-bit trouble in either engine."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def simhash_signature_from_hashes(
    hashes: Column | str, bits: int = SIMHASH_BITS
) -> Column:
    """SimHash as bigint from an ALREADY-MATERIALIZED array of
    per-shingle portable_hash60 values (each < 2^bits).

    Classic Charikar construction: each bit of each hash votes +1/-1,
    signature bit = sign of the vote sum.  Implemented as a fold over bit
    positions with shiftright/bitwise-and — all JVM exprs.  Takes a
    stored column because it references `hashes` once per bit; an inline
    expression would re-tokenize per bit (see minhash note above).
    """
    hashes = F.col(hashes) if isinstance(hashes, str) else hashes
    def bit_vote(i: int) -> Column:
        # sum over shingles of (bit_i ? 1 : -1), >0 -> bit set
        votes = F.aggregate(
            hashes,
            F.lit(0),
            lambda acc, h: acc
            + F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, F.lit(1)).otherwise(F.lit(-1)),
        )
        return F.when(votes > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
    return F.aggregate(
        F.array(*[bit_vote(i) * F.lit(2**i).cast("long") for i in range(bits)]),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def simhash_signature(text: Column | str, bits: int = SIMHASH_BITS) -> Column:
    """SimHash straight from a text column — null for empty shingle sets.

    Convenience/test surface: re-evaluates the shingle expression per
    bit.  Pipelines stage shingles + hashes first (simhash_dedup_pairs).
    """
    sh = word_shingles(text, n=2)
    sig = simhash_signature_from_hashes(F.transform(sh, portable_hash60), bits)
    return F.when(F.size(sh) == 0, F.lit(None)).otherwise(sig)


def simhash_dedup_pairs(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 6
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance <= max_hamming.

    Candidate generation bands the 60-bit signature into 4 x 15-bit
    blocks (pigeonhole: distance<=6 pairs share >=1 exact block with
    high probability at these lengths); exact popcount verifies.
    Returns [id_a, id_b, hamming].

    Hashes are md5-derived (portable_hash60), so the ENTIRE pipeline —
    shingles, votes, signature, banding, popcount — is reproducible in
    DuckDB; SIMHASH_SQL (plans/pipeline_queries2.py) is the exact oracle.
    """
    # Same staging as minhash: shingles -> per-shingle hashes -> signature,
    # each materialized so no stage's expression is re-inlined into the 60
    # bit-vote references, the block keys, or the self-join sides.
    sh = _shingle_frame(df, id_col, text_col, n=2)
    hashes = sh.select(
        "id", F.transform("sh", portable_hash60).alias("hashes")
    ).cache()
    sig = hashes.select(
        "id", simhash_signature_from_hashes("hashes").alias("sig")
    ).cache()
    band_bits = SIMHASH_BITS // SIMHASH_BLOCKS
    mask = (1 << band_bits) - 1
    blocks = sig.select(
        "id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("block"),
                        F.shiftright(F.col("sig"), b * band_bits)
                        .bitwiseAND(F.lit(mask))
                        .alias("key"),
                    )
                    for b in range(SIMHASH_BLOCKS)
                ]
            )
        ).alias("bk"),
    ).select("id", "sig", "bk.block", "bk.key")
    a, b = blocks.alias("a"), blocks.alias("b")
    xor = F.col("a.sig").bitwiseXOR(F.col("b.sig"))
    hamming = F.bit_count(xor)
    return (
        a.join(
            b,
            (F.col("a.block") == F.col("b.block"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"), hamming.alias("hamming"))
        .distinct()
        .where(F.col("hamming") <= max_hamming)
    )


def embedding_cosine_pairs(
    df: DataFrame, id_col: str, vec_col: str, threshold: float = 0.45
) -> DataFrame:
    """All-pairs embedding near-dup: [id_a, id_b, cosine(rounded 6)].

    GROUND-TRUTH BASELINE ONLY (O(N^2) nested-loop join): kept as the
    recall yardstick for embedding_cosine_pairs_lsh (the catalog/scale
    path) and as the shape the DuckDB oracle mirrors.  Cosine fold order
    matches the DuckDB oracle so values hash identically.
    """
    from kmeans_mapreduce_spark.session import ensure_parallelism

    v = ensure_parallelism(df).select(
        F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v")
    )
    a = v.select(F.col("id").alias("id_a"), F.col("v").alias("va"))
    b = v.select(F.col("id").alias("id_b"), F.col("v").alias("vb"))
    cos = cosine_similarity(F.col("va"), F.col("vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.round(cos, 6).alias("cosine"))
        .where(F.col("cosine") >= threshold)
    )


def embedding_cosine_pairs_lsh(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.45,
    dim: int = 64,
    n_planes: int = 3,
    n_tables: int = 24,
    seed: int = 7,
) -> DataFrame:
    """Embedding near-dup at scale: multi-table random-hyperplane LSH
    candidate generation + exact-cosine verification on candidates only.
    Output: [id_a, id_b, cosine(rounded 6)] — identical to
    embedding_cosine_pairs when every qualifying pair shares >=1 bucket
    (recall pinned against the all-pairs ground truth in
    tests/test_dedup_similarity.py for the fixed seed).

    Plan shape (the point of this operator): every join is an EQUI-join
    — (table, bucket) for candidates, id for the verify lookups — so
    Catalyst hash-partitions each; no BroadcastNestedLoopJoin / cartesian
    anywhere (asserted in tests).  Shuffle volume is n_tables rows per
    vector for bucketing plus the candidate-pair ids; the O(N^2)
    comparison of the baseline never happens.

    Parameter note: sign-LSH collision prob per table is
    (1 - theta/pi)^n_planes; the benchmark threshold 0.45 (theta~63deg)
    is unusually permissive, so recall 1.0 needs many OR-ed tables
    (24x3 bits here -> per-pair miss ~5e-4 at the threshold boundary).
    At production near-dup thresholds (>=0.8, theta<=37deg) the same
    machinery reaches the same recall with far fewer tables while
    pruning much harder — the table count is the knob, not the shape."""
    from kmeans_mapreduce_spark.operators.similarity import (
        _bucket_sql,
        _hyperplanes,
    )
    from kmeans_mapreduce_spark.session import ensure_parallelism

    v = ensure_parallelism(df).select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    # one expression string for all tables (py4j round-trips avoided);
    # explode -> n_tables (tbl, bucket) rows per vector
    structs = ",".join(
        f"struct({t} as tbl, "
        f"{_bucket_sql('v', _hyperplanes(dim, n_planes, seed + 1000 * t))} as bucket)"
        for t in range(n_tables)
    )
    bucketed = v.select(
        "id", F.explode(F.expr(f"array({structs})")).alias("tb")
    ).select("id", "tb.tbl", "tb.bucket")
    # candidate ids only — vectors do not ride the bucket join
    cand = (
        bucketed.alias("a")
        .join(
            bucketed.alias("b"),
            ["tbl", "bucket"],
        )
        .where(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()  # same pair collides in multiple tables
    )
    # verify: fetch both vectors by id (equi-joins), exact cosine, filter
    cos = cosine_similarity(F.col("va"), F.col("vb"))
    return (
        cand.join(v.select(F.col("id").alias("id_a"), F.col("v").alias("va")), "id_a")
        .join(v.select(F.col("id").alias("id_b"), F.col("v").alias("vb")), "id_b")
        .select("id_a", "id_b", F.round(cos, 6).alias("cosine"))
        .where(F.col("cosine") >= threshold)
    )




def substring_shingle_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    window: int = 32,
    mod_p: int = 16,
    min_shared: int = 2,
) -> DataFrame:
    """Substring-level duplicate detection (the Lee et al. 2021
    "Deduplicating Training Data Makes Language Models Better" concern,
    answered with MOD-p content-defined fingerprinting instead of
    suffix arrays): two docs are flagged when they share >= min_shared
    distinct WINDOW-char substrings whose own digest selects them
    (hash ≡ 0 mod mod_p, keeping ~1/mod_p of all windows).

    Content-defined selection is the load-bearing choice: a strided
    grid on both sides only matches copies whose offsets happen to
    align mod stride, but hash-selection depends on the BYTES alone, so
    every copy of a span selects the identical shingle set regardless
    of alignment.  A duplicated span is missed only if none of its
    windows self-select (prob (1-1/p)^(L-w+1) — <2% at p=16 for a
    96-char span), and the miss is consistent, never alignment luck.
    This catches verbatim boilerplate/quotation reuse that whole-doc
    MinHash dilutes below threshold.

    Scale shape: window enumeration is a per-row transform+explode of
    length(text) rows, immediately collapsed ~mod_p× by the digest
    filter BEFORE the distinct and the join — all map-side.  The join
    is ONE equi self-join on a 16-byte digest; hot digests (site-wide
    boilerplate) are the skew unit — at 100 TB, cap digest document-
    frequency before the join (a shingle in 10⁶ docs carries no
    actionable pair signal) or rely on AQE skew splitting.

    Returns (doc_a, doc_b, n_shared) with doc_a < doc_b.
    """
    starts = F.sequence(
        F.lit(1),
        F.greatest(F.length(text_col) - (window - 1), F.lit(1)),
        F.lit(1),
    )
    shingles = F.transform(
        starts, lambda s: F.md5(F.substring(F.col(text_col), s, window))
    )
    selected = F.filter(
        shingles,
        lambda h: F.conv(F.substring(h, 1, 4), 16, 10).cast("int") % mod_p == 0,
    )
    sh = (
        df.where(F.length(text_col) >= window)  # short docs have no full window
        .select(F.col(id_col).alias("id"), F.explode(selected).alias("h"))
        .distinct()
    )
    return (
        sh.alias("a")
        .join(sh.alias("b"), "h")
        .where(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("doc_a"), F.col("b.id").alias("doc_b"))
        .agg(F.count("*").alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )
