"""Deduplication family (LLM-pipeline extensions).

Four escalating strategies over a (id, text) corpus:

- exact:   md5 content fingerprint, hash groupBy — one shuffle.
- minhash: word-shingle MinHash signatures + LSH banding; candidate
  pairs share a band bucket, then exact Jaccard verification. The
  classic sub-quadratic near-dup join.
- simhash: 32-bit sign-of-weighted-bits sketch; candidates share one
  of four 8-bit chunks (pigeonhole: hamming <= 3 implies an equal
  chunk), verified by bit_count(xor).
- ngram_jaccard: exact sparse similarity join — explode shingles,
  join on shingle, |A∩B| by count, Jaccard from set sizes. Exact but
  explodes on very common shingles; at 100 TB use minhash/simhash, or
  add prefix filtering.

Scale design: everything is groupBy/join — no collect, no driver
loops, no UDFs. Signatures are K aggregate columns computed in ONE
hash aggregate (not K shuffles). Hashing is the portable md5-based
hash60 by default so DuckDB oracles reproduce signatures bit-for-bit;
pass hash_fn=F.xxhash64 for the cheaper production hash (Spark-only
semantics, same plan shape).
"""

from __future__ import annotations

import random
from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import fingerprint, hash60

# MinHash universe: permutation hashes h_k(x) = (a_k * (x mod P) + b_k) mod P
# over the 60-bit token hash. P prime; constants fixed (seeded) so Spark
# and the DuckDB oracle produce identical signatures.
MINHASH_P = 1_000_003
N_PERM = 16
N_BANDS = 4  # 4 bands x 4 rows: ~0.5 Jaccard LSH threshold
_rng = random.Random(0xC0FFEE)
PERMS: list[tuple[int, int]] = [
    (_rng.randrange(1, MINHASH_P), _rng.randrange(0, MINHASH_P)) for _ in range(N_PERM)
]

SIMHASH_BITS = 32
SIMHASH_CHUNKS = 4


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Content-fingerprint dedup: every row tagged with its canonical
    (minimum-id) representative and the duplicate-group size."""
    from pyspark.sql import Window

    w = Window.partitionBy("fp")
    return (
        df.select(F.col(id_col), fingerprint(F.col(text_col)).alias("fp"))
        .withColumn("keep_id", F.min(id_col).over(w))
        .withColumn("n_copies", F.count(F.lit(1)).over(w))
        .withColumn("is_canonical", F.col(id_col) == F.col("keep_id"))
    )


def _perm_min(hm: Column, a: int, b: int) -> Column:
    # hm is already reduced mod MINHASH_P (hoisted out of the K
    # aggregate expressions — computed once per row, not K times)
    return F.min((F.lit(a) * hm + F.lit(b)) % MINHASH_P)


def minhash_signatures(
    shingled: DataFrame,
    id_col: str,
    shingle_col: str,
    hash_fn: Callable[[Column], Column] = hash60,
) -> DataFrame:
    """(id, array<shingle>) -> (id, sig_0..sig_{K-1}).

    One explode + ONE hash aggregate computing all K permutation
    minima as separate aggregate columns — K never multiplies the
    shuffle.
    """
    h = (hash_fn(F.col("shingle")) % MINHASH_P).alias("h")
    exploded = shingled.select(
        F.col(id_col), F.explode_outer(F.array_distinct(F.col(shingle_col))).alias("shingle")
    ).select(id_col, h)
    return exploded.groupBy(id_col).agg(
        *[_perm_min(F.col("h"), a, b).alias(f"sig_{k}") for k, (a, b) in enumerate(PERMS)]
    )



# Buckets above this size abandon the single-aggregate collect_list
# pair expansion for a bucket-key self-join: collect_list materializes
# the whole bucket in ONE aggregate row (2 GiB row limit) and its n²
# pairs in ONE task — a Zipfian hot bucket at 100 TB becomes a
# straggler/OOM. The self-join spreads the same n² across tasks and is
# eligible for AQE skew-split. Small buckets keep the cheaper
# aggregate form (no join machinery per tiny bucket).
LSH_HOT_BUCKET = 1024


def lsh_sized_buckets(signatures: DataFrame, id_col: str) -> DataFrame:
    """(id, sig_*) -> (id, band, key, n): band the signature (N_BANDS
    groups of N_PERM/N_BANDS rows) and attach each bucket's size via a
    window count over (band, key) — the sizing rides the bucketing
    shuffle, so the signature aggregate is computed once. Buckets of
    one are dropped (no pair can come from them).

    Split out from ``lsh_candidate_pairs`` so the plan is auditable
    pre-checkpoint (tools/plan_audit.py asserts the single-aggregate
    signature pass and the sizing window on THIS plan; the caller's
    checkpoint hides it behind a Scan ExistingRDD)."""
    from pyspark.sql import Window

    rows_per_band = N_PERM // N_BANDS
    bands = F.array(
        *[
            F.struct(
                F.lit(bi).alias("band"),
                F.concat_ws(
                    "-", *[F.col(f"sig_{bi * rows_per_band + r}") for r in range(rows_per_band)]
                ).alias("key"),
            )
            for bi in range(N_BANDS)
        ]
    )
    banded = signatures.select(F.col(id_col), F.explode(bands).alias("b")).select(
        id_col, F.col("b.band").alias("band"), F.col("b.key").alias("key")
    )
    return banded.withColumn(
        "n", F.count(F.lit(1)).over(Window.partitionBy("band", "key"))
    ).filter(F.col("n") >= 2)


def lsh_candidate_pairs(
    signatures: DataFrame, id_col: str, hot_bucket: int = LSH_HOT_BUCKET
) -> DataFrame:
    """Emit distinct id pairs (a < b) sharing any band bucket.

    Two-regime plan keyed on bucket size (``lsh_sized_buckets``):

    - size <= hot_bucket: groupBy + in-array combinations expression —
      one hash aggregate, a narrow expression, no join.
    - size >  hot_bucket: bucket-key self-join with id_a < id_b. The
      pair count is identical (n² is inherent to LSH) but the work is
      spread across tasks instead of concentrated in one collect_list
      row, and AQE skew-split can further divide a Zipfian bucket.
    """
    # lazy localCheckpoint: the sized bucket table feeds THREE
    # consumers (small-regime agg, both hot self-join branches);
    # without it each consumer re-evaluates the explode+signature
    # aggregate (AQE stage reuse is not guaranteed across the union's
    # branches — measured ~1.5x on the full pipeline). Materializes on
    # first use only; blocks are freed when the RDD is GC'd.
    sized = lsh_sized_buckets(signatures, id_col).localCheckpoint(eager=False)

    small = sized.filter(F.col("n") <= hot_bucket)
    buckets = small.groupBy("band", "key").agg(F.array_sort(F.collect_list(id_col)).alias("ids"))
    pair_expr = F.expr(
        "flatten(transform(ids, (x, i) -> "
        "transform(slice(ids, i + 2, size(ids) - i - 1), y -> struct(x AS id_a, y AS id_b))))"
    )
    small_pairs = (
        buckets.select(F.explode(pair_expr).alias("p"))
        .select(F.col("p.id_a").alias("id_a"), F.col("p.id_b").alias("id_b"))
    )

    hot = sized.filter(F.col("n") > hot_bucket).select(id_col, "band", "key")
    hot_pairs = (
        hot.withColumnRenamed(id_col, "id_a")
        .join(hot.withColumnRenamed(id_col, "id_b"), ["band", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
    )

    return small_pairs.unionByName(hot_pairs).distinct()


def verify_jaccard(
    pairs: DataFrame,
    shingled: DataFrame,
    id_col: str,
    shingle_col: str,
    broadcast_pairs: bool = True,
) -> DataFrame:
    """Attach exact Jaccard over distinct shingle sets to candidate
    pairs (array_intersect on the collected sets — pairs are few after
    LSH, so the per-pair set math is cheap).

    The candidate side is broadcast by default: post-LSH pairs are
    orders of magnitude smaller than the shingle-set table (which
    carries the full array payload), so shipping pairs to the sets —
    not sets to the pairs — avoids shuffling the arrays twice
    (measured ~2x on the verify stage). Pass broadcast_pairs=False if
    banding is loose enough that candidates rival the corpus size."""
    if broadcast_pairs:
        pairs = F.broadcast(pairs)
    sets_df = shingled.select(
        F.col(id_col).alias("_sid"), F.array_distinct(F.col(shingle_col)).alias("_sset")
    )
    out = (
        pairs.join(sets_df.withColumnRenamed("_sid", "id_a").withColumnRenamed("_sset", "set_a"), "id_a")
        .join(sets_df.withColumnRenamed("_sid", "id_b").withColumnRenamed("_sset", "set_b"), "id_b")
        .withColumn("n_common", F.size(F.array_intersect("set_a", "set_b")))
        .withColumn(
            "jaccard",
            F.col("n_common").cast("double")
            / (F.size("set_a") + F.size("set_b") - F.col("n_common")).cast("double"),
        )
    )
    return out.select("id_a", "id_b", "jaccard")


def minhash_lsh_pairs(
    shingled: DataFrame,
    id_col: str,
    shingle_col: str,
    threshold: float = 0.8,
    hash_fn: Callable[[Column], Column] = hash60,
) -> DataFrame:
    """Full near-dup pipeline: signatures -> LSH candidates -> exact
    Jaccard >= threshold."""
    sigs = minhash_signatures(shingled, id_col, shingle_col, hash_fn)
    cands = lsh_candidate_pairs(sigs, id_col)
    return verify_jaccard(cands, shingled, id_col, shingle_col).filter(
        F.col("jaccard") >= threshold
    )


def simhash_values(
    shingled: DataFrame,
    id_col: str,
    shingle_col: str,
    hash_fn: Callable[[Column], Column] = hash60,
) -> DataFrame:
    """(id, array<shingle>) -> (id, simhash int32-in-long): per bit,
    sum +-1 over shingle hashes; bit set iff the sum is >= 0. One
    explode + one aggregate with 32 conditional-sum columns."""
    h = hash_fn(F.col("shingle")).alias("h")
    exploded = shingled.select(
        F.col(id_col), F.explode_outer(F.array_distinct(F.col(shingle_col))).alias("shingle")
    ).select(id_col, h)
    bit_sums = exploded.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"s_{i}")
            for i in range(SIMHASH_BITS)
        ]
    )
    sim = None
    for i in range(SIMHASH_BITS):
        term = F.when(F.col(f"s_{i}") >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        sim = term if sim is None else sim + term
    return bit_sums.select(F.col(id_col), sim.cast("long").alias("simhash"))


def simhash_near_pairs(
    shingled: DataFrame,
    id_col: str,
    shingle_col: str,
    max_hamming: int = 3,
    hash_fn: Callable[[Column], Column] = hash60,
) -> DataFrame:
    """Near-dup pairs by simhash: candidates share one of
    SIMHASH_CHUNKS 8-bit chunks (pigeonhole guarantees recall for
    hamming <= SIMHASH_CHUNKS - 1), verified with bit_count(xor)."""
    sims = simhash_values(shingled, id_col, shingle_col, hash_fn)
    chunk_w = SIMHASH_BITS // SIMHASH_CHUNKS
    chunks = F.array(
        *[
            F.struct(
                F.lit(ci).alias("chunk"),
                F.shiftright(F.col("simhash"), ci * chunk_w)
                .bitwiseAND(F.lit((1 << chunk_w) - 1))
                .alias("key"),
            )
            for ci in range(SIMHASH_CHUNKS)
        ]
    )
    banded = sims.select(F.col(id_col), F.col("simhash"), F.explode(chunks).alias("c")).select(
        id_col, "simhash", F.col("c.chunk").alias("chunk"), F.col("c.key").alias("key")
    )
    left = banded.select(F.col(id_col).alias("id_a"), F.col("simhash").alias("sim_a"), "chunk", "key")
    right = banded.select(F.col(id_col).alias("id_b"), F.col("simhash").alias("sim_b"), "chunk", "key")
    return (
        left.join(right, ["chunk", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b"))).alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def ngram_jaccard_pairs_prefix(
    shingled: DataFrame, id_col: str, shingle_col: str, threshold: float = 0.8
) -> DataFrame:
    """Prefix-filtered EXACT Jaccard join — same output as
    ngram_jaccard_pairs, sub-quadratically (PPJoin: Xiao, Wang, Lin,
    Yu, "Efficient Similarity Joins for Near Duplicate Detection",
    WWW'08 — prefix + length + positional filters, all three).

    - PREFIX filter: order each doc's shingles by ascending global
      document frequency (ties by key); two sets with Jaccard >= t
      MUST share a shingle among each other's first
      |X| - ceil(t*|X|) + 1 entries, so only prefixes join.
    - LENGTH filter: J >= t forces t*|A| <= |B| <= |A|/t; candidate
      pairs outside the size band are dropped inside the join.
    - PAIR-PREFIX filter (PPJoin's index/probe-prefix asymmetry,
      generalized): with both sizes in hand the required overlap is
      alpha = ceil(t/(1+t) * (|A|+|B|)), and the generalized prefix
      lemma says a qualifying pair must share a token ranked
      <= |A|-alpha+1 in A AND <= |B|-alpha+1 in B — a per-JOIN-ROW
      prune far tighter than the worst-case probe prefix (which
      assumes the smallest legal partner). Applied before the pair
      groupBy, it cuts the group input ~3x at sf1.
    - POSITIONAL filter (tight form): ranks are assigned by ONE
      global order (df asc, hash asc), so for any two docs the
      common tokens interleave MONOTONICALLY: u < v globally implies
      rank_A(u) < rank_A(v) and rank_B(u) < rank_B(v). Hence every
      common token below the largest matched prefix token t* is
      itself a matched prefix token (it sits inside both prefixes),
      and overlap <= n_matched + min(|A|-rk_a(t*), |B|-rk_b(t*)).
      Aggregating count(*) + max ranks per pair gives this exactly —
      strictly tighter than the textbook single-probe bound of
      1 + min(|A|-min_rk_a, |B|-min_rk_b). (At sf1 the three pair
      filters prune 7.0M join rows -> ~0.2M candidates for the same
      exact 2,560-pair result.)

    Scale: the candidate join's cost is sum of squared PREFIX-bucket
    sizes (rare shingles -> tiny buckets), vs squared full-posting
    sizes for the naive join. The df-ranking pass is a window count
    plus a per-doc rank window — two exchanges of the exploded table,
    amortized at 100 TB by materializing the ranked shingle table
    once per corpus snapshot. Verification does NOT broadcast the
    candidate set (unlike post-LSH verify): prefix candidates scale
    with the corpus, so they flow through a shuffled join against the
    shingle-set table.

    Internal joins/shuffles key on xxhash64(shingle), never the
    shingle STRING — 8-byte fixed keys through every exchange and
    sort. This cannot cost exactness: the prefix/positional theorems
    only need a CONSISTENT global shingle order (df is a performance
    heuristic, and both docs of any true pair hash a shared shingle
    to the same key, so no candidate is lost; a hash collision can
    only merge two df counts / admit a spurious candidate, and every
    candidate is exact-verified over the string shingle sets
    afterwards). Set sizes ride the explode as a narrow per-row
    expression instead of a second corpus-wide window.

    All fractional bounds subtract 1e-9 before ceil(): the true
    bounds are mathematical reals, and a double product that rounds
    UP past an exactly-integer value would otherwise over-tighten a
    filter and could drop a true pair; the epsilon means FP rounding
    can only loosen the prune (spurious admits die in verification).

    TWO-TIER VERIFICATION (the sf1 hot spot: ~1M candidates for
    ~2.5k true pairs, and the positional bound is structurally weak
    at this size/threshold — every pair sharing one alpha-prefix
    token passes it). Tier 1 intersects per-doc SORTED LONG hash
    arrays (8-byte elements, ~3x less shuffle than the string sets
    and a cheaper comparator); tier 2 re-verifies the tiny survivor
    set over exact string sets. Exactness is a theorem, not a
    probability: per doc the shingles are string-distinct, and two
    equal hashes within a doc would sort ADJACENT under the rank
    window's (_df, _sh) order, so a lag() guard riding that existing
    sort raises on any intra-doc collision. Absent intra-doc
    collisions the string->hash map is injective per doc, so
    |Ah n Bh| >= |A n B| and hashed Jaccard >= string Jaccard —
    tier 1 at threshold t can only ADMIT spurious pairs (killed by
    tier 2), never drop a true one.
    """
    from pyspark.sql import Window

    t = threshold
    eps = 1e-9

    def _ceil(x: Column) -> Column:
        return F.ceil(x - F.lit(eps))

    ex = shingled.select(
        F.col(id_col).alias("_id"),
        F.size(F.array_distinct(F.col(shingle_col))).alias("_sz"),
        F.explode(F.array_distinct(F.col(shingle_col))).alias("shingle"),
    ).select("_id", "_sz", F.xxhash64("shingle").alias("_sh"))
    # df as a window count (no orderBy -> no sort): one exchange on
    # _sh instead of the groupBy+rejoin's two
    rank_w = Window.partitionBy("_id").orderBy(F.asc("_df"), F.asc("_sh"))
    ranked = ex.withColumn(
        "_df", F.count(F.lit(1)).over(Window.partitionBy("_sh"))
    ).withColumn("_rk", F.row_number().over(rank_w))
    # probe prefix length = sz - ceil(t*sz) + 1 (worst-case partner).
    # The prefix table feeds BOTH sides of the candidate self-join;
    # the sides differ in projection aliases, so exchange reuse does
    # not fire and the whole df/rank window pipeline would execute
    # once per side (measured ~2.5 s of a ~8 s query re-run at the
    # sf1 point).  spread_for_pair_join pins it once and spreads the
    # quadratic prefix-bucket fan-out over AQE-exempt key-hashed
    # partitions (operators/pairs.py rationale).
    from .pairs import spread_for_pair_join

    prefix = spread_for_pair_join(
        ranked.filter(
            F.col("_rk") <= F.col("_sz") - _ceil(F.lit(t) * F.col("_sz")) + 1
        )
        # strip _df before the spread: the spread pins + replicates
        # whatever it carries into BOTH sides of the quadratic prefix
        # fan-out, and _df is dead once the prefix filter has used it
        # (guide §2.3 "project before the exchange")
        .select("_id", "_sz", "_rk", "_sh"),
        "_sh",
    )
    a = prefix.select(
        F.col("_id").alias("id_a"), F.col("_sz").alias("_sza"), F.col("_rk").alias("_rka"), "_sh"
    )
    b = prefix.select(
        F.col("_id").alias("id_b"), F.col("_sz").alias("_szb"), F.col("_rk").alias("_rkb"), "_sh"
    )
    # required overlap for this size pair
    alpha = _ceil(F.lit(t / (1 + t)) * (F.col("_sza") + F.col("_szb")))
    cands = (
        a.join(b, "_sh")
        .filter(F.col("id_a") < F.col("id_b"))
        # length filter (symmetric size band)
        .filter(
            (F.col("_szb") >= _ceil(F.lit(t) * F.col("_sza")))
            & (F.col("_sza") >= _ceil(F.lit(t) * F.col("_szb")))
        )
        # pair-prefix filter: the shared token must sit within BOTH
        # docs' alpha-derived prefixes
        .filter(
            (F.col("_rka") <= F.col("_sza") - alpha + 1)
            & (F.col("_rkb") <= F.col("_szb") - alpha + 1)
        )
        .groupBy("id_a", "id_b")
        .agg(
            F.max("_sza").alias("_sza"),
            F.max("_szb").alias("_szb"),
            F.count(F.lit(1)).alias("_npfx"),
            F.max("_rka").alias("_xrka"),
            F.max("_rkb").alias("_xrkb"),
        )
        # tight positional filter (monotone interleaving, see above):
        # matched-prefix count + tokens reachable past the LAST match
        .filter(
            F.col("_npfx")
            + F.least(F.col("_sza") - F.col("_xrka"), F.col("_szb") - F.col("_xrkb"))
            >= _ceil(F.lit(t / (1 + t)) * (F.col("_sza") + F.col("_szb")))
        )
        .select("id_a", "id_b")
    )
    # tier 1: intersect sorted 8-byte hash arrays (collision-guarded;
    # J_hash >= J_string, so >= t here loses nothing). Built as a
    # NARROW map over the caller's (usually persisted) shingle table —
    # no shuffle, and crucially no recomputation of the df/rank
    # window pipeline. The guard compares distinct-hash count to the
    # distinct-string count: any intra-doc xxhash64 collision breaks
    # the injectivity the tier-1 bound needs, so it raises (a
    # 2^-64-scale event; the exactness contract requires failing
    # loudly over silently degrading).
    # harr projected separately (round 22): the collision guard
    # references it three times (two sizes + the pass-through), and
    # expression trees have no sharing — inlined, the sort+hash
    # construction ran 3x per row; bound to an attribute it runs once.
    harr = F.array_sort(
        F.transform(F.array_distinct(F.col(shingle_col)), lambda s: F.xxhash64(s))
    )
    hsets = shingled.select(
        F.col(id_col).alias("_id"), harr.alias("_harr")
    ).select(
        "_id",
        F.when(
            F.size(F.array_distinct(F.col("_harr"))) == F.size(F.col("_harr")),
            F.col("_harr"),
        )
        .otherwise(
            F.raise_error(
                F.lit(
                    "xxhash64 collision between two shingles of one "
                    "document: hashed Jaccard bound invalid"
                )
            ).cast("array<bigint>")
        )
        .alias("_hset"),
    )
    tier1 = (
        cands.join(
            hsets.select(F.col("_id").alias("id_a"), F.col("_hset").alias("_ha")),
            "id_a",
        )
        .join(
            hsets.select(F.col("_id").alias("id_b"), F.col("_hset").alias("_hb")),
            "id_b",
        )
        .withColumn("_ih", F.size(F.array_intersect("_ha", "_hb")))
        # I_h*(1+t) >= t*(|A|+|B|)  <=>  J_hash >= t (integer-safe,
        # eps-loosened)
        .filter(
            F.col("_ih") * F.lit(1 + t)
            >= F.lit(t) * (F.size("_ha") + F.size("_hb")) - F.lit(eps)
        )
        .select("id_a", "id_b")
    )
    # tier 2: exact string-set verification of the tiny survivor set
    # (shuffled, not broadcast: survivors track the true pair count,
    # which scales with the corpus)
    return verify_jaccard(
        tier1, shingled, id_col, shingle_col, broadcast_pairs=False
    ).filter(F.col("jaccard") >= threshold)


def ngram_jaccard_pairs(
    shingled: DataFrame, id_col: str, shingle_col: str, threshold: float = 0.8
) -> DataFrame:
    """Exact sparse similarity join: |A∩B| via shingle-explode
    self-join + count; Jaccard from set sizes. No candidate loss."""
    ex = shingled.select(
        F.col(id_col).alias("_id"),
        F.explode(F.array_distinct(F.col(shingle_col))).alias("shingle"),
    )
    sizes = ex.groupBy("_id").agg(F.count(F.lit(1)).alias("_sz"))
    common = (
        ex.select(F.col("_id").alias("id_a"), "shingle")
        .join(ex.select(F.col("_id").alias("id_b"), "shingle"), "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return (
        common.join(sizes.withColumnRenamed("_id", "id_a").withColumnRenamed("_sz", "sz_a"), "id_a")
        .join(sizes.withColumnRenamed("_id", "id_b").withColumnRenamed("_sz", "sz_b"), "id_b")
        .withColumn(
            "jaccard",
            F.col("n_common").cast("double")
            / (F.col("sz_a") + F.col("sz_b") - F.col("n_common")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
