package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocked fuzzy (edit-distance) self-join — the record-linkage
  * primitive: find pairs of rows whose names are ALMOST equal
  * (typos, word swaps, OCR noise) without the O(n²) all-pairs scan.
  *
  * Semantics are explicitly "same block AND distance in [minDist,
  * maxDist]": blocking is part of the operator's contract, not a lossy
  * optimization bolted on after — that is how production linkage
  * systems define it (a pair in different blocks is by definition not
  * a candidate), and it is what makes the operator expressible as one
  * equi-join shuffle at any scale.
  *
  * Scale shape: one shuffle on the block key, pairs expanded only
  * within a block, a cheap length prune (|len(a)−len(b)| ≤ maxDist is
  * a lower bound on edit distance) before the levenshtein kernel
  * runs, and an optional `maxBlockSize` frequency cap that drops
  * degenerate hot blocks (a block with 10⁶ members contributes 10¹²
  * pairs and no linkage signal — same discipline as
  * [[Dedup.jaccardNearDup]]'s `maxDocFreq`).
  *
  * Two further levers keep the kernel off the critical path:
  *
  *  - '''Salted pair expansion.''' Real blocking keys are coarse (the
  *    test corpus's first-token key has EIGHT distinct values over
  *    20k rows → 25M pairs behind 8 join keys), so an unsalted
  *    equi-join serializes the whole pair expansion onto ≤8 tasks no
  *    matter how many cores exist. The left side therefore carries
  *    `salt = hash(key) mod saltParts` and the right side is
  *    replicated to every salt, making the join key (block, salt):
  *    each pair is produced exactly once (by the left row's salt),
  *    the expansion spreads over blocks×saltParts cells, and the
  *    replication cost is saltParts× the INPUT (rows), never the
  *    output (pairs) — the classic skew-replication trade.
  *  - '''Thresholded DP.''' `levenshtein(a, b, maxDist)` runs the
  *    banded O(len·maxDist) kernel with early exit and returns −1
  *    past the bound — exact for every distance this operator keeps,
  *    ~len/maxDist× cheaper than the unbounded O(len²) DP on the 25M
  *    candidates that fail the bound.
  */
object FuzzyJoin {

  /** First whitespace token, lowercased — the default blocking key for
    * name-like columns. */
  def firstTokenBlock(name: Column): Column =
    lower(split(name, " ").getItem(0))

  /** Packed letter-count signature: 5 longs, 6 letters per long in
    * 10-bit fields ('a'..'z', counts capped at 1023), computed ONCE
    * per input ROW. The r20 kernel prune: each edit operation changes
    * the letter multiset by at most 2 units (substitution swaps one
    * letter for another; insert/delete add/remove one), so
    * levenshtein(a,b) >= L1(bag_a, bag_b) / 2 — and the bound still
    * holds counting only the a-z subset, and under the 1023 cap
    * (|min(x,c) − min(y,c)| <= |x − y|). [[bagL1]] over the packed
    * signatures is ~26 shift/mask/abs long ops of pure codegen per
    * PAIR, vs the banded-levenshtein kernel's per-call array
    * allocations + O(len·maxDist) DP — measured on q96 (25M candidate
    * pairs, sf0.1): the DP kernel was ~90% of the query. */
  private val sigFields = 6
  private[operators] def bagSigs(nm: Column): Seq[Column] =
    ('a' to 'z').grouped(sigFields).map { group =>
      group.zipWithIndex.map { case (c, i) =>
        shiftleft(least(
          length(nm) - length(translate(nm, c.toString, "")),
          lit(1023L)).cast("long"), 10 * i)
      }.reduce(_ + _)
    }.toSeq

  /** Σ per-field |difference| of two packed signatures. */
  private[operators] def bagL1(pairs: Seq[(Column, Column)]): Column =
    pairs.flatMap { case (x, y) =>
      (0 until sigFields).map { i =>
        abs(shiftright(x, 10 * i).bitwiseAND(lit(1023L)) -
          shiftright(y, 10 * i).bitwiseAND(lit(1023L)))
      }
    }.reduce(_ + _)

  /** Pairs (key_a < key_b) within the same block whose names are at
    * edit distance in [minDist, maxDist]. `minDist = 1` excludes
    * exact duplicates (those belong to [[Dedup.exact]], not fuzzy
    * linkage). Output: key_a, key_b, name_a, name_b, lev.
    *
    * `saltParts = 0` (the default) derives the salt from OBSERVED
    * block sizes: the largest block's share of the total pair work
    * (n_max² / Σ n_b²) times the partition budget, clamped to [1, 32].
    * A coarse 8-value key gets the full spread it needs; a
    * fine-grained key (thousands of comparably-sized blocks) derives
    * s = 1 and pays ZERO replication — a fixed 32 would inflate its
    * input 32× for no skew benefit. The derivation costs one count
    * aggregate over input ROWS (two scalars to the driver), noise
    * next to the pair expansion it sizes. Pass an explicit value to
    * skip the extra pass: 1 = never replicate, n = fixed spread. */
  def byEditDistance(df: DataFrame, keyCol: String, nameCol: String,
      maxDist: Int = 3, minDist: Int = 1,
      blockKey: Column => Column = firstTokenBlock,
      maxBlockSize: Long = 0L, saltParts: Int = 0): DataFrame = {
    val base = df.select(col(keyCol).as("k"), col(nameCol).as("nm"),
      blockKey(col(nameCol)).as("blk"))
    val blocked =
      if (maxBlockSize <= 0) base
      else {
        val sizes = base.groupBy("blk").agg(count(lit(1)).as("bn_"))
          .filter(col("bn_") <= maxBlockSize).drop("bn_")
        base.join(sizes, "blk")
      }
    val s =
      if (saltParts > 0) saltParts
      else {
        val budget = df.sparkSession.sessionState.conf.numShufflePartitions
        val stats = blocked.groupBy("blk").agg(count(lit(1)).as("bn_"))
          .agg(sum(col("bn_") * col("bn_")).as("sq"), max(col("bn_")).as("mx"))
          .collect()(0)
        if (stats.isNullAt(0)) 1
        else {
          val (sq, mx) = (stats.getLong(0), stats.getLong(1))
          // spread the dominant block's pair share over the budget
          math.max(1L, math.min(32L,
            math.ceil(budget.toDouble * mx * mx / sq).toLong)).toInt
        }
      }
    // BOTH sides are REPARTITIONED on (block, salt): when either side
    // broadcasts, probe parallelism is exactly the OTHER side's input
    // partition count — a 20k-row single-file scan would otherwise run
    // the whole pair expansion in ONE task, no matter the salt, and
    // nothing pins which side the planner picks as build. The explicit
    // exchanges cost one pass over input ROWS (never pairs), and on
    // the big-data SMJ path they satisfy the join's distribution
    // requirement outright, so no second shuffle appears.
    // letter-bag signatures ride the row (5 longs, 40 bytes) through
    // the block shuffle so the pair-side prune below is pure long
    // arithmetic — never string work
    val sigCols = bagSigs(col("nm")).zipWithIndex
      .map { case (c, i) => c.as(s"sig${i}_") }
    // LENGTH BANDING on the join key (r21): lev ≤ maxDist forces
    // |Δlen| ≤ maxDist, so cross-band pairs can never survive — put
    // band = len div (2·maxDist+1) INTO the equi-key and replicate
    // the right side to the ≤2 bands its admissible window
    // [len−maxDist, len+maxDist] covers. Pairs whose lengths differ
    // past the bound are then never MATERIALIZED (the length filter
    // below still settles the within-band stragglers) — the pair
    // expansion itself shrinks by the block's length spread, for a
    // ≤2× replication of input ROWS (never pairs).
    val bandW = 2 * maxDist + 1
    val a = blocked
      .select(col("*") +: sigCols: _*)
      .withColumn("salt_", pmod(hash(col("k")), lit(s)))
      .withColumn("band_", expr(s"length(nm) div $bandW"))
      .repartition(col("blk"), col("salt_"), col("band_")).as("a")
    val b = blocked
      .select(col("*") +: sigCols: _*)
      .withColumn("salt_", explode(sequence(lit(0), lit(s - 1))))
      .withColumn("band_", explode(sequence(
        expr(s"greatest(length(nm) - $maxDist, 0) div $bandW"),
        expr(s"(length(nm) + $maxDist) div $bandW"))))
      .repartition(col("blk"), col("salt_"), col("band_")).as("b")
    val nSigs = sigCols.size
    a.join(b, col("a.blk") === col("b.blk") &&
        col("a.salt_") === col("b.salt_") &&
        col("a.band_") === col("b.band_") && col("a.k") < col("b.k"))
      // length prune first: |Δlen| ≤ maxDist is necessary for
      // lev ≤ maxDist and costs O(1) vs the DP kernel
      .filter(abs(length(col("a.nm")) - length(col("b.nm"))) <= maxDist)
      // bag prune second: lev >= bagL1/2 (see bagSigs), so any pair
      // with bagL1 > 2·maxDist cannot pass the lev filter — the DP
      // kernel runs only on the survivors (q96: <1% of candidates)
      .filter(bagL1((0 until nSigs).map(i =>
        (col(s"a.sig${i}_"), col(s"b.sig${i}_")))) <= 2 * maxDist)
      // Myers bit-parallel kernel (r21): identical contract to
      // levenshtein(a, b, maxDist) — see LevenshteinWithin — at ~3x
      // less per-pair work on the ASCII ≤64-byte fast path
      .withColumn("lev",
        graft.expressions.GraftExpressions.levenshtein_within(
          col("a.nm"), col("b.nm"), maxDist).cast("long"))
      // the thresholded kernel reports −1 past maxDist; minDist ≥ 1
      // (callers wanting 0 get exact dups from Dedup.exact) so the
      // between() filter drops the sentinel with no extra branch
      .filter(col("lev").between(minDist, maxDist))
      .select(col("a.k").as("key_a"), col("b.k").as("key_b"),
        col("a.nm").as("name_a"), col("b.nm").as("name_b"), col("lev"))
  }

  /** SORTED-NEIGHBORHOOD blocking (Hernández & Stolfo's classic
    * record-linkage method) — the complementary blocking strategy to
    * [[byEditDistance]]'s token blocks: sort ALL records by the name,
    * and compare each record only to its `w` successors in sort order.
    * Where token blocking misses pairs whose FIRST token differs
    * ("J Smith" vs "John Smith"), the sorted neighborhood catches
    * lexicographically-near variants, and its candidate count is
    * EXACTLY n·w by construction — no block-size skew exists to salt
    * away, which is the method's scale guarantee.
    *
    * Shape: the global rank comes from
    * [[ScalableRank.withGlobalPosition]] (range-partitioned sort +
    * per-partition offsets — NOT a single-task global window), then an
    * explode of the w offsets, one equi-join on rank+offset, and the
    * same banded-levenshtein verify as [[byEditDistance]]. */
  def sortedNeighborhood(df: DataFrame, keyCol: String, nameCol: String,
      windowSize: Int = 5, maxDist: Int = 3, minDist: Int = 1): DataFrame = {
    require(windowSize >= 1, "windowSize must be >= 1")
    val base = ScalableRank.withGlobalPosition(
      df.select(col(keyCol).as("k"), lower(col(nameCol)).as("nm")),
      Seq(col("nm").asc, col("k").asc),
      df.sparkSession.sessionState.conf.numShufflePartitions, "rn")
    val probes = base
      .withColumn("off", explode(sequence(lit(1L), lit(windowSize.toLong))))
      .select((col("rn") + col("off")).as("rn"),
        col("k").as("k0"), col("nm").as("nm0"))
    base.join(probes, "rn")
      .filter(abs(length(col("nm0")) - length(col("nm"))) <= maxDist)
      .withColumn("lev",
        graft.expressions.GraftExpressions.levenshtein_within(
          col("nm0"), col("nm"), maxDist).cast("long"))
      .filter(col("lev").between(minDist, maxDist))
      .select(least(col("k0"), col("k")).as("key_a"),
        greatest(col("k0"), col("k")).as("key_b"),
        when(col("k0") < col("k"), col("nm0")).otherwise(col("nm"))
          .as("name_a"),
        when(col("k0") < col("k"), col("nm")).otherwise(col("nm0"))
          .as("name_b"),
        col("lev"))
      .dropDuplicates("key_a", "key_b")
  }
}
