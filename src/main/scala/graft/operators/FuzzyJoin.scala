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
  * a lower bound on edit distance) before the O(len²) levenshtein
  * kernel runs, and an optional `maxBlockSize` frequency cap that
  * drops degenerate hot blocks (a block with 10⁶ members contributes
  * 10¹² pairs and no linkage signal — same discipline as
  * [[Dedup.jaccardNearDup]]'s `maxDocFreq`).
  */
object FuzzyJoin {

  /** First whitespace token, lowercased — the default blocking key for
    * name-like columns. */
  def firstTokenBlock(name: Column): Column =
    lower(split(name, " ").getItem(0))

  /** Pairs (key_a < key_b) within the same block whose names are at
    * edit distance in [minDist, maxDist]. `minDist = 1` excludes
    * exact duplicates (those belong to [[Dedup.exact]], not fuzzy
    * linkage). Output: key_a, key_b, name_a, name_b, lev. */
  def byEditDistance(df: DataFrame, keyCol: String, nameCol: String,
      maxDist: Int = 3, minDist: Int = 1,
      blockKey: Column => Column = firstTokenBlock,
      maxBlockSize: Long = 0L): DataFrame = {
    val base = df.select(col(keyCol).as("k"), col(nameCol).as("nm"),
      blockKey(col(nameCol)).as("blk"))
    val blocked =
      if (maxBlockSize <= 0) base
      else {
        val sizes = base.groupBy("blk").agg(count(lit(1)).as("bn_"))
          .filter(col("bn_") <= maxBlockSize).drop("bn_")
        base.join(sizes, "blk")
      }
    val a = blocked.as("a")
    val b = blocked.as("b")
    a.join(b, col("a.blk") === col("b.blk") && col("a.k") < col("b.k"))
      // length prune first: |Δlen| ≤ maxDist is necessary for
      // lev ≤ maxDist and costs O(1) vs the DP kernel's O(len²)
      .filter(abs(length(col("a.nm")) - length(col("b.nm"))) <= maxDist)
      .withColumn("lev",
        levenshtein(col("a.nm"), col("b.nm")).cast("long"))
      .filter(col("lev").between(minDist, maxDist))
      .select(col("a.k").as("key_a"), col("b.k").as("key_b"),
        col("a.nm").as("name_a"), col("b.nm").as("name_b"), col("lev"))
  }
}
