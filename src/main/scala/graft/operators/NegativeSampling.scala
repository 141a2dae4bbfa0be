package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic negative-edge sampling — non-edges for link-
  * prediction / graph-embedding training (the negative half of the
  * q100 hard-positive story, on graphs): candidate pairs come from a
  * HASH RING (each node paired with its next `ringWidth` successors
  * in md5 order — pseudo-random w.r.t. any graph structure, yet fully
  * deterministic), true edges are anti-joined out, and each node
  * keeps its first `perNode` survivors in ring order.
  *
  * Shape at scale: the ring position is
  * [[ScalableRank.withGlobalPosition]]'s range-partitioned rank (no
  * global window); successor candidates are a bounded explode
  * (1..ringWidth) + ONE equi-join on the ring position, WRAPPED
  * modulo n (r11 advice: the open-line form starved the last
  * ringWidth nodes of candidates) — the
  * [[FuzzyJoin.sortedNeighborhood]] pattern, candidates = exactly
  * n·ringWidth whenever n > ringWidth; the anti-join shuffles on the
  * normalized pair key; the keep-k window partitions per node with
  * <= ringWidth rows. Degenerate n <= ringWidth inputs would let a
  * probe wrap all the way to its own node — those self-pairs are
  * filtered, so tiny graphs lose candidates rather than emit
  * (x, x) non-edges — and can reach the SAME neighbor via two
  * offsets — those duplicates dedup to the min ring_dist before
  * keep-k (r12 advice), so perNode keeps DISTINCT negatives. */
object NegativeSampling {

  /** (id_a, id_b, ring_dist) non-edges, id_a < id_b normalized;
    * `edges` must carry (`eaCol`, `ebCol`) in any orientation. */
  def negativeEdges(nodes: DataFrame, idCol: String, edges: DataFrame,
      eaCol: String, ebCol: String, ringWidth: Int = 3,
      perNode: Int = 2): DataFrame = {
    require(ringWidth >= 1 && perNode >= 1, "ringWidth/perNode >= 1")
    import org.apache.spark.sql.expressions.Window
    val ring = ScalableRank.withGlobalPosition(
      nodes.select(col(idCol).as("id__"),
        md5(col(idCol).cast("string")).as("h__")),
      Seq(col("h__").asc, col("id__").asc),
      nodes.sparkSession.sessionState.conf.numShufflePartitions, "rn__")
    // ring size for the wrap — max(rn__) over the persisted ring is a
    // tiny aggregate broadcast as a guarantee scalar (the in-repo
    // pattern for plan-time-unknown bounds)
    val ringSize = ring.agg(max(col("rn__")).as("n__"))
    val probes = ring.crossJoin(broadcast(ringSize))
      .withColumn("off__", explode(sequence(lit(1L), lit(ringWidth.toLong))))
      .select((pmod(col("rn__") + col("off__") - 1L, col("n__")) + 1L)
          .as("rn__"),
        col("id__").as("src__"), col("off__"))
    val cands = ring.join(probes, "rn__")
      .filter(col("src__") =!= col("id__"))
      .select(least(col("src__"), col("id__")).as("id_a"),
        greatest(col("src__"), col("id__")).as("id_b"),
        col("src__"), col("off__").as("ring_dist"))
    val normEdges = edges.select(
      least(col(eaCol), col(ebCol)).as("id_a"),
      greatest(col(eaCol), col(ebCol)).as("id_b")).distinct()
    val keep = Window.partitionBy(col("src__"))
      .orderBy(col("ring_dist").asc)
    // r12 advice: when n <= ringWidth a probe can reach the same
    // neighbor via two offsets; without dedup the duplicate survives
    // to keep-k and crowds out a distinct negative on tiny graphs.
    // Keep the min ring_dist per (src, pair) — partitioned on the
    // same src__ key as keep-k, so both windows share one shuffle.
    val dedup = Window.partitionBy(col("src__"), col("id_a"), col("id_b"))
      .orderBy(col("ring_dist").asc)
    cands.join(normEdges, Seq("id_a", "id_b"), "left_anti")
      .withColumn("d__", row_number().over(dedup))
      .filter(col("d__") === 1)
      .withColumn("k__", row_number().over(keep))
      .filter(col("k__") <= perNode)
      .select(col("id_a"), col("id_b"), col("ring_dist"))
  }
}
