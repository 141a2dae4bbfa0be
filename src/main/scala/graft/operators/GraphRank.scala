package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic integer-scaled PageRank over an edge list — the
  * link-graph quality signal large-scale curation uses (CommonCrawl
  * pipelines rank domains by centrality to prioritize/filter crawl
  * content; "harmonic centrality / PageRank over the web graph" is the
  * CCNet/RefinedWeb-family source-quality feature).
  *
  * Every quantity is a LONG: ranks carry e6-scaled mass (init 10⁶ per
  * node), per-edge contributions are `rank div out_degree`
  * (IntegralDivide — order-independent long sums, no float anywhere),
  * and the damping update is the exact rational
  * `r' = ((den−num)·10⁶ + num·Σcontrib) div den`. Two engines given
  * the same edges compute bit-identical ranks — the property the gate
  * hashes. Total mass drifts by the integer-division remainders and
  * dangling-node loss (documented; rank ORDER, the consumed signal, is
  * unaffected).
  *
  * Scale shape (the [[Dedup.connectedComponents]] discipline): the edge
  * list is hash-partitioned by src and persisted ONCE — each of the
  * fixed `iterations` rounds shuffles only the (node, rank) table into
  * the join and one groupBy(dst) aggregate; rank state is two longs per
  * node. Fixed iteration count (PageRank converges geometrically at
  * rate d; 5–10 rounds order the head of any real graph), each round
  * localCheckpoint-ed so lineage stays flat.
  */
object GraphRank {

  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int = 5, dampNum: Long = 85L, dampDen: Long = 100L)
      : DataFrame = {
    require(iterations >= 1 && dampNum >= 0 && dampNum <= dampDen,
      "need iterations >= 1 and 0 <= dampNum <= dampDen")
    import org.apache.spark.storage.StorageLevel
    val e = graft.Caches.register(edges
      .select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .distinct()
      .repartition(col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK))
    val nodes = graft.Caches.register(
      e.select(col("src").as("node"))
        .union(e.select(col("dst").as("node"))).distinct()
        .persist(StorageLevel.MEMORY_AND_DISK))
    val deg = graft.Caches.register(
      e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
        .persist(StorageLevel.MEMORY_AND_DISK))
    val base = (dampDen - dampNum) * 1000000L
    var ranks = nodes.select(col("node"), lit(1000000L).as("rank_e6"))
      .localCheckpoint(true)
    for (_ <- 1 to iterations) {
      val contrib = e
        .join(ranks.select(col("node").as("src"), col("rank_e6")), "src")
        .join(deg, "src")
        .select(col("dst"), expr("rank_e6 div deg").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("in_mass"))
      ranks = nodes
        .join(contrib.withColumnRenamed("dst", "node"), Seq("node"), "left")
        .select(col("node"),
          expr(s"($base + $dampNum * coalesce(in_mass, 0)) div $dampDen")
            .as("rank_e6"))
        .localCheckpoint(true)
    }
    ranks
  }
}
