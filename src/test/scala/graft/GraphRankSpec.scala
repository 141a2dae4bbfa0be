package graft

import graft.operators.GraphRank

/** Integer-scaled PageRank: hand-computed fixpoint steps, determinism
  * under repartitioning, dangling behavior. */
class GraphRankSpec extends SparkSpec {
  import spark.implicits._

  test("two iterations match the hand-computed integer lineage") {
    // 1→2, 1→3, 2→3, 3→1; deg 1:2, 2:1, 3:1; mass e6, damping 85/100
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L))
      .toDF("src", "dst")
    val r = GraphRank.pageRank(edges, "src", "dst", iterations = 2)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    // iter1: r1=(15e6+85·1e6)/100=1e6; r2=(15e6+85·5e5)/100=575000;
    //        r3=(15e6+85·15e5)/100=1425000
    // iter2: r1=(15e6+85·1425000)/100=1361250; r2=575000;
    //        r3=(15e6+85·(500000+575000))/100=1063750
    assert(r == Map(1L -> 1361250L, 2L -> 575000L, 3L -> 1063750L))
    graft.Caches.unpersistAll()
  }

  test("dangling sink keeps collecting mass; source decays to base") {
    val edges = Seq((1L, 2L)).toDF("src", "dst")
    val r = GraphRank.pageRank(edges, "src", "dst", iterations = 1)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    // r1 = (15e6 + 0) div 100 = 150000 (nothing points at 1)
    // r2 = (15e6 + 85·1e6) div 100 = 1000000
    assert(r == Map(1L -> 150000L, 2L -> 1000000L))
    graft.Caches.unpersistAll()
  }

  test("ranks are partitioning-independent") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L), (4L, 1L))
      .toDF("src", "dst")
    val a = GraphRank.pageRank(edges, "src", "dst", iterations = 4).rowsSet
    val b = GraphRank.pageRank(edges.repartition(7), "src", "dst",
      iterations = 4).rowsSet
    assert(a == b)
    graft.Caches.unpersistAll()
  }
}
