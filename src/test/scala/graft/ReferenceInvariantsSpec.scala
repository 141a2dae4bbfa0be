package graft

import graft.pipeline.{CompositeScorePipeline, FundamentalScorePipeline, GroupMomentumPipeline}

/** SURVEY §5 behavioral fingerprints of the reference, pinned as specs. */
class ReferenceInvariantsSpec extends SparkSpec {

  test("technical weights: 24 metrics summing to 67.5 (calcompositescore.py:161-186)") {
    assert(CompositeScorePipeline.weights.size == 24)
    assert(math.abs(CompositeScorePipeline.weights.map(_._2).sum - 67.5) < 1e-9)
  }

  test("fundamental category weights sum to 0.40/0.30/0.20/0.10 (calfundamentalscore.py:57-88)") {
    def s(ms: Seq[FundamentalScorePipeline.Metric]) = ms.map(_.weight).sum
    assert(math.abs(s(FundamentalScorePipeline.quality) - 0.40) < 1e-9)
    assert(math.abs(s(FundamentalScorePipeline.growth) - 0.30) < 1e-9)
    assert(math.abs(s(FundamentalScorePipeline.valuation) - 0.20) < 1e-9)
    assert(math.abs(s(FundamentalScorePipeline.health) - 0.10) < 1e-9)
    assert(FundamentalScorePipeline.all.size == 18)
  }

  test("momentum horizon weights each sum to 100 (sectorscore.py:49-62)") {
    Seq(GroupMomentumPipeline.weights3m, GroupMomentumPipeline.weights6m,
      GroupMomentumPipeline.weights1y).foreach { ws =>
      assert(ws.map(_._2).sum == 100.0)
    }
  }

  test("cap bands are 100/150/250/rest by construction") {
    val b = CompositeScorePipeline.bands
    assert(b == Seq(100L -> "Large Cap", 250L -> "Mid Cap", 500L -> "Small Cap"))
  }
}
