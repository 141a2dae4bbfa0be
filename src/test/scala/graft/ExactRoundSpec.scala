package graft

import org.apache.spark.sql.functions._
import graft.functions.ExactRound

/** ExactRound is load-bearing for every gated ratio (q18/q22/q23/q51/
  * q55/q59/q71/q73 + pack utilization) — pin it against the reference
  * semantics: BigDecimal HALF_UP of the exact rational, plus the known
  * tie cases that motivated it. */
class ExactRoundSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(4242)

  test("matches BigDecimal HALF_UP of the exact rational (seeded sweep)") {
    val cases = (1 to 500).map { _ =>
      val den = 1L + rnd.nextInt(100000)
      val num = math.abs(rnd.nextLong()) % (den * 3) // ratios in [0, 3)
      (num, den)
    } ++ Seq((102L, 320L), (0L, 7L), (1L, 3L), (2L, 3L), (5L, 10000L),
      (15L, 100000L), (8L, 256L), (1L, 1L))
    val expected = cases.map { case (n, d) =>
      (BigDecimal(n) / BigDecimal(d))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val got = cases.toDF("num", "den")
      .select(ExactRound.ratio(col("num"), col("den"), 4).as("r"))
      .as[Double].collect()
    got.zip(expected).zip(cases).foreach { case ((g, e), c) =>
      assert(g == e, s"case $c: got $g expected $e")
    }
  }

  test("128-bit headroom: scaled dividends past Long.MaxValue stay exact") {
    // num·2·10^4 ≈ 2e19 > Long.Max — the q18 quality score's
    // three-factor numerator reaches this on multi-megabyte docs
    val cases = Seq((1000000000000000L, 3000000000000000L),
      (922337203685477580L, 2767011611056432741L))
    val expected = cases.map { case (n, d) =>
      (BigDecimal(n) / BigDecimal(d))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val got = cases.toDF("num", "den")
      .select(ExactRound.ratio(col("num"), col("den"), 4)).as[Double].collect()
    assert(got.toSeq == expected)
  }

  test("the r7 q71 tie (102/320 = 0.31875) rounds half-up to 0.3188") {
    val r = Seq((102L, 320L)).toDF("n", "d")
      .select(ExactRound.ratio(col("n"), col("d"), 4)).as[Double].head()
    assert(r == 0.3188)
  }

  test("zero and NULL denominators yield 0.0; NULL numerator stays NULL") {
    val out = Seq(
      (Some(5L), Some(0L)),
      (Some(5L), None),
      (None, Some(10L))
    ).toDF("n", "d")
      .select(ExactRound.ratio(col("n"), col("d"), 4).as("r"))
      .collect()
    assert(out(0).getDouble(0) == 0.0)
    assert(out(1).getDouble(0) == 0.0)
    assert(out(2).isNullAt(0))
  }

  test("ratioSql mirrors ratio through DuckDB-compatible arithmetic (Spark eval)") {
    // evaluate the SQL fragment's arithmetic shape in Spark by textual
    // substitution of DuckDB-isms (// → div, HUGEINT → DECIMAL(38,0))
    // — same 128-bit integer ops, so equal output
    val sql = ExactRound.ratioSql("n", "d", 4)
      .replace("//", "div").replace("HUGEINT", "DECIMAL(38,0)")
    val cases = Seq((102L, 320L), (7L, 3L), (0L, 5L), (9999L, 10000L))
    val df = cases.toDF("n", "d")
    val a = df.select(ExactRound.ratio(col("n"), col("d"), 4)).as[Double].collect()
    val b = df.selectExpr(sql).as[Double].collect()
    assert(a.toSeq == b.toSeq)
  }

  test("ratioScaled is ratio·10^d as an exact LONG (seeded sweep + ties)") {
    val cases = (1 to 300).map { _ =>
      val den = 1L + rnd.nextInt(100000)
      (math.abs(rnd.nextLong()) % (den * 3), den)
    } ++ Seq((102L, 320L), (5L, 10000L), (0L, 7L), (1L, 1L), (5L, 0L))
    val expected = cases.map { case (n, d) =>
      if (d == 0L) 0L
      else (BigDecimal(n) / BigDecimal(d))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP)
        .*(BigDecimal(10000)).toLongExact
    }
    val got = cases.toDF("num", "den")
      .select(ExactRound.ratioScaled(col("num"), col("den"), 4))
      .as[Long].collect()
    assert(got.toSeq == expected)
    // and the SQL mirror, through the same textual DuckDB→Spark bridge
    val sql = ExactRound.ratioScaledSql("num", "den", 4)
      .replace("//", "div").replace("HUGEINT", "DECIMAL(38,0)")
    val b = cases.toDF("num", "den").selectExpr(sql).as[Long].collect()
    assert(b.toSeq == expected)
  }
}
