package graft

import org.apache.spark.sql.functions._
import graft.operators.GraphRank

/** Round-18 operator fixtures: the HyperBall neighborhood-function
  * sketch (r17 verdict #7). */
class Round18OpsSpec extends SparkSpec {
  import spark.implicits._

  /** The operator's md5-register derivation, independently re-derived
    * here (MessageDigest + string ops, no Spark), so the fixture's
    * expectations are computed OUTSIDE the code under test. */
  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def reg(node: Long): (Long, Long) = {
    val h = md5hex(node.toString)
    val bucket = java.lang.Long.parseLong(h.substring(0, 1), 16)
    val tail = h.substring(1, 16)
    val trimmed = tail.dropWhile(_ == '0')
    val rho =
      if (trimmed.isEmpty) 61L
      else {
        val z = (tail.length - trimmed.length).toLong
        val d = java.lang.Long.parseLong(trimmed.substring(0, 1), 16)
        val bits = if (d >= 8) 0L else if (d >= 4) 1L
          else if (d >= 2) 2L else 3L
        z * 4L + bits + 1L
      }
    (bucket, rho)
  }

  /** (n_set, sum_rho, nf_raw_e6) for the ball `members`, from the
    * hand-derived registers. */
  private def expected(members: Set[Long]): (Long, Long, Long) = {
    val regs = members.toSeq.map(reg)
      .groupBy(_._1).map { case (b, rs) => b -> rs.map(_._2).max }
    val two61 = BigInt(1) << 61
    val sumSet = regs.values.map(r => BigInt(1) << (61 - r.toInt)).sum
    val den = sumSet + (BigInt(16) - regs.size) * two61
    val est = (BigInt(673000) * 256 * two61) / den
    (regs.size.toLong, regs.values.sum, est.toLong)
  }

  test("hyperBall: registers are the md5-derived HLL of the exact " +
    "<=rounds-hop ball, merged register-wise; two components never " +
    "mix (r17 verdict #7)") {
    // component A: path 1-2-3-4-5 (ball radius matters: node 1 at
    // rounds=3 sees {1,2,3,4} but NOT 5); component B: pair 10-11
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L)).toDF("a", "b")
    val got = GraphRank.hyperBall(edges, "a", "b", rounds = 3)
      .rowsSet
    val balls = Map(
      1L -> Set(1L, 2L, 3L, 4L), 2L -> Set(1L, 2L, 3L, 4L, 5L),
      3L -> Set(1L, 2L, 3L, 4L, 5L), 4L -> Set(1L, 2L, 3L, 4L, 5L),
      5L -> Set(2L, 3L, 4L, 5L),
      10L -> Set(10L, 11L), 11L -> Set(10L, 11L))
    val want = balls.map { case (n, ball) =>
      val (ns, sr, est) = expected(ball)
      Seq[Any](n, ns, sr, est)
    }.toSet
    assert(got == want)
  }

  test("hyperBallCurve: per-radius graph sums equal the hand-derived " +
    "per-node estimates over exact balls") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L)).toDF("a", "b")
    def ball(n: Long, t: Int): Set[Long] = {
      val adj = Map(1L -> Set(2L), 2L -> Set(1L, 3L), 3L -> Set(2L, 4L),
        4L -> Set(3L, 5L), 5L -> Set(4L), 10L -> Set(11L),
        11L -> Set(10L))
      var s = Set(n)
      (1 to t).foreach(_ => s = s ++ s.flatMap(adj))
      s
    }
    val nodes = Seq(1L, 2L, 3L, 4L, 5L, 10L, 11L)
    val want = (0 to 2).map { t =>
      val ests = nodes.map(n => expected(ball(n, t))._3)
      Seq[Any](t, nodes.size.toLong, ests.sum)
    }.toSet
    val got = GraphRank.hyperBallCurve(edges, "a", "b", rounds = 2)
      .rowsSet
    assert(got == want)
  }

  test("state codecs: every stateful operator's v1 payload round-trips " +
    "bit-exactly (variable-length rings, canonical maps, raw IEEE " +
    "doubles) and future versions fail loudly") {
    import graft.streaming.Streams._
    val sess = SessionState(10L, 99L, 7L, Double.NaN)
    val sessBack = SessionStateCodec.unwrap(SessionStateCodec.wrap(sess))
    assert(sessBack.start == 10L && sessBack.last == 99L &&
      sessBack.n == 7L &&
      java.lang.Double.doubleToRawLongBits(sessBack.sum) ==
        java.lang.Double.doubleToRawLongBits(Double.NaN),
      "doubles must survive as raw bits, NaN included")
    val thr = ThrottleState(-5L)
    assert(ThrottleStateCodec.unwrap(ThrottleStateCodec.wrap(thr)) == thr)
    val cus = CusumState(19L, 3L, 42L)
    assert(CusumStateCodec.unwrap(CusumStateCodec.wrap(cus)) == cus)
    val ew = EwmaState(Seq(DayCount(1L, 2L), DayCount(3L, 4L)), 5L, 6L)
    assert(EwmaStateCodec.unwrap(EwmaStateCodec.wrap(ew)) == ew)
    val ewEmpty = EwmaState(Nil, Long.MinValue, 0L)
    assert(EwmaStateCodec.unwrap(EwmaStateCodec.wrap(ewEmpty)) == ewEmpty)
    val hh = HHState(100L, Map("b" -> 2L, "a" -> 1L, "ü" -> 3L))
    assert(HHStateCodec.unwrap(HHStateCodec.wrap(hh)) == hh,
      "maps (incl. multi-byte UTF-8 keys) must round-trip")
    // canonical bytes: key order in the input map cannot change them
    assert(HHStateCodec.encode(hh).toSeq ==
      HHStateCodec.encode(HHState(100L,
        Map("ü" -> 3L, "a" -> 1L, "b" -> 2L))).toSeq)
    val e = intercept[IllegalStateException] {
      HHStateCodec.unwrap(StateEnvelope(9, HHStateCodec.encode(hh)))
    }
    assert(e.getMessage.contains("version 9"))
  }

  test("hyperBall: one round on an isolated pair merges exactly the " +
    "two nodes' own registers") {
    val edges = Seq((7L, 9L)).toDF("a", "b")
    val got = GraphRank.hyperBall(edges, "a", "b", rounds = 1).rowsSet
    val (ns, sr, est) = expected(Set(7L, 9L))
    assert(got == Set(Seq[Any](7L, ns, sr, est),
      Seq[Any](9L, ns, sr, est)))
  }

  test("hyperBall: the register ladder self-detects its fixed point — " +
    "a diameter-4 path at rounds=10 computes 5 merge rounds (4 growth " +
    "+ 1 confirming no-op), and the tail radii reuse the stable state " +
    "(r18 verdict #6)") {
    // path 1-2-3-4-5: every ball saturates by t=4 (the diameter)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
      .toDF("a", "b")
    val (ladder, computed) = GraphRank.hyperBallLadderWithRounds(
      edges, "a", "b", rounds = 10)
    assert(computed == 5,
      s"expected 4 growth rounds + 1 confirming round, got $computed")
    // the OUTPUT contract is untouched: one summary per t = 0..10,
    // and every radius >= 4 is the saturated state
    assert(ladder.map(_._1) == (0 to 10))
    val saturated = ladder(4)._2.rowsSet
    assert(saturated == ladder(10)._2.rowsSet &&
      saturated == ladder(5)._2.rowsSet,
      "post-fixed-point radii must equal the saturated state")
    // and saturation really is the full component for every node
    val (ns, sr, est) = expected(Set(1L, 2L, 3L, 4L, 5L))
    assert(saturated == Set(1L, 2L, 3L, 4L, 5L)
      .map(n => Seq[Any](n, ns, sr, est)))
  }
}
