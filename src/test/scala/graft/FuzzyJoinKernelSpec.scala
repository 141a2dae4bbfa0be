package graft

import org.apache.spark.sql.functions._
import graft.expressions.GraftExpressions

/** The Myers bit-parallel kernel must be a DROP-IN for the builtin
  * `levenshtein(l, r, k)` — same value within the threshold, same −1
  * sentinel past it — because FuzzyJoin's gated outputs carry the
  * kernel's value verbatim. Fuzzed here against the builtin across
  * the fast path (ASCII ≤64 bytes), both fallbacks (non-ASCII,
  * >64 bytes), and the adversarial shapes (equal strings, empty,
  * transpositions, shared prefixes/suffixes). */
class FuzzyJoinKernelSpec extends SparkSpec {
  import spark.implicits._

  private def compare(pairs: Seq[(String, String)], k: Int): Unit = {
    val df = pairs.toDF("a", "b")
    val rows = df.select(
        levenshtein(col("a"), col("b"), k).as("builtin"),
        GraftExpressions.levenshtein_within(col("a"), col("b"), k)
          .as("kernel"),
        col("a"), col("b"))
      .collect()
    rows.foreach { r =>
      assert(r.getInt(0) == r.getInt(1),
        s"k=$k '${r.getString(2)}' vs '${r.getString(3)}': " +
          s"builtin ${r.getInt(0)} != kernel ${r.getInt(1)}")
    }
  }

  test("seeded ASCII fuzz agrees with the builtin at k = 1..4") {
    val rnd = new scala.util.Random(20260819L)
    val alpha = "abcdefgh "
    def word(n: Int): String =
      (0 until n).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    val pairs = (0 until 2000).map { _ =>
      val a = word(1 + rnd.nextInt(40))
      // half the pairs are EDITS of a (the near-match population the
      // join keeps), half independent draws (the reject population)
      val b =
        if (rnd.nextBoolean()) {
          val edits = 1 + rnd.nextInt(4)
          var s = a
          (0 until edits).foreach { _ =>
            val i = rnd.nextInt(s.length + 1)
            rnd.nextInt(3) match {
              case 0 => s = s.take(i) + alpha(rnd.nextInt(9)) + s.drop(i)
              case 1 if s.nonEmpty =>
                val j = rnd.nextInt(s.length); s = s.take(j) + s.drop(j + 1)
              case _ if s.nonEmpty =>
                val j = rnd.nextInt(s.length)
                s = s.take(j) + alpha(rnd.nextInt(9)) + s.drop(j + 1)
              case _ => ()
            }
          }
          s
        } else word(1 + rnd.nextInt(40))
      (a, b)
    }
    (1 to 4).foreach(k => compare(pairs, k))
  }

  test("adversarial shapes: equal, empty, transposed, shared affixes") {
    val pairs = Seq(
      ("", ""), ("", "abc"), ("abc", ""),
      ("abc", "abc"), ("ab", "ba"), ("abcd", "abdc"),
      ("prefix common tail x", "prefix common tail y"),
      ("x same suffix here", "y same suffix here"),
      ("aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa",
        "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaab"))
    (1 to 3).foreach(k => compare(pairs, k))
  }

  test("fallback paths: non-ASCII and >64-byte inputs still match") {
    val long = "z" * 70
    val pairs = Seq(
      ("café", "cafe"), ("naïve", "naive"), ("日本語", "日本誤"),
      (long, long.dropRight(2) + "xy"), (long, "z" * 68),
      ("short", long))
    (1 to 3).foreach(k => compare(pairs, k))
  }
}
