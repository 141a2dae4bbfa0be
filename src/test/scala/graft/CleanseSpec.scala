package graft

import org.apache.spark.sql.functions._
import graft.functions.Cleanse

class CleanseSpec extends SparkSpec {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column): Any =
    Seq(1).toDF("x").select(c.as("r")).collect()(0).get(0)

  test("cleanNumber parses unicode minus, percent, commas, unit suffixes") {
    assert(one(Cleanse.cleanNumber(lit("−12.5%"))) == -12.5)
    assert(one(Cleanse.cleanNumber(lit("1,234.5"))) == 1234.5)
    assert(one(Cleanse.cleanNumber(lit("2.5T INR"))) == 2.5)
    assert(one(Cleanse.cleanNumber(lit("+7"))) == 7.0)
    assert(one(Cleanse.cleanNumber(lit(" 3.25 "))) == 3.25)
    assert(one(Cleanse.cleanNumber(lit("garbage"))) == null)
    assert(one(Cleanse.cleanNumber(lit(""))) == null)
  }

  test("cleanText fixes mojibake, collapses whitespace, strips commas only from numerics") {
    assert(one(Cleanse.cleanText(lit("â€™hello  –  world"))) == "'hello - world")
    assert(one(Cleanse.cleanText(lit("1,234.5"))) == "1234.5")
    assert(one(Cleanse.cleanText(lit("a,b"))) == "a,b") // non-numeric: commas kept
    assert(one(Cleanse.cleanText(lit("  x\t y \n z "))) == "x y z")
  }

  test("cleanDouble nulls NaN/inf and rounds to 2dp") {
    assert(one(Cleanse.cleanDouble(lit(Double.NaN))) == null)
    assert(one(Cleanse.cleanDouble(lit(Double.PositiveInfinity))) == null)
    assert(one(Cleanse.cleanDouble(lit(Double.NegativeInfinity))) == null)
    assert(one(Cleanse.cleanDouble(lit(1.2345))) == 1.23)
    assert(one(Cleanse.cleanDouble(lit(1.235))) == 1.24) // HALF_UP
  }

  test("nullifEmpty and validKey") {
    assert(one(Cleanse.nullifEmpty(lit("  "))) == null)
    assert(one(Cleanse.nullifEmpty(lit(" a "))) == "a")
    assert(one(when(Cleanse.validKey(lit("")), 1).otherwise(0)) == 0)
    assert(one(when(Cleanse.validKey(lit("SYM")), 1).otherwise(0)) == 1)
  }

  test("ratingOrdinal maps both casings with default 3") {
    assert(one(Cleanse.ratingOrdinal(lit("Strong Buy"))) == 5)
    assert(one(Cleanse.ratingOrdinal(lit("Strong buy"))) == 5)
    assert(one(Cleanse.ratingOrdinal(lit("Buy"))) == 4)
    assert(one(Cleanse.ratingOrdinal(lit("Neutral"))) == 3)
    assert(one(Cleanse.ratingOrdinal(lit("Sell"))) == 2)
    assert(one(Cleanse.ratingOrdinal(lit("Strong sell"))) == 1)
    assert(one(Cleanse.ratingOrdinal(lit("???"))) == 3)
    assert(one(Cleanse.ratingOrdinal(lit(null).cast("string"))) == 3)
  }

  test("relDiff guards zero price; macdHistogram fills nulls") {
    assert(one(Cleanse.relDiff(lit(110.0), lit(100.0))) == 0.1
      || math.abs(one(Cleanse.relDiff(lit(110.0), lit(100.0))).asInstanceOf[Double] - 0.1) < 1e-12)
    assert(one(Cleanse.relDiff(lit(5.0), lit(0.0))) == 0.0)
    assert(one(Cleanse.relDiff(lit(5.0), lit(null).cast("double"))) == 0.0)
    assert(one(Cleanse.macdHistogram(lit(2.5), lit(null).cast("double"))) == 2.5)
    assert(one(Cleanse.macdHistogram(lit(null).cast("double"), lit(1.0))) == -1.0)
  }

  test("volatility codec roundtrip at scale 1000") {
    assert(one(Cleanse.volEncode(lit(6.476))) == 6476L)
    assert(one(Cleanse.volDecode(lit(6476L))) == 6.476)
  }

  test("capAt clips upper bound; surrogateKey shape; truncateTo") {
    assert(one(Cleanse.capAt(lit(5.0), 3.0)) == 3.0)
    assert(one(Cleanse.capAt(lit(2.0), 3.0)) == 2.0)
    val k = one(Cleanse.surrogateKey(lit("http://x/y"))).asInstanceOf[String]
    assert(k.startsWith("tv_") && k.length == 23)
    assert(one(Cleanse.truncateTo(lit("abcdef"), 3)) == "abc")
  }
}
