package graft

import org.apache.spark.sql.functions._
import graft.expressions.WordNGrams
import graft.functions.TextFns

class WordNGramsSpec extends SparkSpec {
  import spark.implicits._

  test("distinct grams match the window-lead formulation") {
    val df = Seq(
      (1L, "the cat sat on the mat the cat sat"),
      (2L, "a b"),
      (3L, "one two three"),
      (4L, ""),
      (5L, "  spaced   Out   TEXT  ")
    ).toDF("doc_id", "text")

    // reference formulation: posexplode + doc window + lead (the shape
    // explodedShingles used before the native expression)
    import org.apache.spark.sql.expressions.Window
    val toks = df.select(col("doc_id").as("doc"),
      posexplode(TextFns.words(col("text"))).as(Seq("pos", "w0")))
    val w = Window.partitionBy(col("doc")).orderBy(col("pos"))
    val expected = toks
      .select(col("doc"), col("w0"),
        lead(col("w0"), 1).over(w).as("w1"),
        lead(col("w0"), 2).over(w).as("w2"))
      .filter(col("w2").isNotNull)
      .select(col("doc"), concat_ws(" ", col("w0"), col("w1"), col("w2")).as("shingle"))
      .distinct()
      .as[(Long, String)].collect().toSet

    val actual = df.select(col("doc_id").as("doc"),
        explode(WordNGrams.distinctGrams(TextFns.words(col("text")), 3)).as("shingle"))
      .as[(Long, String)].collect().toSet

    assert(actual === expected)
  }

  test("allGrams keeps repeats in order; short/empty arrays yield empty") {
    val out = spark.range(1)
      .select(WordNGrams.allGrams(
        split(lit("x y x y"), " "), 2).as("g"))
      .as[Seq[String]].head()
    assert(out === Seq("x y", "y x", "x y"))
    val empty = spark.range(1)
      .select(WordNGrams.allGrams(split(lit("only"), " "), 2).as("g"))
      .as[Seq[String]].head()
    assert(empty === Seq.empty)
  }

  test("null token array yields null") {
    val out = spark.range(1)
      .select(WordNGrams.distinctGrams(
        lit(null).cast("array<string>"), 2).as("g"))
      .collect()(0)
    assert(out.isNullAt(0))
  }
}
