package graft

import org.apache.spark.sql.functions._
import graft.expressions.UnicodeNormalize
import graft.functions.TextFns

class UnicodeNormalizeSpec extends SparkSpec {
  import spark.implicits._

  test("NFC composes combining marks: e+U+0301 equals precomposed U+00E9") {
    val decomposed = "cafe" + "\u0301" // e + combining acute accent
    val precomposed = "caf" + "\u00e9"
    assert(decomposed != precomposed) // different byte forms of one text
    val out = Seq((decomposed, precomposed)).toDF("a", "b")
      .select(UnicodeNormalize(col("a"), "NFC").as("na"), col("b"))
      .as[(String, String)].head()
    assert(out._1 == out._2)
  }

  test("NFKC folds compatibility forms: ligature, fullwidth, superscript") {
    // U+FB01 LATIN SMALL LIGATURE FI; U+FF26/FF55/FF4C/FF4C fullwidth
    // "Full"; U+00B2 superscript two
    val out = Seq(("\ufb01le", "\uff26\uff55\uff4c\uff4c", "x\u00b2"))
      .toDF("lig", "fw", "sup")
      .select(UnicodeNormalize(col("lig"), "NFKC"),
        UnicodeNormalize(col("fw"), "NFKC"),
        UnicodeNormalize(col("sup"), "NFKC"))
      .as[(String, String, String)].head()
    assert(out._1 == "file")
    assert(out._2 == "Full")
    assert(out._3 == "x2")
  }

  test("ASCII fast path returns input unchanged; NULL stays NULL") {
    val rows = Seq(Some("plain ascii text"), None).toDF("t")
      .select(col("t"), UnicodeNormalize(col("t"), "NFC").as("n"))
      .collect()
    assert(rows(0).getString(0) == rows(0).getString(1))
    assert(rows(1).isNullAt(1))
  }

  test("canonicalizeText strips zero-width/BOM, maps controls, collapses whitespace") {
    // BOM (U+FEFF) and zero-width space (U+200B) removed so "a"
    // joins "bc"; BEL (U+0007) becomes a space; tab/newline runs
    // collapse; result trimmed
    val dirty = "\uFEFFa\u200Bbc \u0007 d\te\n f "
    val clean = Seq(dirty).toDF("t")
      .select(TextFns.canonicalizeText(col("t"))).as[String].head()
    assert(clean == "abc d e f")
    // C1 controls (e.g. NEL U+0085) are Unicode Cc but NOT POSIX
    // \p{Cntrl} - the class must be \p{Cc} to catch them
    val c1 = Seq("x\u0085y").toDF("t")
      .select(TextFns.canonicalizeText(col("t"))).as[String].head()
    assert(c1 == "x y")
  }

  test("invalid form fails at plan construction, not per row") {
    intercept[IllegalArgumentException] {
      UnicodeNormalize(col("x"), "NFX")
    }
  }
}
