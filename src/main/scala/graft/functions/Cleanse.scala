package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar cleansing / parsing functions (SURVEY.md §2.8 F1-F12, §2.2 P2-P3).
  *
  * All of these compile to built-in Catalyst expressions — they stay inside
  * whole-stage codegen, unlike the reference's row-wise `df.apply` loops
  * (ref sectorscore.py:131-133, calfundamentalscore.py:256).
  */
object Cleanse {

  /** F1 `clean_and_convert` (ref sectorscore.py:64-70): unicode minus to
    * ASCII, strip %, thousands commas, unit suffixes (T/B INR), leading '+',
    * trim, then cast — CAST yields NULL on garbage, matching
    * `pd.to_numeric(errors='coerce')`.
    */
  def cleanNumber(c: Column): Column = {
    val ascii = regexp_replace(c, "−", "-") // unicode minus
    val stripped = regexp_replace(ascii, "[%,+]|\\s*[KMBT]?\\s*INR\\s*$", "")
    // try_cast, not cast: ANSI mode (Spark 4 default) makes CAST throw on
    // malformed input; the reference's errors='coerce' wants NULL.
    trim(stripped).try_cast("double")
  }

  /** F2 `clean_data` text normalizer (ref sectormerged_improved.py:115-148):
    * mojibake / unicode punctuation fixes, whitespace collapse, and a
    * conditional comma-strip applied only to numeric-looking strings.
    */
  def cleanText(c: Column): Column = {
    val fixes: Seq[(String, String)] = Seq(
      " " -> " ",      // nbsp
      "–" -> "-",      // en dash
      "—" -> "-",      // em dash
      "−" -> "-",      // unicode minus
      "â€™" -> "'", // mojibake apostrophe
      "â€“" -> "-", // mojibake en dash
      "‘" -> "'", "’" -> "'",
      "“" -> "\"", "”" -> "\"")
    val repaired = fixes.foldLeft(c) { case (col, (from, to)) =>
      regexp_replace(col, java.util.regex.Pattern.quote(from), to)
    }
    val collapsed = trim(regexp_replace(repaired, "\\s+", " "))
    val numericLooking = "^[\\d,]+\\.?\\d*\\s*[KMBT]?\\s*(INR|%)?$"
    when(collapsed.rlike(numericLooking), regexp_replace(collapsed, ",", ""))
      .otherwise(collapsed)
  }

  /** P2 `clean_value` (ref uploadtodb.py:126-138): NaN/±inf to NULL, round
    * doubles to 2dp. */
  def cleanDouble(c: Column): Column =
    when(isnan(c) || c === Double.PositiveInfinity || c === Double.NegativeInfinity, lit(null))
      .otherwise(round(c, 2))

  /** P2 string arm: trim, empty string to NULL. */
  def nullifEmpty(c: Column): Column = {
    val t = trim(c)
    when(length(t) === 0, lit(null)).otherwise(t)
  }

  /** P3 row-validity predicate (ref uploadtodb.py:172-174): key present and
    * non-blank. */
  def validKey(c: Column): Column = c.isNotNull && length(trim(c)) > 0

  /** F3 analyst-rating ordinal map (ref calcompositescore.py:100-109), with
    * the reference's fillna('Hold') → default 3. */
  def ratingOrdinal(c: Column): Column = {
    val m = Map(
      "Strong Buy" -> 5, "Strong buy" -> 5, "Buy" -> 4,
      "Hold" -> 3, "Neutral" -> 3, "Sell" -> 2,
      "Strong Sell" -> 1, "Strong sell" -> 1)
    val mapped = m.foldLeft(lit(null).cast("int")) { case (acc, (k, v)) =>
      when(c === k, lit(v)).otherwise(acc)
    }
    coalesce(mapped, lit(3))
  }

  /** F4 relative-difference feature (ref calcompositescore.py:112-137):
    * (x - price)/price, 0 when price == 0. */
  def relDiff(x: Column, price: Column): Column =
    when(price =!= 0 && price.isNotNull, (x - price) / price).otherwise(lit(0.0))

  /** F5 MACD histogram (ref calcompositescore.py:139). */
  def macdHistogram(level: Column, signal: Column): Column =
    coalesce(level, lit(0.0)) - coalesce(signal, lit(0.0))

  /** F6 metric cap (ref calfundamentalscore.py:84-88): clip upper. */
  def capAt(c: Column, cap: Double): Column = least(c, lit(cap))

  /** F8 md5 surrogate key (ref newsflow_scraper.py:297-299):
    * 'tv_' + md5(url)[:20]. */
  def surrogateKey(c: Column): Column =
    concat(lit("tv_"), substring(md5(c.cast("string")), 1, 20))

  /** F10 scaled-integer codec (ref volatility_helper bytecode, scale=1000). */
  def volEncode(c: Column): Column = round(c * 1000).cast("long")
  def volDecode(c: Column): Column = c.cast("double") / lit(1000.0)

  /** F11 truncation (ref newsflow_scraper.py:303-304). */
  def truncateTo(c: Column, n: Int): Column = substring(c, 1, n)
}
