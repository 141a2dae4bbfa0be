package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text primitives for the LLM-training-data operators (dedup, quality,
  * language-ID, fingerprinting). All built-in higher-order functions —
  * no UDFs, so everything stays codegen-compatible and shuffle-parallel.
  */
object TextFns {

  /** Whitespace tokenization (lowercased, multi-space safe). */
  def words(text: Column): Column =
    split(trim(regexp_replace(lower(text), "\\s+", " ")), " ")

  /** BPE-ish regex token stream: runs of letters, runs of digits, or a
    * single other non-space char — a deterministic stand-in for a
    * subword tokenizer's pre-tokenization. */
  def regexTokens(text: Column): Column =
    regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0))

  /** Document fingerprint: md5 of the whitespace-normalized, lowercased
    * text (SURVEY F8-adjacent; exact-dedup key). */
  def fingerprint(text: Column): Column =
    md5(trim(regexp_replace(lower(text), "\\s+", " ")))

  /** Training-corpus text canonicalization (the C4/Gopher cleaning
    * family): NFKC-normalize (fold compatibility forms — ﬁ → fi,
    * fullwidth → ASCII, ² → 2 — and compose combining marks so "é"
    * has ONE byte form before any hashing/dedup), drop zero-width
    * characters and BOMs, map remaining control characters (except
    * tab/newline, which whitespace-collapse absorbs) to spaces,
    * collapse whitespace, trim. The normalizer is the codegen'd
    * [[graft.expressions.UnicodeNormalize]] expression; everything
    * else is built-in regexp_replace. */
  def canonicalizeText(text: Column): Column = {
    val nfkc = graft.expressions.UnicodeNormalize(text, "NFKC")
    val noZeroWidth =
      regexp_replace(nfkc, "[\\u200B-\\u200D\\uFEFF\\u2060]", "")
    // \p{Cc} (Unicode category), NOT POSIX \p{Cntrl}: the latter is
    // ASCII-only and misses the C1 range (U+0080-U+009F, e.g. NEL)
    val noControl =
      regexp_replace(noZeroWidth, "[\\p{Cc}&&[^\\n\\t]]", " ")
    trim(regexp_replace(noControl, "\\s+", " "))
  }
}
