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

  /** Distinct word n-gram shingles, e.g. n=3 for near-dup detection.
    * Empty when the document has < n words. */
  def shingles(text: Column, n: Int): Column = {
    val w = words(text)
    val count = size(w) - (n - 1)
    val parts = (0 until n)
    array_distinct(
      when(count <= 0, array().cast("array<string>")).otherwise(
        transform(sequence(lit(1), greatest(count, lit(1))),
          i => concat_ws(" ", parts.map(p => element_at(w, i + p)): _*))))
  }

  /** MinHash signature of a shingle set: sig[j] = min over shingles of
    * xxhash64(j, shingle), j in [0, k). Deterministic, seedable purely by
    * the lane index. Empty shingle set -> Long.MaxValue lanes. */
  def minhashSignature(shingleArr: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)), j =>
      coalesce(array_min(transform(shingleArr, s => xxhash64(j, s))),
        lit(Long.MaxValue)))

  /** LSH band keys from a minhash signature: `bands` hashes, each over
    * `rowsPerBand` consecutive lanes. */
  def bandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map(b =>
      xxhash64(lit(b), concat_ws(",",
        slice(sig, b * rowsPerBand + 1, rowsPerBand).cast("array<string>")))): _*)

  /** 64-bit SimHash over a token array: per bit, sum +1/-1 by token-hash
    * bit, fingerprint bit = sign. Returned as array<int> of 64 bits
    * (1/0), MSB-agnostic — use `simhashBandKeys` for bucketing. */
  def simhashBits(tokens: Column): Column = {
    val votes = aggregate(
      tokens,
      array_repeat(lit(0), 64),
      (acc, t) => zip_with(acc,
        array((0 until 64).map(b =>
          when(shiftright(xxhash64(t), b).bitwiseAND(1) === 1, 1).otherwise(-1)): _*),
        (a, v) => a + v))
    transform(votes, v => when(v > 0, 1).otherwise(0))
  }

  /** Band a 64-bit simhash into `bands` chunk keys for candidate
    * generation (docs within hamming distance d < bands share >= 1 exact
    * chunk by pigeonhole). */
  def simhashBandKeys(bits: Column, bands: Int): Column = {
    val chunk = 64 / bands
    array((0 until bands).map(b =>
      xxhash64(lit(b), concat_ws("",
        slice(bits, b * chunk + 1, chunk).cast("array<string>")))): _*)
  }

  /** Hamming distance between two bit arrays. */
  def hamming(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => when(x =!= y, 1).otherwise(0)),
      lit(0), (acc, v) => acc + v)

  /** Document fingerprint: md5 of the whitespace-normalized, lowercased
    * text (SURVEY F8-adjacent; exact-dedup key). */
  def fingerprint(text: Column): Column =
    md5(trim(regexp_replace(lower(text), "\\s+", " ")))
}
