package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for dataset curation: reproducible downsampling
  * and train/val/test splits keyed on a hash of the row's id, NOT an RNG.
  *
  * `df.sample()` draws from a seeded RNG over the current partitioning —
  * re-partition the input and the sample changes, which makes pipeline
  * reruns unreproducible and train/eval splits unauditable. Hashing the
  * KEY instead gives the same decision for the same row everywhere: a
  * pure filter/projection (no shuffle, pushdown-friendly, codegen'd),
  * stable across partitionings, cluster sizes, and engines — the md5
  * prefix math reproduces bit-identically in the DuckDB oracle (same
  * digest of the same key string; cf. the q20 surrogate key).
  *
  * Rates are expressed in 256ths via the first two hex digits of
  * md5(key): digit-string comparison over lowercase hex is order-
  * isomorphic to the numeric value, so `prefix < "40"` keeps exactly the
  * 64/256 of key-space hashing below 0x40 — in expectation 25% of rows,
  * exact per key. */
object Sampling {

  private def prefix(key: Column): Column =
    substring(md5(key.cast("string")), 1, 2)

  private def hexThreshold(rate256: Int): String = f"$rate256%02x"

  /** Keep rows whose key hashes under `rate256`/256 — a reproducible
    * ~`rate256/256` sample (exact membership per key, binomial count).
    * NULL keys are always excluded, at every rate including 256/256 —
    * a null id cannot be given a stable decision, and silently flipping
    * between kept (full rate, where the hash is never consulted) and
    * dropped (any partial rate, where the null predicate filters) would
    * make the sample discontinuous in the rate. */
  def hashSample(df: DataFrame, keyCol: String, rate256: Int): DataFrame = {
    require(rate256 >= 0 && rate256 <= 256, "rate256 in [0, 256]")
    val nonNull = col(keyCol).isNotNull
    if (rate256 == 256) df.filter(nonNull)
    else df.filter(nonNull &&
      prefix(col(keyCol)) < lit(hexThreshold(rate256)))
  }

  /** Stratified sample with EXACT per-stratum quotas: within each
    * stratum, keep the `k` rows whose key hashes smallest — i.e.
    * min(k, |stratum|) rows, deterministically, the same rows on every
    * rerun, repartition, and engine. Quota sampling by RNG gives the
    * right COUNT but different MEMBERS each run; hash-order selection
    * gives both, and composes with the other hash-keyed curation ops
    * (the same doc is consistently in or out across pipeline stages).
    *
    * Two-phase selection, because the obvious single window
    * (PARTITION BY stratum) shuffles the ENTIRE corpus into one task
    * per stratum — with a handful of language strata at corpus scale
    * that is a few reducers doing all the work:
    *   1. per input partition, keep each stratum's local top-k by hash
    *      (window keyed by (stratum, partition-id) — as many groups as
    *      tasks × strata, well distributed). Any row in the global
    *      top-k is necessarily in its partition's top-k, so phase 1
    *      never discards a winner; the nondeterministic partition-id
    *      only shapes the CANDIDATE set, never the result.
    *   2. the exact per-stratum window over the surviving ≤ k·P rows
    *      per stratum — bounded, skew-free.
    *
    * Ordering is (md5(key), key): the hex digest is engine-agnostic and
    * the raw key breaks the (vanishingly unlikely) digest tie. NULL
    * keys are excluded as in [[hashSample]]; a NULL stratum is its own
    * stratum (SQL PARTITION BY semantics — a real pipeline wants the
    * "language unknown" bucket sampled too, not silently dropped). */
  def stratifiedSample(df: DataFrame, stratumCol: String, keyCol: String,
      k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    import org.apache.spark.sql.expressions.Window
    val h = md5(col(keyCol).cast("string"))
    val base = df.filter(col(keyCol).isNotNull)
    val w1 = Window.partitionBy(col(stratumCol), col("pid__"))
      .orderBy(h.asc, col(keyCol).asc)
    val cand = base.withColumn("pid__", spark_partition_id())
      .withColumn("rn__", row_number().over(w1))
      .filter(col("rn__") <= k).drop("rn__", "pid__")
    val w2 = Window.partitionBy(col(stratumCol)).orderBy(h.asc, col(keyCol).asc)
    cand.withColumn("rn__", row_number().over(w2))
      .filter(col("rn__") <= k).drop("rn__")
  }

  /** Assign each row a deterministic split label from consecutive
    * key-space bands: `weights` in 256ths (must sum to 256), one label
    * per weight. The same key always lands in the same split — across
    * reruns, repartitions, and engines — which is the property a
    * train/val/test separation must have to prevent leakage. A NULL key
    * gets a NULL split, never a silent default label: md5(null) is null,
    * so every band predicate would fall through to the last label and
    * quietly skew exactly the separation this operator exists to make
    * auditable. */
  def splitByHash(df: DataFrame, keyCol: String,
      weights: Seq[Int], labels: Seq[String],
      outCol: String = "split"): DataFrame = {
    require(weights.nonEmpty && weights.size == labels.size,
      "one label per weight")
    require(weights.forall(_ > 0) && weights.sum == 256,
      "weights are 256ths and must sum to 256")
    val cuts = weights.scanLeft(0)(_ + _).tail.init // cumulative, last open
    val p = prefix(col(keyCol))
    val banded = cuts.zip(labels.init).foldRight(lit(labels.last): Column) {
      case ((cut, label), acc) =>
        when(p < lit(hexThreshold(cut)), lit(label)).otherwise(acc)
    }
    df.withColumn(outCol,
      when(col(keyCol).isNotNull, banded).otherwise(lit(null).cast("string")))
  }
}
