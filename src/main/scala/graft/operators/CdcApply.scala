package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Change-data-capture apply — materialize the current snapshot from a
  * base table plus an upsert/delete log: the consumer side of every
  * CDC feed (Debezium-shaped logs, the reference's daily re-upload
  * re-derived as a log instead of a blind overwrite —
  * `uploadtodb.py:159-198` is the producer this replaces). Per key the
  * LATEST log entry wins (`seqCol` descending, `opCol` ascending as
  * the documented tie-break): `U` upserts the payload (insert if the
  * key is new), `D` deletes the key; keys without log entries pass
  * through unchanged.
  *
  * Shape at scale: the latest-entry pick is one per-key window over
  * the log (log partitions are per-key tiny); the apply is ONE
  * full-outer join on the key — base arrives once, never rescanned
  * per log batch; at fleet scale the log side is the small one and
  * AQE broadcasts it. */
object CdcApply {

  /** `base` must carry (`keyCol`, payloadCols...); `log` must carry
    * (`keyCol`, `seqCol`, `opCol` ∈ {"U","D"}, payloadCols...).
    * Returns the post-apply snapshot with `base`'s schema. */
  def applyLog(base: DataFrame, log: DataFrame, keyCol: String,
      seqCol: String, opCol: String,
      payloadCols: Seq[String]): DataFrame = {
    require(payloadCols.nonEmpty, "need at least one payload column")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(seqCol).desc, col("op__").asc)
    val latest = log
      .select(Seq(col(keyCol), col(seqCol), col(opCol).as("op__")) ++
        payloadCols.map(c => col(c).as(s"l_$c")): _*)
      .withColumn("rn__", row_number().over(w))
      .filter(col("rn__") === 1)
      .drop("rn__", seqCol)
    base.join(latest, Seq(keyCol), "full_outer")
      .filter(col("op__").isNull || col("op__") =!= "D")
      .select(col(keyCol) +: payloadCols.map(c =>
        when(col("op__") === "U", col(s"l_$c")).otherwise(col(c))
          .as(c)): _*)
  }
}
