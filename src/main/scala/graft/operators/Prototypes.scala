package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.ExactRound

/** Per-label embedding prototypes — the class centroid + spread table
  * behind nearest-class-mean classification, dataset cartography, and
  * "is this labeled cluster coherent?" QA on an embedding-labeled
  * corpus. Components are quantized to e6 integer units FIRST
  * (one IEEE multiply + round per element, bit-identical across
  * engines), so the per-(label, dim) sums are exact integers and the
  * whole surface is rational: mean in e6 units (signed exact round),
  * spread as the exact population-variance numerator over n² (e12
  * units) — no float accumulation anywhere.
  *
  * Shape at scale: posexplode to (label, dim, unit) — rows × dims,
  * the unavoidable cost of exact per-dimension statistics — then ONE
  * map-side-combinable groupBy carrying (n, Σu, Σu²) mergeable state;
  * the variance numerator n·Σu²−(Σu)² needs no second pass (the q75
  * Pearson discipline). Output is |labels|·dims rows — broadcastable
  * downstream for nearest-prototype assignment. */
object Prototypes {

  def labelPrototypes(emb: DataFrame, vecCol: String,
      labelCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val units = emb
      .select(col(labelCol).cast("long").as("label"),
        posexplode(col(vecCol)).as(Seq("pos__", "x__")))
      .select(col("label"), (col("pos__") + 1).cast("long").as("dim"),
        round(col("x__").cast("double") * 1e6).cast("long").as("u__"))
    val sums = units.groupBy(col("label"), col("dim"))
      .agg(count(lit(1)).as("n"),
        sum(col("u__").cast(dec)).as("s__"),
        sum((col("u__").cast(dec) * col("u__")).cast(dec)).as("ss__"))
    sums.select(col("label"), col("dim"), col("n"),
      ExactRound.ratioScaledSigned(col("s__"), col("n"), 0)
        .as("mean_e6"),
      ExactRound.ratioScaledBig(
        col("n").cast(dec) * col("ss__") - col("s__") * col("s__"),
        col("n").cast(dec) * col("n"), 0).as("var_e12"))
  }

  /** Nearest-prototype confusion matrix — every vector assigned to its
    * closest class centroid by EXACT integer squared-L2 over the e6
    * units (ties broken by candidate label ascending), tallied against
    * its true label: the nearest-class-mean evaluation that tells you
    * whether a labeled embedding corpus is even linearly separable
    * before any model training. Diagonal rows = per-class purity.
    *
    * Shape at scale: the prototype table (|labels|·dims rows) comes
    * from [[labelPrototypes]] and BROADCASTS to the exploded unit
    * stream (join on dim only — each unit row meets |labels|
    * candidates, the unavoidable k-factor of NCM scoring); distances
    * reduce by (vec, candidate) in one map-side-combinable groupBy;
    * the argmin window partitions by vec (|labels| rows per
    * partition). */
  def prototypeConfusion(emb: DataFrame, idCol: String, vecCol: String,
      labelCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec = "decimal(38,0)"
    val protos = labelPrototypes(emb, vecCol, labelCol)
      .select(col("label").as("cand_label"), col("dim"), col("mean_e6"))
    val units = emb
      .select(col(idCol).as("vec__"),
        col(labelCol).cast("long").as("true_label"),
        posexplode(col(vecCol)).as(Seq("pos__", "x__")))
      .select(col("vec__"), col("true_label"),
        (col("pos__") + 1).cast("long").as("dim"),
        round(col("x__").cast("double") * 1e6).cast("long").as("u__"))
    val dists = units.join(broadcast(protos), "dim")
      .groupBy(col("vec__"), col("true_label"), col("cand_label"))
      .agg(sum(((col("u__") - col("mean_e6")).cast(dec) *
        (col("u__") - col("mean_e6"))).cast(dec)).as("dist2__"))
    val pick = Window.partitionBy(col("vec__"))
      .orderBy(col("dist2__").asc, col("cand_label").asc)
    dists
      .withColumn("rn__", row_number().over(pick))
      .filter(col("rn__") === 1)
      .groupBy(col("true_label"),
        col("cand_label").as("assigned_label"))
      .agg(count(lit(1)).as("n_vecs"))
  }

  /** Embedding-corpus QA — the sanity pass BEFORE any ANN index
    * build: per vector, its dimensionality, exact e12-unit squared
    * norm (sum of squared e6-quantized components — integer, so the
    * zero test is exact, not an epsilon), and the degenerate-vector
    * flags an index would choke on: `is_zero` (unnormalizable —
    * cosine undefined) and `is_empty` (no components at all). A
    * mixed-dimensionality corpus shows up as multiple n_dims values
    * downstream.
    *
    * Shape at scale: one explode + map-side-combinable groupBy(vec),
    * one left join back to keep empty vectors. */
  def embeddingQa(emb: DataFrame, idCol: String,
      vecCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val per = emb
      .select(col(idCol), explode(col(vecCol)).as("x__"))
      .select(col(idCol),
        round(col("x__").cast("double") * 1e6).cast("long").as("u__"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_dims"),
        sum((col("u__").cast(dec) * col("u__")).cast(dec)).cast("long")
          .as("norm2_e12"))
    emb.select(col(idCol))
      .join(per, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_dims"), lit(0L)).as("n_dims"),
        coalesce(col("norm2_e12"), lit(0L)).as("norm2_e12"))
      .withColumn("is_zero", col("norm2_e12") === 0L)
      .withColumn("is_empty", col("n_dims") === 0L)
  }
}
