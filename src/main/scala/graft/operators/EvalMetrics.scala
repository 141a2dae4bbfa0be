package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Classification-quality metrics from a CONFUSION TABLE — per class,
  * tp/fp/fn plus precision/recall/F1 as exact e6-scaled integers: the
  * eval sheet a labeler/classifier run ends with, derived from any
  * (true, predicted, count) tally (e.g. the nearest-class-mean
  * confusion of q133). F1 reduces to the single rational
  * 2·tp / (n_true + n_pred) (= 2tp/(2tp+fp+fn)), so no intermediate
  * rounding compounds.
  *
  * Shape at scale: the confusion table is |classes|² rows at most —
  * driver-trivial by construction; everything here is three
  * aggregates over it and broadcast-sized joins. */
object EvalMetrics {

  def classMetrics(confusion: DataFrame, trueCol: String,
      predCol: String, nCol: String): DataFrame = {
    val classes = confusion.select(col(trueCol).as("label"))
      .union(confusion.select(col(predCol).as("label"))).distinct()
    val tp = confusion.filter(col(trueCol) === col(predCol))
      .groupBy(col(trueCol).as("label"))
      .agg(sum(col(nCol)).as("tp__"))
    val tc = confusion.groupBy(col(trueCol).as("label"))
      .agg(sum(col(nCol)).as("n_true__"))
    val pc = confusion.groupBy(col(predCol).as("label"))
      .agg(sum(col(nCol)).as("n_pred__"))
    classes
      .join(tp, Seq("label"), "left")
      .join(tc, Seq("label"), "left")
      .join(pc, Seq("label"), "left")
      .select(col("label"),
        coalesce(col("tp__"), lit(0L)).as("tp"),
        (coalesce(col("n_pred__"), lit(0L)) -
          coalesce(col("tp__"), lit(0L))).as("fp"),
        (coalesce(col("n_true__"), lit(0L)) -
          coalesce(col("tp__"), lit(0L))).as("fn"),
        coalesce(col("n_true__"), lit(0L)).as("n_true"),
        coalesce(col("n_pred__"), lit(0L)).as("n_pred"))
      .select(col("label"), col("tp"), col("fp"), col("fn"),
        col("n_true"), col("n_pred"),
        graft.functions.ExactRound.ratioScaled(col("tp"),
          col("n_pred"), 6).as("precision_e6"),
        graft.functions.ExactRound.ratioScaled(col("tp"),
          col("n_true"), 6).as("recall_e6"),
        graft.functions.ExactRound.ratioScaled(col("tp") * 2,
          col("n_true") + col("n_pred"), 6).as("f1_e6"))
  }
}
