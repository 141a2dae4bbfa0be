package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.VectorFns

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * `bruteForceTopK` is the exact baseline: broadcast the (single) query
  * vector, compute cosine per row, TakeOrderedAndProject for top-k — one
  * pass over the data, no shuffle beyond the final k-row merge, scales to
  * any corpus size that can be scanned.
  *
  * `lshTopK` is the scale path: random-hyperplane LSH buckets both sides;
  * only rows sharing a bucket with the query are scored. With b-bit
  * signatures split into `bands` sub-keys, recall degrades gracefully and
  * the scan reduces to the bucketed fraction. An IVF analog falls out of
  * the same shape with k-means centroid ids as the bucket key.
  */
object SimilaritySearch {

  /** Exact top-k by cosine against the embedding of `queryId`.
    * Ordering is pinned on (round(cos,6) desc, id asc) so results are
    * deterministic under floating-point reassociation. */
  def bruteForceTopK(df: DataFrame, idCol: String, vecCol: String,
      queryId: Long, k: Int): DataFrame = {
    val q = df.filter(col(idCol) === queryId)
      .select(col(vecCol).as("q_vec"))
    val scored = df.filter(col(idCol) =!= queryId)
      .crossJoin(broadcast(q))
      .withColumn("cosine", VectorFns.cosine(col(vecCol), col("q_vec")))
    scored
      .orderBy(round(col("cosine"), 6).desc, col(idCol).asc)
      .limit(k)
      .select(col(idCol), round(col("cosine"), 4).as("cosine"))
  }

  /** LSH-bucketed ANN: score only rows whose hyperplane signature shares
    * at least one band with the query's. */
  def lshTopK(df: DataFrame, idCol: String, vecCol: String,
      queryId: Long, k: Int, bits: Int = 16, bands: Int = 4): DataFrame = {
    val chunk = bits / bands
    val sig = df.select(col(idCol), col(vecCol),
      VectorFns.hyperplaneSignature(col(vecCol), bits).as("sig"))
    val banded = sig.select(col(idCol), col(vecCol),
      posexplode(array((0 until bands).map(b =>
        xxhash64(lit(b), concat_ws("", slice(col("sig"), b * chunk + 1, chunk)
          .cast("array<string>")))): _*)).as(Seq("band", "bkey")))
    val q = banded.filter(col(idCol) === queryId)
      .select(col("band"), col("bkey"), col(vecCol).as("q_vec"))
    val candidates = banded.filter(col(idCol) =!= queryId)
      .join(broadcast(q), Seq("band", "bkey"))
      .dropDuplicates(idCol)
    candidates
      .withColumn("cosine", VectorFns.cosine(col(vecCol), col("q_vec")))
      .orderBy(round(col("cosine"), 6).desc, col(idCol).asc)
      .limit(k)
      .select(col(idCol), round(col("cosine"), 4).as("cosine"))
  }

  /** Embedding-cosine near-dup pairs among ALL rows (id_a < id_b,
    * cosine >= threshold) — LSH-bucketed so no full cross product:
    * pairs are generated only within shared (band, bkey) buckets, then
    * verified exactly. */
  def embeddingNearDup(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, bits: Int = 16, bands: Int = 4): DataFrame = {
    val chunk = bits / bands
    val banded = df.select(col(idCol).as("id"), col(vecCol).as("vec"),
        VectorFns.hyperplaneSignature(col(vecCol), bits).as("sig"))
      .select(col("id"), col("vec"),
        posexplode(array((0 until bands).map(b =>
          xxhash64(lit(b), concat_ws("", slice(col("sig"), b * chunk + 1, chunk)
            .cast("array<string>")))): _*)).as(Seq("band", "bkey")))
      .persist() // both sides of the bucket self-join

    val a = banded.as("a")
    val b = banded.as("b")
    a.join(b, col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.vec").as("vec_a"), col("b.vec").as("vec_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("cosine", VectorFns.cosine(col("vec_a"), col("vec_b")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cosine"), 4).as("cosine"))
  }
}
