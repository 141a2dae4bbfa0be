package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media (image/audio/video) travels as an
  * opaque `binary` column with typed metadata alongside. The decode /
  * feature-extract step runs per-partition over iterator batches — the
  * Scala analog of `mapInPandas` — so a real decoder (JNI / native lib)
  * would slot in without changing the plan shape: narrow map, no shuffle,
  * batch-at-a-time memory footprint.
  *
  * The actual byte→pixels decode is STUBBED (this container has no media
  * libraries): `stubDecode` derives deterministic fake features from the
  * payload bytes. The Spark-side contract — schema, partitioning, batch
  * iteration, null-safety — is real and oracle-tested.
  */
object Multimodal {

  val featureSchema: StructType = StructType(Seq(
    StructField("byte_len", LongType, nullable = false),
    StructField("first_byte", IntegerType, nullable = true),
    StructField("last_byte", IntegerType, nullable = true),
    StructField("fake_width", IntegerType, nullable = false),
    StructField("fake_height", IntegerType, nullable = false)))

  /** STUB decoder: a real implementation would parse the container format
    * here. Deterministic on the payload so the oracle can reproduce it. */
  def stubDecode(payload: Array[Byte]): Row = {
    val len = payload.length.toLong
    val first = if (payload.nonEmpty) payload(0) & 0xff else null
    val last = if (payload.nonEmpty) payload(payload.length - 1) & 0xff else null
    Row(len,
      first.asInstanceOf[Any],
      last.asInstanceOf[Any],
      (1 + len % 64).toInt, (1 + len % 48).toInt)
  }

  /** STUB resize: a real implementation would decode, scale to
    * (w, h), and re-encode; the stub derives a deterministic payload of
    * the target "pixel" count from the input bytes so downstream schema
    * and sizing logic are real. */
  def stubResize(payload: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val out = new Array[Byte](w * h)
    if (payload.nonEmpty) {
      var i = 0
      while (i < out.length) { out(i) = payload(i % payload.length); i += 1 }
    }
    out
  }

  /** STUB frame sampling: a real implementation would demux a video
    * container and decode every `stride`-th frame; the stub slices the
    * payload into `frameLen`-byte pseudo-frames and keeps every
    * `stride`-th. Returns (frame_idx, frame_bytes) pairs. */
  def stubFrameSample(payload: Array[Byte], frameLen: Int,
      stride: Int): Seq[(Int, Array[Byte])] = {
    if (payload.isEmpty || frameLen <= 0) Seq.empty
    else (0 until payload.length / frameLen by math.max(1, stride)).map { f =>
      f -> payload.slice(f * frameLen, (f + 1) * frameLen)
    }
  }

  /** Resize pipeline: (id, payload) -> (id, resized payload, w, h) via
    * per-partition iteration — same plan shape as `extractFeatures`. */
  def resize(df: DataFrame, idCol: String, payloadCol: String,
      w: Int, h: Int): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false)))
    val idIdx = df.schema.fieldIndex(idCol)
    val pIdx = df.schema.fieldIndex(payloadCol)
    val rdd = df.rdd.mapPartitions(_.map { row =>
      val payload =
        if (row.isNullAt(pIdx)) Array.empty[Byte] else row.getAs[Array[Byte]](pIdx)
      Row(row.getLong(idIdx), stubResize(payload, w, h), w, h)
    })
    spark.createDataFrame(rdd, outSchema)
  }

  /** Frame-sample pipeline: one output row per kept frame — the
    * explode-shaped multimodal op (id, frame_idx, frame). */
  def frameSample(df: DataFrame, idCol: String, payloadCol: String,
      frameLen: Int, stride: Int): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("frame", BinaryType, nullable = false)))
    val idIdx = df.schema.fieldIndex(idCol)
    val pIdx = df.schema.fieldIndex(payloadCol)
    val rdd = df.rdd.mapPartitions(_.flatMap { row =>
      val payload =
        if (row.isNullAt(pIdx)) Array.empty[Byte] else row.getAs[Array[Byte]](pIdx)
      stubFrameSample(payload, frameLen, stride).map { case (f, bytes) =>
        Row(row.getLong(idIdx), f, bytes)
      }
    })
    spark.createDataFrame(rdd, outSchema)
  }

  /** Attach a binary payload column + extract features per partition.
    * `idCol` long id, `payloadCol` binary. Output: id + featureSchema. */
  def extractFeatures(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(
      StructField(idCol, LongType, nullable = false) +: featureSchema.fields.toSeq)
    val idIdx = df.schema.fieldIndex(idCol)
    val pIdx = df.schema.fieldIndex(payloadCol)
    val rdd = df.rdd.mapPartitions { it =>
      it.map { row =>
        val id = row.getLong(idIdx)
        val payload =
          if (row.isNullAt(pIdx)) Array.empty[Byte] else row.getAs[Array[Byte]](pIdx)
        val f = stubDecode(payload)
        Row.fromSeq(id +: f.toSeq)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }
}
