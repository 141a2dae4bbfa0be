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
