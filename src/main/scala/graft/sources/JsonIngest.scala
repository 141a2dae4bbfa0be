package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** JSON-lines ingestion — the scrape/export feed shape the CSV path
  * (CsvIngest) does not cover: one JSON object per record, parsed
  * with an explicit schema and PERMISSIVE corrupt-record handling
  * (a malformed line yields a NULL struct and an `is_corrupt` flag
  * instead of failing the batch — production feeds always carry a
  * few truncated lines).
  *
  * Shape at scale: `from_json` is a codegen'd per-row parse inside
  * the scan projection — no shuffle, no driver involvement; the
  * corrupt flag is a null-check on the parsed struct. */
object JsonIngest {

  /** Parse `raw` (a JSON object string) against `schemaDdl` (e.g.
    * "k LONG, n STRING"); emits every schema field plus `is_corrupt`.
    * PERMISSIVE-mode reality (pinned against Spark 4): a malformed
    * record yields a NON-null struct whose fields are ALL null — the
    * struct-level null check a naive flag would use never fires — so
    * corruption is detected through `requiredField`, a field the
    * feed's contract guarantees non-null in every well-formed record
    * (the primary key). */
  def parseRecords(df: DataFrame, raw: Column, schemaDdl: String,
      requiredField: String): DataFrame = {
    val parsed = from_json(raw, schemaDdl,
      Map("mode" -> "PERMISSIVE"))
    df.withColumn("graft_parsed__", parsed)
      .withColumn("is_corrupt",
        col(s"graft_parsed__.$requiredField").isNull)
      .select(df.columns.map(col) ++
        Seq(col("graft_parsed__.*"), col("is_corrupt")): _*)
  }
}
