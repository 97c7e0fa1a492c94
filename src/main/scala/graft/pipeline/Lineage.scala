package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-lineage tracking — the reference's SQLAlchemy lineage store
  * re-expressed as DataFrame stages.
  *
  * Reference semantics:
  *  - lineage record schema (`src/utils/data_lineage.py:61-76`)
  *  - SHA-256 record hashing of canonicalized rows
  *    (`data_lineage.py:201-217`, sorted-key JSON → here a
  *    canonical '|'-joined projection, same integrity property)
  *  - read-back: filter by transaction id, order by processing time
  *    (`data_lineage.py:159-199`)
  *
  * Scale: record hashing is a row-local codegen'd expression chain
  * (concat_ws → sha2); the lineage "table" is an append-only DataFrame
  * partitionable by processing date.
  */
object Lineage {

  /** Content hash per record — deterministic canonical projection.
    * Only string/int fields go into the hash (float formatting is
    * engine-specific; the reference hashes JSON text, we hash a
    * canonical string — same integrity property). */
  def recordHashes(events: DataFrame): DataFrame =
    events.select(
      col("event_id"),
      col("user_id"),
      sha2(concat_ws("|",
        col("event_id").cast("string"),
        col("user_id").cast("string"),
        col("event_type"),
        col("props")), 256).as("record_hash"))
      .orderBy("event_id")

  /** Build a lineage step table for a processing stage. */
  def lineageStep(events: DataFrame, stage: String,
                  processName: String, version: String): DataFrame =
    recordHashes(events)
      .withColumnRenamed("record_hash", "input_record_hash")
      .withColumn("processing_stage", lit(stage))
      .withColumn("process_name", lit(processName))
      .withColumn("process_version", lit(version))

  /** Read-back: all lineage steps for one record, in processing order. */
  def lineageFor(lineage: DataFrame, eventId: Long): DataFrame =
    lineage.filter(col("event_id") === eventId)
      .orderBy("processing_stage")
}
