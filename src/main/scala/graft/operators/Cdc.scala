package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture maintenance operators: the "apply a changelog to a
  * table" half of an ingestion engine (the reference's persisted record
  * streams are append-only; these are the compaction/history views a
  * warehouse builds on top of them — reference semantics:
  * hyppo-worker's PersistProcessedData appends records keyed per task,
  * see worker/src/main/scala/com/harrys/hyppo/worker/actor/task;
  * latest-wins and history views are the two standard read models).
  *
  * Scale notes:
  *  - [[applyChangelog]] (latest-wins upsert + tombstones) is ONE hash
  *    aggregate: `max_by(payload, version_key)` with map-side partial
  *    combine — the shuffle carries one (key, payload) pair per key per
  *    map partition, NOT the full changelog. No window, no sort, no
  *    state: at 100 TB this is the difference between a bounded
  *    per-key reduce and a cluster-wide sort.
  *  - [[scd2History]] shuffles each key's rows once (window by key) —
  *    partition count scales with input; no global sort anywhere.
  *    Change suppression (lag ≠ current) happens BEFORE the second
  *    window pass, so interval assembly only touches change rows.
  */
object Cdc {

  /** Latest-wins changelog compaction: keep each key's row with the
    * highest (orderings...) tuple, then drop keys whose final op is a
    * tombstone. Emits (key cols, last_* payload cols).
    */
  def applyChangelog(changelog: DataFrame, keyCol: String,
                     orderCols: Seq[String], opCol: String,
                     deleteOp: String, payloadCols: Seq[String]): DataFrame = {
    val ordKey = struct(orderCols.map(col): _*)
    val payload = struct((opCol +: payloadCols).map(col): _*)
    changelog
      .groupBy(col(keyCol))
      .agg(max_by(payload, ordKey).as("last"))
      .filter(col(s"last.$opCol") =!= deleteOp)
      .select(col(keyCol) +: (opCol +: payloadCols).map(c =>
        col(s"last.$c").as(s"last_$c")): _*)
  }

  /** SCD type-2 history: per key, collapse the ordered attribute stream
    * into validity intervals, suppressing runs of the unchanged value.
    * Emits (key, version, state, valid_from, valid_to, is_current) where
    * valid_to is null on the open (current) version.
    */
  def scd2History(changes: DataFrame, keyCol: String, tsCol: String,
                  tieCol: String, stateCol: String): DataFrame = {
    val byKey = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    val changeRows = changes
      .select(col(keyCol), col(tsCol), col(tieCol), col(stateCol))
      .withColumn("prev_state", lag(col(stateCol), 1).over(byKey))
      .filter(col("prev_state").isNull || col("prev_state") =!= col(stateCol))
    changeRows
      .withColumn("version", row_number().over(byKey).cast("long"))
      .withColumn("valid_to", lead(col(tsCol), 1).over(byKey))
      .select(col(keyCol), col("version"), col(stateCol).as("state"),
        col(tsCol).as("valid_from"), col("valid_to"),
        col("valid_to").isNull.as("is_current"))
  }
}
