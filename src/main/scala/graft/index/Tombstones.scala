package graft.index

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Tombstone deletes: a delete is a SMALL committed file of deleted docIds,
  * not a corpus rebuild (round 1's delete cost a full index rebuild — an
  * anti-pattern at 100 TB where a 10-row delete must be O(10)).
  *
  * Layout: `tombstones/ts-<n>.parquet` (docId: long), with the CURRENT
  * snapshot's properties naming the visible files (`tombstones=ts-0,ts-1`).
  * Commit-gated like everything else: a killed delete leaves the old
  * snapshot; readers only ever see fully-committed tombstone sets. Kernels
  * exclude tombstoned docIds during scoring (so top-k never under-fills),
  * and the filter-query path anti-joins them out. Space is O(deleted docs)
  * until [[graft.index.IndexOps.deleteByIds]]-style compaction rebuilds.
  */
object Tombstones {

  /** Visible tombstone files per the CURRENT snapshot (not just ls — a
    * written-but-uncommitted file must stay invisible).
    */
  def files(indexDir: String): Seq[String] = {
    val props = new Snapshot(indexDir).readProps()
    props.get("tombstones").filter(_.nonEmpty).toSeq
      .flatMap(_.split(",")).filter(_.nonEmpty)
      .map(f => s"$indexDir/tombstones/$f.parquet")
  }

  /** Deleted docIds as a (small) driver set; deletes are bounded by delete
    * volume, not corpus size.
    */
  def loadSet(spark: SparkSession, indexDir: String): Set[Long] = {
    val fs = files(indexDir)
    if (fs.isEmpty) Set.empty
    else {
      import spark.implicits._
      spark.read.parquet(fs: _*).select(col("docId")).as[Long].collect().toSet
    }
  }

  /** Anti-join `df` (must carry docId) against the visible tombstones. */
  def exclude(spark: SparkSession, indexDir: String, df: DataFrame): DataFrame = {
    val fs = files(indexDir)
    if (fs.isEmpty) df
    else df.join(broadcast(spark.read.parquet(fs: _*).select("docId").distinct()),
      Seq("docId"), "left_anti")
  }

  /** Append a tombstone file with these docIds and commit a new snapshot
    * naming it. Returns the new snapshot id.
    */
  def commitDeletes(spark: SparkSession, indexDir: String, docIds: Seq[Long]): Long = {
    import spark.implicits._
    val snap = new Snapshot(indexDir)
    val props = snap.readProps()
    val prev = props.get("tombstones").filter(_.nonEmpty).toSeq
      .flatMap(_.split(",")).filter(_.nonEmpty)
    val name = s"ts-${snap.currentId + 1}"
    docIds.toDF("docId").coalesce(1)
      .write.mode("overwrite").parquet(s"$indexDir/tombstones/$name.parquet")
    snap.commit(props + ("tombstones" -> (prev :+ name).mkString(",")))
  }
}
