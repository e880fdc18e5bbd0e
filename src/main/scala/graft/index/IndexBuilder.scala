package graft.index

import graft.analysis.Analyzer
import graft.core._
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Build configuration. Defaults size for local tests; at cluster scale raise
  * `shufflePartitions` to O(cores); `saltRange` stays fixed — the number of
  * salts grows with the corpus, which IS the skew mitigation: a head term
  * present in 40% of docs is split into nDocs/saltRange independent runs that
  * encode in parallel and concatenate in salt order by construction.
  */
case class IndexConfig(
    fields: Seq[String] = Seq("content", "path", "repo"),
    buckets: Int = 64,
    blockSize: Int = 128,
    saltRange: Long = 1L << 20,
    shufflePartitions: Int = 32,
    /** Write postings under bucket=N partition directories. Query side prunes
      * whole directories per term (footer IO ∝ query terms, not corpus) and
      * reads either layout transparently (bucket is a partition column here,
      * a data column otherwise). Costs ~3ms/file × shufflePartitions×buckets
      * at write time — amortized at cluster scale where buckets are GB-sized,
      * dominant for small fast builds. Turn on for query-serving indexes,
      * off for build-throughput paths.
      */
    bucketDirs: Boolean = false)

/** Inverted-index build pipeline (SURVEY.md §3.1 step 7, §7.2 module 5):
  *
  *   docs -> stable docIds -> docstats (per-field lengths + sha256)
  *        -> typed flatMap tokenize -> (bucket, field, term, salt, docId, tf)
  *        -> repartition(bucket, field, salt) -> sortWithinPartitions
  *        -> mapPartitions streaming block encoder -> posting runs (parquet)
  *        -> dictionary (global df/cf) -> lineage rows -> snapshot commit
  *
  * Layout under `outDir`:
  *   docstats/    (docId, repo, path, commit, lang, sha, salt, len*)
  *   postings/    [[PostingRun]] rows, (field,term)-sorted within files
  *   dictionary/  (bucket, field, term, df, cf)
  *   lineage/     [[LineageRow]] per build partition
  *   snapshots/, SNAPSHOT — snaptable commit ([[Snapshot]])
  *
  * Scale notes (the 100 TB design):
  *  - ONE wide shuffle total (the posting repartition). docstats is map-only;
  *    tokenizing twice trades CPU for not shuffling tokens twice.
  *  - docId assignment is deterministic (global rank over a unique key), so
  *    stages recompute it instead of joining back — resume never needs the
  *    raw corpus co-shuffled with committed stages.
  *  - postings land term-major inside files (parquet row-group min/max stats
  *    prune term lookups) under bucket=N directories (hash(term) directory
  *    pruning: a query only opens the footers of its terms' buckets).
  */
object IndexBuilder {

  def bucketOf(term: String, buckets: Int): Int =
    math.floorMod(scala.util.hashing.MurmurHash3.stringHash(term, 0x9747b28c), buckets)

  /** Deterministic dense docIds = global rank in (sha, repo, path, commit)
    * order — the "sha256(content)-stable ordinal" (FIXTURES.md §1). Scalable
    * shape: range partition + per-partition ranks + broadcast offsets; no
    * single-partition global sort. Caller must keep the returned DF's lineage
    * stable (we persist internally; call `unpersistDocIds` when done).
    */
  /** caches created by withDocIds, released at the end of build() */
  private val pendingCaches = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  def withDocIds(spark: SparkSession, docs: Dataset[CodeDoc], partitions: Int): DataFrame = {
    import spark.implicits._
    val keyCols = Seq(col("sha"), col("repo"), col("path"), col("commit"))
    val parted = docs.toDF()
      .withColumn("sha", sha2(col("content"), 256))
      .select("sha", "repo", "path", "commit", "lang", "content")
      .repartitionByRange(partitions, keyCols: _*)
      .sortWithinPartitions(keyCols: _*)
      .persist()
    pendingCaches.add(parted)
    val counts = parted.groupBy(spark_partition_id().as("pid")).count().collect()
      .map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offsets: Map[Int, Long] = counts.map { case (pid, n) =>
      val entry = pid -> acc; acc += n; entry
    }.toMap
    // Partitions are already key-sorted: the global rank is partition offset
    // + local position. mapPartitions with a running counter — no second
    // shuffle, no window re-sort (those anti-scaled: a full-corpus exchange
    // per extra pass).
    parted
      .as[(String, String, String, String, String, String)]
      .mapPartitions { it =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        var rank = offsets.getOrElse(pid, 0L)
        it.map { case (sha, repo, path, commit, lang, content) =>
          val id = rank; rank += 1
          (id, sha, repo, path, commit, lang, content)
        }
      }
      .toDF("docId", "sha", "repo", "path", "commit", "lang", "content")
  }

  /** Tokenize one field value into (length, term -> tf) in first-seen order.
    * Shared by the posting flatMap and the docstats map so lengths agree.
    */
  def termFreqs(field: String, text: String): (Int, mutable.LinkedHashMap[String, Int]) = {
    val toks = Analyzer.analyzeField(field, text)
    val m = mutable.LinkedHashMap.empty[String, Int]
    var i = 0
    while (i < toks.length) {
      m.updateWith(toks(i)) { c => Some(c.getOrElse(0) + 1) }
      i += 1
    }
    (toks.length, m)
  }

  /** Stage timing (stderr) — enabled with SPARK_GRAFT_TIMING=1. */
  private def timed[T](stage: String)(body: => T): T = {
    val t0 = System.nanoTime()
    val r = body
    if (sys.env.get("SPARK_GRAFT_TIMING").contains("1")) {
      System.err.println(f"[build-stage] $stage%-12s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
    }
    r
  }

  def build(spark: SparkSession, docs: Dataset[CodeDoc], outDir: String,
            cfg: IndexConfig = IndexConfig()): IndexMeta = {
    import spark.implicits._
    val snap = new Snapshot(outDir)
    snap.init()

    val needDocstats = !snap.stageDone("docstats")
    val needPostings = !snap.stageDone("postings")
    val withIds: DataFrame =
      if (needDocstats || needPostings)
        timed("docIds")(withDocIds(spark, docs, cfg.shufflePartitions))
      else null

    // ---- tokens: ONE tokenize pass over content feeds BOTH docstats (via
    // per-doc length aggregation, map-side combined so the extra shuffle is
    // one tiny row per doc) and the posting build. content is decompressed
    // from the columnar cache exactly once. ----
    val docstatsPath = s"$outDir/docstats"
    val postingsPath = s"$outDir/postings"
    val lineagePath = s"$outDir/lineage"
    val saltRange = cfg.saltRange
    val buckets = cfg.buckets

    lazy val tokens = withIds.select("docId", "repo", "path", "content")
      .as[(Long, String, String, String)]
      .flatMap { case (docId, repo, path, content) =>
        val salt = (docId / saltRange).toInt
        // narrow shuffle row: field as a 1-byte id (0=content 1=path 2=repo)
        // and NO bucket column (recomputed from the term at encode time) —
        // the term string dominates the wide exchange; everything else is
        // kept minimal
        val out = mutable.ArrayBuffer.empty[(Byte, String, Int, Long, Int, Int)]
        var fi = 0
        val fieldVals = Array(("content", content), ("path", path), ("repo", repo))
        while (fi < fieldVals.length) {
          val (field, text) = fieldVals(fi)
          val (len, tfs) = termFreqs(field, text)
          val quantLen = SmallFloat.quantizeLength(len)
          tfs.foreach { case (term, tf) =>
            out += ((fi.toByte, term, salt, docId, tf, quantLen))
          }
          fi += 1
        }
        out
      }
      .toDF("fieldId", "term", "salt", "docId", "tf", "quantLen")
    // NOTE deliberately NOT persisted: materializing the token stream as a
    // columnar cache costs more than tokenizing twice (measured); each
    // consumer recomputes tokens from the (cached, column-pruned) corpus.

    // ---- stage: docstats (narrow columns only — the columnar cache prunes
    // content entirely; lengths come from the token stream) ----
    if (needDocstats) timed("docstats") {
      val lens = tokens
        .groupBy($"docId")
        .agg(
          sum(when($"fieldId" === 0, $"tf").otherwise(0L)).as("lenContent"),
          sum(when($"fieldId" === 1, $"tf").otherwise(0L)).as("lenPath"),
          sum(when($"fieldId" === 2, $"tf").otherwise(0L)).as("lenRepo"))
      withIds.select($"docId", $"repo", $"path", $"commit", $"lang", $"sha",
          ($"docId" / saltRange).cast("int").as("salt"))
        .join(lens, Seq("docId"), "left")
        .na.fill(0L, Seq("lenContent", "lenPath", "lenRepo"))
        .select($"docId", $"repo", $"path", $"commit", $"lang", $"sha", $"salt",
          $"lenContent".cast("int").as("lenContent"),
          $"lenPath".cast("int").as("lenPath"),
          $"lenRepo".cast("int").as("lenRepo"))
        .write.mode("overwrite").parquet(docstatsPath)
      snap.markStageDone("docstats")
    }

    // ---- stage: posting runs + per-partition lineage ----
    if (needPostings) timed("postings") {
      val blockSize = cfg.blockSize

      val sorted = tokens
        .repartition(cfg.shufflePartitions, $"term", $"fieldId", $"salt")
        // term first: the string sort-prefix discriminates (a 3-valued byte
        // first would force full-row comparisons), and the output lands
        // term-major for parquet row-group pruning
        .sortWithinPartitions($"term", $"fieldId", $"salt", $"docId")
        .as[(Byte, String, Int, Long, Int, Int)]

      val encoded: Dataset[(Option[PostingRun], Option[LineageRow])] =
        sorted.mapPartitions { it =>
          val pid = TaskContext.getPartitionId()
          val enc = new RunEncoder(blockSize)
          val sha = java.security.MessageDigest.getInstance("SHA-256")
          var termLo: String = null
          var termHi: String = null
          var bucketSeen = -1
          var nRuns = 0L; var nPost = 0L; var nBytes = 0L
          def record(r: PostingRun): PostingRun = {
            nRuns += 1; nPost += r.df; bucketSeen = r.bucket
            if (termLo == null || r.term < termLo) termLo = r.term
            if (termHi == null || r.term > termHi) termHi = r.term
            r.blocks.foreach { b =>
              nBytes += b.docsDelta.length + b.tfs.length
              sha.update(b.docsDelta); sha.update(b.tfs)
            }
            r
          }
          val fieldNames = Array("content", "path", "repo")
          val runs: Iterator[PostingRun] =
            it.flatMap { case (fid, t, s, d, tf, ql) =>
              enc.add(bucketOf(t, buckets), fieldNames(fid), t, s, d, tf, ql)
            } ++
              new Iterator[PostingRun] { // lazily flush AFTER input exhausts
                private var flushed = false
                private var v: Option[PostingRun] = None
                def hasNext: Boolean = { if (!flushed) { v = enc.flush(); flushed = true }; v.nonEmpty }
                def next(): PostingRun = { val r = v.get; v = None; r }
              }
          runs.map(r => (Some(record(r)), Option.empty[LineageRow])) ++
            new Iterator[(Option[PostingRun], Option[LineageRow])] { // trailing lineage row
              private var emitted = false
              def hasNext: Boolean = !emitted
              def next(): (Option[PostingRun], Option[LineageRow]) = {
                emitted = true
                (None, Some(LineageRow(pid, bucketSeen,
                  Option(termLo).getOrElse(""), Option(termHi).getOrElse(""),
                  nRuns, nPost, nBytes, sha.digest().map("%02x".format(_)).mkString)))
              }
            }
        }.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

      // bucketDirs: term lookups prune whole directories (a q-term query
      // opens <= q/buckets of the files' footers — file-level pruning on top
      // of the term-major row-group stats); see IndexConfig.bucketDirs for
      // the write-cost tradeoff.
      timed("postWrite") {
        val w = encoded.flatMap(_._1).write.mode("overwrite")
        (if (cfg.bucketDirs) w.partitionBy("bucket") else w).parquet(postingsPath)
      }
      timed("lineageWrite")(encoded.flatMap(_._2).write.mode("overwrite").parquet(lineagePath))
      encoded.unpersist()
      snap.markStageDone("postings")
    }
    while (!pendingCaches.isEmpty) { Option(pendingCaches.poll()).foreach(_.unpersist()) }

    // ---- stage: dictionary (small aggregate over runs) ----
    val dictPath = s"$outDir/dictionary"
    if (!snap.stageDone("dictionary")) timed("dictionary") {
      spark.read.parquet(postingsPath)
        .groupBy($"bucket", $"field", $"term")
        .agg(sum($"df").as("df"), sum($"cf").as("cf"))
        .repartitionByRange(math.max(1, cfg.buckets / 8), $"field", $"term")
        .sortWithinPartitions($"field", $"term")
        .write.mode("overwrite").parquet(dictPath)
      snap.markStageDone("dictionary")
    }

    // ---- stage: snapshot commit ----
    val stats = timed("statsAgg")(spark.read.parquet(docstatsPath)
      .agg(count(lit(1)), sum($"lenContent"), sum($"lenPath"), sum($"lenRepo"))
      .collect()(0))
    val nDocs = stats.getLong(0)
    val meta = IndexMeta(
      nDocs = nDocs,
      avgLen = Map(
        "content" -> stats.getLong(1).toDouble / nDocs,
        "path" -> stats.getLong(2).toDouble / nDocs,
        "repo" -> stats.getLong(3).toDouble / nDocs),
      buckets = cfg.buckets, saltRange = cfg.saltRange, blockSize = cfg.blockSize)
    snap.commit(meta.toProps ++ Map("fields" -> cfg.fields.mkString(",")))
    meta
  }
}

/** Incremental run encoder: add() postings in (bucket, field, term, salt,
  * docId) order; returns the finished previous run whenever the key changes.
  * Blocks cut at `blockSize` postings; docIds delta+varint encoded per block
  * with absolute first id ([[graft.core.Codec]]). Constant memory per run.
  */
final class RunEncoder(blockSize: Int) {
  private var bucket = -1
  private var field: String = _
  private var term: String = _
  private var salt = -1
  private val blocks = mutable.ArrayBuffer.empty[PostingBlock]
  private val docBuf = new Array[Long](blockSize)
  private val tfBuf = new Array[Int](blockSize)
  private var n = 0
  private var runDf = 0L
  private var runCf = 0L
  private var runMaxTf = 0
  private var blkMaxTf = 0
  private var blkMinQL = Int.MaxValue

  private def cutBlock(): Unit = {
    if (n == 0) return
    blocks += PostingBlock(
      firstDoc = docBuf(0), lastDoc = docBuf(n - 1), n = n,
      maxTf = blkMaxTf, minQuantLen = blkMinQL,
      docsDelta = Codec.encodeDocIds(java.util.Arrays.copyOf(docBuf, n)),
      tfs = Codec.encodeTfs(java.util.Arrays.copyOf(tfBuf, n)))
    n = 0; blkMaxTf = 0; blkMinQL = Int.MaxValue
  }

  private def finishRun(): PostingRun = {
    cutBlock()
    val run = PostingRun(bucket, field, term, salt, runDf, runCf, runMaxTf, blocks.toArray)
    blocks.clear(); runDf = 0; runCf = 0; runMaxTf = 0
    run
  }

  /** Returns Some(previous finished run) when the key changes. */
  def add(b: Int, f: String, t: String, s: Int, docId: Long, tf: Int, quantLen: Int): Option[PostingRun] = {
    val boundary = term != null && (b != bucket || f != field || t != term || s != salt)
    val finished = if (boundary) Some(finishRun()) else None
    if (term == null || boundary) { bucket = b; field = f; term = t; salt = s }
    docBuf(n) = docId; tfBuf(n) = tf
    if (tf > blkMaxTf) blkMaxTf = tf
    if (tf > runMaxTf) runMaxTf = tf
    if (quantLen < blkMinQL) blkMinQL = quantLen
    n += 1; runDf += 1; runCf += tf
    if (n == blockSize) cutBlock()
    finished
  }

  def flush(): Option[PostingRun] = if (term == null) None else Some(finishRun())
}
