package graft.query

import graft.analysis.Analyzer
import graft.core._
import graft.index.{IndexMeta, Snapshot}
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** One parsed edismax clause: a query word and its per-field analyzed term.
  * Mirrors Lucene edismax structure: per word, a DisjunctionMax over qf
  * fields; words combine as a boolean OR gated by minimum-should-match
  * (/root/reference/solr/config/solrconfig.xml:84-106).
  */
case class Clause(word: String, perField: Map[String, String])

/** One query's serializable plan within a batched retrieval job: index into
  * the caller's query list, parsed clauses, resolved idf per (field, term),
  * and the mm gate. Small by construction (a few strings and doubles per
  * query term) — a whole batch ships to executors as one broadcast.
  */
case class BatchPlan(qi: Int, clauses: Array[Clause],
                     idfMap: Map[(String, String), Double], minMatch: Int)

object QueryPlan {
  /** Split on whitespace (Lucene query parser word boundaries), analyze each
    * word per field with that field's own chain (SURVEY.md §3.2 step 2). A
    * word analyzing to multiple tokens in a field contributes its first token
    * (single-token queries are the reference's entire observed surface).
    */
  def clauses(query: String, fields: Seq[String]): Array[Clause] = {
    query.trim.split("\\s+").filter(_.nonEmpty).flatMap { word =>
      val perField = fields.flatMap { f =>
        Analyzer.analyzeField(f, word).headOption.map(f -> _)
      }.toMap
      if (perField.isEmpty) None else Some(Clause(word, perField))
    }
  }
}

/** Per-(field, term) decoded-block cache, shared by every query of a BATCH
  * that touches the term within one task (r7, guide §1.2 per-task work —
  * found by StageMetrics on the 32-core QueryScalingBench leg: a 1024-query
  * batch over a ~25-term vocabulary decoded the SAME blocks ~80× per salt
  * task; decode was the dominant share of 153 task-CPU-seconds/run).
  * Blocks decode LAZILY on first touch — a block every query WAND-skips is
  * never decoded at all — and the decoded arrays are shared read-only by
  * all plans' iterators. Single-task use (one thread); bit-identical decode
  * output by construction (same Codec calls).
  */
final class DecodedBlocks(val blocks: Array[PostingBlock]) {
  // AtomicReferenceArray: the DRIVER batch path (searchMany) shares one
  // cache across kernelPool threads — the race is benign (two threads
  // decode identical content; volatile set publishes a fully-written
  // array), and the volatile read is per BLOCK entry, not per posting
  private val docsArr =
    new java.util.concurrent.atomic.AtomicReferenceArray[Array[Long]](blocks.length)
  private val tfsArr =
    new java.util.concurrent.atomic.AtomicReferenceArray[Array[Int]](blocks.length)
  def docsOf(bi: Int): Array[Long] = {
    var a = docsArr.get(bi)
    if (a == null) {
      val b = blocks(bi)
      a = Codec.decodeDocIds(b.docsDelta, b.n)
      docsArr.set(bi, a)
    }
    a
  }
  def tfsOf(bi: Int): Array[Int] = {
    var a = tfsArr.get(bi)
    if (a == null) {
      val b = blocks(bi)
      a = Codec.decodeTfs(b.tfs, b.n)
      tfsArr.set(bi, a)
    }
    a
  }
}

/** Lazy block-at-a-time posting iterator over one (field, term)'s runs within
  * one salt range. Runs arrive salt-sorted; blocks decode on demand — the
  * block-skipping entry points (`skipTo`, block lastDoc metadata) are what
  * block-max WAND prunes with. With a shared [[DecodedBlocks]] cache (batch
  * kernel), positioning reads the cache's decoded arrays instead of decoding
  * into the private buffers.
  */
final class PostingIterator(runs: Array[PostingRun], cache: DecodedBlocks = null) {
  private val blocks: Array[PostingBlock] =
    if (cache != null) cache.blocks else runs.sortBy(_.salt).flatMap(_.blocks)
  private var bi = 0 // current block
  private var i = 0 // position within decoded block
  private var len = 0 // postings in the current block
  private var done = blocks.isEmpty
  // REUSED decode buffers, sized once to the largest block: the kernel
  // decodes millions of blocks per batch and the decode loop is memory-
  // bandwidth-bound at full thread count (QueryScalingBench round 5) —
  // two fresh arrays + a ByteBuffer per block was pure allocation traffic
  // on the hottest path. tfs decode LAZILY per block: WAND's pivot skipping
  // scans THROUGH many blocks by docId without ever reading a tf, so the
  // tf varint pass is paid only by blocks that actually score.
  private val maxN: Int = {
    if (cache != null) 0
    else {
      var m = 0; var k = 0
      while (k < blocks.length) { if (blocks(k).n > m) m = blocks(k).n; k += 1 }
      m
    }
  }
  private val docsBuf: Array[Long] = new Array[Long](maxN)
  private val tfsBuf: Array[Int] = new Array[Int](maxN)
  private var docs: Array[Long] = docsBuf
  private var tfs: Array[Int] = tfsBuf
  private var tfsDecoded = false
  decodeCurrent()

  private def decodeCurrent(): Unit = {
    if (bi < blocks.length) {
      val b = blocks(bi)
      if (cache != null) docs = cache.docsOf(bi)
      else Codec.decodeDocIdsInto(b.docsDelta, b.n, docsBuf)
      len = b.n
      tfsDecoded = false
      i = 0
    } else { done = true; len = 0 }
  }

  def exhausted: Boolean = done
  def curDoc: Long = docs(i)
  def curTf: Int = {
    if (!tfsDecoded) {
      if (cache != null) tfs = cache.tfsOf(bi)
      else Codec.decodeTfsInto(blocks(bi).tfs, len, tfsBuf)
      tfsDecoded = true
    }
    tfs(i)
  }

  def advance(): Unit = {
    i += 1
    if (i >= len) { bi += 1; decodeCurrent() }
  }

  // current-block metadata for the BMW shallow bound (callers must check
  // !exhausted): the block's (maxTf, minQuantLen) give an EXACT upper bound
  // on any member doc's term score, and lastDoc bounds the docId span the
  // block-level bound is valid for
  def curBlockIndex: Int = bi
  def curBlockLastDoc: Long = blocks(bi).lastDoc
  def curBlockMaxTf: Int = blocks(bi).maxTf
  def curBlockMinQuantLen: Int = blocks(bi).minQuantLen

  /** Skip to the first posting with docId >= target, hopping whole blocks via
    * lastDoc metadata (decodes only the landing block).
    */
  def skipTo(target: Long): Unit = {
    if (exhausted || curDoc >= target) return
    if (blocks(bi).lastDoc < target) {
      var lo = bi + 1
      var hi = blocks.length
      while (lo < hi) { // first block with lastDoc >= target
        val mid = (lo + hi) >>> 1
        if (blocks(mid).lastDoc < target) lo = mid + 1 else hi = mid
      }
      bi = lo
      decodeCurrent()
      if (exhausted) return
    }
    while (i < len && docs(i) < target) i += 1
    if (i >= len) { bi += 1; decodeCurrent(); if (!exhausted) skipTo(target) }
  }
}

/** Bounded top-k heap with Lucene tie-breaking (score desc, docId asc). */
final class TopK(k: Int) {
  // min-heap: "worst" hit at head — lower score, or equal score + higher docId
  private val ord: Ordering[Hit] = (a: Hit, b: Hit) =>
    if (a.score != b.score) java.lang.Double.compare(b.score, a.score)
    else java.lang.Long.compare(a.docId, b.docId)
  private val pq = mutable.PriorityQueue.empty[Hit](ord)

  def threshold: Double = if (pq.size < k) Double.NegativeInfinity else pq.head.score

  def offer(h: Hit): Unit = {
    if (pq.size < k) pq.enqueue(h)
    else {
      val worst = pq.head
      if (h.score > worst.score || (h.score == worst.score && h.docId < worst.docId)) {
        pq.dequeue(); pq.enqueue(h)
      }
    }
  }

  def sortedHits: Array[Hit] =
    pq.dequeueAll.toArray.sortBy(h => (-h.score, h.docId))
}

/** Dense per-field quantized-length norms: docIds are dense ranks 0..N-1 by
  * construction (IndexBuilder.withDocIds), so norm lookup is a direct byte
  * array index. 1 byte/doc/field — the broadcast form of the north rule's
  * "document-length statistics computed as a broadcast DF".
  */
case class NormTable(fields: Array[String], bytes: Array[Array[Byte]]) {
  def quantLen(fi: Int, docId: Long): Int = SmallFloat.byte4ToInt(bytes(fi)(docId.toInt))
}

/** Top-k retrieval over a built index (SURVEY.md §3.2 step 5).
  *
  * Two physical strategies, both rank-identical (EngineSpec gates this):
  *
  *  - BROADCAST (default): dictionary loaded once into a driver map; norms
  *    broadcast as dense byte arrays; per query ONE shuffle-free Spark job —
  *    postings scan (term filter pushed to parquet row groups) ->
  *    mapPartitions DAAT/WAND kernel -> per-partition top-k -> driver merge.
  *    Right while norms fit executor memory (1 byte/doc/field).
  *
  *  - SHUFFLE: posting runs cogrouped with docstats BY SALT RANGE; unbounded
  *    corpus size, one shuffle of the (tiny) term-filtered runs. The scale
  *    path when broadcast norms no longer fit.
  *
  * Deliberately NOT Serializable: the searcher holds multi-MB driver state
  * (the resolved dictionary map, the posting-run cache), and a lambda that
  * accidentally captures `this` would silently ship all of it in EVERY
  * task binary (measured 7.4 MB/job at a 200k-doc index — it more than
  * tripled distributed query latency). Executor-side closures may reference
  * only local vals and [[Searcher]]'s static helpers; a regression now
  * fails loudly with NotSerializableException instead.
  */
class Searcher(spark: SparkSession, indexDir: String) {
  import spark.implicits._

  val meta: IndexMeta = IndexMeta.fromProps(new Snapshot(indexDir).readProps())
  val DefaultFields: Seq[String] = Seq("content", "path", "repo")

  /** Vocabulary cutoff below which the whole dictionary is collected once to
    * the driver (lowest latency). Above it — code corpora at 100x scale have
    * vocabularies that must never be driver-collected — lookups become
    * per-query pushed-filter probes with an LRU of resolved dfs
    * ([[DictProbe]]). Answer-identical either way (EngineSpec gates with
    * `DictionaryMaxDriverTerms = 0`). Set BEFORE the first query.
    */
  var DictionaryMaxDriverTerms: Long = 1L << 22

  private lazy val dict = new DictProbe(spark, s"$indexDir/dictionary", DictionaryMaxDriverTerms)
  private[graft] def dictProbes: Long = dict.probes.get()

  /** df lookup for a key set (probe- or driver-cached per the threshold). */
  def dfOf(keys: Set[(String, String)]): Map[(String, String), Long] = dict.dfOf(keys)

  /** Tombstone volume above which the broadcast strategies are OFF the
    * table: the planner routes to [[searchShuffle]], where tombstones are
    * excluded by a distributed anti-join on the docstats side and nothing is
    * driver-materialized. Below it, tombstones broadcast as a SORTED
    * primitive Array[Long] (8 B/id, binary-search membership) — the
    * liveDocs-bitset regime. 1 << 23 ids = 64 MB broadcast.
    */
  var TombstonesMaxBroadcast: Long = 1L << 23

  private lazy val tombstoneCount: Long =
    graft.index.Tombstones.count(spark, indexDir)

  /** Tombstoned docIds of the pinned snapshot (K4 in-place deletes) —
    * broadcast once as a sorted array; kernels binary-search-skip them
    * during scoring. Only the small regime touches this (see
    * [[TombstonesMaxBroadcast]]).
    */
  lazy val tombstonesBc: Broadcast[Array[Long]] = track(
    spark.sparkContext.broadcast(graft.index.Tombstones.loadSorted(spark, indexDir)))

  /** Broadcasts created by this searcher ([[close]] inventory). */
  private val liveBroadcasts =
    new java.util.concurrent.ConcurrentLinkedQueue[Broadcast[_]]()
  private def track[T](bc: Broadcast[T]): Broadcast[T] = { liveBroadcasts.add(bc); bc }
  private[graft] def liveBroadcastCount: Int = liveBroadcasts.size()

  /** Release the norm/tombstone broadcasts. The searcher is dead after
    * close — open a new one for the next snapshot generation.
    */
  def close(): Unit = {
    var bc = liveBroadcasts.poll()
    while (bc != null) {
      Searcher.destroyQuietly(bc)
      bc = liveBroadcasts.poll()
    }
    var df = livePersists.poll()
    while (df != null) {
      try df.unpersist()
      catch { case scala.util.control.NonFatal(_) => }
      df = livePersists.poll()
    }
  }

  /** Dense norms broadcast once per searcher. */
  lazy val normsBc: Broadcast[NormTable] = track {
    val fields = DefaultFields.toArray
    val n = meta.nDocs.toInt
    val arrs = fields.map(_ => new Array[Byte](n))
    spark.read.parquet(s"$indexDir/docstats")
      .select($"docId", $"lenContent", $"lenPath", $"lenRepo")
      .as[(Long, Int, Int, Int)]
      .collect()
      .foreach { case (id, lc, lp, lr) =>
        arrs(0)(id.toInt) = SmallFloat.intToByte4(lc)
        arrs(1)(id.toInt) = SmallFloat.intToByte4(lp)
        arrs(2)(id.toInt) = SmallFloat.intToByte4(lr)
      }
    spark.sparkContext.broadcast(NormTable(fields, arrs))
  }

  /** Dedicated session for the kernel-stage jobs: same SparkContext (shared
    * broadcasts, caches, scheduler), ISOLATED SQL conf. AQE's byte-based
    * post-shuffle coalescing assumes work ∝ bytes, but posting runs are
    * delta+varint COMPRESSED — a coalesced partition holds ~10-30x its bytes
    * in decoded postings, and the measured kernel stage collapsed to 4-6
    * tasks regardless of cores (batch of 256 ran FLAT from 8 to 32 cores,
    * QueryScalingBench round 5). Lowering the coalesce floor keeps the
    * parallelism-first target at total/cores without touching the caller's
    * session, where normal byte-based coalescing is right.
    */
  private lazy val querySession: SparkSession = Searcher.newQuerySession(spark)

  /** Session for BATCHED kernel jobs ([[searchManyDistributed]]): same
    * context, SQL conf tuned for throughput instead of latency. The
    * round-6 profile (QueryScalingBench, SPARK_GRAFT_TIMING): the batched
    * kernel stage coalesced to ~1.25x cores tasks (40 at 32 cores), so the
    * whole second scheduling wave ran 8 tasks on 32 cores — wall = 2x the
    * median task while task-CPU inflation at 32 threads was only ~13%.
    * That's scheduler quantization, not bandwidth. For a LATENCY query the
    * right task count is <= cores (one wave, [[querySession]]'s conf); for
    * a THROUGHPUT batch it's several waves of small tasks, so this session
    * floors the post-shuffle coalesce at 4x parallelism (capped by the
    * index's salt-group count naturally).
    */
  private lazy val batchQuerySession: SparkSession = Searcher.newBatchSession(spark)

  /** Re-used postings DataFrame (file index cached across queries); planned
    * under [[querySession]] so every strategy's kernel stage inherits the
    * compute-dense coalescing conf.
    */
  private lazy val postingsDF: DataFrame = querySession.read.parquet(s"$indexDir/postings")

  /** [[postingsDF]] planned under [[batchQuerySession]] for the batched
    * kernel jobs.
    */
  private lazy val batchPostingsDF: DataFrame =
    batchQuerySession.read.parquet(s"$indexDir/postings")

  /** Parsed clauses + idf map + mm gate + exact posting volume (sum of dfs —
    * the driver-vs-distributed kernel selector, free from the same lookup).
    */
  private def plan(query: String, fields: Seq[String])
      : Option[(Array[Clause], Map[(String, String), Double], Int, Long)] = {
    val cls = QueryPlan.clauses(query, fields)
    if (cls.isEmpty) return None
    val needed = cls.flatMap(_.perField.toSeq).toSet
    val dfMap = dict.dfOf(needed)
    if (dfMap.isEmpty) return None
    val n = meta.nDocs
    val idfMap = dfMap.map { case (k2, df) => k2 -> BM25.idf(n, df) }
    Some((cls, idfMap, BM25.minShouldMatch(cls.length), dfMap.valuesIterator.sum))
  }

  private def filteredRuns(keys: Set[(String, String)],
                           batch: Boolean = false): Dataset[PostingRun] = {
    val termList = keys.map(_._2).toSeq
    val fieldList = keys.map(_._1).toSeq
    // bucket prunes PARTITION DIRECTORIES (only the terms' buckets are even
    // listed); term/field prune row groups inside the surviving files
    val bucketList = termList.map(b => graft.index.IndexBuilder.bucketOf(b, meta.buckets)).distinct
    (if (batch) batchPostingsDF else postingsDF)
      .filter($"bucket".isin(bucketList: _*) &&
        $"term".isin(termList: _*) && $"field".isin(fieldList: _*))
      .as[PostingRun]
  }

  /** Driver-resident hot-term posting cache (the Lucene query-cache analog
    * for the driver-local kernel): once a (field, term)'s runs are fetched,
    * repeat queries over that term skip the Spark job entirely. Bounded by
    * [[RunCacheMaxTerms]] — memory is O(cached postings), the same data the
    * kernel holds during a query. Only the driver-local strategy uses it;
    * the distributed strategies stream runs straight to executors.
    */
  var RunCacheMaxTerms: Int = 8192
  private val runCache =
    new java.util.concurrent.ConcurrentHashMap[(String, String), Array[PostingRun]]()
  /** Spark fetches performed (for tests/telemetry — cache-hit queries don't move it). */
  private[graft] val cacheFetches = new java.util.concurrent.atomic.AtomicLong(0)

  private def fetchRuns(keys: Set[(String, String)]): Array[PostingRun] = {
    val missing = keys.filterNot(runCache.containsKey)
    val fetched: Map[(String, String), Array[PostingRun]] =
      if (missing.isEmpty) Map.empty
      else {
        cacheFetches.incrementAndGet()
        val rows = filteredRuns(missing).collect()
        // record empties too: a dictionary term with zero runs in range must
        // not be re-fetched every query
        val byKey = rows.groupBy(r => (r.field, r.term))
        val all = missing.iterator.map(k => k -> byKey.getOrElse(k, Array.empty[PostingRun])).toMap
        all.foreach { case (k, v) => if (runCache.size < RunCacheMaxTerms) runCache.put(k, v) }
        all
      }
    keys.iterator.flatMap(k => fetched.getOrElse(k, runCache.getOrDefault(k, Array.empty))).toArray
  }

  /** Corpus-size cutoff for the broadcast-norms strategies: norms cost
    * 1 byte/doc/field on the driver and every executor, so beyond this the
    * planner routes to [[searchShuffle]] (docstats never move — cogrouped by
    * salt range), which is unbounded in corpus size. 1 << 31 docs ≈ 6 GB of
    * norms; at the 10^12-doc target the shuffle strategy is the only shape
    * that exists, and it is rank-identical (EngineSpec gates all three).
    */
  var NormsMaxDocs: Long = 1L << 31

  // ---- filter queries (Solr q + fq — the reference consumer's dominant
  // query shape: every catalog search carries visibility/type filters) ----

  /** Matching-doc cutoff for the broadcast fq regime: below it the filter
    * set rides as a sorted docId array (8 B/id, binary-search membership
    * fused into the kernel's exclusion predicate — the liveDocs shape
    * tombstones already use); above it the query routes to the shuffle
    * strategy where the fq set SEMI-joins the docstats side distributively
    * and nothing is ever driver-materialized.
    */
  var FqMaxBroadcast: Long = 1L << 23

  /** Solr-filterCache analog: resolved fq -> (count, broadcast) entries,
    * bounded LRU. Eviction drops the MAP entry only — the evicted broadcast
    * stays in the [[close]] inventory rather than being destroyed under a
    * possibly in-flight query (the realistic working set is a handful of
    * hot visibility filters, so eviction is rare by construction).
    */
  var FqCacheMaxEntries: Int = 64

  /** Resolved filter query: matching-doc count + sorted-array broadcast
    * (below [[FqMaxBroadcast]]) or a PERSISTED docId DataFrame (above it —
    * the semi-join regime; persisting makes the filter resolve-once like
    * Solr's filterCache instead of re-deriving the match set per query:
    * measured 2.7x -> 1.33x the unfiltered shuffle p50 at 200k docs,
    * BENCH/BASELINE.md). Exactly one of the two is set. Unpersist/destroy
    * happens via [[close]]'s inventories.
    */
  private case class FqSet(count: Long, sorted: Option[Broadcast[Array[Long]]],
                           docs: Option[DataFrame])

  /** Persisted fq match-set DataFrames ([[close]] inventory — unpersist is
    * in-flight-safe, unlike broadcast destroy: a concurrent query just
    * recomputes the missing blocks).
    */
  private val livePersists =
    new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()
  private[graft] def livePersistCount: Int = livePersists.size()

  private val fqCache =
    new java.util.LinkedHashMap[String, FqSet](16, 0.75f, true) {
      override def removeEldestEntry(e: java.util.Map.Entry[String, FqSet]): Boolean = {
        val evict = size() > FqCacheMaxEntries
        // a big-fq entry's PERSISTED match set is released on eviction —
        // unpersist is in-flight-safe (a concurrent query recomputes the
        // missing blocks), so the LRU bound really bounds storage, not just
        // map entries; evicted BROADCASTS stay in the close() inventory
        // (destroy under an in-flight query is not safe)
        if (evict) e.getValue.docs.foreach { df =>
          try df.unpersist() catch { case scala.util.control.NonFatal(_) => }
          livePersists.remove(df)
        }
        evict
      }
    }
  private val fqInFlight = new java.util.concurrent.ConcurrentHashMap[
    String, java.util.concurrent.CompletableFuture[FqSet]]()
  /** fq resolution jobs issued (tests assert repeat fqs stay cached). */
  private[graft] val fqResolves = new java.util.concurrent.atomic.AtomicLong(0)

  /** Resolve an fq once per searcher (concurrent misses on the same fq share
    * one resolution — same in-flight pattern as [[DictProbe]]).
    */
  private def resolveFq(fqs: String): FqSet = {
    val hit = fqCache.synchronized(fqCache.get(fqs))
    if (hit != null) return hit
    val fut = new java.util.concurrent.CompletableFuture[FqSet]()
    val prior = fqInFlight.putIfAbsent(fqs, fut)
    if (prior != null) prior.join()
    else {
      // a prior resolver may have completed and retired its in-flight entry
      // between our cache miss and the putIfAbsent win — re-check before
      // resolving, or this fq double-persists and the first copy strands
      // until close()
      val raced = fqCache.synchronized(fqCache.get(fqs))
      if (raced != null) {
        fut.complete(raced)
        fqInFlight.remove(fqs, fut)
        return raced
      }
      try {
        // composite key (multi-fq conjunction): resolve each component
        // through this same entry — each caches individually, Solr
        // filterCache-style — then intersect; the combined set caches
        // under the canonical composite key like any other fq
        val set =
          if (fqs.contains(Searcher.FqAndSep))
            combineFq(fqs.split(java.util.regex.Pattern.quote(Searcher.FqAndSep))
              .toSeq.map(resolveFq))
          else resolveSingleFq(fqs)
        fqCache.synchronized(fqCache.put(fqs, set))
        fut.complete(set)
        set
      } catch {
        case t: Throwable => fut.completeExceptionally(t); throw t
      } finally fqInFlight.remove(fqs, fut)
    }
  }

  private def resolveSingleFq(fqs: String): FqSet = {
    fqResolves.incrementAndGet()
    // persist BEFORE the count so the count job doubles as cache
    // materialization; small sets collect from the cache and release it
    val docs = graft.index.QueryFilter
      .matchingDocs(querySession, indexDir, fqs).select($"docId")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = docs.count()
    if (n <= FqMaxBroadcast) {
      val arr = docs.as[Long].collect()
      java.util.Arrays.sort(arr)
      docs.unpersist()
      FqSet(n, Some(track(spark.sparkContext.broadcast(arr))), None)
    } else {
      livePersists.add(docs)
      FqSet(n, None, Some(docs))
    }
  }

  /** Intersect component resolutions (multi-fq conjunction, Solr docset ∩
    * docset). The result is broadcastable whenever ANY component is
    * (|∩| <= the smallest component <= FqMaxBroadcast), so the mixed
    * small+big case always lands in the sorted-array regime; the all-big
    * case chains docId semi-joins — nothing driver-materialized — and
    * routes by the combined count exactly like a single big fq.
    */
  private def combineFq(sets: Seq[FqSet]): FqSet = {
    if (sets.exists(_.count == 0))
      return FqSet(0,
        Some(track(spark.sparkContext.broadcast(Array.emptyLongArray))), None)
    val smalls = sets.flatMap(_.sorted).map(_.value)
    val bigs = sets.flatMap(_.docs)
    if (bigs.isEmpty) {
      val arr = smalls.reduce(Searcher.intersectSorted)
      FqSet(arr.length, Some(track(spark.sparkContext.broadcast(arr))), None)
    } else if (smalls.nonEmpty) {
      val seed = smalls.reduce(Searcher.intersectSorted)
      var df = spark.createDataset(seed).toDF("docId")
      bigs.foreach(b => df = df.join(b, Seq("docId"), "left_semi"))
      val out = df.as[Long].collect()
      java.util.Arrays.sort(out)
      FqSet(out.length, Some(track(spark.sparkContext.broadcast(out))), None)
    } else {
      var df = bigs.head
      bigs.tail.foreach(b => df = df.join(b, Seq("docId"), "left_semi"))
      val pdf = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val n = pdf.count()
      if (n <= FqMaxBroadcast) {
        val arr = pdf.as[Long].collect()
        java.util.Arrays.sort(arr)
        pdf.unpersist()
        FqSet(n, Some(track(spark.sparkContext.broadcast(arr))), None)
      } else {
        livePersists.add(pdf)
        FqSet(n, None, Some(pdf))
      }
    }
  }

  /** Ranked retrieval, optionally constrained to an fq's matching docs
    * (Solr `q` + `fq` semantics: the filter never contributes to the score —
    * BM25 ranks exactly as without it; the filter gates which docs may
    * enter the top-k INSIDE the kernel, so k results are returned whenever
    * k matching docs exist, never a post-filtered underfill). WAND pruning
    * stays admissible: the filter only suppresses heap offers, so the
    * threshold is never higher than the unfiltered run's.
    */
  def search(query: String, k: Int, fields: Seq[String] = DefaultFields,
             fq: Option[String] = None): Array[Hit] = fq match {
    case None =>
      if (meta.nDocs <= NormsMaxDocs && tombstoneCount <= TombstonesMaxBroadcast)
        searchBroadcast(query, k, fields)
      else searchShuffle(query, k, fields)
    case Some(f) =>
      val set = resolveFq(f)
      if (set.count == 0) Array.empty
      else set.sorted match {
        case Some(bc)
          if meta.nDocs <= NormsMaxDocs && tombstoneCount <= TombstonesMaxBroadcast =>
          searchBroadcast(query, k, fields, Some(bc))
        case _ => searchShuffle(query, k, fields, fq)
      }
  }

  /** Cutoff (postings) below which the query runs its kernel on the driver.
    * Mutable so tests can force the distributed branch.
    */
  var DriverKernelMaxPostings: Long = 4L << 20

  /** Cap on a batch's summed planned postings below which [[searchMany]]
    * shares one decoded-block cache across the batch (decoded arrays are
    * ~6× the packed bytes and live for the call; ~64M postings ≈ 1 GB
    * decoded worst case). Mutable test seam.
    */
  @volatile var SharedDecodeMaxPostings: Long = 64L << 20

  /** Default strategy: broadcast norms; runs are co-located BY SALT either on
    * the driver (small queries: one collect job, no shuffle at all) or via a
    * groupByKey of the term-filtered runs (tiny shuffle; docstats never move).
    */
  def searchBroadcast(query: String, k: Int, fields: Seq[String] = DefaultFields,
                      fqBc: Option[Broadcast[Array[Long]]] = None,
                      sharedDec: java.util.concurrent.ConcurrentHashMap[
                        (Int, String, String), DecodedBlocks] = null): Array[Hit] = {
    plan(query, fields) match {
      case None => Array.empty
      case Some((cls, idfMap, minMatch, postings)) =>
        val avgLen = meta.avgLen
        val fieldArr = DefaultFields.toArray
        if (postings <= DriverKernelMaxPostings) {
          val nt = normsBc.value // local value; no broadcast needed on driver
          val runs = fetchRuns(idfMap.keySet)
          val excl = Searcher.excludedFn(tombstonesBc.value, fqBc.map(_.value).orNull)
          val localHits = runs.groupBy(_.salt).iterator.flatMap { case (salt, rs) =>
            // batch calls (searchMany) pass a per-call shared decode cache:
            // the batch's queries share head terms, so each (salt, field,
            // term)'s blocks decode once for the whole batch instead of
            // once per query (the distributed path's scoreBatch analog)
            val dec =
              if (sharedDec == null) null
              else rs.groupBy(r => (r.field, r.term)).map { case (k2, arr) =>
                k2 -> sharedDec.computeIfAbsent((salt, k2._1, k2._2),
                  _ => new DecodedBlocks(arr.sortBy(_.salt).flatMap(_.blocks)))
              }
            Kernel.scoreSalt(rs, (fi, d) => nt.quantLen(fi, d),
              cls, fieldArr, idfMap, avgLen, minMatch, k, excl, dec)
          }.toArray
          merge(localHits, k)
        } else {
          val bc = normsBc
          val tsBc = tombstonesBc
          val fqB = fqBc // local val: the closure must not capture `this`
          val localHits = Searcher.gatedJob {
            filteredRuns(idfMap.keySet)
              .groupByKey(_.salt)
              .flatMapGroups { (_, it) =>
                val nt = bc.value
                Kernel.scoreSalt(it.toArray, (fi, d) => nt.quantLen(fi, d),
                  cls, fieldArr, idfMap, avgLen, minMatch, k,
                  Searcher.excludedFn(tsBc.value, fqB.map(_.value).orNull))
              }
              .collect()
          }
          merge(localHits, k)
        }
    }
  }

  /** Batched retrieval — the amortized-throughput shape for batch workloads:
    * ONE Spark job fetches every cache-missing term across the whole batch,
    * then each query runs the standard strategy (driver-local queries become
    * pure cache hits, so per-query marginal cost is just the kernel), fanned
    * out over [[Searcher.kernelPool]] — the kernels are independent
    * CPU-bound scorers, so batch throughput scales with driver cores (every
    * shared structure is concurrent: run cache, LRU dict cache, counters).
    * Results are identical to calling [[search]] per query, in order.
    */
  def searchMany(queries: Seq[String], k: Int,
                 fields: Seq[String] = DefaultFields,
                 fq: Option[String] = None): Seq[Array[Hit]] = {
    // one fq resolution for the whole batch (cached for the next one)
    val fqSet = fq.map(resolveFq)
    if (fqSet.exists(_.count == 0)) return queries.map(_ => Array.empty[Hit])
    val fqBc = fqSet.flatMap(_.sorted)
    // SAME regime router as [[search]]: past the norms/tombstone broadcast
    // bounds every query of the batch must take the shuffle strategy —
    // routing to searchBroadcast there would driver-materialize the very
    // norm table / tombstone array those bounds exist to keep distributed
    val broadcastRegime =
      meta.nDocs <= NormsMaxDocs && tombstoneCount <= TombstonesMaxBroadcast
    // ONE decode cache for the whole batch (thread-safe; kernels fan out
    // over kernelPool): queries sharing terms share the block decode.
    // Memory bound: decoded arrays are ~6× the packed bytes and live for
    // the whole call, so the cache is only used when the batch's SUMMED
    // planned postings (an overcount — shared terms count once per query,
    // so the guard is conservative) stay under a driver-safe cap.
    val plannedPostings = queries.iterator
      .flatMap(q => plan(q, fields)).map(_._4).sum
    val sharedDec =
      if (plannedPostings <= SharedDecodeMaxPostings)
        new java.util.concurrent.ConcurrentHashMap[
          (Int, String, String), DecodedBlocks]()
      else null
    def one(q: String): Array[Hit] =
      if (!broadcastRegime || (fq.isDefined && fqBc.isEmpty))
        searchShuffle(q, k, fields, fq)
      else searchBroadcast(q, k, fields, fqBc, sharedDec)
    val prefetch =
      if (!broadcastRegime) Set.empty[(String, String)]
      else queries.flatMap(q => plan(q, fields)).flatMap {
        case (_, idfMap, _, postings) =>
          if (postings <= DriverKernelMaxPostings) idfMap.keySet
          else Set.empty[(String, String)]
      }.toSet
    if (prefetch.nonEmpty) fetchRuns(prefetch)
    if (queries.lengthCompare(1) <= 0) queries.map(one)
    else {
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration.Duration
      implicit val ec: scala.concurrent.ExecutionContext = Searcher.kernelPool
      Await.result(
        Future.sequence(queries.map(q => Future(one(q)))),
        Duration.Inf)
    }
  }

  /** Bulk retrieval for the SCALE regime — ONE Spark job scores the whole
    * batch. [[searchMany]] amortizes beautifully while the driver kernel
    * exists, but at the 10^12-doc target every query is distributed and the
    * per-query path pays the Spark job floor (~0.2-0.3 s) batch-size times.
    * Here all queries' terms ride one term-filtered scan: runs group by salt
    * as usual, and inside each salt group the kernel runs once PER QUERY
    * over that query's terms' runs ([[Searcher.scoreBatch]]), emitting
    * (queryIdx, Hit); the driver merges per-query top-k. Strategy follows
    * the same router as [[search]]: broadcast norms while they fit, else
    * the docstats cogroup (norms never materialize, tombstones excluded by
    * the distributed anti-join).
    *
    * Results are identical to calling [[search]] per query, in order
    * (BatchSearchSpec gates both shapes bit-for-bit). Cost model: the job
    * reads the union of the batch's posting runs once — queries sharing
    * head terms share the scan — so batch latency tracks total distinct
    * posting volume plus ONE job floor, not batch size.
    */
  def searchManyDistributed(queries: Seq[String], k: Int,
                            fields: Seq[String] = DefaultFields,
                            fq: Option[String] = None): Seq[Array[Hit]] = {
    // ONE fq for the whole batch (the bulk-probe shape: score a million
    // quality queries WITHIN the lang:en slice) — resolved once, riding the
    // job as either the broadcast predicate or the docstats semi-join
    val fqSet = fq.map(resolveFq)
    if (fqSet.exists(_.count == 0)) return queries.map(_ => Array.empty[Hit])
    val fqBcOpt = fqSet.flatMap(_.sorted)
    val fqSemiJoin = fq.isDefined && fqBcOpt.isEmpty
    val planned = queries.map(q => plan(q, fields))
    val plans = planned.zipWithIndex.collect {
      case (Some((cls, idf, mm, _)), qi) => BatchPlan(qi, cls, idf, mm)
    }.toArray
    if (plans.isEmpty) return queries.map(_ => Array.empty[Hit])
    val allKeys = plans.iterator.flatMap(_.idfMap.keySet).toSet
    val fieldArr = DefaultFields.toArray
    val avgLen = meta.avgLen
    val kk = k
    val plansBc = spark.sparkContext.broadcast(plans)
    val tagged: Array[(Int, Hit)] =
      try {
        if (!fqSemiJoin &&
            meta.nDocs <= NormsMaxDocs && tombstoneCount <= TombstonesMaxBroadcast) {
          val bc = normsBc
          val tsBc = tombstonesBc
          val fqB = fqBcOpt // local val: the closure must not capture `this`
          // r7 note: a plan-chunked variant (split the batch's plans across
          // (chunk, salt) tasks to smooth the 2.8× max/median salt-collision
          // tail, guide §2.6) was built and MEASURED WORSE here — 245.8 →
          // 238.0 q/s at 32 cores: duplicating the run stream per chunk
          // forfeits the per-task shared-decode cache (task CPU 80 → 86 s)
          // and the packing gain never covered it. Reverted; the one-task-
          // per-salt-hash shape stands.
          Searcher.gatedJob {
            filteredRuns(allKeys, batch = true)
              .groupByKey(_.salt)
              .flatMapGroups { (_, it) =>
                val nt = bc.value
                Searcher.scoreBatch(it.toArray, plansBc.value,
                  (fi, d) => nt.quantLen(fi, d), fieldArr, avgLen, kk,
                  Searcher.excludedFn(tsBc.value, fqB.map(_.value).orNull))
              }
              .collect()
          }
        } else {
          // big-fq regime: the PERSISTED resolution semi-joins docstats
          // (resolve-once); a broadcastable fq that lands here because the
          // corpus routed to shuffle rides the kernel predicate instead
          Searcher.shuffleScore(batchQuerySession, indexDir,
            filteredRuns(allKeys, batch = true),
            fqSet.flatMap(_.docs), fqBcOpt,
            (rs, ql, excl) =>
              Searcher.scoreBatch(rs, plansBc.value, ql, fieldArr, avgLen, kk, excl))
        }
      } finally Searcher.destroyQuietly(plansBc)
    val tops = Array.fill(queries.length)(new TopK(k))
    tagged.foreach { case (qi, h) => tops(qi).offer(h) }
    tops.map(_.sortedHits).toSeq
  }

  /** Scale strategy: cogroup runs with docstats by salt range (no broadcast).
    * Tombstones here are FULLY DISTRIBUTED: the docstats side is anti-joined
    * against the tombstone table before the cogroup (both keyed by docId —
    * AQE picks broadcast vs shuffle), so a posting with no surviving
    * docstats row is a deleted doc and is skipped in the kernel. Nothing
    * about deletes ever reaches the driver — the mass delete-by-query
    * regime.
    */
  def searchShuffle(query: String, k: Int, fields: Seq[String] = DefaultFields,
                    fq: Option[String] = None): Array[Hit] = {
    // fq on the shuffle strategy, two shapes: a broadcastable set rides the
    // kernel as the sorted-array predicate (no extra join at all); a bigger
    // set SEMI-joins the docstats side from its PERSISTED resolution
    // (resolve-once, like Solr's filterCache), so "no surviving docstats
    // row" uniformly means tombstoned OR filtered out
    val fqSet = fq.map(resolveFq)
    if (fqSet.exists(_.count == 0)) return Array.empty
    val fqB = fqSet.flatMap(_.sorted)
    plan(query, fields) match {
      case None => Array.empty
      case Some((cls, idfMap, minMatch, _)) =>
        val avgLen = meta.avgLen
        val fieldArr = DefaultFields.toArray
        val localHits = Searcher.shuffleScore(querySession, indexDir,
          filteredRuns(idfMap.keySet), fqSet.flatMap(_.docs), fqB,
          (rs, ql, excl) => Kernel.scoreSalt(rs, ql, cls, fieldArr, idfMap,
            avgLen, minMatch, k, excl))
        merge(localHits, k)
    }
  }

  private def merge(localHits: Array[Hit], k: Int): Array[Hit] = {
    val top = new TopK(k)
    localHits.foreach(top.offer)
    top.sortedHits
  }

  /** Hits joined with document identity — the user-facing result shape
    * (`fl=*,score`, /root/reference/solr/config/solrconfig.xml:124-127).
    */
  def searchDF(query: String, k: Int, fields: Seq[String] = DefaultFields,
               fq: Option[String] = None): DataFrame = {
    val hits = search(query, k, fields, fq)
    val hitsDF = spark.createDataFrame(hits.zipWithIndex.map { case (h, i) =>
      (h.docId, h.score, i + 1)
    }).toDF("docId", "score", "rank")
    val docs = spark.read.parquet(s"$indexDir/docstats")
      .select("docId", "repo", "path", "commit", "lang", "sha")
    docs.join(broadcast(hitsDF), "docId")
      .orderBy($"rank")
      .select("rank", "docId", "score", "repo", "path", "commit", "lang", "sha")
  }

  // ---- multi-fq overloads: repeated filter queries INTERSECT (Solr's
  // repeated `fq` params — Blacklight sends visibility AND type filters
  // together, solrconfig.xml:79-143 consumers). Components resolve and
  // cache individually (filterCache semantics); the intersection caches
  // under a canonical composite key (trimmed/deduped/sorted), so
  // Seq(a, b) and Seq(b, a) share one entry. ----

  def search(query: String, k: Int, fields: Seq[String],
             fqs: Seq[String]): Array[Hit] =
    search(query, k, fields, Searcher.combineFqParams(fqs))

  def searchMany(queries: Seq[String], k: Int, fields: Seq[String],
                 fqs: Seq[String]): Seq[Array[Hit]] =
    searchMany(queries, k, fields, Searcher.combineFqParams(fqs))

  def searchManyDistributed(queries: Seq[String], k: Int, fields: Seq[String],
                            fqs: Seq[String]): Seq[Array[Hit]] =
    searchManyDistributed(queries, k, fields, Searcher.combineFqParams(fqs))

  def searchDF(query: String, k: Int, fields: Seq[String],
               fqs: Seq[String]): DataFrame =
    searchDF(query, k, fields, Searcher.combineFqParams(fqs))
}

object Searcher {
  /** Separator of the canonical multi-fq composite key (Solr semantics:
    * repeated `fq` params INTERSECT — Blacklight sends visibility AND type
    * filters together). NUL-framed so no Q1-grammar filter string can
    * contain it; components are trimmed/deduped/sorted first so
    * `Seq(a, b)` and `Seq(b, a)` share one cache entry.
    */
  private[query] val FqAndSep = "\u0000&&\u0000"

  /** Canonicalize repeated fq params into the composite form the
    * resolve/cache layer understands (None when no non-empty filter).
    */
  def combineFqParams(fqs: Seq[String]): Option[String] = {
    val norm = fqs.map(_.trim).filter(_.nonEmpty).distinct.sorted
    if (norm.isEmpty) None else Some(norm.mkString(FqAndSep))
  }

  /** Two-pointer intersection of sorted docId arrays (the small-regime
    * multi-fq combine — Solr's docset ∩ docset).
    */
  private[query] def intersectSorted(a: Array[Long], b: Array[Long]): Array[Long] = {
    val out = new Array[Long](math.min(a.length, b.length))
    var i = 0; var j = 0; var n = 0
    while (i < a.length && j < b.length) {
      if (a(i) < b(j)) i += 1
      else if (a(i) > b(j)) j += 1
      else { out(n) = a(i); n += 1; i += 1; j += 1 }
    }
    java.util.Arrays.copyOf(out, n)
  }

  /** Sorted-array tombstone membership — STATIC so executor lambdas that
    * use it capture the (small) array, never the Searcher instance.
    */
  private[query] def deletedFn(ts: Array[Long]): Long => Boolean =
    if (ts.isEmpty) _ => false
    else d => java.util.Arrays.binarySearch(ts, d) >= 0

  /** Kernel exclusion predicate: tombstoned OR (when an fq rides along)
    * outside the filter's sorted docId set. STATIC like [[deletedFn]] so
    * executor closures capture two small arrays, never a Searcher.
    */
  private[query] def excludedFn(ts: Array[Long], fqSorted: Array[Long]): Long => Boolean = {
    val del = deletedFn(ts)
    if (fqSorted == null) del
    else d => del(d) || java.util.Arrays.binarySearch(fqSorted, d) < 0
  }

  /** SQL conf applied to every searcher's dedicated query session (read at
    * that searcher's first kernel job; set before constructing searchers to
    * override). Default: keep AQE but drop the partition-coalescing floor
    * so the parallelism-first target is total/cores — posting runs are
    * COMPRESSED, and the 1 MB byte floor was collapsing kernel stages to a
    * handful of tasks (see [[Searcher.querySession]]'s scaladoc).
    */
  @volatile var QuerySessionConf: Map[String, String] =
    Map("spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "16kb")

  private[query] def newQuerySession(spark: SparkSession): SparkSession = {
    val s = spark.newSession()
    QuerySessionConf.foreach { case (k, v) => s.conf.set(k, v) }
    s
  }

  /** Extra conf for the BATCH query session on top of [[QuerySessionConf]]
    * (set before constructing searchers to override). The batch kernel is a
    * throughput stage: several even scheduling waves of small tasks beat the
    * latency-optimal one-wave shape — a task count of ~1.25x cores leaves
    * most cores idle for the whole second wave (measured: 40 tasks at 32
    * cores = wall 2x median task). Floors the post-shuffle coalesce at
    * 4x parallelism with enough initial partitions to coalesce DOWN from;
    * the index's salt-group count caps the effective fan-out.
    */
  @volatile var BatchSessionConf: Map[String, String] = Map.empty

  private[query] def newBatchSession(spark: SparkSession): SparkSession = {
    val s = spark.newSession()
    val p = spark.sparkContext.defaultParallelism
    QuerySessionConf.foreach { case (k, v) => s.conf.set(k, v) }
    s.conf.set("spark.sql.adaptive.coalescePartitions.minPartitionNum", (4 * p).toString)
    s.conf.set("spark.sql.adaptive.coalescePartitions.initialPartitionNum", (32 * p).toString)
    BatchSessionConf.foreach { case (k, v) => s.conf.set(k, v) }
    s
  }

  /** Destroy a broadcast, swallowing only NON-fatal failures (a broadcast
    * already destroyed elsewhere, a stopped context); InterruptedException
    * re-flags the thread so callers see the interrupt.
    */
  private[query] def destroyQuietly(bc: Broadcast[_]): Unit =
    try bc.destroy() catch {
      case _: InterruptedException => Thread.currentThread().interrupt()
      case scala.util.control.NonFatal(_) =>
    }

  /** Cap on CONCURRENT Spark-job-launching queries across all searchers in
    * this JVM. [[Searcher.searchMany]]/[[MultiSearcher.searchMany]] fan
    * queries across [[kernelPool]] (driver cores) — right for the CPU-bound
    * driver kernels, but a batch whose queries fall through to a distributed
    * strategy would otherwise launch up to ncores concurrent Spark ACTIONS, a
    * thundering herd on the scheduler (head-term jobs serialize on executor
    * slots anyway, so concurrency past a few buys nothing and inflates every
    * job's wall time). Driver-kernel queries never touch this gate.
    */
  val MaxConcurrentDistributedQueries: Int =
    math.min(4, math.max(2, Runtime.getRuntime.availableProcessors() / 8))
  private val distributedGate =
    new java.util.concurrent.Semaphore(MaxConcurrentDistributedQueries, true)
  private val inFlightDistributed = new java.util.concurrent.atomic.AtomicInteger(0)
  /** High-water mark of concurrent gated job launches (test/telemetry). */
  private[graft] val maxInFlightObserved = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Run one distributed-query Spark action under the global gate. NOT for
    * nested use — the body must not itself acquire the gate (it does not:
    * gated sections are leaf `.collect()` actions).
    */
  private[query] def gatedJob[T](body: => T): T = {
    distributedGate.acquire()
    val n = inFlightDistributed.incrementAndGet()
    maxInFlightObserved.updateAndGet(m => math.max(m, n))
    try body
    finally { inFlightDistributed.decrementAndGet(); distributedGate.release() }
  }

  /** The docstats-cogroup scoring job shared by every shuffle-strategy
    * route (single-query, batched, and the MultiSearcher segment analogs —
    * formerly four hand-copies): term-filtered runs cogroup with the
    * segment's docstats BY SALT RANGE after tombstones (anti-join) and any
    * big-fq match set (semi-join) filter the docstats side; `score` runs
    * once per salt group against an injected quantized-length lookup and
    * the exclusion predicate ("no surviving docstats row" = tombstoned or
    * filtered out; a broadcastable fq rides the predicate instead). Per-
    * task memory is one salt range of docstats — corpus-size independent.
    * STATIC so the task closure captures `score`'s locals only, never a
    * searcher; `score` itself must capture only local vals/broadcasts.
    */
  private[query] def shuffleScore[T](
      session: SparkSession, dir: String,
      runs: Dataset[PostingRun],
      fqDocs: Option[DataFrame],
      fqSorted: Option[Broadcast[Array[Long]]],
      score: (Array[PostingRun], (Int, Long) => Int, Long => Boolean) => Iterator[T])(
      implicit enc: org.apache.spark.sql.Encoder[T]): Array[T] = {
    import session.implicits._
    val stats = fqDocs.foldLeft(
        graft.index.Tombstones.exclude(session, dir,
          session.read.parquet(s"$dir/docstats")
            .select($"docId", $"salt", $"lenContent", $"lenPath", $"lenRepo"))) {
        (df, cached) => df.join(cached, Seq("docId"), "left_semi")
      }
      .as[(Long, Int, Int, Int, Int)]
    val fqB = fqSorted
    gatedJob {
      runs.groupByKey(_.salt)
        .cogroup(stats.groupByKey(_._2)) { case (_, runIt, statIt) =>
          val rs = runIt.toArray
          if (rs.isEmpty) Iterator.empty
          else {
            val arr = statIt.toArray
            val ids = new mutable.HashMap[Long, Int]()
            arr.indices.foreach(ix => ids.update(arr(ix)._1, ix))
            def ql(fi: Int, d: Long): Int = ids.get(d) match {
              case Some(ix) =>
                val len = fi match {
                  case 0 => arr(ix)._3
                  case 1 => arr(ix)._4
                  case _ => arr(ix)._5
                }
                SmallFloat.quantizeLength(len)
              case None => 1 // tombstoned/filtered: excluded below
            }
            val fqArr = fqB.map(_.value).orNull
            score(rs, ql, d => !ids.contains(d) ||
              (fqArr != null && java.util.Arrays.binarySearch(fqArr, d) < 0))
          }
        }
        .collect()
    }
  }

  /** Score every plan of a batch against ONE salt group's runs — the
    * executor-side kernel of [[Searcher.searchManyDistributed]]. Runs are
    * grouped by (field, term) once; each plan scores only its own terms'
    * runs (plans sharing a term share the decoded group). STATIC: the
    * flatMapGroups closure must capture plans/norm/tombstone broadcasts
    * only, never a Searcher.
    */
  private[graft] def scoreBatch(
      runs: Array[PostingRun],
      plans: Array[BatchPlan],
      quantLenOf: (Int, Long) => Int,
      fields: Array[String],
      avgLen: Map[String, Double],
      k: Int,
      deleted: Long => Boolean): Iterator[(Int, Hit)] = {
    if (runs.isEmpty) Iterator.empty
    else {
      val byKey = runs.groupBy(r => (r.field, r.term))
      // ONE decoded-block cache per (field, term) for the WHOLE batch:
      // queries sharing a term share the decode (lazily, block-at-a-time —
      // blocks every query skips never decode). Without this, each of the
      // batch's plans re-decoded the shared head terms' blocks from
      // scratch (measured ~80× redundant decode per salt task at batch
      // 1024 over the bench vocabulary).
      val decCache: Map[(String, String), DecodedBlocks] =
        byKey.map { case (key, rs) =>
          key -> new DecodedBlocks(rs.sortBy(_.salt).flatMap(_.blocks))
        }
      plans.iterator.flatMap { p =>
        if (!p.idfMap.keysIterator.exists(byKey.contains)) Iterator.empty
        else Kernel.scoreSalt(EmptyRuns, quantLenOf, p.clauses, fields, p.idfMap,
          avgLen, p.minMatch, k, deleted, decCache, byKey).map(h => (p.qi, h))
      }
    }
  }

  private val EmptyRuns: Array[PostingRun] = Array.empty

  /** Shared bounded pool for [[Searcher.searchMany]]'s per-query kernel
    * fan-out, sized to the driver's cores (the kernels are CPU-bound).
    * Daemon threads — never blocks JVM exit.
    */
  private[query] lazy val kernelPool: scala.concurrent.ExecutionContextExecutorService =
    scala.concurrent.ExecutionContext.fromExecutorService(
      java.util.concurrent.Executors.newFixedThreadPool(
        math.max(2, Runtime.getRuntime.availableProcessors()),
        (r: Runnable) => {
          val t = new Thread(r, "graft-searchmany")
          t.setDaemon(true)
          t
        }))
}

/** The per-salt-range scoring kernel. Pure Scala over primitive arrays — the
  * idiomatic high-performance escape hatch (SURVEY.md §4). DAAT with WAND
  * threshold pruning: clauses are scored document-at-a-time; norm lookup is
  * injected (broadcast dense table or cogrouped docstats slice).
  */
object Kernel extends Serializable {

  /** One posting iterator per (clause, field); duplicate (field, term) pairs
    * get independent iterators (Lucene scores duplicate clauses
    * independently). Object-level (not a per-call local class) so the WAND
    * sort comparator below can be ONE shared instance instead of a lambda
    * allocated per scoreSalt call — the batch kernel calls scoreSalt
    * ~batch × saltGroups times per job.
    */
  private final class Leg(val clauseIdx: Int, val fi: Int, val idf: Double,
                          val it: PostingIterator, val ub: Double) {
    // current block's upper bound, cached per block index (the shallow
    // bound is consulted once per pivot round; blocks advance rarely)
    private var ubBlockIdx = -1
    private var ubBlock = 0.0
    def blockUb(avg: Double): Double = {
      val b = it.curBlockIndex
      if (b != ubBlockIdx) {
        ubBlockIdx = b
        ubBlock = BM25.maxTermScore(idf, it.curBlockMaxTf, it.curBlockMinQuantLen, avg)
      }
      ubBlock
    }
  }

  private val LegByDoc: java.util.Comparator[Leg] =
    (a: Leg, b: Leg) => java.lang.Long.compare(a.it.curDoc, b.it.curDoc)

  /** Score all postings of one salt range. `runs` must all share one salt.
    * `quantLenOf(fieldIdx, docId)` returns the SmallFloat-quantized length.
    */
  def scoreSalt(
      runs: Array[PostingRun],
      quantLenOf: (Int, Long) => Int,
      clauses: Array[Clause],
      fields: Array[String],
      idfMap: Map[(String, String), Double],
      avgLen: Map[String, Double],
      minMatch: Int,
      k: Int,
      deleted: Long => Boolean = _ => false,
      decCache: Map[(String, String), DecodedBlocks] = null,
      byKeyPre: Map[(String, String), Array[PostingRun]] = null): Iterator[Hit] = {

    // byKeyPre: the batch kernel passes ONE prebuilt (field, term) lookup
    // for the whole salt group instead of re-grouping per plan (the groupBy
    // allocated tuples + maps batch × saltGroups times per job)
    val byKey =
      if (byKeyPre != null) byKeyPre else runs.groupBy(r => (r.field, r.term))
    if (byKey.isEmpty) return Iterator.empty
    val fieldIdx: Map[String, Int] = fields.zipWithIndex.toMap
    val avgArr: Array[Double] = fields.map(avgLen)

    val legs = mutable.ArrayBuffer.empty[Leg]
    var ci = 0
    while (ci < clauses.length) {
      val c = clauses(ci)
      c.perField.foreach { case (f, term) =>
        val key = (f, term)
        (byKey.get(key), idfMap.get(key)) match {
          case (Some(rs), Some(idf)) =>
            val maxTf = rs.map(_.maxTf).max
            val minQL = rs.flatMap(_.blocks).map(_.minQuantLen).min
            val ub = BM25.maxTermScore(idf, maxTf, minQL, avgLen(f))
            val cached = if (decCache != null) decCache.getOrElse(key, null) else null
            legs += new Leg(ci, fieldIdx(f), idf, new PostingIterator(rs, cached), ub)
          case _ =>
        }
      }
      ci += 1
    }
    if (legs.isEmpty) return Iterator.empty

    val clauseUb = new Array[Double](clauses.length)
    legs.groupBy(_.clauseIdx).foreach { case (cIdx, ls) =>
      clauseUb(cIdx) = BM25.dismax(ls.map(_.ub).toArray)
    }
    val totalUb = clauseUb.sum

    val top = new TopK(k)
    val perClausePerField = Array.ofDim[Double](clauses.length, fields.length)
    val clauseTouched = new Array[Boolean](clauses.length)

    // ---- block-max WAND main loop ----
    // Invariant: every live leg's iterator is positioned at the first
    // posting >= any docId already processed, so a doc d can only match
    // legs with curDoc <= d. Each round:
    //   1. sort live legs by curDoc;
    //   2. pivot = first prefix whose summed upper bounds EXCEED the heap
    //      threshold (no prefix can -> terminate: later docs only shrink
    //      the reachable bound, and score ties lose to earlier docIds);
    //   3. if the lowest leg already sits on the pivot doc, score it fully
    //      (mm gate applies at scoring); otherwise skipTo(pivot) the legs
    //      before it — whole blocks are skipped via their lastDoc metadata
    //      ([[PostingIterator.skipTo]]), which is the "block-max" part.
    // r7: the live-leg set is managed IN PLACE (length `liveLen`, compacted
    // only when a leg exhausts) — the previous `live.filter(...)` per round
    // allocated a fresh array every WAND round (hundreds of millions of
    // allocations per 1024-query batch; StageMetrics showed ~10 GC-s per
    // timed leg), and the sort comparator is a shared static instead of a
    // per-call lambda.
    val live = legs.toArray
    var liveLen = live.length
    locally {
      var w = 0; var r = 0
      while (r < liveLen) {
        if (!live(r).it.exhausted) { live(w) = live(r); w += 1 }
        r += 1
      }
      liveLen = w
    }
    var done = liveLen == 0
    while (!done) {
      java.util.Arrays.sort(live, 0, liveLen, LegByDoc)
      val theta = top.threshold
      // pivot = first prefix (always at least one leg) whose summed upper
      // bounds exceed theta
      var acc = live(0).ub
      var p = 1
      while (p < liveLen && !(acc > theta)) { acc += live(p).ub; p += 1 }
      if (!(acc > theta)) done = true // even all remaining legs can't beat theta
      else {
        val pivotDoc = live(p - 1).it.curDoc
        // ---- BMW shallow check (Ding & Suel): refine the term-level
        // prefix bound with the CURRENT blocks' (maxTf, minQuantLen) upper
        // bounds. For each leg that can contribute to pivotDoc (curDoc <=
        // pivot): if its current block CONTAINS the pivot (lastDoc >=
        // pivot) use the block's exact bound, else fall back to the term
        // bound (the pivot would land in a later, unseen block). When even
        // that sum can't beat theta, no doc in [pivotDoc, spanEnd] can
        // enter the top-k, where spanEnd = min(contained blocks' lastDoc,
        // next leg's curDoc - 1) — every block bound is valid through its
        // lastDoc, term bounds are valid everywhere, and legs beyond
        // nextLegDoc contribute nothing before it. Skip the WHOLE span
        // without decoding a single tf. Score ties are safe for the same
        // reason as the pivot terminator: a later doc with score == theta
        // has a larger docId and loses the tie.
        var bs = 0.0
        var contained = Long.MaxValue // min lastDoc among pivot-containing blocks
        var si = 0
        while (si < liveLen && live(si).it.curDoc <= pivotDoc) {
          val leg = live(si)
          if (leg.it.curBlockLastDoc >= pivotDoc) {
            bs += leg.blockUb(avgArr(leg.fi))
            if (leg.it.curBlockLastDoc < contained) contained = leg.it.curBlockLastDoc
          } else bs += leg.ub
          si += 1
        }
        if (contained != Long.MaxValue && !(bs > theta)) {
          val nextLegDoc = if (si < liveLen) live(si).it.curDoc else Long.MaxValue
          val spanEnd =
            if (nextLegDoc == Long.MaxValue) contained
            else math.min(contained, nextLegDoc - 1)
          // spanEnd >= pivotDoc (contained >= pivot by containment;
          // nextLegDoc > pivot by the sort), so this always advances
          val next = spanEnd + 1
          var li = 0
          while (li < liveLen && live(li).it.curDoc < next) {
            live(li).it.skipTo(next)
            li += 1
          }
        } else if (live(0).it.curDoc == pivotDoc) {
          // all legs at pivotDoc are within live(0..p-1..); score fully
          var matched = 0
          var score = 0.0
          java.util.Arrays.fill(clauseTouched, false)
          var li = 0
          while (li < liveLen && live(li).it.curDoc == pivotDoc) {
            val leg = live(li)
            val norm = BM25.lengthNorm(quantLenOf(leg.fi, pivotDoc), avgArr(leg.fi))
            perClausePerField(leg.clauseIdx)(leg.fi) =
              BM25.termScore(leg.idf, leg.it.curTf, norm)
            clauseTouched(leg.clauseIdx) = true
            li += 1
          }
          var c2 = 0
          while (c2 < clauses.length) {
            if (clauseTouched(c2)) {
              matched += 1
              score += BM25.dismax(perClausePerField(c2))
              java.util.Arrays.fill(perClausePerField(c2), 0.0)
            }
            c2 += 1
          }
          // tombstoned docs are skipped HERE (not post-filtered) so the
          // top-k never under-fills because deleted docs held slots
          if (matched >= minMatch && !deleted(pivotDoc)) top.offer(Hit(pivotDoc, score))
          li = 0
          while (li < liveLen && live(li).it.curDoc == pivotDoc) {
            live(li).it.advance()
            li += 1
          }
        } else {
          // advance the legs below the pivot up to it (block-skipping)
          var li = 0
          while (li < liveLen && live(li).it.curDoc < pivotDoc) {
            live(li).it.skipTo(pivotDoc)
            li += 1
          }
        }
        // in-place compaction of exhausted legs — no per-round allocation
        var w2 = 0; var r2 = 0
        while (r2 < liveLen) {
          if (!live(r2).it.exhausted) { live(w2) = live(r2); w2 += 1 }
          r2 += 1
        }
        liveLen = w2
        if (liveLen == 0) done = true
      }
    }
    top.sortedHits.iterator
  }
}
