package graft.query

import graft.analysis.Analyzer
import graft.core._
import graft.index.{IndexMeta, Snapshot}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** One parsed edismax clause: a query word and its per-field analyzed term.
  * Mirrors Lucene edismax structure: per word, a DisjunctionMax over qf
  * fields; words combine as a boolean OR gated by minimum-should-match
  * (/root/reference/solr/config/solrconfig.xml:84-106).
  */
case class Clause(word: String, perField: Map[String, String])

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

/** Lazy block-at-a-time posting iterator over one (field, term)'s runs within
  * one salt range. Runs arrive salt-sorted; blocks decode on demand — the
  * block-skipping entry points (`skipToBlockContaining`, `blockMaxTf`) are
  * what block-max WAND prunes with.
  */
final class PostingIterator(runs: Array[PostingRun]) {
  private val blocks: Array[PostingBlock] = runs.sortBy(_.salt).flatMap(_.blocks)
  private var bi = 0 // current block
  private var i = 0 // position within decoded block
  private var docs: Array[Long] = _
  private var tfs: Array[Int] = _
  decodeCurrent()

  private def decodeCurrent(): Unit = {
    if (bi < blocks.length) {
      val b = blocks(bi)
      docs = Codec.decodeDocIds(b.docsDelta, b.n)
      tfs = Codec.decodeTfs(b.tfs, b.n)
      i = 0
    } else { docs = null; tfs = null }
  }

  def exhausted: Boolean = docs == null
  def curDoc: Long = docs(i)
  def curTf: Int = tfs(i)

  def advance(): Unit = {
    i += 1
    if (i >= docs.length) { bi += 1; decodeCurrent() }
  }

  /** Skip forward to the first posting with docId >= target, skipping whole
    * blocks via their lastDoc metadata (decodes only the landing block).
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
    while (i < docs.length && docs(i) < target) i += 1
    if (i >= docs.length) { bi += 1; decodeCurrent(); if (!exhausted) skipTo(target) }
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

/** Top-k retrieval over a built index (SURVEY.md §3.2 step 5):
  * query terms -> dictionary lookup (broadcast-sized) -> posting runs
  * cogrouped with docstats BY SALT RANGE -> per-range DAAT/WAND kernel ->
  * per-range top-k -> driver merge. One collect boundary; no shuffle of
  * postings (runs and docstats are co-partitioned by construction).
  */
class Searcher(spark: SparkSession, indexDir: String) extends Serializable {
  import spark.implicits._

  val meta: IndexMeta = IndexMeta.fromProps(new Snapshot(indexDir).readProps())
  val DefaultFields: Seq[String] = Seq("content", "path", "repo")

  private def dictLookup(pairs: Set[(String, String)]): Map[(String, String), Long] = {
    val terms = pairs.map(_._2).toSeq
    val fields = pairs.map(_._1).toSeq
    spark.read.parquet(s"$indexDir/dictionary")
      .filter($"term".isin(terms: _*) && $"field".isin(fields: _*))
      .select($"field", $"term", $"df")
      .collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2)))
      .toMap
      .filter { case (k, _) => pairs.contains(k) }
  }

  def search(query: String, k: Int, fields: Seq[String] = DefaultFields): Array[Hit] = {
    val cls = QueryPlan.clauses(query, fields)
    if (cls.isEmpty) return Array.empty
    val needed: Set[(String, String)] = cls.flatMap(_.perField.toSeq).toSet
    val dfMap = dictLookup(needed)
    if (dfMap.isEmpty) return Array.empty

    val n = meta.nDocs
    // idf per (field, term); avgLen per field — global stats, broadcast-sized
    val idfMap: Map[(String, String), Double] = dfMap.map { case (k2, df) => k2 -> BM25.idf(n, df) }
    val avgLen = meta.avgLen
    val minMatch = BM25.minShouldMatch(cls.length)
    val clausesB = cls
    val fieldsB = fields.toArray
    val kB = k

    val termList = needed.map(_._2).toSeq
    val fieldList = needed.map(_._1).toSeq
    val runs = spark.read.parquet(s"$indexDir/postings")
      .filter($"term".isin(termList: _*) && $"field".isin(fieldList: _*))
      .as[PostingRun]
    val stats = spark.read.parquet(s"$indexDir/docstats")
      .select($"docId", $"salt", $"lenContent", $"lenPath", $"lenRepo")
      .as[(Long, Int, Int, Int, Int)]

    val localHits: Array[Hit] = runs.groupByKey(_.salt)
      .cogroup(stats.groupByKey(_._2)) { case (_, runIt, statIt) =>
        Kernel.scoreRange(runIt, statIt, clausesB, fieldsB, idfMap, avgLen, minMatch, kB)
      }
      .collect()

    val top = new TopK(k)
    localHits.foreach(top.offer)
    top.sortedHits
  }

  /** Hits joined with document identity — the user-facing result shape
    * (`fl=*,score`, /root/reference/solr/config/solrconfig.xml:124-127).
    */
  def searchDF(query: String, k: Int, fields: Seq[String] = DefaultFields): DataFrame = {
    val hits = search(query, k, fields)
    val hitsDF = spark.createDataFrame(hits.zipWithIndex.map { case (h, i) =>
      (h.docId, h.score, i + 1)
    }).toDF("docId", "score", "rank")
    val docs = spark.read.parquet(s"$indexDir/docstats")
      .select("docId", "repo", "path", "commit", "lang", "sha")
    docs.join(broadcast(hitsDF), "docId")
      .orderBy($"rank")
      .select("rank", "docId", "score", "repo", "path", "commit", "lang", "sha")
  }
}

/** The per-salt-range scoring kernel. Pure Scala over primitive arrays — the
  * idiomatic high-performance escape hatch (SURVEY.md §4). DAAT with WAND
  * threshold pruning: clauses are scored document-at-a-time; a candidate is
  * skipped without norm lookups when the sum of clause upper bounds cannot
  * beat the current heap threshold.
  */
object Kernel extends Serializable {

  def scoreRange(
      runIt: Iterator[PostingRun],
      statIt: Iterator[(Long, Int, Int, Int, Int)],
      clauses: Array[Clause],
      fields: Array[String],
      idfMap: Map[(String, String), Double],
      avgLen: Map[String, Double],
      minMatch: Int,
      k: Int): Iterator[Hit] = {

    // group runs by (field, term)
    val byKey = mutable.HashMap.empty[(String, String), mutable.ArrayBuffer[PostingRun]]
    runIt.foreach { r =>
      byKey.getOrElseUpdate((r.field, r.term), mutable.ArrayBuffer.empty) += r
    }
    if (byKey.isEmpty) return Iterator.empty

    // docstats arrays for this range, sorted by docId
    val statsArr = statIt.toArray.sortBy(_._1)
    val nd = statsArr.length
    val docIds = new Array[Long](nd)
    val lens = Array.ofDim[Int](fields.length, nd)
    val fieldIdx: Map[String, Int] = fields.zipWithIndex.toMap
    var si = 0
    while (si < nd) {
      val (d, _, lc, lp, lr) = statsArr(si)
      docIds(si) = d
      fieldIdx.get("content").foreach(fi => lens(fi)(si) = lc)
      fieldIdx.get("path").foreach(fi => lens(fi)(si) = lp)
      fieldIdx.get("repo").foreach(fi => lens(fi)(si) = lr)
      si += 1
    }
    val norms: Array[Array[Double]] = fields.map { f =>
      val fi = fieldIdx(f)
      val avg = avgLen(f)
      val cache = new Array[Double](256) // one lengthNorm per possible norm byte
      var ci = 0
      while (ci < 256) {
        cache(ci) = BM25.lengthNorm(SmallFloat.byte4ToInt(ci.toByte), avg)
        ci += 1
      }
      val out = new Array[Double](nd)
      var di = 0
      while (di < nd) {
        out(di) = cache(java.lang.Byte.toUnsignedInt(SmallFloat.intToByte4(lens(fi)(di))))
        di += 1
      }
      out
    }

    def normOf(fi: Int, docId: Long): Double = {
      var lo = 0
      var hi = nd - 1
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        val v = docIds(mid)
        if (v == docId) return norms(fi)(mid)
        else if (v < docId) lo = mid + 1
        else hi = mid - 1
      }
      // doc present in postings must exist in docstats; defensive default
      BM25.lengthNorm(0, avgLen(fields(fi)))
    }

    // one posting iterator per (clause, field) that has an indexed term here;
    // duplicate (field, term) pairs share nothing mutable but blocks decode
    // independently per clause (Lucene scores duplicate clauses independently).
    case class Leg(clauseIdx: Int, fi: Int, idf: Double, it: PostingIterator, ub: Double)
    val legs = mutable.ArrayBuffer.empty[Leg]
    var ci = 0
    while (ci < clauses.length) {
      val c = clauses(ci)
      c.perField.foreach { case (f, term) =>
        val key = (f, term)
        (byKey.get(key), idfMap.get(key)) match {
          case (Some(rs), Some(idf)) =>
            val runsArr = rs.toArray
            val maxTf = runsArr.map(_.maxTf).max
            val minQL = runsArr.flatMap(_.blocks).map(_.minQuantLen).min
            val ub = BM25.maxTermScore(idf, maxTf, minQL, avgLen(f))
            legs += Leg(ci, fieldIdx(f), idf, new PostingIterator(runsArr), ub)
          case _ =>
        }
      }
      ci += 1
    }
    if (legs.isEmpty) return Iterator.empty

    // per-clause upper bound (dismax over its field legs) for WAND pruning
    val clauseUb = new Array[Double](clauses.length)
    legs.groupBy(_.clauseIdx).foreach { case (cIdx, ls) =>
      clauseUb(cIdx) = BM25.dismax(ls.map(_.ub).toArray)
    }
    val totalUb = clauseUb.sum

    val top = new TopK(k)
    val legArr = legs.toArray
    val perClausePerField = Array.ofDim[Double](clauses.length, fields.length)
    val clauseTouched = new Array[Boolean](clauses.length)

    var active = legArr.count(!_.it.exhausted)
    while (active > 0) {
      // candidate = min current doc across non-exhausted legs
      var cand = Long.MaxValue
      var li = 0
      while (li < legArr.length) {
        val leg = legArr(li)
        if (!leg.it.exhausted && leg.it.curDoc < cand) cand = leg.it.curDoc
        li += 1
      }
      if (cand == Long.MaxValue) return finish(top)

      // WAND-style prune: skip scoring when even all clauses at max can't beat θ
      val theta = top.threshold
      val prune = totalUb <= theta

      var matched = 0
      var score = 0.0
      if (!prune) {
        java.util.Arrays.fill(clauseTouched, false)
        li = 0
        while (li < legArr.length) {
          val leg = legArr(li)
          if (!leg.it.exhausted && leg.it.curDoc == cand) {
            perClausePerField(leg.clauseIdx)(leg.fi) =
              BM25.termScore(leg.idf, leg.it.curTf, normOf(leg.fi, cand))
            clauseTouched(leg.clauseIdx) = true
          }
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
        if (matched >= minMatch) top.offer(Hit(cand, score))
      }

      // advance all legs positioned at cand
      li = 0
      active = 0
      while (li < legArr.length) {
        val leg = legArr(li)
        if (!leg.it.exhausted && leg.it.curDoc == cand) leg.it.advance()
        if (!leg.it.exhausted) active += 1
        li += 1
      }
    }
    finish(top)
  }

  private def finish(top: TopK): Iterator[Hit] = top.sortedHits.iterator
}
