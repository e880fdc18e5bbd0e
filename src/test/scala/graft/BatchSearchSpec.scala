package graft

import graft.core.Hit
import graft.corpus.CodeCorpus
import graft.index.{IndexBuilder, IndexConfig}
import graft.query.{MultiSearcher, Searcher}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Distributed batched retrieval (VERDICT r4 #1): searchManyDistributed must
  * return EXACTLY what per-query search returns — same docIds, same scores,
  * same order — on every strategy route (broadcast flatMapGroups, docstats
  * cogroup, mixed multi-segment), with tombstones, for ONE Spark job per
  * index (or per segment). Plus the backpressure gate: concurrent
  * distributed queries never exceed the global cap.
  */
class BatchSearchSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  val cfg: IndexConfig = IndexConfig(buckets = 16, blockSize = 64,
    saltRange = 400, shufflePartitions = 8, bucketDirs = true)

  lazy val tmp: String = {
    val d = java.nio.file.Files.createTempDirectory("graftbatch").toString
    val docs = CodeCorpus.generate(spark, 1500, nRepos = 20, partitions = 8)
    IndexBuilder.build(spark, docs, d, cfg)
    d
  }

  // a mixed batch: head terms, multi-term mm tiers, rare identifiers, a
  // no-hit query (must yield an empty slot, not shift the others), dupes
  lazy val batch: Seq[String] = Seq(
    "buffer",
    "lazy implicit",
    "binary search tree implementation",
    s"${CodeCorpus.Vocab(100)} ${CodeCorpus.Vocab(500)}",
    s"${CodeCorpus.Vocab(3000)} buffer",
    "zzz_not_in_vocab_qq",
    "def class import return val var match case",
    "buffer") // duplicate of the head query

  private def assertSame(a: Seq[Array[Hit]], b: Seq[Array[Hit]], label: String): Unit = {
    assert(a.length == b.length)
    a.zip(b).zipWithIndex.foreach { case ((x, y), i) =>
      assert(x.toSeq == y.toSeq, s"$label: query $i (${batch(i)}) diverged")
    }
  }

  test("batched distributed == per-query search (broadcast route)") {
    val s = new Searcher(spark, tmp)
    val perQuery = batch.map(q => s.search(q, 10))
    val batched = s.searchManyDistributed(batch, 10)
    assertSame(batched, perQuery, "broadcast")
    assert(batched(5).isEmpty, "no-hit query must return an empty slot")
    assert(batched(0).toSeq == batched(7).toSeq, "duplicate queries must agree")
  }

  test("batched distributed == per-query search (forced docstats-cogroup route)") {
    val s = new Searcher(spark, tmp)
    s.NormsMaxDocs = 0 // beyond-norms regime: nothing broadcast, cogroup only
    val perQuery = batch.map(q => s.search(q, 10))
    val batched = s.searchManyDistributed(batch, 10)
    assertSame(batched, perQuery, "cogroup")
  }

  test("batched distributed respects tombstones on both routes") {
    // fresh copy so the shared index stays pristine
    val work = java.nio.file.Files.createTempDirectory("graftbatchdel").toString
    org.apache.commons.io.FileUtils.copyDirectory(
      new java.io.File(tmp), new java.io.File(work))
    graft.index.IndexOps.deleteByQueryInPlace(spark, work, "repo:repo-0001")
    val bcast = new Searcher(spark, work)
    val perQuery = batch.map(q => bcast.search(q, 10))
    assertSame(bcast.searchManyDistributed(batch, 10), perQuery, "tombstone broadcast")
    val shuf = new Searcher(spark, work)
    shuf.NormsMaxDocs = 0
    assertSame(shuf.searchManyDistributed(batch, 10), perQuery, "tombstone cogroup")
  }

  test("multi-segment batched == per-query search across mixed strategy routes") {
    import spark.implicits._
    val segA = java.nio.file.Files.createTempDirectory("graftbatchA").toString
    val segB = java.nio.file.Files.createTempDirectory("graftbatchB").toString
    val a = spark.range(0, 900).as[Long].map(i => CodeCorpus.genDoc(i, 20))
    val b = spark.range(900, 1500).as[Long].map(i => CodeCorpus.genDoc(i, 20))
    IndexBuilder.build(spark, a, segA, cfg)
    IndexBuilder.build(spark, b, segB, cfg)

    // route 1: everything driver-local
    val m1 = new MultiSearcher(spark, Seq(segA, segB))
    val perQuery = batch.map(q => m1.search(q, 10))
    assertSame(m1.searchManyDistributed(batch, 10), perQuery, "multi driver")

    // route 2: forced distributed flatMapGroups per segment (ONE job per
    // segment for the whole batch — driverRunFetches must stay at zero)
    val m2 = new MultiSearcher(spark, Seq(segA, segB))
    m2.DriverKernelMaxPostings = 0
    assertSame(m2.searchManyDistributed(batch, 10), perQuery, "multi distributed")
    assert(m2.driverRunFetches.get() == 0,
      "forced-distributed batch must not collect runs to the driver")

    // route 3: forced docstats cogroup per segment
    val m3 = new MultiSearcher(spark, Seq(segA, segB))
    m3.NormsMaxDocs = 0
    assertSame(m3.searchManyDistributed(batch, 10), perQuery, "multi shuffle")

    m1.close(); m2.close(); m3.close()
  }

  test("batched retrieval job count is independent of batch size") {
    // the whole point of searchManyDistributed: a batch of B queries costs
    // the SAME number of Spark jobs as one distributed query (AQE may stage
    // one action as >1 job, so gate the batch==single EQUALITY, not a
    // literal 1)
    val s = new Searcher(spark, tmp)
    s.search(batch.head, 10) // warm dict/norms/tombstones (their one-off jobs)
    // warm the batch session's postings file index too (a one-off listing
    // job since the batch path plans under its own session) — the gate is
    // MARGINAL job-count equality, single vs batch
    s.searchManyDistributed(Seq(batch.head), 10)
    def countJobs(group: String)(body: => Unit): Int = {
      val counter = new java.util.concurrent.atomic.AtomicInteger(0)
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          if (Option(js.properties).exists(
              p => p.getProperty("spark.jobGroup.id") == group))
            counter.incrementAndGet()
      }
      spark.sparkContext.addSparkListener(listener)
      try {
        spark.sparkContext.setJobGroup(group, group)
        body
        spark.sparkContext.clearJobGroup()
        // listener bus is async; poll until the count is stable
        var last = -1
        var stable = 0
        while (stable < 3) {
          Thread.sleep(200)
          val now = counter.get()
          if (now == last) stable += 1 else { stable = 0; last = now }
        }
        last
      } finally spark.sparkContext.removeSparkListener(listener)
    }
    val single = countJobs("graft-gate-single") {
      s.searchManyDistributed(Seq(batch.head), 10)
    }
    val full = countJobs("graft-gate-batch") {
      s.searchManyDistributed(batch, 10)
    }
    assert(single >= 1, "distributed retrieval must launch at least one job")
    assert(full == single,
      s"batch of ${batch.size} used $full jobs; a single query used $single")
  }

  test("searchMany honors the shuffle-regime router: no broadcast materialization") {
    // mass-delete / beyond-norms regime: search() routes every query to the
    // shuffle strategy; searchMany must follow the SAME router — the
    // pre-fix path called searchBroadcast unconditionally, lazily
    // materializing the full tombstone array + norm table on the driver in
    // exactly the regimes the bounds exist to keep distributed
    val s = new Searcher(spark, tmp)
    s.NormsMaxDocs = 0 // corpus "outgrew" broadcast norms
    val expected = batch.map(q => s.search(q, 10).toSeq)
    val got = s.searchMany(batch, 10).map(_.toSeq)
    assert(got == expected, "shuffle-regime batch must equal per-query search")
    assert(s.liveBroadcastCount == 0,
      "shuffle-regime batch must not materialize norm/tombstone broadcasts")
    s.close()
  }

  test("concurrent distributed queries are capped by the global gate") {
    val s = new Searcher(spark, tmp)
    s.DriverKernelMaxPostings = 0 // every query launches a Spark job
    Searcher.maxInFlightObserved.set(0)
    val queries = (0 until 32).map(i => batch(i % batch.size))
    val expected = batch.map(q => s.search(q, 10))
    val got = s.searchMany(queries, 10)
    queries.zip(got).foreach { case (q, hits) =>
      assert(hits.toSeq == expected(batch.indexOf(q)).toSeq, s"gated result for '$q'")
    }
    val peak = Searcher.maxInFlightObserved.get()
    assert(peak >= 1 && peak <= Searcher.MaxConcurrentDistributedQueries,
      s"observed $peak concurrent distributed jobs, cap is " +
        s"${Searcher.MaxConcurrentDistributedQueries}")
  }

  test("multi-segment dictionary memory is budgeted globally") {
    import spark.implicits._
    // 6 segments; global budgets far below 6x the per-segment vocabulary
    val dirs = (0 until 6).map { g =>
      val d = java.nio.file.Files.createTempDirectory(s"graftbudget$g").toString
      val docs = spark.range(g * 100L, (g + 1) * 100L).as[Long]
        .map(i => CodeCorpus.genDoc(i, 10))
      IndexBuilder.build(spark, docs, d,
        IndexConfig(buckets = 8, blockSize = 64, saltRange = 400, shufflePartitions = 4))
      d
    }
    val m = new MultiSearcher(spark, dirs)
    m.DictionaryMaxDriverTerms = 0 // force the probe path everywhere
    m.DictionaryMaxCacheTerms = 60 // global LRU budget, split 10/segment
    val qs = Seq("buffer", "lazy implicit", "binary search tree implementation",
      "def class import return", s"${CodeCorpus.Vocab(100)} ${CodeCorpus.Vocab(500)}")
    val single = dirs.map(d => new Searcher(spark, d))
    qs.foreach { q =>
      m.search(q, 10) // answers gated below; here we exercise the caches
    }
    assert(m.residentDictEntries <= 60,
      s"resident dict entries ${m.residentDictEntries} exceed the global budget")
    // answers unchanged vs an unbudgeted searcher over the same segments
    val unbudgeted = new MultiSearcher(spark, dirs)
    qs.foreach { q =>
      assert(m.search(q, 10).toSeq == unbudgeted.search(q, 10).toSeq,
        s"budgeted answers diverged for '$q'")
    }
    m.close(); unbudgeted.close(); single.foreach(_.close())
  }
}
