package graft

import graft.oracle.ExactScorer
import graft.ops.{AnnIndex, Dedup, Multimodal}
import graft.query.Searcher
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Engine-native operators (inverted index build + BM25 WAND retrieval) run
  * against the driver's `documents` table. Not ANSI-SQL-expressible (ICU
  * analysis chain, SmallFloat norms, edismax mm/tie), so these get the
  * driver's rows-only check; exactness is enforced by EngineSpec's
  * rank-identity gate against the in-JVM oracle instead.
  */
object EngineQueries {

  /** Build the persisted ANN signature index once per sfDir per JVM. */
  private object AnnCache {
    private val dirs = scala.collection.mutable.Map[String, String]()
    def dirFor(s: SparkSession, sfDir: String): String = synchronized {
      dirs.getOrElseUpdate(sfDir, {
        val out = s"/tmp/graft_ann_${Integer.toHexString(sfDir.hashCode)}"
        val emb = s.read.parquet(s"$sfDir/embeddings.parquet")
          .filter(col("vec_id") =!= 0) // vec 0 is the conventional query vector
        graft.ops.AnnIndex.build(s, emb, "vec_id", "embedding", out, nBits = 8)
        out
      })
    }
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Q2/Q5/T4: edismax BM25 top-k over (content, path, repo)
    "ix_search_topk" -> ((s, dir) => {
      val idx = SparkEntry.indexFor(s, dir)
      new Searcher(s, idx).searchDF("data table merge", 10)
    }),

    // native one-pass simhash64 Catalyst expression through its SQL surface
    // (OpsSpec proves bit-identity with the pure-column form)
    "q_simhash_native" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      s.read.parquet(s"$dir/documents.parquet")
        .filter(col("doc_id") < 100)
        .createOrReplaceTempView("simhash_docs")
      s.sql("""SELECT doc_id,
               graft_simhash64(split(lower(trim(text)), '\\s+')) AS sig
               FROM simhash_docs ORDER BY doc_id""")
    }),

    // batched retrieval: one prefetch job for the batch, per-query kernels
    "ix_search_batch" -> ((s, dir) => {
      import s.implicits._
      val idx = SparkEntry.indexFor(s, dir)
      val searcher = new Searcher(s, idx)
      val batch = Seq("data table merge", "filter join sort", "data")
      searcher.searchMany(batch, 5).zip(batch).flatMap { case (hits, q) =>
        hits.zipWithIndex.map { case (h, i) => (q, i + 1, h.docId, h.score) }
      }.toDF("query", "rank", "docId", "score")
    }),

    // Q3: six-term query exercising the mm=6<90% tier
    "ix_search_multiterm" -> ((s, dir) => {
      val idx = SparkEntry.indexFor(s, dir)
      new Searcher(s, idx).searchDF("data table merge sort join filter", 10)
    }),

    // P6-style field-scoped search (title_qf/author_qf analog)
    "ix_search_fielded" -> ((s, dir) => {
      val idx = SparkEntry.indexFor(s, dir)
      new Searcher(s, idx).searchDF("src1", 5, fields = Seq("repo"))
    }),

    // A9 corpus statistics: dictionary head (df/cf per term)
    "ix_dictionary_top" -> ((s, dir) => {
      val idx = SparkEntry.indexFor(s, dir)
      s.read.parquet(s"$idx/dictionary")
        .filter(col("field") === "content")
        .orderBy(col("df").desc, col("term"))
        .limit(25)
    }),

    // ST2/north rule: per-partition lineage metrics of the build
    "ix_lineage" -> ((s, dir) => {
      val idx = SparkEntry.indexFor(s, dir)
      s.read.parquet(s"$idx/lineage").orderBy(col("partitionId"))
    }),

    // per-row sha256 integrity: docstats vs source (north-rule invariant);
    // single summary row: total docs, matching shas
    "ix_integrity" -> ((s, dir) => {
      val idx = SparkEntry.indexFor(s, dir)
      val stats = s.read.parquet(s"$idx/docstats").select(col("sha")).distinct()
      val src = SparkEntry.documentsAsCode(s, dir)
        .select(sha2(col("content"), 256).as("sha")).distinct()
      src.agg(count(lit(1)).as("n_src_shas"))
        .crossJoin(src.intersect(stats).agg(count(lit(1)).as("n_common_shas")))
    }),

    // Q1 lucene filter-query compiler + Q6 facet + A2 hit count on the index
    "ix_query_filter" -> ((s, dir) => {
      val idx = SparkEntry.indexFor(s, dir)
      graft.index.QueryFilter
        .matchingDocs(s, idx, "lang:en OR lang:de")
        .select("docId", "repo", "path", "lang")
        .orderBy(col("docId"))
    }),

    "ix_facet" -> ((s, dir) => {
      val idx = SparkEntry.indexFor(s, dir)
      graft.index.IndexOps.facet(s, idx, "content:*", "lang")
    }),

    // SimHash near-dup candidate pairs (banded 64-bit LSH; 64-bit md5-based
    // bit math isn't portable to the DuckDB oracle, so rows-only)
    "q_simhash_pairs" -> ((s, dir) => {
      val docs = s.read.parquet(s"$dir/documents.parquet")
        .filter(col("doc_id") < 200)
      Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 16)
    }),

    // approximate nearest neighbor over the PERSISTED signature index: the
    // (sig, id, vec) table is built once (sig-sorted, range-partitioned);
    // each query is a pushed `sig IN (ball)` probe + exact rescore — no
    // full-corpus signature recompute per query (rows-only; recall gated in
    // OpsSpec, probe-pruning plan gated in PLANS.md)
    "q_ann_lsh" -> ((s, dir) => {
      import s.implicits._
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      val query = emb.filter(col("vec_id") === 0)
        .select("embedding").as[Array[Float]].head()
      val annDir = AnnCache.dirFor(s, dir)
      AnnIndex.topK(s, annDir, query, k = 10, probeHamming = 2)
        .withColumn("cos", round(col("cos"), 4))
    }),

    // the IVF scale path next to sign-LSH: k-means inverted lists, pushed
    // centroid probe + exact rescore (OpsSpec gates recall / exactness)
    "q_ann_ivf" -> ((s, dir) => {
      import s.implicits._
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      val query = emb.filter(col("vec_id") === 0)
        .select("embedding").as[Array[Float]].head()
      val out = s"/tmp/graft_ivf_${Integer.toHexString(dir.hashCode)}"
      if (!new java.io.File(s"$out/IVF_PROPS").exists())
        graft.ops.IvfIndex.build(s, emb.filter(col("vec_id") =!= 0),
          "vec_id", "embedding", out, nCentroids = 16, iters = 4)
      graft.ops.IvfIndex.topK(s, out, query, k = 10, nprobe = 4)
        .withColumn("cos", round(col("cos"), 4))
    }),

    // embedding-cosine near-dup, SCALE path: candidates restricted to
    // sign-LSH signature buckets (equi-join, no quadratic blowup), exact
    // cosine filter inside buckets (rows-only; exactness baseline is the
    // SQL-checked q_embed_neardup; subset+recall gated in OpsSpec)
    "q_embed_neardup_lsh" -> ((s, dir) => {
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
        .filter(col("vec_id") < 200)
      graft.ops.Similarity.lshNearDupPairs(emb, "vec_id", "embedding", minCos = 0.1)
    }),

    // multimodal: opaque-binary media table -> stubbed decode/resize/features
    // pipeline (map-only; real schema and plumbing, stub codec)
    "q_multimodal_features" -> ((s, dir) => {
      val media = Multimodal.asMediaTable(
        s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text", "image")
      Multimodal.extractFeatures(media)
        .select("media_id", "kind", "n_bytes", "payload_sha", "width", "height")
        .orderBy(col("media_id"))
    }),

    // engine-vs-oracle agreement, surfaced as data (self-check the driver can
    // see): per query, top-1 docId from both paths and whether full top-10
    // (ids AND scores) agree. The oracle side is fully DISTRIBUTED — df via
    // one map+count job, per-doc scoring map-only, top-k via a bounded sort —
    // so the check runs at any sf without a corpus collect (round 1 collected
    // the whole corpus to the driver here).
    "ix_oracle_agreement" -> ((s, dir) => {
      import s.implicits._
      val idx = SparkEntry.indexFor(s, dir)
      val searcher = new Searcher(s, idx)
      val fields = Seq("content", "path", "repo")
      val n = searcher.meta.nDocs
      val avgLen = searcher.meta.avgLen
      val joined = SparkEntry.documentsAsCode(s, dir).toDF()
        .join(s.read.parquet(s"$idx/docstats").select("docId", "repo", "path"),
          Seq("repo", "path"))
        .select("docId", "repo", "path", "content")
        .as[(Long, String, String, String)]
        .persist()
      val qs = Seq("data table merge", "group query row", "spark window stream",
        "data table merge sort join filter", "src3")
      val rows = qs.map { q =>
        val cls = graft.query.QueryPlan.clauses(q, fields)
        val needed = cls.flatMap(_.perField.toSeq).toSet.toSeq
        // independent df (direct counting over raw docs, distributed)
        val dfMap = joined.flatMap { case (_, repo, path, content) =>
          val text = Map("content" -> content, "path" -> path, "repo" -> repo)
          needed.filter { case (f, t) =>
            graft.analysis.Analyzer.analyzeField(f, text(f)).contains(t) }
        }.groupByKey(identity).count().collect().toMap
        val minMatch = graft.core.BM25.minShouldMatch(cls.length)
        val o = joined.flatMap { case (id, repo, path, content) =>
          ExactScorer.scoreDoc(
            Map("content" -> content, "path" -> path, "repo" -> repo),
            cls, dfMap, n, avgLen, minMatch).map(sc => (id, sc)).toSeq
        }(org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaLong, org.apache.spark.sql.Encoders.scalaDouble))
          .toDF("docId", "score")
          .orderBy(col("score").desc, col("docId"))
          .limit(10).as[(Long, Double)].collect()
          .map { case (id, sc) => graft.core.Hit(id, sc) }.toSeq
        val e = searcher.search(q, 10).toSeq
        (q, e.headOption.map(_.docId).getOrElse(-1L),
          o.headOption.map(_.docId).getOrElse(-1L), e == o)
      }
      joined.unpersist()
      rows.toDF("query", "engine_top1", "oracle_top1", "rank_identical")
        .orderBy(col("query"))
    }),

    // Q8/ST + K4 at scale: base + delta segments searched by MultiSearcher
    // with a mass delete-by-query on the base, across BOTH tombstone regimes
    // (broadcast sorted-array vs forced distributed anti-join) — row per
    // query asserting the two regimes stay rank-identical
    "ix_multisegment_delete" -> ((s, dir) => {
      import s.implicits._
      val base = SparkEntry.indexFor(s, dir)
      // fresh copy so the shared per-JVM index keeps its snapshot clean
      val work = s"/tmp/graft_msd_${Integer.toHexString(dir.hashCode)}"
      val wdir = new java.io.File(work)
      if (wdir.exists()) { import scala.reflect.io.Directory; new Directory(wdir).deleteRecursively() }
      org.apache.commons.io.FileUtils.copyDirectory(new java.io.File(base), wdir)
      // delta segment: re-index the first 50 docs with a marker suffix
      val delta = s"$work-delta"
      val incoming = SparkEntry.documentsAsCode(s, dir)
        .filter(col("path").rlike("doc_[0-4]?[0-9]\\.txt$"))
        .withColumn("content", concat(col("content"), lit(" graftmarker")))
        .as[graft.core.CodeDoc]
      graft.index.IndexOps.upsertDelta(s, work, incoming, delta,
        graft.index.IndexConfig(buckets = 32, saltRange = 1L << 14,
          shufflePartitions = s.sparkContext.defaultParallelism))
      // mass delete on the base: drop one whole source
      graft.index.IndexOps.deleteByQueryInPlace(s, work, "repo:src9")
      val queries = Seq("data table merge", "graftmarker", "filter join sort")
      val bc = new graft.query.MultiSearcher(s, Seq(work, delta))
      val sh = new graft.query.MultiSearcher(s, Seq(work, delta))
      sh.TombstonesMaxBroadcast = 0 // force the distributed-anti-join regime
      val rows = queries.map { q =>
        val a = bc.search(q, 10).toSeq
        val b = sh.search(q, 10).toSeq
        (q, a.length, a.headOption.map(_.docId).getOrElse(-1L), a == b)
      }
      rows.toDF("query", "hits", "top1", "regimes_identical").orderBy(col("query"))
    })
  )

  /** DuckDB oracles for the index-table queries whose semantics ARE
    * ANSI-expressible over the source `documents` table. The docId column is
    * re-derived in SQL exactly as the build assigns it — the global rank in
    * (sha256(content), repo, path, commit) order (IndexBuilder.withDocIds) —
    * so these hash checks also gate docId determinism end-to-end.
    *
    * `ix_facet`'s `content:*` clause is a token-count>0 test engine-side;
    * the oracle drops it because every synthetic document tokenizes
    * non-empty (verified: zero docs without [A-Za-z0-9] at sf0.001/0.01/0.1),
    * making the exists-filter total on this corpus.
    */
  val oracleSql: Map[String, String] = Map(
    "ix_query_filter" ->
      """WITH code AS (
        |  SELECT source AS repo,
        |    'docs/' || lang || '/doc_' || doc_id || '.txt' AS path,
        |    printf('%012x', doc_id) AS commit,
        |    lang, text AS content
        |  FROM documents
        |), ids AS (
        |  SELECT row_number() OVER (ORDER BY sha256(content), repo, path, commit) - 1 AS docId,
        |    repo, path, lang
        |  FROM code
        |)
        |SELECT docId, repo, path, lang FROM ids
        |WHERE lang IN ('en', 'de') ORDER BY docId""".stripMargin,

    "ix_facet" ->
      """SELECT lang, count(*) AS cnt FROM documents
        |GROUP BY lang ORDER BY cnt DESC, lang""".stripMargin,

    // Per-row sha256 integrity: the oracle asserts the INVARIANT — every
    // distinct source sha must appear in docstats, so both counts equal the
    // source-side distinct-sha count. Any lost/corrupted document makes
    // Spark's n_common_shas diverge and the hash check fail.
    "ix_integrity" ->
      """SELECT count(DISTINCT sha256(text)) AS n_src_shas,
        |  count(DISTINCT sha256(text)) AS n_common_shas FROM documents""".stripMargin,

    // SimHash-64 ported to DuckDB bit for bit: Java's wrapping hi<<32 is
    // (hi_signed * 2^32 + lo); BIGINT >> is arithmetic in both engines;
    // 1<<63 spelled as long-min. Gates the native Catalyst expression
    // cross-engine (it is spec-gated bit-identical to the column form).
    "q_simhash_native" ->
      """WITH w AS (
        |  SELECT doc_id, list_slice(string_split_regex(lower(trim(text)), '\s+'), 1, 128) AS toks
        |  FROM documents WHERE doc_id < 100
        |), h AS (
        |  SELECT doc_id, list_transform(toks, t ->
        |    (('0x' || substr(md5(t), 1, 8))::BIGINT
        |       - CASE WHEN ('0x' || substr(md5(t), 1, 8))::BIGINT >= 2147483648 THEN 4294967296 ELSE 0 END)
        |      * 4294967296 + ('0x' || substr(md5(t), 9, 8))::BIGINT) AS hs
        |  FROM w
        |)
        |SELECT doc_id,
        |  list_sum(list_transform(generate_series(0, 63), b ->
        |    CASE WHEN list_sum(list_transform(hs, x ->
        |        CASE WHEN ((x >> b) & 1) = 1 THEN 1 ELSE -1 END)) > 0
        |      THEN CASE WHEN b = 63 THEN (-9223372036854775807 - 1) ELSE (1::BIGINT << b) END
        |      ELSE 0 END))::BIGINT AS sig
        |FROM h ORDER BY doc_id""".stripMargin,

    // SimHash banded candidate pairs (maxHamming=16 -> 17 bands, widths
    // 13x4 + 4x3 bits): same pigeonhole layout as Dedup.simhashPairs.
    "q_simhash_pairs" ->
      """WITH w AS (
        |  SELECT doc_id, list_slice(string_split_regex(lower(trim(text)), '\s+'), 1, 128) AS toks
        |  FROM documents WHERE doc_id < 200
        |), h AS (
        |  SELECT doc_id, list_transform(toks, t ->
        |    (('0x' || substr(md5(t), 1, 8))::BIGINT
        |       - CASE WHEN ('0x' || substr(md5(t), 1, 8))::BIGINT >= 2147483648 THEN 4294967296 ELSE 0 END)
        |      * 4294967296 + ('0x' || substr(md5(t), 9, 8))::BIGINT) AS hs
        |  FROM w
        |), sigs AS (
        |  SELECT doc_id,
        |    list_sum(list_transform(generate_series(0, 63), b ->
        |      CASE WHEN list_sum(list_transform(hs, x ->
        |          CASE WHEN ((x >> b) & 1) = 1 THEN 1 ELSE -1 END)) > 0
        |        THEN CASE WHEN b = 63 THEN (-9223372036854775807 - 1) ELSE (1::BIGINT << b) END
        |        ELSE 0 END))::BIGINT AS sig
        |  FROM h
        |), bands AS (
        |  SELECT doc_id, sig,
        |    unnest(generate_series(0, 16)) AS band,
        |    unnest(list_transform(generate_series(0, 16), i ->
        |      (sig >> (CASE WHEN i < 13 THEN i * 4 ELSE 52 + (i - 13) * 3 END))
        |        & (CASE WHEN i < 13 THEN 15 ELSE 7 END))) AS key
        |  FROM sigs
        |), cand AS (
        |  SELECT DISTINCT l.doc_id AS a, l.sig AS siga, r.doc_id AS b, r.sig AS sigb
        |  FROM bands l JOIN bands r ON l.band = r.band AND l.key = r.key
        |  WHERE l.doc_id < r.doc_id
        |)
        |SELECT a, b, bit_count(xor(siga, sigb))::INT AS hamming
        |FROM cand WHERE bit_count(xor(siga, sigb)) <= 16
        |ORDER BY hamming, a, b""".stripMargin
  )
}
