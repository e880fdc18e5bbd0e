package graft.oracle

import graft.analysis.Analyzer
import graft.core._
import graft.query.{Clause, QueryPlan}

import scala.collection.mutable

/** Brute-force exact BM25/edismax scorer — the test oracle (SURVEY.md §5).
  *
  * Stands in for live Solr (unavailable offline): defines "reference top-k"
  * for the rank-identity gate. Deliberately re-implements corpus statistics
  * (df, avgLen, norms) by direct counting over the raw docs — independent of
  * the index build path — while sharing the PINNED semantic components
  * ([[Analyzer]], [[BM25]], [[SmallFloat]]), which are the spec itself.
  *
  * Scoring: per query word, DisjunctionMax over fields with tie=0.01; words
  * sum under minimum-should-match `2<-1 5<-2 6<90%`; ties broken by docId
  * ascending (Lucene). avgLen = sum(fieldLen)/nDocs, lengths SmallFloat-
  * quantized — matching /root/reference/solr/config/schema.xml:374-377 +
  * solrconfig.xml:25 (Lucene default BM25, k1=1.2, b=0.75).
  */
object ExactScorer {

  case class OracleDoc(docId: Long, fields: Map[String, String])

  /** Score ONE document given global statistics — the pure, serializable
    * unit the distributed oracle maps over executors (no corpus ever reaches
    * the driver; see EngineQueries `ix_oracle_agreement`). Semantics are
    * identical to [[topK]]'s inner loop: DisMax over fields per word, mm
    * gate, SmallFloat-quantized length norms.
    */
  def scoreDoc(fieldText: Map[String, String], clauses: Array[Clause],
               df: Map[(String, String), Long], n: Long,
               avgLen: Map[String, Double], minMatch: Int,
               fields: Seq[String] = Seq("content", "path", "repo")): Option[Double] = {
    var matched = 0
    var score = 0.0
    clauses.foreach { c =>
      val fieldScores = fields.map { f =>
        c.perField.get(f) match {
          case Some(term) if df.contains((f, term)) =>
            val toks = Analyzer.analyzeField(f, fieldText.getOrElse(f, ""))
            val tf = toks.count(_ == term)
            if (tf > 0) {
              val quantLen = SmallFloat.quantizeLength(toks.length)
              BM25.termScore(BM25.idf(n, df((f, term))), tf,
                BM25.lengthNorm(quantLen, avgLen(f)))
            } else 0.0
          case _ => 0.0
        }
      }.toArray
      if (fieldScores.exists(_ > 0)) {
        matched += 1
        score += BM25.dismax(fieldScores)
      }
    }
    if (matched >= minMatch && matched > 0) Some(score) else None
  }

  def topK(docs: Seq[OracleDoc], query: String, k: Int,
           fields: Seq[String] = Seq("content", "path", "repo")): Array[Hit] = {
    val clauses = QueryPlan.clauses(query, fields)
    if (clauses.isEmpty) return Array.empty
    val n = docs.length.toLong

    // per-doc per-field term freqs + lengths (direct counting)
    val docTfs: Map[Long, Map[String, Map[String, Int]]] = docs.map { d =>
      d.docId -> fields.map { f =>
        val toks = Analyzer.analyzeField(f, d.fields.getOrElse(f, ""))
        val m = mutable.HashMap.empty[String, Int]
        toks.foreach(t => m.update(t, m.getOrElse(t, 0) + 1))
        f -> m.toMap
      }.toMap
    }.toMap
    val docLens: Map[Long, Map[String, Int]] = docs.map { d =>
      d.docId -> fields.map { f =>
        f -> Analyzer.analyzeField(f, d.fields.getOrElse(f, "")).length
      }.toMap
    }.toMap

    val avgLen: Map[String, Double] =
      fields.map(f => f -> docLens.valuesIterator.map(_(f).toLong).sum.toDouble / n).toMap

    // df per needed (field, term)
    val needed = clauses.flatMap(_.perField.toSeq).toSet
    val df: Map[(String, String), Long] = needed.map { case (f, t) =>
      (f, t) -> docTfs.valuesIterator.count(_(f).contains(t)).toLong
    }.toMap

    val minMatch = BM25.minShouldMatch(clauses.length)

    val hits = docs.flatMap { d =>
      var matched = 0
      var score = 0.0
      clauses.foreach { c =>
        val fieldScores = fields.map { f =>
          c.perField.get(f) match {
            case Some(term) =>
              val tf = docTfs(d.docId)(f).getOrElse(term, 0)
              if (tf > 0) {
                val quantLen = SmallFloat.quantizeLength(docLens(d.docId)(f))
                BM25.termScore(BM25.idf(n, df((f, term))), tf,
                  BM25.lengthNorm(quantLen, avgLen(f)))
              } else 0.0
            case None => 0.0
          }
        }.toArray
        if (fieldScores.exists(_ > 0)) {
          matched += 1
          score += BM25.dismax(fieldScores)
        }
      }
      if (matched >= minMatch && matched > 0) Some(Hit(d.docId, score)) else None
    }
    hits.sortBy(h => (-h.score, h.docId)).take(k).toArray
  }
}
