package graft.core

/** BM25 scoring math, pinned to the reference's semantics.
  *
  * The reference (UCLALibrary/feed_ursus) delegates retrieval to Solr with
  * similarity unset (/root/reference/solr/config/schema.xml:374-377) and
  * `luceneMatchVersion 7.4.0` (/root/reference/solr/config/solrconfig.xml:25),
  * i.e. Lucene BM25Similarity with k1=1.2, b=0.75 and the `(k1+1)` numerator:
  *
  *   idf(t)    = ln(1 + (N - df + 0.5) / (df + 0.5))
  *   tfNorm(t) = tf * (k1+1) / (tf + k1 * (1 - b + b * quantLen / avgLen))
  *   score     = sum over matched query terms of idf * tfNorm
  *
  * `quantLen` is the SmallFloat-quantized field length ([[SmallFloat]]);
  * `avgLen` = sumTotalTermFreq / docCount as a double.
  *
  * All arithmetic is double-precision with a pinned summation order (query
  * term order) so the WAND engine and the exact oracle are bit-identical.
  */
object BM25 {
  val K1: Double = 1.2
  val B: Double = 0.75

  /** Inverse document frequency for a term. */
  def idf(docCount: Long, docFreq: Long): Double =
    math.log(1.0 + (docCount - docFreq + 0.5) / (docFreq + 0.5))

  /** Length-normalization denominator component: k1*(1 - b + b*len/avgLen).
    * Precompute per (quantized length) — only 256 distinct values per field.
    */
  def lengthNorm(quantLen: Int, avgLen: Double): Double =
    K1 * (1.0 - B + B * quantLen / avgLen)

  /** Per-term, per-doc BM25 contribution. `norm` = [[lengthNorm]] output. */
  def termScore(idf: Double, tf: Int, norm: Double): Double =
    idf * (tf * (K1 + 1.0)) / (tf + norm)

  /** Upper bound of [[termScore]] over a posting block given the block's max
    * tf and the minimum quantized length seen in the block. tfNorm is
    * monotonic increasing in tf and decreasing in len, so (maxTf, minLen)
    * bounds the block — the invariant block-max WAND prunes with.
    */
  def maxTermScore(idf: Double, maxTf: Int, minQuantLen: Int, avgLen: Double): Double =
    termScore(idf, maxTf, lengthNorm(minQuantLen, avgLen))

  /** Precompute the 256-entry norm cache for a field (Lucene does the same). */
  def normCache(avgLen: Double): Array[Double] = {
    val cache = new Array[Double](256)
    var i = 0
    while (i < 256) {
      cache(i) = lengthNorm(SmallFloat.byte4ToInt(i.toByte), avgLen)
      i += 1
    }
    cache
  }

  /** edismax minimum-should-match for the reference's `mm=2<-1 5<-2 6<90%`
    * (/root/reference/solr/config/solrconfig.xml:87): n<=2 all terms required;
    * 3..5 terms -> n-1; 6 terms -> n-2; >6 terms -> floor(0.9n).
    */
  def minShouldMatch(nTerms: Int): Int =
    if (nTerms <= 2) nTerms
    else if (nTerms <= 5) nTerms - 1
    else if (nTerms <= 6) nTerms - 2
    else (nTerms * 0.9).toInt

  /** edismax tie-breaker (/root/reference/solr/config/solrconfig.xml:90). */
  val Tie: Double = 0.01

  /** DisjunctionMax combination across fields for one query term:
    * max(fieldScores) + tie * (sum - max). Zero-score fields contribute 0.
    */
  def dismax(fieldScores: Array[Double]): Double = {
    var max = 0.0
    var sum = 0.0
    var i = 0
    while (i < fieldScores.length) {
      val s = fieldScores(i)
      if (s > max) max = s
      sum += s
      i += 1
    }
    max + Tie * (sum - max)
  }
}
