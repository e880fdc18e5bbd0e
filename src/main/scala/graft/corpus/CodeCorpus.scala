package graft.corpus

import graft.core.CodeDoc
import org.apache.spark.sql.{Dataset, SparkSession}

/** Deterministic synthetic source-code corpus (FIXTURES.md §1).
  *
  * Content for doc `i` depends only on `(seed, i)` via a splittable RNG, so
  * regeneration at ANY parallelism is identical — the property the resume and
  * scaling tests rely on. Token stream is Zipf-distributed over a code-like
  * vocabulary, with a planted head term in ~40% of docs (salting fixture) and
  * planted phrases in known docs (known-answer queries).
  */
object CodeCorpus extends Serializable {

  val Seed: Long = 42L

  val Langs: Array[(String, String, Double)] = Array( // (lang, ext, weight)
    ("scala", "scala", 0.3), ("java", "java", 0.25), ("py", "py", 0.2),
    ("c", "c", 0.15), ("md", "md", 0.1))

  /** The head term planted in ~40% of docs — the Zipf-skew fixture that the
    * salted posting build must survive (SURVEY.md §7.4).
    */
  val HeadTerm = "buffer"

  val PlantedPhrases: Array[(Long, String)] = Array(
    (997L, "binary search tree implementation"),
    (1009L, "red black tree rotation"),
    (1013L, "lock free queue algorithm"))

  /** Rare unicode tokens sprinkled in to exercise ICU fold parity. */
  private val UnicodeTokens = Array("café", "naïve", "Größe", "token’s", "ﬁle")

  private val Keywords = Array(
    "def", "class", "import", "return", "val", "var", "if", "else", "match",
    "case", "object", "trait", "extends", "override", "private", "public",
    "static", "void", "int", "string", "new", "this", "null", "true", "false",
    "for", "while", "try", "catch", "finally", "throw", "yield", "lazy",
    "implicit", "sealed", "abstract", "final", "package", "type", "with")

  /** 8192-term vocabulary: keywords first (head of the Zipf), then generated
    * identifiers. Deterministic — built once per JVM.
    */
  lazy val Vocab: Array[String] = {
    val rng = new java.util.Random(Seed)
    val roots = Array("parse", "read", "write", "merge", "sort", "scan",
      "hash", "index", "query", "score", "block", "term", "doc", "node",
      "tree", "list", "map", "set", "batch", "stream", "file", "path",
      "token", "field", "count", "sum", "part", "shard", "salt", "codec")
    val suffixes = Array("er", "ed", "ing", "able", "s", "")
    val out = new Array[String](8192)
    out(0) = HeadTerm
    var i = 1
    while (i < out.length) {
      out(i) =
        if (i <= Keywords.length) Keywords(i - 1)
        else {
          val style = rng.nextInt(3)
          val a = roots(rng.nextInt(roots.length))
          val b = roots(rng.nextInt(roots.length))
          val sfx = suffixes(rng.nextInt(suffixes.length))
          val n = rng.nextInt(100)
          style match {
            case 0 => s"$a$b$sfx$n" // e.g. parsemergeing42
            case 1 => s"${a}_${b}_$n" // snake_case identifier
            case 2 => s"$a${b.capitalize}$n" // camelCase identifier
          }
        }
      i += 1
    }
    out.distinct ++ Array.tabulate(8192 - out.distinct.length)(j => s"sym_$j")
  }

  /** Zipf(s=1.07) cumulative distribution over [[Vocab]]. */
  lazy val ZipfCdf: Array[Double] = {
    val v = Vocab.length
    val w = Array.tabulate(v)(kk => 1.0 / math.pow(kk + 1.0, 1.07))
    val total = w.sum
    val cdf = new Array[Double](v)
    var acc = 0.0
    var i = 0
    while (i < v) { acc += w(i) / total; cdf(i) = acc; i += 1 }
    cdf
  }

  private def sampleZipf(rng: java.util.Random): String = {
    val u = rng.nextDouble()
    var lo = 0
    var hi = ZipfCdf.length - 1
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (ZipfCdf(mid) < u) lo = mid + 1 else hi = mid
    }
    Vocab(lo)
  }

  /** Splittable per-doc RNG: mix (seed, i) through SplittableRandom. */
  private def docRng(i: Long): java.util.SplittableRandom =
    new java.util.SplittableRandom(Seed * 0x9E3779B97F4A7C15L + i)

  def genDoc(i: Long, nRepos: Int): CodeDoc = {
    val sr = docRng(i)
    val rng = new java.util.Random(sr.nextLong())
    val repo = "repo-%04d".format(i % nRepos)
    // lang: weighted
    val lp = rng.nextDouble()
    var acc = 0.0
    var li = 0
    while (li < Langs.length - 1 && acc + Langs(li)._3 < lp) { acc += Langs(li)._3; li += 1 }
    val (lang, ext, _) = Langs(li)
    val path = s"src/pkg${rng.nextInt(40)}/mod${rng.nextInt(30)}/File${i}.$ext"
    val commit = java.lang.Long.toHexString(sr.nextLong()).reverse.padTo(12, '0').take(12).mkString
    // length: log-normal clamped to [50, 5000]
    val len0 = math.exp(math.log(200.0) + rng.nextGaussian() * 1.0)
    val len = math.max(50, math.min(5000, len0.toInt))
    val sb = new java.lang.StringBuilder(len * 8)
    var t = 0
    while (t < len) {
      val tok =
        if (rng.nextDouble() < 0.002) UnicodeTokens(rng.nextInt(UnicodeTokens.length))
        else sampleZipf(rng)
      sb.append(tok)
      t += 1
      if (t % 12 == 0) sb.append(";\n") else sb.append(' ')
      if (rng.nextDouble() < 0.05) sb.append("() ")
    }
    // plant the head term in ~40% of docs (beyond its Zipf share)
    if (rng.nextDouble() < 0.40) {
      var j = 0
      val reps = 1 + rng.nextInt(3)
      while (j < reps) { sb.append(HeadTerm).append(' '); j += 1 }
    }
    PlantedPhrases.foreach { case (mod, phrase) =>
      if (i % mod == 0) sb.append('\n').append(phrase).append('\n')
    }
    CodeDoc(repo, path, commit, lang, sb.toString)
  }

  /** Distributed deterministic generation. */
  def generate(spark: SparkSession, nDocs: Long, nRepos: Int = 100,
               partitions: Int = 32): Dataset[CodeDoc] = {
    import spark.implicits._
    spark.range(0, nDocs, 1, partitions).map(i => genDoc(i, nRepos))
  }
}
