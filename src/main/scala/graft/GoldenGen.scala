package graft

import graft.corpus.CodeCorpus
import graft.index.{IndexBuilder, IndexConfig}
import graft.query.Searcher
import org.apache.spark.sql.SparkSession

/** The pinned golden corpus + query set (FIXTURES.md §2): regenerating and
  * re-running MUST reproduce fixtures/golden_topk.tsv bit-for-bit — the
  * cross-round drift guard for analyzer + BM25 + WAND behavior.
  */
object Golden {
  val NDocs = 2000L
  val NRepos = 25
  val Cfg: IndexConfig = IndexConfig(buckets = 16, blockSize = 64,
    saltRange = 512, shufflePartitions = 8)

  case class GoldenQuery(query: String, k: Int, fields: Seq[String])

  def queries(): Seq[GoldenQuery] =
    scala.io.Source.fromFile("fixtures/queries.tsv")(scala.io.Codec.UTF8).getLines()
      .filter(_.trim.nonEmpty)
      .map { line =>
        val parts = line.split("\t")
        GoldenQuery(parts(0), parts(1).toInt, parts(2).split(",").toSeq)
      }.toSeq

  def run(spark: SparkSession): Seq[String] = {
    val out = java.nio.file.Files.createTempDirectory("graftgolden").toString
    IndexBuilder.build(spark, CodeCorpus.generate(spark, NDocs, NRepos, 8), out, Cfg)
    val searcher = new Searcher(spark, out)
    val lines = queries().flatMap { q =>
      searcher.search(q.query, q.k, q.fields).zipWithIndex.map { case (h, i) =>
        // full double precision: exact reproducibility is the point
        s"${q.query}\t${q.fields.mkString(",")}\t${i + 1}\t${h.docId}\t" +
          java.lang.Double.toHexString(h.score)
      }
    }
    import scala.reflect.io.Directory
    new Directory(new java.io.File(out)).deleteRecursively()
    lines
  }
}

/** Writes fixtures/golden_topk.tsv. Run ONCE; the committed file is then the
  * contract (GoldenSpec enforces it).
  */
object GoldenGen {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val lines = Golden.run(spark)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("fixtures/golden_topk.tsv"),
      lines.mkString("", "\n", "\n"))
    println(s"wrote fixtures/golden_topk.tsv (${lines.length} lines)")
    spark.stop()
  }
}
