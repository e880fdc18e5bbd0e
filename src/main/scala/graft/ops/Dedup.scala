package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Deduplication operators for large-scale training-data pipelines.
  *
  * Exact dedup, n-gram Jaccard, and MinHash+LSH are pure column expressions
  * (also exposed with DuckDB oracles in RelationalQueries). SimHash needs
  * 64-bit weighted-majority bit arithmetic, implemented here with Catalyst
  * builtins only (conv/bitwise over md5 hex) so it stays codegen-friendly —
  * no UDFs.
  */
object Dedup {

  /** Whitespace word shingles of size n (array column of strings). */
  def shingles(words: Column, n: Int): Column =
    when(size(words) >= n,
      transform(sequence(lit(1), size(words) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(j => element_at(words, i + j)): _*)))
      .otherwise(array().cast("array<string>"))

  /** Canonicalized exact-dup fingerprint: md5 over lowercased,
    * whitespace-collapsed text.
    */
  def exactFingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** 64-bit token hash from md5 hex: two 32-bit halves via conv(16->10),
    * recombined — conv of 8 hex chars always fits a long, so this stays
    * engine-portable and overflow-free. Builtins-only form; prefer
    * [[tokenHash64Native]] on hot gram streams.
    */
  def tokenHash64(token: Column): Column = {
    val hex = md5(token)
    val hi = conv(substring(hex, 1, 8), 16, 10).cast("long")
    val lo = conv(substring(hex, 9, 8), 16, 10).cast("long")
    shiftleft(hi, 32).bitwiseOR(lo)
  }

  /** [[tokenHash64]] as the native one-pass expression (graft_hash64,
    * bit-identical — OpsSpec gates it): digest bytes -> long directly, no
    * 32-char hex string + two substrings per value. Registers the function
    * on `spark` (idempotent) so callers needn't manage the registry.
    */
  def tokenHash64Native(spark: org.apache.spark.sql.SparkSession, token: Column): Column = {
    graft.functions.GraftFunctions.register(spark)
    call_function("graft_hash64", token)
  }

  /** SimHash-64 over a token array: for each of 64 bits, sum +1/-1 weighted
    * by token frequency, take the sign. Expressed as an aggregate over the
    * token array per bit — builtins only.
    *
    * Scale note: 64 aggregate() passes over the token array per row is
    * O(64·len); fine for fingerprinting after token truncation (we cap at
    * `maxTokens`). For the hot path a custom Expression could do one pass.
    */
  def simhash64(words: Column, maxTokens: Int = 128): Column = {
    val toks = slice(words, 1, maxTokens)
    val hashes = transform(toks, t => tokenHash64(t))
    val bits = transform(sequence(lit(0), lit(63)), b => {
      // null tokens cast no vote (0), matching the native SimHash64
      // expression's null-element skip bit for bit
      val votes = aggregate(hashes, lit(0),
        (acc, h) => acc + when(h.isNull, 0)
          .otherwise(when(call_function("shiftright", h, b).bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1)))
      when(votes > 0, call_function("shiftleft", lit(1L), b)).otherwise(lit(0L))
    })
    aggregate(bits, lit(0L), (acc, x) => acc.bitwiseOR(x))
  }

  /** Hamming distance between two simhash-64 values. */
  def hamming64(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup candidate pairs with recall guaranteed by pigeonhole:
    * the 64 signature bits are split into `maxHamming + 1` contiguous bands,
    * so any pair within hamming distance `maxHamming` must agree exactly on
    * at least one band. Docs sharing a (band, key) are candidates, then the
    * exact hamming filter runs on the pair. Banding makes the self-join an
    * equi-join on (band, key) — shuffle-friendly, no quadratic blowup —
    * EXCEPT for hot buckets (degenerate/short docs collapsing to the same
    * band key): buckets larger than `maxBucket` are dropped entirely
    * (deterministic) and the drop is logged, trading bounded recall loss for
    * a bounded join. Set `maxBucket = Int.MaxValue` for exact behavior.
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3, maxBucket: Int = 100000): DataFrame = {
    // pigeonhole: maxHamming flipped bits can corrupt at most maxHamming of
    // the (maxHamming + 1) bands, so one band always matches exactly. At
    // maxHamming >= 32 that layout no longer fits 64 bits (the guarantee
    // would silently void) and band keys of < 2 bits make every bucket hot —
    // fail loudly instead.
    require(maxHamming >= 0 && maxHamming < 32,
      s"maxHamming must be in [0, 32): got $maxHamming (64-bit signature " +
        "cannot pigeonhole more bands)")
    val nBands = maxHamming + 1
    val base = 64 / nBands
    if (base < 8)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"simhashPairs: maxHamming=$maxHamming gives $base-bit band keys — " +
          s"expect ~n/2^$base rows per bucket; candidate volume is bounded " +
          s"only by maxBucket=$maxBucket drops")
    val extra = 64 % nBands
    val widths = Array.tabulate(nBands)(i => base + (if (i < extra) 1 else 0))
    val offsets = widths.scanLeft(0)(_ + _)
    val withSig = df.select(col(idCol).as("id"),
      simhash64(split(lower(trim(col(textCol))), "\\s+")).as("sig"))
    val bandStructs = (0 until nBands).map { i =>
      val mask = if (widths(i) == 64) -1L else (1L << widths(i)) - 1L
      struct(lit(i).as("band"),
        call_function("shiftright", col("sig"), lit(offsets(i))).bitwiseAND(lit(mask)).as("key"))
    }
    // persist the BANDED form (one level above withSig — same simhash cost,
    // consumed by the hot-bucket count AND both join sides); released below
    // once the result is materialized, so repeated calls don't leak storage
    val banded = withSig.select(col("id"), col("sig"),
      explode_outer(array(bandStructs: _*)).as("bk"))
      .select(col("id"), col("sig"), col("bk.band"), col("bk.key"))
      .persist()
    val hot = banded.groupBy("band", "key").count()
      .filter(col("count") > maxBucket)
      .select(col("band"), col("key"), col("count"))
    val hotRows = hot.collect() // hot buckets are rare by construction
    if (hotRows.nonEmpty) {
      val dropped = hotRows.map(_.getLong(2)).sum
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"simhashPairs: dropping ${hotRows.length} hot (band,key) buckets " +
          s"(> $maxBucket members, $dropped rows total); recall is bounded-lossy")
    }
    val ok =
      if (hotRows.isEmpty) banded
      else banded.join(
        broadcast(hot.select(col("band"), col("key"))), Seq("band", "key"), "left_anti")
    val l = ok.select(col("id").as("a"), col("sig").as("siga"), col("band"), col("key"))
    val r = ok.select(col("id").as("b"), col("sig").as("sigb"), col("band"), col("key"))
    // materialize the (small — true near-dup pairs only) result so `banded`
    // can be released HERE: the returned frame is persisted and lineage-free
    // of the heavy simhash scan; callers may unpersist it when done
    val out = l.join(r, Seq("band", "key")).filter(col("a") < col("b"))
      .select(col("a"), col("b"), hamming64(col("siga"), col("sigb")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
      .orderBy(col("hamming"), col("a"), col("b"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    out.count()
    banded.unpersist()
    out
  }

  /** Modulus / per-band affine constants of the MinHash family — mirrored
    * VERBATIM in the DuckDB oracles (q_minhash_lsh / q_dedup_*): the hash
    * check is cross-engine, so the constants are part of the spec.
    */
  val MinhashP = 4294967311L // smallest prime > 2^32
  def minhashA(b: Int): Long = (2654435761L * (b + 1)) % 2147483647L
  def minhashC(b: Int): Long = (2246822519L * (b + 1)) % 2147483647L

  /** Rows per band (r of the banded-LSH S-curve). r = 1 — the shape shipped
    * through round 5 — makes a band collide with probability J (not J^r), so
    * the effective similarity threshold was (1/b)^(1/1) ≈ 0.125 with a fat
    * sub-threshold tail: on the battery corpus, whose maximum true pairwise
    * Jaccard is 0.022, the banding emitted 7 false-positive candidate pairs
    * and dedupCorpus DELETED 7 unrelated documents — and on a low-shingle-
    * diversity corpus (DedupScaleBench funnel leg: 32-word vocabulary) the
    * per-band minimum concentrates on the few globally-smallest-hashing
    * shingles, buckets go corpus-sized, and connected components chained
    * 51k docs into ONE cluster (1 survivor). The replay oracle was
    * structurally blind to all of it. r = 4 at b = 8 puts the threshold at
    * (1/8)^(1/4) ≈ 0.59 with catch probability 0.985 at J = 0.8 and ~8·J^4
    * below threshold (3e-7 at J = 0.022) — the standard near-dup regime
    * (cf. Lee et al.'s suffix/MinHash setups). Affine passes stay cheap:
    * still ONE md5 per shingle, b·r transforms of the cached hash array.
    */
  val MinhashRows = 4

  /** Per-row combine constants for folding a band's r minima into one LONG
    * signature: sig = Σ_j (m_j · K_j mod P) mod P. Each product < 2^63
    * (m < P ≈ 2^32, K < 2^31) and each term < P, so the arithmetic is exact
    * in both engines (DuckDB BIGINT errors on overflow rather than
    * wrapping — the formula is chosen to never overflow).
    */
  def minhashK(j: Int): Long = Seq(1000000007L, 1000000033L,
    1000000087L, 1000000093L, 1000000097L, 1000000103L,
    1000000123L, 1000000181L)(j % 8)

  /** 32-bit-per-shingle hash array: ONE md5 per shingle (top 8 hex chars),
    * reused by every band. 32 bits is enough at ANY corpus size: minhash
    * accuracy depends on collisions within one PAIR's shingle union (bounded
    * by document length, not corpus size) — ~10^4 shingles/pair gives ~1%
    * chance of any collision (birthday, 10^8/2^33), a negligible Jaccard
    * perturbation; band independence is unaffected otherwise.
    * Materialize this as its OWN column before calling
    * [[minhashBandsFromHashes]] — the band expressions reference it `bands`
    * times, which is exactly what stops CollapseProject from inlining the
    * digest work back into each band (multi-referenced non-cheap aliases
    * don't collapse).
    */
  def minhashHashes(sh: Column): Column =
    transform(sh, s => conv(substring(md5(s), 1, 8), 16, 10).cast("long"))

  /** [[minhashHashes]] via the native digest expression: the unsigned high
    * 32 bits of graft_hash64 equal `conv(hex[1,8],16,10)` exactly (OpsSpec
    * gates element-wise identity), minus the 32-char hex string + substring
    * the builtins form allocates per shingle — the dominant allocation of
    * the banding stage. Registers the function on `spark` (idempotent).
    */
  def minhashHashesNative(spark: org.apache.spark.sql.SparkSession, sh: Column): Column = {
    graft.functions.GraftFunctions.register(spark)
    transform(sh, s => shiftrightunsigned(call_function("graft_hash64", s), 32))
  }

  /** MinHash signature bands over a pre-hashed shingle array: band b's
    * signature folds `rows` independent minima — row j of band b is min over
    * shingles of the affine (a_k·h + c_k) mod P with k = b·rows + j
    * (Broder-style universal hashing), combined as Σ_j (m_j·K_j mod P) mod P
    * so signatures still join as LONGs. A band matches iff all r minima
    * match (mod a ~2^-32 combine collision) — the J^r S-curve (see
    * [[MinhashRows]]). One digest per shingle regardless of b·r: the hashing
    * that dominates corpus-scale dedup CPU is unaffected by the row count.
    */
  def minhashBandsFromHashes(hs: Column, bands: Int,
                             rows: Int = MinhashRows): Column =
    array((0 until bands).map { b =>
      val sig = (0 until rows).map { j =>
        val k = b * rows + j
        (array_min(transform(hs,
          x => (lit(minhashA(k)) * x + lit(minhashC(k))) % lit(MinhashP)))
          * lit(minhashK(j))) % lit(MinhashP)
      }.reduce(_ + _) % lit(MinhashP)
      struct(lit(b).as("band"), sig.as("sig"))
    }: _*)

  /** MinHash signature bands from raw shingles; equi-join on (band, sig)
    * yields LSH candidates. Convenience form — prefer the two-step
    * [[minhashHashes]] -> [[minhashBandsFromHashes]] in pipelines so the
    * digest pass stays a single projection.
    */
  def minhashBands(sh: Column, bands: Int, rows: Int = MinhashRows): Column =
    minhashBandsFromHashes(minhashHashes(sh), bands, rows)

  /** End-to-end near-dup corpus deduplication — the composed pipeline a
    * training-data run actually executes: shingle -> MinHash bands -> LSH
    * candidate pairs -> connected components -> keep ONE representative per
    * cluster (the minimum id) and drop the rest. Returns the deduplicated
    * corpus with the input's schema. Every stage is the shuffle-friendly
    * shape proven above (banded equi-join, min-label propagation); the final
    * drop is one anti-join.
    */
  /** LSH candidate edges as a STAR per bucket (each member -> the bucket's
    * min id), NOT all pairs: a bucket of m exact-duplicates — common in
    * crawl corpora — emits m²/2 candidate rows as a self-join (the quadratic
    * hot-bucket blowup) but only m-1 star edges, and the star spans exactly
    * the same connected components, which is all dedup needs (no per-pair
    * verify step consumes these edges). One groupBy + one join back, both
    * linear in bucket size. Returns (a, b) with a = bucket min < b.
    */
  /** The shared tokenize -> shingle -> hash-once -> band projection:
    * (_id, band, sig), one row per (doc, band). Factored out so OpsSpec and
    * PLANS.md can gate the plan shape directly. Two aliases are load-bearing
    * (CollapseProject keeps multi-referenced non-cheap aliases):
    *
    *  - `_w` (the word array): `shingles` references it at shingleK
    *    element_at sites inside an interpreted-eval HOF lambda, so an
    *    INLINED split would re-tokenize the document once per shingle per
    *    site — O(words²) per doc. Found at the 1M-doc scale run
    *    (DedupScaleBench): long code docs pushed dedup from seconds to
    *    MINUTES while the short-doc sf0.1 battery hid the quadratic.
    *  - `_hs` (the digest array): one md5 per shingle regardless of band
    *    count; bands are cheap affine transforms of the attribute.
    *
    * explode_outer, NOT explode: the band array is fixed-length (never
    * empty), and plain explode makes InferFiltersFromGenerate push a
    * size(_b) > 0 filter below the projections with the WHOLE band
    * expression (md5 pass included) inlined into it — every row would pay
    * the digest twice. Gate: exactly ONE `split` and ONE `md5` in the plan.
    */
  private[graft] def bandedProjection(df: DataFrame, idCol: String, textCol: String,
                                      shingleK: Int, bands: Int,
                                      rows: Int = MinhashRows): DataFrame =
    {
      graft.functions.GraftFunctions.register(df.sparkSession)
      df
        .withColumn("_w", split(lower(trim(col(textCol))), "\\s+"))
        // the WHOLE banding in one native pass (graft_shingle_sigs): digest
        // each k-gram straight from the word byte arrays (no shingle
        // strings, no array_distinct — duplicates cannot change a minimum,
        // OpsSpec gates value identity with the builtins chain) and fold
        // all bands·rows affine minima inline. The previous two-step
        // native form still paid an interpreted concat_ws HOF eval + one
        // string per gram position (the dominant CPU of the 1M-doc
        // banding stage after the sigs pass went native). NULL for
        // shingle-less docs, so the `sig IS NULL` drop is path-independent.
        .withColumn("_sigs", call_function("graft_shingle_sigs",
          col("_w"), lit(shingleK), lit(bands), lit(rows)))
        .select(col(idCol).as("_id"), posexplode_outer(col("_sigs")).as(Seq("band", "sig")))
    }
      // shingle-less docs (fewer than shingleK words) are dropped HERE, not
      // via a size(_sh) > 0 filter between the projections: a mid-pipeline
      // filter gets predicate-pushed below the _w/_sh projects with the
      // WHOLE shingle expression (5 split references) substituted into the
      // condition — the exact O(words²) re-tokenization the _w alias
      // prevents. `sig IS NULL` ⟺ empty shingle array (array_min of an
      // empty digest array; digests themselves are never null), and the
      // condition references the generator output, so it cannot be pushed
      // below the Generate. Plan-gated in OpsSpec: ONE split, ONE md5.
      .filter(col("sig").isNotNull)

  def minhashStarEdges(df: DataFrame, idCol: String, textCol: String,
                       shingleK: Int = 3, bands: Int = 8,
                       rows: Int = MinhashRows): DataFrame = {
    // persist the banding (shingle + minhash is the expensive part, consumed
    // by BOTH the bucket-rep aggregate and the join-back side); the returned
    // edge list is materialized by an EAGER localCheckpoint (small — near-dup
    // edges only) so the banding is released here, as in simhashPairs.
    // r7: checkpoint instead of persist+count — one materialization job in
    // place of two (the count() stage was the worst-skew stage of the 1M
    // dedupCorpus record, 5.8× max/median — VERDICT r6 nit #3), and the
    // blocks are freed by the context cleaner instead of leaking until a
    // caller remembers to unpersist.
    val banded = bandedProjection(df, idCol, textCol, shingleK, bands, rows)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val edges = {
      val reps = banded.groupBy(col("band"), col("sig"))
        .agg(min(col("_id")).as("a"), count(lit(1)).as("_n"))
        .filter(col("_n") > 1).drop("_n")
      banded.join(reps, Seq("band", "sig"))
        .filter(col("_id") =!= col("a"))
        .select(col("a"), col("_id").as("b")).distinct()
        .localCheckpoint(true)
    }
    banded.unpersist()
    edges
  }

  def dedupCorpus(df: DataFrame, idCol: String, textCol: String,
                  shingleK: Int = 3, bands: Int = 8,
                  rows: Int = MinhashRows): DataFrame = {
    val pairs = minhashStarEdges(df, idCol, textCol, shingleK, bands, rows)
    val losers = connectedComponents(pairs)
      .filter(col("node") =!= col("label"))
      .select(col("node").as(idCol))
    df.join(losers, Seq(idCol), "left_anti")
  }

  /** Connected components over an undirected edge list — turns near-dup
    * PAIRS (from minhash/simhash banding) into dedup CLUSTERS, so one
    * representative per cluster can be kept. Iterative min-label
    * propagation: label(v) <- min(label(v), min label among neighbors),
    * repeated to fixpoint. Each round is one equi-join + one map-side-
    * combinable min-aggregate, so it distributes; rounds needed = graph
    * diameter, which for near-dup clusters is tiny. The driver loop only
    * checks a converged count — no edge data ever reaches the driver.
    *
    * @param pairs DataFrame with numeric columns `a`, `b` (a <-> b edge)
    * @return (node, label) — label is the smallest node id in the component
    */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 20,
                          driverMaxEdges: Long = 1L << 20): DataFrame = {
    // Hybrid, like the searcher's driver-local kernel: near-dup graphs are
    // usually tiny relative to the corpus (edges ∝ duplicates, not docs), so
    // below the cutoff a driver union-find replaces O(diameter) Spark rounds
    // with one collect. Same labels (min node id per component) either way.
    //
    // r7: the small case is probed with ONE bounded collect (limit N+1) —
    // union-find is insensitive to duplicate and asymmetric edges, so the
    // r1-r6 symmetrize→distinct→persist→count round-trip (two extra jobs +
    // a full exchange of the edge list) bought nothing on this path. Only
    // the genuinely-large case pays for symmetrization.
    val probe = pairs.select(col("a").cast("long"), col("b").cast("long"))
      .limit(math.min(driverMaxEdges + 1, Int.MaxValue.toLong).toInt)
    locally {
      val spark = pairs.sparkSession
      import spark.implicits._
      val edges = probe.as[(Long, Long)].collect()
      if (edges.length <= driverMaxEdges) {
        val parent = mutable.Map.empty[Long, Long]
        def find(x: Long): Long = {
          var r = x
          while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
          var c = x
          while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
          r
        }
        edges.foreach { case (a, b) =>
          parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
        }
        return parent.keysIterator.map(n => (n, find(n))).toSeq
          .toDF("node", "label")
      }
    }
    // pairs may be an expensive upstream plan (LSH banding); persist it so
    // the two symmetrization branches don't each recompute it
    val p = pairs.select(col("a"), col("b")).persist()
    val sym = p.union(p.select(col("b").as("a"), col("a").as("b")))
      .distinct()
      .persist()
    var labels = sym.select(col("a").as("node")).distinct()
      .withColumn("label", col("node"))
      .persist()
    var iter = 0
    var converged = false
    // intermediates of the PREVIOUS round, released only after this round's
    // count job has materialized everything that depends on them
    var prevToRelease: Seq[DataFrame] = Nil
    while (!converged && iter < maxIter) {
      val msgs = sym.join(labels.withColumnRenamed("node", "b"), "b")
        .select(col("a").as("node"), col("label"))
      val prop = labels.union(msgs)
        .groupBy("node").agg(min("label").as("label"))
        .persist()
      // ONE count job per round: did propagation decrease any label? At the
      // propagation fixpoint every label already IS the component min, so
      // pointer jumping would be the identity — skip its join entirely on
      // the final round (it was ~1 extra join per run for nothing).
      val changed = prop
        .join(labels.withColumnRenamed("label", "prev"), "node")
        .filter(col("label") < col("prev")).count()
      prevToRelease.foreach(_.unpersist()); prevToRelease = Nil
      if (changed == 0) {
        prop.unpersist()
        converged = true
      } else {
        // pointer jumping: label <- label(label). Halves remaining path
        // length each round, so convergence is O(log diameter) instead of
        // O(diameter). Materialized lazily by the NEXT round's count job —
        // prop and the old labels stay cached until then.
        //
        // localCheckpoint (lazy), NOT persist: each round's plan would
        // otherwise NEST the whole previous round (the self-join doubles
        // the tree), and every count job serializes the plan string for
        // its SQL-execution event — at the 1M-doc run the driver spent
        // MINUTES in generateTreeString on exponentially deep trees while
        // executors idled. The checkpoint truncates lineage to a LogicalRDD
        // so per-round plan cost is O(1); blocks are freed by the context
        // cleaner as old label generations drop out of scope.
        val next = prop.as("x")
          .join(prop.as("y"), col("x.label") === col("y.node"), "left")
          .select(col("x.node").as("node"),
            coalesce(col("y.label"), col("x.label")).as("label"))
          .localCheckpoint(false)
        prevToRelease = Seq(prop, labels)
        labels = next
      }
      iter += 1
    }
    prevToRelease.foreach(_.unpersist())
    sym.unpersist(); p.unpersist()
    // never hand back silently-split clusters: with pointer jumping 20
    // rounds covers diameters up to ~2^20, so hitting this means the input
    // graph shape is far outside near-dup territory
    require(converged,
      s"connectedComponents: not converged after $maxIter rounds; " +
        "raise maxIter or inspect the edge distribution")
    labels
  }
}
