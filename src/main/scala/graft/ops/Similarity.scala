package graft.ops

import graft.functions.Udf
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Approximate-nearest-neighbor search over an embedding column
 * (`array<float>`).
 *
 * == Scale design (100 TB / billions of vectors) ==
 *
 *  - '''Brute force''' (baseline, exact): broadcast the (small) query set and
 *    stream the corpus once — no shuffle of the corpus, one local top-k
 *    per partition, then a tiny global top-k merge. Cost O(corpus × queries).
 *  - '''LSH-bucketed''' (scale path): random-hyperplane signatures bucket
 *    vectors so each query only scans its own buckets — candidate sets are
 *    ~(corpus / 2^bits) × probes, shuffled by bucket key; recall is tunable
 *    with the number of tables/probes. Hyperplanes derive deterministically
 *    from md5 so results are reproducible (and oracle-checkable).
 *  - '''IVF''': same topology — data-adaptive k-means centroids instead of
 *    random planes. Lloyd iterations aggregate fixed-point per-(cell, dim)
 *    sums distributively; only k × dim scalars ever reach the driver.
 *
 * Cosine kernels are registered as scalar functions computing in Double with
 * a fixed left-to-right summation order (bit-reproducible in the oracle).
 */
object Similarity {

  def registerAll(): Unit = {
    // Deterministic double-precision cosine; native codegen'd expression
    // reading primitive ArrayData (no boxing on the hot path).
    graft.functions.Udf.native("cosine_sim(float[], float[]) -> double") { children =>
      graft.functions.CosineSimExpr(children(0), children(1))
    }
    // quantized overload: int8 codes against float queries (scale cancels)
    graft.functions.Udf.native("cosine_sim(int[], float[]) -> double") { children =>
      graft.functions.CosineSimExpr(children(0), children(1))
    }

    // NOTE on every closure below: Spark deserializes array<float> UDF args
    // as immutable.List (Scala 2.13 default Seq) — O(n) per indexed access.
    // One .toArray up front makes the hot loops O(1)-indexed over a
    // primitive float[]; skipping it turned pqEncode into an O(dim²·nCodes)
    // per-row crawl at the 1M probe.
    Udf.scalar2[Seq[Float], Seq[Float], Double]("dot_product(float[], float[]) -> double") {
      (as, bs) =>
        val a = as.toArray; val b = bs.toArray
        var dot = 0.0
        var i = 0
        val n = math.min(a.length, b.length)
        while (i < n) { dot += a(i).toDouble * b(i).toDouble; i += 1 }
        dot
    }

    // Random-hyperplane LSH bucket id: `bits` sign bits of dot products with
    // hyperplanes whose components derive from md5(seed, plane, dim) mapped to
    // [-1, 1]. Deterministic — reproducible across engines and runs. The
    // plane matrix is row-independent, so it is materialized once per
    // executor (not re-derived per row).
    Udf.scalar2[Seq[Float], Int, Long]("hyperplane_bucket(float[], int) -> bigint") {
      (v, bits) => bucketOf(v.toArray, hyperplanes(bits, v.length), bits)
    }

    // Table-seeded variant for MULTI-TABLE LSH: table `t` draws its planes
    // from row (t·1000003 + p) of the same md5 stream, so table 0 is
    // bit-identical to hyperplane_bucket and every further table is an
    // independent hyperplane set. L tables union their candidates — the
    // recall knob that multiplies candidate coverage ×L without touching
    // per-bucket occupancy (more bits per table stays affordable).
    Udf.scalar3[Seq[Float], Int, Int, Long](
      "hyperplane_bucket_t(float[], int, int) -> bigint") { (v, bits, table) =>
        bucketOf(v.toArray, hyperplanesT(table, bits, v.length), bits)
    }
  }

  private def bucketOf(v: Array[Float], planes: Array[Array[Double]], bits: Int): Long = {
    var bucket = 0L
    var p = 0
    while (p < bits) {
      val plane = planes(p)
      var dot = 0.0
      var i = 0
      while (i < v.length) {
        dot += v(i).toDouble * plane(i)
        i += 1
      }
      if (dot >= 0) bucket |= (1L << p)
      p += 1
    }
    bucket
  }

  /** Serializable helpers used inside IVF UDF closures. */
  object Ivf extends Serializable {
    def dist2(c: Array[Double], v: Array[Float]): Double = {
      var d = 0.0; var i = 0
      val n = math.min(c.length, v.length)
      while (i < n) { val t = c(i) - v(i); d += t * t; i += 1 }
      d
    }
    def nearest(cs: Array[(Int, Array[Double])], v: Array[Float]): Int =
      cs.minBy { case (id, c) => (dist2(c, v), id) }._1
    def nearestK(cs: Array[(Int, Array[Double])], v: Array[Float], k: Int): Seq[Int] =
      cs.sortBy { case (id, c) => (dist2(c, v), id) }.take(k).map(_._1).toSeq
    // Seq entry points do one .toArray: the incoming UDF Seq is a List
    // (O(n) indexing) — see the registerAll note
    def nearest(cs: Array[(Int, Array[Double])], vs: Seq[Float]): Int =
      nearest(cs, vs.toArray)
    def nearestK(cs: Array[(Int, Array[Double])], vs: Seq[Float], k: Int): Seq[Int] =
      nearestK(cs, vs.toArray, k)
  }

  /** Per-executor hyperplane matrix: component (p, i) = md5_60(p·10007+i || "hp")
    * scaled into [-1, 1). Deterministic, derived once per (bits, dims). */
  private[ops] def hyperplanes(bits: Int, dims: Int): Array[Array[Double]] =
    hyperplanesT(0, bits, dims)

  private val planeCacheT =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Int), Array[Array[Double]]]()

  /** Table-seeded hyperplane matrix: plane p of table t is row t·1000003+p of
    * the shared md5 stream — table 0 coincides with [[hyperplanes]]; distinct
    * tables are independent draws (1000003 > any realistic `bits`, so plane
    * ROWS never collide across tables). The per-row component stride is
    * 10007, so the no-overlap guarantee holds only for `dims` ≤ 10007 —
    * enforced here rather than silently correlating adjacent planes for
    * ultra-high-dimensional embeddings. */
  private[ops] def hyperplanesT(table: Int, bits: Int, dims: Int): Array[Array[Double]] = {
    require(dims <= 10007,
      s"hyperplanes support dims <= 10007 (seed stride), got $dims — widen the stride first")
    planeCacheT.computeIfAbsent((table, bits, dims), { case (t, b, d) =>
      Array.tabulate(b, d) { (p, i) =>
        // Long seed: (t·1000003 + p)·10007 + i overflows Int32 for t ≥ 1
        val seed = (t.toLong * 1000003L + p) * 10007L + i
        Hashing.md5_60(seed.toString + "hp").toDouble / 5.764607523034235e17 - 1.0
      }
    })
  }

  /** Final rerank shared by every ANN family: bounded partial heaps cut the
    * scored candidates to ≤ k per query BEFORE the exchange
    * ([[graft.plans.TopKPerKey]]), so the shuffle carries survivors only —
    * never all candidates into ≤ #queries reducer partitions (the skew
    * funnel a `row_number()` window would create at scale). The rank column
    * is then derived by a window over the tiny survivor set (≤ k × #queries
    * rows), keeping the output identical to the windowed formulation. */
  private def topKRank(scored: DataFrame, k: Int): DataFrame = {
    val survivors = graft.plans.TopKPerKey.topKBy(
      scored, Seq("q_id"), Seq(("sim", false), ("vec_id", true)), k)
    val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("vec_id").asc)
    survivors.withColumn("rank", row_number().over(w))
  }

  /** Exact top-k neighbors for each query vector, via broadcast + bounded
    * partial heaps. `queries` must be small (driver-broadcastable); corpus
    * side never shuffles full vectors — only surviving (qid, id, sim)
    * triples. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val scored = corpus.crossJoin(broadcast(queries))
      .withColumn("sim", expr("cosine_sim(embedding, q_embedding)"))
      .select(col("q_id"), col("vec_id"), col("sim"))
    topKRank(scored, k)
  }

  /**
   * Per-vector int8 scalar quantization: `codes[i] = round(e[i] / scale)`
   * with `scale = max(|e|) / 127` — 4 bytes/dim → 1 byte/dim, the compressed
   * corpus representation for 100 TB-scale ANN (a quantized corpus scan
   * reads a quarter of the bytes; the scale rides along for asymmetric
   * dequantized scoring). Deterministic: fixed operation order, float-exact
   * on any engine that mirrors it.
   */
  def quantizeInt8(corpus: DataFrame, embCol: String = "embedding"): DataFrame =
    corpus
      .withColumn("q_scale", expr(
        s"CAST(CAST(array_max(transform($embCol, x -> abs(x))) AS DOUBLE) / 127.0 AS FLOAT)"))
      // scale 0 (all-zero vector) quantizes to all-zero codes — 0/0 would be
      // NaN, which LEAST/GREATEST would clamp to 127 and the scale-cancelled
      // cosine would then score as a real direction instead of sim = 0
      .withColumn("codes", expr(
        s"""transform($embCol, x ->
           |  IF(q_scale = CAST(0 AS FLOAT), 0,
           |     CAST(GREATEST(-127, LEAST(127,
           |       ROUND(CAST(x AS DOUBLE) / CAST(q_scale AS DOUBLE)))) AS INT)))""".stripMargin))

  /** Top-k over the QUANTIZED corpus — the asymmetric-distance search
    * shape. The per-vector scale CANCELS in cosine (`cos(s·c, q) =
    * cos(c, q)` for s > 0), so the int8 codes score DIRECTLY against float
    * queries through the `cosine_sim(int[], float[])` overload — no
    * dequantized array ever materializes (a dequantizing transform was
    * re-evaluated per (row, query) pair and cost more than the byte
    * savings). Same broadcast + bounded-heap topology as
    * [[bruteForceTopK]]; the corpus side scans codes only; the scale column
    * exists for metrics where it does not cancel (L2, dot). */
  def quantizedTopK(quantized: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val scored = quantized.crossJoin(broadcast(queries))
      .withColumn("sim", expr("cosine_sim(codes, q_embedding)"))
      .select(col("q_id"), col("vec_id"), col("sim"))
    topKRank(scored, k)
  }

  /**
   * Product quantization (PQ): the dimension is split into `m` subspaces and
   * each subvector is replaced by the index of its nearest codebook entry —
   * `m` BYTES per vector against `4·dim` for float32 (16× at m=8, dim=64),
   * the standard compressed-corpus representation beyond scalar quantization.
   *
   * Codebooks default to a DETERMINISTIC corpus sample (the subvectors of
   * the `nCodes` lowest-id vectors) rather than Lloyd-refined cells:
   * sampling is the standard k-means init, skipping refinement keeps every
   * step exactly reproducible on any engine (the correctness oracle
   * re-derives codebooks, assignments and scores bit-for-bit in SQL).
   *
   * `refine` > 0 runs that many Lloyd iterations over ALL `m` subspace
   * codebooks in ONE fused corpus scan per iteration (the [[ivfCentroids]]
   * machinery, subspace-keyed): each partition folds its vectors into
   * ≤ m·nCodes fixed-point sum rows, the tiny partials merge
   * distributively, and exactly m·nCodes·(dim/m) scalars reach the driver
   * per iteration — bit-reproducible at any parallelism (integer sums are
   * order-independent), but the result depends on the whole corpus, so
   * refined codebooks are opt-in (the default keeps the oracle replayable).
   * Assignment tie-breaking matches [[pqEncode]] (strict <, first min
   * wins); a code that attracts no vectors keeps its previous centroid.
   *
   * Returns `[s][c][j]`: `m` codebooks of `nCodes` centroids of `dim/m` dims.
   */
  def pqCodebook(corpus: DataFrame, m: Int = 8, nCodes: Int = 16,
      idCol: String = "vec_id", embCol: String = "embedding",
      refine: Int = 0): Array[Array[Array[Float]]] = {
    require(refine >= 0 && refine <= 50, "refine in 0..50")
    require(nCodes <= 65536, "nCodes must fit 16 bits")
    val sample = corpus.orderBy(col(idCol)).limit(nCodes)
      .select(embCol).collect().map(_.getSeq[Float](0).toArray)
    require(sample.length == nCodes, s"corpus smaller than nCodes=$nCodes")
    val dim = sample.head.length
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val w = dim / m
    var cb = Array.tabulate(m)(s =>
      Array.tabulate(nCodes)(c => sample(c).slice(s * w, (s + 1) * w)))
    if (refine > 0) {
      val spark = corpus.sparkSession
      // one materialization of the embedding column for the whole loop
      val emb = corpus.select(col(embCol))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      import org.apache.spark.sql.{Encoders, Row}
      import org.apache.spark.sql.types._
      val partialSchema = StructType(Seq(
        StructField("s", IntegerType), StructField("code", IntegerType),
        StructField("sx", ArrayType(LongType)), StructField("cnt", LongType)))
      val partialEnc = Encoders.row(partialSchema)
      for (_ <- 0 until refine) {
        val bc = spark.sparkContext.broadcast(cb)
        val partials = emb.mapPartitions { it =>
          val c = bc.value
          val acc = new java.util.HashMap[Int, Array[Long]]()
          while (it.hasNext) {
            val v = it.next().getSeq[Float](0).toArray
            var s = 0
            while (s < m) {
              var best = 0; var bestD = Double.MaxValue; var ci = 0
              while (ci < nCodes) {
                var d = 0.0; var j = 0
                while (j < w) {
                  val t = v(s * w + j).toDouble - c(s)(ci)(j).toDouble
                  d += t * t; j += 1
                }
                if (d < bestD) { bestD = d; best = ci } // pqEncode's tie rule
                ci += 1
              }
              var a = acc.get(s * 65536 + best)
              if (a == null) {
                a = new Array[Long](w + 1); acc.put(s * 65536 + best, a)
              }
              var j = 0
              while (j < w) {
                a(j) += math.round(v(s * w + j).toDouble * IvfScale); j += 1
              }
              a(w) += 1
              s += 1
            }
          }
          import scala.jdk.CollectionConverters._
          acc.asScala.iterator.map { case (key, a) =>
            Row(key / 65536, key % 65536, a.take(w).toSeq, a(w))
          }
        }(partialEnc)
        val sums = partials
          .select(col("s"), col("code"), col("cnt"),
            posexplode(col("sx")).as(Seq("dim", "x")))
          .groupBy("s", "code", "dim")
          .agg(sum(col("x")).as("sx"), sum(col("cnt")).as("n"))
          .collect()
        val next = cb.map(_.map(_.clone()))
        sums.foreach { r =>
          next(r.getInt(0))(r.getInt(1))(r.getInt(2)) =
            (r.getLong(3).toDouble / IvfScale / r.getLong(4)).toFloat
        }
        cb = next
      }
      emb.unpersist(blocking = false)
    }
    cb
  }

  /** Encode each vector as `m` code bytes: per subspace, the argmin-L2
    * codebook entry (ties to the lowest code — the oracle's
    * `ORDER BY d2, code` exactly). A pure projection: no shuffle; the
    * codebook broadcasts once per executor. The codes column is BINARY
    * (one blob of `m` bytes), the most compact parquet representation. */
  def pqEncode(corpus: DataFrame, codebook: Array[Array[Array[Float]]],
      idCol: String = "vec_id", embCol: String = "embedding",
      keep: Seq[String] = Nil): DataFrame = {
    val bc = corpus.sparkSession.sparkContext.broadcast(codebook)
    val enc = udf { (embSeq: Seq[Float]) =>
      val emb = embSeq.toArray  // List indexing is O(n) — see registerAll note
      val cb = bc.value
      val m = cb.length
      val w = cb(0)(0).length
      Array.tabulate(m) { s =>
        var best = 0
        var bestD = Double.MaxValue
        var c = 0
        while (c < cb(s).length) {
          var d = 0.0
          var j = 0
          while (j < w) {
            val t = emb(s * w + j).toDouble - cb(s)(c)(j).toDouble
            d += t * t
            j += 1
          }
          if (d < bestD) { bestD = d; best = c } // strict < : first min wins
          c += 1
        }
        best.toByte
      }
    }
    corpus.select(col(idCol) +: keep.map(col) :+ enc(col(embCol)).as("codes"): _*)
  }

  /** The PQ cosine scorer (codes vs float query) shared by [[pqTopK]] and
    * [[ivfPqTopK]] — flat dimension-order accumulation, oracle-exact. */
  private def pqSim(spark: org.apache.spark.sql.SparkSession,
      codebook: Array[Array[Array[Float]]]) = {
    val bc = spark.sparkContext.broadcast(codebook)
    udf { (codes: Array[Byte], qeSeq: Seq[Float]) =>
      val qe = qeSeq.toArray  // List indexing is O(n) — see registerAll note
      val cb = bc.value
      val m = cb.length
      val w = cb(0)(0).length
      var dot = 0.0
      var nq = 0.0
      var nv = 0.0
      // subspace-outer loops hoist the centroid lookup out of the element
      // loop; accumulation still visits elements in flat dimension order, so
      // every double matches the oracle's single 64-wide comprehension
      var s = 0
      while (s < m) {
        val cent = cb(s)(codes(s) & 0xFF)
        val off = s * w
        var j = 0
        while (j < w) {
          val rvj = cent(j).toDouble
          val qj = qe(off + j).toDouble
          dot += qj * rvj
          nq += qj * qj
          nv += rvj * rvj
          j += 1
        }
        s += 1
      }
      dot / (math.sqrt(nq) * math.sqrt(nv))
    }
  }

  /** Top-k over the PQ-ENCODED corpus: the scan reads `m` code bytes per
    * vector instead of the float array; scoring is cosine against the
    * codebook-reconstructed vector, accumulated in flat dimension order so
    * the SQL oracle reproduces every double exactly. Same broadcast +
    * bounded-heap topology as [[bruteForceTopK]]. (A per-query lookup-table
    * refinement — 8 adds per vector instead of 64 multiplies — changes the
    * summation GROUPING and therefore the low bits; production would pair it
    * with a tolerance oracle.) */
  def pqTopK(encoded: DataFrame, codebook: Array[Array[Array[Float]]],
      queries: DataFrame, k: Int): DataFrame = {
    val sim = pqSim(encoded.sparkSession, codebook)
    val scored = encoded.crossJoin(broadcast(queries))
      .select(col("q_id"), col("vec_id"),
        sim(col("codes"), col("q_embedding")).as("sim"))
    topKRank(scored, k)
  }

  /** PQ shortlist + EXACT rerank — the refine topology that turns the
    * compressed scan into real recall@k. PQ codes have a resolution floor:
    * vectors closer together than the per-subspace quantization error share
    * a code, so [[pqTopK]] alone cannot rank within a tight cluster (its
    * measured recall@10 on a 1000-member-cluster corpus is ~0.03 — an
    * inherent property of 8-byte codes, not a bug). Production PQ therefore
    * scans codes to cut 1M candidates to a `shortlist` (here: per-query
    * bounded heaps over the compressed scan), then rescores ONLY the
    * shortlist against stored float vectors. At 100 TB the exact pass
    * touches `shortlist × |queries|` rows — the corpus is read once as
    * 8-byte codes, float vectors only via the (tiny) shortlist semi-join.
    * Pick `shortlist` ≥ the code-resolution cell population (the number of
    * corpus rows a single PQ code cannot rank between). */
  def pqTopKRerank(corpus: DataFrame, encoded: DataFrame,
      codebook: Array[Array[Array[Float]]], queries: DataFrame,
      k: Int, shortlist: Int): DataFrame = {
    require(shortlist >= k, s"shortlist $shortlist < k $k")
    val cand = pqTopK(encoded, codebook, queries, shortlist)
      .select(col("q_id"), col("vec_id"))
    // the shortlist is ≤ shortlist × |queries| rows — broadcast it so the
    // float-vector fetch is a map-side semi-join over the corpus scan, never
    // a shuffle of all corpus vectors on vec_id
    val rescored = broadcast(cand)
      .join(corpus.select(col("vec_id"), col("embedding")), "vec_id")
      .join(broadcast(queries), "q_id")
      .withColumn("sim", expr("cosine_sim(embedding, q_embedding)"))
      .select(col("q_id"), col("vec_id"), col("sim"))
    topKRank(rescored, k)
  }

  /**
   * IVF × PQ — the production composition (the classic IVFPQ layout):
   * coarse cells prune the candidate scan to an `nprobe / nCells` fraction,
   * PQ codes compress what remains to `m` bytes per vector — at 100 TB the
   * search reads `nprobe/nCells × m/(4·dim)` of the raw corpus bytes.
   * At `nprobe = nCells` the result is EXACTLY [[pqTopK]]'s (cell pruning
   * only removes candidates), which is how the correctness oracle gates it;
   * at scale `nprobe` is the recall/cost knob, same contract as [[ivfTopK]].
   */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      codebook: Array[Array[Array[Float]]], nCells: Int = 16,
      nprobe: Int = 3, iters: Int = 5): DataFrame = {
    val spark = corpus.sparkSession
    val centroids = ivfCentroids(corpus, nCells, iters)
    val bcC = spark.sparkContext.broadcast(centroids)
    val assignCell = udf { (v: Seq[Float]) => Ivf.nearest(bcC.value, v) }
    val probeCells = udf { (v: Seq[Float]) => Ivf.nearestK(bcC.value, v, nprobe) }
    val encoded = pqEncode(
      corpus.withColumn("cell", assignCell(col("embedding"))),
      codebook, keep = Seq("cell"))
    val q = queries.withColumn("cell", explode(probeCells(col("q_embedding"))))
    val sim = pqSim(spark, codebook)
    val scored = encoded.join(broadcast(q), Seq("cell"))
      .select(col("q_id"), col("vec_id"),
        sim(col("codes"), col("q_embedding")).as("sim"))
    topKRank(scored, k)
  }

  /**
   * IVF (inverted-file) ANN: deterministic distributed k-means centroids,
   * corpus assigned to its nearest centroid, queries probe `nprobe` nearest
   * cells and rerank exactly. The other bucketing family next to hyperplane
   * LSH — same topology (assignment column + bucket equi-join + per-bucket
   * rerank), but data-adaptive cells.
   *
   * Scale: each Lloyd iteration is one map (assign via broadcast centroids)
   * + one tiny shuffle (groupBy centroid, k rows out). Assignment is a pure
   * projection; the search join shuffles candidates only.
   */
  /** Fixed-point scale for order-independent centroid accumulation: float
    * components are scaled to integers before the distributed sum, so the
    * result is bit-identical regardless of partial-aggregation order (a
    * double sum would drift with partitioning). 2^24 leaves ~2^39 rows of
    * headroom per cell in an Int64 for unit-normalized embeddings. */
  private val IvfScale = 1 << 24

  def ivfCentroids(corpus: DataFrame, k: Int, iters: Int = 5): Array[(Int, Array[Double])] = {
    val spark = corpus.sparkSession
    // ONE materialization of the (vec_id, embedding) projection for the whole
    // Lloyd loop: at 100 TB the full-width corpus is never re-read per
    // iteration — the projection persists (memory, spilling to disk) and both
    // the init sample and every iteration read the cached columns.
    val emb = corpus.select(col("vec_id"), col("embedding"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // deterministic sample init, no count(): order by a hash of vec_id and
    // take k — TakeOrderedAndProject keeps a k-row heap per partition and
    // merges k rows on the driver (a sample scan, not a global sort).
    var centroids: Array[(Int, Array[Double])] = emb
      .orderBy(xxhash64(col("vec_id")), col("vec_id"))
      .limit(k)
      .select("embedding").collect().zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Float](0).map(_.toDouble).toArray) }
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types._
    val partialSchema = StructType(Seq(
      StructField("cell", IntegerType), StructField("sx", ArrayType(LongType)),
      StructField("cnt", LongType)))
    val partialEnc = Encoders.row(partialSchema)
    for (_ <- 0 until iters) {
      val bc = spark.sparkContext.broadcast(centroids)
      // One corpus scan per Lloyd iteration: each partition folds its vectors
      // into ≤ k fixed-point sum rows (assignment + accumulation fused, no
      // per-dimension row blowup on the corpus). The tiny partials
      // (partitions × k rows) then merge distributively per (cell, dim) —
      // integer sums are order-independent, so centroids are bit-reproducible
      // at any parallelism — and exactly k × dim scalars reach the driver.
      val partials = emb.select("embedding").mapPartitions { it =>
        val cs = bc.value
        val acc = new java.util.HashMap[Int, Array[Long]]()
        var dim = 0
        while (it.hasNext) {
          val v = it.next().getSeq[Float](0).toArray
          dim = v.length
          val cell = Ivf.nearest(cs, v)
          var a = acc.get(cell)
          if (a == null) { a = new Array[Long](dim + 1); acc.put(cell, a) }
          var i = 0
          while (i < dim) { a(i) += math.round(v(i).toDouble * IvfScale); i += 1 }
          a(dim) += 1
        }
        import scala.jdk.CollectionConverters._
        acc.asScala.iterator.map { case (cell, a) =>
          Row(cell, a.take(dim).toSeq, a(dim))
        }
      }(partialEnc)
      val sums = partials
        .select(col("cell"), col("cnt"), posexplode(col("sx")).as(Seq("dim", "x")))
        .groupBy("cell", "dim")
        .agg(sum(col("x")).as("sx"), sum(col("cnt")).as("n"))
        .collect()
      centroids = sums.groupBy(_.getInt(0)).toArray.map { case (cell, rows) =>
        val mean = new Array[Double](rows.length)
        rows.foreach { r =>
          mean(r.getInt(1)) = r.getLong(2).toDouble / IvfScale / r.getLong(3)
        }
        (cell, mean)
      }.sortBy(_._1)
    }
    emb.unpersist(blocking = false)
    centroids
  }

  /** Assign + probe + exact rerank. `queries` columns: q_id, q_embedding. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              nCells: Int = 16, nprobe: Int = 3, iters: Int = 5): DataFrame = {
    val spark = corpus.sparkSession
    val centroids = ivfCentroids(corpus, nCells, iters)
    val bc = spark.sparkContext.broadcast(centroids)
    val assignCell = udf { (v: Seq[Float]) => Ivf.nearest(bc.value, v) }
    val probeCells = udf { (v: Seq[Float]) => Ivf.nearestK(bc.value, v, nprobe) }
    val c = corpus.withColumn("cell", assignCell(col("embedding")))
    val q = queries.withColumn("cell", explode(probeCells(col("q_embedding"))))
    val scored = c.join(broadcast(q), Seq("cell"))
      .withColumn("sim", expr("cosine_sim(embedding, q_embedding)"))
      .select(col("q_id"), col("vec_id"), col("sim"))
    topKRank(scored, k)
  }

  /**
   * Persist an IVF index: centroids (k tiny rows) plus the corpus assigned to
   * cells and written `partitionBy(cell)`. Searches against the saved index
   * then read ONLY the probed cells — the cell equi-join against a broadcast
   * query side triggers dynamic partition pruning, so a 100 TB corpus scan
   * becomes an nprobe/nCells fraction of the files.
   */
  def ivfSave(corpus: DataFrame, path: String, nCells: Int, iters: Int = 5): Unit = {
    val spark = corpus.sparkSession
    val centroids = ivfCentroids(corpus, nCells, iters)
    import spark.implicits._
    centroids.toSeq.map { case (c, arr) => (c, arr.toSeq) }
      .toDF("cell", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
    val bc = spark.sparkContext.broadcast(centroids)
    val assignCell = udf { (v: Seq[Float]) => Ivf.nearest(bc.value, v) }
    corpus.withColumn("cell", assignCell(col("embedding")))
      .write.mode("overwrite").partitionBy("cell").parquet(s"$path/assigned")
  }

  /** Incrementally maintain a saved IVF index: assign NEW vectors to the
    * EXISTING centroids (k tiny rows, read once and broadcast) and append
    * them into the `partitionBy(cell)` layout — one pass over the increment,
    * zero touch of the already-indexed corpus, and the search path is
    * unchanged (appended files land inside the probed cell directories).
    * This is the standard IVF maintenance contract: centroids drift from
    * the true k-means of the grown corpus, so rebuild with [[ivfSave]] when
    * the increment fraction (or measured recall) crosses your threshold. */
  def ivfAppend(spark: org.apache.spark.sql.SparkSession, path: String,
                newVectors: DataFrame): Unit = {
    val centroids = spark.read.parquet(s"$path/centroids").collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toArray)).sortBy(_._1)
    val bc = spark.sparkContext.broadcast(centroids)
    val assignCell = udf { (v: Seq[Float]) => Ivf.nearest(bc.value, v) }
    newVectors.withColumn("cell", assignCell(col("embedding")))
      .write.mode("append").partitionBy("cell").parquet(s"$path/assigned")
  }

  /** Search a saved IVF index: probe `nprobe` nearest cells per query, exact
    * rerank. The union of probed cells is computed driver-side from the
    * (small, broadcastable) query set and applied as a LITERAL partition
    * filter on the `partitionBy(cell)` layout — static partition pruning the
    * planner can see (`PartitionFilters: cell IN (...)`), no reliance on
    * runtime DPP: a 100 TB index reads at most nprobe/nCells of its files. */
  def ivfSearchSaved(spark: org.apache.spark.sql.SparkSession, path: String,
                     queries: DataFrame, k: Int, nprobe: Int): DataFrame = {
    val centroids = spark.read.parquet(s"$path/centroids").collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toArray)).sortBy(_._1)
    val bc = spark.sparkContext.broadcast(centroids)
    val probeCells = udf { (v: Seq[Float]) => Ivf.nearestK(bc.value, v, nprobe) }
    val q = queries.withColumn("cell", explode(probeCells(col("q_embedding"))))
    // ≤ nCells distinct values, from the already-small query side
    val probed = q.select("cell").distinct().collect().map(_.getInt(0)).sorted
    val c = spark.read.parquet(s"$path/assigned")
      .where(col("cell").isin(probed.map(Integer.valueOf).toSeq: _*))
    val scored = c.join(broadcast(q), Seq("cell"))
      .withColumn("sim", expr("cosine_sim(embedding, q_embedding)"))
      .select(col("q_id"), col("vec_id"), col("sim"))
    topKRank(scored, k)
  }

  /** Sentinel for the `bits` parameter of [[lshTopK]] / [[lshJoinTopK]] /
    * [[lshJoinTopKMulti]]: resolve via [[autoBits]] from a `count()` of the
    * bucketed (corpus/right) side. The count is ONE extra cheap job — a
    * column-pruned scan (parquet answers it from footer row counts) — and
    * removes the 100 TB footgun of the old fixed default (8 bits over a
    * billion rows = 4M-row buckets). Pass explicit `bits` to skip the count
    * job: required where the result must not depend on corpus size (oracle
    * gates) and for [[lshJoinTopKPrebucketed]], whose bits are fixed at
    * bucketing time. */
  val AutoBits: Int = 0

  private def resolveBits(bits: Int, bucketedSide: DataFrame): Int =
    if (bits == AutoBits) autoBits(bucketedSide.count())
    else { require(bits >= 1 && bits <= 62, "bits in 1..62"); bits }

  /** LSH-bucketed ANN: both sides bucketed by hyperplane signature; candidates
    * only within matching buckets, then exact rerank + top-k. `bits` defaults
    * to [[AutoBits]] (occupancy-ruled from a corpus count — see there). */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              bits: Int = AutoBits): DataFrame = {
    val b = resolveBits(bits, corpus)
    val c = corpus.withColumn("bucket", expr(s"hyperplane_bucket(embedding, $b)"))
    val q = queries.withColumn("bucket", expr(s"hyperplane_bucket(q_embedding, $b)"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .withColumn("sim", expr("cosine_sim(embedding, q_embedding)"))
      .select(col("q_id"), col("vec_id"), col("sim"))
    topKRank(scored, k)
  }

  /** BIG-BIG ANN join: approximate top-k `right` neighbors for EVERY `left`
    * row, with NEITHER side broadcast — the retrieval join for two
    * corpus-scale relations (dedup one corpus against another, link every
    * training document to its nearest benchmark items, nearest-neighbor
    * feature joins). `left` is `(q_id, q_embedding)`, `right` is
    * `(vec_id, embedding)` — the family's column conventions.
    *
    * Both sides are hyperplane-bucketed; the left side additionally probes
    * its `bits` Hamming-1 neighbor buckets (multi-probe: one explode,
    * recovers most near-boundary misses). Candidates arise ONLY from the
    * bucket equi-join, and each (left, right) pair meets at most once (the
    * right row holds a single bucket, the probe set is distinct), so no
    * dedup pass is needed. The rerank cuts to ≤ k per left row with bounded
    * partial heaps BEFORE any exchange ([[graft.plans.TopKPerKey]]).
    *
    * Scale: the shuffles carry (1 + bits)·|left| probe rows, bucket-matched
    * candidate triples, and k survivors per left row — never a broadcast of
    * either relation, never all pairs. `bits` defaults to [[AutoBits]]: the
    * occupancy rule picks it from a `right.count()` (one extra cheap job),
    * so candidate volume stays bounded however big the corpus; pass
    * explicit `bits` to skip the count. */
  def lshJoinTopK(left: DataFrame, right: DataFrame, k: Int,
                  bits: Int = AutoBits, multiProbe: Boolean = true): DataFrame = {
    requireAnnJoinColumns(left, right)
    val b = resolveBits(bits, right)
    val r = right.withColumn("bucket", expr(s"hyperplane_bucket(embedding, $b)"))
    val scored = probeExpand(left, b, multiProbe).join(r, "bucket")
      .withColumn("sim", expr("cosine_sim(embedding, q_embedding)"))
      .select(col("q_id"), col("vec_id"), col("sim"))
    topKRank(scored, k)
  }

  /** Multi-probe expansion of the query side: each probe row carries its own
    * bucket plus (optionally) the `bits` Hamming-1 neighbor buckets. */
  private def probeExpand(left: DataFrame, bits: Int, multiProbe: Boolean): DataFrame = {
    val l0 = left.withColumn("__b0", expr(s"hyperplane_bucket(q_embedding, $bits)"))
    if (multiProbe)
      l0.withColumn("bucket", explode(expr(
          s"array_append(transform(sequence(0, ${bits - 1}), " +
            "i -> __b0 ^ shiftleft(CAST(1 AS BIGINT), i)), __b0)")))
        .drop("__b0")
    else l0.withColumnRenamed("__b0", "bucket")
  }

  /** Attach the LSH `bucket` column to a corpus, tagging the column's
    * METADATA with the bits used — [[lshJoinTopKPrebucketed]] reads the tag
    * back and refuses a bits mismatch, so a corpus bucketed at 16 bits can
    * never silently misjoin against 18-bit probes. This is the documented
    * way to prepare (and persist) a corpus for the streaming twin; the
    * caller owns the persist/unpersist lifecycle. */
  def bucketCorpus(corpus: DataFrame, bits: Int): DataFrame = {
    require(bits >= 1 && bits <= 62, "bits in 1..62")
    val md = new org.apache.spark.sql.types.MetadataBuilder()
      .putLong("graft.lsh.bits", bits.toLong).build()
    corpus.withColumn("bucket",
      expr(s"hyperplane_bucket(embedding, $bits)").as("bucket", md))
  }

  /** Retrieval against a PRE-BUCKETED corpus ([[bucketCorpus]] output,
    * typically persisted), query side BROADCAST — the micro-batch topology
    * of the streaming twin ([[graft.streaming.Streaming.annJoinStream]]),
    * where a small probe batch joins the cached corpus map-only: no corpus
    * shuffle, no corpus re-hash, per batch. Same output contract as
    * [[lshJoinTopK]] at the same (bits, multiProbe).
    *
    * SMALL-LEFT CONTRACT: the probe side is broadcast after a ×(bits+1)
    * multi-probe expansion, so a large batch would OOM the driver. The
    * contract is enforced loudly (family guard convention): the expanded
    * probe row count must stay ≤ `maxProbeRows` (bounded-limit count, one
    * cheap job; pass `maxProbeRows <= 0` to skip the check when the batch
    * size is known by construction). For probe sets too big to broadcast,
    * pass `broadcastLeft = false` (plain shuffled equi-join — no guard
    * needed) or use [[lshJoinTopK]]. */
  def lshJoinTopKPrebucketed(left: DataFrame, bucketedRight: DataFrame, k: Int,
      bits: Int, multiProbe: Boolean = true, broadcastLeft: Boolean = true,
      maxProbeRows: Long = 4000000L): DataFrame = {
    require(bits >= 1 && bits <= 62, "bits in 1..62")
    require(bucketedRight.columns.contains("bucket"),
      "prebucketed right needs a bucket column — build it with bucketCorpus(corpus, bits)")
    // probe buckets at N bits against a corpus bucketed at M ≠ N bits match
    // only on coincidental collisions — garbage output with no error. The
    // bits ride the bucket column's metadata so the mismatch fails loudly.
    locally {
      val md = bucketedRight.schema("bucket").metadata
      require(md.contains("graft.lsh.bits"),
        "bucket column lacks graft.lsh.bits metadata — build it with bucketCorpus(corpus, bits)")
      require(md.getLong("graft.lsh.bits") == bits.toLong,
        s"corpus bucketed at ${md.getLong("graft.lsh.bits")} bits, probes at $bits")
    }
    requireAnnJoinColumns(left, bucketedRight.drop("bucket"))
    val probes = probeExpand(left, bits, multiProbe)
    val probeSide = if (!broadcastLeft) probes
    else {
      if (maxProbeRows > 0) {
        val expansion = if (multiProbe) bits + 1L else 1L
        val leftCap = math.max(1L, maxProbeRows / expansion)
          .min(Int.MaxValue - 1L)
        // LocalLimit caps the per-partition scan, so the count job reads at
        // most leftCap+1 rows — cheap for a well-sized probe batch
        val n = left.limit(leftCap.toInt + 1).count()
        require(n <= leftCap,
          s"lshJoinTopKPrebucketed: probe batch has > $leftCap rows (×$expansion " +
            s"multi-probe expansion exceeds maxProbeRows=$maxProbeRows) — too big " +
            "to broadcast; pass broadcastLeft=false or use lshJoinTopK")
      }
      broadcast(probes)
    }
    val scored = bucketedRight.join(probeSide, "bucket")
      .withColumn("sim", expr("cosine_sim(embedding, q_embedding)"))
      .select(col("q_id"), col("vec_id"), col("sim"))
    topKRank(scored, k)
  }

  /** Shared input contract for the big-big ANN joins: the family's column
    * conventions must hold, and the intermediate names this op introduces
    * must not already exist (the guard convention of globalPrefix /
    * bucketedIntervalJoin — fail loudly, never misjoin silently). */
  private def requireAnnJoinColumns(left: DataFrame, right: DataFrame): Unit = {
    require(left.columns.contains("q_id") && left.columns.contains("q_embedding"),
      s"ANN join: left needs (q_id, q_embedding); got ${left.columns.mkString(", ")}")
    require(right.columns.contains("vec_id") && right.columns.contains("embedding"),
      s"ANN join: right needs (vec_id, embedding); got ${right.columns.mkString(", ")}")
    val reserved = Seq("bucket", "__b0", "__t", "sim", "rank")
    val clashL = left.columns.intersect(reserved) ++
      left.columns.intersect(Seq("vec_id", "embedding"))
    val clashR = right.columns.intersect(reserved) ++
      right.columns.intersect(Seq("q_id", "q_embedding"))
    require(clashL.isEmpty,
      s"ANN join: left columns ${clashL.mkString(", ")} collide with intermediates/output")
    require(clashR.isEmpty,
      s"ANN join: right columns ${clashR.mkString(", ")} collide with intermediates/output")
  }

  /** MULTI-TABLE big-big ANN join: `tables` independent hyperplane sets
    * (table-seeded — see hyperplane_bucket_t), candidates are the UNION of
    * per-table bucket matches. This is the recall knob that does NOT blow
    * bucket occupancy: each table keeps its full `bits` selectivity (mean
    * occupancy |right| / 2^bits unchanged), and a near-boundary pair missed
    * by one table's planes gets `tables` independent chances — the same
    * banded trick minhash-LSH dedup uses, applied to embeddings. Contrast
    * Hamming-1 multi-probe, which only recovers single-plane flips.
    *
    * Topology: both sides explode ×`tables` (composite key (__t, bucket)),
    * candidates from the two-column equi-join only. A pair meeting in
    * several tables would duplicate, so CANDIDATE pairs are deduplicated on
    * (q_id, vec_id) — with map-side partial aggregation — BEFORE cosine is
    * computed: each pair is scored exactly once, and correctness never
    * leans on float bit-equality of recomputed scores. Shuffles carry:
    * tables·|probe rows|, then ≤ one candidate row per distinct pair (the
    * embeddings ride the dedup exchange once), then ≤ k survivors per left
    * row. Neither side is ever broadcast. `bits` defaults to [[AutoBits]]
    * (occupancy-ruled from a `right.count()` — per-table occupancy is what
    * the rule bounds, so the same resolution applies). */
  def lshJoinTopKMulti(left: DataFrame, right: DataFrame, k: Int,
                       bits: Int = AutoBits, tables: Int = 4): DataFrame = {
    require(tables >= 1 && tables <= 64, "tables in 1..64")
    requireAnnJoinColumns(left, right)
    val b = resolveBits(bits, right)
    val ts = expr(s"explode(sequence(0, ${tables - 1}))")
    val r = right.withColumn("__t", ts)
      .withColumn("bucket", expr(s"hyperplane_bucket_t(embedding, $b, __t)"))
    val l = left.withColumn("__t", ts)
      .withColumn("bucket", expr(s"hyperplane_bucket_t(q_embedding, $b, __t)"))
    val scored = l.join(r, Seq("__t", "bucket"))
      .select(col("q_id"), col("q_embedding"), col("vec_id"), col("embedding"))
      .dropDuplicates("q_id", "vec_id")
      .withColumn("sim", expr("cosine_sim(embedding, q_embedding)"))
      .select(col("q_id"), col("vec_id"), col("sim"))
    topKRank(scored, k)
  }

  /** The 100 TB occupancy rule as code: the smallest `bits` whose mean
    * bucket occupancy `rightRows / 2^bits` is ≤ `targetOccupancy` — pick
    * the right-side row count from a cheap `right.count()` (or a catalog
    * estimate) and hand the result to [[lshJoinTopK]]/[[lshJoinTopKMulti]].
    * Candidate volume per probe then stays O(targetOccupancy·(bits+1)),
    * independent of corpus growth; clamped to [minBits, 62]. The default
    * occupancy is 4: Hamming-1 multi-probe already visits bits+1 buckets
    * per probe row, so ~4·(bits+1) candidates is ample for small k — it is
    * also exactly the hand-tuned sizing of the 1M probes (18 bits), so the
    * auto default costs what the tuned value did. */
  def autoBits(rightRows: Long, targetOccupancy: Long = 4L, minBits: Int = 8): Int = {
    require(rightRows >= 0, "rightRows must be >= 0")
    require(targetOccupancy >= 1, "targetOccupancy must be >= 1")
    require(minBits >= 1 && minBits <= 62, "minBits in 1..62")
    var b = minBits
    while (b < 62 && (rightRows >> b) > targetOccupancy) b += 1
    b
  }
}
