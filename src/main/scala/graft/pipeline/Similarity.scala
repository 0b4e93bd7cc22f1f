package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.expressions.Window

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two paths:
  *  - [[bruteForceTopK]]: exact all-pairs cosine — the correctness baseline
  *    (O(n²·d), only viable for small corpora or per-bucket refinement);
  *  - [[lshTopK]]: random-hyperplane LSH (Charikar 2002 SimHash for cosine)
  *    — the 100 TB path: signatures are computed shuffle-free, candidates
  *    only form within (table, bucket) groups, so the join fan-out is
  *    n²/2^bits per table instead of n².
  *
  * The dot product is `aggregate(zip_with(a,b,*), 0d, +)` — public
  * higher-order functions, fully codegen'd, no UDF.
  */
object Similarity {

  /** cosine similarity of two double-array columns — fused custom
    * expression with whole-stage codegen (one loop: dot + both norms).
    * The composed higher-order-function version
    * (`aggregate(zip_with(...))`) evaluates interpreted and allocates an
    * intermediate array per pair — ~50× slower on all-pairs workloads. */
  def cosine(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.cosine_similarity(a, b)

  /** raw vectors (flattened), ids, and per-row √(Σx²) — broadcast-ready.
    * Raw + explicit norms keeps the cosine formula `dot / (√na · √nb)`
    * bit-identical to the column-expression / oracle formulation. */
  private[pipeline] def collectMatrix(emb: DataFrame, idCol: String,
      vecCol: String): (Array[Long], Array[Double], Array[Double], Int) = {
    val rows = emb.select(col(idCol).cast(LongType),
      col(vecCol).cast(ArrayType(DoubleType))).collect()
    val n = rows.length
    val dim = if (n == 0) 0 else rows(0).getSeq[Double](1).length
    val ids = new Array[Long](n)
    val mat = new Array[Double](n * dim)
    val sqrtNorms = new Array[Double](n)
    var i = 0
    while (i < n) {
      ids(i) = rows(i).getLong(0)
      val v = rows(i).getSeq[Double](1)
      var norm = 0.0
      var j = 0
      while (j < dim) { val x = v(j); mat(i * dim + j) = x; norm += x * x; j += 1 }
      sqrtNorms(i) = math.sqrt(norm)
      i += 1
    }
    (ids, mat, sqrtNorms, dim)
  }

  /** round-half-up matching Spark's / DuckDB's `round(double, n)`. */
  @inline private[pipeline] def roundHalfUp(v: Double, digits: Int): Double =
    java.math.BigDecimal.valueOf(v)
      .setScale(digits, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Conservative guard band for SKIPPING the BigDecimal rounding on
    * non-competitive candidates (round 11). `roundHalfUp(x, d)` moves x
    * by at most 0.5·10⁻ᵈ (the decimal half-step) plus two sub-ulp
    * conversion errors, so whenever `x < bound - 10⁻ᵈ` it is certain
    * that `roundHalfUp(x, d) < bound` — the candidate cannot reach a
    * threshold/kth-place at `bound` and the (allocation-heavy) exact
    * rounding can be skipped without changing any emitted value. The
    * full band 10⁻ᵈ is 2× the mathematical bound — margin for the two
    * double conversions (≤ 1 ulp ≈ 2·10⁻¹⁶ here, sims are in [-1, 1]).
    * NaN/±Inf compare false against the band and fall through to the
    * rounding path, preserving the pre-guard behavior exactly. */
  @inline private[pipeline] def roundGuard(digits: Int): Double =
    math.pow(10.0, -digits)

  /** Exact top-k cosine neighbors for every vector (excludes self-matches).
    * Ranking uses the rounded similarity (stable across engines/accumulation
    * orders) with id tiebreak, so results are deterministic.
    *
    * Implementation: the normalized candidate matrix is broadcast and each
    * partition streams its queries through a dense dot-product loop with a
    * bounded top-k buffer. A relational formulation (self-join + window or
    * top-k aggregate) materializes O(n²) pair rows each carrying two d-dim
    * arrays — tens of GB of row copying that dwarfs the O(n²·d) FLOPs.
    * Catalyst has no tiled-matrix-product operator, so this is the
    * documented `mapPartitions` last resort; the driver collect makes it a
    * TEST-ONLY baseline — production paths are [[blockTopK]] (exact,
    * distributed) and [[lshTopK]] (sublinear). Package-private so no user
    * can point the unbounded collect at real data. */
  private[graft] def bruteForceTopK(emb: DataFrame, idCol: String, vecCol: String,
      k: Int = 5, roundTo: Int = 4): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(collectMatrix(emb, idCol, vecCol))
    // spread queries across all cores: a small corpus often arrives as one
    // file split, which would serialize the O(n²·d) loop
    val v = emb.select(col(idCol).cast(LongType).as("id"),
      col(vecCol).cast(ArrayType(DoubleType)).as("vec"))
      .repartition(spark.sparkContext.defaultParallelism)
      .as[(Long, Array[Double])]
    val kk = k; val rt = roundTo
    v.mapPartitions { it =>
      val (ids, mat, sqrtNorms, dim) = bc.value
      val n = ids.length
      it.flatMap { case (qid, qv) =>
        var qnorm = 0.0
        var j = 0
        while (j < dim) { val x = qv(j); qnorm += x * x; j += 1 }
        val qsqrt = math.sqrt(qnorm)
        // best-first buffer of (sim, nid), size ≤ k — same ordering as the
        // TopKAggregator: sim desc, nid asc
        val simBuf = new Array[Double](kk); val nidBuf = new Array[Long](kk)
        var filled = 0
        var i = 0
        while (i < n) {
          if (ids(i) != qid) {
            var dot = 0.0
            var j2 = 0
            val off = i * dim
            while (j2 < dim) { dot += qv(j2) * mat(off + j2); j2 += 1 }
            val denom = qsqrt * sqrtNorms(i)
            val sim = roundHalfUp(if (denom == 0.0) 0.0 else dot / denom, rt)
            val nid = ids(i)
            if (filled < kk || sim > simBuf(filled - 1) ||
                (sim == simBuf(filled - 1) && nid < nidBuf(filled - 1))) {
              var p = math.min(filled, kk - 1)
              while (p > 0 && (sim > simBuf(p - 1) ||
                  (sim == simBuf(p - 1) && nid < nidBuf(p - 1)))) {
                simBuf(p) = simBuf(p - 1); nidBuf(p) = nidBuf(p - 1); p -= 1
              }
              simBuf(p) = sim; nidBuf(p) = nid
              if (filled < kk) filled += 1
            }
          }
          i += 1
        }
        (0 until filled).map(r => (qid, nidBuf(r), simBuf(r), r + 1))
      }
    }.toDF("qid", "nid", "sim", "rank")
  }

  /** One tile's dense candidate block: ids, row-major matrix, √norms. */
  private[pipeline] def packBlock(rows: Array[(Long, Array[Double])])
      : (Array[Long], Array[Double], Array[Double], Int) = {
    val n = rows.length
    val dim = if (n == 0) 0 else rows(0)._2.length
    val ids = new Array[Long](n)
    val mat = new Array[Double](n * dim)
    val sqrtNorms = new Array[Double](n)
    var i = 0
    while (i < n) {
      ids(i) = rows(i)._1
      val v = rows(i)._2
      var norm = 0.0; var j = 0
      while (j < dim) { val x = v(j); mat(i * dim + j) = x; norm += x * x; j += 1 }
      sqrtNorms(i) = math.sqrt(norm)
      i += 1
    }
    (ids, mat, sqrtNorms, dim)
  }

  /** Per-query exact top-k scan over a packed candidate block — ONE
    * implementation shared by [[blockTopK]] and [[ivfTopK]] so their
    * bit-identical-degeneracy guarantee is structural, not maintained by
    * hand: same rounding, same sim-desc/id-asc tie-break. */
  private def topKScan(qid: Long, qv: Array[Double], ids: Array[Long],
      mat: Array[Double], sqrtNorms: Array[Double], dim: Int, kk: Int,
      rt: Int): Seq[(Long, Long, Double)] = {
    var qnorm = 0.0; var j = 0
    while (j < dim) { val x = qv(j); qnorm += x * x; j += 1 }
    val qsqrt = math.sqrt(qnorm)
    val g = roundGuard(rt)
    val simBuf = new Array[Double](kk); val nidBuf = new Array[Long](kk)
    var filled = 0
    val n = ids.length
    var i = 0
    while (i < n) {
      if (ids(i) != qid) {
        var dot = 0.0; var j2 = 0
        val off = i * dim
        while (j2 < dim) { dot += qv(j2) * mat(off + j2); j2 += 1 }
        val denom = qsqrt * sqrtNorms(i)
        val raw = if (denom == 0.0) 0.0 else dot / denom
        // guard band: once the buffer is full, a raw sim more than one
        // decimal step below the kth rounded sim cannot round into
        // admission — skip the BigDecimal entirely (see roundGuard; this
        // is the O(n²) allocation of the all-pairs kernels)
        if (!(filled == kk && raw < simBuf(kk - 1) - g)) {
          val sim = roundHalfUp(raw, rt)
          val nid = ids(i)
          if (filled < kk || sim > simBuf(filled - 1) ||
              (sim == simBuf(filled - 1) && nid < nidBuf(filled - 1))) {
            var p = math.min(filled, kk - 1)
            while (p > 0 && (sim > simBuf(p - 1) ||
                (sim == simBuf(p - 1) && nid < nidBuf(p - 1)))) {
              simBuf(p) = simBuf(p - 1); nidBuf(p) = nidBuf(p - 1); p -= 1
            }
            simBuf(p) = sim; nidBuf(p) = nid
            if (filled < kk) filled += 1
          }
        }
      }
      i += 1
    }
    (0 until filled).map(r => (qid, nidBuf(r), simBuf(r)))
  }

  /** (tileKey, id, vec) replicas for the tiled all-pairs join: each query
    * block meets each candidate block in exactly one tile, so per-tile
    * results partition the pair space — partial top-k lists merge exactly
    * and threshold pairs emit exactly once. */
  private def tiled(v: org.apache.spark.sql.Dataset[(Long, Array[Double])],
      blocks: Int, asQuery: Boolean)
      : org.apache.spark.sql.Dataset[(Int, Long, Array[Double])] = {
    import v.sparkSession.implicits._
    val b = blocks
    v.flatMap { case (id, vec) =>
      val own = ((id % b + b) % b).toInt
      if (asQuery) (0 until b).map(cb => (own * b + cb, id, vec))
      else (0 until b).map(qb => (qb * b + own, id, vec))
    }
  }

  /** Exact distributed top-k cosine neighbors — the 100 TB-safe twin of
    * [[bruteForceTopK]]: no driver collect, no O(n²) pair rows.
    *
    * Tiled block-nested-loop: ids hash into `blocks` blocks; tile (i, j)
    * cogroups query block i with candidate block j and runs the same dense
    * kernel over the materialized candidate block, emitting a bounded
    * per-query top-k. Candidate blocks partition the candidate set, so the
    * per-tile partials merge exactly through [[graft.functions.TopKAggregator]].
    * Shuffle volume: 2·blocks·n vector rows + n·blocks·k partial triples.
    * Size `blocks` so one block (n/blocks · dim doubles) fits an executor.
    * Results are bit-identical to [[bruteForceTopK]] (same rounding, same
    * sim-desc/id-asc ordering). */
  def blockTopK(emb: DataFrame, idCol: String, vecCol: String, k: Int = 5,
      roundTo: Int = 4, blocks: Int = 8): DataFrame =
    blockTopKFor(emb, emb, idCol, vecCol, k, roundTo, blocks)

  /** Exact top-k for an explicit QUERY batch against a corpus — the
    * production "search" shape: cost is |Q|·|corpus| dot products (LINEAR
    * in the corpus), unlike the all-pairs |corpus|² of self-join
    * [[blockTopK]] (which is exactly this with queries = corpus). Same
    * tiling, kernel, rounding and sim-desc/id-asc tie-break, so the two
    * are bit-identical on shared queries. Self matches (query id present
    * in the corpus) are excluded, like every ANN path here. Also the
    * recall REFEREE for the production-config ANN gates: p4b hash-checks
    * this against the DuckDB cross-join oracle; p10b/p15b score their
    * sampled recall against it ([[recallAtK]]). */
  def blockTopKFor(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int = 5, roundTo: Int = 4, blocks: Int = 8)
      : DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    def ds(df: DataFrame) = df.select(col(idCol).cast(LongType).as("id"),
      col(vecCol).cast(ArrayType(DoubleType)).as("vec"))
      .as[(Long, Array[Double])]
    val kk = k; val rt = roundTo
    val partials = tiled(ds(queries), blocks, asQuery = true)
      .groupByKey(_._1)
      .cogroup(tiled(ds(corpus), blocks, asQuery = false).groupByKey(_._1)) {
        (_, qIt, cIt) =>
          val (ids, mat, sqrtNorms, dim) = packBlock(
            cIt.map(t => (t._2, t._3)).toArray)
          if (ids.isEmpty) Iterator.empty
          else qIt.flatMap { case (_, qid, qv) =>
            topKScan(qid, qv, ids, mat, sqrtNorms, dim, kk, rt) }
      }
    partials.toDF("qid", "nid", "sim")
      .groupBy(col("qid"))
      .agg(graft.functions.TopKAggregator.top_k(k)(col("sim"), col("nid")).as("top"))
      .select(col("qid"), posexplode(col("top")))
      .select(col("qid"), col("col._2").as("nid"), col("col._1").as("sim"),
        (col("pos") + 1).cast(IntegerType).as("rank"))
  }

  /** Per-query recall@k of an ANN result against an exact top-k result
    * (both in the (qid, nid, sim, rank) shape these kernels emit).
    * recall = |ann ∩ exact| / |exact| per qid, over the qids present in
    * `exact` — an ANN path that drops a query entirely scores 0 for it,
    * not "missing". Ties: both sides break sim ties by ascending id, so
    * the comparison is deterministic. */
  def recallAtK(ann: DataFrame, exact: DataFrame): DataFrame = {
    val e = exact.select(col("qid"), col("nid"))
    val a = ann.select(col("qid"), col("nid"), lit(1).as("hit"))
    e.join(a, Seq("qid", "nid"), "left_outer")
      .groupBy(col("qid"))
      .agg((sum(coalesce(col("hit"), lit(0))).cast(DoubleType) /
        count(lit(1))).as("recall"))
  }

  /** Exact distributed near-duplicate pairs (cosine ≥ threshold) — the
    * 100 TB-safe twin of the broadcast kernel. Same tiling as [[blockTopK]];
    * each unordered pair (a < b) scores in exactly one tile, so no dedup
    * pass is needed. */
  def blockNearDupPairs(emb: DataFrame, idCol: String, vecCol: String,
      threshold: Double, roundTo: Int = 4, blocks: Int = 8): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val v = emb.select(col(idCol).cast(LongType).as("id"),
      col(vecCol).cast(ArrayType(DoubleType)).as("vec"))
      .as[(Long, Array[Double])]
    val th = threshold; val rt = roundTo
    val pairs = tiled(v, blocks, asQuery = true).groupByKey(_._1)
      .cogroup(tiled(v, blocks, asQuery = false).groupByKey(_._1)) {
        (_, qIt, cIt) =>
          val (ids, mat, sqrtNorms, dim) = packBlock(
            cIt.map(t => (t._2, t._3)).toArray)
          val n = ids.length
          if (n == 0) Iterator.empty
          else qIt.flatMap { case (_, qid, qv) =>
            var qnorm = 0.0; var j = 0
            while (j < dim) { val x = qv(j); qnorm += x * x; j += 1 }
            val qsqrt = math.sqrt(qnorm)
            val g = roundGuard(rt)
            val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
            var i = 0
            while (i < n) {
              if (ids(i) > qid) {
                var dot = 0.0; var j2 = 0
                val off = i * dim
                while (j2 < dim) { dot += qv(j2) * mat(off + j2); j2 += 1 }
                val denom = qsqrt * sqrtNorms(i)
                val raw = if (denom == 0.0) 0.0 else dot / denom
                // guard band: a raw sim more than one decimal step below
                // the threshold cannot round up to it (see roundGuard) —
                // skip the BigDecimal for the (overwhelming) non-pair bulk
                if (!(raw < th - g)) {
                  val sim = roundHalfUp(raw, rt)
                  if (sim >= th) out += ((qid, ids(i), sim))
                }
              }
              i += 1
            }
            out
          }
      }
    pairs.toDF("id_a", "id_b", "sim")
  }

  /** deterministic pseudo-random hyperplanes (seeded, plan-time literals). */
  private def hyperplanes(dim: Int, bits: Int, table: Int, seed: Long): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed + table * 7919)
    Seq.fill(bits)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  /** LSH bucket id for one table: sign bits of dot products with `bits`
    * hyperplanes, packed via Horner. Pure column arithmetic. */
  def lshBucket(vec: Column, dim: Int, bits: Int, table: Int,
      seed: Long = 42L): Column = {
    val planes = hyperplanes(dim, bits, table, seed)
    planes.foldLeft(lit(0L)) { (acc, plane) =>
      val dot = graft.functions.VectorFunctions.dot_product(
        vec, array(plane.map(lit): _*))
      acc * 2 + when(dot >= 0, 1L).otherwise(0L)
    }
  }

  /** ANN via multi-table random-hyperplane LSH: candidates share a bucket
    * in at least one of `tables` tables; exact cosine re-ranks candidates.
    * Recall grows with tables; cost per table is one narrow shuffle of
    * (bucket, id, vec). */
  def lshTopK(emb: DataFrame, idCol: String, vecCol: String, dim: Int,
      k: Int = 5, bits: Int = 8, tables: Int = 4, seed: Long = 42L,
      roundTo: Int = 4, probes: Int = 0): DataFrame = {
    val v = emb.select(col(idCol).cast(LongType).as("id"),
      col(vecCol).cast(ArrayType(DoubleType)).as("vec"))
    // all table buckets in one compiled pass, then explode narrow
    // (id, table, bucket) rows — vectors do NOT travel to the bucket join
    val banded = v.select(col("id"),
      posexplode(graft.functions.VectorFunctions.lsh_buckets(
        col("vec"), dim, bits, tables, seed)))
      .toDF("id", "table_idx", "bucket")

    // multi-probe (Lv et al. 2007): the query side ALSO visits every
    // bucket one bit-flip away (first `probes` hyperplanes), so the same
    // recall needs fewer/finer tables — candidate volume scales with
    // Σ|bucket|² per table, which higher `bits` shrinks quadratically
    // while probing wins back the boundary misses. Probe rows stay
    // narrow (id, table, bucket); the index side is untouched.
    val query =
      if (probes <= 0) banded
      else banded.select(col("id"), col("table_idx"),
        explode(array((col("bucket") +: (0 until math.min(probes, bits))
          .map(j => col("bucket").bitwiseXOR(lit(1 << j)))): _*))
          .as("bucket"))

    // no distinct here: a pair surfacing from several tables reaches the
    // top-k aggregator more than once, which ignores duplicates — saves a
    // full shuffle of the candidate stream
    val a = query.as("a"); val b = banded.as("b")
    val candidates = a.join(b,
        col("a.table_idx") === col("b.table_idx") &&
        col("a.bucket") === col("b.bucket") &&
        col("a.id") =!= col("b.id"))
      .select(col("a.id").as("qid"), col("b.id").as("nid"))

    // re-attach vectors only after candidate dedup (broadcast the narrow
    // id→vec side when small; AQE decides otherwise)
    val scored = candidates
      .join(v.toDF("qid", "qvec"), "qid")
      .join(v.toDF("nid", "nvec"), "nid")
      .select(col("qid"), col("nid"),
        round(cosine(col("qvec"), col("nvec")), roundTo).as("sim"))
    scored.groupBy(col("qid"))
      .agg(graft.functions.TopKAggregator.top_k(k)(col("sim"), col("nid")).as("top"))
      .select(col("qid"), posexplode(col("top")))
      .select(col("qid"), col("col._2").as("nid"), col("col._1").as("sim"),
        (col("pos") + 1).cast(IntegerType).as("rank"))
  }

  // ----------------------------------------------------------------- IVF
  /** Spherical k-means centroids trained with Lloyd's iterations on a
    * bounded sample (classic IVF training: the sample, not the corpus,
    * visits the driver — `trainSample` rows, schema-scale). Vectors are
    * L2-normalized so cosine assignment = dot-product argmax; centroids
    * are renormalized means. Deterministic for a fixed seed. */
  private[pipeline] def trainCentroids(sample: Array[Array[Double]],
      nClusters: Int, iters: Int, seed: Long): Array[Array[Double]] = {
    require(sample.nonEmpty, "IVF training sample is empty")
    val dim = sample(0).length
    def normalized(v: Array[Double]): Array[Double] = {
      var n = 0.0; var j = 0
      while (j < dim) { n += v(j) * v(j); j += 1 }
      val s = math.sqrt(n)
      if (s == 0.0) v.clone() else v.map(_ / s)
    }
    val data = sample.map(normalized)
    val k = math.min(nClusters, data.length)
    val rnd = new scala.util.Random(seed)
    var centroids = rnd.shuffle(data.indices.toVector).take(k)
      .map(i => data(i).clone()).toArray

    var it = 0
    while (it < iters) {
      val sums = Array.ofDim[Double](k, dim)
      val counts = new Array[Long](k)
      data.foreach { v =>
        var best = 0; var bestDot = Double.NegativeInfinity
        var c = 0
        while (c < k) {
          var dot = 0.0; var j = 0
          while (j < dim) { dot += v(j) * centroids(c)(j); j += 1 }
          if (dot > bestDot) { bestDot = dot; best = c }
          c += 1
        }
        var j = 0
        while (j < dim) { sums(best)(j) += v(j); j += 1 }
        counts(best) += 1
      }
      centroids = Array.tabulate(k) { c =>
        if (counts(c) == 0L) centroids(c) // empty cluster: keep previous
        else normalized(sums(c))
      }
      it += 1
    }
    centroids
  }

  /** nearest `take` centroid indices by dot product (vectors need not be
    * normalized — argmax over cosine equals argmax over dot/|v| and |v|
    * is constant per row). */
  private[pipeline] def nearestCentroids(v: Array[Double],
      centroids: Array[Array[Double]], take: Int): Array[Int] = {
    val dim = v.length
    val scored = centroids.indices.map { c =>
      var dot = 0.0; var j = 0
      while (j < dim) { dot += v(j) * centroids(c)(j); j += 1 }
      (c, dot)
    }
    scored.sortBy(-_._2).take(take).map(_._1).toArray
  }

  /** ANN via an IVF (inverted-file) index — the k-means twin of
    * [[lshTopK]]: a coarse quantizer assigns every vector to its nearest
    * of `nClusters` sample-trained centroids; each query probes its
    * `nProbe` nearest cells and exact cosine re-ranks the candidates in a
    * per-cell dense kernel. Shuffle volume: (1 + nProbe) narrow
    * (cell, id, vec) rows — vectors meet only within probed cells,
    * never all-pairs. Data-adapted cells beat LSH's random hyperplanes on
    * clustered corpora (higher recall at equal probe cost); size
    * `nClusters` ≈ √n so cells stay executor-resident. `nProbe =
    * nClusters` degenerates to the exact answer of [[blockTopK]]. */
  def ivfTopK(emb: DataFrame, idCol: String, vecCol: String, k: Int = 5,
      nClusters: Int = 64, nProbe: Int = 4, roundTo: Int = 4,
      trainSample: Int = 10000, iters: Int = 8, seed: Long = 42L)
      : DataFrame = {
    require(nProbe >= 1 && nProbe <= nClusters, "need 1 <= nProbe <= nClusters")
    val spark = emb.sparkSession
    import spark.implicits._
    val v = emb.select(col(idCol).cast(LongType).as("id"),
      col(vecCol).cast(ArrayType(DoubleType)).as("vec"))
      .as[(Long, Array[Double])]

    // bounded training sample on the driver (limit caps the transfer)
    val trainRows = v.limit(trainSample).collect().map(_._2)
    if (trainRows.isEmpty) // empty corpus → empty result, like blockTopK
      return spark.emptyDataFrame
        .select(lit(0L).as("qid"), lit(0L).as("nid"),
          lit(0.0).as("sim"), lit(0).as("rank")).limit(0)
    val centroids = trainCentroids(trainRows, nClusters, iters, seed)
    val bc = spark.sparkContext.broadcast(centroids)

    // one pass emits membership (rank 0 = nearest cell) and probe replicas
    // together; one hash repartition on the cell plus a within-partition
    // sort puts each cell's members FIRST (secondary-sort pattern), so the
    // kernel buffers only the cell block and STREAMS the probe side — one
    // source read and one shuffle where a probes⋈members cogroup costs two
    // of each
    val kk = k; val rt = roundTo
    val tagged = v.flatMap { case (id, vec) =>
      val cs = nearestCentroids(vec, bc.value, nProbe)
      // member row in the nearest cell, probe rows in every probed cell
      // (including its own — self-pairs are excluded in the kernel)
      Iterator((cs(0), false, id, vec)) ++
        cs.iterator.map(c => (c, true, id, vec)) }
    val partials = tagged.toDF("cell", "probe", "id", "vec")
      .repartition(col("cell"))
      .sortWithinPartitions(col("cell"), col("probe"))
      .as[(Int, Boolean, Long, Array[Double])]
      .mapPartitions { it =>
        var cell = Int.MinValue
        var block: (Array[Long], Array[Double], Array[Double], Int) = null
        val members = scala.collection.mutable.ArrayBuffer
          .empty[(Long, Array[Double])]
        it.flatMap { case (c, isProbe, id, vec) =>
          if (c != cell) { cell = c; block = null; members.clear() }
          if (!isProbe) { members += ((id, vec)); Iterator.empty }
          else {
            if (block == null) block = packBlock(members.toArray)
            val (ids, mat, sqrtNorms, dim) = block
            if (ids.isEmpty) Iterator.empty
            else topKScan(id, vec, ids, mat, sqrtNorms, dim, kk, rt).iterator
          }
        }
      }
    partials.toDF("qid", "nid", "sim")
      .groupBy(col("qid"))
      .agg(graft.functions.TopKAggregator.top_k(k)(col("sim"), col("nid")).as("top"))
      .select(col("qid"), posexplode(col("top")))
      .select(col("qid"), col("col._2").as("nid"), col("col._1").as("sim"),
        (col("pos") + 1).cast(IntegerType).as("rank"))
  }
}
