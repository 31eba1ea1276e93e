package graft.queries

import graft.conf.GraftConf
import graft.kernel._
import graft.optimize.HashBooster
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Kernel-surface driver queries for the reference operators whose
  * semantics ANSI SQL cannot express (iterative linear algebra, FWHT,
  * Gram–Schmidt, the boosting loop). Each runs the real kernel inside a
  * typed map over `embeddings`/`documents` — rows-only at the driver gate,
  * with the strong oracle in `sbt test` (KernelSpec/HashBoosterSpec):
  *
  *  - q_pca_embed — T4 PCATransformer (`PCATransformer.h:30-53`): fit on a
  *    ≤30k driver-collected sample (`HashCollection.h:41-43`), Jacobi eigen,
  *    apply Wᵀ(x−μ) per row.
  *  - q_dhhash_codes — T5 DHHashTransformer + H3 subsampling
  *    (`DHHashTransformer.h:26-55`, the `UnitTests.cpp:475-528`
  *    Subsample×DHHash combo): FWHT binarization then a 16-bit coordinate
  *    subsample code.
  *  - q_rotation_codes — H2 RandomRotationHashFunction
  *    (`RandomRotationHashFunction.h:38-59`): orthonormalized seeded
  *    projection, 16-bit sign code.
  *  - q_hashboost_tables — O4 HashBooster (`Boost.h:50-196`) + O3 fitness
  *    (`HashError.h:85-114`): brute-force Jaccard ground truth on a sample
  *    (the reference's own ground-truth-then-boost structure,
  *    `TestLSH.h:150-180`), then greedy boosted band-seed selection with
  *    cluster-parallel candidate scoring.
  *
  * All "random" draws derive from the config seed (O1 semantics) — outputs
  * are bit-stable across runs and cluster sizes.
  */
object KernelQueries {

  val Dim = EmbedQueries.Dim
  val PcaDims = 8
  val CodeBits = EmbedQueries.CodeBits
  val FitSample = 30000 // reference fit-sample cap, HashCollection.h:41-43

  private val seed = GraftConf().seed

  private def embeds(spark: SparkSession, dir: String) = {
    import spark.implicits._
    CrossSql.view(spark, dir, "embeddings")
      .select($"vec_id", $"embedding")
      .as[(Long, Array[Float])]
  }

  /** Driver-collected fit sample, vec_id order (deterministic). */
  private def fitSample(spark: SparkSession, dir: String): Array[Array[Float]] = {
    import spark.implicits._
    CrossSql.view(spark, dir, "embeddings")
      .orderBy($"vec_id").limit(FitSample)
      .select($"embedding").as[Array[Float]].collect()
  }

  private def pcaEmbed(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val pca = PcaTransformer.fit(fitSample(spark, dir), PcaDims)
    val bc = spark.sparkContext.broadcast(pca)
    embeds(spark, dir)
      .flatMap { case (id, v) =>
        bc.value(v).iterator.zipWithIndex.map { case (x, c) =>
          (id, c.toLong, math.floor(x * 1e6).toLong)
        }
      }
      .toDF("vec_id", "pc_idx", "pc_x1e6")
      .orderBy($"vec_id", $"pc_idx")
  }

  private def dhhashCodes(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val sample = fitSample(spark, dir)
    val mu = new Array[Double](Dim)
    sample.foreach { r => var i = 0; while (i < Dim) { mu(i) += r(i); i += 1 } }
    var i = 0
    while (i < Dim) { mu(i) /= sample.length; i += 1 }
    val dh = DHHashTransformer.fit(mu, seed ^ 0xd4a5L)
    val sub = new SubSamplingHash(CodeBits, Dim, seed ^ 0x5ab5L)
    val bc = spark.sparkContext.broadcast((dh, sub))
    embeds(spark, dir)
      .map { case (id, v) =>
        val bin = bc.value._1(v)
        val bits = new Array[Boolean](60)
        var j = 0
        while (j < 60 && j < bin.length) { bits(j) = bin(j) > 0.5f; j += 1 }
        (id, BitPack.pack(bits), bc.value._2.hash(bin))
      }
      .toDF("vec_id", "dh_code", "sub_code")
      .orderBy($"vec_id")
  }

  private def rotationCodes(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val rot = RandomRotationHash(CodeBits, Dim, seed ^ 0x2072L)
    val bc = spark.sparkContext.broadcast(rot)
    embeds(spark, dir)
      .map { case (id, v) => (id, bc.value.hash(v)) }
      .toDF("vec_id", "rot_code")
      .orderBy($"vec_id")
  }

  /** The H2 rotation matrix as rows — dumped by [[graft.Verify]] as the
    * `_rotation_matrix` oracle input (same construction as
    * [[rotationCodes]]: deterministic in the seed, input-independent). */
  def rotationMatrixDump(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val m = RandomRotationHash(CodeBits, Dim, seed ^ 0x2072L).matrix
    (for (b <- 0 until CodeBits; j <- 0 until Dim)
      yield (b.toLong, j.toLong, m(b * Dim + j).toDouble))
      .toDF("bit", "dim_idx", "w")
  }

  /** The fitted T4 PCA basis (principal-component rows) — dumped by
    * [[graft.Verify]] as the `_pca_basis` oracle input. */
  def pcaBasisDump(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = PcaTransformer.fit(fitSample(spark, dir), PcaDims).basis
    (for (c <- 0 until PcaDims; j <- 0 until Dim)
      yield (c.toLong, j.toLong, w(c)(j)))
      .toDF("pc_idx", "dim_idx", "w")
  }

  /** H2 orthonormality as a cross-engine ★ check: this side emits the exact
    * identity Gram; the DuckDB oracle independently computes
    * `floor(|row_i · row_j|·1e6 + 0.5)` from the dumped `_rotation_matrix`.
    * A hash match therefore PROVES the published matrix is orthonormal to
    * 1e-6 (float storage bounds the true Gram error at ~1e-7, so the
    * rounding never flips; `UnitTests.cpp:420-473` exercises the same
    * property in-process). */
  private def rotationOrtho(spark: SparkSession): DataFrame = {
    import spark.implicits._
    (for (i <- 0 until CodeBits; j <- i until CodeBits)
      yield (i.toLong, j.toLong, if (i == j) 1000000L else 0L))
      .toDF("i", "j", "gram_x1e6")
      .orderBy($"i", $"j")
  }

  /** T4 eigenbasis orthonormality, same template over `_pca_basis` (Jacobi
    * rotations preserve orthonormality to machine precision — all-double
    * path, tighter than H2's float storage). */
  private def pcaOrtho(spark: SparkSession): DataFrame = {
    import spark.implicits._
    (for (i <- 0 until PcaDims; j <- i until PcaDims)
      yield (i.toLong, j.toLong, if (i == j) 1000000L else 0L))
      .toDF("i", "j", "gram_x1e6")
      .orderBy($"i", $"j")
  }

  /** T4 eigenvalue ordering as a cross-engine ★ check: components must come
    * out in DESCENDING projected-variance order (fit takes the top
    * `PcaDims` eigenvalues — `PCATransformer.h:30-53`'s sort). This side
    * emits rank = pc_idx; the oracle ranks `var_pop` per component computed
    * from the dumped `q_pca_embed` output itself. */
  private def pcaVarianceOrder(spark: SparkSession): DataFrame = {
    import spark.implicits._
    (0 until PcaDims).map(i => (i.toLong, i.toLong))
      .toDF("pc_idx", "variance_rank")
      .orderBy($"pc_idx")
  }

  /** O4: golden = brute-force pairwise Jaccard ≥ 0.3 over the first
    * `BoostSample` docs' shingle sets (driver-side ground truth); pool =
    * seed-derived candidate band seeds; greedy boosted selection of
    * `BoostTables`. */
  val BoostSample = 500
  val BoostPool = 5
  val BoostTables = 3

  private def hashboostTables(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // Deliberately weak banding (1 band × 16 rows — per-pair collision
    // probability J^16 ≈ 0.5 at the fixture's J≈0.96 dup pairs): single
    // tables then cover only a fraction of the golden pairs, so the boost
    // loop's reweight-and-pick-again structure is actually exercised (with
    // the pipeline's 16×4 banding one table covers everything and the loop
    // short-circuits at t=1, Boost.h:166).
    val conf = GraftConf(textBands = 1, textRows = 16)
    val docs = CrossSql.view(spark, dir, "documents")
      .select($"doc_id".cast("string").as("clip_id"), $"text")
      .orderBy($"clip_id").limit(BoostSample)
    val shingleSets = docs.as[(String, String)]
      .map { case (id, text) =>
        (id, Shingles.tokenShingles(Shingles.tokens(Option(text).getOrElse("")), conf.textShingleK, conf.seed))
      }
      .toDF("clip_id", "sh")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sets = shingleSets.as[(String, Array[Long])].collect().sortBy(_._1)
    val golden = (for {
      i <- sets.indices.iterator
      j <- (i + 1) until sets.length
      if Shingles.jaccardSorted(sets(i)._2, sets(j)._2) >= 0.3
    } yield (sets(i)._1, sets(j)._1)).toSeq
    val goldenDf = spark.createDataFrame(golden).toDF("a", "b")
    val pool = (0 until BoostPool).map(i => Hashing.derive(conf.seed, 0xb005L + i))
    val res = HashBooster.select(spark, shingleSets, goldenDf, pool, BoostTables, conf)
    shingleSets.unpersist(false)
    res.tables.zipWithIndex
      .map { case (c, r) =>
        (r.toLong, c.seed, math.floor(c.fitness * 1e6).toLong, math.floor(c.newTpWeight * 1e6).toLong)
      }
      .toDF("table_rank", "band_seed", "fitness_x1e6", "tp_weight_x1e6")
      .orderBy($"table_rank")
  }

  /** O5 RDHF driver surface: brute-force cosine top-k ground truth over a
    * driver-collected sample (the reference's ground-truth path), then the
    * pool→select loop; one row per chosen pool bit. */
  val RdhfSample = 300
  val RdhfQueries = 40
  val RdhfK = 3

  private def rdhfTables(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val data = fitSample(spark, dir).take(RdhfSample)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      dot / math.sqrt(na * nb)
    }
    val neighbours = Array.tabulate(RdhfQueries) { i =>
      data.indices.filter(_ != i)
        .sortBy(j => (-cos(data(i), data(j)), j)).take(RdhfK).toArray
    }
    val res = graft.optimize.Rdhf.optimize(data, neighbours,
      graft.optimize.Rdhf.Config(bitPoolSize = 48, numFuncs = 3, numBits = 8, seed = seed))
    res.tables.zipWithIndex.flatMap { case (t, r) =>
      t.poolRows.zipWithIndex.map { case (row, b) => (r.toLong, b.toLong, row.toLong) }
    }.toDF("table_rank", "bit_rank", "pool_row")
      .orderBy($"table_rank", $"bit_rank")
  }

  /** O6 ARDHF driver surface — same sample/ground-truth as q_rdhf_tables,
    * approximate (positive-only S + aggregated negative) selection. */
  private def ardhfTables(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val data = fitSample(spark, dir).take(RdhfSample)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      dot / math.sqrt(na * nb)
    }
    val neighbours = Array.tabulate(RdhfQueries) { i =>
      data.indices.filter(_ != i)
        .sortBy(j => (-cos(data(i), data(j)), j)).take(RdhfK).toArray
    }
    val res = graft.optimize.Ardhf.optimize(data, neighbours,
      graft.optimize.Ardhf.Config(bitPoolSize = 48, numFuncs = 3, numBits = 8, seed = seed))
    res.tables.zipWithIndex.flatMap { case (t, r) =>
      t.poolRows.zipWithIndex.map { case (row, b) => (r.toLong, b.toLong, row.toLong) }
    }.toDF("table_rank", "bit_rank", "pool_row")
      .orderBy($"table_rank", $"bit_rank")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pca_embed" -> ((s, d) => pcaEmbed(s, d)),
    "q_dhhash_codes" -> ((s, d) => dhhashCodes(s, d)),
    "q_rotation_codes" -> ((s, d) => rotationCodes(s, d)),
    "q_rotation_ortho" -> ((s, _) => rotationOrtho(s)),
    "q_pca_ortho" -> ((s, _) => pcaOrtho(s)),
    "q_pca_variance_order" -> ((s, _) => pcaVarianceOrder(s)),
    "q_hashboost_tables" -> ((s, d) => hashboostTables(s, d)),
    "q_rdhf_tables" -> ((s, d) => rdhfTables(s, d)),
    "q_ardhf_tables" -> ((s, d) => ardhfTables(s, d))
  )

  /** The iterative kernels themselves (Jacobi eigen / Gram–Schmidt / FWHT /
    * boosting loop) are not ANSI-SQL-expressible — their code/embedding
    * queries stay rows-only with kernel oracles in sbt test. Their defining
    * PROPERTIES are, via the `_`-dump pattern (_cc_edges precedent): DuckDB
    * independently recomputes the Gram of the dumped matrices and the
    * projected-variance ranking of the dumped embedding, and the driver
    * hash-matches it against the exact expected values emitted Spark-side. */
  val oracleSql: Map[String, String] = Map(
    "q_rotation_ortho" ->
      s"""SELECT a.bit AS i, b.bit AS j,
         |  CAST(floor(abs(sum(a.w * b.w)) * 1e6 + 0.5) AS BIGINT) AS gram_x1e6
         |FROM read_parquet('{GRAFT_OUT}/_rotation_matrix/*.parquet') a
         |JOIN read_parquet('{GRAFT_OUT}/_rotation_matrix/*.parquet') b
         |  ON a.dim_idx = b.dim_idx AND a.bit <= b.bit
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_pca_ortho" ->
      s"""SELECT a.pc_idx AS i, b.pc_idx AS j,
         |  CAST(floor(abs(sum(a.w * b.w)) * 1e6 + 0.5) AS BIGINT) AS gram_x1e6
         |FROM read_parquet('{GRAFT_OUT}/_pca_basis/*.parquet') a
         |JOIN read_parquet('{GRAFT_OUT}/_pca_basis/*.parquet') b
         |  ON a.dim_idx = b.dim_idx AND a.pc_idx <= b.pc_idx
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_pca_variance_order" ->
      s"""WITH v AS (
         |  SELECT pc_idx, var_pop(pc_x1e6) AS s
         |  FROM read_parquet('{GRAFT_OUT}/q_pca_embed/*.parquet') GROUP BY 1)
         |SELECT pc_idx,
         |  CAST(row_number() OVER (ORDER BY s DESC) - 1 AS BIGINT) AS variance_rank
         |FROM v ORDER BY pc_idx""".stripMargin
  )
}
