package graft.queries

import graft.SparkTestBase
import graft.kernel.Hashing
import org.scalatest.funsuite.AnyFunSuite

/** Kernel oracles for the transform/hash driver-query surface: every
  * SQL-expressed operator query is recomputed in plain Scala (md5Low60 is
  * the shared family) and compared value-for-value — so the Spark SQL text
  * is checked against an in-process implementation here, and against DuckDB
  * by the driver gate. */
class SurfaceQueriesSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  val sfDir = "/root/testdata/sf0.001"
  val Dim = EmbedQueries.Dim

  /** (vec_id → embedding), driver-collected once. */
  lazy val vecs: Map[Long, Array[Float]] = {
    import spark.implicits._
    CrossSql.view(spark, sfDir, "embeddings")
      .select($"vec_id", $"embedding").as[(Long, Array[Float])]
      .collect().toMap
  }

  private def scaled(x: Float): Long = math.floor(x.toDouble * 1e6).toLong

  /** Per-dim (sum, count) of the scaled grid — the T2/T3 fit. */
  lazy val fit: (Array[Long], Long) = {
    val s = new Array[Long](Dim)
    vecs.values.foreach { v =>
      var i = 0
      while (i < Dim) { s(i) += scaled(v(i)); i += 1 }
    }
    (s, vecs.size.toLong)
  }

  private def collect2(name: String): Map[Long, Long] =
    SparkEntryQuery(name).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def SparkEntryQuery(name: String) =
    graft.SparkEntry.queries(name)(spark, sfDir)

  test("q_null_transform matches the positional-checksum recomputation (T1 identity)") {
    val got = collect2("q_null_transform")
    assert(got.size == vecs.size)
    vecs.foreach { case (id, v) =>
      var acc = 0L
      var i = 0
      while (i < Dim) { acc += (i + 1) * scaled(v(i)); i += 1 }
      assert(got(id) == acc, s"vec $id")
    }
  }

  test("q_mean_transform matches the exact-rational centered L1 (T2)") {
    val (s, c) = fit
    val got = collect2("q_mean_transform")
    vecs.foreach { case (id, v) =>
      var acc = 0L
      var i = 0
      while (i < Dim) { acc += math.abs(scaled(v(i)) * c - s(i)); i += 1 }
      assert(got(id) == acc, s"vec $id")
    }
  }

  test("q_threshold_codes matches binarize-vs-mean bit packing (T3 + H6)") {
    val (s, c) = fit
    val got = collect2("q_threshold_codes")
    vecs.foreach { case (id, v) =>
      var code = 0L
      var i = 0
      while (i < TransformQueries.ThresholdBits) {
        if (scaled(v(i)) * c > s(i)) code |= (1L << i)
        i += 1
      }
      assert(got(id) == code, s"vec $id")
    }
  }

  /** ±1 from md5 parity of "<tag><b>_<j>" — mirrors CrossSql.sparkSgnCte. */
  private def sgn(tag: String, b: Int, j: Int): Double =
    if ((Hashing.md5Low60(s"$tag${b}_$j") & 1L) == 1L) 1.0 else -1.0

  test("q_sikh_codes matches sin-of-projection recomputation (H4)") {
    val got = collect2("q_sikh_codes")
    vecs.foreach { case (id, v) =>
      var code = 0L
      var b = 0
      while (b < EmbedQueries.CodeBits) {
        var acc = 0.0
        var j = 1
        while (j <= Dim) { acc = acc + sgn("sikh", b, j) * v(j - 1).toDouble; j += 1 }
        if (math.sin(0.8 * acc) > 0) code |= (1L << b)
        b += 1
      }
      assert(got(id) == code, s"vec $id")
    }
  }

  test("q_sparse_sign_codes matches the sparse ±1 subset-sum recomputation (H5)") {
    val got = collect2("q_sparse_sign_codes")
    vecs.foreach { case (id, v) =>
      var code = 0L
      var b = 0
      while (b < EmbedQueries.CodeBits) {
        var acc = 0.0
        var j = 1
        while (j <= Dim) {
          val h = Hashing.md5Low60(s"ss${b}_$j")
          val m =
            if (h % 32 != 0) 0.0
            else if (((h >> 5) & 1L) == 1L) 1.0 else -1.0
          acc = acc + m * v(j - 1).toDouble
          j += 1
        }
        if (acc > 0) code |= (1L << b)
        b += 1
      }
      assert(got(id) == code, s"vec $id")
    }
  }

  test("q_pca_embed: full rows, deterministic, variance non-increasing across components") {
    val rows = SparkEntryQuery("q_pca_embed").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.length == vecs.size * KernelQueries.PcaDims)
    val byPc = rows.groupBy(_._2).view.mapValues { rs =>
      val xs = rs.map(_._3.toDouble / 1e6)
      val mu = xs.sum / xs.length
      xs.map(x => (x - mu) * (x - mu)).sum / xs.length
    }.toMap
    val vars = (0 until KernelQueries.PcaDims).map(i => byPc(i.toLong))
    assert(vars.zip(vars.tail).forall { case (a, b) => a >= b - 1e-9 },
      s"PCA component variances not sorted: $vars")
    val again = SparkEntryQuery("q_pca_embed").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.sorted.sameElements(again.sorted))
  }

  test("q_dhhash_codes / q_rotation_codes: full rows, nontrivial, deterministic") {
    for (name <- Seq("q_dhhash_codes", "q_rotation_codes")) {
      val a = SparkEntryQuery(name).collect().map(_.toSeq)
      assert(a.length == vecs.size, name)
      val codes = a.map(_(1)).distinct
      assert(codes.length > vecs.size / 10, s"$name codes look degenerate")
      val b = SparkEntryQuery(name).collect().map(_.toSeq)
      assert(a.map(_.toString).sorted.sameElements(b.map(_.toString).sorted), name)
    }
  }

  test("q_hashboost_tables: boost loop picks tables with valid fitness, deterministic") {
    val a = SparkEntryQuery("q_hashboost_tables").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(a.nonEmpty && a.length <= KernelQueries.BoostTables)
    assert(a.forall { case (_, _, fit, _) => fit > 0 && fit <= 1000000 })
    assert(a.map(_._1).toSeq == (0L until a.length).toSeq)
    val b = SparkEntryQuery("q_hashboost_tables").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(a.toSeq == b.toSeq)
  }
}
