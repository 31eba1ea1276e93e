package graft.queries

import graft.{SparkEntry, SparkTestBase}
import graft.kernel.Probes
import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract surface checks. The strong cross-engine check (DuckDB
  * hash-compare of every oracleSql entry) runs outside sbt via
  * tools/compare_oracle.py; these tests pin the contract invariants and a
  * few semantic properties that don't need DuckDB.
  */
class QueriesSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  val sf = "/root/testdata/sf0.001"

  test("oracleSql keys are a subset of queries keys") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracleSql without queries entry: $missing")
  }

  test("flagship entry returns verified near-dup pairs (rows > 0, a < b, jaccard ≥ threshold)") {
    val rows = SparkEntry.entry(spark).collect()
    assert(rows.length > 0)
    rows.foreach { r =>
      assert(r.getAs[Long]("a") < r.getAs[Long]("b"))
      assert(r.getAs[Long]("jaccard_x1000") >= 300L)
      assert(r.getAs[Long]("inter_sz") <= r.getAs[Long]("union_sz"))
    }
  }

  test("q_lsh_pairs is a superset of q_near_dup_pairs (verification only filters)") {
    val cand = SparkEntry.queries("q_lsh_pairs")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val verified = SparkEntry.queries("q_near_dup_pairs")(spark, sf)
      .collect().map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"))).toSet
    assert(verified.subsetOf(cand))
  }

  test("q_minhash_sig: one signature slot per (doc, perm); minhash within 60-bit range") {
    val rows = SparkEntry.queries("q_minhash_sig")(spark, sf).collect()
    val docs = rows.map(_.getLong(0)).distinct.length
    assert(rows.length === docs * CrossSql.NumPerm)
    rows.foreach { r =>
      val mh = r.getAs[Long]("minhash")
      assert(mh >= 0L && mh < (1L << 60))
    }
  }

  test("q_probe_masks equals the kernel ball-mask enumeration with C(bits,d) counts") {
    val rows = SparkEntry.queries("q_probe_masks")(spark, sf)
      .collect().map(r => (r.getAs[Long]("ord"), r.getAs[Long]("mask")))
    val expected = Probes.ballMasks(ClipQueries.ProbeBits, ClipQueries.ProbeMaxDist)
    assert(rows.length.toLong ===
      (0 to ClipQueries.ProbeMaxDist).map(d => Probes.choose(ClipQueries.ProbeBits, d)).sum)
    rows.foreach { case (ord, mask) => assert(expected(ord.toInt) === mask) }
  }

  test("q_knn_cosine: exactly top-10 ranks per query point, no self-neighbors") {
    val rows = SparkEntry.queries("q_knn_cosine")(spark, sf).collect()
    val byQuery = rows.groupBy(_.getAs[Long]("query_id"))
    byQuery.foreach { case (q, rs) =>
      assert(rs.map(_.getAs[Long]("rank")).sorted.toSeq === (1L to 10L))
      assert(!rs.exists(_.getAs[Long]("neighbor_id") == q))
    }
  }

  test("q_exact_dedup: group counts sum to table size") {
    val rows = SparkEntry.queries("q_exact_dedup")(spark, sf).collect()
    val total = rows.map(_.getAs[Long]("n_docs")).sum
    val docs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(total === docs)
  }

  test("q_dedup_clusters covers every synthesized clip exactly once") {
    val rows = SparkEntry.queries("q_dedup_clusters")(spark, sf).collect()
    assert(rows.length > 0)
    assert(rows.map(_.getString(0)).distinct.length === rows.length)
  }

  test("q_audio_shingle_counts agrees with q_audio_stats per decodable clip") {
    val stats = SparkEntry.queries("q_audio_stats")(spark, sf).collect()
      .filter(r => r.getAs[Boolean]("decode_ok") && r.getAs[Long]("n_frames") > 0)
      .map(r => r.getString(0) -> (r.getAs[Long]("n_frames"), r.getAs[Long]("n_shingles")))
      .toMap
    val counts = SparkEntry.queries("q_audio_shingle_counts")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("n_frames"), r.getAs[Long]("n_shingles")))
      .toMap
    assert(counts === stats)
  }

  test("q_pca_variance_order's emitted ranks match the projected variances") {
    // the DuckDB oracle recomputes this from the dumped q_pca_embed; pin the
    // same property in-process so a variance-order regression fails in sbt
    import org.apache.spark.sql.functions._
    val ranks = SparkEntry.queries("q_pca_embed")(spark, sf)
      .groupBy("pc_idx").agg(var_pop(col("pc_x1e6")).as("s"))
      .collect().map(r => (r.getAs[Long]("pc_idx"), r.getAs[Double]("s")))
      .sortBy(-_._2).zipWithIndex.map { case ((pc, _), rank) => pc -> rank.toLong }
      .toMap
    val emitted = SparkEntry.queries("q_pca_variance_order")(spark, sf).collect()
      .map(r => r.getAs[Long]("pc_idx") -> r.getAs[Long]("variance_rank")).toMap
    assert(emitted === ranks)
  }

  test("gram oracles emit exact identities over the full upper triangle") {
    val rot = SparkEntry.queries("q_rotation_ortho")(spark, sf).collect()
    assert(rot.length === KernelQueries.CodeBits * (KernelQueries.CodeBits + 1) / 2)
    rot.foreach { r =>
      val (i, j, g) = (r.getAs[Long]("i"), r.getAs[Long]("j"), r.getAs[Long]("gram_x1e6"))
      assert(g === (if (i == j) 1000000L else 0L))
    }
    val pca = SparkEntry.queries("q_pca_ortho")(spark, sf).collect()
    assert(pca.length === KernelQueries.PcaDims * (KernelQueries.PcaDims + 1) / 2)
  }
}
