package graft.optimize

import graft.SparkTestBase
import graft.conf.GraftConf
import graft.kernel.Shingles
import graft.synth.ClipTableGen
import org.scalatest.funsuite.AnyFunSuite

class HashBoosterSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  val conf = GraftConf()

  // shingle sets + golden co-cluster pairs from the planted fixture
  lazy val (shingleSets, golden) = {
    val n = 240
    val clips = (0L until (n / 4).toLong).flatMap(g => ClipTableGen.group(conf.seed, g))
    val sets = clips.map { c =>
      (c.clip_id, Shingles.tokenShingles(Shingles.tokens(c.transcript), conf.textShingleK, conf.seed))
    }.toDF("clip_id", "sh")
    val truth = ClipTableGen.goldenClusters(n, conf.seed)
    val pairs = truth.groupBy(_._2).values.flatMap { grp =>
      val ids = grp.keys.toSeq.sorted
      for (i <- ids.indices; j <- (i + 1) until ids.length) yield (ids(i), ids(j))
    }.toSeq
    (sets, pairs.toDF("a", "b"))
  }

  test("boosted selection is deterministic, ranks by weighted fitness, and improves coverage") {
    val pool = Seq(101L, 202L, 303L, 404L, 505L)
    val r1 = HashBooster.select(spark, shingleSets, golden, pool, numTables = 3, conf)
    val r2 = HashBooster.select(spark, shingleSets, golden, pool, numTables = 3, conf)
    assert(r1.seeds === r2.seeds, "greedy selection must be deterministic")
    assert(r1.tables.nonEmpty && r1.tables.forall(_.fitness >= 0.0))
    assert(r1.seeds.distinct.length === r1.seeds.length)

    // union coverage of chosen tables ≥ coverage of the single best table
    val goldenSet = golden.as[(String, String)].collect().toSet
    def covered(seeds: Seq[Long]): Int =
      seeds.map { s =>
        HashBooster.collisionPairs(spark, shingleSets, s, conf)
          .as[(String, String)].collect().toSet
      }.reduce(_ union _).intersect(goldenSet).size
    assert(covered(r1.seeds) >= covered(Seq(r1.seeds.head)))
  }

  test("boosting prefers a table that covers the re-weighted residual pairs") {
    // after the first pick, weights of covered pairs drop to zero — the
    // second pick must add NEW coverage unless nothing new exists
    val pool = Seq(7L, 21L, 63L)
    val r = HashBooster.select(spark, shingleSets, golden, pool, numTables = 2, conf)
    if (r.tables.length == 2)
      assert(r.tables(1).newTpWeight >= 0.0)
  }
}
