package graft.pipeline

import graft.SparkTestBase
import graft.conf.GraftConf
import graft.oracle.RefOracle
import graft.synth.ClipTableGen
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class PipelineSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  val conf = GraftConf()
  val N = 400

  lazy val clipsLocal = {
    val groups = math.max(1, N / 4)
    (0L until groups).flatMap(g => ClipTableGen.group(conf.seed, g))
  }
  lazy val clipsDf = ClipTableGen.table(spark, N, conf.seed).toDF()
  lazy val result = DedupPipeline.run(spark, clipsDf, conf)
  lazy val oracle = RefOracle.run(clipsLocal, conf)

  test("pipeline reproduces the seeded reference-oracle cluster assignments (recall ≥ 0.99)") {
    val got = result.clusters.as[(String, String)].collect().toMap
    assert(got.size === clipsLocal.size)
    // dup-pair recall + precision vs oracle co-cluster pairs
    def pairs(m: Map[String, String]): Set[(String, String)] = {
      m.groupBy(_._2).values.flatMap { g =>
        val ids = g.keys.toSeq.sorted
        for (i <- ids.indices; j <- (i + 1) until ids.length) yield (ids(i), ids(j))
      }.toSet
    }
    val gotPairs = pairs(got)
    val oraclePairs = oracle.dupPairs
    val inter = (gotPairs intersect oraclePairs).size.toDouble
    val recall = if (oraclePairs.isEmpty) 1.0 else inter / oraclePairs.size
    val precision = if (gotPairs.isEmpty) 1.0 else inter / gotPairs.size
    assert(oraclePairs.nonEmpty, "oracle found no dup pairs — fixture broken")
    assert(recall >= 0.99, s"recall=$recall (got ${gotPairs.size}, oracle ${oraclePairs.size})")
    assert(precision >= 0.99, s"precision=$precision")
  }

  test("pipeline clusters match planted golden truth (recall & precision ≥ 0.95)") {
    val got = result.clusters.as[(String, String)].collect().toMap
    val golden = ClipTableGen.goldenClusters(N, conf.seed)
    def pairs(m: Map[String, String]): Set[(String, String)] =
      m.groupBy(_._2).values.flatMap { g =>
        val ids = g.keys.toSeq.sorted
        for (i <- ids.indices; j <- (i + 1) until ids.length) yield (ids(i), ids(j))
      }.toSet
    val gp = pairs(golden)
    val rp = pairs(got)
    val inter = (gp intersect rp).size.toDouble
    assert(gp.nonEmpty)
    val recall = inter / gp.size
    val precision = if (rp.isEmpty) 1.0 else inter / rp.size
    assert(recall >= 0.95, s"golden recall=$recall missing=${(gp diff rp).take(5)}")
    assert(precision >= 0.95, s"golden precision=$precision extra=${(rp diff gp).take(5)}")
  }

  test("hard negatives never cluster with their master") {
    val got = result.clusters.as[(String, String)].collect().toMap
    val groups = math.max(1, N / 4)
    for (g <- 0L until groups; v <- 1 to ClipTableGen.variantCount(conf.seed, g)) {
      if (ClipTableGen.variantKind(conf.seed, g, v) == "hardneg") {
        val neg = ClipTableGen.clipId(conf.seed, g, v)
        val master = ClipTableGen.clipId(conf.seed, g, 0)
        assert(got(neg) !== got(master), s"hardneg $neg joined master cluster (group $g)")
      }
    }
  }

  test("substring variants are linked by the suffix pass") {
    val got = result.clusters.as[(String, String)].collect().toMap
    val groups = math.max(1, N / 4)
    var checked = 0
    for (g <- 0L until groups; v <- 1 to ClipTableGen.variantCount(conf.seed, g)) {
      if (ClipTableGen.variantKind(conf.seed, g, v) == "textsub") {
        val sub = ClipTableGen.clipId(conf.seed, g, v)
        val master = ClipTableGen.clipId(conf.seed, g, 0)
        assert(got(sub) === got(master), s"textsub $sub not clustered with master (group $g)")
        checked += 1
      }
    }
    assert(checked > 0, "no textsub variants planted")
  }

  test("connected components handles chains, isolated vertices, and symmetric edges") {
    val vertices = Seq("a", "b", "c", "d", "e", "f").toDF("clip_id")
    val edges = Seq(("a", "b"), ("b", "c"), ("e", "d")).toDF("a", "b")
    val cc = Components.connectedComponents(spark, vertices, edges)
      .as[(String, String)].collect().toMap
    assert(cc("a") === "a" && cc("b") === "a" && cc("c") === "a")
    assert(cc("d") === "d" && cc("e") === "d")
    assert(cc("f") === "f")
  }

  test("connected components converges on a long chain (multi-round propagation + pointer jumps)") {
    // a 64-node path graph needs several propagation rounds even with
    // pointer doubling — exercises the fused one-job-per-round loop
    // (lazy checkpoint + fingerprint convergence on successive
    // min-aggregations) beyond the 1-2 rounds small dup groups need
    val n = 64
    val ids = (0 until n).map(i => f"v$i%03d")
    val vertices = ids.toDF("clip_id")
    val edges = (0 until n - 1).map(i => (ids(i), ids(i + 1))).toDF("a", "b")
    val cc = Components.connectedComponents(spark, vertices, edges)
      .as[(String, String)].collect().toMap
    assert(cc.keySet === ids.toSet)
    assert(cc.values.toSet === Set("v000"), s"chain must collapse to one component: ${cc.values.toSet}")
  }

  test("adversarial skew: one hot band key still yields one correct cluster via chain pairs") {
    // all-duplicates table: many exact copies of one master → every band key hot
    val skewConf = conf.copy(bucketCap = 8, chainWidth = 2)
    val master = ClipTableGen.group(conf.seed, 7L).head
    val dupes = (0 until 120).map(i => master.copy(clip_id = f"dup$i%04d"))
    val df = dupes.toDF()
    val res = DedupPipeline.run(spark, df, skewConf)
    val got = res.clusters.as[(String, String)].collect().toMap
    assert(got.values.toSet.size === 1, "all exact dupes must form one cluster")
    // and the capped path was actually exercised
    val capped = res.edges.filter(col("accepted")).count()
    assert(capped < 120L * 119 / 2, "chain capping should bound pair count below O(n²)")
    assert(capped >= 119, "chain must keep the bucket connected")
  }

  test("bucket overflow beyond bucketHardStop is chain-bridged, never silently dropped") {
    // group of 40 on one band key with a tiny configured hardStop of 8:
    // members beyond the 8th take the streaming overflow path and must all
    // (a) appear in pairs, (b) stay connected to the buffered chain,
    // (c) stay in the linear pair regime, (d) be flagged capped.
    val c = conf.copy(bucketCap = 4, chainWidth = 2, bucketHardStop = 8)
    val n = 40
    val ids = (0 until n).map(i => f"m$i%03d")
    val bands = ids.map(id => (99L, 1, id)).toDF("band_key", "src", "clip_id")
    val rows = CandidatePairs.fromBands(spark, bands, c)
      .select("a", "b", "capped").as[(String, String, Boolean)].collect()
    assert(rows.forall(_._3), "every pair of an overflowed group must be flagged capped")
    assert(rows.forall(r => r._1 < r._2), "pairs must be endpoint-ordered")
    val pairs = rows.map(r => (r._1, r._2)).toSet
    assert(pairs.flatMap(p => Set(p._1, p._2)) === ids.toSet,
      "every member (incl. overflow) must appear in at least one pair")
    // connectivity via local union-find
    val parent = scala.collection.mutable.Map(ids.map(i => i -> i): _*)
    def find(x: String): String = { var r = x; while (parent(r) != r) r = parent(r); r }
    pairs.foreach { case (a, b) => parent(find(a)) = find(b) }
    assert(ids.map(find).toSet.size === 1, "overflowed group must remain one component")
    // linear regime, not O(n²)
    assert(pairs.size <= n * 2 * c.chainWidth, s"pair count ${pairs.size} not linear")
  }

  test("suffix-pass window group beyond bucketHardStop streams bounded, connected, flagged") {
    // one boilerplate W-token window shared by 40 docs with a tiny
    // configured hardStop of 8: the generator must buffer at most 8
    // members and stream the other 32 through the ring-buffer chain —
    // (a) every member appears in pairs, (b) the group stays one
    // component, (c) the pair count stays in the linear regime,
    // (d) every pair is flagged capped. (Before this path existed, the
    // generator buffered the WHOLE group per task — the 10^12-row OOM.)
    val w = conf.substringWindow
    val common = (1 to w).map(i => s"b$i").mkString(" ")
    val n = 40
    val ids = (0 until n).map(i => f"s$i%03d")
    val clips = ids.map(id => (id, common)).toDF("clip_id", "transcript")
    val c = conf.copy(bucketCap = 4, chainWidth = 2, bucketHardStop = 8)
    val rows = SuffixDups.candidates(spark, clips, c)
      .select("a", "b", "capped").as[(String, String, Boolean)].collect()
    assert(rows.forall(_._3), "every pair of an overflowed window group must be flagged capped")
    assert(rows.forall(r => r._1 < r._2), "pairs must be endpoint-ordered")
    val pairs = rows.map(r => (r._1, r._2)).toSet
    assert(pairs.flatMap(p => Set(p._1, p._2)) === ids.toSet,
      "every member (incl. overflow) must appear in at least one pair")
    val parent = scala.collection.mutable.Map(ids.map(i => i -> i): _*)
    def find(x: String): String = { var r = x; while (parent(r) != r) r = parent(r); r }
    pairs.foreach { case (a, b) => parent(find(a)) = find(b) }
    assert(ids.map(find).toSet.size === 1, "overflowed window group must remain one component")
    // linear regime: chain O(n·width) + seed probes O(SeedProbeLimit·cap)
    assert(pairs.size <= n * 2 * c.chainWidth + SuffixDups.SeedProbeLimit * c.bucketCap,
      s"pair count ${pairs.size} not in the bounded regime")
  }

  test("capped hot-phrase group still finds containment pairs beyond the chain width") {
    // > bucketCap docs share one boilerplate window; a contained doc's true
    // container sits ~190 ids away — chain pairs (width 2) alone would
    // lose it; the seed-probe fan must recover it. (The fan is itself
    // bounded: containment partners beyond the first bucketCap id-sorted
    // members of a capped group remain out of reach — documented limit.)
    val w = conf.substringWindow
    val common = (1 to w).map(i => s"c$i").mkString(" ")
    val docs = (0 until 520).map { i =>
      val id = f"d$i%04d"
      val text =
        if (id == "d0200") s"$common z9" // fully contained in d0010's text
        else if (id == "d0010") s"$common z9 tail tail2 tail3"
        else s"$common u$i filler$i x$i"
      (id, text)
    }
    val clips = docs.toDF("clip_id", "transcript")
    val smallCap = conf.copy(bucketCap = 256, chainWidth = 2)
    val cand = SuffixDups.candidates(spark, clips, smallCap)
      .select("a", "b").as[(String, String)].collect().toSet
    assert(cand.contains(("d0010", "d0200")),
      "seed-probe fan must emit the far-apart containment pair in a capped group")
    // and the capped path was the one taken (group of 520 > cap 256)
    val capped = SuffixDups.candidates(spark, clips, smallCap)
      .filter(col("capped")).count()
    assert(capped > 0)
    // blowup stays bounded: chain O(n·width) + probes O(limit·cap)
    assert(cand.size <= 520 * 2 + SuffixDups.SeedProbeLimit * 256)
  }

  test("checkpointed stages resume without recompute and reproduce identical clusters") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    val ckptConf = conf.copy(checkpointDir = Some(tmp))
    val df = ClipTableGen.table(spark, 120, conf.seed).toDF()
    val r1 = DedupPipeline.run(spark, df, ckptConf, inputSig = "t120")
    val c1 = r1.clusters.as[(String, String)].collect().toMap
    assert(r1.stages.forall(!_.resumed))
    assert(r1.stages.forall(_.rows >= 0))
    // manifests exist with lineage
    val manifest = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$tmp/_MANIFEST_signatures.json")), "UTF-8")
    assert(manifest.contains("\"partitions\""))
    assert(manifest.contains("\"wall_ms\""))
    // delete the LAST stage's manifest (simulate kill before completion)
    java.nio.file.Files.delete(java.nio.file.Paths.get(s"$tmp/_MANIFEST_clusters.json"))
    val r2 = DedupPipeline.run(spark, df, ckptConf, inputSig = "t120")
    val c2 = r2.clusters.as[(String, String)].collect().toMap
    assert(c2 === c1, "resumed run must be byte-identical")
    // earlier stages were resumed, not recomputed
    assert(r2.stages.count(_.resumed) === 4, r2.stages.map(s => (s.name, s.resumed)).toString)
    // changed input signature invalidates resume
    val r3 = DedupPipeline.run(spark, df, ckptConf, inputSig = "t120-v2")
    assert(r3.stages.forall(!_.resumed))
  }

  test("surrogate-id shuffle diet reproduces identical edges and clusters") {
    // Long xxhash64 surrogates ride the band/candidate shuffles; strings
    // are restored in the verify join — accepted edge set and clusters
    // must be IDENTICAL to the string-id path (collisions could only add
    // verify-rejected candidates, and none exist at this scale)
    val base = DedupPipeline.run(spark, clipsDf, conf)
    val diet = DedupPipeline.run(spark, clipsDf, conf.copy(surrogateIds = true))
    def edgeSet(r: DedupPipeline.Result): Set[(String, String)] =
      r.edges.filter(col("accepted")).select("a", "b")
        .as[(String, String)].collect().toSet
    def clusterMap(r: DedupPipeline.Result): Map[String, String] =
      r.clusters.as[(String, String)].collect().toMap
    val (be, de) = (edgeSet(base), edgeSet(diet))
    assert(de === be)
    // restored pairs stay canonically ordered on the STRING ids
    de.foreach { case (a, b) => assert(a < b, s"($a,$b)") }
    assert(clusterMap(diet) === clusterMap(base))
    base.cleanup(); diet.cleanup()
  }
}
