package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Connected components over the verified-edge list, pure DataFrame ops —
  * hash-min label propagation (each vertex repeatedly takes the min label in
  * its closed neighborhood) with per-iteration lineage truncation.
  *
  * The reference has no clustering stage (its queries return kNN lists);
  * dedup needs the transitive closure of dup edges. Duplicate clusters have
  * tiny diameters (star-like around masters), so hash-min converges in a few
  * rounds; labels are the `clip_id` strings themselves (min = lexicographic),
  * which avoids 64-bit surrogate-id birthday collisions at 10^12 rows and
  * keeps resume byte-identical.
  */
object Components {

  /** vertices: (clip_id), edges: (a, b) → (clip_id, cluster_id).
    * Singletons keep themselves as cluster_id. */
  def connectedComponents(
      spark: SparkSession,
      vertices: DataFrame,
      edges: DataFrame,
      maxIterations: Int = 50): DataFrame = {
    import spark.implicits._

    val und = edges.select($"a".as("src"), $"b".as("dst"))
      .union(edges.select($"b".as("src"), $"a".as("dst")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    und.count()

    var labels = vertices.select($"clip_id", $"clip_id".as("label"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    labels.count()

    var converged = false
    var iter = 0
    while (!converged && iter < maxIterations) {
      // min label over closed neighborhood
      val msgs = und
        .join(labels.withColumnRenamed("clip_id", "src"), Seq("src"))
        .select($"dst".as("clip_id"), $"label")
      val minned = labels.select($"clip_id", $"label").union(msgs)
        .groupBy($"clip_id").agg(min($"label").as("label"))
      // pointer doubling: label ← label(label). Invariant label(v) ≤ v, so
      // the shortcut only improves; turns O(diameter) rounds into O(log n)
      // (the chain-capped skew path produces long paths by design).
      val next = minned
        .join(
          minned.select($"clip_id".as("label"), $"label".as("ll")),
          Seq("label"))
        .select($"clip_id", $"ll".as("label"))
        .localCheckpoint(true) // truncate lineage every round
        .persist(StorageLevel.MEMORY_AND_DISK)
      val changed = next.join(labels.withColumnRenamed("label", "old"), Seq("clip_id"))
        .filter($"label" =!= $"old").count()
      labels.unpersist(false)
      labels = next
      converged = changed == 0
      iter += 1
    }
    und.unpersist(false)
    labels.withColumnRenamed("label", "cluster_id")
  }
}
