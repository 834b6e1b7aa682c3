package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.operators.Pinned.PinOps

/** Connected components over an undirected edge list — the clustering
  * stage of near-duplicate deduplication: LSH emits candidate PAIRS,
  * but a dedup decision needs per-document CLUSTER ids (keep the min id
  * of each component, drop the rest).
  *
  * Algorithm: iterative min-label propagation. Each vertex starts
  * labeled with its own id; every iteration each vertex takes the min
  * of its own label and its neighbors' labels; fixpoint = components.
  * Converges in O(component diameter) iterations — near-dup graphs are
  * dense clumps with tiny diameters, so this beats the alternating-star
  * algorithms (Kiveris '14) in practice while staying two joins per
  * iteration of plain DataFrame code.
  *
  * Scale design:
  *   - the edge list is symmetrized once and persisted (spill-safe);
  *   - each iteration is ONE shuffle (groupBy id of labels ∪ messages);
  *   - `localCheckpoint` truncates lineage every iteration — without it
  *     the plan doubles per iteration and the optimizer chokes by ~10;
  *   - convergence is detected by the label-sum aggregate, not a
  *     self-join diff: labels only ever decrease, so an unchanged sum
  *     IS the fixpoint, for the cost of one cheap aggregate.
  *
  * go-fish has no graph surface (SURVEY §2.8); this is part of the
  * training-data-pipeline extension (near-dup clustering).
  */
object ConnectedComponents {

  /** @param edges  DataFrame with two vertex-id columns (castable to long)
    * @param srcCol name of the first id column
    * @param dstCol name of the second id column
    * @param maxIter safety bound; propagation almost always converges
    *                far earlier and stops at the detected fixpoint
    * @return (id: long, component: long) — component = min reachable id.
    *         Only vertices that appear in `edges` are returned
    *         (singletons have no edges and are their own component).
    */
  /** @param tuneSession allow the tiny-graph conf tuning below (flips
    *                     SESSION-scoped settings for the loop's
    *                     duration). Pass false from code that may share
    *                     its session with concurrently planned queries.
    */
  def apply(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      maxIter: Int = 25,
      tuneSession: Boolean = true
  ): DataFrame = {
    val spark = edges.sparkSession
    val e = edges.select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
    val sym = e
      .unionByName(e.select(col("dst").as("src"), col("src").as("dst")))
      .filter(col("src") =!= col("dst"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)

    // The edge list after LSH/blocking is orders of magnitude smaller
    // than the corpus. For small graphs the loop's cost is pure per-job
    // overhead — AQE turns every exchange into its own materialized
    // stage, and 32-way shuffles of a few thousand rows schedule far
    // more tasks than work. Size the loop to the graph: for tiny edge
    // lists drop AQE and run narrow shuffles (2× faster here); big
    // graphs keep AQE (skew-join splitting matters for hot vertices).
    // NOTE: the tiny-graph tuning flips SESSION-scoped conf for the
    // duration of the loop (restored in finally). Queries planned
    // concurrently on the SAME SparkSession during that window would
    // see it — callers running CC alongside other work should give it
    // a dedicated session (spark.newSession()).
    val edgeCount = sym.count()
    if (edgeCount == 0) {
      // No edges → no labeled vertices (the sum-based convergence check
      // would read a null aggregate). Callers treat absent ids as
      // singleton components already.
      sym.unpersist()
      return sym.select(col("src").as("id"), col("src").as("component"))
    }
    val conf = spark.conf
    val oldAqe = conf.get("spark.sql.adaptive.enabled", "true")
    val oldParts = conf.get("spark.sql.shuffle.partitions", "200")
    // shuffle.partitions may be non-numeric on some platforms ("auto");
    // skip the tuning rather than fail.
    val oldPartsNum = scala.util.Try(oldParts.toLong).toOption
    val tiny = tuneSession && edgeCount < 10000000L && oldPartsNum.isDefined
    if (tiny) {
      conf.set("spark.sql.adaptive.enabled", "false")
      conf.set(
        "spark.sql.shuffle.partitions",
        math.max(1L, math.min(oldPartsNum.get, edgeCount / 500000L + 1)).toString
      )
    }
    try {
      // Lazy localCheckpoint: the convergence aggregate right below is
      // the action that materializes it, so each round is ONE job (an
      // eager checkpoint would run a separate materialization job first).
      // Storage note: each round's checkpoint holds a copy of the label
      // table until the ContextCleaner GCs the superseded Dataset or
      // the caller runs Pinned.release on its request boundary.
      // Bounded in practice: labels cover only PAIR-GRAPH
      // vertices (a small fraction of the corpus) and near-dup clusters
      // converge in 3-5 rounds (SCALE.md), so at most a handful of
      // small tables are ever live.
      var labels = sym
        .select(col("src").as("id"))
        .distinct()
        .select(col("id"), col("id").as("component"))
        .pinned
      // Sum as decimal(38,0): with hash-derived 64-bit ids a long sum
      // can overflow (ANSI mode would throw mid-job; non-ANSI could wrap).
      def labelSum(df: DataFrame): java.math.BigDecimal =
        df.agg(sum(col("component").cast("decimal(38,0)"))).head.getDecimal(0)
      var prevSum = labelSum(labels)

      var iter = 0
      var converged = false
      while (!converged && iter < maxIter) {
        val msgs = sym
          .join(labels, sym("src") === labels("id"))
          .select(sym("dst").as("id"), col("component"))
        val next = labels
          .unionByName(msgs)
          .groupBy(col("id"))
          .agg(min(col("component")).as("component"))
          .pinned
        val s = labelSum(next)
        converged = s.compareTo(prevSum) == 0
        prevSum = s
        labels = next
        iter += 1
      }
      if (!converged) {
        System.err.println(
          s"WARN ConnectedComponents: maxIter=$maxIter reached without convergence — " +
            "labels may span merged components; raise maxIter for deep graphs"
        )
      }
      labels
    } finally {
      sym.unpersist() // also on failure — don't leak the cached edge list
      if (tiny) {
        conf.set("spark.sql.adaptive.enabled", oldAqe)
        conf.set("spark.sql.shuffle.partitions", oldParts)
      }
    }
  }
}
