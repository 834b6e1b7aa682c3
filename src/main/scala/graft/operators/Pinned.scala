package graft.operators

import org.apache.spark.SparkContext
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.execution.LogicalRDD

/** Session-lifecycle registry for the engine's pinned intermediates.
  *
  * Operators that feed one intermediate to several consumers (LSH
  * candidate pairs, BM25 posting builds, IVF residuals, CC iteration
  * frontiers, …) pin it with a lazy `localCheckpoint(false)` rather
  * than `persist`: a CacheManager entry lives until an explicit
  * `unpersist` nobody is positioned to issue, while checkpoint blocks
  * free when the RDD is garbage-collected. That GC contract is
  * correct but LAZY — in a long-lived session executing many engine
  * calls (a bench sweep, a "load index once, serve searches all day"
  * deployment), blocks from hundreds of completed queries can outlive
  * their queries by minutes, squeezing the storage pool and taxing
  * later work (measured: the round-9 bench session accumulated ~18s
  * of phantom cost onto its tail queries; BASELINE.md "Bench session
  * hygiene").
  *
  * [[pin]] therefore records the checkpoint RDD ids per
  * SparkContext, and [[release]] frees them deterministically. The
  * contract for callers:
  *
  *   - `release(spark)` is safe once no Dataset returned by an engine
  *     call BEFORE the release point will be re-executed (results
  *     already written/collected). Re-executing a released Dataset
  *     throws (its lineage was truncated by the checkpoint) — it
  *     never silently recomputes wrong data.
  *   - Calls AFTER a release are unaffected: they build fresh plans
  *     and fresh pins.
  *   - Not calling release at all keeps the old GC-driven behavior —
  *     correct, just lazier.
  *
  * Serving loops should release on their request boundary (the bench
  * harness releases after every query; an index-serving process would
  * release per batch of searches). Bounded-growth under repeated
  * calls is spec-pinned (PinnedSessionSpec).
  */
object Pinned {

  /** Per-pipeline release handle (round-10 verdict: the harnesses
    * released pins, the product's serving paths didn't — and the
    * session-global [[release]] is unsafe there, since on a shared
    * SparkContext it would unpersist OTHER in-flight pipelines' pins).
    * A Scope collects exactly the pins built while it was the calling
    * thread's active scope (see [[collecting]]); releasing it frees
    * those and only those, so concurrent pipelines on one session
    * can't free each other's intermediates.
    *
    * Same loud-failure contract as the other release forms:
    * re-executing a frame whose pin this scope released throws; it
    * never silently recomputes.
    */
  final class Scope private[Pinned] (sc: SparkContext) extends AutoCloseable {
    private[Pinned] val mine = java.util.concurrent.ConcurrentHashMap.newKeySet[Integer]()
    private[Pinned] def context: SparkContext = sc

    /** Unpersist every pin this scope collected that is still
      * persistent, removing each from the session registry too.
      * Idempotent — a second release is a no-op.
      */
    def release(blocking: Boolean = false): Int = releaseExcept(Set.empty, blocking)

    /** As [[release]], but pins whose checkpoint-RDD id is in `keep`
      * stay collected (in this scope AND the session registry) for a
      * later release — the per-frame carve-out: a batch runner that
      * committed its file sinks but handed the caller live Memory-sink
      * views releases everything EXCEPT the pins those views still
      * reference ([[Pinned.pinIds]] of the view frames).
      */
    def releaseExcept(keep: Set[Int], blocking: Boolean = false): Int = {
      val set = ids(sc)
      val persistent = sc.getPersistentRDDs
      var n = 0
      val it = mine.iterator()
      while (it.hasNext) {
        val id = it.next()
        if (!keep.contains(id.intValue())) {
          set.remove(id)
          persistent.get(id.intValue()).foreach { rdd =>
            rdd.unpersist(blocking)
            n += 1
          }
          it.remove()
        }
      }
      n
    }

    /** Pins collected by this scope that still hold a persistent RDD. */
    def size: Int = {
      val persistent = sc.getPersistentRDDs
      var n = 0
      mine.forEach(id => if (persistent.contains(id.intValue())) n += 1)
      n
    }

    override def close(): Unit = { release(blocking = false); () }
  }

  /** The calling thread's active scope. Inheritable so a worker thread
    * spawned inside a scope (the ApiServer's async pipeline starter)
    * keeps attributing pins to its request's scope.
    */
  private val activeScope = new InheritableThreadLocal[Scope]()

  /** Run `body` with a fresh [[Scope]] installed as the calling
    * thread's active scope: every [[pin]] built during `body` (on this
    * thread, same context) is recorded in it. Returns the body's
    * result plus the scope; the CALLER owns releasing the scope once
    * the collected frames will no longer be re-executed (e.g. after
    * its sinks commit). Scopes nest — the innermost wins, so an
    * engine call that opens its own scope keeps its internal pins out
    * of the caller's.
    */
  def collecting[A](spark: SparkSession)(body: => A): (A, Scope) = {
    val s = new Scope(spark.sparkContext)
    val prev = activeScope.get()
    activeScope.set(s)
    try {
      // A throwing body unwinds before the caller ever receives the
      // scope — release its pins here (round-11 verdict #3: the GC
      // fallback is correct but would strand a failed compile's pins
      // on the lazy lifecycle), then rethrow.
      val r =
        try body
        catch { case t: Throwable => s.release(blocking = false); throw t }
      (r, s)
    } finally activeScope.set(prev)
  }

  /** Checkpoint RDD ids pinned per context. Weak keys: a stopped,
    * dropped SparkContext must not be retained by this registry (its
    * blocks died with the executors). The value set is concurrent —
    * pins happen at plan-build time from arbitrary caller threads.
    */
  private val reg =
    new java.util.WeakHashMap[SparkContext, java.util.Set[Integer]]()

  private def ids(sc: SparkContext): java.util.Set[Integer] = reg.synchronized {
    var s = reg.get(sc)
    if (s == null) {
      s = java.util.concurrent.ConcurrentHashMap.newKeySet[Integer]()
      reg.put(sc, s)
    }
    s
  }

  /** `ds.localCheckpoint(eager = false)` + registration of the
    * checkpoint RDD for [[release]]. Lazy on purpose: the checkpoint
    * materializes inside the first job that reads it, so a pin never
    * adds a job of its own. The checkpoint RDD is the returned plan's
    * `LogicalRDD` leaf — registered at build time (Spark registers it
    * in the context's persistent-RDD map immediately, before any
    * blocks exist).
    */
  def pin[T](ds: Dataset[T]): Dataset[T] = {
    val out = ds.localCheckpoint(false)
    val sc = out.sparkSession.sparkContext
    val set = ids(sc)
    val scope = activeScope.get()
    out.queryExecution.analyzed.foreach {
      case l: LogicalRDD =>
        set.add(l.rdd.id)
        if (scope != null && (scope.context eq sc)) scope.mine.add(l.rdd.id)
      case _ =>
    }
    out
  }

  /** Chain form: `df.pinned` reads like `.localCheckpoint(false)`. */
  implicit final class PinOps[T](private val ds: Dataset[T]) extends AnyVal {
    def pinned: Dataset[T] = pin(ds)
  }

  /** Unpersist every pinned block recorded for this session's context
    * and clear the registry. Returns the number of RDDs that were
    * still persistent (already-GC-collected pins count as zero work).
    * `blocking = true` waits for block removal — use it when the next
    * step is a measurement that must not share the session with the
    * removal (the bench harness does).
    */
  def release(spark: SparkSession, blocking: Boolean = false): Int = {
    val sc = spark.sparkContext
    val set = ids(sc)
    val persistent = sc.getPersistentRDDs
    var n = 0
    val it = set.iterator()
    while (it.hasNext) {
      val id = it.next()
      persistent.get(id.intValue()).foreach { rdd =>
        rdd.unpersist(blocking)
        n += 1
      }
      it.remove()
    }
    n
  }

  /** Release ONLY this frame's pinned checkpoint blocks — the
    * operator-internal lifecycle: an iterative operator that
    * supersedes its own pins mid-loop (BPE's re-symbolized word
    * table, generation k replacing k-1) frees each superseded
    * generation deterministically WITHOUT touching other operators'
    * live pins the way the session-wide [[release]] would. Returns 1
    * if the frame's RDD was still persistent. The same loud-failure
    * contract applies: re-executing the released frame throws.
    */
  def release(ds: Dataset[_], blocking: Boolean): Int = {
    val sc = ds.sparkSession.sparkContext
    val set = ids(sc)
    val persistent = sc.getPersistentRDDs
    var n = 0
    ds.queryExecution.analyzed.foreach {
      case l: LogicalRDD =>
        val id = Integer.valueOf(l.rdd.id)
        if (set.remove(id)) {
          persistent.get(id.intValue()).foreach { rdd =>
            rdd.unpersist(blocking)
            n += 1
          }
        }
      case _ =>
    }
    n
  }

  /** The REGISTERED pin ids reachable from this frame's plan —
    * checkpoint-RDD leaves the frame would re-read if executed again,
    * subquery plans included. The reachability half of
    * [[Scope.releaseExcept]]: a runner keeping some frames live (e.g.
    * Memory-sink temp views) computes the union of their pinIds and
    * releases everything else.
    *
    * Reachability must ALSO walk each matched leaf's RDD dependency
    * graph: a pin built over another pin (Dedup's incremental path
    * layers one) shows only the OUTER LogicalRDD in an unexecuted
    * frame's plan, while its lazy checkpoint RDD still computes
    * through the inner pin's RDD at first materialization. Plan-only
    * reachability would let releaseExcept free that inner pin — a
    * later execution of the kept view then throws (inner already
    * materialized, lineage truncated) or silently recomputes it
    * (inner still lazy), both breaking the caller-owns-the-view
    * contract. Driver-side metadata walk, no jobs.
    */
  def pinIds(ds: Dataset[_]): Set[Int] = {
    val set = ids(ds.sparkSession.sparkContext)
    val roots = ds.queryExecution.analyzed.collectWithSubqueries { case l: LogicalRDD => l.rdd }
    val seen = scala.collection.mutable.Set.empty[Int]
    val found = scala.collection.mutable.Set.empty[Int]
    val stack = scala.collection.mutable.Stack[org.apache.spark.rdd.RDD[_]]()
    roots.foreach(stack.push)
    while (stack.nonEmpty) {
      val r = stack.pop()
      if (seen.add(r.id)) {
        if (set.contains(Integer.valueOf(r.id))) found += r.id
        r.dependencies.foreach(d => stack.push(d.rdd))
      }
    }
    found.toSet
  }

  /** Pins recorded for this context that still hold storage (blocks
    * in memory or on disk) — the bounded-growth assertion handle.
    */
  def pinnedCount(spark: SparkSession): Int = {
    val sc = spark.sparkContext
    val set = ids(sc)
    sc.getPersistentRDDs.keysIterator.count(id => set.contains(Integer.valueOf(id)))
  }

  /** Total (memory + disk) bytes currently held by pinned RDDs. */
  def pinnedBytes(spark: SparkSession): Long = {
    val sc = spark.sparkContext
    val set = ids(sc)
    sc.getRDDStorageInfo
      .filter(info => set.contains(Integer.valueOf(info.id)))
      .map(info => info.memSize + info.diskSize)
      .sum
  }
}
