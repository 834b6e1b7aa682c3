package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Engine-portable Count-Min Sketch (Cormode & Muthukrishnan 2005) —
  * the frequency-estimation member of the portable-sketch family (KMV
  * q79, HLL q105, priority sampling q109). Spark ships a CountMinSketch
  * but its hashes are engine-private (the q45 story); this one derives
  * every bucket from md5, so another engine building the same sketch
  * over the same stream produces IDENTICAL counters and estimates —
  * the q114 oracle hash-gates the estimates directly, no tolerance
  * band needed.
  *
  * Scale shape: the counter build is one explode (d rows per item) and
  * one groupBy over a key space bounded by d·w — the partial
  * aggregation collapses each partition to ≤ d·w cells before any
  * shuffle, so counter traffic is independent of stream size (the
  * sketch property that makes CMS THE distributed frequency sketch).
  * Estimation broadcast-joins the tiny counter table.
  *
  * CMS guarantees estimates NEVER underestimate (every occurrence
  * increments all d of its buckets) and overestimate by at most
  * εN = (e/w)·N with probability 1−(1/e)^d — the spec pins the hard
  * lower-bound invariant and the parameterized accuracy.
  */
object CountMin {

  /** Bucket of `item` in hash row `row` (a column of ints): first 7
    * md5 hex digits → 28-bit int, mod w. Non-negative by construction,
    * so `%` and `pmod` agree across engines.
    */
  def bucket(item: Column, row: Column, w: Int): Column =
    pmod(
      conv(md5(concat(row.cast("string"), lit("#"), item)).substr(1, 7), 16, 10).cast("long"),
      lit(w.toLong))

  /** Column-metadata keys stamping a counter table with the (d, w) it
    * was built under — the sketch's identity, carried BY the table
    * (metadata survives select/alias and a parquet round-trip, so it
    * travels with shard sketches in the sketches-move workflow).
    */
  private val DKey = "graft.cms.d"
  private val WKey = "graft.cms.w"

  private def stampMeta(d: Int, w: Int): org.apache.spark.sql.types.Metadata =
    new org.apache.spark.sql.types.MetadataBuilder()
      .putLong(DKey, d.toLong)
      .putLong(WKey, w.toLong)
      .build()

  /** The (row, bucket) -> count table, ≤ d·w rows. Occurrences are
    * pre-aggregated per DISTINCT item first, so the d md5 bucket
    * computations run once per vocabulary entry, not once per stream
    * element — identical counter values (summing pre-counts ≡
    * counting rows), 4·V hash work instead of 4·N. The `c` column
    * carries (d, w) in its metadata for [[merge]]'s identity check.
    */
  def counters(items: DataFrame, itemCol: Column, d: Int, w: Int): DataFrame = {
    require(d >= 1 && w >= 2, s"need d >= 1, w >= 2 (got d=$d, w=$w)")
    items
      .select(itemCol.as("item"))
      .groupBy(col("item"))
      .agg(count(lit(1)).as("_n"))
      .select(
        col("_n"),
        explode(
          transform(
            sequence(lit(0), lit(d - 1)),
            i => struct(i.cast("int").as("r"), bucket(col("item"), i, w).as("b")))).as("rb"))
      .groupBy(col("rb.r").as("r"), col("rb.b").as("b"))
      .agg(sum(col("_n")).as("c", stampMeta(d, w)))
  }

  /** Merge shard sketches by per-cell counter addition — THE
    * production workflow at 100 TB: each shard builds its own ≤ d·w
    * counter table, sketches (not streams) move, and the union is
    * exactly the sketch of the concatenated stream (CMS counters are
    * linear in the input). Sketches built with DIFFERENT (d, w) would
    * union into a structurally valid but meaningless table whose
    * estimates silently break the never-undercount invariant — so
    * merge takes the intended (d, w) and fails loudly:
    *   - at plan time on a wrong schema;
    *   - at plan time on a shard whose `c`-column metadata (stamped by
    *     [[counters]], parquet-durable) declares a different (d, w) —
    *     this catches SMALLER-parameter shards too, whose coordinates
    *     are all in range;
    *   - at run time on any counter cell outside [0,d)×[0,w) — the
    *     fallback for unstamped tables (hand-built, or stripped by a
    *     metadata-dropping transform), which catches larger-parameter
    *     shards (a smaller-parameter UNSTAMPED shard is undetectable:
    *     its schema, metadata and coordinate range are all consistent
    *     with the declared identity).
    * The md5 bucket derivation is fixed by this object, so (d, w) IS
    * the sketch identity. Mergeability + both mismatch rejections are
    * spec-pinned (CountMinSpec "shard sketches merge").
    */
  def merge(sketches: Seq[DataFrame], d: Int, w: Int): DataFrame = {
    require(sketches.nonEmpty, "merge needs at least one sketch")
    require(d >= 1 && w >= 2, s"need d >= 1, w >= 2 (got d=$d, w=$w)")
    sketches.zipWithIndex.foreach { case (s, i) =>
      require(
        s.columns.sorted.sameElements(Array("b", "c", "r")),
        s"sketch $i is not a (r, b, c) counter table: ${s.columns.mkString("(", ", ", ")")}")
      val md = s.schema("c").metadata
      if (md.contains(DKey) && md.contains(WKey)) {
        val (sd, sw) = (md.getLong(DKey), md.getLong(WKey))
        require(
          sd == d.toLong && sw == w.toLong,
          s"sketch $i was built with different (d, w): (d=$sd, w=$sw) vs the declared " +
            s"(d=$d, w=$w) — foreign-parameter sketches never union")
      }
    }
    sketches
      .map(_.select(
        assertInCell(col("r"), d, "r").as("r"),
        assertInCell(col("b"), w, "b").as("b"),
        col("c")))
      .reduce(_ unionByName _)
      .groupBy(col("r"), col("b"))
      // the merged sketch is itself a (d, w) sketch — re-stamp so
      // tree-merges (shard → site → global) keep the identity check
      .agg(sum(col("c")).as("c", stampMeta(d, w)))
  }

  /** Pass-through that raises if a counter coordinate falls outside
    * its declared bound — the executable form of "all shards share
    * (d, w)". A foreign-parameter sketch can't be detected cheaper:
    * its schema is identical, only its coordinate range differs.
    */
  private def assertInCell(c: Column, bound: Int, name: String): Column =
    when(c >= 0 && c < bound, c).otherwise(
      raise_error(concat(
        lit(s"CountMin.merge: $name coordinate "), c.cast("string"),
        lit(s" outside [0,$bound) — shard sketch built with different (d, w)"))))

  /** Point estimates for `probes`: min over the d rows of the probed
    * counters (0 for a never-touched bucket). Output (item, cms_est).
    */
  def estimate(
      counters: DataFrame,
      probes: DataFrame,
      probeCol: Column,
      d: Int,
      w: Int): DataFrame =
    probes
      .select(probeCol.as("item"))
      .select(
        col("item"),
        explode(
          transform(
            sequence(lit(0), lit(d - 1)),
            i => struct(i.cast("int").as("r"), bucket(col("item"), i, w).as("b")))).as("rb"))
      .select(col("item"), col("rb.r").as("r"), col("rb.b").as("b"))
      .join(broadcast(counters), Seq("r", "b"), "left")
      .groupBy(col("item"))
      .agg(min(coalesce(col("c"), lit(0L))).as("cms_est"))
}
