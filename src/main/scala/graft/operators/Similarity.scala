package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Pinned.PinOps

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Three tiers, all shuffle-conscious:
  *   - `bruteForceTopK`: broadcast the (small) query set, map-side dot
  *     products over the candidate corpus, per-query top-k via window.
  *     Exact; the correctness baseline. Scales linearly in corpus size —
  *     right up to the point the query set stops being broadcastable.
  *   - `cellTopK` (IVF-style): both sides are pre-partitioned into
  *     coarse cells; search only within the query's cell. One co-located
  *     join on the cell key instead of a cross join — the 100 TB path.
  *   - `signLshBuckets`: random-hyperplane signature (Charikar '02)
  *     with hyperplanes derived deterministically from md5, so bucket
  *     assignment is reproducible across engines and runs. Collisions
  *     in any signature band become candidates, like Dedup's LSH.
  *
  * Dot products use zip_with + a sequential aggregate fold, in array
  * order — bit-deterministic for a given row, independent of
  * partitioning.
  */
object Similarity {

  /** Sequential-fold dot product of two double-array columns — the
    * codegen'd kernel (graft.expressions.DotProductExpr); identical
    * fold order (and hence bits) to the declarative
    * `aggregate(zip_with(a, b, _*_), 0.0, _+_)` form.
    */
  def dot(a: Column, b: Column): Column = graft.expressions.TextHashExprs.dot(a, b)

  /** Declarative reference form of [[dot]] (property-test anchor). */
  def dotDeclarative(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Float embedding → double array (widen before any arithmetic). */
  def asDouble(c: Column): Column = transform(c, _.cast("double"))

  /** Exact top-k neighbors for each query vector.
    *
    * @param queries  (qid, qemb) — must be small enough to broadcast
    * @param corpus   (nid, nemb)
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val pairs = corpus
      .join(broadcast(queries), col("nid") =!= col("qid"))
      .select(col("qid"), col("nid"), cosine(col("qemb"), col("nemb")).as("cosine"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("nid"))
    pairs.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** IVF-style cell-restricted top-k: join on the cell key (one
    * co-located shuffle join), rank within the cell. Recall depends on
    * the cell assignment; with a trained quantizer this is classic IVF,
    * with a semantic partition key (here: label) it is blocked ANN.
    *
    * @param queries (qid, qemb, cell)
    * @param corpus  (nid, nemb, cell)
    */
  def cellTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val pairs = corpus
      .join(queries, Seq("cell"))
      .filter(col("nid") =!= col("qid"))
      .select(col("cell"), col("qid"), col("nid"), cosine(col("qemb"), col("nemb")).as("cosine"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("nid"))
    pairs.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Deterministic pseudo-random hyperplane component for (plane j,
    * dim d): +1 if the first hex digit of md5("j:d") has its top bit
    * set, else -1. Computed ONCE on the driver and shipped as a
    * literal matrix — the hyperplanes are row-independent, so hashing
    * per row would be pure waste. Engine-portable (the md5 formula is
    * reproducible in any SQL oracle) and needs no RNG state.
    */
  def planeComponent(j: Int, d: Int): Double = {
    val digest = java.security.MessageDigest.getInstance("MD5").digest(s"$j:$d".getBytes("UTF-8"))
    // top bit of the first hex digit == top bit of the first byte
    if ((digest(0) & 0x80) != 0) 1.0 else -1.0
  }

  /** `planes`-bit sign-LSH signature of an embedding (double array):
    * bit j = sign of the dot product with pseudo-random hyperplane j.
    * `dims` is the embedding dimensionality (plane matrix size).
    */
  def signLshSignature(emb: Column, planes: Int, dims: Int): Column = {
    val planeRows: Seq[Seq[Double]] =
      (0 until planes).map(j => (0 until dims).map(d => planeComponent(j, d)))
    val bits = transform(
      sequence(lit(0), lit(planes - 1)),
      j => when(dot(emb, element_at(typedLit(planeRows), j + 1)) > 0, 1).otherwise(0)
    )
    aggregate(zip_with(bits, sequence(lit(0), lit(planes - 1)), (b, j) => (b * pow(lit(2.0), j)).cast("int")), lit(0), _ + _)
  }

  /** Embedding width read from the data (first non-empty row). The
    * sign-LSH plane matrix is a driver-built literal, so `dims` must be
    * known at plan time — deriving it here keeps the planes in lockstep
    * with the corpus (and with an oracle that derives its plane count
    * from `LEN(emb)`) instead of trusting a hand-maintained constant
    * that silently diverges when the embedding width changes. Cost: one
    * bounded LIMIT-1 job at plan construction. Returns 0 for an
    * all-empty corpus (the signature is then the constant 0 bucket).
    */
  def embeddingDims(df: DataFrame, embCol: String): Int =
    df.select(size(col(embCol)).as("_d")).filter(col("_d") > 0).limit(1)
      .collect().headOption.map(_.getInt(0)).getOrElse(0)

  /** Bucket a corpus by sign-LSH signature: vectors sharing a bucket
    * are the candidate set for each other. Increase `planes` for
    * precision, lower it (or search neighboring buckets) for recall.
    */
  def signLshBuckets(df: DataFrame, idCol: String, embCol: String, planes: Int, dims: Int): DataFrame =
    df.select(col(idCol), signLshSignature(col(embCol), planes, dims).as("bucket"))

  /** Embedding-cosine near-duplicate pairs within coarse cells: the
    * dedup-by-embedding primitive. Pairs form only inside a cell (one
    * co-located self-join on the cell key — same scale shape as
    * cellTopK), then the exact cosine filters at `threshold`.
    *
    * @param df (id, emb, cell) — cell from a quantizer, LSH bucket
    *           ([[signLshBuckets]]), or a semantic partition key
    */
  def cellNearDups(df: DataFrame, threshold: Double, dedupFirst: Boolean = false): DataFrame = {
    if (dedupFirst) return cellNearDupsDedupFirst(df, threshold)
    // Norms are per-row facts: compute them once before the pair join
    // (O(n) dots) instead of inside it (O(pairs) extra dots).
    val withNorm = df.select(col("cell"), col("id"), col("emb"), norm(col("emb")).as("_n"))
    val a = withNorm.select(col("cell"), col("id").as("id1"), col("emb").as("e1"), col("_n").as("n1"))
    val b = withNorm.select(col("cell"), col("id").as("id2"), col("emb").as("e2"), col("_n").as("n2"))
    a.join(b, Seq("cell"))
      .filter(col("id1") < col("id2"))
      .select(col("cell"), col("id1"), col("id2"), (dot(col("e1"), col("e2")) / (col("n1") * col("n2"))).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** [[cellNearDups]] over DISTINCT (cell, embedding) vectors only,
    * expanding group pairs back to id pairs — output-identical:
    * duplicate vectors in a cell form a group whose representative
    * carries the exact same dot/norm arithmetic, so cross-group pairs
    * reproduce the direct form's cosines bit-for-bit and within-group
    * pairs share the group's self-cosine (computed through the SAME
    * `dot(e,e)/(n·n)` expression, not shortcut to 1.0 — `sqrt(x)²≠x`
    * in floating point, and the oracle computes the long form).
    * Embedding dedup rates are high in crawled corpora (the sf1 soak
    * holds 2,000 distinct vectors across 20k rows), and the pair join
    * shrinks quadratically in the duplication factor.
    */
  private def cellNearDupsDedupFirst(df: DataFrame, threshold: Double): DataFrame = {
    val w = Window.partitionBy(col("cell"), col("emb"))
    val withGid = df
      .select(col("cell"), col("id"), col("emb"))
      .withColumn("gid", min(col("id")).over(w))
    val reps = withGid.filter(col("id") === col("gid")).select(col("cell"), col("gid").as("id"), col("emb"))
    // Groups are keyed by (cell, gid), and every expansion join must
    // match on BOTH: with multi-probe cell assignments (the doc'd LSH
    // shape) the same id sits in several cells, and a gid-only join
    // would expand each pair once per cell the group recurs in.
    val m1 = withGid.select(col("cell").as("c1"), col("gid").as("g1"), col("id").as("a"))
    val m2 = withGid.select(col("cell").as("c2"), col("gid").as("g2"), col("id").as("b"))
    val cross = cellNearDups(reps, threshold)
      // Barrier: stops Catalyst collapsing the cosine projection above
      // the expansion joins (re-running the dot product per DOC pair
      // and shipping both embeddings with every expanded row).
      .pinned
      .join(m1, col("cell") === col("c1") && col("id1") === col("g1"))
      .join(m2, col("cell") === col("c2") && col("id2") === col("g2"))
      .select(col("cell"), least(col("a"), col("b")).as("id1"), greatest(col("a"), col("b")).as("id2"), col("cosine"))
    val selfCos = reps
      .select(col("cell"), col("id").as("gid"),
        (dot(col("emb"), col("emb")) / (norm(col("emb")) * norm(col("emb")))).as("cosine"))
      .filter(col("cosine") >= threshold)
    val within = selfCos
      .join(m1, col("cell") === col("c1") && col("gid") === col("g1"))
      .join(m2, col("cell") === col("c2") && col("gid") === col("g2") && col("a") < col("b"))
      .select(col("cell"), col("a").as("id1"), col("b").as("id2"), col("cosine"))
    cross.unionByName(within)
  }

  /** SemDeDup (Abbas et al., 2023, arXiv:2303.09540): semantic
    * deduplication — cluster the embedding space coarsely, then inside
    * each cluster drop every document that has an EARLIER (lower-id)
    * in-cluster neighbor at cosine >= `threshold`. The earliest member
    * of each near-duplicate neighborhood survives; the rule is greedy
    * and id-ordered, so it is deterministic without a connected-
    * components pass (a doc is dropped iff ANY earlier in-cell doc is
    * within the threshold, whether or not that doc itself survived —
    * the paper's keep-one-per-group semantics under a fixed ordering).
    *
    * Scale shape: pairs form only inside a cell ([[cellNearDups]] —
    * one co-located self-join on the cell key), and the keep decision
    * is one count aggregation keyed by the later id. At corpus scale
    * the cluster count k grows with the data (SemDeDup sizes k so
    * clusters stay small), so per-cell pair work stays bounded;
    * nothing here is all-pairs across cells.
    *
    * @param df one row per document: (id, emb, cell)
    * @return one row per document: (id, cell, n_dups_earlier, kept) —
    *         `n_dups_earlier` counts in-cell neighbors with a lower id
    *         at cosine >= threshold; `kept` iff that count is zero
    */
  def semDedup(df: DataFrame, threshold: Double, dedupFirst: Boolean = false): DataFrame = {
    val pairs = cellNearDups(df, threshold, dedupFirst)
    // Pairs carry id1 < id2: the later doc (id2) is the one a match
    // condemns. Count per id2, then left-join back so survivors (no
    // pair at all) keep n_dups_earlier = 0.
    val drops = pairs.groupBy(col("id2").as("id")).agg(count(lit(1)).as("_nde"))
    df.select(col("id"), col("cell"))
      .join(drops, Seq("id"), "left_outer")
      .select(
        col("id"),
        col("cell"),
        coalesce(col("_nde"), lit(0L)).as("n_dups_earlier"),
        col("_nde").isNull.as("kept"))
  }
}
