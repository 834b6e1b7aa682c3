package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.tables.Tables
import graft.operators.Pinned.PinOps

/** Similarity search over the `embeddings` table (64-dim float vectors).
  *
  * Dot products are computed with codegen'd higher-order functions
  * (zip_with + aggregate) after widening floats to doubles; the fold is
  * sequential in array order, so results are bit-deterministic and
  * engine-comparable. Brute-force top-k here is the correctness baseline;
  * the LSH-bucketed scale path lives in graft.operators.Similarity.
  */
object Vectors {

  private def emb(s: SparkSession, dir: String): DataFrame = Tables.embeddings(s, dir)

  /** Sequential-fold dot product (codegen'd kernel; bit-identical to
    * the declarative zip_with/aggregate fold the oracle mirrors).
    */
  def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    graft.operators.Similarity.dot(a, b)

  private def asDouble(c: org.apache.spark.sql.Column) = transform(c, _.cast("double"))

  // ---- q40: brute-force cosine top-k --------------------------------------
  // Query set = vec_id < 8; candidates = everything else. One broadcast of
  // the tiny query side, map-side dot products, per-query top-k via window.
  def q40KnnBruteForce(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir).select(col("vec_id"), asDouble(col("embedding")).as("emb"))
    val q = e.filter(col("vec_id") < 8).select(col("vec_id").as("qid"), col("emb").as("qemb"))
    val c = e.select(col("vec_id").as("nid"), col("emb").as("nemb"))
    val pairs = c
      .join(broadcast(q), col("nid") =!= col("qid"))
      .select(
        col("qid"),
        col("nid"),
        (dot(col("qemb"), col("nemb")) /
          (sqrt(dot(col("qemb"), col("qemb"))) * sqrt(dot(col("nemb"), col("nemb"))))).as("cosine")
      )
    val w = Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("nid"))
    pairs
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select("qid", "rank", "nid", "cosine")
      .orderBy("qid", "rank")
  }

  val q40Sql: String =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
      |q AS (SELECT vec_id AS qid, emb AS qemb FROM e WHERE vec_id < 8),
      |pairs AS (
      |  SELECT qid, e.vec_id AS nid,
      |    list_reduce(list_transform(list_zip(qemb, emb), p -> p[1] * p[2]), (a, b) -> a + b)
      |      / (sqrt(list_reduce(list_transform(list_zip(qemb, qemb), p -> p[1] * p[2]), (a, b) -> a + b))
      |       * sqrt(list_reduce(list_transform(list_zip(emb, emb),  p -> p[1] * p[2]), (a, b) -> a + b))) AS cosine
      |  FROM e CROSS JOIN q
      |  WHERE e.vec_id <> qid),
      |ranked AS (
      |  SELECT qid, nid, cosine,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, nid) AS INTEGER) AS rank
      |  FROM pairs)
      |SELECT qid, rank, nid, cosine FROM ranked WHERE rank <= 5
      |ORDER BY qid, rank""".stripMargin

  // ---- q41: vector norms + per-label stats -----------------------------------
  def q41NormStats(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir).select(
      col("vec_id"),
      col("label"),
      sqrt(dot(asDouble(col("embedding")), asDouble(col("embedding")))).as("norm")
    )
    e.groupBy(col("label"))
      .agg(
        count(lit(1)).as("n_vecs"),
        min(col("norm")).as("min_norm"),
        max(col("norm")).as("max_norm")
      )
      .orderBy("label")
  }

  val q41Sql: String =
    """WITH e AS (
      |  SELECT vec_id, label,
      |    sqrt(list_reduce(list_transform(list_zip(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])),
      |         p -> p[1] * p[2]), (a, b) -> a + b)) AS norm
      |  FROM embeddings)
      |SELECT label,
      |  CAST(COUNT(*) AS BIGINT) AS n_vecs,
      |  MIN(norm) AS min_norm,
      |  MAX(norm) AS max_norm
      |FROM e
      |GROUP BY label
      |ORDER BY label""".stripMargin

  // ---- q42: IVF-style cell-restricted ANN ------------------------------------
  // The 100 TB path: instead of a cross join against the whole corpus, both
  // sides carry a coarse cell key (here the label partition) and search is
  // one co-located equi-join within the cell. graft.operators.Similarity
  // provides the same shape with trained/LSH cells.
  def q42AnnIvf(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir).select(
      col("vec_id"),
      col("label").as("cell"),
      graft.operators.Similarity.asDouble(col("embedding")).as("e")
    )
    val q = e.filter(col("vec_id") < 8).select(col("vec_id").as("qid"), col("cell"), col("e").as("qemb"))
    val c = e.select(col("vec_id").as("nid"), col("cell"), col("e").as("nemb"))
    graft.operators.Similarity
      .cellTopK(q, c, k = 3)
      .select("qid", "cell", "rank", "nid", "cosine")
      .orderBy("qid", "rank")
  }

  val q42Sql: String =
    """WITH e AS (SELECT vec_id, label AS cell, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
      |q AS (SELECT vec_id AS qid, cell, emb AS qemb FROM e WHERE vec_id < 8),
      |pairs AS (
      |  SELECT q.cell AS cell, qid, e.vec_id AS nid,
      |    list_reduce(list_prepend(0.0, list_transform(list_zip(qemb, emb), p -> p[1] * p[2])), (a, b) -> a + b)
      |      / (sqrt(list_reduce(list_prepend(0.0, list_transform(list_zip(qemb, qemb), p -> p[1] * p[2])), (a, b) -> a + b))
      |       * sqrt(list_reduce(list_prepend(0.0, list_transform(list_zip(emb, emb),  p -> p[1] * p[2])), (a, b) -> a + b))) AS cosine
      |  FROM e JOIN q ON e.cell = q.cell AND e.vec_id <> qid),
      |ranked AS (
      |  SELECT cell, qid, nid, cosine,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, nid) AS INTEGER) AS rank
      |  FROM pairs)
      |SELECT qid, cell, rank, nid, cosine FROM ranked WHERE rank <= 3
      |ORDER BY qid, rank""".stripMargin

  // ---- q43: sign-LSH bucket assignment -----------------------------------------
  // Random-hyperplane signatures with md5-derived deterministic planes: the
  // scale path for similarity self-join (vectors sharing a bucket are each
  // other's candidate set). 8 planes → 256 buckets.
  def q43SignLsh(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir).select(
      col("vec_id"),
      graft.operators.Similarity.asDouble(col("embedding")).as("e")
    )
    // dims read from the data, matching the oracle's range(0, LEN(emb))
    val dims = graft.operators.Similarity.embeddingDims(e, "e")
    graft.operators.Similarity
      .signLshBuckets(e, idCol = "vec_id", embCol = "e", planes = 8, dims = dims)
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_vecs"), min(col("vec_id")).as("min_vec_id"))
      .orderBy("bucket")
  }

  val q43Sql: String =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
      |sig AS (SELECT vec_id,
      |  CAST(list_reduce(list_prepend(0, list_transform(range(0, 8), j ->
      |    CASE WHEN list_reduce(list_prepend(0.0, list_transform(list_zip(emb, range(0, LEN(emb))), p ->
      |           p[1] * CASE WHEN substr(md5(j || ':' || p[2]), 1, 1) >= '8' THEN 1.0 ELSE -1.0 END)),
      |           (a, x) -> a + x) > 0
      |         THEN 1 << j ELSE 0 END)), (a, x) -> a + x) AS INTEGER) AS bucket
      |  FROM e)
      |SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_vecs, MIN(vec_id) AS min_vec_id
      |FROM sig
      |GROUP BY bucket
      |ORDER BY bucket""".stripMargin

  // ---- q44: embedding-cosine near-duplicates -----------------------------------
  // The dedup-by-embedding primitive: exact cosine pairs >= 0.35 inside
  // label cells (blocked self-join, no O(n²) stage across cells).
  def q44EmbeddingNearDup(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir).select(
      col("vec_id").as("id"),
      col("label").as("cell"),
      graft.operators.Similarity.asDouble(col("embedding")).as("emb")
    )
    graft.operators.Similarity
      // dedupFirst: crawled corpora duplicate embeddings heavily (sf1
      // soak: 2,000 distinct vectors across 20k rows) — pair space
      // shrinks quadratically; output-identical (SimilaritySpec).
      // Adaptive: decided by the measured vector-duplication factor
      // (hashed — HLL over the 64-bit vector hash).
      .cellNearDups(e, threshold = 0.35,
        dedupFirst = graft.operators.TextGroups.adaptiveStaging(e, xxhash64(col("emb"))))
      .select("cell", "id1", "id2", "cosine")
      .orderBy("id1", "id2")
  }

  val q44Sql: String =
    """WITH e AS (SELECT vec_id AS id, label AS cell, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings)
      |SELECT a.cell AS cell, a.id AS id1, b.id AS id2,
      |  list_reduce(list_prepend(0.0, list_transform(list_zip(a.emb, b.emb), p -> p[1] * p[2])), (x, y) -> x + y)
      |    / (sqrt(list_reduce(list_prepend(0.0, list_transform(list_zip(a.emb, a.emb), p -> p[1] * p[2])), (x, y) -> x + y))
      |     * sqrt(list_reduce(list_prepend(0.0, list_transform(list_zip(b.emb, b.emb), p -> p[1] * p[2])), (x, y) -> x + y))) AS cosine
      |FROM e a JOIN e b ON a.cell = b.cell AND a.id < b.id
      |WHERE list_reduce(list_prepend(0.0, list_transform(list_zip(a.emb, b.emb), p -> p[1] * p[2])), (x, y) -> x + y)
      |    / (sqrt(list_reduce(list_prepend(0.0, list_transform(list_zip(a.emb, a.emb), p -> p[1] * p[2])), (x, y) -> x + y))
      |     * sqrt(list_reduce(list_prepend(0.0, list_transform(list_zip(b.emb, b.emb), p -> p[1] * p[2])), (x, y) -> x + y))) >= 0.35
      |ORDER BY id1, id2""".stripMargin

  // ---- q52: IVF with a TRAINED coarse quantizer (k-means) ----------------------
  // q42 blocks on a semantic key; this is the real IVF index build:
  // Lloyd's k-means (deterministic init + decimal-summed means, see
  // graft.operators.KMeans) fits 8 coarse centroids, every vector is
  // assigned to its nearest cell, and search is one co-located equi-join
  // within the query's cell. The fit IS oracle-checkable because it is
  // bit-deterministic by construction: q52Sql unrolls the three Lloyd
  // iterations as plain CTEs (assignment = the same sequential
  // squared-L2 fold with ties to the lowest cell; means = the same
  // 12-decimal-place HALF_UP division, replayed in integer units).
  def q52AnnKmeans(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir).select(
      col("vec_id"),
      graft.operators.Similarity.asDouble(col("embedding")).as("e")
    )
    // dedupVectors: Lloyd iterations run over distinct embeddings
    // weighted by multiplicity — bit-identical centroids (KMeansSpec).
    // Adaptive by the measured vector-duplication factor.
    val centroids = graft.operators.KMeans.fit(e, idCol = "vec_id", embCol = "e", k = 8, iters = 3,
      dedupVectors = graft.operators.TextGroups.adaptiveStaging(e, xxhash64(col("e"))))
    val cells = graft.operators.KMeans.assign(e, "e", centroids)
    val q = cells.filter(col("vec_id") < 8).select(col("vec_id").as("qid"), col("cell"), col("e").as("qemb"))
    val c = cells.select(col("vec_id").as("nid"), col("cell"), col("e").as("nemb"))
    graft.operators.Similarity
      .cellTopK(q, c, k = 3)
      .select("qid", "cell", "rank", "nid", "cosine")
      .orderBy("qid", "rank")
  }

  /** Squared-L2 distance in DuckDB, matching the NearestCellExpr
    * kernel bit-for-bit: fold from 0.0 in dimension order.
    */
  private val sqDistSql =
    "list_reduce(list_prepend(0.0, list_transform(list_zip(emb, cent), " +
      "p -> (p[1] - p[2]) * (p[1] - p[2]))), (a, b) -> a + b)"

  /** One unrolled Lloyd iteration as DuckDB CTEs. The per-(cell, dim)
    * mean replays KMeans.fit's decimal arithmetic exactly: values cast
    * to 12-decimal-place decimals (exact — no double can sit on a
    * 12-dp rounding midpoint, since midpoints have a 5^12 denominator
    * factor no binary fraction carries), summed as integer units in
    * HUGEINT, divided with HALF_UP (away-from-zero) rounding at scale
    * 12 — Spark's decimal(38,12)/bigint result — then converted to
    * double (one correctly-rounded IEEE division; the unit counts stay
    * under 2^53). Cells an iteration leaves empty keep their previous
    * centroid, like the Scala fit loop.
    */
  private def lloydIterSql(i: Int, p: String = "", src: String = "e"): String = {
    val (prev, cur) = (s"${p}cents${i - 1}", s"${p}cents$i")
    s"""${p}cl$i AS (SELECT cell, list(val ORDER BY dim) AS cent FROM $prev GROUP BY cell),
       |${p}asg$i AS (
       |  SELECT vec_id, emb, cell FROM (
       |    SELECT e.vec_id, e.emb, c.cell,
       |      ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY $sqDistSql, c.cell) AS rn
       |    FROM $src e CROSS JOIN ${p}cl$i c)
       |  WHERE rn = 1),
       |${p}x$i AS (SELECT cell, CAST(dim AS INTEGER) AS dim, emb[dim + 1] AS v
       |        FROM (SELECT cell, unnest(range(0, LEN(emb))) AS dim, emb FROM ${p}asg$i)),
       |${p}m$i AS (
       |  SELECT cell, dim,
       |    CAST(CASE WHEN s >= 0 THEN (2 * s + n) // (2 * n)
       |              ELSE -((-2 * s + n) // (2 * n)) END AS DOUBLE) / 1e12 AS val
       |  FROM (SELECT cell, dim,
       |          SUM(CAST(CAST(v AS DECIMAL(18,12)) * 1000000000000 AS HUGEINT)) AS s,
       |          CAST(COUNT(*) AS HUGEINT) AS n
       |        FROM ${p}x$i GROUP BY cell, dim)),
       |$cur AS (
       |  SELECT p.cell, p.dim, COALESCE(m.val, p.val) AS val
       |  FROM $prev p LEFT JOIN ${p}m$i m ON p.cell = m.cell AND p.dim = m.dim)""".stripMargin
  }

  /** The shared trained-quantizer replay prefix (q52/q98): init = the
    * 8 lowest-id vectors, three unrolled Lloyd iterations, final
    * assignment into `cells(vec_id, emb, cell)`.
    */
  private val lloydCellsSql: String =
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
       |init AS (SELECT emb, CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cell
       |         FROM e ORDER BY vec_id LIMIT 8),
       |cents0 AS (SELECT cell, CAST(dim AS INTEGER) AS dim, emb[dim + 1] AS val
       |           FROM (SELECT cell, unnest(range(0, LEN(emb))) AS dim, emb FROM init)),
       |${lloydIterSql(1)},
       |${lloydIterSql(2)},
       |${lloydIterSql(3)},
       |clF AS (SELECT cell, list(val ORDER BY dim) AS cent FROM cents3 GROUP BY cell),
       |cells AS (
       |  SELECT vec_id, emb, cell FROM (
       |    SELECT e.vec_id, e.emb, c.cell,
       |      ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY $sqDistSql, c.cell) AS rn
       |    FROM e CROSS JOIN clF c)
       |  WHERE rn = 1)""".stripMargin

  /** The trained-quantizer replay + q42's within-cell top-k.
    * Deterministic end-to-end, so the driver's hash gate applies to
    * the whole trained index.
    */
  val q52Sql: String =
    s"""$lloydCellsSql,
       |q AS (SELECT vec_id AS qid, cell, emb AS qemb FROM cells WHERE vec_id < 8),
       |pairs AS (
       |  SELECT q.cell AS cell, qid, cells.vec_id AS nid,
       |    list_reduce(list_prepend(0.0, list_transform(list_zip(qemb, emb), p -> p[1] * p[2])), (a, b) -> a + b)
       |      / (sqrt(list_reduce(list_prepend(0.0, list_transform(list_zip(qemb, qemb), p -> p[1] * p[2])), (a, b) -> a + b))
       |       * sqrt(list_reduce(list_prepend(0.0, list_transform(list_zip(emb, emb),  p -> p[1] * p[2])), (a, b) -> a + b))) AS cosine
       |  FROM cells JOIN q ON cells.cell = q.cell AND cells.vec_id <> qid),
       |ranked AS (
       |  SELECT cell, qid, nid, cosine,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, nid) AS INTEGER) AS rank
       |  FROM pairs)
       |SELECT qid, cell, rank, nid, cosine FROM ranked WHERE rank <= 3
       |ORDER BY qid, rank""".stripMargin

  // ---- q125: retrieval-quality evaluation (recall@10 + MRR vs exact truth) ----
  // The eval harness the ANN family needs to be operated: the trained-
  // index run (q52's within-cell cosine ANN, k=10) is scored against
  // the brute-force global truth (the q40 shape, k=10) — per query,
  // recall@10 (|run ∩ truth| / 10, an exact rational) and the
  // reciprocal rank of the first truth member in the run (1/rank,
  // one exact IEEE division; 0.0 when the run misses entirely).
  // This is what "recall gates" look like as a QUERY rather than a
  // spec: the same numbers IvfadcSpec pins in-process, computed
  // relationally and hash-gated in both engines. Scale shape: run and
  // truth are both per-query top-10 tables (|Q|·10 rows), so the eval
  // join is trivially small; truth's corpus scan is the documented
  // q40 brute-force baseline.
  def q125RetrievalEval(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir).select(
      col("vec_id"),
      graft.operators.Similarity.asDouble(col("embedding")).as("e"))
    val centroids = graft.operators.KMeans.fit(e, idCol = "vec_id", embCol = "e", k = 8, iters = 3,
      dedupVectors = graft.operators.TextGroups.adaptiveStaging(e, xxhash64(col("e"))))
    val cells = graft.operators.KMeans.assign(e, "e", centroids)
    val q = cells.filter(col("vec_id") < 8).select(col("vec_id").as("qid"), col("cell"), col("e").as("qemb"))
    val c = cells.select(col("vec_id").as("nid"), col("cell"), col("e").as("nemb"))
    val run = graft.operators.Similarity
      .cellTopK(q, c, k = 10)
      .select(col("qid"), col("rank"), col("nid"))
    val qb = e.filter(col("vec_id") < 8).select(col("vec_id").as("qid"), col("e").as("qemb"))
    // ground truth comes from the OPERATOR the exact queries use
    // (Similarity.bruteForceTopK), not an inline copy — a future
    // tie-break fix there must reach this eval's truth leg
    val truth = graft.operators.Similarity
      .bruteForceTopK(broadcast(qb), e.select(col("vec_id").as("nid"), col("e").as("nemb")), 10)
      .select(col("qid"), col("nid"), lit(1).as("rel"))
    val metrics = run
      .join(truth, Seq("qid", "nid"), "left")
      .groupBy(col("qid"))
      .agg(
        sum(coalesce(col("rel"), lit(0))).cast("long").as("n_hits"),
        min(when(col("rel") === 1, col("rank"))).cast("int").as("first_rel_rank"))
    // every query gets a row — a broken quantizer that strands a query
    // alone in its cell (run empty) must score recall 0.0, not vanish
    qb.select(col("qid"))
      .join(metrics, Seq("qid"), "left")
      .select(
        col("qid"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        (coalesce(col("n_hits"), lit(0L)).cast("double") / lit(10.0)).as("recall_at_10"),
        col("first_rel_rank"),
        coalesce(lit(1.0) / col("first_rel_rank"), lit(0.0)).as("rr"))
      .orderBy("qid")
  }

  val q125Sql: String =
    s"""$lloydCellsSql,
       |q AS (SELECT vec_id AS qid, cell, emb AS qemb FROM cells WHERE vec_id < 8),
       |runp AS (
       |  SELECT qid, cells.vec_id AS nid,
       |    list_reduce(list_prepend(0.0, list_transform(list_zip(qemb, emb), p -> p[1] * p[2])), (a, b) -> a + b)
       |      / (sqrt(list_reduce(list_prepend(0.0, list_transform(list_zip(qemb, qemb), p -> p[1] * p[2])), (a, b) -> a + b))
       |       * sqrt(list_reduce(list_prepend(0.0, list_transform(list_zip(emb, emb),  p -> p[1] * p[2])), (a, b) -> a + b))) AS cosine
       |  FROM cells JOIN q ON cells.cell = q.cell AND cells.vec_id <> qid),
       |run AS (SELECT qid, nid,
       |          CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, nid) AS INTEGER) AS rank
       |        FROM runp QUALIFY rank <= 10),
       |q2 AS (SELECT vec_id AS qid, emb AS qemb FROM e WHERE vec_id < 8),
       |truthp AS (
       |  SELECT qid, e.vec_id AS nid,
       |    list_reduce(list_transform(list_zip(qemb, emb), p -> p[1] * p[2]), (a, b) -> a + b)
       |      / (sqrt(list_reduce(list_transform(list_zip(qemb, qemb), p -> p[1] * p[2]), (a, b) -> a + b))
       |       * sqrt(list_reduce(list_transform(list_zip(emb, emb),  p -> p[1] * p[2]), (a, b) -> a + b))) AS cosine
       |  FROM e CROSS JOIN q2
       |  WHERE e.vec_id <> qid),
       |truth AS (SELECT qid, nid FROM (
       |            SELECT qid, nid,
       |              ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, nid) AS trank
       |            FROM truthp)
       |          WHERE trank <= 10),
       |j AS (SELECT r.qid, r.rank,
       |        CASE WHEN t.nid IS NOT NULL THEN 1 ELSE 0 END AS rel
       |      FROM run r LEFT JOIN truth t ON r.qid = t.qid AND r.nid = t.nid),
       |m AS (SELECT qid,
       |        CAST(SUM(rel) AS BIGINT) AS n_hits,
       |        CAST(MIN(CASE WHEN rel = 1 THEN rank END) AS INTEGER) AS first_rel_rank
       |      FROM j GROUP BY qid)
       |SELECT q2.qid,
       |  COALESCE(n_hits, CAST(0 AS BIGINT)) AS n_hits,
       |  CAST(COALESCE(n_hits, CAST(0 AS BIGINT)) AS DOUBLE) / 10.0 AS recall_at_10,
       |  first_rel_rank,
       |  COALESCE(1.0 / first_rel_rank, 0.0) AS rr
       |FROM q2 LEFT JOIN m ON q2.qid = m.qid
       |ORDER BY q2.qid""".stripMargin

  // ---- q66: per-label embedding centroids (vector aggregation) -------------------
  // Mean vector per label in long form (label, dim, mean): posexplode →
  // partial-agg per (label, dim) — the KMeans iteration's shuffle shape
  // as a standalone query. Values are floor-quantized to micro-units
  // BEFORE summing: BIGINT sums are exact under any partitioning, and
  // floor (unlike decimal rounding) has no tie cases on float-origin
  // doubles, so the result is bit-stable and oracle-comparable.
  def q66LabelCentroids(s: SparkSession, dir: String): DataFrame =
    emb(s, dir)
      .select(col("label"), posexplode(graft.operators.Similarity.asDouble(col("embedding"))).as(Seq("dim", "v")))
      .groupBy(col("label"), col("dim"))
      .agg(
        sum(floor(col("v") * 1000000).cast("long")).as("sum_micro"),
        count(lit(1)).as("n_vecs")
      )
      .select(
        col("label"),
        col("dim"),
        (col("sum_micro").cast("double") / col("n_vecs") / 1e6).as("mean_v"),
        col("n_vecs")
      )
      .orderBy("label", "dim")

  val q66Sql: String =
    """WITH e AS (SELECT label, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
      |x AS (SELECT label, unnest(range(0, LEN(emb))) AS dim, emb FROM e)
      |SELECT label, CAST(dim AS INTEGER) AS dim,
      |  CAST(SUM(CAST(FLOOR(emb[dim + 1] * 1000000) AS BIGINT)) AS DOUBLE) / COUNT(*) / 1e6 AS mean_v,
      |  CAST(COUNT(*) AS BIGINT) AS n_vecs
      |FROM x
      |GROUP BY label, dim
      |ORDER BY label, dim""".stripMargin

  // ---- q76: int8 scalar quantization (vector compression) -------------------------
  // The 100 TB storage lever for embedding tables: per-dimension min/max
  // scaling to 8-bit codes (4× smaller than float32, 8× than float64),
  // plus per-vector reconstruction-error audit. Shape: the per-dim
  // stats table is 64 rows (broadcast), coding is map-side, and the
  // only shuffles are the two aggregates. Cross-engine determinism:
  // min/max need no summing, the code is floor() of an identical IEEE
  // expression on both engines, and the error audit uses MAX (order-
  // independent) — never a double SUM.
  def q76ScalarQuant(s: SparkSession, dir: String): DataFrame = {
    val x = emb(s, dir)
      .select(col("vec_id"), posexplode(asDouble(col("embedding"))).as(Seq("dim", "v")))
    val stats = x.groupBy(col("dim")).agg(min(col("v")).as("mn"), max(col("v")).as("mx"))
    val coded = x
      .join(broadcast(stats), "dim")
      .withColumn(
        "code",
        when(
          col("mx") > col("mn"),
          least(lit(255), floor(((col("v") - col("mn")) * 255) / (col("mx") - col("mn"))))
        ).otherwise(lit(0)).cast("int")
      )
      .withColumn(
        "dequant",
        col("mn") + (col("code").cast("double") + 0.5) * (col("mx") - col("mn")) / 256
      )
    coded
      .groupBy(col("vec_id"))
      .agg(
        sum(col("code")).cast("long").as("code_sum"),
        min(col("code")).as("code_min"),
        max(col("code")).as("code_max"),
        max(abs(col("v") - col("dequant"))).as("max_abs_err")
      )
      .orderBy("vec_id")
  }

  val q76Sql: String =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
      |x AS (SELECT vec_id, CAST(unnest(range(0, LEN(emb))) AS INTEGER) AS dim, emb FROM e),
      |xv AS (SELECT vec_id, dim, emb[dim + 1] AS v FROM x),
      |stats AS (SELECT dim, MIN(v) AS mn, MAX(v) AS mx FROM xv GROUP BY dim),
      |c AS (SELECT vec_id, v, mn, mx,
      |        CASE WHEN mx > mn
      |             THEN LEAST(255, CAST(FLOOR(((v - mn) * 255) / (mx - mn)) AS INTEGER))
      |             ELSE 0 END AS code
      |      FROM xv JOIN stats USING (dim)),
      |d AS (SELECT vec_id, v, code,
      |        mn + (CAST(code AS DOUBLE) + 0.5) * (mx - mn) / 256 AS dequant
      |      FROM c)
      |SELECT vec_id,
      |  CAST(SUM(code) AS BIGINT) AS code_sum,
      |  CAST(MIN(code) AS INTEGER) AS code_min,
      |  CAST(MAX(code) AS INTEGER) AS code_max,
      |  MAX(ABS(v - dequant)) AS max_abs_err
      |FROM d
      |GROUP BY vec_id
      |ORDER BY vec_id""".stripMargin

  // ---- q98: SemDeDup — semantic deduplication over embeddings ---------------------
  // Abbas et al. 2023 (arXiv:2303.09540): cluster the embedding space
  // with the deterministic k-means quantizer (q52's fit — decimal
  // sums, lowest-id init), then inside each cluster drop every vector
  // with an EARLIER in-cluster neighbor at cosine >= 0.35. The whole
  // chain is bit-deterministic, so the trained clustering AND the
  // keep/drop decisions hash-compare against a DuckDB replay (the
  // unrolled Lloyd CTEs q52 established, plus one in-cell pair join).
  // Scale shape: k grows with the corpus so cells stay small; pairs
  // never form across cells; the keep rule is one count aggregation.
  def q98SemDedup(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir).select(
      col("vec_id"),
      graft.operators.Similarity.asDouble(col("embedding")).as("e")
    )
    val adaptive = graft.operators.TextGroups.adaptiveStaging(e, xxhash64(col("e")))
    val centroids = graft.operators.KMeans.fit(e, idCol = "vec_id", embCol = "e", k = 8, iters = 3,
      dedupVectors = adaptive)
    val cells = graft.operators.KMeans
      .assign(e, "e", centroids)
      .select(col("vec_id").as("id"), col("e").as("emb"), col("cell"))
    graft.operators.Similarity
      .semDedup(cells, threshold = 0.35, dedupFirst = adaptive)
      .select(col("id").as("vec_id"), col("cell"), col("n_dups_earlier"), col("kept"))
      .orderBy("vec_id")
  }

  /** Cosine between two `cells` rows in DuckDB — the exact q44Sql
    * form (sequential fold from 0.0; norms via the same long-form
    * sqrt(dot) the Spark kernel computes).
    */
  private def cosSql(a: String, b: String): String =
    s"""list_reduce(list_prepend(0.0, list_transform(list_zip($a.emb, $b.emb), p -> p[1] * p[2])), (x, y) -> x + y)
       |    / (sqrt(list_reduce(list_prepend(0.0, list_transform(list_zip($a.emb, $a.emb), p -> p[1] * p[2])), (x, y) -> x + y))
       |     * sqrt(list_reduce(list_prepend(0.0, list_transform(list_zip($b.emb, $b.emb), p -> p[1] * p[2])), (x, y) -> x + y)))""".stripMargin

  val q98Sql: String =
    s"""$lloydCellsSql,
       |p AS (
       |  SELECT b.vec_id AS vid
       |  FROM cells a JOIN cells b ON a.cell = b.cell AND a.vec_id < b.vec_id
       |  WHERE ${cosSql("a", "b")} >= 0.35),
       |drops AS (SELECT vid, CAST(COUNT(*) AS BIGINT) AS nde FROM p GROUP BY vid)
       |SELECT c.vec_id, c.cell,
       |  COALESCE(d.nde, 0) AS n_dups_earlier,
       |  d.vid IS NULL AS kept
       |FROM cells c LEFT JOIN drops d ON c.vec_id = d.vid
       |ORDER BY vec_id""".stripMargin

  // ---- q100: product quantization (PQ codebooks + codes) --------------------------
  // Jegou et al. 2011: split 64-dim embeddings into 4 subspaces of 16
  // dims, fit a small deterministic k-means codebook per subspace
  // (k=4, 2 Lloyd iterations — decimal sums, lowest-id init), and emit
  // every vector's per-subspace code with its reconstruction error.
  // The whole index build is bit-deterministic, so codes AND sq_err
  // doubles hash-compare against a DuckDB replay that unrolls the
  // Lloyd chain once per subspace. 4 codes x 2 bits here; production
  // PQ (m=8..64, k=256) is the same plan with bigger literals.
  def q100ProductQuant(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir).select(
      col("vec_id"),
      graft.operators.Similarity.asDouble(col("embedding")).as("e")
    )
    val dims = graft.operators.Similarity.embeddingDims(e, "e")
    val cbs = graft.operators.ProductQuant.fitCodebooks(
      e, idCol = "vec_id", embCol = "e", dims = dims, m = 4, k = 4, iters = 2,
      // full-vector duplication implies subspace duplication; the
      // weighted fit is output-identical either way (KMeansSpec)
      dedupVectors = graft.operators.TextGroups.adaptiveStaging(e, xxhash64(col("e"))))
    graft.operators.ProductQuant
      .encode(e, idCol = "vec_id", embCol = "e", codebooks = cbs)
      .select(col("id").as("vec_id"), col("sub"), col("code"), col("sq_err"))
      .orderBy("vec_id", "sub")
  }

  /** One subspace's Lloyd chain + assignment, CTE-name-prefixed so
    * four of them coexist in one WITH. The assignment keeps the
    * winning squared-L2 distance — the same sequential fold the
    * encoder re-computes as `sq_err`.
    */
  private def pqChainSql(s: Int, subDims: Int, k: Int, iters: Int,
      src: String = "e", prefix: String = "s"): String = {
    val p = s"$prefix$s"
    val lo = s * subDims + 1
    val hi = (s + 1) * subDims
    val iterCtes = (1 to iters).map(i => lloydIterSql(i, p, s"${p}e")).mkString(",\n")
    s"""${p}e AS (SELECT vec_id, emb[$lo:$hi] AS emb FROM $src),
       |${p}init AS (SELECT emb, CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cell
       |         FROM ${p}e ORDER BY vec_id LIMIT $k),
       |${p}cents0 AS (SELECT cell, CAST(dim AS INTEGER) AS dim, emb[dim + 1] AS val
       |           FROM (SELECT cell, unnest(range(0, LEN(emb))) AS dim, emb FROM ${p}init)),
       |$iterCtes,
       |${p}clF AS (SELECT cell, list(val ORDER BY dim) AS cent FROM ${p}cents$iters GROUP BY cell),
       |${p}out AS (
       |  SELECT vec_id, $s AS sub, cell AS code, dist AS sq_err FROM (
       |    SELECT e.vec_id, c.cell, $sqDistSql AS dist,
       |      ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY $sqDistSql, c.cell) AS rn
       |    FROM ${p}e e CROSS JOIN ${p}clF c)
       |  WHERE rn = 1)""".stripMargin
  }

  val q100Sql: String = {
    val chains = (0 until 4).map(s => pqChainSql(s, subDims = 16, k = 4, iters = 2)).mkString(",\n")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
       |$chains
       |SELECT vec_id, CAST(sub AS INTEGER) AS sub, CAST(code AS INTEGER) AS code, sq_err
       |FROM (SELECT * FROM s0out UNION ALL SELECT * FROM s1out
       |      UNION ALL SELECT * FROM s2out UNION ALL SELECT * FROM s3out)
       |ORDER BY vec_id, sub""".stripMargin
  }

  // ---- q101: PQ-ADC approximate nearest neighbors ---------------------------------
  // The search half of q100 (Jegou et al. 2011 §IV): queries never read
  // corpus embeddings — each query precomputes an m x k distance table
  // to the codebooks and every encoded vector's approximate distance is
  // m table lookups summed in fixed subspace order. Deterministic
  // end-to-end (driver-built tables use the same sequential fold the
  // oracle replays; the sum is explicitly parenthesized, never a
  // partition-ordered SUM()), so the full ranking hash-compares.
  def q101PqAdc(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir).select(
      col("vec_id"),
      graft.operators.Similarity.asDouble(col("embedding")).as("e")
    )
    val dims = graft.operators.Similarity.embeddingDims(e, "e")
    val cbs = graft.operators.ProductQuant.fitCodebooks(
      e, idCol = "vec_id", embCol = "e", dims = dims, m = 4, k = 4, iters = 2,
      dedupVectors = graft.operators.TextGroups.adaptiveStaging(e, xxhash64(col("e"))))
    val enc = graft.operators.ProductQuant
      .encode(e, idCol = "vec_id", embCol = "e", codebooks = cbs)
      .select(col("id"), col("sub"), col("code"))
    val queries = e
      .filter(col("vec_id") < 8)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toSeq))
      .sortBy(_._1)
      .toSeq
    graft.operators.ProductQuant
      .adcTopK(queries, enc, cbs, k = 5)
      .orderBy("qid", "rank")
  }

  val q101Sql: String = {
    val chains = (0 until 4).map(s => pqChainSql(s, subDims = 16, k = 4, iters = 2)).mkString(",\n")
    val sliceDist =
      "list_reduce(list_prepend(0.0, list_transform(list_zip(emb[(sub*16+1):(sub*16+16)], cent), " +
        "p -> (p[1] - p[2]) * (p[1] - p[2]))), (a, b) -> a + b)"
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
       |$chains,
       |qv AS (SELECT vec_id AS qid, emb FROM e WHERE vec_id < 8),
       |cb AS (SELECT 0 AS sub, cell AS code, cent FROM s0clF
       |       UNION ALL SELECT 1, cell, cent FROM s1clF
       |       UNION ALL SELECT 2, cell, cent FROM s2clF
       |       UNION ALL SELECT 3, cell, cent FROM s3clF),
       |td AS (SELECT qid, sub, code, $sliceDist AS d FROM qv CROSS JOIN cb),
       |codes AS (SELECT vec_id AS nid, sub, code FROM
       |  (SELECT vec_id, sub, code FROM s0out UNION ALL SELECT vec_id, sub, code FROM s1out
       |   UNION ALL SELECT vec_id, sub, code FROM s2out UNION ALL SELECT vec_id, sub, code FROM s3out)),
       |pairs AS (SELECT qid, nid,
       |    MAX(CASE WHEN sub = 0 THEN d END) AS d0,
       |    MAX(CASE WHEN sub = 1 THEN d END) AS d1,
       |    MAX(CASE WHEN sub = 2 THEN d END) AS d2,
       |    MAX(CASE WHEN sub = 3 THEN d END) AS d3
       |  FROM codes JOIN td USING (sub, code)
       |  GROUP BY qid, nid),
       |dist AS (SELECT qid, nid, ((((0.0 + d0) + d1) + d2) + d3) AS adc_dist
       |         FROM pairs WHERE qid <> nid),
       |ranked AS (
       |  SELECT qid, nid, adc_dist,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY adc_dist, nid) AS INTEGER) AS rank
       |  FROM dist)
       |SELECT qid, rank, nid, adc_dist FROM ranked WHERE rank <= 5
       |ORDER BY qid, rank""".stripMargin
  }

  // ---- q102: IVFADC — the full PQ index (coarse cells + residual PQ + probed ADC) --
  // Jegou et al. 2011 §V: the production ANN index. Vectors assign to a
  // trained coarse cell (q52's fit), the RESIDUAL to the cell centroid
  // is product-quantized (q100's fit over residuals), and a query
  // searches only its nprobe=2 nearest cells — per probed cell it
  // builds an m x k ADC table against the query's own residual, so
  // distance is m lookups per candidate and corpus embeddings are
  // never read at search time. Every stage is bit-deterministic
  // (elementwise residual subtraction, decimal fits, fixed-order
  // sums), so the full probed ranking hash-compares against a DuckDB
  // replay of the whole index build.
  /** The q102 index (coarse 8×3 Lloyd, m=4, pqK=4×2 over residuals)
    * plus its q40-style 8-query contract set. The fit parameters are
    * MIRRORED literally by [[ivfadcRankedSql]]'s unrolled replay —
    * q102 and q130 both build through THIS helper so a parameter tune
    * can never drift the Spark side away from the shared oracle.
    */
  /** The 8-query contract set (vec_id < 8) as driver tuples — shared
    * by the fit-inclusive queries and the serving-path entry points.
    */
  private def contractQueries(s: SparkSession, dir: String): Seq[(Long, Seq[Double])] =
    emb(s, dir)
      .select(col("vec_id"), graft.operators.Similarity.asDouble(col("embedding")).as("e"))
      .filter(col("vec_id") < 8)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toSeq))
      .sortBy(_._1)
      .toSeq

  private def q102IndexAndQueries(
      s: SparkSession,
      dir: String): (graft.operators.Ivfadc.Index, Seq[(Long, Seq[Double])]) = {
    val e = emb(s, dir).select(
      col("vec_id"),
      graft.operators.Similarity.asDouble(col("embedding")).as("e")
    )
    // the whole index + probed-search pipeline lives in operators.Ivfadc
    // (fit: coarse cells -> localCheckpoint'd residuals -> per-subspace
    // PQ; search: driver tables for the 8-query contract — searchDf is
    // the many-query form). The operator keeps the exact arithmetic
    // this query always had (hash-invariant refactor lineage).
    val idx = graft.operators.Ivfadc.fit(
      e, idCol = "vec_id", embCol = "e",
      coarseK = 8, coarseIters = 3, m = 4, pqK = 4, pqIters = 2)
    (idx, contractQueries(s, dir))
  }

  def q102Ivfadc(s: SparkSession, dir: String): DataFrame = {
    val (idx, qs) = q102IndexAndQueries(s, dir)
    graft.operators.Ivfadc.search(idx, qs, nprobe = 2, k = 5).orderBy("qid", "rank")
  }

  /** The full IVFADC replay through the probed ADC `ranked` CTE —
    * shared by q102 (rank ≤ 5 contract) and q130 (rank ≤ mmrPool
    * shortlist for the MMR re-rank).
    */
  private val ivfadcRankedSql: String = {
    val resChains = (0 until 4)
      .map(x => pqChainSql(x, subDims = 16, k = 4, iters = 2, src = "res", prefix = "r"))
      .mkString(",\n")
    val sliceDist =
      "list_reduce(list_prepend(0.0, list_transform(list_zip(emb[(sub*16+1):(sub*16+16)], cent), " +
        "p -> (p[1] - p[2]) * (p[1] - p[2]))), (a, b) -> a + b)"
    s"""$lloydCellsSql,
       |res AS (SELECT c.vec_id, list_transform(list_zip(c.emb, f.cent), p -> p[1] - p[2]) AS emb, c.cell
       |        FROM cells c JOIN clF f ON c.cell = f.cell),
       |$resChains,
       |probes AS (
       |  SELECT qid, cell, cent FROM (
       |    SELECT e.vec_id AS qid, c.cell, c.cent,
       |      ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY $sqDistSql, c.cell) AS rn
       |    FROM e CROSS JOIN clF c
       |    WHERE e.vec_id < 8)
       |  WHERE rn <= 2),
       |qres AS (SELECT p.qid, p.cell, list_transform(list_zip(e.emb, p.cent), x -> x[1] - x[2]) AS emb
       |         FROM probes p JOIN e ON e.vec_id = p.qid),
       |rcb AS (SELECT 0 AS sub, cell AS code, cent FROM r0clF
       |        UNION ALL SELECT 1, cell, cent FROM r1clF
       |        UNION ALL SELECT 2, cell, cent FROM r2clF
       |        UNION ALL SELECT 3, cell, cent FROM r3clF),
       |td AS (SELECT qid, qres.cell AS cell, sub, code, $sliceDist AS d FROM qres CROSS JOIN rcb),
       |rcodes AS (SELECT vec_id AS nid, sub, code FROM
       |  (SELECT vec_id, sub, code FROM r0out UNION ALL SELECT vec_id, sub, code FROM r1out
       |   UNION ALL SELECT vec_id, sub, code FROM r2out UNION ALL SELECT vec_id, sub, code FROM r3out)),
       |withcell AS (SELECT rcodes.nid, cells.cell, sub, code
       |             FROM rcodes JOIN cells ON rcodes.nid = cells.vec_id),
       |pairs AS (SELECT qid, nid, cell,
       |    MAX(CASE WHEN sub = 0 THEN d END) AS d0,
       |    MAX(CASE WHEN sub = 1 THEN d END) AS d1,
       |    MAX(CASE WHEN sub = 2 THEN d END) AS d2,
       |    MAX(CASE WHEN sub = 3 THEN d END) AS d3
       |  FROM withcell JOIN td USING (cell, sub, code)
       |  GROUP BY qid, nid, cell),
       |adist AS (SELECT qid, nid, cell, ((((0.0 + d0) + d1) + d2) + d3) AS adc_dist
       |          FROM pairs WHERE qid <> nid),
       |ranked AS (
       |  SELECT qid, nid, cell, adc_dist,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY adc_dist, nid) AS INTEGER) AS rank
       |  FROM adist)""".stripMargin
  }

  val q102Sql: String =
    s"""$ivfadcRankedSql
       |SELECT qid, rank, nid, cell, adc_dist FROM ranked WHERE rank <= 5
       |ORDER BY qid, rank""".stripMargin

  // ---- q107: hard-negative / hard-positive mining (contrastive training) -------
  // The standard contrastive-pair miner over a labeled embedding
  // corpus: for each query, the NEAREST different-label vectors (hard
  // negatives) and the FARTHEST same-label vectors (hard positives),
  // searched only in the query's nprobe=2 trained coarse cells — the
  // q52/q102 recall/work dial applied to pair mining, so candidate
  // work scales with nprobe/k of the corpus and never pairs across
  // cells. Distances are the same sequential squared-L2 fold the
  // quantizer uses, so the full mined set hash-matches the DuckDB
  // replay of the trained index. A candidate appears once even under
  // multi-probe: candidates come from their single assigned cell.
  def q107HardMining(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir).select(
      col("vec_id"),
      graft.operators.Similarity.asDouble(col("embedding")).as("e"),
      col("label"))
    val eFit = e.select(col("vec_id"), col("e"))
    val centroids = graft.operators.KMeans.fit(eFit, idCol = "vec_id", embCol = "e", k = 8,
      iters = 3, dedupVectors = graft.operators.TextGroups.adaptiveStaging(eFit, xxhash64(col("e"))))
    val cells = graft.operators.KMeans.assign(e, "e", centroids)
    val q = graft.operators.KMeans
      .assignProbes(e.filter(col("vec_id") < 8), "e", centroids, nprobe = 2)
      .select(col("vec_id").as("qid"), col("label").as("qlabel"), col("e").as("qemb"), col("cell"))
    val c = cells.select(
      col("vec_id").as("nid"),
      col("label").as("nlabel"),
      col("e").as("nemb"),
      col("cell"))
    val d = q
      .join(c, "cell")
      .filter(col("qid") =!= col("nid"))
      .select(
        col("qid"),
        col("qlabel"),
        col("nid"),
        col("nlabel"),
        aggregate(
          zip_with(col("qemb"), col("nemb"), (a, b) => (a - b) * (a - b)),
          lit(0.0),
          (acc, v) => acc + v).as("dist"))
    val wNeg = Window.partitionBy(col("qid")).orderBy(col("dist"), col("nid"))
    val wPos = Window.partitionBy(col("qid")).orderBy(col("dist").desc, col("nid"))
    val neg = d
      .filter(col("nlabel") =!= col("qlabel"))
      .withColumn("kind", lit("hard_neg"))
      .withColumn("rank", row_number().over(wNeg))
    val pos = d
      .filter(col("nlabel") === col("qlabel"))
      .withColumn("kind", lit("hard_pos"))
      .withColumn("rank", row_number().over(wPos))
    neg
      .unionByName(pos)
      .filter(col("rank") <= 5)
      .select(col("qid"), col("kind"), col("rank"), col("nid"), col("nlabel"), col("dist"))
      .orderBy("qid", "kind", "rank")
  }

  val q107Sql: String = {
    val pairDist =
      "list_reduce(list_prepend(0.0, list_transform(list_zip(qemb, nemb), " +
        "p -> (p[1] - p[2]) * (p[1] - p[2]))), (a, b) -> a + b)"
    s"""$lloydCellsSql,
       |lab AS (SELECT vec_id, label FROM embeddings),
       |probes AS (
       |  SELECT qid, cell, qemb, qlabel FROM (
       |    SELECT e.vec_id AS qid, c.cell, e.emb AS qemb, l.label AS qlabel,
       |      ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY $sqDistSql, c.cell) AS rn
       |    FROM e JOIN lab l ON e.vec_id = l.vec_id CROSS JOIN clF c
       |    WHERE e.vec_id < 8)
       |  WHERE rn <= 2),
       |d AS (SELECT p.qid, p.qlabel, cl.vec_id AS nid, l2.label AS nlabel,
       |        $pairDist AS dist
       |      FROM (SELECT qid, qlabel, qemb, cell FROM probes) p
       |      JOIN (SELECT vec_id, emb AS nemb, cell FROM cells) cl
       |        ON cl.cell = p.cell AND cl.vec_id <> p.qid
       |      JOIN lab l2 ON cl.vec_id = l2.vec_id),
       |neg AS (SELECT qid, 'hard_neg' AS kind,
       |          CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY dist, nid) AS INTEGER) AS rank,
       |          nid, nlabel, dist
       |        FROM d WHERE nlabel <> qlabel),
       |pos AS (SELECT qid, 'hard_pos' AS kind,
       |          CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY dist DESC, nid) AS INTEGER) AS rank,
       |          nid, nlabel, dist
       |        FROM d WHERE nlabel = qlabel)
       |SELECT qid, kind, rank, nid, nlabel, dist
       |FROM (SELECT * FROM neg WHERE rank <= 5 UNION ALL SELECT * FROM pos WHERE rank <= 5)
       |ORDER BY qid, kind, rank""".stripMargin
  }

  // ---- q116: Johnson-Lindenstrauss random projection -------------------------
  // Project the 64-dim embeddings to k=8 with the deterministic ±1
  // matrix (operators.RandomProjection), then measure the distance
  // distortion on sampled pairs (vec v paired with v+50 by an
  // EQUI-join on a computed key — no cartesian). Everything is fixed-
  // slot-order IEEE arithmetic on identical operands, so the
  // projected values, both squared distances, and the ratio hash-gate
  // exactly; the oracle embeds the same sign literals.
  private val jlD = 64
  private val jlK = 8

  def q116RandomProjection(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.RandomProjection
    val projected = emb(s, dir)
      .filter(col("vec_id") % 50 === 0)
      .select(
        col("vec_id"),
        col("embedding"),
        RandomProjection.project(col("embedding"), jlD, jlK).as("proj"))
    val a = projected.select(
      col("vec_id").as("id1"),
      col("embedding").as("e1"),
      col("proj").as("p1"))
    val b = projected.select(
      (col("vec_id") - 50).as("id1"),
      col("vec_id").as("id2"),
      col("embedding").as("e2"),
      col("proj").as("p2"))
    // HOF folds, not jlD-term unrolled trees — same op sequence per
    // element ((a−b)·(a−b) added in ascending order from 0.0), so the
    // distances are bit-identical, but the plan is a handful of nodes
    // instead of ~150 per distance: q116's wall clock was ~80% driver
    // gap (optimize+codegen of the unrolled trees), not execution.
    val dOrig = aggregate(
      zip_with(
        col("e1"),
        col("e2"),
        (a, b) => (a.cast("double") - b.cast("double")) * (a.cast("double") - b.cast("double"))),
      lit(0.0),
      (acc, x) => acc + x)
    val dProj = aggregate(
      zip_with(col("p1"), col("p2"), (a, b) => (a - b) * (a - b)),
      lit(0.0),
      (acc, x) => acc + x)
    a.join(b, "id1")
      .withColumn("d_orig_sq", dOrig)
      .withColumn("d_proj_sq", dProj)
      .select(
        col("id1"),
        col("id2"),
        col("d_orig_sq"),
        col("d_proj_sq"),
        (col("d_proj_sq") / col("d_orig_sq")).as("ratio"),
        (col("d_proj_sq") / col("d_orig_sq") >= 0.2 &&
          col("d_proj_sq") / col("d_orig_sq") <= 5.0).as("coarse_ok"))
      .orderBy("id1")
  }

  val q116Sql: String = {
    import graft.operators.RandomProjection
    def projExpr(e: String, j: Int) = {
      val fold = (0 until jlD).foldLeft("0.0") { (acc, i) =>
        s"($acc + CAST($e[${i + 1}] AS DOUBLE) * ${RandomProjection.sign(i, j).toDouble})"
      }
      s"($fold / sqrt(${jlK.toDouble}))"
    }
    val projList = (j: String) => (0 until jlK).map(jj => projExpr(j, jj)).mkString(", ")
    val dOrig = (0 until jlD).foldLeft("0.0") { (acc, i) =>
      s"($acc + (CAST(e1[${i + 1}] AS DOUBLE) - CAST(e2[${i + 1}] AS DOUBLE)) * " +
        s"(CAST(e1[${i + 1}] AS DOUBLE) - CAST(e2[${i + 1}] AS DOUBLE)))"
    }
    val dProj = (0 until jlK).foldLeft("0.0") { (acc, j) =>
      s"($acc + (p1[${j + 1}] - p2[${j + 1}]) * (p1[${j + 1}] - p2[${j + 1}]))"
    }
    s"""WITH sampled AS (SELECT vec_id, embedding,
       |         [${projList("embedding")}] AS proj
       |       FROM embeddings WHERE vec_id % 50 = 0),
       |a AS (SELECT vec_id AS id1, embedding AS e1, proj AS p1 FROM sampled),
       |b AS (SELECT vec_id - 50 AS id1, vec_id AS id2, embedding AS e2, proj AS p2 FROM sampled),
       |j AS (SELECT id1, id2, e1, e2, p1, p2 FROM a JOIN b USING (id1)),
       |m AS (SELECT id1, id2, $dOrig AS d_orig_sq, $dProj AS d_proj_sq FROM j)
       |SELECT id1, id2, d_orig_sq, d_proj_sq,
       |  d_proj_sq / d_orig_sq AS ratio,
       |  (d_proj_sq / d_orig_sq >= 0.2 AND d_proj_sq / d_orig_sq <= 5.0) AS coarse_ok
       |FROM m
       |ORDER BY id1""".stripMargin
  }

  // ---- q117: hybrid retrieval — BM25 ⊕ dense cosine via RRF ------------------
  // The modern retrieval stack: each query has a sparse side (BM25
  // terms over documents, the q104 operator at k=20) and a dense side
  // (cosine of a query embedding against the corpus, the q40 shape),
  // fused by reciprocal-rank fusion rrf = Σ 1/(60 + rank) — the
  // published parameter-free fusion (Cormack et al. 2009). Ranks are
  // integers, each RRF term is one IEEE division, and the two-term sum
  // is in literal order, so the fused scores hash-gate exactly. The
  // dense side's 3-row query broadcast is the documented q40
  // brute-force baseline; its scale path is q102's IVFADC.
  private val hybridQueries: Seq[(Int, Seq[String], Long)] = Seq(
    (1, Seq("batch", "scan"), 100L),
    (2, Seq("customer", "stream"), 200L),
    (3, Seq("vector", "join"), 300L))

  def q117HybridRrf(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val k = 20
    val sparse = graft.operators.Bm25
      .topK(
        Tables.documents(s, dir),
        "doc_id",
        col("text"),
        hybridQueries.map(q => (q._1, q._2)),
        k = k)
      .select(col("qid"), col("doc_id"), col("rank").as("rank_sparse"))
    val qv = broadcast(
      hybridQueries
        .map(q => (q._1, q._3))
        .toDF("qid", "qvid")
        .join(emb(s, dir).select(col("vec_id").as("qvid"), col("embedding").as("qe")), "qvid")
        .select(col("qid"), col("qe")))
    // HOF dot (the Similarity.dot posture) instead of a jlD-term
    // unrolled tree: three of these per dense-leg row made the plan's
    // optimize+codegen the query's biggest single cost (profiled
    // ~0.9 s driver gap at sf0.1). Same per-element casts and the same
    // ascending-order add from 0.0 — values bit-identical.
    def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(
        zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0),
        (acc, x) => acc + x)
    val wD = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid"))
      .orderBy(col("sim").desc, col("doc_id"))
    val dense = emb(s, dir)
      .select(col("vec_id").as("doc_id"), col("embedding").as("e"))
      .crossJoin(qv)
      .withColumn("sim", dot(col("qe"), col("e")) / (sqrt(dot(col("qe"), col("qe"))) * sqrt(dot(col("e"), col("e")))))
      .withColumn("rank_dense", row_number().over(wD))
      .filter(col("rank_dense") <= k)
      .select(col("qid"), col("doc_id"), col("rank_dense"))
    // the fusion arithmetic lives in HybridRetrieval.fuseRrf (shared
    // with q120's scale form — identical expression tree, so the
    // refactor is hash-invariant)
    graft.operators.HybridRetrieval
      .fuseRrf(sparse, dense, k = 10)
      .select(col("qid"), col("rank"), col("doc_id"), col("rrf"))
      .orderBy("qid", "rank")
  }

  /** Slot-ordered per-(qid, doc) BM25 sum over the pivoted s0..s_{m-1}
    * slots — shared by q117's sparse leg and q131's pair feature.
    */
  private val hybridScoreExpr: String = {
    val maxTerms = hybridQueries.map(_._2.size).max
    (0 until maxTerms).foldLeft("0.0") { (acc, i) => s"($acc + COALESCE(s$i, 0.0))" }
  }

  private def hybridDotSql(a: String, b: String): String =
    (0 until jlD).foldLeft("0.0") { (acc, i) =>
      s"($acc + CAST($a[${i + 1}] AS DOUBLE) * CAST($b[${i + 1}] AS DOUBLE))"
    }

  /** The hybrid-retrieval CTE chain through `fused` — q117's whole
    * oracle body, shared verbatim with q131 (which re-scores the
    * fused shortlist) so the two can never drift. `per` (pair BM25
    * slots) and `dense0` (pair cosines) are MATERIALIZED: q131
    * references each twice (ranking leg + feature leg).
    */
  private val hybridFusedSql: String = {
    val qtRows = hybridQueries
      .flatMap { case (qid, ts, _) => ts.zipWithIndex.map { case (t, i) => s"($qid,$i,'$t')" } }
      .mkString(",")
    val allTerms = hybridQueries.flatMap(_._2).distinct.map("'" + _ + "'").mkString(",")
    val qvRows = hybridQueries.map(q => s"(${q._1},${q._3})").mkString(",")
    val maxTerms = hybridQueries.map(_._2.size).max
    val slotCols = (0 until maxTerms)
      .map(i => s"MAX(CASE WHEN slot = $i THEN s END) AS s$i")
      .mkString(", ")
    s"""t AS (SELECT doc_id, regexp_split_to_array(TRIM(LOWER(text)), '\\s+') AS toks
       |           FROM documents),
       |base AS (SELECT doc_id, toks, LEN(toks) AS dl FROM t),
       |stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs, CAST(SUM(dl) AS BIGINT) AS sum_dl
       |          FROM base),
       |tf AS (SELECT doc_id, dl, term, CAST(COUNT(*) AS BIGINT) AS tf
       |       FROM (SELECT doc_id, dl, unnest(list_filter(toks, w -> w IN ($allTerms))) AS term
       |             FROM base)
       |       GROUP BY doc_id, dl, term),
       |wdf AS (SELECT doc_id, dl, term, tf,
       |          CAST(COUNT(*) OVER (PARTITION BY term) AS BIGINT) AS df
       |        FROM tf),
       |sc AS (SELECT doc_id, term,
       |         ((CAST(n_docs AS DOUBLE) - df + 0.5) / (CAST(df AS DOUBLE) + 0.5)) *
       |         ((CAST(tf AS DOUBLE) * (1.2 + 1.0)) /
       |          (CAST(tf AS DOUBLE) +
       |           1.2 * (1.0 - 0.75 + (0.75 * CAST(dl AS DOUBLE))
       |                  / (CAST(sum_dl AS DOUBLE) / n_docs)))) AS s
       |       FROM wdf CROSS JOIN stats),
       |qt(qid, slot, term) AS (VALUES $qtRows),
       |per AS MATERIALIZED (SELECT qid, doc_id, $slotCols
       |        FROM sc JOIN qt USING (term) GROUP BY qid, doc_id),
       |sparse AS (SELECT qid, doc_id,
       |             CAST(ROW_NUMBER() OVER (PARTITION BY qid
       |               ORDER BY $hybridScoreExpr DESC, doc_id) AS INTEGER) AS rank_sparse
       |           FROM per QUALIFY rank_sparse <= 20),
       |qv AS (SELECT qid, embedding AS qe
       |       FROM (VALUES $qvRows) q(qid, qvid)
       |       JOIN embeddings ON vec_id = qvid),
       |dense0 AS MATERIALIZED (SELECT qid, vec_id AS doc_id,
       |             ${hybridDotSql("qe", "embedding")} /
       |             (sqrt(${hybridDotSql("qe", "qe")}) * sqrt(${hybridDotSql("embedding", "embedding")})) AS sim
       |           FROM embeddings CROSS JOIN qv),
       |dense AS (SELECT qid, doc_id,
       |            CAST(ROW_NUMBER() OVER (PARTITION BY qid
       |              ORDER BY sim DESC, doc_id) AS INTEGER) AS rank_dense
       |          FROM dense0 QUALIFY rank_dense <= 20),
       |fused AS (SELECT COALESCE(s.qid, d.qid) AS qid,
       |            COALESCE(s.doc_id, d.doc_id) AS doc_id,
       |            (COALESCE(1.0 / (60.0 + rank_sparse), 0.0) +
       |             COALESCE(1.0 / (60.0 + rank_dense), 0.0)) AS rrf
       |          FROM sparse s FULL OUTER JOIN dense d
       |            ON s.qid = d.qid AND s.doc_id = d.doc_id)""".stripMargin
  }

  val q117Sql: String =
    s"""WITH $hybridFusedSql
       |SELECT CAST(qid AS INTEGER) AS qid,
       |  CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY rrf DESC, doc_id) AS INTEGER) AS rank,
       |  doc_id, rrf
       |FROM fused
       |QUALIFY rank <= 10
       |ORDER BY qid, rank""".stripMargin

  // ---- q118: top principal component via power iteration ---------------------
  // Distributed PCA the deterministic way: the covariance matrix is
  // computed EXACTLY over milli-unit-quantized vectors (x̂ = ⌊v·1e3⌋,
  // the q66 fixed-point pattern) — C′_ij = n·Σx̂ᵢx̂ⱼ − Σx̂ᵢ·Σx̂ⱼ in
  // exact integer arithmetic, over the UPPER TRIANGLE only (C is
  // symmetric, halving the explode) with plain LONG sums: |x̂ᵢx̂ⱼ| ≤
  // 10⁶ keeps Σx̂ᵢx̂ⱼ exact in a long until n ≈ 9·10¹² rows (DuckDB
  // mirrors in HUGEINT — equal integers either way), so the matrix is
  // bit-identical in both engines before a single float op. The unit
  // is MILLI (not micro) deliberately: with |v| < 1 and n ≤ ~10⁵
  // every C′ entry stays below 2^53, so the integer→double cast is
  // EXACT everywhere — at micro-units the sf1 entries passed 2^53 and
  // DuckDB's HUGEINT→DOUBLE double-rounds the last ULP where
  // BigDecimal rounds correctly, a real cross-engine divergence the
  // soak caught. (Larger corpora shrink the unit or pre-divide n out —
  // the quantization is part of the operator contract either way;
  // past ~9·10¹² rows the long sums would need the decimal form this
  // replaced.) Power iteration (6 steps,
  // all-ones init) then runs on the d×d matrix — 4096 doubles, the
  // q52 bounded-collect contract — with every dot product and norm
  // folded in ascending-index order, mirrored exactly by the oracle's
  // list_reduce chains, so loadings and the Rayleigh eigenvalue
  // hash-gate bit-for-bit. The heavy half (the d²/2 covariance sums)
  // is one explode + one triangle-cell aggregation — fully
  // distributed; the d×d iteration is driver-side by design, like
  // k-means centroids.
  private val piIters = 6

  def q118PowerIteration(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = jlD
    val q = emb(s, dir)
      .select(
        transform(col("embedding"), v => floor(v.cast("double") * lit(1000.0)).cast("long"))
          .as("xq"))
      .pinned
    // Upper triangle only (C is symmetric — halves the explode), and
    // LONG sums: |x̂ᵢx̂ⱼ| ≤ 10⁶ so |Σ| ≤ n·10⁶ — exact in a long until
    // n ≈ 9·10¹² rows, far beyond any SF here, and ~an order cheaper
    // than decimal aggregation on the d²n/2 exploded rows. The integer
    // matrix is BIT-IDENTICAL to the old decimal form (both exact), so
    // the oracle contract is untouched.
    val pairs = q
      .select(col("xq"), posexplode(col("xq")).as(Seq("i", "xi")))
      .select(
        col("i"),
        col("xi"),
        posexplode(slice(col("xq"), col("i") + lit(1), lit(d) - col("i"))).as(Seq("dj", "xj")))
      .groupBy(col("i"), (col("i") + col("dj")).as("j"))
      .agg(sum(col("xi") * col("xj")).as("sxx"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> java.math.BigDecimal.valueOf(r.getLong(2)))
      .toMap
    val sumRows = q
      .select(posexplode(col("xq")).as(Seq("i", "xi")))
      .groupBy(col("i"))
      .agg(sum(col("xi")).as("si"), count(lit(1)).as("n"))
      .collect()
    val si = sumRows.map(r => r.getInt(0) -> java.math.BigDecimal.valueOf(r.getLong(1))).toMap
    val n = java.math.BigDecimal.valueOf(sumRows.head.getLong(2))
    val m = Array.tabulate(d, d) { (i, j) =>
      val sxx = pairs(if (i <= j) (i, j) else (j, i))
      n.multiply(sxx).subtract(si(i).multiply(si(j))).doubleValue()
    }
    val (v, eig) = graft.operators.PowerIteration.topComponent(m, piIters)
    (0 until d)
      .map(dim => (dim, v(dim), eig))
      .toDF("dim", "loading", "eigenvalue")
      .orderBy("dim")
  }

  val q118Sql: String = {
    val d = jlD
    val mv = (mm: String, vv: String) =>
      s"list_transform($mm, r -> list_reduce(list_prepend(0.0, " +
        s"list_transform(range(1, ${d + 1}), k -> r[k] * $vv[k])), (a, b) -> a + b))"
    val norm = (ww: String) =>
      s"list_transform($ww, x -> x / sqrt(list_reduce(list_prepend(0.0, " +
        s"list_transform($ww, y -> y * y)), (a, b) -> a + b)))"
    val iterCtes = (1 to piIters)
      .map { t =>
        val prev = if (t == 1) "it0" else s"it${t - 1}"
        s"""it$t AS MATERIALIZED (SELECT m, ${norm("w")} AS v
           |  FROM (SELECT m, ${mv("m", "v")} AS w FROM $prev))"""
          .stripMargin
      }
      .mkString(",\n")
    s"""WITH e AS (SELECT list_transform(CAST(embedding AS DOUBLE[]),
       |             v -> CAST(FLOOR(v * 1000.0) AS BIGINT)) AS xq
       |           FROM embeddings),
       |px AS MATERIALIZED (SELECT xq, unnest(range(1, ${d + 1})) AS ip FROM e),
       |sxx AS MATERIALIZED (SELECT ip - 1 AS i, jp - 1 AS j, SUM(xi * xj) AS sxx
       |        FROM (SELECT ip, xq[ip] AS xi, xq[jp] AS xj, jp
       |              FROM (SELECT xq, ip, unnest(range(1, ${d + 1})) AS jp FROM px))
       |        GROUP BY 1, 2),
       |sv AS MATERIALIZED (SELECT ip - 1 AS i, SUM(xq[ip]) AS si, COUNT(*) AS n
       |      FROM px GROUP BY 1),
       |cm AS (SELECT s.i, s.j, CAST(a.n * s.sxx - a.si * b.si AS DOUBLE) AS c
       |       FROM sxx s JOIN sv a ON s.i = a.i JOIN sv b ON s.j = b.i),
       |cr AS (SELECT i, list(c ORDER BY j) AS r FROM cm GROUP BY i),
       |it0 AS MATERIALIZED (SELECT (SELECT list(r ORDER BY i) FROM cr) AS m,
       |        list_transform(range(0, $d), x -> 1.0) AS v),
       |$iterCtes,
       |fin AS (SELECT v, ${mv("m", "v")} AS w FROM it$piIters),
       |ray AS (SELECT v,
       |          list_reduce(list_prepend(0.0, list_transform(range(1, ${d + 1}),
       |            k -> v[k] * w[k])), (a, b) -> a + b) /
       |          list_reduce(list_prepend(0.0, list_transform(range(1, ${d + 1}),
       |            k -> v[k] * v[k])), (a, b) -> a + b) AS eig
       |        FROM fin)
       |SELECT CAST(dim AS INTEGER) AS dim, v[CAST(dim AS INTEGER) + 1] AS loading,
       |  eig AS eigenvalue
       |FROM ray, (SELECT unnest(range(0, $d)) AS dim)
       |ORDER BY dim""".stripMargin
  }

  // ---- q120: hybrid retrieval at SCALE — WAND BM25 ⊕ IVFADC via RRF ----------
  // The scale form of q117: same queries, same RRF fusion, but each
  // leg is its production operator — Bm25.topKPruned (candidate volume
  // ≤ cap·|terms| per query, exactness certified by the max-score
  // bound) for the sparse side and Ivfadc.searchDf (nprobe·(N/cells)·m
  // candidate work, queries never leave the DataFrame) for the dense
  // side. The dense leg ranks by ADC-approximated squared L2 over the
  // q102 index (coarse 8 cells ×3 Lloyd iters, 4×4 residual PQ), so
  // the oracle replays the ENTIRE index build + probed search in
  // DuckDB (the q102 replay, self-matches kept: query ids 1-3 are a
  // namespace independent of corpus vec_ids) and fuses with the
  // relational BM25 form (topKPruned is exactness-preserving). Leg
  // ranks ride along as audit columns, so the hash gate pins the
  // fusion inputs, not just the fused order.
  def q120HybridScale(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = emb(s, dir).select(
      col("vec_id"),
      graft.operators.Similarity.asDouble(col("embedding")).as("e"))
    val idx = graft.operators.Ivfadc.fit(
      e, idCol = "vec_id", embCol = "e",
      coarseK = 8, coarseIters = 3, m = 4, pqK = 4, pqIters = 2)
    val qe = broadcast(
      hybridQueries
        .map(q => (q._1, q._3))
        .toDF("qid", "qvid")
        .join(e.select(col("vec_id").as("qvid"), col("e")), "qvid")
        .select(col("qid"), col("e")))
    graft.operators.HybridRetrieval
      .topK(
        Tables.documents(s, dir), "doc_id", col("text"),
        hybridQueries.map(q => (q._1, q._2)),
        idx, qe, "qid", "e",
        k = 10, legK = 20, cap = 100, nprobe = 2)
      .orderBy("qid", "rank")
  }

  val q120Sql: String = {
    val resChains = (0 until 4)
      .map(x => pqChainSql(x, subDims = 16, k = 4, iters = 2, src = "res", prefix = "r"))
      .mkString(",\n")
    val sliceDist =
      "list_reduce(list_prepend(0.0, list_transform(list_zip(emb[(sub*16+1):(sub*16+16)], cent), " +
        "p -> (p[1] - p[2]) * (p[1] - p[2]))), (a, b) -> a + b)"
    val qmapRows = hybridQueries.map(q => s"(${q._1},${q._3})").mkString(",")
    val qtRows = hybridQueries
      .flatMap { case (qid, ts, _) => ts.zipWithIndex.map { case (t, i) => s"($qid,$i,'$t')" } }
      .mkString(",")
    val allTerms = hybridQueries.flatMap(_._2).distinct.map("'" + _ + "'").mkString(",")
    val maxTerms = hybridQueries.map(_._2.size).max
    val slotCols = (0 until maxTerms)
      .map(i => s"MAX(CASE WHEN slot = $i THEN s END) AS s$i")
      .mkString(", ")
    val scoreExpr = (0 until maxTerms).foldLeft("0.0") { (acc, i) =>
      s"($acc + COALESCE(s$i, 0.0))"
    }
    s"""$lloydCellsSql,
       |res AS (SELECT c.vec_id, list_transform(list_zip(c.emb, f.cent), p -> p[1] - p[2]) AS emb, c.cell
       |        FROM cells c JOIN clF f ON c.cell = f.cell),
       |$resChains,
       |qmap(qid, qvid) AS (VALUES $qmapRows),
       |qv AS (SELECT qid, emb FROM qmap JOIN e ON e.vec_id = qmap.qvid),
       |probes AS (
       |  SELECT qid, cell, cent FROM (
       |    SELECT q.qid, c.cell, c.cent,
       |      ROW_NUMBER() OVER (PARTITION BY q.qid ORDER BY $sqDistSql, c.cell) AS rn
       |    FROM (SELECT qid, emb FROM qv) q CROSS JOIN clF c)
       |  WHERE rn <= 2),
       |qres AS (SELECT p.qid, p.cell, list_transform(list_zip(q.emb, p.cent), x -> x[1] - x[2]) AS emb
       |         FROM probes p JOIN qv q ON q.qid = p.qid),
       |rcb AS (SELECT 0 AS sub, cell AS code, cent FROM r0clF
       |        UNION ALL SELECT 1, cell, cent FROM r1clF
       |        UNION ALL SELECT 2, cell, cent FROM r2clF
       |        UNION ALL SELECT 3, cell, cent FROM r3clF),
       |td AS (SELECT qid, qres.cell AS cell, sub, code, $sliceDist AS d FROM qres CROSS JOIN rcb),
       |rcodes AS (SELECT vec_id AS nid, sub, code FROM
       |  (SELECT vec_id, sub, code FROM r0out UNION ALL SELECT vec_id, sub, code FROM r1out
       |   UNION ALL SELECT vec_id, sub, code FROM r2out UNION ALL SELECT vec_id, sub, code FROM r3out)),
       |withcell AS (SELECT rcodes.nid, cells.cell, sub, code
       |             FROM rcodes JOIN cells ON rcodes.nid = cells.vec_id),
       |adcpairs AS (SELECT qid, nid,
       |    MAX(CASE WHEN sub = 0 THEN d END) AS d0,
       |    MAX(CASE WHEN sub = 1 THEN d END) AS d1,
       |    MAX(CASE WHEN sub = 2 THEN d END) AS d2,
       |    MAX(CASE WHEN sub = 3 THEN d END) AS d3
       |  FROM withcell JOIN td USING (cell, sub, code)
       |  GROUP BY qid, nid),
       |adist AS (SELECT qid, nid, ((((0.0 + d0) + d1) + d2) + d3) AS adc_dist FROM adcpairs),
       |dense AS (
       |  SELECT qid, nid AS doc_id,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY adc_dist, nid) AS INTEGER) AS rank_dense
       |  FROM adist QUALIFY rank_dense <= 20),
       |t AS (SELECT doc_id, regexp_split_to_array(TRIM(LOWER(text)), '\\s+') AS toks
       |      FROM documents),
       |tbase AS (SELECT doc_id, toks, LEN(toks) AS dl FROM t),
       |tstats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs, CAST(SUM(dl) AS BIGINT) AS sum_dl
       |           FROM tbase),
       |tf AS (SELECT doc_id, dl, term, CAST(COUNT(*) AS BIGINT) AS tf
       |       FROM (SELECT doc_id, dl, unnest(list_filter(toks, w -> w IN ($allTerms))) AS term
       |             FROM tbase)
       |       GROUP BY doc_id, dl, term),
       |wdf AS (SELECT doc_id, dl, term, tf,
       |          CAST(COUNT(*) OVER (PARTITION BY term) AS BIGINT) AS df
       |        FROM tf),
       |sc AS (SELECT doc_id, term,
       |         ((CAST(n_docs AS DOUBLE) - df + 0.5) / (CAST(df AS DOUBLE) + 0.5)) *
       |         ((CAST(tf AS DOUBLE) * (1.2 + 1.0)) /
       |          (CAST(tf AS DOUBLE) +
       |           1.2 * (1.0 - 0.75 + (0.75 * CAST(dl AS DOUBLE))
       |                  / (CAST(sum_dl AS DOUBLE) / n_docs)))) AS s
       |       FROM wdf CROSS JOIN tstats),
       |qt(qid, slot, term) AS (VALUES $qtRows),
       |per AS (SELECT qid, doc_id, $slotCols
       |        FROM sc JOIN qt USING (term) GROUP BY qid, doc_id),
       |sparse AS (SELECT qid, doc_id,
       |             CAST(ROW_NUMBER() OVER (PARTITION BY qid
       |               ORDER BY $scoreExpr DESC, doc_id) AS INTEGER) AS rank_sparse
       |           FROM per QUALIFY rank_sparse <= 20),
       |fused AS (SELECT COALESCE(s.qid, d.qid) AS qid,
       |            COALESCE(s.doc_id, d.doc_id) AS doc_id,
       |            s.rank_sparse, d.rank_dense,
       |            (COALESCE(1.0 / (60.0 + rank_sparse), 0.0) +
       |             COALESCE(1.0 / (60.0 + rank_dense), 0.0)) AS rrf
       |          FROM sparse s FULL OUTER JOIN dense d
       |            ON s.qid = d.qid AND s.doc_id = d.doc_id)
       |SELECT CAST(qid AS INTEGER) AS qid,
       |  CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY rrf DESC, doc_id) AS INTEGER) AS rank,
       |  doc_id, rank_sparse, rank_dense, rrf
       |FROM fused
       |QUALIFY rank <= 10
       |ORDER BY qid, rank""".stripMargin
  }

  // ---- q127: index staleness drift check — the maintenance loop, oracle-gated ----
  // The operational question every frozen-model ANN deployment must
  // answer ("has the corpus drifted past what the quantizer was fit
  // on?") as a hash-gated query: fit the q102 index, compute the
  // fit-corpus error baseline and the error report of a deterministic
  // drifted batch (every vector shifted +0.25 per dim — re-assigned
  // and re-encoded under the FROZEN model, exactly the append path),
  // and run the product's drift decision (Ivfadc.driftJoin, the same
  // code driftCheck runs off a staged baseline) — per-cell mean error
  // ratios plus the drifted flag, rollup row included. Determinism:
  // per-(vector, sub) errors are the fixed-order sqErr folds q100/q102
  // hash-prove; the per-vector total pivots into fixed slots
  // (q102's d0..d3 idiom); per-cell means fold the per-vector errors
  // in id order (sorted-fold, the q90 cross-row idiom) and divide by
  // the count — so every double matches the DuckDB replay bit-for-bit.
  // (The serving-path stalenessReport aggregates the same per-vector
  // errors with scalable unordered sums — same numbers up to float
  // association; THIS query is the oracle-parity form of the loop.)
  def q127IndexDrift(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir).select(
      col("vec_id"),
      graft.operators.Similarity.asDouble(col("embedding")).as("e")
    )
    val idx = graft.operators.Ivfadc.fit(
      e, idCol = "vec_id", embCol = "e",
      coarseK = 8, coarseIters = 3, m = 4, pqK = 4, pqIters = 2)
    // per-cell (+rollup) mean reconstruction error of a batch under
    // the frozen model, in oracle-parity arithmetic
    def report(batch: DataFrame): DataFrame = {
      val res = graft.operators.Ivfadc.residuals(idx, batch, "vec_id", "e")
      val errTerms = (0 until 4).map(x => max(when(col("sub") === x, col("sq_err"))).as(s"_e$x"))
      val perVec = graft.operators.ProductQuant
        .encode(res.select(col("id"), col("e")), idCol = "id", embCol = "e",
          codebooks = idx.codebooks)
        .groupBy(col("id"))
        .agg(errTerms.head, errTerms.tail: _*)
        .select(
          col("id"),
          ((((lit(0.0) + col("_e0")) + col("_e1")) + col("_e2")) + col("_e3")).as("_err"))
        .join(res.select(col("id"), col("cell")), "id")
      val foldSum = aggregate(
        transform(
          sort_array(collect_list(struct(col("id"), col("_err")))),
          r => r.getField("_err")),
        lit(0.0),
        (a, b) => a + b)
      perVec
        .rollup(col("cell"))
        .agg(count(lit(1)).as("n_vectors"), (foldSum / count(lit(1))).as("mean_sq_err"))
    }
    val shifted = e.select(col("vec_id"), transform(col("e"), x => x + lit(0.25)).as("e"))
    graft.operators.Ivfadc
      .driftJoin(report(e), report(shifted), ratioThreshold = 2.0)
      .orderBy(asc_nulls_first("cell"))
  }

  val q127Sql: String = {
    val resChains = (0 until 4)
      .map(x => pqChainSql(x, subDims = 16, k = 4, iters = 2, src = "res", prefix = "r"))
      .mkString(",\n")
    val sliceDist =
      "list_reduce(list_prepend(0.0, list_transform(list_zip(emb[(sub*16+1):(sub*16+16)], cent), " +
        "p -> (p[1] - p[2]) * (p[1] - p[2]))), (a, b) -> a + b)"
    // per-vector err: min ADC distance per subspace (== the chosen
    // code's sq_err), pivoted and summed in fixed subspace order; per
    // cell: id-ordered fold / count, with a ROLLUP total row
    def errReport(srcRes: String, out: String): String =
      s"""${out}d AS (SELECT $srcRes.vec_id, $srcRes.cell, sub, $sliceDist AS d
         |  FROM $srcRes CROSS JOIN rcb),
         |${out}min AS (SELECT vec_id, cell, sub, MIN(d) AS dmin
         |  FROM ${out}d GROUP BY vec_id, cell, sub),
         |${out}err AS (SELECT vec_id, cell,
         |    ((((0.0 + MAX(CASE WHEN sub = 0 THEN dmin END))
         |      + MAX(CASE WHEN sub = 1 THEN dmin END))
         |      + MAX(CASE WHEN sub = 2 THEN dmin END))
         |      + MAX(CASE WHEN sub = 3 THEN dmin END)) AS err
         |  FROM ${out}min GROUP BY vec_id, cell),
         |${out}rep AS (SELECT cell, COUNT(*) AS n_vectors,
         |    list_reduce(list_prepend(0.0, LIST(err ORDER BY vec_id)), (a, b) -> a + b)
         |      / COUNT(*) AS mean_sq_err
         |  FROM ${out}err GROUP BY ROLLUP(cell))""".stripMargin
    s"""$lloydCellsSql,
       |res AS (SELECT c.vec_id, list_transform(list_zip(c.emb, f.cent), p -> p[1] - p[2]) AS emb, c.cell
       |        FROM cells c JOIN clF f ON c.cell = f.cell),
       |$resChains,
       |rcb AS (SELECT 0 AS sub, cell AS code, cent FROM r0clF
       |        UNION ALL SELECT 1, cell, cent FROM r1clF
       |        UNION ALL SELECT 2, cell, cent FROM r2clF
       |        UNION ALL SELECT 3, cell, cent FROM r3clF),
       |${errReport("res", "c")},
       |sh AS (SELECT vec_id, list_transform(emb, x -> x + 0.25) AS emb FROM e),
       |shcells AS (
       |  SELECT vec_id, emb, cell FROM (
       |    SELECT e.vec_id, e.emb, c.cell,
       |      ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY $sqDistSql, c.cell) AS rn
       |    FROM sh e CROSS JOIN clF c)
       |  WHERE rn = 1),
       |shres AS (SELECT s.vec_id, list_transform(list_zip(s.emb, f.cent), p -> p[1] - p[2]) AS emb, s.cell
       |          FROM shcells s JOIN clF f ON s.cell = f.cell),
       |${errReport("shres", "s")}
       |SELECT COALESCE(b.cell, r.cell) AS cell,
       |  b.n_vectors AS baseline_n, b.mean_sq_err AS baseline_mean_sq_err,
       |  r.n_vectors AS batch_n, r.mean_sq_err AS batch_mean_sq_err,
       |  r.mean_sq_err / b.mean_sq_err AS err_ratio,
       |  CASE WHEN r.n_vectors IS NULL THEN FALSE
       |       WHEN b.mean_sq_err IS NULL THEN TRUE
       |       ELSE r.mean_sq_err / b.mean_sq_err > 2.0 END AS drifted
       |FROM crep b FULL OUTER JOIN srep r ON b.cell IS NOT DISTINCT FROM r.cell
       |ORDER BY cell NULLS FIRST""".stripMargin
  }

  // ---- q128: MMR diversified re-rank (maximal marginal relevance) ----------
  // Carbonell & Goldstein 1998 — the standard diversification pass a
  // retrieval pipeline runs over a shortlist: greedily select k items
  // maximizing  λ·rel(c) − (1−λ)·max_{s∈selected} sim(c, s)  so near-
  // duplicate hits don't crowd the result page / training batch.
  // Query set = vec_id < 8 (q40's), shortlist = top-20 by cosine,
  // λ = 0.7, k = 5.
  //
  // Scale shape: after the shortlist, EVERYTHING is keyed by qid with
  // bounded per-qid group sizes (20 candidates), so the whole greedy
  // is a per-group pure function — one MmrGreedyAgg aggregation
  // (round-15 optimization; previously k−1 rounds of checkpointed
  // join + windowed argmax, ~3 scheduled jobs per step). One million
  // concurrent queries distribute across executors; no step moves
  // data to the driver. The brute-force shortlist here is the
  // correctness baseline (q40's posture) — at corpus scale the same
  // greedy consumes any ANN shortlist (q42 IVF / q102 IVFADC)
  // unchanged. The oracle unrolls the k−1 steps as CTEs (the
  // q111/q118 unrolled-rounds pattern); scores stay bit-exact across
  // engines because cosine uses the sequential fold both engines
  // share and the MMR combine is plain IEEE arithmetic
  // (MmrGreedySpec pins byte equality with the frame-form chain).
  private val mmrPool = 20
  private val mmrK = 5

  def q128MmrRerank(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir).select(col("vec_id"), asDouble(col("embedding")).as("emb"))
    val q = e.filter(col("vec_id") < 8).select(col("vec_id").as("qid"), col("emb").as("qemb"))
    val c = e.select(col("vec_id").as("nid"), col("emb").as("nemb"))
    val rel = c
      .join(broadcast(q), col("nid") =!= col("qid"))
      .select(
        col("qid"),
        col("nid"),
        col("nemb"),
        (dot(col("qemb"), col("nemb")) /
          (sqrt(dot(col("qemb"), col("qemb"))) * sqrt(dot(col("nemb"), col("nemb"))))).as("rel"))
    val wTop = Window.partitionBy(col("qid")).orderBy(col("rel").desc, col("nid"))
    val cands = rel
      .withColumn("rn", row_number().over(wTop))
      .filter(col("rn") <= mmrPool)
      // no pin: the aggregate-form greedy consumes the shortlist once
      .select("qid", "nid", "nemb", "rel")
    mmrGreedy(cands, mmrK).orderBy("qid", "step")
  }

  /** The shared MMR greedy: `cands` = (qid, nid, nemb, rel) — a
    * bounded per-qid shortlist from ANY retrieval leg (q128 feeds the
    * brute-force cosine top-k, q130 the probed IVFADC ranking).
    * Diversity sims are cosines over the candidates' TRUE embeddings;
    * k−1 steps of bounded join + windowed argmax per qid. Returns
    * (qid, nid, rel, score, step), unordered.
    */
  private def mmrGreedy(cands: DataFrame, k: Int): DataFrame =
    // ONE aggregation job: per-qid pools are bounded (the retrieval
    // shortlist), so the whole greedy is a per-group pure function —
    // graft.expressions.MmrGreedyAgg runs it in the aggregate's eval
    // with the frame chain's exact arithmetic (sequential-fold
    // cosines, double-ordering argmax, ties to the lower nid;
    // byte-equality vs the old k-round join/window chain is pinned by
    // MmrGreedySpec). The previous form scheduled ~3 jobs per
    // selection step (checkpointed step results so the next step's
    // three reads didn't re-derive the plan) — the round-15
    // optimization replaces the loop, not the math. Scale shape is
    // unchanged: selection distributes by qid, nothing on the driver.
    cands
      .groupBy(col("qid"))
      .agg(graft.expressions.MmrGreedyAgg
        .mmr(col("nid"), col("nemb"), col("rel"), k, 0.7, 0.3).as("_sel"))
      .select(col("qid"), explode(col("_sel")).as("_s"))
      .select(
        col("qid"),
        col("_s.nid").as("nid"),
        col("_s.rel").as("rel"),
        col("_s.score").as("score"),
        col("_s.step").as("step"))

  private def cosineSql(x: String, y: String): String =
    s"""list_reduce(list_transform(list_zip($x, $y), p -> p[1] * p[2]), (u, v) -> u + v)
       |      / (sqrt(list_reduce(list_transform(list_zip($x, $x), p -> p[1] * p[2]), (u, v) -> u + v))
       |       * sqrt(list_reduce(list_transform(list_zip($y, $y), p -> p[1] * p[2]), (u, v) -> u + v)))""".stripMargin

  /** The shared MMR-tail CTEs + final SELECT: expects a prior
    * `cands(qid, nid, nemb, rel)` CTE (any retrieval leg). Mirrors
    * [[mmrGreedy]] step for step.
    */
  private def mmrTailSql(k: Int): String = {
    val steps = (2 to k).map { t =>
      val prev = s"sel${t - 1}"
      s"""ms$t AS (
         |  SELECT s.qid, s.a AS nid, MAX(s.sim) AS maxsim
         |  FROM sims s JOIN $prev p ON s.qid = p.qid AND s.b = p.nid
         |  GROUP BY s.qid, s.a),
         |sc$t AS (
         |  SELECT c.qid, c.nid, c.rel, 0.7 * c.rel - 0.3 * m.maxsim AS score
         |  FROM cands c JOIN ms$t m ON c.qid = m.qid AND c.nid = m.nid
         |  WHERE NOT EXISTS (SELECT 1 FROM $prev p WHERE p.qid = c.qid AND p.nid = c.nid)),
         |sel$t AS MATERIALIZED (
         |  SELECT * FROM $prev
         |  UNION ALL
         |  SELECT qid, nid, rel, score, $t AS step FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY score DESC, nid) AS rn FROM sc$t)
         |  WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    s"""sims AS MATERIALIZED (
       |  SELECT a.qid, a.nid AS a, b.nid AS b,
       |    ${cosineSql("a.nemb", "b.nemb")} AS sim
       |  FROM cands a JOIN cands b ON a.qid = b.qid AND a.nid <> b.nid),
       |sel1 AS MATERIALIZED (
       |  SELECT qid, nid, rel, rel AS score, 1 AS step FROM (
       |    SELECT qid, nid, rel, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY rel DESC, nid) AS rn
       |    FROM cands)
       |  WHERE rn = 1),
       |$steps
       |SELECT qid, CAST(step AS INTEGER) AS step, nid, rel, score FROM sel$k
       |ORDER BY qid, step""".stripMargin
  }

  val q128Sql: String =
    s"""WITH e AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
       |q AS (SELECT vec_id AS qid, emb AS qemb FROM e WHERE vec_id < 8),
       |rel AS (
       |  SELECT qid, e.vec_id AS nid, e.emb AS nemb,
       |    ${cosineSql("qemb", "emb")} AS rel
       |  FROM e CROSS JOIN q WHERE e.vec_id <> qid),
       |cands AS MATERIALIZED (
       |  SELECT qid, nid, nemb, rel FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY rel DESC, nid) AS rn FROM rel)
       |  WHERE rn <= $mmrPool),
       |${mmrTailSql(mmrK)}""".stripMargin

  // ---- q130: MMR over the probed IVFADC shortlist (ANN + diversify) --------
  // The production composition q128's header promises: the SAME greedy
  // (mmrGreedy, shared code path) consuming the probed IVFADC ranking
  // (q102's index, k = 20) instead of the brute-force scan. Relevance
  // is the reciprocal ADC rank (exact rational — ADC distances and
  // cosines live on different scales, so rank-based relevance keeps
  // the λ-mix meaningful and the arithmetic engine-exact); diversity
  // sims are cosines over the candidates' TRUE embeddings, read once
  // for the ≤ 20·|Q| shortlist rows — the index is still never
  // re-scanned. At 100 TB this is the serving-path shape: probed
  // search touches nprobe cells, the re-rank touches k·|Q| rows.
  // Oracle = the full q102 index replay (shared ivfadcRankedSql)
  // composed with the shared MMR tail.
  def q130MmrIvfadc(s: SparkSession, dir: String): DataFrame = {
    val (idx, qs) = q102IndexAndQueries(s, dir)
    val e = emb(s, dir).select(
      col("vec_id"),
      graft.operators.Similarity.asDouble(col("embedding")).as("e")
    )
    val shortlist = graft.operators.Ivfadc.search(idx, qs, nprobe = 2, k = mmrPool)
    val cands = shortlist
      .select(col("qid"), col("nid"), (lit(1.0) / col("rank")).as("rel"))
      .join(e.select(col("vec_id").as("nid"), col("e").as("nemb")), Seq("nid"))
      // no pin: the aggregate-form greedy consumes the shortlist once
      .select("qid", "nid", "nemb", "rel")
    mmrGreedy(cands, mmrK).orderBy("qid", "step")
  }

  val q130Sql: String =
    s"""$ivfadcRankedSql,
       |cands AS MATERIALIZED (
       |  SELECT r.qid, r.nid, e.emb AS nemb, CAST(1 AS DOUBLE) / r.rank AS rel
       |  FROM ranked r JOIN e ON e.vec_id = r.nid
       |  WHERE r.rank <= $mmrPool),
       |${mmrTailSql(mmrK)}""".stripMargin

  // ---- Serving-path entry points (graft.ServingBench) ----------------------
  // q102/q120/q130's bench rows are FIT-dominated by construction and
  // adjudicated as offline-amortized — these entry points put the
  // amortized claim on the record: fit + save once (untimed offline
  // half), then time ONLY load + probed search (+ MMR re-rank) from
  // the staged, cell-partitioned index. That load-and-serve number —
  // not the fit-inclusive one — is the 100×-scale serving cost: a
  // probe touches nprobe cells' files (partition-pruned, per the
  // IvfadcSpec files-read assert), never the corpus.

  /** The offline half: q102's exact fit, staged to `idxDir` with its
    * fit-time drift baseline (a full production index dir).
    */
  def q102FitAndSave(s: SparkSession, dir: String, idxDir: String): Unit = {
    val (idx, _) = q102IndexAndQueries(s, dir)
    val base = emb(s, dir)
      .select(col("vec_id").as("id"), graft.operators.Similarity.asDouble(col("embedding")).as("e"))
    graft.operators.Ivfadc.save(idx, idxDir, Some(base))
  }

  /** q102's serving leg from an already-staged index: the probed ADC
    * search alone, byte-identical to q102Ivfadc's ranking (save/load
    * round-trips bit-exactly, spec-pinned).
    */
  def q102Serve(s: SparkSession, dir: String, idx: graft.operators.Ivfadc.Index): DataFrame =
    graft.operators.Ivfadc.search(idx, contractQueries(s, dir), nprobe = 2, k = 5)
      .orderBy("qid", "rank")

  /** q130's serving leg from an already-staged index: probed shortlist
    * → reciprocal-rank MMR — exactly q130MmrIvfadc minus the fit.
    */
  def q130Serve(s: SparkSession, dir: String, idx: graft.operators.Ivfadc.Index): DataFrame = {
    val e = emb(s, dir).select(
      col("vec_id"), graft.operators.Similarity.asDouble(col("embedding")).as("e"))
    val shortlist =
      graft.operators.Ivfadc.search(idx, contractQueries(s, dir), nprobe = 2, k = mmrPool)
    val cands = shortlist
      .select(col("qid"), col("nid"), (lit(1.0) / col("rank")).as("rel"))
      .join(e.select(col("vec_id").as("nid"), col("e").as("nemb")), Seq("nid"))
      // no pin: the aggregate-form greedy consumes the shortlist once
      .select("qid", "nid", "nemb", "rel")
    mmrGreedy(cands, mmrK).orderBy("qid", "step")
  }

  /** The many-query serving throughput shape: EVERY corpus vector
    * queries the staged index ([[graft.operators.Ivfadc.searchDf]],
    * tables built in executors, enc scan statically pruned to the
    * probed cells). This is the row that scales with |Q| — the batch
    * re-embedding / nearest-neighbor-sweep deployment shape.
    */
  def ivfadcServeAll(
      s: SparkSession, dir: String, idx: graft.operators.Ivfadc.Index, k: Int = 5): DataFrame = {
    val e = emb(s, dir).select(
      col("vec_id"), graft.operators.Similarity.asDouble(col("embedding")).as("e"))
    graft.operators.Ivfadc.searchDf(idx, e, "vec_id", "e", nprobe = 2, k = k)
  }

  // ---- q131: trained pair-feature re-scoring (the cross-encoder slot) ------
  // The one standard LLM-retrieval primitive the stack lacked (round-13
  // verdict #8): a TRAINED re-scorer over query-doc pair features —
  // the role a cross-encoder plays in a production pipeline, here in
  // its distillation form (teach a cheap student from an expensive
  // teacher signal). Candidates = q117's fused RRF top-10 per query;
  // teacher y = the pair's dense cosine (the "expensive" leg);
  // student features are CHEAP pair surface stats: squashed
  // rational-idf BM25 (Bm25.pairScores), query-term overlap fraction,
  // doc token diversity and length (q129's centered forms). Training
  // is q129's distributed-GD machinery verbatim — each round ONE
  // map-side pass over the pair rows (1-row weight broadcast,
  // dsumProduct decimal gradient sums over 4-decimal-quantized factors
  // AND residuals, tie-proof across engines) — then the trained scorer
  // re-ranks the shortlist. At 100 TB: |Q| scales freely — features,
  // training and re-ranking are joins + partial aggs over
  // |Q|·shortlist PAIR rows (never corpus-pairwise), and the teacher
  // column is whatever logged expensive signal a deployment distills.
  // Features are standardized with FIXED constants (offsets keep the
  // quantized values on the 4-decimal grid; scales are ×4/×2 — exact
  // powers of two — and ×10, one correctly-rounded IEEE op): the raw
  // near-1 correlated features (intercept, squashed BM25, overlap)
  // give XᵀX/n eigenvalues spanning 0.0009..1.9, and gradient descent
  // contracts a direction by |1−2·lr·λ| per round — the INFORMATIVE
  // small-λ directions moved so little in 12 rounds that the r14
  // model measured ABOVE the null MSE at sf0.01 (0.1025 vs 0.1021,
  // found by the round-15 ranking-anchor work). Standardized, the
  // spectrum is 0.005..2.6 (measured at sf0.01) and 12 rounds land
  // within ~15% of the exact least-squares MSE at both spec SFs.
  // lr: stability needs lr < 1/λmax ≈ 0.39 under the w − lr·2·∇
  // update; lr=0.3 converges (LinregRescoreSpec pins model-beats-null
  // AND mean Spearman vs the teacher ranking); lr=0.5 oscillated on
  // the unstandardized run — found the hard way, kept documented.
  private val rescoreLr = 0.3
  private val rescoreRounds = 12

  def q131TrainedRescore(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.functions.Num
    val shortlist = q117HybridRrf(s, dir).select(col("qid"), col("doc_id"))
    val pairBm = graft.operators.Bm25.pairScores(
      Tables.documents(s, dir), "doc_id", col("text"), hybridQueries.map(q => (q._1, q._2)))
    // doc surface features on the SAME lowered tokenization the BM25
    // side uses (the oracle's shared `t` CTE)
    val toks = split(trim(lower(col("text"))), "\\s+")
    val surf = Tables.documents(s, dir).select(
      col("doc_id"), size(toks).as("n_tok"), size(array_distinct(toks)).as("n_distinct"))
    // qid → (query embedding, term count): n_terms rides the same
    // broadcast so x2 is a per-QUERY fraction, not a hardcoded /2.0 —
    // a 3-term query added to hybridQueries keeps the documented
    // "fraction of the query's terms matched" semantics (ADVICE r14)
    val qv = broadcast(
      hybridQueries.map(q => (q._1, q._3, q._2.size)).toDF("qid", "qvid", "n_terms")
        .join(emb(s, dir).select(col("vec_id").as("qvid"), col("embedding").as("qe")), "qvid")
        .select(col("qid"), col("qe"), col("n_terms")))
    // Same HOF-dot rewrite as q117's dense leg (see the note there):
    // identical element ops and fold order, bit-identical cosines,
    // ~150× smaller expression tree to optimize and compile.
    def edot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(
        zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0),
        (acc, x) => acc + x)
    val sc = coalesce(col("score"), lit(0.0))
    val feats = shortlist
      .join(pairBm, Seq("qid", "doc_id"), "left")
      .join(surf, Seq("doc_id"))
      .join(emb(s, dir).select(col("vec_id").as("doc_id"), col("embedding").as("de")), Seq("doc_id"))
      .join(qv, Seq("qid"))
      .select(
        col("qid"),
        col("doc_id"),
        lit(1.0).as("x0"),
        // squash the unbounded BM25 into [0,1) then quantize — the
        // residual-quantization rationale (q129) applies to every
        // factor — then center+scale with fixed constants (see the
        // standardization note above): offsets are 1–2-decimal
        // constants so the ideal value stays on the 4-decimal grid
        // (DECIMAL casts can't tie), ×4/×2 are exact
        ((round((sc / (lit(1.0) + sc)) * lit(10000.0)) / lit(10000.0) - lit(0.4)) * lit(4.0))
          .as("x1"),
        ((round(coalesce(col("hit_terms"), lit(0)).cast("double") * lit(10000.0) /
          col("n_terms")) / lit(10000.0) - lit(0.8)) * lit(2.0)).as("x2"),
        ((round(col("n_distinct").cast("double") * lit(10000.0) / col("n_tok")) / lit(10000.0)
          - lit(0.46)) * lit(10.0)).as("x3"),
        (col("n_tok").cast("double") / lit(100.0) - lit(0.55)).as("x4"),
        (edot(col("qe"), col("de")) /
          (sqrt(edot(col("qe"), col("qe"))) * sqrt(edot(col("de"), col("de"))))).as("y"))
      // ONE partition BY THIS QUERY'S CONTRACT: the pair table is
      // ≤ |hybridQueries|·10 rows (3 queries × the RRF top-10), so a
      // single-partition pin makes every GD round's aggregate
      // exchange-free — head() is then one single-stage job instead
      // of an AQE-materialized shuffle + take (measured 2 jobs/round
      // → 1). A large-|Q| deployment of this rescorer drops the
      // coalesce and keeps the distributed partial-agg shape (q129's
      // corpus-sized GD does exactly that). Values are unaffected:
      // the gradient sums are exact decimals, order-independent.
      .coalesce(1)
      .pinned
    val js = 0 to 4
    // GD rounds with the weights as DRIVER LITERALS (round-15
    // optimization): each round is ONE aggregation job over the pinned
    // pair rows, and the k+1 gradient sums — a bounded sufficient
    // statistic, the same class as KMeans' per-iteration means collect
    // — cross the driver as plain doubles. The previous 1-row-frame
    // chain paid two scheduled jobs per round (broadcast build +
    // checkpoint materialization) plus a crossJoin plan to optimize
    // each time; the update arithmetic below is the exact IEEE op
    // sequence of the old frame expression (w − lr·(2·(g/n)) on
    // identical double operands), so the trajectory — and the oracle
    // hash — is bit-identical.
    var w: IndexedSeq[Double] = IndexedSeq.fill(js.size)(0.0)
    def zOf(ws: IndexedSeq[Double]) =
      js.map(j => lit(ws(j)) * col(s"x$j")).reduce(_ + _)
    for (_ <- 1 to rescoreRounds) {
      val aggCols =
        js.map(j => Num.dsumProduct(col("r"), col(s"x$j")).as(s"g$j")) :+
          count(lit(1)).as("n")
      val row = feats
        .withColumn("r", round((zOf(w) - col("y")) * lit(10000.0)) / lit(10000.0))
        .agg(aggCols.head, aggCols.tail: _*)
        .head()
      val n = row.getLong(js.size)
      w = js.map(j => w(j) - rescoreLr * (2.0 * (row.getDouble(j) / n)))
    }
    val wWin = Window.partitionBy(col("qid")).orderBy(col("score").desc, col("doc_id"))
    feats
      .select(col("qid"), col("doc_id"), zOf(w).as("score"), col("y").as("teacher"))
      .withColumn("rank", row_number().over(wWin))
      .select(col("qid"), col("rank"), col("doc_id"), col("score"), col("teacher"))
      .orderBy("qid", "rank")
  }

  val q131Sql: String = {
    val js = 0 to 4
    val maxTerms = hybridQueries.map(_._2.size).max
    val hitExpr = (0 until maxTerms)
      .map(i => s"(CASE WHEN s$i IS NOT NULL THEN 1 ELSE 0 END)")
      .mkString(" + ")
    def dsumP(a: String, b: String) =
      s"CAST(CAST(SUM(CAST($a AS DECIMAL(18,4)) * CAST($b AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE)"
    def z(w: String, f: String) = js.map(j => s"$w.w$j * $f.x$j").mkString(" + ")
    val rounds = (1 to rescoreRounds).map { t =>
      val p = s"w${t - 1}"
      s"""st$t AS (
         |  SELECT f.*, ROUND(((${z("w", "f")}) - f.y) * 10000.0) / 10000.0 AS r
         |  FROM feats f CROSS JOIN $p w),
         |g$t AS (
         |  SELECT ${js.map(j => s"${dsumP("r", s"x$j")} AS g$j").mkString(", ")},
         |         COUNT(*) AS n
         |  FROM st$t),
         |w$t AS MATERIALIZED (
         |  SELECT ${js.map(j => s"w.w$j - $rescoreLr * (2.0 * (g.g$j / g.n)) AS w$j").mkString(", ")}
         |  FROM $p w CROSS JOIN g$t g)""".stripMargin
    }.mkString(",\n")
    s"""WITH $hybridFusedSql,
       |sl AS MATERIALIZED (
       |  SELECT qid, doc_id FROM (
       |    SELECT qid, doc_id,
       |      ROW_NUMBER() OVER (PARTITION BY qid ORDER BY rrf DESC, doc_id) AS rk
       |    FROM fused) WHERE rk <= 10),
       |pairbm AS (SELECT qid, doc_id, $hybridScoreExpr AS bscore, $hitExpr AS hit FROM per),
       |qn(qid, n_terms) AS (VALUES ${hybridQueries.map(q => s"(${q._1},${q._2.size})").mkString(",")}),
       |feats AS MATERIALIZED (
       |  SELECT sl.qid, sl.doc_id,
       |    1.0 AS x0,
       |    (ROUND((COALESCE(pb.bscore, 0.0) / (1.0 + COALESCE(pb.bscore, 0.0))) * 10000.0) / 10000.0 - 0.4) * 4.0 AS x1,
       |    (ROUND(CAST(COALESCE(pb.hit, 0) AS DOUBLE) * 10000.0 / qn.n_terms) / 10000.0 - 0.8) * 2.0 AS x2,
       |    (ROUND(CAST(LEN(list_distinct(t.toks)) AS DOUBLE) * 10000.0 / LEN(t.toks)) / 10000.0 - 0.46) * 10.0 AS x3,
       |    CAST(LEN(t.toks) AS DOUBLE) / 100.0 - 0.55 AS x4,
       |    d0.sim AS y
       |  FROM sl
       |  LEFT JOIN pairbm pb ON pb.qid = sl.qid AND pb.doc_id = sl.doc_id
       |  JOIN qn ON qn.qid = sl.qid
       |  JOIN t ON t.doc_id = sl.doc_id
       |  JOIN dense0 d0 ON d0.qid = sl.qid AND d0.doc_id = sl.doc_id),
       |w0 AS (SELECT ${js.map(j => s"0.0 AS w$j").mkString(", ")}),
       |$rounds,
       |rescored AS (
       |  SELECT f.qid, f.doc_id, (${z("w", "f")}) AS score, f.y AS teacher
       |  FROM feats f CROSS JOIN w$rescoreRounds w)
       |SELECT CAST(qid AS INTEGER) AS qid,
       |  CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY score DESC, doc_id) AS INTEGER) AS rank,
       |  doc_id, score, teacher
       |FROM rescored
       |ORDER BY qid, rank""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q131_trained_rescore" -> (q131TrainedRescore _),
    "q130_mmr_ivfadc" -> (q130MmrIvfadc _),
    "q128_mmr_rerank" -> (q128MmrRerank _),
    "q127_index_drift" -> (q127IndexDrift _),
    "q116_random_projection" -> (q116RandomProjection _),
    "q117_hybrid_rrf" -> (q117HybridRrf _),
    "q120_hybrid_scale" -> (q120HybridScale _),
    "q125_retrieval_eval" -> (q125RetrievalEval _),
    "q118_power_iteration" -> (q118PowerIteration _),
    "q107_hard_mining" -> (q107HardMining _),
    "q102_ivfadc" -> (q102Ivfadc _),
    "q101_pq_adc" -> (q101PqAdc _),
    "q100_product_quant" -> (q100ProductQuant _),
    "q98_semdedup" -> (q98SemDedup _),
    "q76_scalar_quant" -> (q76ScalarQuant _),
    "q66_label_centroids" -> (q66LabelCentroids _),
    "q40_knn_brute_force" -> (q40KnnBruteForce _),
    "q41_norm_stats" -> (q41NormStats _),
    "q42_ann_ivf" -> (q42AnnIvf _),
    "q43_sign_lsh" -> (q43SignLsh _),
    "q44_embedding_near_dup" -> (q44EmbeddingNearDup _),
    "q52_ann_kmeans" -> (q52AnnKmeans _)
  )

  val oracles: Map[String, String] = Map(
    "q131_trained_rescore" -> q131Sql,
    "q130_mmr_ivfadc" -> q130Sql,
    "q128_mmr_rerank" -> q128Sql,
    "q127_index_drift" -> q127Sql,
    "q116_random_projection" -> q116Sql,
    "q117_hybrid_rrf" -> q117Sql,
    "q120_hybrid_scale" -> q120Sql,
    "q125_retrieval_eval" -> q125Sql,
    "q118_power_iteration" -> q118Sql,
    "q107_hard_mining" -> q107Sql,
    "q102_ivfadc" -> q102Sql,
    "q101_pq_adc" -> q101Sql,
    "q100_product_quant" -> q100Sql,
    "q98_semdedup" -> q98Sql,
    "q76_scalar_quant" -> q76Sql,
    "q66_label_centroids" -> q66Sql,
    "q40_knn_brute_force" -> q40Sql,
    "q41_norm_stats" -> q41Sql,
    "q42_ann_ivf" -> q42Sql,
    "q43_sign_lsh" -> q43Sql,
    "q44_embedding_near_dup" -> q44Sql,
    "q52_ann_kmeans" -> q52Sql
  )
}
