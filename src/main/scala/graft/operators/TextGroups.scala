package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Memoize per-document computations by DISTINCT text.
  *
  * Crawled/near-dup corpora repeat the same text under many doc ids
  * (the sf1 soak: 4,992 distinct texts across 50k docs), so any
  * per-document value that is a pure function of the text — quality
  * scores, scrub hashes, n-gram stats, overlap against a broadcast
  * reference set — can be computed once per distinct text and joined
  * back per doc. This is the per-doc analogue of the dedupFirst
  * staging in [[Dedup]]/[[Similarity]]: work shrinks by the corpus
  * duplication factor; on a fully diverse corpus it degenerates to
  * one extra narrow window pass.
  *
  * Correctness requires `perText` to be a pure function of its input
  * rows (it may close over corpus-level DataFrames — e.g. a reference
  * shingle set — as long as those don't depend on WHICH representative
  * was chosen). Group representatives are min(id) per text, so the
  * grouping is deterministic and partition-independent.
  */
object TextGroups {

  /** Compute `perText` once per distinct text and expand per doc.
    *
    * @param df      source rows
    * @param idCol   unique id column name
    * @param textKey grouping expression (e.g. `col("text")` or
    *                `lower(trim(col("text")))`) — exposed to `perText`
    *                as column `t`
    * @param perText (gid, t) representatives → gid-keyed result; rows
    *                it drops are dropped for every doc of that text
    *                (inner-join expansion)
    * @return one row per surviving doc: `idCol` plus `perText`'s
    *         non-gid columns
    */
  def perDoc(df: DataFrame, idCol: String, textKey: Column)(perText: DataFrame => DataFrame): DataFrame =
    perDocWithSizes(df, idCol, textKey)((reps, _) => perText(reps))

  /** The grouping prelude alone — for callers whose EXPANSION is not
    * [[perDoc]]'s plain inner join (novelty's rep-only ownership, pair
    * expansion in the fuzzy-dedup queries). Returns
    * `members` (gid, idCol) and `reps` (gid, t); the grouping rule
    * (representative = min id per distinct key) lives only here.
    * `idCol` must not itself be named `t` (the key alias).
    */
  def prelude(df: DataFrame, idCol: String, textKey: Column): (DataFrame, DataFrame) = {
    require(idCol != "t", "idCol 't' collides with the grouping-key alias")
    val w = org.apache.spark.sql.expressions.Window.partitionBy("t")
    val withGid = df
      .select(col(idCol), textKey.as("t"))
      .withColumn("gid", min(col(idCol)).over(w))
    val members = withGid.select(col("gid"), col(idCol))
    val reps = withGid.filter(col(idCol) === col("gid")).select(col("gid"), col("t"))
    (members, reps)
  }

  /** Like [[perDoc]] but `perText` also receives the group sizes
    * (gid, gsz) — needed when the per-text value depends on corpus
    * document counts (e.g. "how many DOCS contain this n-gram" =
    * sum of gsz over the groups containing it).
    */
  def perDocWithSizes(df: DataFrame, idCol: String, textKey: Column)(
      perText: (DataFrame, DataFrame) => DataFrame): DataFrame = {
    val (members0, reps) = prelude(df, idCol, textKey)
    val members = members0.withColumnRenamed(idCol, "_mid")
    val sizes = members.groupBy("gid").agg(count(lit(1)).as("gsz"))
    val perRep = perText(reps, sizes)
    members
      .join(perRep, "gid")
      .drop("gid")
      .withColumnRenamed("_mid", idCol)
  }
}
