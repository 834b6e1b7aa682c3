package graft.tools

import org.apache.spark.sql.functions._

/** Production-vocab BPE training probe — exercises
  * `Bpe.trainMerges(checkpointEvery)` far past the 64-round cap of the
  * unchunked path and reports what SCALE.md pins: wall time, rounds
  * completed, the analyzed-plan-size cycle (bounded, not growing) and
  * the live-pin bound (wf + ≤2 symbol-table generations).
  *
  *   sbt "runMain graft.tools.BpeScale /tmp/sf1 1000 16 hex"
  *
  * The synthetic corpus's word vocabulary is tiny (31 distinct words
  * at sf1), so word-level training saturates — every word becomes one
  * symbol — after ~89 merges (measured; trainMerges stops early, as
  * designed). That cap is a property of the DATA, not the engine; to
  * exercise the engine at production vocab depth, mode `hex` derives
  * a deterministic corpus with an unsaturating vocabulary from the
  * same table: each document row contributes md5(doc_id) — a 32-char
  * hex string whose pair structure keeps yielding merges for
  * thousands of rounds. Same training path, same checkpoint cycle,
  * same job shape; only the input text differs.
  */
object BpeScale {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: BpeScale <sfDir> <numMerges> <checkpointEvery> [words|hex]")
    val (dir, merges, every) = (args(0), args(1).toInt, args(2).toInt)
    val mode = if (args.length >= 4) args(3) else "words"
    val spark = graft.GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    val raw = spark.read.parquet(s"$dir/documents.parquet")
    val docs =
      if (mode == "hex") raw.select(md5(col("doc_id").cast("string")).as("text"))
      else raw

    var maxPlan = 0
    var maxPins = 0
    var rounds = 0
    val planAt = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    val t0 = System.nanoTime()
    val learned = graft.operators.Bpe.trainMergesProbed(
      docs, col("text"), merges, every,
      probe = (round, scored) => {
        rounds = round + 1
        val sz = scored.queryExecution.analyzed.toString.length
        if (sz > maxPlan) maxPlan = sz
        val pins = graft.operators.Pinned.pinnedCount(spark)
        if (pins > maxPins) maxPins = pins
        if (round % 100 == 0) planAt += ((round, sz))
      })
    val wall = (System.nanoTime() - t0) / 1e9

    println(f"BPESCALE mode=$mode merges=${learned.size} rounds=$rounds wall=$wall%.1fs " +
      f"rate=${wall / math.max(rounds, 1)}%.3fs/round maxPlanChars=$maxPlan maxLivePins=$maxPins " +
      s"pinsAfter=${graft.operators.Pinned.pinnedCount(spark)}")
    println("BPESCALE plan-size checkpoints: " +
      planAt.map { case (r, s) => s"r$r=$s" }.mkString(" "))
    println("BPESCALE last merges: " +
      learned.takeRight(5).map { case (l, r, c) => s"'$l'+'$r'($c)" }.mkString(" "))
    spark.stop()
  }
}
