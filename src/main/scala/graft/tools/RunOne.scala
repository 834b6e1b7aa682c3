package graft.tools

/** Dev tool: dump ONE catalogued query (and its oracle SQL) for a
  * targeted check_oracle.py run — iterating on a single query at the
  * sf1 soak without paying the full-catalog DuckDB pass.
  *
  *   sbt "runMain graft.tools.RunOne q90_sparse_docsim /tmp/sf1 /tmp/q90"
  *   python3 tools/check_oracle.py /tmp/sf1 /tmp/q90
  */
object RunOne {
  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: RunOne <query> <sfDir> <outDir>")
    val Array(name, sfDir, outDir) = args
    val spark = graft.GraftSession.local()
    val t0 = System.nanoTime()
    graft.SparkEntry
      .queries(name)(spark, sfDir)
      .write
      .mode("overwrite")
      .parquet(s"$outDir/$name")
    println(f"RUNONE $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
    val sql = graft.SparkEntry.oracleSql.get(name) match {
      case Some(q) => "{" + "\"" + name + "\": " + jsonStr(q) + "}"
      case None    => "{}"
    }
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$outDir/oracle_sql.json"),
      sql.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
  }

  private def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"'          => "\\\""
      case '\\'         => "\\\\"
      case '\n'         => "\\n"
      case '\r'         => "\\r"
      case '\t'         => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c            => c.toString
    } + "\""
}
