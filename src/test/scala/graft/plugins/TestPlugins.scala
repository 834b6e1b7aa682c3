package graft.plugins

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.rules.Rule

/** Rules deliberately NOT in PipelineCompiler.builtinRules: they exist
  * to prove the runtime class-loading path — the Spark stand-in for the
  * reference's user-compiled .so plugins (rule.go:45-62).
  */
object ShoutRule extends Rule {
  val name = "shoutRule"
  override val eventType: Option[String] = Some("exampleEventType")
  def apply(df: DataFrame): DataFrame =
    df.select(upper(coalesce(col("Str"), lit(""))).as("result"))
}

/** Zero-arg class form: RuleLoader must instantiate it reflectively. */
final class SuffixRule extends Rule {
  val name = "suffixRule"
  override val eventType: Option[String] = Some("exampleEventType")
  def apply(df: DataFrame): DataFrame =
    df.select(concat(coalesce(col("Str"), lit("")), lit("!")).as("result"))
}

/** On the classpath but not a Rule — the reference's "Rule is not a
  * rule type" assertion failure (rule.go:55-57).
  */
final class NotARule

/** A plugin whose static initializer throws: loading must produce a
  * Left (the reference's plugin.Open failure path), not crash compile —
  * ExceptionInInitializerError is a LinkageError, outside NonFatal.
  */
object ExplodingInitRule extends Rule {
  if (true) sys.error("boom during <clinit>")
  val name = "exploding"
  def apply(df: DataFrame): DataFrame = df
}

/** Fault injection: every task throws while the flag file exists, so a
  * streaming batch can be killed mid-flight (offsets logged, commit
  * log not) and the restart path exercised. Local-mode tests share the
  * JVM, so the object var reaches the "executor" closure; the path is
  * captured as a plain string at plan time.
  */
object FaultInjectingRule extends Rule {
  @volatile var flagPath: String = ""
  val name = "faultInject"
  override val eventType: Option[String] = Some("exampleEventType")
  def apply(df: DataFrame): DataFrame = {
    val flag = flagPath
    val s = df.sparkSession
    import s.implicits._
    df.select(col("Str"))
      .as[String]
      .map { v =>
        if (flag.nonEmpty && java.nio.file.Files.exists(java.nio.file.Paths.get(flag)))
          throw new RuntimeException(s"injected fault on $v")
        v
      }
      .toDF("result")
  }
}
