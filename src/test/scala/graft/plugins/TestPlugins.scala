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
