package graft.model

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The canonical sink record — the only fixed schema in the reference
  * system (reference: output/event.go:9-20). Sinks serialize this as
  * JSON-lines; rules emit it from `Process` and window flushes.
  */
case class OutputEvent(
    Source: String,
    EventTime: java.sql.Timestamp,
    EventType: String,
    Name: String,
    Level: Int,
    EventId: String,
    Entity: String,
    SourceIP: String,
    Body: Map[String, String],
    Occurrences: Int
)

/** Severity codec (reference: output/event.go:22-55). Error=0, Warn=1,
  * Info=2; parsing is case-insensitive and accepts the "warning" alias;
  * unknown levels render as "unknown" and fail to parse.
  */
object Level {
  val Error = 0
  val Warn = 1
  val Info = 2

  def name(l: Int): String = l match {
    case Error => "error"
    case Warn  => "warn"
    case Info  => "info"
    case _     => "unknown"
  }

  def parse(s: String): Option[Int] = s.toLowerCase match {
    case "error"            => Some(Error)
    case "warn" | "warning" => Some(Warn)
    case "info"             => Some(Info)
    case _                  => None
  }

  /** Column form of `name` (codegen'd when/otherwise chain). */
  def nameCol(c: Column): Column =
    when(c === Error, "error")
      .when(c === Warn, "warn")
      .when(c === Info, "info")
      .otherwise("unknown")

  /** Column form of `parse`; unparseable levels become null. */
  def parseCol(c: Column): Column = {
    val lc = lower(c)
    when(lc === "error", Error)
      .when(lc === "warn" || lc === "warning", Warn)
      .when(lc === "info", Info)
      .otherwise(lit(null).cast("int"))
  }
}
