package graft.model

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.types.StructType
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Folder-based schema registry: the declarative replacement for the
  * reference's event-type plugin folder (event_types.go:18-50 — glob
  * the folder, load every plugin, register in load order). Instead of
  * compiled `.so` decoders, a folder of JSON files:
  *
  * {{{
  *   { "name": "myEvent",
  *     "ddl": "eventId STRING, ts TIMESTAMP, payload STRING",
  *     "required": ["eventId", "ts"],
  *     "raw": false }
  * }}}
  *
  * `ddl` is a Spark StructType DDL string (`StructType.fromDDL`).
  * Files load in sorted-name order — the reference's glob order is
  * filesystem-dependent (a dispatch-semantics wart SURVEY §1.1 calls
  * out); sorting makes first-match dispatch deterministic.
  */
object SchemaFolder {

  def isFolder(path: String): Boolean =
    path.nonEmpty && path != "builtin" && Files.isDirectory(Paths.get(path))

  def load(folder: String): Seq[EventType] = {
    // Files.list holds a directory handle until closed — leak-free via Using.
    val files = scala.util.Using.resource(Files.list(Paths.get(folder))) { stream =>
      stream
        .iterator()
        .asScala
        .filter(p => Files.isRegularFile(p) && p.getFileName.toString.endsWith(".json"))
        .toSeq
    }.sortBy(_.getFileName.toString)
    files.map(parseFile)
  }

  private def parseFile(p: Path): EventType = {
    val j = JsonMethods.parse(new String(Files.readAllBytes(p), "UTF-8"))
    def str(field: String): Option[String] = j \ field match {
      case JString(s) => Some(s)
      case _          => None
    }
    val name = str("name").getOrElse(sys.error(s"$p: missing name"))
    val ddl = str("ddl").getOrElse(sys.error(s"$p: missing ddl"))
    val required = j \ "required" match {
      case JArray(vs) => vs.collect { case JString(s) => s }
      case _          => Nil
    }
    val raw = j \ "raw" match {
      case JBool(b) => b
      case _        => false
    }
    EventType(name, StructType.fromDDL(ddl), required, raw)
  }
}
