package graft.pipeline

import org.json4s._
import org.json4s.jackson.JsonMethods

/** The JSON pipeline DSL — same five keys as the reference
  * (pipeline.go:21-28): eventFolder (schema-registry reference), rules
  * ({source, plugin, state?, sink?}, rule.go:24-29), states
  * ({type: KV|Count}), sources ({type, *_config}, input/input.go:14-19)
  * and sinks ({type, *_config}, output/output.go:7-11).
  *
  * `plugin` names a rule in graft's rule registry instead of a compiled
  * .so file; `state` maps onto a per-rule state/checkpoint key-space
  * rather than a BoltDB file.
  */
final case class RuleConfig(
    source: String,
    plugin: String,
    state: Option[String],
    sink: Option[String]
)

final case class StateConfig(`type`: String)

final case class SourceConfig(
    `type`: String,
    path: Option[String],
    format: Option[String],
    /** Kafka connection settings (reference kafka_config: broker,
      * topic, partitions). `kafkaPartitions` = the reference's
      * explicit partition list 0..N-1 (input/kafka.go:35-40 consumes
      * exactly those); None/0 = subscribe to the whole topic.
      */
    kafkaBroker: Option[String] = None,
    kafkaTopic: Option[String] = None,
    kafkaPartitions: Option[Int] = None,
    /** CertStream websocket URL (reference cert_stream.go:16 hardcodes
      * the calidog feed; here it's `certstream_config.url`). When set,
      * the compiler starts a [[graft.sources.WebSocketSpool]] bridge
      * writing into `path`; without it, `path` replays a captured
      * spool — the same engine-side pipeline either way.
      */
    wsUrl: Option[String] = None,
    /** `max_files_per_trigger`: micro-batch size cap for streaming
      * file-spool sources (File/CertStream/Kinesis replay) — Spark's
      * maxFilesPerTrigger. The ingest throttle a served spool pipeline
      * needs at scale: without it, AvailableNow over a deep backlog
      * plans arbitrarily large batches (state updates, shuffles and
      * sink commits sized by the whole backlog instead of a bounded
      * window), and a restart replays its whole in-flight batch.
      * None = Spark's default (unbounded under AvailableNow).
      */
    maxFilesPerTrigger: Option[Int] = None,
    /** `max_offsets_per_trigger`: the Kafka-source analogue of
      * `max_files_per_trigger` — Spark's maxOffsetsPerTrigger, a cap
      * on the total offsets consumed per micro-batch (spread across
      * the topic's partitions). The first scale knob a real broker
      * deployment needs: a freshly subscribed pipeline behind a deep
      * topic, or one restarted after downtime, otherwise plans its
      * whole backlog as ONE batch. None = unbounded (Spark default).
      */
    maxOffsetsPerTrigger: Option[Long] = None
)

final case class SinkConfig(
    `type`: String,
    path: Option[String],
    format: Option[String] = None,
    partitionBy: Seq[String] = Nil
)

final case class PipelineConfig(
    eventFolder: String,
    rules: Map[String, RuleConfig],
    states: Map[String, StateConfig],
    sources: Map[String, SourceConfig],
    sinks: Map[String, SinkConfig],
    /** Streaming state-store provider: "rocksdb" (default — state on
      * executor local disk, key space bounded by disk not heap; the
      * posture the reference's BoltDB substrate has, state/kv.go:16-80)
      * or "hdfs" (Spark's heap-backed default provider, state bounded
      * by executor memory — only for small-state pipelines or
      * comparisons). Applied when the pipeline STARTS; a query
      * restarted from an existing checkpoint keeps the provider it
      * started under (Spark pins it in the offset-log metadata).
      */
    stateStore: Option[String] = None
)

object PipelineConfig {

  /** Parse the JSON DSL (reference: pipeline.go:30-35). Accepts both
    * graft-native source/sink configs ({type, path}) and the reference's
    * nested `file_config`/`kafka_config` blocks.
    */
  def parse(raw: String): Either[String, PipelineConfig] =
    try {
      val j = JsonMethods.parse(raw)
      def str(v: JValue): Option[String] = v match {
        case JString(s) => Some(s)
        case _          => None
      }
      def objMap(v: JValue): Map[String, JValue] = v match {
        case JObject(fields) => fields.toMap
        case _               => Map.empty
      }
      val root = objMap(j)

      val rules = objMap(root.getOrElse("rules", JObject())).map { case (name, rv) =>
        val o = objMap(rv)
        name -> RuleConfig(
          source = str(o.getOrElse("source", JNothing)).getOrElse(""),
          plugin = str(o.getOrElse("plugin", JNothing)).getOrElse(""),
          state = str(o.getOrElse("state", JNothing)).filter(_.nonEmpty),
          sink = str(o.getOrElse("sink", JNothing)).filter(_.nonEmpty)
        )
      }
      val states = objMap(root.getOrElse("states", JObject())).map { case (name, sv) =>
        name -> StateConfig(str(objMap(sv).getOrElse("type", JNothing)).getOrElse(""))
      }
      val sources = objMap(root.getOrElse("sources", JObject())).map { case (name, sv) =>
        val o = objMap(sv)
        val nested = objMap(o.getOrElse("file_config", JNothing))
        // reference input/kafka.go:10-14 — {broker, topic, partitions}.
        // partitions is not a parallelism hint: createPartitionConsumers
        // consumes EXACTLY partitions 0..N-1, so it maps to an explicit
        // `assign` list (PipelineCompiler.kafkaSourceOptions).
        val kafka = objMap(o.getOrElse("kafka_config", JNothing))
        // present-but-invalid is a CONFIG ERROR, not a silent fallback
        // (for the trigger caps, to unthrottled batches — the exact
        // failure the knobs prevent; for partitions, to whole-topic
        // subscribe). isValidInt/isValidLong guards: a JSON integer
        // past the target width must land in the error arm, not wrap
        // through BigInt.toInt (2^31 -> negative, 2^32+1 -> 1).
        def posIntegral(field: String, v: JValue, max: BigInt): Option[Long] = v match {
          case JNothing                                  => None
          case JInt(n) if n > 0 && n <= max              => Some(n.toLong)
          case JDouble(n) if n > 0 && n == math.floor(n) && BigDecimal(n) <= BigDecimal(max) =>
            Some(n.toLong)
          case bad =>
            throw new IllegalArgumentException(
              s"source $name: $field must be a positive integer (<= $max), got " +
                JsonMethods.compact(JsonMethods.render(bad)))
        }
        val kafkaParts = kafka.getOrElse("partitions", JNothing) match {
          // 0 stays the documented whole-topic-subscribe form (absent
          // partition list), not an error
          case JInt(n) if n == 0    => None
          case JDouble(n) if n == 0 => None
          case v                    => posIntegral("kafka_config.partitions", v, Int.MaxValue).map(_.toInt)
        }
        val maxFiles =
          posIntegral("max_files_per_trigger", o.getOrElse("max_files_per_trigger", JNothing), Int.MaxValue)
            .map(_.toInt)
        val maxOffsets =
          posIntegral("max_offsets_per_trigger", o.getOrElse("max_offsets_per_trigger", JNothing), Long.MaxValue)
        name -> SourceConfig(
          `type` = str(o.getOrElse("type", JNothing)).getOrElse(""),
          path = str(o.getOrElse("path", JNothing)).orElse(str(nested.getOrElse("path", JNothing))),
          format = str(o.getOrElse("format", JNothing)),
          kafkaBroker = str(kafka.getOrElse("broker", JNothing)).filter(_.nonEmpty),
          kafkaTopic = str(kafka.getOrElse("topic", JNothing)).filter(_.nonEmpty),
          kafkaPartitions = kafkaParts,
          wsUrl = str(
            objMap(o.getOrElse("certstream_config", JNothing)).getOrElse("url", JNothing))
            .filter(_.nonEmpty),
          maxFilesPerTrigger = maxFiles,
          maxOffsetsPerTrigger = maxOffsets
        )
      }
      val sinks = objMap(root.getOrElse("sinks", JObject())).map { case (name, sv) =>
        val o = objMap(sv)
        val nested = objMap(o.getOrElse("file_config", JNothing))
        val partitionBy = o.getOrElse("partition_by", JNothing) match {
          case JArray(vs) => vs.flatMap(str)
          case JString(s) => Seq(s)
          case _          => Nil
        }
        name -> SinkConfig(
          `type` = str(o.getOrElse("type", JNothing)).getOrElse(""),
          path = str(o.getOrElse("path", JNothing)).orElse(str(nested.getOrElse("path", JNothing))),
          format = str(o.getOrElse("format", JNothing)),
          partitionBy = partitionBy
        )
      }
      Right(
        PipelineConfig(
          eventFolder = str(root.getOrElse("eventFolder", JNothing)).getOrElse(""),
          rules = rules,
          states = states,
          sources = sources,
          sinks = sinks,
          stateStore = str(root.getOrElse("stateStore", JNothing)).map(_.toLowerCase).filter(_.nonEmpty)
        )
      )
    } catch {
      case e: Exception => Left(s"config parse error: ${e.getMessage}")
    }

  /** All checks of the reference's validateConfig (pipeline.go:37-87):
    * rule sources/sinks/states must exist, names must be globally
    * unique, each state is owned by exactly one rule, and the rule's
    * plugin must exist in the registry (replacing the .so stat check).
    */
  def validate(c: PipelineConfig, ruleRegistry: Set[String]): Either[String, PipelineConfig] = {
    c.stateStore.foreach { s =>
      if (s != "rocksdb" && s != "hdfs")
        return Left(s"Invalid stateStore: $s (expected rocksdb or hdfs)")
    }
    // A trigger cap on a source type that can't honor it would be
    // silently ignored by the compiler — the silent-unthrottled
    // fallback both knobs exist to prevent, so it's a config error.
    for ((name, src) <- c.sources) {
      if (src.maxOffsetsPerTrigger.isDefined && src.`type` != "Kafka")
        return Left(
          s"Invalid source $name: max_offsets_per_trigger applies only to Kafka sources " +
            s"(use max_files_per_trigger for ${src.`type`})")
      if (src.maxFilesPerTrigger.isDefined && src.`type` == "Kafka")
        return Left(
          s"Invalid source $name: max_files_per_trigger applies only to file-spool sources " +
            "(use max_offsets_per_trigger for Kafka)")
    }
    val stateUsage = scala.collection.mutable.Map.empty[String, Int]
    for ((ruleName, rule) <- c.rules) {
      if (!c.sources.contains(rule.source) && !c.rules.contains(rule.source))
        return Left(s"Invalid source for rule $ruleName: ${rule.source}")
      rule.sink.foreach { snk =>
        if (!c.sinks.contains(snk) && !c.rules.contains(snk))
          return Left(s"Invalid sink for rule $ruleName: $snk")
      }
      rule.state.foreach { st =>
        if (!c.states.contains(st))
          return Left(s"Invalid state for rule $ruleName: $st")
        stateUsage(st) = stateUsage.getOrElse(st, 0) + 1
      }
      if (!ruleRegistry.contains(rule.plugin))
        return Left(s"Invalid plugin for rule $ruleName: ${rule.plugin}")
    }

    val allKeys =
      c.sources.keys.toSeq ++ c.rules.keys.toSeq ++ c.sinks.keys.toSeq ++ c.states.keys.toSeq
    val dups = allKeys.groupBy(identity).collect { case (k, vs) if vs.size > 1 => k }
    if (dups.nonEmpty)
      return Left(s"Invalid configuration, duplicate keys: ${dups.mkString(",")}")

    stateUsage.find(_._2 > 1).foreach { case (st, _) =>
      return Left(s"Invalid rule configuration, only one rule can use each state but found multiple use state: $st")
    }

    // The rule graph must be a DAG (a cycle would recurse forever in the
    // compiler). Edges among rules: parent-rule-as-source and
    // rule-as-sink; Kahn's algorithm, leftover nodes = a cycle.
    val edges = c.rules.toSeq.flatMap { case (name, rule) =>
      rule.sink.filter(c.rules.contains).map(name -> _).toSeq ++
        (if (c.rules.contains(rule.source)) Seq(rule.source -> name) else Nil)
    }.distinct
    val inDeg = scala.collection.mutable.Map.empty[String, Int].withDefaultValue(0)
    val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    edges.foreach { case (_, to) => inDeg(to) += 1 }
    val queue = scala.collection.mutable.Queue(c.rules.keys.filter(inDeg(_) == 0).toSeq: _*)
    var visited = 0
    while (queue.nonEmpty) {
      val n = queue.dequeue()
      visited += 1
      adj.getOrElse(n, Nil).foreach { m =>
        inDeg(m) -= 1
        if (inDeg(m) == 0) queue.enqueue(m)
      }
    }
    if (visited < c.rules.size) {
      val cyclic = c.rules.keys.filter(inDeg(_) > 0).toSeq.sorted
      return Left(s"Invalid configuration, rule cycle involving: ${cyclic.mkString(",")}")
    }
    Right(c)
  }
}
