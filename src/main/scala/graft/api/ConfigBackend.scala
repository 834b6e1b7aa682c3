package graft.api

import java.nio.file.{Files, Paths}

/** Pipeline-config persistence — the reference's `backend` interface
  * (backend.go:17-21): raw pre-validated config bytes keyed by the
  * pipeline UUID, so GET can return them byte-faithfully. Backends are
  * chosen by name like the reference's factory (backend.go:29-57) with
  * the same loud invalid-type error:
  *
  *   - "fs"       → [[FsConfigStore]], one file per UUID — the
  *                  single-node store standing in for BoltDB
  *                  (backend.go:64-100 — also a local file).
  *   - "dynamodb" → [[RemoteConfigStore]] over an injected [[RemoteKv]]
  *                  transport (PutItem/GetItem on a UUID→Config table,
  *                  backend.go:131-162). The AWS SDK is not available
  *                  in this environment, so the retry/backoff logic is
  *                  real and tested while the wire call is the
  *                  injected seam — the Media.Codec pattern.
  */
trait ConfigStore {
  def put(id: String, config: Array[Byte]): Unit
  def get(id: String): Option[Array[Byte]]

  /** Every persisted config, for start-up reload (backend Init). */
  def loadAll(): Map[String, Array[Byte]]
}

object ConfigStore {
  def apply(
      kind: String,
      dir: String = "",
      remote: Option[RemoteKv] = None
  ): Either[String, ConfigStore] = kind match {
    case "fs" => Right(new FsConfigStore(dir))
    case "dynamodb" =>
      remote
        .toRight("dynamodb backend needs a RemoteKv transport (AWS SDK unavailable here)")
        .map(kv => new RemoteConfigStore(kv))
    case other => Left(s"Invalid backend type $other")
  }
}

/** Filesystem store: one file per UUID under `dir`. */
final class FsConfigStore(dir: String) extends ConfigStore {
  Files.createDirectories(Paths.get(dir))

  /** Ids are server-generated UUIDs — a single path segment under
    * `dir`, nothing else. An id arriving from the HTTP path could
    * carry separators or `..` (URI.getPath decodes %2F), so resolve
    * and verify containment: anything that escapes or nests below the
    * store directory is rejected, never read or written.
    */
  private def safePath(id: String): Option[java.nio.file.Path] = {
    val base = Paths.get(dir).toAbsolutePath.normalize
    val p = base.resolve(id).normalize
    if (p.getParent == base && p.startsWith(base) && !id.contains("/") && !id.contains("\\"))
      Some(p)
    else None
  }

  def put(id: String, config: Array[Byte]): Unit = {
    val p = safePath(id).getOrElse(sys.error(s"invalid config id: $id"))
    Files.write(p, config)
    ()
  }

  def get(id: String): Option[Array[Byte]] =
    safePath(id).filter(Files.isRegularFile(_)).map(Files.readAllBytes)

  def loadAll(): Map[String, Array[Byte]] = {
    val s = Files.list(Paths.get(dir))
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala
        .filter(Files.isRegularFile(_))
        .map(p => p.getFileName.toString -> Files.readAllBytes(p))
        .toMap
    } finally s.close()
  }
}

/** The remote KV wire seam (DynamoDB PutItem/GetItem/Scan parity).
  * Implementations signal THROTTLING-class failures — the reference
  * retries ProvisionedThroughputExceeded and InternalServerError
  * (backend.go:148-158) — with [[RetriableKvException]]; anything else
  * propagates immediately.
  */
trait RemoteKv {
  def putItem(id: String, config: Array[Byte]): Unit
  def getItem(id: String): Option[Array[Byte]]
  def scanAll(): Map[String, Array[Byte]]
}

final class RetriableKvException(msg: String) extends RuntimeException(msg)

/** Retrying store over a [[RemoteKv]]: exponential backoff of
  * 2^attempt × 100 ms for up to `retries` retriable failures — the
  * AWS-recommended schedule the reference cites (its Go `2^attempt`
  * is actually XOR, a reference bug not worth reproducing). `sleep`
  * is injectable so tests assert the schedule without waiting it out.
  */
final class RemoteConfigStore(
    kv: RemoteKv,
    retries: Int = 3,
    sleep: Long => Unit = Thread.sleep
) extends ConfigStore {

  private def withRetry[A](op: => A): A = {
    var attempt = 0
    while (true) {
      try return op
      catch {
        case e: RetriableKvException =>
          attempt += 1
          if (attempt > retries) throw e
          sleep((1L << attempt) * 100L)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  def put(id: String, config: Array[Byte]): Unit = withRetry(kv.putItem(id, config))
  def get(id: String): Option[Array[Byte]] = withRetry(kv.getItem(id))
  def loadAll(): Map[String, Array[Byte]] = withRetry(kv.scanAll())
}
