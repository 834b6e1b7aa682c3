package graft.rules

import scala.util.control.NonFatal

/** Runtime rule loading — the Spark replacement for the reference's Go
  * plugin model (rule.go:45-62 `plugin.Open` + `Lookup("Rule")` + the
  * `Rule` type assertion, sanity-checked by `-checkRule`, rule.go:31-43).
  *
  * A pipeline's `plugin` field resolves in two steps:
  *   1. the compiled-in registry (the common case — the reference's
  *      pre-built .so files);
  *   2. reflection by fully-qualified class name: a Scala `object`
  *      (via its `MODULE$` singleton) or a zero-arg class, either of
  *      which must implement [[graft.rules.Rule]].
  *
  * So a user can drop a rule on the classpath (`--jars` on a cluster)
  * and reference it from the JSON DSL without recompiling the engine —
  * the same extensibility contract as the reference, with the JVM
  * classloader standing in for `dlopen`.
  */
object RuleLoader {

  /** Resolve one plugin reference. Left mirrors the reference's error
    * shapes: "Unable to load plugin ..." (plugin.Open failure) and
    * "... is not a rule type" (failed type assertion, rule.go:55-57).
    */
  def load(ref: String, registry: Map[String, Rule]): Either[String, Rule] =
    registry.get(ref).map(Right(_)).getOrElse(reflect(ref))

  /** The effective registry for a set of plugin references: the
    * compiled-in rules plus whatever reflection can resolve. References
    * that resolve to nothing are simply absent — config validation then
    * reports them as "Invalid plugin for rule ...", matching the
    * reference's validateConfig behavior.
    */
  def resolveAll(refs: Iterable[String], registry: Map[String, Rule]): Map[String, Rule] =
    refs.foldLeft(registry) { (acc, ref) =>
      if (acc.contains(ref)) acc
      else reflect(ref).fold(_ => acc, r => acc + (ref -> r))
    }

  /** Class.forName, separating "absent" (Right(None)) from "present but
    * failed to initialize" (Left). A plugin whose static initializer
    * throws must surface as a load error, not crash `compile`/-checkRule:
    * ExceptionInInitializerError is a LinkageError, which NonFatal
    * deliberately excludes, so it needs its own handler.
    */
  private def classFor(name: String): Either[String, Option[Class[_]]] =
    try Right(Some(Class.forName(name)))
    catch {
      case _: ClassNotFoundException | _: NoClassDefFoundError => Right(None)
      case e: LinkageError => Left(s"Unable to load plugin $name: $e")
    }

  private def reflect(className: String): Either[String, Rule] = {
    // A Scala `object Foo` compiles to Foo$ (the MODULE$ singleton)
    // plus a Foo mirror class of static forwarders — so the module
    // class must be probed FIRST or the mirror shadows it.
    val module: Either[String, Option[Any]] = classFor(className + "$").flatMap {
      case None => Right(None)
      case Some(c) =>
        try Right(Option(c.getField("MODULE$").get(null)))
        catch {
          // Deferred static init runs at first MODULE$ access — a
          // throwing plugin constructor lands here as a LinkageError.
          case e: LinkageError => Left(s"Unable to load plugin $className: $e")
          case NonFatal(_)     => Right(None) // a Foo$ that isn't a Scala module — try the class form
        }
    }
    val instance: Either[String, Any] = module.flatMap {
      case Some(m) => Right(m)
      case None =>
        classFor(className).flatMap {
          case None => Left(s"Unable to load plugin $className: class not found")
          case Some(c) =>
            try Right(c.getDeclaredConstructor().newInstance())
            catch {
              case e: LinkageError => Left(s"Unable to load plugin $className: $e")
              case NonFatal(e)     => Left(s"Unable to load plugin $className: $e")
            }
        }
    }
    instance.flatMap {
      case r: Rule => Right(r)
      case _       => Left(s"$className is not a rule type")
    }
  }
}
