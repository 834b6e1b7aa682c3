package graft.rules

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Plugin-load parity with the reference: registry hit, dlopen-style
  * class load (object and class forms), the "not a rule type"
  * assertion, and the unloadable-plugin error (rule.go:31-62).
  */
class RuleLoaderSpec extends AnyFunSuite with Matchers {

  test("registry hit wins over reflection") {
    val r = RuleLoader.load("aRule", graft.pipeline.PipelineCompiler.builtinRules)
    r.toOption.get.name shouldBe "aRule"
  }

  test("a Scala object rule loads by its source-level class name") {
    val r = RuleLoader.load("graft.plugins.ShoutRule", Map.empty)
    r.toOption.get.name shouldBe "shoutRule"
    // Same singleton, not a copy.
    r.toOption.get should be theSameInstanceAs graft.plugins.ShoutRule
  }

  test("a zero-arg rule class instantiates reflectively") {
    val r = RuleLoader.load("graft.plugins.SuffixRule", Map.empty)
    r.toOption.get.name shouldBe "suffixRule"
  }

  test("a class that is not a Rule is rejected like the reference's type assertion") {
    val r = RuleLoader.load("graft.plugins.NotARule", Map.empty)
    r.left.toOption.get should include("not a rule type")
  }

  test("an unknown class is an unable-to-load error") {
    val r = RuleLoader.load("graft.plugins.DoesNotExist", Map.empty)
    r.left.toOption.get should include("Unable to load plugin")
  }

  test("resolveAll adds loadable refs and silently skips unresolvable ones") {
    val resolved = RuleLoader.resolveAll(
      Seq("graft.plugins.ShoutRule", "graft.plugins.DoesNotExist", "graft.plugins.NotARule"),
      Map.empty
    )
    resolved.keySet shouldBe Set("graft.plugins.ShoutRule")
  }
}
