package graft

import org.scalatest.funsuite.AnyFunSuite

/** The env-knob contract (SURVEY §2.6 L1): overrides parse, defaults
  * hold when unset, and garbage fails fast instead of silently running
  * with a default the caller did not ask for. */
class ConfigSpec extends AnyFunSuite {

  test("knobs default when the env var is unset") {
    assert(Config.intFrom(Map.empty, "GRAFT_X", 50) == 50)
    assert(Config.longFrom(Map.empty, "GRAFT_X", 16L) == 16L)
  }

  test("knobs parse env overrides, tolerating whitespace") {
    assert(Config.intFrom(Map("GRAFT_X" -> "100"), "GRAFT_X", 50) == 100)
    assert(Config.longFrom(Map("GRAFT_X" -> " 8 "), "GRAFT_X", 16L) == 8L)
  }

  test("non-numeric and non-positive overrides fail fast, naming the knob") {
    val bad = intercept[IllegalArgumentException] {
      Config.intFrom(Map("GRAFT_X" -> "lots"), "GRAFT_X", 50)
    }
    assert(bad.getMessage.contains("GRAFT_X"))
    intercept[IllegalArgumentException] {
      Config.longFrom(Map("GRAFT_X" -> "0"), "GRAFT_X", 16L)
    }
    intercept[IllegalArgumentException] {
      Config.intFrom(Map("GRAFT_X" -> "-3"), "GRAFT_X", 50)
    }
  }

  test("graded defaults are live in the loaded Config") {
    // the hash gate's contract: with no env set (the driver sets none),
    // every knob reproduces the graded constants
    if (!sys.env.keys.exists(_.startsWith("GRAFT_"))) {
      assert(Config.TopKRows == 50)
      assert(Config.SeqBudget == 512)
      assert(Config.DeliveryShards == 16L)
      assert(Config.MaxBucket == 10000)
      assert(Config.MaxFrameBucket == 10000)
      assert(Config.MrlAuditMod == 2L)
    }
  }
}
