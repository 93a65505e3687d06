package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench JSON line is the driver's only structured perf channel (round 1
  * lost its metrics to a parse failure) — pin that it stays valid JSON with
  * the contract fields, including under hostile names. */
class BenchJsonSpec extends AnyFunSuite {

  private def parse(s: String): com.fasterxml.jackson.databind.JsonNode =
    new com.fasterxml.jackson.databind.ObjectMapper().readTree(s)

  test("json line parses and carries the contract fields") {
    val line = Bench.jsonLine(
      Seq("q_a" -> 1.25, "q_b" -> 0.5, "el_pair_scoring" -> 2.0),
      "/root/testdata/sf0.1", 1234L, 5.67e6, "32", Seq("q_broken"))
    val n = parse(line)
    assert(n.get("metric").asText() == "total")
    assert(math.abs(n.get("value").asDouble() - 3.75) < 1e-9)
    assert(n.get("unit").asText() == "sec")
    assert(n.get("queries").get("q_a").asDouble() == 1.25)
    assert(n.get("scored_pairs").asLong() == 1234L)
    assert(n.get("scored_pairs_per_sec").asDouble() == 5.67e6)
    assert(n.get("failed").get(0).asText() == "q_broken")
  }

  test("hostile characters in names are escaped, not emitted raw") {
    val line = Bench.jsonLine(
      Seq("q_\"quote\"\\slash\n" -> 1.0), "dir\"x", 0L, 0.0, "8", Seq("f\"ail"))
    val n = parse(line) // would throw on broken escaping
    assert(n.get("sf").asText() == "dir\"x")
    assert(n.get("failed").get(0).asText() == "f\"ail")
  }

  test("noise-probe samples and their max/min ratio ride the line") {
    val line = Bench.jsonLine(
      Seq("q_a" -> 1.0), "sf", 0L, 0.0, "32", Nil,
      probes = Seq("p_start" -> 0.5, "p_q10" -> 1.5, "p_end" -> 0.75))
    val n = parse(line)
    assert(n.get("noise_probe_sec").get("p_q10").asDouble() == 1.5)
    assert(math.abs(n.get("noise_ratio").asDouble() - 3.0) < 1e-9)
    // probe-free lines stay byte-compatible with earlier rounds' parsers
    assert(parse(Bench.jsonLine(Seq("q_a" -> 1.0), "sf", 0L, 0.0, "32", Nil))
      .get("noise_probe_sec") == null)
  }

  test("every registered battery query name is JSON-safe as-is") {
    val line = Bench.jsonLine(
      SparkEntry.queries.keys.toSeq.map(_ -> 0.0), "sf", 0L, 0.0, "32", Nil)
    assert(parse(line).get("queries").size() == SparkEntry.queries.size)
  }
}
