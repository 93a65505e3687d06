package pkel.text

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite

/** Byte-for-byte parity with the reference tokenizer on ALL real inputs:
  * every ontology name/synonym variant and every fixture mention surface
  * (829 distinct strings). The expected outputs were produced by executing
  * the reference implementation itself (`pk_el/tokenizers/pk_tokenizer.py`)
  * with the engine's drug-lexicon stub — this pins the north-rule
  * "identical blocking keys" requirement directly. */
class ReferenceParitySpec extends AnyFunSuite {

  test("blocking keys are byte-identical to the reference on all 829 real inputs") {
    val in = getClass.getResourceAsStream("/pkel/ref_tokens.json")
    require(in != null)
    val root = new ObjectMapper().readTree(in)
    in.close()
    var total = 0
    val mismatches = Seq.newBuilder[String]
    root.forEach { node =>
      val input = node.get("input").asText()
      val expected = {
        val b = Seq.newBuilder[String]
        node.get("tokens").forEach(t => b += t.asText())
        b.result()
      }
      if (!expected.headOption.contains("<ERROR>")) {
        total += 1
        val got = PkTokenizer(BasicNormalizer(input))
        if (got != expected)
          mismatches += s"'$input': ref=${expected.mkString(",")} ours=${got.mkString(",")}"
      }
    }
    val ms = mismatches.result()
    assert(total >= 800, s"parity corpus unexpectedly small: $total")
    assert(ms.isEmpty, s"${ms.size} mismatches:\n${ms.take(20).mkString("\n")}")
  }
}
