package pkel.tools

import com.fasterxml.jackson.databind.ObjectMapper

import pkel.text.{BasicNormalizer, PkTokenizer}

/** Byte-for-byte parity check of the blocking-key kernel against a dump of
  * the reference tokenizer's output (produced driver-side):
  * `sbt "Test/runMain pkel.tools.ParityDrive /tmp/ref_tokens.json"` */
object ParityDrive {
  def main(args: Array[String]): Unit = {
    val path = args.headOption.getOrElse("/tmp/ref_tokens.json")
    val mapper = new ObjectMapper()
    val root = mapper.readTree(new java.io.File(path))
    var total = 0
    var mismatches = 0
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
        if (got != expected) {
          mismatches += 1
          println(s"MISMATCH '$input'\n  ref : ${expected.mkString("[", ",", "]")}\n  ours: ${got.mkString("[", ",", "]")}")
        }
      }
    }
    println(s"PARITY: $total inputs, $mismatches mismatches")
  }
}
