package pkel.link

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.functions._

import pkel.SparkSpec
import pkel.io.MentionReader
import pkel.ontology.Ontology

/** Per-mention parity of the exact tier with the REFERENCE IMPLEMENTATION:
  * the vendored dump was produced by executing the reference's own
  * `find_exact_params` / NIL-exclusion / disambiguation control flow
  * (`exact_linker.py`) over the test fixtures. Every (y_pred, status) must
  * match ('table_default' folds into 'linked', which is how the reference
  * reports the Q57 table rule). */
class ReferenceExactParitySpec extends SparkSpec {

  test("exact tier predictions are identical to the reference on all 568 test mentions") {
    val entries = Ontology.load()
    val index = Ontology.blockingIndex(entries)

    // reference dump → map (modality, text, span_start) → (y_pred, status)
    val in = getClass.getResourceAsStream("/pkel/ref_exact.json")
    val root = new ObjectMapper().readTree(in)
    in.close()
    val expected = scala.collection.mutable.Map.empty[(String, String, Int), (String, String)]
    root.forEach { n =>
      expected((n.get("modality").asText(), n.get("text").asText(), n.get("span_start").asInt())) =
        (n.get("y_pred").asText(), n.get("status").asText())
    }
    assert(expected.size >= 500)

    var checked = 0
    val mismatches = Seq.newBuilder[String]
    Seq(("sentences", false), ("tables", true)).foreach { case (modality, isTable) =>
      val mentions = MentionReader.readJsonl(spark,
        resourcePath(s"/pkel/data/$modality/test.jsonl"), isTable = isTable)
      val linked = ExactLinker.link(spark, ExactLinker.withBlockingKey(mentions), index)
        .select("text", "span_start", "y_pred", "status").collect()
      linked.foreach { r =>
        val key = (modality, r.getString(0), r.getInt(1))
        expected.get(key).foreach { case (refPred, refStatus) =>
          checked += 1
          val ourStatus = r.getString(3) match {
            case ExactLinker.StatusTableDefault => "linked"
            case s => s
          }
          if (r.getString(2) != refPred || ourStatus != refStatus)
            mismatches += s"$key ref=($refPred,$refStatus) ours=(${r.getString(2)},$ourStatus)"
        }
      }
    }
    info(s"checked $checked mentions against the reference run")
    assert(checked >= 560, s"too few joined mentions: $checked")
    val ms = mismatches.result()
    assert(ms.isEmpty, s"${ms.size} mismatches:\n${ms.take(20).mkString("\n")}")
  }
}
