package pkel.blocking

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import pkel.model.OntologyEntry
import pkel.ontology.Ontology
import pkel.text.{BasicNormalizer, PkTokenizer}

/** Stage-2 blocking: regex category matching prunes each mention's candidate
  * space to a subset of the ontology.
  *
  * Behavioral port of `add_ontology_subset_to_examples`
  * (`/root/reference/pk_el/ontology_preprocessing.py:191-249`). Adds
  * `subsetted_concepts: array<string>` (sorted-distinct candidate param ids)
  * and `subset_matched: boolean`. The ontology maps are closed over by a
  * single UDF (the category tables are tiny and executor-resident — the
  * ontology never shuffles).
  */
object CategoryBlocker {

  /** Pure kernel: mention text → (subsetMatched, candidate param ids). */
  def subsetFor(mention: String, categoryToParams: Map[String, Seq[String]]): (Boolean, Seq[String]) = {
    val mentionText = BasicNormalizer(Option(mention).getOrElse(""))
    val pkTokens = PkTokenizer(mentionText).mkString(" ")
    val cats = SubsetPatterns.applyCategoryPriority(SubsetPatterns.matchCategories(pkTokens, mentionText))
    if (cats.nonEmpty) {
      val ids = cats.flatMap(c => categoryToParams.getOrElse(c, Seq.empty))
      (true, ids.distinct.sorted)
    } else {
      val params = SubsetPatterns.matchParameters(pkTokens, mentionText)
      if (params.nonEmpty) (true, params.distinct.sorted)
      else (false, Seq.empty)
    }
  }

  /** Spark stage: adds subset_matched + subsetted_concepts from `mention`. */
  def withSubsets(mentions: DataFrame, entries: Seq[OntologyEntry]): DataFrame = {
    val catToParams = Ontology.categoryToParams(entries)
    val subsetUdf = udf((m: String) => {
      val (matched, ids) = subsetFor(m, catToParams)
      (matched, ids)
    })
    mentions
      .withColumn("subset_result", subsetUdf(col("mention")))
      .withColumn("subset_matched", col("subset_result._1"))
      .withColumn("subsetted_concepts", col("subset_result._2"))
      .drop("subset_result")
  }
}
