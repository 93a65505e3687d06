package pkel.eval

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Evaluation aggregates.
  *
  * A1/A2 mirror `/root/reference/pk_el/evaluation.py:25-89` (micro P/R/F1 =
  * accuracy for single-label multiclass; macro F1 over the union of observed
  * classes; MRR / Recall@k over ranked candidate lists). A9 (pairwise F1 over
  * entity clusters) is the graft's north-rule metric: computed purely with
  * groupBy arithmetic on cluster sizes — no pair materialization — so it
  * scales to arbitrarily large cluster assignments.
  */
object Metrics {

  final case class ClassificationMetrics(
      micP: Double, micR: Double, micF1: Double, macF1: Double, accuracy: Double, n: Long)

  /** Micro/macro scores over (y_true, y_pred) columns. */
  def evaluate(preds: DataFrame): ClassificationMetrics = {
    val n = preds.count()
    if (n == 0) return ClassificationMetrics(0, 0, 0, 0, 0, 0)
    val correct = preds.filter(col("y_true") === col("y_pred")).count()
    val micro = correct.toDouble / n

    // per-class TP/FP/FN in two small aggregations over the label union
    val perTrue = preds.groupBy(col("y_true").as("cls"))
      .agg(count(lit(1)).as("support"),
        sum(when(col("y_true") === col("y_pred"), 1L).otherwise(0L)).as("tp"))
    val perPred = preds.groupBy(col("y_pred").as("cls")).agg(count(lit(1)).as("predicted"))
    val joined = perTrue.join(perPred, Seq("cls"), "full_outer")
      .na.fill(0L, Seq("support", "tp", "predicted"))
      .select(col("cls"), col("tp"),
        (col("support") - col("tp")).as("fn"),
        (col("predicted") - col("tp")).as("fp"))
      .collect()
    val f1s = joined.map { r =>
      val tp = r.getLong(1).toDouble; val fn = r.getLong(2).toDouble; val fp = r.getLong(3).toDouble
      val p = if (tp + fp > 0) tp / (tp + fp) else 0.0
      val rr = if (tp + fn > 0) tp / (tp + fn) else 0.0
      if (p + rr > 0) 2 * p * rr / (p + rr) else 0.0
    }
    val macroF1 = if (f1s.nonEmpty) f1s.sum / f1s.length else 0.0
    ClassificationMetrics(micro, micro, micro, macroF1, micro, n)
  }

  final case class RetrievalMetrics(mrr: Double, recallAtK: Double, topMetrics: ClassificationMetrics)

  /** MRR + Recall@k over a DF with (y_true, pred_ids: array<string>,
    * y_pred = head or Q100). */
  def evaluateRetrieval(preds: DataFrame): RetrievalMetrics = {
    val n = preds.count()
    if (n == 0) return RetrievalMetrics(0, 0, ClassificationMetrics(0, 0, 0, 0, 0, 0))
    val withPos = preds.withColumn("pos", array_position(col("pred_ids"), col("y_true")))
    val agg = withPos.agg(
      avg(when(col("pos") > 0, lit(1.0) / col("pos")).otherwise(0.0)).as("mrr"),
      avg(when(col("pos") > 0, 1.0).otherwise(0.0)).as("recall")).head()
    RetrievalMetrics(agg.getDouble(0), agg.getDouble(1), evaluate(preds))
  }

  final case class PairwiseMetrics(precision: Double, recall: Double, f1: Double,
      tp: Long, predPairs: Long, goldPairs: Long)

  /** Pairwise cluster F1 (north-rule metric). `assignments` has columns
    * (gold, pred); rows whose gold or pred equals `nil` are excluded from the
    * respective pair universe (NIL is not an entity — reference drops NIL from
    * ontology/training, `ontology_preprocessing.py:36-39`).
    *
    * Computed from cluster-size arithmetic: TP = Σ_cells C(n,2) over the
    * (gold,pred) contingency table; gold pairs = Σ_gold C(n,2); predicted
    * pairs = Σ_pred C(n,2). Three shuffles, no pair blow-up.
    */
  def pairwiseF1(assignments: DataFrame, nil: String = "Q100"): PairwiseMetrics =
    pairwiseF1Grouped(assignments, Seq.empty, nil)

  /** Global AND at-blocking-key pairwise F1 in ONE job: a single data-scale
    * shuffle builds the (blocking_key, gold, pred) contingency cells; one
    * GROUPING SETS pass over the cells derives all six pair sums (tp and
    * both marginals, per scope) distinguished by grouping_id; one global
    * conditional aggregate collects them. The separate-scope path pays two
    * jobs of ~7 AQE stages each — measured 5.1 s warm over an 11k-row cached
    * table, almost all of it per-stage driver latency, vs one ~4-stage job
    * here. Arithmetic is identical to [[pairwiseF1]]/[[pairwiseF1AtBlockingKey]]
    * (pinned by MetricsSpec). */
  def pairwiseF1Both(assignments: DataFrame, nil: String = "Q100"): (PairwiseMetrics, PairwiseMetrics) = {
    val bk = col("blocking_key"); val g = col("gold"); val p = col("pred")
    val cells = assignments.groupBy(bk, g, p).agg(count(lit(1)).as("c"))
    // grouping_id bits over (blocking_key, gold, pred): 1 = column aggregated
    val sets = cells.groupingSets(
      Seq(Seq(bk, g, p), Seq(bk, g), Seq(bk, p), Seq(g, p), Seq(g), Seq(p)),
      bk, g, p)
      .agg(sum(col("c")).as("n"), grouping_id().as("gid"))
    def pairSum(gid: Int, cond: org.apache.spark.sql.Column) =
      coalesce(sum(when(col("gid") === gid && cond, expr("n * (n - 1) DIV 2"))), lit(0L))
    val r = sets.agg(
      pairSum(0, g =!= nil && p =!= nil).as("k_tp"),      // (bk,gold,pred)
      pairSum(1, g =!= nil).as("k_gold"),                 // (bk,gold): pred aggregated
      pairSum(2, p =!= nil).as("k_pred"),                 // (bk,pred): gold aggregated
      pairSum(4, g =!= nil && p =!= nil).as("g_tp"),      // (gold,pred): bk aggregated
      pairSum(5, g =!= nil).as("g_gold"),                 // (gold)
      pairSum(6, p =!= nil).as("g_pred"))                 // (pred)
      .head()
    def metrics(tp: Long, predPairs: Long, goldPairs: Long): PairwiseMetrics = {
      val prec = if (predPairs > 0) tp.toDouble / predPairs else 0.0
      val rec = if (goldPairs > 0) tp.toDouble / goldPairs else 0.0
      val f1 = if (prec + rec > 0) 2 * prec * rec / (prec + rec) else 0.0
      PairwiseMetrics(prec, rec, f1, tp, predPairs, goldPairs)
    }
    (metrics(r.getLong(3), r.getLong(5), r.getLong(4)),
      metrics(r.getLong(0), r.getLong(2), r.getLong(1)))
  }

  /** Shared engine for global / at-key pairwise F1: ONE data-scale shuffle
    * builds the (extraKeys…, gold, pred) contingency cells, and all three
    * pair sums (gold, predicted, true-positive) derive from the cells with
    * cell-scale aggregations — round 2 ran three separate data-scale
    * groupBys per scope. Marginals come from summing cells (a row's gold
    * margin counts every pred including NIL), so the numbers are identical.
    *
    * Round 6: the three sums run as ONE union job collected once (the
    * previous persist + three sequential actions paid four job launches per
    * scope — battery-visible overhead on small inputs and three extra
    * driver round-trips at any scale); the branches share the contingency
    * exchange via ReuseExchange, so data is still shuffled exactly once.
    * C(n,2) is codegen'd integer arithmetic (`n*(n-1) DIV 2`), not a UDF. */
  private def pairwiseF1Grouped(assignments: DataFrame, extraKeys: Seq[String],
      nil: String): PairwiseMetrics = {
    val keyCols = extraKeys.map(col)
    val cells = assignments
      .groupBy((keyCols :+ col("gold")) :+ col("pred"): _*)
      .agg(count(lit(1)).as("c"))
    def marginal(which: String): DataFrame =
      cells.filter(col(which) =!= nil)
        .groupBy((keyCols :+ col(which)): _*).agg(sum(col("c")).as("n"))
        .agg(coalesce(sum(expr("n * (n - 1) DIV 2")), lit(0L)).as("v"))
        .select(lit(which).as("k"), col("v"))
    val tpDf = cells.filter(col("gold") =!= nil && col("pred") =!= nil)
      .agg(coalesce(sum(expr("c * (c - 1) DIV 2")), lit(0L)).as("v"))
      .select(lit("tp").as("k"), col("v"))
    val sums = marginal("gold").unionByName(marginal("pred")).unionByName(tpDf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val goldPairs = sums("gold")
    val predPairs = sums("pred")
    val tp = sums("tp")
    val p = if (predPairs > 0) tp.toDouble / predPairs else 0.0
    val r = if (goldPairs > 0) tp.toDouble / goldPairs else 0.0
    val f1 = if (p + r > 0) 2 * p * r / (p + r) else 0.0
    PairwiseMetrics(p, r, f1, tp, predPairs, goldPairs)
  }

  /** North-rule variant: pairwise F1 restricted to mention pairs that share a
    * blocking key ("pairwise F1 ≥ 0.99 on labeled pairs at identical blocking
    * keys", BASELINE.json). Within each key group the contingency arithmetic
    * runs per (key, gold, pred) — still no pair materialization. */
  def pairwiseF1AtBlockingKey(assignments: DataFrame, nil: String = "Q100"): PairwiseMetrics =
    pairwiseF1Grouped(assignments, Seq("blocking_key"), nil)

  /** Confusion-matrix counts (A4, `evaluation.py:123-172` minus plotting):
    * (y_true, y_pred, n) — pivot client-side if a matrix is wanted. */
  def confusionCounts(preds: DataFrame): DataFrame =
    preds.groupBy("y_true", "y_pred").agg(count(lit(1)).as("n"))
      .orderBy("y_true", "y_pred")

  /** Row-normalized confusion matrix (A4, `evaluation.py:135-147` — the
    * percent-of-true-row normalization the reference computes before its
    * matplotlib heatmap; plotting stays out of scope). Shares in basis
    * points via integer-exact floor division so the DuckDB oracle reproduces
    * the numbers bit-for-bit. One count aggregation over the data, then a
    * window sum over the |classes|² confusion cells — the second exchange
    * moves cells, not data rows, so it is O(|classes|²) at any scale. */
  def confusionNormalized(preds: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("y_true")
    preds.groupBy("y_true", "y_pred").agg(count(lit(1)).as("n"))
      .withColumn("row_total", sum(col("n")).over(w))
      .withColumn("pct_bp", floor(lit(10000) * col("n") / col("row_total")).cast("long"))
      .select("y_true", "y_pred", "n", "row_total", "pct_bp")
      .orderBy("y_true", "y_pred")
  }

  /** Misclassification listing (A3, `evaluation.py:92-120`): first
    * `maxErrors` rows where y_true ≠ y_pred, with the display text. */
  def classificationErrors(preds: DataFrame, textCol: String = "text",
      maxErrors: Int = 100): DataFrame =
    preds.filter(col("y_true") =!= col("y_pred"))
      .select(col(textCol).as("text"), col("y_true").as("true"), col("y_pred").as("pred"))
      .limit(maxErrors)

  /** Per-source evaluation (A7/A8, `biencoder_linker.py:73-153`): one metrics
    * row per value of `sourceCol`, computed in a SINGLE pass over the data
    * (two small aggregations on (source, class)) instead of one job per
    * source. Collect size is bounded by |sources| × |classes|. */
  def evaluateBySource(preds: DataFrame, sourceCol: String = "source"): Map[String, ClassificationMetrics] = {
    val perTrue = preds.groupBy(col(sourceCol).as("src"), col("y_true").as("cls"))
      .agg(count(lit(1)).as("support"),
        sum(when(col("y_true") === col("y_pred"), 1L).otherwise(0L)).as("tp"))
    val perPred = preds.groupBy(col(sourceCol).as("src"), col("y_pred").as("cls"))
      .agg(count(lit(1)).as("predicted"))
    val rows = perTrue.join(perPred, Seq("src", "cls"), "full_outer")
      .na.fill(0L, Seq("support", "tp", "predicted"))
      .collect()
    rows.groupBy(_.getString(0)).map { case (src, cells) =>
      val n = cells.map(_.getAs[Long]("support")).sum
      val correct = cells.map(_.getAs[Long]("tp")).sum
      val micro = if (n > 0) correct.toDouble / n else 0.0
      val f1s = cells.map { r =>
        val tp = r.getAs[Long]("tp").toDouble
        val fn = r.getAs[Long]("support").toDouble - tp
        val fp = r.getAs[Long]("predicted").toDouble - tp
        val p = if (tp + fp > 0) tp / (tp + fp) else 0.0
        val rr = if (tp + fn > 0) tp / (tp + fn) else 0.0
        if (p + rr > 0) 2 * p * rr / (p + rr) else 0.0
      }
      val macroF1 = if (f1s.nonEmpty) f1s.sum / f1s.size else 0.0
      src -> ClassificationMetrics(micro, micro, micro, macroF1, micro, n)
    }
  }

  final case class RunStats(mean: Double, std: Double, n: Int)

  /** n-run mean/std (A7, `prompt_linker.py:313-381` — `evaluate_llm_runs`
    * aggregates micro-F1 across repeated stochastic runs; std is the
    * population std, numpy's default). */
  def runStats(values: Seq[Double]): RunStats = {
    if (values.isEmpty) return RunStats(0.0, 0.0, 0)
    val mean = values.sum / values.size
    val varPop = values.map(v => (v - mean) * (v - mean)).sum / values.size
    RunStats(mean, math.sqrt(varPop), values.size)
  }

  /** Evaluate each run's predictions, then summarize micro-F1 across runs. */
  def evaluateRuns(runs: Seq[DataFrame]): (Seq[ClassificationMetrics], RunStats) = {
    val per = runs.map(evaluate)
    (per, runStats(per.map(_.micF1)))
  }

  /** Label-distribution EDA (A6, `data_exploration.py:8-101`). */
  def labelDistribution(preds: DataFrame, labelCol: String = "label"): DataFrame =
    preds.groupBy(labelCol).agg(count(lit(1)).as("n")).orderBy(desc("n"), col(labelCol))

  /** Ontology-coverage EDA (A6, `data_exploration.py:8-56` —
    * `calculate_ontology_coverage(_by_category)` + the distribution share of
    * `generate_analysis_results` `:68-101`): per category, how many KB
    * parameters appear in the data at all, and what share of the label mass
    * the category carries. One row per category + a synthetic NIL row
    * (`category_to_params["NIL"] = {"Q100"}`, `:38`). */
  def ontologyCoverage(spark: SparkSession, labels: DataFrame,
      entries: Seq[pkel.model.OntologyEntry], labelCol: String = "label"): DataFrame = {
    import spark.implicits._
    val catRows = entries.map(e => (e.parameterCategory, e.parameterId)) :+ ("NIL", "Q100")
    val dim = catRows.toDF("category", "parameter_id")
    val present = labels.select(col(labelCol).as("parameter_id"))
      .filter(col("parameter_id").isNotNull)
    val totalLabels = present.count()
    val counts = present.groupBy("parameter_id").agg(count(lit(1)).as("n_labels"))
    dim.join(counts, Seq("parameter_id"), "left")
      .na.fill(0L, Seq("n_labels"))
      .groupBy("category")
      .agg(
        count(lit(1)).as("total_params"),
        sum(when(col("n_labels") > 0, 1L).otherwise(0L)).as("covered_params"),
        sum(col("n_labels")).as("label_count"))
      .withColumn("coverage_pct",
        round(col("covered_params") * 100.0 / col("total_params"), 2))
      .withColumn("distribution_pct",
        round(col("label_count") * 100.0 / lit(math.max(1L, totalLabels)), 2))
      .orderBy("category")
  }

  /** Combined per-split analysis table (A6, `data_exploration.py:46-101`:
    * `get_single_label_stats` + `generate_analysis_results` assembled side by
    * side — the reference computes these per split and prints them; this is
    * the combined table it never materializes). Grain: (split, category).
    * Columns per row:
    *  - total_params / covered_params / coverage_bp — the category-coverage
    *    part (`:68-101` `coverage_pct`, integer basis points);
    *  - label_count / distribution_bp — the category's share of the split's
    *    label mass (`distribution_pct`);
    *  - param_counts — the per-category label Counter (`parameter_counts`),
    *    canonicalized to "id:n" CSV ordered by (count desc, id asc) so it is
    *    one deterministic scalar column;
    *  - the synthetic NIL category (`category_to_params["NIL"] = {"Q100"}`,
    *    `:38`) reproduces `get_single_label_stats(label_id="Q100")` exactly:
    *    its label_count/distribution_bp ARE the Q100 count and percentage.
    *
    * One union + two shuffles (per-(split,param) counts, then per-(split,
    * category) rollup) regardless of split count; the category dim is
    * crossed per split driver-side (|splits| × |ontology| rows, trivially
    * broadcast), so empty categories still appear for every split. */
  def analysisResults(spark: SparkSession, splits: Seq[(String, DataFrame)],
      entries: Seq[pkel.model.OntologyEntry], labelCol: String = "label"): DataFrame = {
    require(splits.nonEmpty, "analysisResults needs at least one split")
    val labeled = splits.map { case (name, df) =>
      df.select(lit(name).as("split"), col(labelCol).as("label"))
    }.reduce(_ unionByName _)
    analysisResultsSplit(spark, labeled, entries)
  }

  /** Same table over an already-split-tagged label DataFrame (columns
    * `splitCol`, `labelCol`) — one pass over the data however many splits
    * the tag column carries. */
  def analysisResultsSplit(spark: SparkSession, taggedLabels: DataFrame,
      entries: Seq[pkel.model.OntologyEntry], splitCol: String = "split",
      labelCol: String = "label"): DataFrame = {
    import spark.implicits._
    // the synthetic (NIL, Q100) row is appended unconditionally, so an entry
    // list loaded with removeNil=false (pk_kb.csv carries a G100/Q100 row)
    // must not contribute its own Q100 — the duplicate dim row would
    // double-count every NIL label across two category rows
    val dim = (entries.filterNot(_.parameterId == "Q100")
      .map(e => (e.categoryId, e.parameterId)) :+ (("NIL", "Q100")))
      .toDF("category", "parameter_id")
    val labeled = taggedLabels
      .select(col(splitCol).as("split"), col(labelCol).as("parameter_id"))
      .filter(col("parameter_id").isNotNull)
    val totals = labeled.groupBy("split").agg(count(lit(1)).as("total_labels"))
    val counts = labeled.groupBy("split", "parameter_id").agg(count(lit(1)).as("n_labels"))
    val splitDim = broadcast(totals.crossJoin(dim)) // |splits| × |ontology|: tiny
    splitDim.join(counts, Seq("split", "parameter_id"), "left")
      .na.fill(0L, Seq("n_labels"))
      .groupBy("split", "category", "total_labels")
      .agg(
        count(lit(1)).as("total_params"),
        sum(when(col("n_labels") > 0, 1L).otherwise(0L)).as("covered_params"),
        sum(col("n_labels")).as("label_count"),
        concat_ws(",", transform(
          array_sort(collect_list(when(col("n_labels") > 0,
            struct((-col("n_labels")).as("neg"), col("parameter_id").as("pid"))))),
          s => concat(s("pid"), lit(":"), (-s("neg")).cast("string")))).as("param_counts"))
      .withColumn("coverage_bp",
        floor(lit(10000) * col("covered_params") / col("total_params")).cast("long"))
      .withColumn("distribution_bp",
        floor(lit(10000) * col("label_count") / greatest(col("total_labels"), lit(1L))).cast("long"))
      .select("split", "category", "total_params", "covered_params", "coverage_bp",
        "label_count", "distribution_bp", "param_counts")
      .orderBy("split", "category")
  }

  /** Blocking-quality counters (A5, `ontology_preprocessing.py:252-349`):
    * one conditional-aggregate pass. Input columns: label, subset_matched,
    * subsetted_concepts (array), category of label via paramToCategory map. */
  def evaluateSubsetMatching(spark: SparkSession, df: DataFrame,
      paramToCategory: Map[String, String], nOntology: Int): DataFrame = {
    val catUdf = udf((id: String) => paramToCategory.getOrElse(id, "G100"))
    val d = df
      .withColumn("is_nil", col("label") === "Q100" || catUdf(col("label")) === "G100")
      .withColumn("matched", size(col("subsetted_concepts")) > 0)
      .withColumn("hit", array_contains(col("subsetted_concepts"), col("label")))
    d.agg(
      count(lit(1)).as("total"),
      sum(when(col("matched"), 1L).otherwise(0L)).as("matched"),
      sum(when(!col("matched"), 1L).otherwise(0L)).as("unmatched"),
      sum(when(col("matched") && !col("is_nil") && col("hit"), 1L).otherwise(0L)).as("correct_matched"),
      sum(when(!col("matched") && col("is_nil"), 1L).otherwise(0L)).as("correct_unmatched"),
      sum(when(!col("is_nil"), 1L).otherwise(0L)).as("total_non_nil"),
      sum(when(col("is_nil"), 1L).otherwise(0L)).as("total_nil"),
      sum(when(col("is_nil") && col("matched"), 1L).otherwise(0L)).as("nil_with_subset"),
      avg(when(size(col("subsetted_concepts")) > 1,
        lit(1.0) - size(col("subsetted_concepts")).cast("double") / lit(nOntology.toDouble))).as("avg_reduction"))
  }
}
