package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Evaluation metrics for model-in-the-loop curation: once a classifier
  * (lang-id, quality gate, the trained LR of [[Classifier]]) scores the
  * corpus, these quantify it — per-class precision/recall/F1 with
  * corpus accuracy and Cohen's κ from the confusion matrix, and
  * tie-corrected Mann–Whitney AUC for ranking scores.
  *
  * Everything reduces to integer counts first (one corpus-sized
  * aggregation), then does its handful of divisions on the tiny
  * classes²- or distinct-scores-sized frame — so results are exact and
  * engine-replayable, no sampling, no double summation over the scan.
  */
object Metrics {

  /** Per-class precision/recall/F1 from a (gold, pred) frame, with
    * corpus accuracy and Cohen's κ repeated on every row (they ride the
    * 1-row aggregate cross-joined in — the documented tiny-broadcast
    * pattern). Classes = union of gold and predicted labels; undefined
    * ratios (no predictions / no gold for a class) come out 0.0.
    *
    * κ = (p_o − p_e)/(1 − p_e) with p_e = Σ_c g_c·p_c / N² — the
    * products run in double (g·p overflows long at ~3·10⁹ rows/class).
    */
  def classifierMetrics(df: DataFrame, goldCol: String,
                        predCol: String): DataFrame = {
    val cm = df.select(col(goldCol).as("gold"), col(predCol).as("pred"))
      .groupBy(col("gold"), col("pred")).agg(count(lit(1)).as("n"))
    val g = cm.groupBy(col("gold").as("label")).agg(sum("n").as("n_gold"))
    val p = cm.groupBy(col("pred").as("label")).agg(sum("n").as("n_pred"))
    val tp = cm.filter(col("gold") === col("pred"))
      .select(col("gold").as("label"), col("n").as("n_correct"))
    val per = g.join(p, Seq("label"), "full_outer")
      .join(tp, Seq("label"), "left")
      .na.fill(0L, Seq("n_gold", "n_pred", "n_correct"))
    val tot = cm.agg(sum("n").as("n_total"),
      sum(when(col("gold") === col("pred"), col("n")).otherwise(lit(0L)))
        .as("n_ok"))
    val pe = per.agg(
      sum(col("n_gold").cast("double") * col("n_pred")).as("pe_num"))
    val prec = when(col("n_pred") > 0,
      col("n_correct").cast("double") / col("n_pred")).otherwise(lit(0.0))
    val rec = when(col("n_gold") > 0,
      col("n_correct").cast("double") / col("n_gold")).otherwise(lit(0.0))
    val f1 = when(prec + rec > 0,
      lit(2.0) * prec * rec / (prec + rec)).otherwise(lit(0.0))
    val po = col("n_ok").cast("double") / col("n_total")
    val peC = col("pe_num") /
      (col("n_total").cast("double") * col("n_total"))
    per.crossJoin(broadcast(tot)).crossJoin(broadcast(pe))
      .select(col("label"), col("n_gold"), col("n_pred"), col("n_correct"),
        round(prec, 4).as("precision"), round(rec, 4).as("recall"),
        round(f1, 4).as("f1"),
        round(po, 4).as("accuracy"),
        round((po - peC) / (lit(1.0) - peC), 4).as("kappa"))
  }

  /** Tie-corrected Mann–Whitney AUC of `scoreCol` ranking `labelCol`
    * (boolean/0-1) positives above negatives. Exact integer rank-sum
    * arithmetic: per distinct score, 2·avg_rank = 2·cum_before + cnt + 1
    * (always integer), so the only floating step is the final division —
    * AUC = (2R₊ − n₊(n₊+1)) / (2·n₊·n₋).
    *
    * Scale shape: one corpus-sized (score → cnt, cnt_pos) partial agg,
    * then a cumulative window over the DISTINCT-score frame — bounded
    * by the score domain (integer signal scores here), not the corpus.
    * For unbounded real-valued scores, bucket or sketch first. Long
    * arithmetic holds to ~10⁹ positives; past that, widen to decimal. */
  def rankSumAuc(df: DataFrame, scoreCol: String,
                 labelCol: Column): DataFrame = {
    val byScore = df
      .select(col(scoreCol).as("s"),
        labelCol.cast("long").as("y"))
      .groupBy(col("s"))
      .agg(count(lit(1)).as("cnt"), sum(col("y")).as("cpos"))
    val w = Window.orderBy(col("s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    byScore
      .withColumn("cum", coalesce(sum(col("cnt")).over(w), lit(0L)))
      .agg(sum(col("cpos")).as("n_pos"),
        sum(col("cnt") - col("cpos")).as("n_neg"),
        sum(col("cpos") * (lit(2L) * col("cum") + col("cnt") + lit(1L)))
          .as("r2"))
      .select(col("n_pos"), col("n_neg"),
        round((col("r2") - col("n_pos") * (col("n_pos") + lit(1L)))
            .cast("double") /
          (lit(2.0) * col("n_pos") * col("n_neg")), 6).as("auc"))
  }
}
