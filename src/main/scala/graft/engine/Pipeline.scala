package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.broadcast.Broadcast
import graft.wpl._
import graft.oml._

/** The full reference dataflow as ONE narrow Spark stage:
  *   raw line → WPL multi-rule parse → OML model dispatch (first model
  *   whose `rule:` wildcard matches the wpl key) → transformed record,
  * with side-output status tagging (default/miss/residue/error — reference
  * src/sinks/routing/dispatcher/oml.rs).
  *
  * Everything is per-record stateless, so the whole pipeline is a single
  * projection — a codegen-participating Catalyst expression
  * ([[graft.functions.PipeWpl]], same ABI as ParseWpl) with per-thread
  * lazily compiled rules/models — no RDD hop, no ScalaUDF row boxing;
  * KnowDB rides along as a broadcast variable (executor-shared read-only,
  * the Spark analogue of the reference's per-thread SQLite clones). At
  * 100 TB this scales with input splits: zero shuffles, zero driver work. */
object Pipeline {

  case class FieldOut(name: String, dtype: String, sval: String)
  case class PipeOut(
      rule_key: String,
      oml_model: String,
      status: String, // ok | default | miss | residue-only | error | blank
      fields: Seq[FieldOut],
      residue: String,
      err_hint: String)

  /** Serializable per-executor transform closure: rules/models compile
    * lazily on first use per JVM (mirrors the reference's per-worker
    * MultiParser setup amortization). */
  final class PipelineFn(wplSource: String, omlSources: Seq[String],
                         bcDb: Broadcast[KnowDb], sourceTags: Map[String, String],
                         enricher: Enricher = Enricher.empty,
                         semanticEnabled: Boolean = true)
      extends Serializable {
    @transient private lazy val mp = Runtime.compile(wplSource, enricher)
    @transient private lazy val models = omlSources.map(OmlText.parse)
    @transient private lazy val evals = models.map(new OmlEval(_, bcDb.value,
      semanticEnabled = semanticEnabled))

    private def fieldOuts(fs: Vector[WField]): Seq[FieldOut] =
      fs.map(f => FieldOut(f.name, f.value.dtype, f.value.sval))

    private def tagged(fs: Vector[WField]): Vector[WField] =
      if (sourceTags.isEmpty) fs
      else fs ++ sourceTags.collect {
        case (k, v) if !fs.exists(_.name == k) => WField(k, WChars(v))
      }

    def apply(line: String): PipeOut = mp.parseLine(line) match {
      case PSuccess(key, fs) => dispatch(key, tagged(fs), null)
      case PPartial(key, fs, residue) => dispatch(key, tagged(fs), residue)
      case PMiss(best, depth) =>
        PipeOut(null, null, "miss", Seq.empty, null, s"depth=$depth best=$best")
      case PBlank => PipeOut(null, null, "blank", Seq.empty, null, null)
    }

    private def dispatch(key: String, fs: Vector[WField], residue: String): PipeOut = {
      val mi = models.indexWhere(_.matchesRule(key))
      if (mi < 0) {
        // no OML model → passthrough to the `default` infra sink
        PipeOut(key, null, if (residue == null) "default" else "residue-only",
          fieldOuts(fs), residue, null)
      } else {
        evals(mi).transform(fs) match {
          case Some(out) => PipeOut(key, models(mi).name, "ok", fieldOuts(out), residue, null)
          case None =>
            // reference: error sink with __err_kind/__wpl_rule/__oml_model
            PipeOut(key, models(mi).name, "error", fieldOuts(fs), residue,
              s"__err_kind=empty_transform __wpl_rule=$key __oml_model=${models(mi).name}")
        }
      }
    }
  }

  /** Run parse + transform over `lineCol`, keeping `keep` passthrough
    * columns. `omlSources` models are tried in order per record
    * (first rule-match wins; no match = passthrough "default"). */
  def run(df: DataFrame, lineCol: String, wplSource: String,
          omlSources: Seq[String], keep: Seq[String] = Seq.empty,
          knowDb: KnowDb = KnowDb.empty,
          sourceTags: Map[String, String] = Map.empty,
          enricher: Enricher = Enricher.empty,
          semanticEnabled: Boolean = true): DataFrame = {
    val spark = df.sparkSession
    val bcDb: Broadcast[KnowDb] = spark.sparkContext.broadcast(knowDb)
    import org.apache.spark.sql.GraftExprBridge
    // null lines fold to "" so they take the PBlank path (status=blank),
    // matching the old UDF's behavior instead of a null struct
    val line = GraftExprBridge.expression(
      coalesce(col(lineCol).cast("string"), lit("")))
    val p = GraftExprBridge.column(
      graft.functions.PipeWpl(line, wplSource, omlSources, sourceTags, bcDb, enricher,
        semanticEnabled))
    df.select((keep.map(col) :+ p.as("p")): _*)
      .select((keep.map(col) :+ col("p.*")): _*)
  }

  /** [[run]] with Spark-DataFrame dims and automatic KnowDb spill
    * routing: dims inside the driver guardrail broadcast as KnowDb
    * tables (per-record probe, zero shuffle); dims beyond it are never
    * collected — their selects defer to a real Spark join completed
    * here by [[SpillEnrich]]. The query's answer is identical either
    * route; only the physical shape changes with dim size. */
  def runWithDims(df: DataFrame, lineCol: String, wplSource: String,
                  omlSources: Seq[String], dims: Map[String, DataFrame],
                  keep: Seq[String] = Seq.empty,
                  maxDimBytes: Long = KnowDb.DefaultMaxBytes,
                  sourceTags: Map[String, String] = Map.empty,
                  enricher: Enricher = Enricher.empty,
                  semanticEnabled: Boolean = true): DataFrame = {
    val (db, spilledDims) = KnowDb.fromDims(dims, maxDimBytes)
    val out = run(df, lineCol, wplSource, omlSources, keep, db, sourceTags,
      enricher, semanticEnabled)
    if (spilledDims.isEmpty) out
    else SpillEnrich(out, spilledDims, SpillEnrich.specsOf(omlSources, db.spilled))
  }
}
