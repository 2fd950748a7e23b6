package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession, Row}
import org.apache.spark.sql.types._
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
  * `mapPartitions` — at 100 TB this scales with input splits, zero
  * shuffles; KnowDB rides along as a broadcast variable (executor-shared
  * read-only, the Spark analogue of the reference's per-thread SQLite
  * clones). */
object Pipeline {

  val outSchema: StructType = StructType(Seq(
    StructField("rule_key", StringType),
    StructField("oml_model", StringType),
    StructField("status", StringType), // ok | default | miss | residue-only | error | blank
    StructField("fields", ArrayType(StructType(Seq(
      StructField("name", StringType),
      StructField("dtype", StringType),
      StructField("sval", StringType))))),
    StructField("residue", StringType),
    StructField("err_hint", StringType)))

  private def fieldRows(fs: Vector[WField]): Seq[Row] =
    fs.map(f => Row(f.name, f.value.dtype, f.value.sval))

  /** Run parse + transform over `lineCol`, keeping `keep` passthrough
    * columns. `omlSources` models are tried in order per record
    * (first rule-match wins; no match = passthrough "default"). */
  def run(df: DataFrame, lineCol: String, wplSource: String,
          omlSources: Seq[String], keep: Seq[String] = Seq.empty,
          knowDb: KnowDb = KnowDb.empty,
          sourceTags: Map[String, String] = Map.empty): DataFrame = {
    val spark = df.sparkSession
    val bcDb: Broadcast[KnowDb] = spark.sparkContext.broadcast(knowDb)
    val keepIdx = keep.map(df.schema.fieldIndex)
    val lineIdx = df.schema.fieldIndex(lineCol)
    val schema = StructType(keep.map(k => df.schema(df.schema.fieldIndex(k))) ++ outSchema.fields)
    val rdd = df.rdd.mapPartitions { it =>
      val mp = Runtime.compile(wplSource)
      val models = omlSources.map(OmlText.parse)
      val evals = models.map(m => new OmlEval(m, bcDb.value))
      it.map { row =>
        val keepVals = keepIdx.map(row.get)
        val line = if (row.isNullAt(lineIdx)) null else row.get(lineIdx).toString
        // source tags merged when the field is absent (processor.rs:70-100)
        def tagged(fs: Vector[WField]): Vector[WField] =
          if (sourceTags.isEmpty) fs
          else fs ++ sourceTags.collect {
            case (k, v) if !fs.exists(_.name == k) => WField(k, WChars(v))
          }
        val out: Row = mp.parseLine(line) match {
          case PSuccess(key, fs) => dispatch(key, tagged(fs), null, models, evals)
          case PPartial(key, fs, residue) => dispatch(key, tagged(fs), residue, models, evals)
          case PMiss(best, depth) => Row(null, null, "miss", Seq.empty, null, s"depth=$depth best=$best")
          case PBlank => Row(null, null, "blank", Seq.empty, null, null)
        }
        Row.fromSeq(keepVals ++ out.toSeq)
      }
    }
    spark.createDataFrame(rdd, schema)
  }

  private def dispatch(key: String, fs: Vector[WField], residue: String,
                       models: Seq[OmlAst.Model], evals: Seq[OmlEval]): Row = {
    val mi = models.indexWhere(_.matchesRule(key))
    if (mi < 0) {
      // no OML model → passthrough to the `default` infra sink
      Row(key, null, if (residue == null) "default" else "residue-only",
        fieldRows(fs), residue, null)
    } else {
      evals(mi).transform(fs) match {
        case Some(out) =>
          Row(key, models(mi).name, "ok", fieldRows(out), residue, null)
        case None =>
          // reference: error sink with __err_kind/__wpl_rule/__oml_model
          Row(key, models(mi).name, "error", fieldRows(fs), residue,
            s"__err_kind=empty_transform __wpl_rule=$key __oml_model=${models(mi).name}")
      }
    }
  }
}
