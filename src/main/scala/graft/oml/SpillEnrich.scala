package graft.oml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.wpl.{AutoVal, WNull}

/** Join-completion of OML selects whose dim spilled past the KnowDb
  * driver guardrail ([[KnowDb.fromDims]]): the evaluator emitted only
  * the probe key (a retained `__spill_<table>_<target>` field); this
  * stage joins the (never-collected) dim DataFrame on that key and
  * splices the selected values back into the record's `fields` array
  * with the same AutoVal typing + target-dtype cast the in-eval probe
  * applies — so a dim growing past the guardrail degrades from a
  * per-record broadcast probe to a real Spark join (broadcast or
  * shuffle, Catalyst/AQE's choice) instead of failing the query.
  *
  * Parity notes vs the in-eval KnowDb probe:
  *  - first-match semantics: the dim is deduped on the key
  *    (`dropDuplicates`) the way `lookupEq(...).headOption` keeps one
  *    row; which duplicate survives is arbitrary in both routes.
  *  - a miss adds no field (same as a probe miss); a record whose
  *    fields end up empty after completion flips to status=error,
  *    mirroring "empty transform output = failure".
  *  - enriched fields append at the end of `fields` rather than at the
  *    item's dst position; consumers address fields by name.
  */
object SpillEnrich {
  import OmlAst._

  /** One spilled select item: join `table` on `dimKey` = probe key and
    * emit `outputs` (dimColumn, targetField, declaredDtype). */
  final case class Spec(table: String, dimKey: String, marker: String,
                        outputs: Seq[(String, String, Option[String])])

  /** Marker field name carrying the probe key through the parse stage.
    * The table segment is length-prefixed so `(table, target)` decodes
    * unambiguously — a plain `_` separator would collide table `a_b` /
    * target `c` with table `a` / target `b_c` and cross-wire two specs'
    * join completions. */
  def markerName(table: String, firstTarget: String): String =
    s"__spill_${table.length}_${table}_$firstTarget"

  /** Static plan: scan parsed models for direct select items on spilled
    * tables (the only deferrable shape). Every OTHER occurrence of a
    * spilled table — a non-equality condition, or a select nested
    * inside a pipe/match/object/fmt expression — is rejected HERE, at
    * plan time on the driver, rather than letting the evaluator throw
    * per record on executors mid-job (or silently miss the nested
    * lookup, since a spilled table is absent from the broadcast
    * KnowDb). */
  def specsOf(omlSources: Seq[String], spilled: Set[String]): Seq[Spec] =
    omlSources.map(OmlText.parse).flatMap { model =>
      model.items.foreach(validateItem(_, spilled, topLevel = true))
      model.statics.foreach { case (_, e) => validateEval(e, spilled) }
      model.items.collect {
        case Item(targets, SqlE(cols, table, SqlCmp(dimKey, "=", _)))
            if spilled.contains(table) =>
          require(cols != Vector("*"),
            s"spilled dim '$table': `select *` cannot be compiled to a join — name the columns")
          val effCols = if (targets.length > 1) cols else cols.take(1)
          val outs = effCols.zip(targets).collect {
            case (c, Target(name, dt)) if name != "_" => (c, name, dt)
          }
          Spec(table, dimKey, markerName(table, targets.head.name), outs)
      }
    }.distinct

  private def validateItem(item: Item, spilled: Set[String], topLevel: Boolean): Unit =
    item.eval match {
      case SqlE(_, table, cond) if spilled.contains(table) =>
        val eqShape = cond match { case SqlCmp(_, "=", _) => true; case _ => false }
        if (!topLevel || !eqShape) throw new IllegalArgumentException(
          s"dim '$table' spilled past the KnowDb guardrail: only a top-level " +
            "single-equality select can be completed as a join — rewrite the " +
            "condition (or raise the guardrail)")
      case e => validateEval(e, spilled)
    }

  /** Reject spilled-table selects nested anywhere inside an expression
    * tree — the evaluator cannot defer those (the probe value feeds a
    * surrounding computation that must run in-eval). */
  private def validateEval(e: Eval, spilled: Set[String]): Unit = e match {
    case SqlE(_, table, _) if spilled.contains(table) =>
      throw new IllegalArgumentException(
        s"dim '$table' spilled past the KnowDb guardrail: a select on it is " +
          "nested inside another expression and cannot be deferred to a join — " +
          "bind it to its own field first (or raise the guardrail)")
    case SqlE(_, _, _) => ()
    case PipeE(src, _) => validateEval(src, spilled)
    case FmtE(_, args) => args.foreach(validateEval(_, spilled))
    case ObjectE(items) => items.foreach(validateItem(_, spilled, topLevel = false))
    case MatchE(sources, cases, default) =>
      sources.foreach(validateEval(_, spilled))
      cases.foreach { case (_, ev) => validateEval(ev, spilled) }
      default.foreach(validateEval(_, spilled))
    case _ => ()
  }

  /** (dtype, sval) of a dim cell after AutoVal typing + declared-dtype
    * cast — byte-identical to what the in-eval probe would emit. NULL
    * dim cells reach this as "" (the caller coalesces before the cast,
    * matching KnowDb.tryFromDim's null→"" stringification, so both
    * routes emit an empty-sval chars field rather than dropping it).
    * Caveat, documented: for timestamp/decimal dim columns the two
    * routes can stringify differently (Spark `cast(string)` here vs the
    * collected Row's JVM `toString` in the probe — e.g.
    * `2020-01-01 00:00:00` vs `2020-01-01 00:00:00.0`); KnowDb dims are
    * string/numeric keyed lookup tables in the reference, so pre-cast
    * such columns to string in the dim DataFrame if exact cross-route
    * byte parity matters. */
  private val typedUdf = udf { (s: String, dt: String) =>
    if (s == null) null
    else {
      val v = WCast(AutoVal.typed(s), Option(dt).filter(_.nonEmpty))
      if (v == WNull) null else (v.dtype, v.sval)
    }
  }

  def apply(out: DataFrame, dims: Map[String, DataFrame], specs: Seq[Spec]): DataFrame = {
    val completed = specs.zipWithIndex.foldLeft(out) { case (df, (spec, si)) =>
      val dim = dims(spec.table)
      val kA = s"__spk_$si"
      val valCols = spec.outputs.zipWithIndex.map { case ((dimCol, _, dt), i) =>
        typedUdf(coalesce(col(dimCol).cast("string"), lit("")),
          lit(dt.getOrElse(""))).as(s"__spv_${si}_$i")
      }
      val dimPrep = dim.dropDuplicates(spec.dimKey)
        .select((col(spec.dimKey).cast("string").as(kA) +: valCols): _*)
      val keyExpr = element_at(
        filter(col("fields"), f => f.getField("name") === spec.marker), 1)
        .getField("sval")
      val cleaned = filter(col("fields"), f => f.getField("name") =!= spec.marker)
      val adds = spec.outputs.zipWithIndex.map { case ((_, tgt, _), i) =>
        struct(lit(tgt).as("name"),
          col(s"__spv_${si}_$i").getField("_1").as("dtype"),
          col(s"__spv_${si}_$i").getField("_2").as("sval"))
      }
      df.join(dimPrep, keyExpr === col(kA), "left")
        .withColumn("fields",
          concat(cleaned, filter(array(adds: _*), s => s.getField("sval").isNotNull)))
        .drop(kA +: spec.outputs.indices.map(i => s"__spv_${si}_$i"): _*)
    }
    // empty transform output = failure (reference error-channel rule):
    // a record left with no fields after completion flips to error
    completed.withColumn("status",
      when(col("status") === "ok" && size(col("fields")) === 0, lit("error"))
        .otherwise(col("status")))
  }
}
