package graft.project

import java.io.File
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.Pipeline
import graft.oml.KnowDb
import graft.sinks.SinkRouter

/** Batch execution of a loaded project instance (reference `wparse
  * batch` over a wp-proj work root — `crates/wp-proj/src/wparse`):
  *
  *   enabled file sources → Pipeline.run (one codegen pass, per-source
  *   tags) → union → route:
  *     - business groups by `oml`/`rule` wildcard match (fanout: every
  *       matching group's sinks get the record — reference
  *       `route_with_transform`, src/sinks/routing/dispatcher/oml.rs:269-302);
  *     - per-sink `filter`/`filter_expect` diverts to the `intercept`
  *       infra channel;
  *     - unmatched ok/default records → `default` infra; miss → `miss`;
  *       error → `error`; non-empty residue → `residue` (additionally).
  *
  * The whole route stage is Column predicates over ONE persisted parsed
  * frame — each sink is a filtered projection + text write, so the plan
  * stays a scan→narrow-select per sink with no shuffle; at 100 TB this
  * is the same shape as the reference's per-sink channel fanout.
  *
  * Sink fmt rides the generic (name, dtype, sval) field triples; `time`
  * renders as epoch-micros and nested obj/array as their canonical JSON
  * (documented divergence: the reference re-renders from its typed
  * in-memory Value). */
object ProjectRun {

  final case class SinkReport(group: String, sink: String, path: String,
                              rows: Long, intercepted: Long, expectOk: Boolean)

  /** Format one record's fields for a sink. dtypes digit/float/bool and
    * the JSON-shaped obj/array embed unquoted in json fmt (matches
    * Formatters.json over live WValues for every scalar the corpus
    * emits). */
  private def fmtLine(fmt: String): Column = {
    val fs = col("fields")
    fmt match {
      case "json" =>
        val item = (f: Column) => concat(
          graft.engine.WplEngine.jsonQuote(f.getField("name")), lit(":"),
          when(f.getField("dtype").isin("digit", "float", "bool", "obj", "array"),
            f.getField("sval"))
            .when(f.getField("dtype") === "null", lit("null"))
            .otherwise(graft.engine.WplEngine.jsonQuote(f.getField("sval"))))
        concat(lit("{"), array_join(transform(fs, item), ","), lit("}"))
      case "kv" =>
        array_join(transform(fs, f =>
          concat(f.getField("name"), lit("="), f.getField("sval"))), " ")
      case "csv" =>
        array_join(transform(fs, f => {
          val s = f.getField("sval")
          when(s.contains(",") || s.contains("\"") || s.contains("\n"),
            concat(lit("\""), replace(s, lit("\""), lit("\"\"")), lit("\"")))
            .otherwise(s)
        }), ",")
      case "raw" =>
        coalesce(
          try_element_at(filter(fs, f => f.getField("name") === "raw_log"), lit(1))
            .getField("sval"),
          array_join(transform(fs, f =>
            concat(f.getField("name"), lit("="), f.getField("sval"))), " "))
      case "proto_text" =>
        array_join(transform(fs, f =>
          concat(f.getField("name"), lit(": "),
            when(f.getField("dtype").isin("digit", "float", "bool"), f.getField("sval"))
              .otherwise(concat(lit("\""),
                replace(f.getField("sval"), lit("\""), lit("\\\"")), lit("\""))))), " ")
      case other => throw new IllegalArgumentException(s"unknown sink fmt: $other")
    }
  }

  private def writeText(df: DataFrame, line: Column, out: File): Long = {
    val rows = df.count()
    out.getParentFile.mkdirs()
    // coalesce(1): sink files are line-oriented daemon outputs, matching
    // the reference's single append stream per sink; at cluster scale the
    // file connector would shard (params base/file per partition) instead
    df.select(line.as("value")).coalesce(1).write.mode("overwrite")
      .text(out.getPath + ".spark")
    val part = Option(new File(out.getPath + ".spark").listFiles()).getOrElse(Array.empty)
      .find(f => f.getName.startsWith("part") && !f.getName.endsWith(".crc"))
    out.delete()
    part match {
      case Some(pf) => java.nio.file.Files.move(pf.toPath, out.toPath)
      case None => java.nio.file.Files.write(out.toPath, Array.empty[Byte])
    }
    deleteRec(new File(out.getPath + ".spark"))
    rows
  }

  private def deleteRec(f: File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRec)
    f.delete()
  }

  /** Run the project in batch over its enabled file sources. Returns
    * per-sink write reports (rows, intercepts, expect validation). */
  def runBatch(spark: SparkSession, p: Project.Loaded,
               knowDb: KnowDb = KnowDb.empty,
               enricher: graft.wpl.Enricher = graft.wpl.Enricher.empty): Vector[SinkReport] = {
    val sources = p.fileSources.filter(_.enable)
    require(sources.nonEmpty, "no enabled file sources")
    val parsed = sources.map { s =>
      val path = Project.resolve(p.root, s.path)
      // keep the raw line: miss/residue/error infra sinks write original
      // payload text, not formatted fields (reference rescue semantics)
      val lines = spark.read.text(path.getPath).withColumnRenamed("value", "raw_line")
      Pipeline.run(lines, "raw_line", p.wplSource, p.omlSources.map(_._2),
        keep = Seq("raw_line"), knowDb = knowDb, sourceTags = s.tags, enricher = enricher,
        semanticEnabled = p.conf.semanticEnabled) // [semantic].enabled, default off
    }.reduce(_ unionByName _).persist()
    try routeAndWrite(p, parsed) finally parsed.unpersist()
  }

  private def routeAndWrite(p: Project.Loaded, parsed: DataFrame): Vector[SinkReport] = {
    val reports = Vector.newBuilder[SinkReport]
    val routable = col("status").isin("ok", "default", "residue-only")

    // ---- business fanout -------------------------------------------
    // group match predicate over (oml_model, rule_key) wildcards
    def matchCol(g: Project.SinkGroup): Column = {
      def pats(ps: Vector[String], c: Column): Column =
        ps.map {
          case "*" => c.isNotNull
          case pat if pat.contains("*") => c.like(pat.replace("%", "\\%").replace('*', '%'))
          case exact => c === exact
        }.reduceOption(_ || _).getOrElse(lit(false))
      pats(g.omlPatterns, col("oml_model")) || pats(g.rulePatterns, col("rule_key"))
    }

    val bizGroups = p.business
    val anyBizMatch: Column =
      bizGroups.map(matchCol).reduceOption(_ || _).getOrElse(lit(false))

    var interceptTotal = 0L
    val interceptFrames = Vector.newBuilder[DataFrame]
    val groupCounts = scala.collection.mutable.Map.empty[String, Long]

    bizGroups.foreach { g =>
      val groupDf = parsed.filter(routable && matchCol(g))
      var groupRows = 0L
      g.sinks.foreach { s =>
        val spec = SinkRouter.SinkSpec(s.name, s.filter, filterExpect = s.filterExpect,
          preTags = Project.parseTags(s.tags), fmt = s.fmt)
        val (biz0, icpt) = SinkRouter.route(groupDf, spec)
        // pre_tags become fields on the record (append as FieldOut structs)
        val biz = spec.preTags.foldLeft(biz0) { case (df, (k, v)) =>
          df.withColumn("fields", concat(col("fields"),
            array(struct(lit(k).as("name"), lit("chars").as("dtype"), lit(v).as("sval")))))
        }
        val path = s.path.getOrElse(s"out/${g.name}-${s.name}.dat")
        val rows =
          if (s.kind == "file") writeText(biz, fmtLine(s.fmt), Project.resolve(p.root, path))
          else biz.count() // non-file kinds (kafka/tcp/syslog/blackhole): count-only in batch
        val nIcpt = if (s.filter.isDefined) { interceptFrames += icpt; icpt.count() } else 0L
        interceptTotal += nIcpt
        groupRows += rows
        reports += SinkReport(g.name, s.name, path, rows, nIcpt, expectOk = true)
      }
      groupCounts(g.name) = groupRows
    }

    // ---- infra channels --------------------------------------------
    // `raw` fmt on an infra channel emits the channel's raw payload
    // (original line for miss/error, residue text for residue) —
    // reference infra sinks feed wprescue re-ingest with raw text
    def infraWrite(name: String, df: DataFrame, rawCol: Option[Column] = None): Unit =
      p.infra.get(name).foreach { g =>
        g.sinks.foreach { s =>
          val line = if (s.fmt == "raw" && rawCol.isDefined) rawCol.get else fmtLine(s.fmt)
          val path = s.path.getOrElse(s"out/$name.dat")
          val rows = writeText(df, line, Project.resolve(p.root, path))
          reports += SinkReport(name, s.name, path, rows, 0L, expectOk = true)
        }
      }

    infraWrite("default", parsed.filter(routable && !anyBizMatch))
    infraWrite("miss", parsed.filter(col("status") === "miss"), Some(col("raw_line")))
    infraWrite("error", parsed.filter(col("status") === "error"), Some(col("raw_line")))
    infraWrite("residue", parsed.filter(col("residue").isNotNull && col("residue") =!= ""),
      Some(col("residue")))
    val icpts = interceptFrames.result()
    if (icpts.nonEmpty) infraWrite("intercept", icpts.reduce(_ unionByName _))

    // ---- expect validation (reference wproj data stat; share-of-total
    // basis over all sink writes this run) -----------------------------
    val out = reports.result()
    val basis = out.iterator.map(_.rows).sum
    out.map { r =>
      val expect = (p.business ++ p.infra.values).find(_.name == r.group)
        .flatMap(_.sinks.find(_.name == r.sink)).flatMap(_.expect)
      r.copy(expectOk = expect.forall(_.ok(r.rows, basis)))
    }
  }
}
