package graft.project

import java.io.File
import org.apache.spark.sql.SparkSession
import graft.gen.WpGen
import graft.project.Toml.TTab

/** Project-driven generation — reference `wpgen` over a work root
  * (conf/wpgen.toml, `crates/wp-config/src/generator/wpgen.rs`):
  *
  *  - `[generator]` mode rule|sample, count, speed, parallel,
  *    rule_root (default: the engine conf's wpl dir), sample_pattern;
  *  - `[output]` connect (sink connector id) + whitelisted params
  *    (same connector registry as sink routes);
  *  - per-rule-dir `gen_field.toml` field scopes
  *    (tests/instance/wpl/example/simple/gen_field.toml) override the
  *    parser's default generator for named fields;
  *  - the legacy `[main_conf]` schema the reference ships in
  *    tests/instance/conf/wpgen.toml (gen_ref/gen_count/out_ref with
  *    `[<out_ref>.target.file]`) still loads here (the current
  *    reference loader rejects it via deny_unknown_fields — we keep
  *    the fixture runnable).
  */
object WpGenProject {

  final case class GenConf(
      mode: String,            // rule | sample
      count: Long,
      speed: Long,
      parallel: Int,
      ruleRoot: Option[String],
      samplePattern: Option[String],
      outPath: String,         // resolved file output (file connectors only)
      outFmt: String)

  private def readFile(f: File): String =
    new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")

  def loadConf(root: File, confName: String = "wpgen.toml"): GenConf = {
    val f = new File(root, s"conf/$confName")
    require(f.isFile, s"no conf/$confName under $root")
    val t = Toml.parse(readFile(f))
    if (t.get("main_conf").isDefined) {
      // legacy schema (shipped tests/instance fixture)
      val m = t.get("main_conf").get.tab
      val outRef = m.str("out_ref").getOrElse("out_file")
      val out = t.get(outRef).map(_.tab).getOrElse(new TTab)
      GenConf(
        mode = if (m.str("gen_ref").exists(_.contains("sample"))) "sample" else "rule",
        count = m.long("gen_count").getOrElse(1000L),
        speed = m.long("gen_speed").getOrElse(1000L),
        parallel = m.long("gen_parallel").getOrElse(1L).toInt,
        ruleRoot = None, samplePattern = None,
        outPath = out.str("target", "file", "path").getOrElse("./src_dat/gen.dat"),
        outFmt = out.str("fmt").getOrElse("raw"))
    } else {
      val g = t.get("generator").map(_.tab).getOrElse(new TTab)
      val o = t.get("output").map(_.tab).getOrElse(new TTab)
      // resolve the output connector (same registry as sink routes)
      val (path, fmt) = o.str("connect") match {
        case Some(id) =>
          val conns = Project.loadConnectors(new File(root, "topology/sinks"))
          val conn = conns.getOrElse(id,
            throw new IllegalArgumentException(s"wpgen output connector '$id' not found"))
          val overrides = o.get("params").map(_.tab.m.toMap.map { case (k, v) => k -> v.str })
            .getOrElse(Map.empty)
          val params = Project.mergeParams(conn, overrides, "wpgen output")
          val p = params.get("path").orElse(
            for (b <- params.get("base"); fn <- params.get("file")) yield s"$b/$fn")
            .getOrElse("./src_dat/gen.dat")
          (p, params.getOrElse("fmt", "raw"))
        case None => ("./src_dat/gen.dat", "raw")
      }
      GenConf(
        mode = g.str("mode").getOrElse("rule"),
        count = g.long("count").getOrElse(1000L),
        speed = g.long("speed").getOrElse(1000L),
        parallel = g.long("parallel").getOrElse(1L).toInt,
        ruleRoot = g.str("rule_root"),
        samplePattern = g.str("sample_pattern"),
        outPath = path, outFmt = fmt)
    }
  }

  /** Parse a `gen_field.toml` (reference `src/runtime/generator/rule.rs`
    * field scopes): `[items.<field>] gen_type` + `[items.<field>.scope.*]`
    * params → per-field generator overrides. */
  def loadFieldConf(f: File): Map[String, WpGen.FieldConf] = {
    if (!f.isFile) return Map.empty
    val t = Toml.parse(readFile(f))
    t.get("items").map(_.tab).map { items =>
      items.m.toMap.flatMap { case (name, v) =>
        val item = v.tab
        val conf: Option[WpGen.FieldConf] = item.str("gen_type") match {
          case Some("ip") =>
            for (b <- item.str("scope", "ip", "beg"); e <- item.str("scope", "ip", "end"))
              yield WpGen.IpRange(b, e)
          case Some("digit") =>
            for (mn <- item.long("scope", "digit", "min"); mx <- item.long("scope", "digit", "max"))
              yield WpGen.DigitRange(mn, mx)
          case Some("chars") =>
            item.long("scope", "chars", "len").map(l => WpGen.CharsLen(l.toInt))
          case _ =>
            val vals = item.strings("scope", "one_of", "values")
            if (vals.nonEmpty) Some(WpGen.OneOf(vals)) else None
        }
        conf.map(name -> _)
      }
    }.getOrElse(Map.empty)
  }

  /** Find generation rule files under the rule root: `gen_rule.wpl`
    * preferred, any `.wpl` as fallback; each pairs with a sibling
    * `gen_field.toml` and (sample mode) `sample.dat`. */
  def findRuleDirs(ruleRoot: File): Vector[File] = {
    val out = Vector.newBuilder[File]
    def walk(d: File): Unit = {
      val fs = Option(d.listFiles()).getOrElse(Array.empty).sortBy(_.getName)
      if (fs.exists(_.getName == "gen_rule.wpl")) out += d
      fs.filter(_.isDirectory).foreach(walk)
    }
    if (ruleRoot.isDirectory) walk(ruleRoot)
    out.result()
  }

  final case class GenReport(ruleKey: String, rows: Long, outPath: String)

  /** Run project generation: every gen rule (or sample pool) produces
    * `count` lines under the configured out path. Fully distributed:
    * `spark.range(count)` partitions carry independent seeded RNGs and
    * the output is a distributed text write — no generated row ever
    * passes through the driver.
    *
    * `merged = false` (default) writes a part-file DIRECTORY at the out
    * path — the multi-executor shape; `merged = true` concatenates the
    * part files into one file (byte-level stream copy on the driver, for
    * parity with the reference's single output file / for sources that
    * tail one path). */
  /** `countOverride` mirrors the reference's `wpgen rule/sample -n`
    * (line_cnt CLI flag wins over the configured count); `wplDir` the
    * `--wpl` rules-directory override. */
  def run(spark: SparkSession, rootPath: String, seed: Long = 42L,
          merged: Boolean = false,
          confName: String = "wpgen.toml",
          countOverride: Option[Long] = None,
          wplDir: Option[String] = None): Vector[GenReport] = {
    val root = new File(rootPath)
    val conf0 = loadConf(root, confName)
    val conf = countOverride.fold(conf0)(n => conf0.copy(count = n))
    val engine = Project.loadEngineConf(root)
    val ruleRoot = Project.resolve(root,
      wplDir.orElse(conf.ruleRoot).getOrElse(engine.wplDir))
    val outFile = Project.resolve(root, conf.outPath)
    outFile.getParentFile.mkdirs()
    val dirs = findRuleDirs(ruleRoot)
    require(dirs.nonEmpty, s"no gen_rule.wpl under $ruleRoot")

    import org.apache.spark.sql.Dataset
    val perDir: Vector[(String, Option[Dataset[String]])] = dirs.map { d =>
      val wpl = readFile(new File(d, "gen_rule.wpl"))
      val ds: Option[Dataset[String]] = conf.mode match {
        case "sample" =>
          val sample = new File(d, "sample.dat")
          if (!sample.isFile) None
          else {
            import spark.implicits._
            val pool = spark.createDataset(
              readFile(sample).linesIterator.filter(_.nonEmpty).toSeq)
            Some(WpGen.fromSample(spark, pool, conf.count, seed))
          }
        case _ =>
          val fieldConf = loadFieldConf(new File(d, "gen_field.toml"))
          graft.wpl.WplText.parsePackages(wpl)
            .map(rule => datasetWithConf(spark, wpl, rule.key, conf.count, seed, fieldConf))
            .reduceOption(_ union _)
      }
      d.getName -> ds.map(_.persist())
    }
    try {
      val reports = perDir.map { case (name, ds) =>
        GenReport(name, ds.map(_.count()).getOrElse(0L), outFile.getPath)
      }
      val all = perDir.flatMap(_._2).reduceOption(_ union _)
      all match {
        case None => java.nio.file.Files.write(outFile.toPath, Array.empty[Byte])
        case Some(ds) if !merged =>
          deleteRec(outFile)
          ds.write.mode("overwrite").text(outFile.getPath)
        case Some(ds) =>
          val tmp = outFile.getPath + ".spark"
          ds.write.mode("overwrite").text(tmp)
          // byte-level part concat (no row iteration on the driver)
          val parts = Option(new File(tmp).listFiles()).getOrElse(Array.empty)
            .filter(f => f.getName.startsWith("part") && !f.getName.endsWith(".crc"))
            .sortBy(_.getName)
          val out = java.nio.file.Files.newOutputStream(outFile.toPath)
          try parts.foreach(pf => java.nio.file.Files.copy(pf.toPath, out))
          finally out.close()
          deleteRec(new File(tmp))
      }
      reports
    } finally perDir.flatMap(_._2).foreach(_.unpersist())
  }

  private def deleteRec(f: File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRec)
    f.delete()
  }

  /** WpGen.dataset with per-field config overrides. */
  def datasetWithConf(spark: SparkSession, wplSource: String, ruleKey: String,
                      n: Long, seed: Long,
                      fieldConf: Map[String, WpGen.FieldConf]):
      org.apache.spark.sql.Dataset[String] = {
    import spark.implicits._
    spark.range(n).mapPartitions { it =>
      val rule = graft.wpl.WplText.parsePackages(wplSource).find(_.key == ruleKey)
        .getOrElse(throw new IllegalArgumentException(s"no rule $ruleKey"))
      val pid = org.apache.spark.TaskContext.getPartitionId()
      val rnd = new java.util.SplittableRandom(seed + pid * 0x9E3779B97F4A7C15L)
      it.map(_ => WpGen.genLine(rule, rnd, fieldConf))
    }
  }
}
