package graft.project

import java.io.File
import java.nio.file.{Files, Paths}

/** `wproj init` — scaffold a loadable project instance (reference
  * `crates/wp-proj/src/project/init.rs`: PrjScope modes gate which
  * component families are materialized; existing files are never
  * overwritten). The generated skeleton is a runnable demo: `wpgen
  * project <root>` fills `src_dat/gen.dat`, `wparse project <root>`
  * parses and routes it to `out/demo.dat`.
  *
  * Scope semantics (init.rs:28-50):
  *   full     — conf + topology + models + connectors
  *   normal   — conf + topology + models
  *   model    — models only
  *   conf     — conf only
  *   topology — topology only
  *   data     — data dirs only
  */
object ProjectInit {

  final case class Scope(name: String) {
    def conf: Boolean = Set("conf", "full", "normal")(name)
    def topology: Boolean = Set("topology", "full", "normal")(name)
    def model: Boolean = Set("model", "full", "normal")(name)
    def connector: Boolean = name == "full"
  }

  val scopes: Set[String] = Set("full", "normal", "model", "conf", "topology", "data")

  def scope(s: String): Scope = {
    require(scopes(s), s"not init mode: $s (full|normal|model|conf|topology|data)")
    Scope(s)
  }

  /** Write `content` at root/rel unless the file already exists
    * (reference init never clobbers user files). Returns true if
    * written. */
  private def writeIfAbsent(root: File, rel: String, content: String): Boolean = {
    val p = new File(root, rel)
    if (p.exists()) return false
    Option(p.getParentFile).foreach(_.mkdirs())
    Files.write(p.toPath, content.getBytes("UTF-8"))
    true
  }

  private def mkdirs(root: File, rels: String*): Unit =
    rels.foreach(r => new File(root, r).mkdirs())

  /** Scaffold the instance; returns the relative paths written. */
  def init(rootPath: String, mode: String = "full"): Vector[String] = {
    val sc = scope(mode)
    val root = new File(rootPath)
    root.mkdirs()
    val written = Vector.newBuilder[String]
    def put(rel: String, content: String): Unit =
      if (writeIfAbsent(root, rel, content)) written += rel

    // data dirs exist in every mode (init.rs mk_framework_dir)
    mkdirs(root, "src_dat", "out", "rescue")

    if (sc.conf) {
      put("conf/wparse.toml",
        """version = "1.0"
          |
          |[models]
          |wpl = "./models/wpl"
          |oml = "./models/oml"
          |
          |[topology]
          |sources = "./topology/sources"
          |sinks = "./topology/sinks"
          |
          |[semantic]
          |enabled = false
          |""".stripMargin)
      put("conf/wpgen.toml", WpgenTomlScaffold)
    }

    if (sc.topology) {
      put("topology/sources/wpsrc.toml",
        """version = "1.0"
          |
          |[[source_file]]
          |key = "file_1"
          |path = "./src_dat/gen.dat"
          |enable = true
          |encode = "text"
          |tags = ["src : demo"]
          |""".stripMargin)
      put("topology/sinks/defaults.toml",
        """[defaults]
          |tags = ["env : dev"]
          |
          |[defaults.expect]
          |basis = "group_input"
          |mode = "warn"
          |""".stripMargin)
      put("topology/sinks/business.d/demo.toml",
        """version = "2.0"
          |[sink_group]
          |name = "demo"
          |oml = ["*"]
          |
          |[[sink_group.sinks]]
          |name = "demo_file"
          |target = "file"
          |fmt = "json"
          |path = "./out/demo.dat"
          |""".stripMargin)
      for (ch <- Seq("default", "miss", "error", "residue", "intercept", "monitor"))
        put(s"topology/sinks/infra.d/$ch.toml",
          s"""version = "2.0"
             |[sink_group]
             |name = "$ch"
             |
             |[[sink_group.sinks]]
             |name = "$ch"
             |target = "file"
             |fmt = "raw"
             |path = "./out/$ch.dat"
             |""".stripMargin)
    }

    if (sc.model) {
      mkdirs(root, "models/knowledge")
      put("models/wpl/demo/parse.wpl",
        """package /demo {
          |  rule kv {
          |    (kvarr)
          |  }
          |}
          |""".stripMargin)
      put("models/wpl/demo/gen_rule.wpl",
        """package /demo {
          |  rule kv {
          |    (kvarr)
          |  }
          |}
          |""".stripMargin)
      put("models/wpl/demo/sample.dat",
        """user=alice st=200 op=read
          |user=bob st=404 op=write
          |""".stripMargin)
      put("models/oml/demo.oml",
        """name : demo
          |rule : /demo/*
          |---
          |user : chars = take(option:[user]) ;
          |st : digit = take(option:[st]) { _ : digit(0) } ;
          |* = take() ;
          |""".stripMargin)
      put("models/knowledge/semantic_dict.toml",
        """version = "1"
          |mode = "add"
          |
          |[words]
          |status_words = []
          |action_verbs = []
          |""".stripMargin)
    }

    if (sc.connector) {
      put("connectors/sink.d/00-file.toml",
        """[[connectors]]
          |id = "file_raw_sink"
          |type = "file"
          |allow_override = ["base", "file", "fmt"]
          |
          |[connectors.params]
          |base = "./out"
          |file = "default.dat"
          |fmt = "raw"
          |""".stripMargin)
    }
    written.result()
  }

  // ---- wproj model -----------------------------------------------------

  /** `wproj model list`: rule keys + oml models of a loaded project. */
  def modelList(p: Project.Loaded): Vector[String] = {
    val rules = graft.wpl.Runtime.parseAny(p.wplSource).map(r => s"wpl rule ${r.key}")
    val models = p.omlSources.map { case (stem, src) =>
      val m = graft.oml.OmlText.parse(src)
      s"oml model ${m.name} [$stem] rules=${m.rules.mkString(",")} items=${m.items.size}"
    }
    rules.toVector ++ models
  }

  /** `wproj model validate`: the model-scoped subset of `wproj check` —
    * every wpl rule and oml model parses, every oml rule matcher binds
    * to a loaded wpl rule. */
  def modelValidate(p: Project.Loaded): Vector[String] = {
    val problems = Vector.newBuilder[String]
    val ruleKeys =
      try graft.wpl.Runtime.parseAny(p.wplSource).map(_.key)
      catch { case e: Exception => problems += s"wpl: ${e.getMessage}"; Vector.empty }
    p.omlSources.foreach { case (stem, src) =>
      try {
        val m = graft.oml.OmlText.parse(src)
        m.rules.filterNot(pat => ruleKeys.exists(Project.glob(pat, _))).foreach { pat =>
          problems += s"oml '$stem': rule matcher '$pat' matches no wpl rule"
        }
      } catch { case e: Exception => problems += s"oml '$stem': ${e.getMessage}" }
    }
    problems.result()
  }

  // ---- wpgen conf / data ----------------------------------------------

  private val WpgenTomlScaffold: String =
    """version = "1.0"
      |
      |[generator]
      |mode = "rule"
      |count = 1000
      |speed = 1000
      |parallel = 4
      |
      |[output]
      |# no connector: writes ./src_dat/gen.dat (the demo source path)
      |""".stripMargin

  /** `wpgen conf init`: scaffold conf/<confName> alone (the subset of
    * the full init scaffold the reference's `wpgen conf init -w .`
    * writes; never overwrites). `confName` mirrors the reference's
    * `-c/--conf` custom-filename flag (default wpgen.toml). */
  def wpgenConfInit(rootPath: String, confName: String = "wpgen.toml"): Vector[String] = {
    val root = new File(rootPath); root.mkdirs()
    if (writeIfAbsent(root, s"conf/$confName", WpgenTomlScaffold))
      Vector(s"conf/$confName")
    else Vector.empty
  }

  /** `wpgen conf check`: load + validate the generator config; returns
    * problems (empty = valid). */
  def wpgenConfCheck(rootPath: String, confName: String = "wpgen.toml"): Vector[String] = {
    val root = new File(rootPath)
    if (!new File(root, s"conf/$confName").isFile)
      return Vector(s"no conf/$confName")
    val problems = Vector.newBuilder[String]
    try {
      val c = WpGenProject.loadConf(root, confName)
      if (!Set("rule", "sample")(c.mode)) problems += s"unknown generator mode '${c.mode}'"
      if (c.count <= 0) problems += s"count must be positive (got ${c.count})"
      if (c.parallel <= 0) problems += s"parallel must be positive (got ${c.parallel})"
      if (!Set("raw", "json", "kv", "csv", "proto_text")(c.outFmt))
        problems += s"unknown output fmt '${c.outFmt}'"
      if (c.mode == "sample" && c.samplePattern.isEmpty)
        problems += "mode=sample requires sample_pattern"
    } catch { case e: Exception => problems += s"config load failed: ${e.getMessage}" }
    problems.result()
  }

  /** `wpgen conf clean`: remove generator config files. */
  def wpgenConfClean(rootPath: String, confName: String = "wpgen.toml"): Vector[String] = {
    val root = new File(rootPath)
    Vector(s"conf/$confName", "conf/gen_field.toml").filter { rel =>
      val f = new File(root, rel); f.isFile && f.delete()
    }
  }

  /** `wpgen data clean`: delete the configured generator output (the
    * merged file and/or the sharded `<path>.d` part dir). */
  def wpgenDataClean(rootPath: String, confName: String = "wpgen.toml"): Vector[String] = {
    val root = new File(rootPath)
    val outPath =
      try WpGenProject.loadConf(root, confName).outPath
      catch { case _: Exception => "./src_dat/gen.dat" }
    val target = Project.resolve(root, outPath)
    val deleted = Vector.newBuilder[String]
    def rm(f: File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
      if (f.delete()) deleted += f.getPath
    }
    rm(target)
    rm(new File(target.getPath + ".d"))
    deleted.result()
  }

  // ---- wproj data ------------------------------------------------------

  /** `wproj data clean`: remove generated outputs (out/ contents,
    * rescue/ contents, streaming checkpoints). Returns deleted paths. */
  def dataClean(rootPath: String): Vector[String] = {
    val root = new File(rootPath)
    val deleted = Vector.newBuilder[String]
    def rm(f: File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
      if (f.delete()) deleted += f.getPath
    }
    for (dir <- Seq("out", "rescue")) {
      val d = new File(root, dir)
      Option(d.listFiles()).getOrElse(Array.empty).foreach(rm)
    }
    deleted.result()
  }

  final case class DataStat(group: String, sink: String, path: String,
                            rows: Long, expectOk: Boolean)

  /** `wproj data stat`: offline count validation over a project's sink
    * OUTPUTS (reference `wproj data stat` — post-run file counts, not a
    * re-execution). Basis approximation, documented: `group_input` uses
    * the sum of the group's own sink outputs, `total_input` the sum over
    * all sinks; `mdl:` falls back to the group sum (model attribution
    * is not recoverable from output files alone). */
  def dataStat(p: Project.Loaded): Vector[DataStat] = {
    val all = (p.business ++ p.infra.values).flatMap { g =>
      g.sinks.filter(_.kind == "file").flatMap { s =>
        s.path.map { path =>
          val rows = ProjectRun.readSinkLines(Project.resolve(p.root, path)).size.toLong
          (g, s, path, rows)
        }
      }
    }
    val total = all.map(_._4).sum
    val groupTotals = all.groupBy(_._1.name).map { case (n, xs) => n -> xs.map(_._4).sum }
    all.map { case (g, s, path, rows) =>
      val ge = g.expect.getOrElse(Project.GroupExpect())
      val basis = ge.basis match {
        case "total_input" => total
        case _ => groupTotals(g.name)
      }
      val skip = ge.minSamples.exists(basis < _)
      DataStat(g.name, s.name, path, rows,
        expectOk = skip || s.expect.forall(_.ok(rows, basis)))
    }.toVector
  }
}
