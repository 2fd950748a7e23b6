package graft.operators

/** Shared metadata layer for every persisted artifact (the index/model
  * dirs the engine writes: near-dup bands, embedding buckets, IVF-PQ
  * codes, BM25 postings, LM counts, DSIR reference, substring windows,
  * cardinality registers, media signatures, drift histogram, LR
  * weights, BPE pair counts). Before this layer each artifact pinned
  * its OWN params in `meta.properties` — good — but nothing identified
  * the writer: a probe against an index written by a future
  * incompatible builder failed silently-weird (wrong results or a
  * schema error deep in a join) instead of loudly at load time.
  *
  * Every store now carries three shared keys on top of the
  * kind-specific params:
  *
  *  - `format_version` — the engine-wide artifact format version;
  *    loaders REFUSE a mismatch with an explicit message.
  *  - `kind` — the artifact type (`neardup`, `ann`, …); loaders refuse
  *    an artifact of the wrong kind (probing a cardinality profile as
  *    an LM reference is a config bug, not a parse error).
  *  - `builder_fingerprint` — FNV-1a-64 over the sorted param list; a
  *    cheap identity for "were these two artifacts built compatibly"
  *    without comparing params one by one (`wpindex ls` prints it).
  *
  * `layout.<subdir>` keys record each data subdir's physical layout
  * (`parts:a,b` partition columns, `;sort:c` intra-file sort) so
  * maintenance can compact an appended artifact WITHOUT destroying the
  * pruning its layout pays for — see
  * [[Maintenance.compactArtifact]]. */
object ArtifactMeta {

  /** Engine-wide artifact format version. Bump when any builder's
    * on-disk layout or semantics change incompatibly; every loader
    * then refuses older artifacts instead of mis-probing them. */
  val FormatVersion = 1

  /** Deterministic params fingerprint: FNV-1a-64 over the sorted
    * `k=v` list, hex. Excludes the shared header keys by construction
    * (callers pass only builder params). */
  def fingerprintOf(params: Seq[(String, String)]): String = {
    val s = params.sortBy(_._1).map { case (k, v) => s"$k=$v" }.mkString(";")
    f"${TextAnalysis.fnv1a64(s)}%016x"
  }

  /** Write `path/meta.properties`: builder params + layout entries +
    * the shared header (format_version, kind, builder_fingerprint).
    * `stats` are data-derived values (row totals an append updates) —
    * stored like params but EXCLUDED from the fingerprint, so an
    * append never changes the artifact's builder identity. */
  def store(path: String, kind: String, params: Seq[(String, String)],
            layout: Seq[(String, String)] = Nil,
            stats: Seq[(String, String)] = Nil): Unit = {
    new java.io.File(path).mkdirs()
    val props = new java.util.Properties()
    params.foreach { case (k, v) => props.setProperty(k, v) }
    stats.foreach { case (k, v) => props.setProperty(k, v) }
    layout.foreach { case (sub, spec) => props.setProperty(s"layout.$sub", spec) }
    props.setProperty("format_version", FormatVersion.toString)
    props.setProperty("kind", kind)
    props.setProperty("builder_fingerprint", fingerprintOf(params))
    val w = new java.io.FileWriter(s"$path/meta.properties")
    try props.store(w, s"graft $kind artifact") finally w.close()
  }

  /** Raw read, no validation — for `ls` and maintenance, which operate
    * on whatever is present. None when no meta file exists. */
  def read(path: String): Option[java.util.Properties] = {
    val f = new java.io.File(s"$path/meta.properties")
    if (!f.exists()) None
    else {
      val props = new java.util.Properties()
      val r = new java.io.FileReader(f)
      try props.load(r) finally r.close()
      Some(props)
    }
  }

  /** Load and VALIDATE — the only entry point loaders use. Refuses
    * loudly (IllegalStateException with the path, expected/found
    * values, and the remedy) when the meta is missing, the format
    * version differs, or the artifact is of another kind. */
  def load(path: String, kind: String): java.util.Properties = {
    val props = read(path).getOrElse(throw new IllegalStateException(
      s"graft artifact at $path has no meta.properties — not a graft " +
        "artifact, or written by a pre-versioning builder; rebuild it " +
        "with the current engine"))
    val v = props.getProperty("format_version")
    if (v == null) throw new IllegalStateException(
      s"graft artifact at $path carries no format_version — written by " +
        "a pre-versioning builder; rebuild it with the current engine")
    if (v.toInt != FormatVersion) throw new IllegalStateException(
      s"graft artifact at $path has format_version $v but this engine " +
        s"reads $FormatVersion — rebuild the artifact (or run a matching " +
        "engine version)")
    val k = props.getProperty("kind")
    if (k != kind) throw new IllegalStateException(
      s"graft artifact at $path is of kind '$k', not the expected " +
        s"'$kind' — check the path wiring")
    props
  }

  /** Parse a `layout.<sub>` spec: `parts:a,b;sort:c,d` (either half
    * optional) → (partition cols, sort cols). */
  def parseLayout(spec: String): (Seq[String], Seq[String]) = {
    val kv = spec.split(';').filter(_.nonEmpty).map { part =>
      val Array(k, v) = part.split(":", 2)
      k -> v.split(',').filter(_.nonEmpty).toSeq
    }.toMap
    (kv.getOrElse("parts", Nil), kv.getOrElse("sort", Nil))
  }

  /** Layout entries of an artifact: (subdir, partition cols, sort
    * cols), from the `layout.*` keys. */
  def layoutsOf(props: java.util.Properties): Seq[(String, Seq[String], Seq[String])] = {
    import scala.jdk.CollectionConverters._
    props.stringPropertyNames().asScala.toSeq.sorted
      .filter(_.startsWith("layout."))
      .map { k =>
        val (parts, sort) = parseLayout(props.getProperty(k))
        (k.stripPrefix("layout."), parts, sort)
      }
  }

  /** One description line per artifact found directly under `root`
    * (and `root` itself if it is one): kind, version, fingerprint, and
    * the builder params — the `wpindex ls` payload. */
  def ls(root: String): Seq[String] = {
    import scala.jdk.CollectionConverters._
    val rootDir = new java.io.File(root)
    val candidates = rootDir +:
      Option(rootDir.listFiles()).getOrElse(Array.empty).toSeq
        .filter(_.isDirectory).sortBy(_.getName)
    candidates.flatMap { d =>
      read(d.getPath).map { props =>
        val header = Set("format_version", "kind", "builder_fingerprint")
        val params = props.stringPropertyNames().asScala.toSeq.sorted
          .filterNot(k => header.contains(k) || k.startsWith("layout."))
          .map(k => s"$k=${props.getProperty(k)}").mkString(" ")
        s"${d.getName}  kind=${props.getProperty("kind")} " +
          s"version=${props.getProperty("format_version")} " +
          s"fingerprint=${props.getProperty("builder_fingerprint")} $params"
      }
    }
  }
}
