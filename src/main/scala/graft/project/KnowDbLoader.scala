package graft.project

import java.io.File
import graft.oml.KnowDb

/** Directory-based KnowDB loading — the reference's
  * `models/knowledge/knowdb.toml` specification
  * (docs/usage/en/02-config/07-knowdb_config.md): `[[tables]]` sections
  * name per-table directories holding `create.sql` + `insert.sql`
  * (mandatory in the spec — validated here, though the SQL itself is
  * SQLite DDL the Spark engine does not execute) and a CSV data file.
  * Column mapping: `columns.by_header` selects/reorders header columns;
  * `by_index` maps positions when `has_header = false`. Bad rows follow
  * `on_error` (`fail` default | `skip`).
  *
  * The reference materializes into SQLite; here each table becomes the
  * in-memory [[KnowDb]] the OML SQL evaluator probes per record. The
  * same driver guardrail as `KnowDb.fromDim` applies: knowledge tables
  * are small authoritative dims — anything bigger belongs in a
  * [[graft.oml.SqlEnrichJoin]] broadcast join.
  */
object KnowDbLoader {

  def load(root: File): KnowDb = loadFrom(new File(root, "models/knowledge"))

  def loadFrom(base: File): KnowDb = {
    val conf = new File(base, "knowdb.toml")
    if (!conf.isFile) return KnowDb.empty
    val t = Toml.parse(new String(
      java.nio.file.Files.readAllBytes(conf.toPath), "UTF-8"))
    val tables = t.tables("tables").map { tt =>
      val name = tt.str("name").getOrElse(
        throw new IllegalArgumentException("knowdb [[tables]] entry needs a name"))
      val dir = new File(base, tt.str("dir").getOrElse(name))
      for (sql <- Seq("create.sql", "insert.sql"))
        require(new File(dir, sql).isFile, s"knowdb table '$name': missing $dir/$sql")
      val dataFile = new File(dir, tt.str("data_file").getOrElse("data.csv"))
      require(dataFile.isFile, s"knowdb table '$name': no data file $dataFile")
      val hasHeader = tt.bool("has_header").getOrElse(true)
      val onError = tt.str("on_error").getOrElse("fail")
      val lines = scala.io.Source.fromFile(dataFile, "UTF-8").getLines()
        .filter(_.nonEmpty).toVector
      val (headerCols, dataLines) =
        if (hasHeader) (lines.head.split(",", -1).map(_.trim).toVector, lines.tail)
        else (Vector.empty[String], lines)
      val byHeader = tt.strings("columns", "by_header")
      val byIndex = tt.strings("columns", "by_index")
      val (columns, picks): (Vector[String], Vector[Int]) =
        if (byHeader.nonEmpty) {
          require(hasHeader, s"knowdb table '$name': by_header needs has_header=true")
          val idx = byHeader.map { c =>
            val i = headerCols.indexOf(c)
            require(i >= 0, s"knowdb table '$name': column '$c' not in CSV header")
            i
          }
          (byHeader, idx)
        } else if (byIndex.nonEmpty) {
          (byIndex, byIndex.indices.toVector)
        } else {
          require(hasHeader, s"knowdb table '$name': columns.by_index required when has_header=false")
          (headerCols, headerCols.indices.toVector)
        }
      var bytes = 0L
      val rows = dataLines.flatMap { line =>
        val cells = line.split(",", -1).map(_.trim).toVector
        if (picks.forall(_ < cells.length)) {
          val row = picks.map(cells(_))
          bytes += row.iterator.map(_.length.toLong * 2 + 40).sum
          require(bytes <= KnowDb.DefaultMaxBytes,
            s"knowdb table '$name' exceeds the ${KnowDb.DefaultMaxBytes}-byte driver " +
              "guardrail; load it as a Spark dim and use SqlEnrichJoin instead")
          Some(row)
        } else if (onError == "skip") None
        else throw new IllegalArgumentException(
          s"knowdb table '$name': bad row '$line' (on_error=fail)")
      }
      name -> KnowDb.Table(columns, rows)
    }
    new KnowDb(tables.toMap)
  }
}
