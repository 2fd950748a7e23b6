package graft.oml

import graft.wpl._
import scala.collection.mutable.ArrayBuffer

/** In-memory lookup tables — the reference's KnowDB (CSV → in-memory
  * SQLite, crates/wp-knowledge). Spark-side the instance is broadcast to
  * executors (read-only, per-executor shared — the analogue of the
  * reference's per-thread SQLite clones without the clones). Equality
  * lookups use a hash index; range conditions fall back to a scan over the
  * (small, dimension-sized) table — callers doing IP-range lookups should
  * use `rangeIndex` (sorted-array binary search, the classic interval
  * trick from SURVEY.md §4). */
final class KnowDb(val tables: Map[String, KnowDb.Table],
                   val spilled: Set[String] = Set.empty) extends Serializable {
  def table(name: String): Option[KnowDb.Table] = tables.get(name)
  /** A dim too big for the driver guardrail, routed to [[SpillEnrich]]'s
    * join instead: the evaluator defers its selects (emitting only the
    * probe key) rather than failing the query. */
  def isSpilled(name: String): Boolean = spilled.contains(name)
}

object KnowDb {
  final case class Table(columns: Vector[String], rows: Vector[Vector[String]]) extends Serializable {
    @transient private lazy val colIdx: Map[String, Int] = columns.zipWithIndex.toMap
    @transient private lazy val eqIndexes =
      new java.util.concurrent.ConcurrentHashMap[Int, Map[String, Vector[Vector[String]]]]()
    def idx(c: String): Int = colIdx.getOrElse(c, -1)
    /** hash-indexed equality probe on one column. */
    def lookupEq(col: String, v: String): Vector[Vector[String]] = {
      val i = idx(col)
      if (i < 0) return Vector.empty
      var m = eqIndexes.get(i)
      if (m == null) {
        m = rows.groupBy(_(i))
        eqIndexes.put(i, m)
      }
      m.getOrElse(v, Vector.empty)
    }
  }

  /** Build a table from CSV text (header row, comma, trim — reference
    * loader.rs:79-101). */
  def fromCsv(name: String, csv: String): (String, Table) = {
    val lines = csv.linesIterator.filter(_.nonEmpty).toVector
    val header = lines.head.split(",", -1).map(_.trim).toVector
    val rows = lines.tail.map(_.split(",", -1).map(_.trim).toVector)
    name -> Table(header, rows)
  }

  /** Build from a collected Spark dimension table (all values stringified
    * with WValue canonical forms). */
  def fromRows(name: String, columns: Vector[String], rows: Vector[Vector[String]]): (String, Table) =
    name -> Table(columns, rows)

  /** Driver-side collect guardrail: a KnowDb dim is per-record-probed
    * state that lives on the driver and in every task binary — at 100x
    * scale a fat "dim" OOMs the driver. Dims beyond this must go through
    * [[SqlEnrichJoin]] (a real BroadcastHashJoin) instead. */
  val DefaultMaxBytes: Long = 8L * 1024 * 1024

  /** Build a KnowDb table from a Spark dimension with the size guardrail
    * applied BEFORE and after the collect (plan-stats estimate first, so
    * an over-sized dim never reaches the driver; exact chars after).
    * Throws past the guardrail — [[fromDims]] is the non-throwing
    * auto-routing entry point. */
  def fromDim(name: String, df: org.apache.spark.sql.DataFrame,
              maxBytes: Long = DefaultMaxBytes): (String, Table) =
    tryFromDim(name, df, maxBytes) match {
      case Right(t) => t
      case Left(n) => throw new IllegalArgumentException(
        s"KnowDb dim '$name' is ~$n bytes — over the $maxBytes-byte driver guardrail; " +
          "compile this enrich to a broadcast join (graft.oml.SqlEnrichJoin) instead")
    }

  /** [[fromDim]] without the throw: Left(estimatedBytes) when the dim is
    * over the guardrail (the plan-stats estimate rejects before any
    * collect; the exact char count rejects after). */
  def tryFromDim(name: String, df: org.apache.spark.sql.DataFrame,
                 maxBytes: Long = DefaultMaxBytes): Either[Long, (String, Table)] = {
    val est = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (est.isValidLong && est.toLong > maxBytes * 4) return Left(est.toLong)
    val cols = df.schema.fieldNames.toVector
    var bytes = 0L
    val collected = df.collect()
    val rows = Vector.newBuilder[Vector[String]]
    var i = 0
    while (i < collected.length) {
      val v = collected(i).toSeq.map(x => if (x == null) "" else x.toString).toVector
      bytes += v.iterator.map(_.length.toLong * 2 + 40).sum
      if (bytes > maxBytes) return Left(bytes)
      rows += v
      i += 1
    }
    Right(name -> Table(cols, rows.result()))
  }

  /** Auto-routing over a set of Spark dims: dims inside the guardrail
    * collect into driver tables (per-record broadcast probe — the fast
    * path for true dims); dims beyond it are NEVER collected — they come
    * back in the second element for [[SpillEnrich]] to complete as a
    * real join, and their names are marked in the KnowDb so the
    * evaluator defers their selects instead of erroring. At 100× scale
    * a grown dim thus degrades to a shuffle/broadcast join, not a
    * failed query. */
  def fromDims(dims: Map[String, org.apache.spark.sql.DataFrame],
               maxBytes: Long = DefaultMaxBytes)
      : (KnowDb, Map[String, org.apache.spark.sql.DataFrame]) = {
    val routed = dims.map { case (n, df) => n -> tryFromDim(n, df, maxBytes) }
    val small = routed.values.collect { case Right(t) => t }.toMap
    val big = routed.collect { case (n, Left(_)) => n -> dims(n) }
    (new KnowDb(small, big.keySet.toSet), big.toMap)
  }

  val empty = new KnowDb(Map.empty)
}

/** OML evaluator: walks model items against a (src, dst) record pair
  * (reference DataTransformer, crates/wp-oml/src/core/evaluator).
  * Semantics (SURVEY.md §2.4 + §7.4):
  *  - read: dst first, then src, then statics; option chain skips empty;
  *  - take: like read but consumes (removed from src, excluded from the
  *    `* = take()` splat);
  *  - empty output = transform failure → error channel;
  *  - `Time::to_ts` default zone UTC+8 (reference pipe/time.rs).
  */
final class OmlEval(model: OmlAst.Model, knowDb: KnowDb = KnowDb.empty,
                    nowMicros: () => Long = () => System.currentTimeMillis() * 1000L,
                    semanticEnabled: Boolean = true)
    extends Serializable {
  import OmlAst._

  private val staticRec: Vector[WField] = {
    val empty = new TransformState(Vector.empty)
    model.statics.map { case (n, e) => WField(n, eval(e, empty).getOrElse(WNull)) }
  }

  private final class TransformState(src0: Vector[WField]) {
    val src = ArrayBuffer.from(src0)
    val dst = new ArrayBuffer[WField]()
    def findRead(key: String): Option[WValue] =
      dst.find(_.name == key).map(_.value)
        .orElse(src.find(_.name == key).map(_.value))
        .orElse(staticRec.find(_.name == key).map(_.value))
    def take(key: String): Option[WValue] = {
      val di = dst.indexWhere(_.name == key)
      if (di >= 0) return Some(dst(di).value)
      val i = src.indexWhere(_.name == key)
      if (i >= 0) { val v = src(i).value; src.remove(i); Some(v) }
      else staticRec.find(_.name == key).map(_.value)
    }
  }

  /** Transform + privacy masking (reference runtime masking is opt-in;
    * call this instead of `transform` to honor the model's privacy
    * section). */
  def transformMasked(fields: Vector[WField]): Option[Vector[WField]] =
    transform(fields).map(Privacy.apply(_, model.privacy))

  /** Transform one parsed record; None = transform failure (reference
    * routes it to the error sink with diagnostics). Fields named `__*`
    * are TEMPORARY (reference object.rs:31-38 + the
    * oml_temp_field_performance design note): usable by later
    * expressions during the transform, dropped from the output. */
  def transform(fields: Vector[WField]): Option[Vector[WField]] = {
    val st = new TransformState(fields)
    for (item <- model.items) {
      evalItem(item, st)
    }
    if (st.dst.isEmpty) None
    // `__` temp fields stay internal — EXCEPT `__spill_` probe keys,
    // which SpillEnrich consumes downstream and then removes
    else Some(st.dst.toVector.filterNot(f =>
      f.name.startsWith("__") && !f.name.startsWith("__spill_")))
  }

  private def evalItem(item: Item, st: TransformState): Unit = {
    item.targets match {
      case Vector(Target("*", _)) =>
        // `* = take()` splat: all remaining (unconsumed) src fields
        st.src.foreach(f => st.dst += f)
        st.src.clear()
      case targets =>
        item.eval match {
          case sql: SqlE if knowDb.isSpilled(sql.table) =>
            // deferred spill enrich: the dim was too big to collect, so
            // the select completes as a Spark join AFTER the parse stage
            // (SpillEnrich). Here we only evaluate and emit the probe
            // key — rhs evaluation (incl. ip4_int) runs with full src
            // visibility, which the post-join stage no longer has.
            sql.cond match {
              case SqlCmp(_, "=", rhs) =>
                rhsValue(rhs, st).foreach { key =>
                  st.dst += WField(SpillEnrich.markerName(sql.table, targets.head.name),
                    WChars(key))
                }
              case _ => throw new IllegalStateException(
                s"dim '${sql.table}' spilled past the KnowDb guardrail supports only " +
                  "single-equality selects (hash-joinable); rewrite the condition or " +
                  "raise the guardrail")
            }
          case sql: SqlE if targets.length > 1 =>
            // multi-target bind: name, email = select name, email from ...
            evalSql(sql, st) match {
              case Some(vs) =>
                targets.zip(vs).foreach { case (tg, v) =>
                  if (tg.name != "_") st.dst += WField(tg.name, cast(v, tg.dtype))
                }
              case None =>
            }
          case e =>
            for (tg <- targets) {
              val bound = bindPositional(e, tg.name)
              eval(bound, st) match {
                case Some(v) if tg.name != "_" => st.dst += WField(tg.name, cast(v, tg.dtype))
                case _ =>
              }
            }
        }
    }
  }

  /** Unnamed take()/read() bind to the target name (grammar §读取语义). */
  private def bindPositional(e: Eval, target: String): Eval = e match {
    case a @ Acq(_, keys, _, None, _) if keys.isEmpty => a.copy(keys = Vector(target))
    case p @ PipeE(src, funs) => PipeE(bindPositional(src, target), funs)
    case other => other
  }

  private[oml] def eval(e: Eval, st: TransformState): Option[WValue] = e match {
    case Acq(consume, keys, optKeys, jsonPath, default) =>
      val hit: Option[WValue] = jsonPath match {
        case Some(p) => jsonPathRead(p, st)
        case None =>
          // bare key (or positional target) first, then the option
          // chain. Reference read.rs/take.rs: the skip-empty rule is
          // `!(option && value.is_empty())` — ONLY option-chain keys
          // pass over empty values; a bare key returns whatever it
          // finds, empty included
          (keys.iterator.map(k => (k, false)) ++ optKeys.iterator.map(k => (k, true)))
            .flatMap { case (k, isOpt) =>
              val hit =
                if (k.contains("*")) {
                  val names = (st.dst ++ st.src).map(_.name).filter(n => wildMatch(k, n))
                  names.headOption.flatMap(n => if (consume) st.take(n) else st.findRead(n))
                } else if (consume) st.take(k) else st.findRead(k)
              hit.filter(v => v != WNull && (!isOpt || v.sval.nonEmpty))
            }
            .nextOption()
      }
      hit.orElse(default.flatMap(d => eval(d, st)))
    case ValueE(dtype, lit) => Some(typedLiteral(dtype, lit))
    case NowE(kind) =>
      val us = nowMicros()
      val inst = java.time.Instant.ofEpochSecond(us / 1000000L, (us % 1000000L) * 1000L)
      val utc = java.time.ZonedDateTime.ofInstant(inst, java.time.ZoneOffset.UTC)
      kind match {
        case "time" => Some(WTime(us, utc.toLocalDateTime.toString))
        case "date" => Some(WChars(f"${utc.getYear}%04d${utc.getMonthValue}%02d${utc.getDayOfMonth}%02d"))
        case "hour" => Some(WChars(f"${utc.getYear}%04d${utc.getMonthValue}%02d${utc.getDayOfMonth}%02d${utc.getHour}%02d"))
        case _ => None
      }
    case FmtE(tpl, args) =>
      val vals = args.map(a => eval(a, st).map(_.sval).getOrElse(""))
      val sb = new StringBuilder
      var ai = 0; var i = 0
      while (i < tpl.length) {
        if (i + 1 < tpl.length && tpl.charAt(i) == '{' && tpl.charAt(i + 1) == '}') {
          sb.append(if (ai < vals.length) vals(ai) else ""); ai += 1; i += 2
        } else { sb.append(tpl.charAt(i)); i += 1 }
      }
      Some(WChars(sb.toString))
    case PipeE(src, funs) =>
      eval(src, st).flatMap(v => funs.foldLeft(Option(v)) {
        case (Some(acc), (fn, args)) => OmlPipes.apply(fn, args, acc, semanticEnabled)
        case (None, _) => None
      })
    case ObjectE(items) =>
      val sub = Vector.newBuilder[(String, WValue)]
      for (it <- items; tg <- it.targets if tg.name != "_") {
        eval(bindPositional(it.eval, tg.name), st).foreach(v =>
          sub += (tg.name -> cast(v, tg.dtype)))
      }
      Some(WObj(sub.result()))
    case CollectE(a) =>
      val keys = (a.keys ++ a.optKeys).flatMap { k =>
        if (k.contains("*")) (st.dst ++ st.src).map(_.name).filter(n => wildMatch(k, n)).distinct
        else Vector(k)
      }
      val vs = keys.flatMap(k => if (a.consume) st.take(k) else st.findRead(k))
      Some(WArr(vs))
    case MatchE(sources, cases, default) =>
      val srcVals = sources.map(s => eval(s, st))
      val hit = cases.find { case (conds, _) =>
        conds.length == srcVals.length && conds.zip(srcVals).forall {
          case (ors, Some(v)) => ors.exists(c => condMatches(c, v))
          case (_, None) => false
        }
      }
      hit.map(_._2).orElse(default).flatMap(e2 => eval(e2, st))
    case sql: SqlE if knowDb.isSpilled(sql.table) =>
      // a spilled select nested inside a pipe/expression has no join
      // completion point — only direct `x = select ...` items defer
      throw new IllegalStateException(
        s"dim '${sql.table}' spilled past the KnowDb guardrail: selects on it must " +
          "be direct model items (x = select ...), not nested expressions")
    case sql: SqlE => evalSql(sql, st).flatMap(_.headOption)
    // bare symbol reference (oml_static_blocks.md new DSL): dst-first,
    // then src, then static constants — `EventId = target_template |
    // get(id)` reads the just-assigned dst field, while `e1_template`
    // in a match arm resolves from the constant pool
    case StaticRef(n) => st.findRead(n)
  }

  private def condMatches(c: Cond, v: WValue): Boolean = c match {
    case CondEq(ve) => valueEq(typedLiteral(ve.dtype, ve.literal), v)
    case CondNeq(ve) => !valueEq(typedLiteral(ve.dtype, ve.literal), v)
    case CondIn(lo, hi) =>
      (typedLiteral(lo.dtype, lo.literal), typedLiteral(hi.dtype, hi.literal), v) match {
        case (WDigit(a), WDigit(b), WDigit(x)) => x >= a && x <= b
        case (WFloat(a), WFloat(b), WFloat(x)) => x >= a && x <= b
        case (a, b, x) => a.sval <= x.sval && x.sval <= b.sval
      }
    // reference matchs.rs match_with_function: string functions match
    // ONLY Chars values; numeric functions coerce Digit/Float/parseable
    // Chars to f64 (extract_numeric); anything else fails the branch
    case CondFun(name, args) =>
      def chars: Option[String] = v match {
        case WChars(s) => Some(s); case _ => None
      }
      def num: Option[Double] = v match {
        case WDigit(d) => Some(d.toDouble)
        case WFloat(f) => Some(f)
        case WChars(s) => s.toDoubleOption
        case _ => None
      }
      def argNum(i: Int): Option[Double] = args.lift(i).flatMap(_.toDoubleOption)
      (name, args) match {
        case ("starts_with", Vector(p)) => chars.exists(_.startsWith(p))
        case ("ends_with", Vector(p)) => chars.exists(_.endsWith(p))
        case ("contains", Vector(p)) => chars.exists(_.contains(p))
        case ("regex_match", Vector(p)) =>
          chars.exists { s =>
            try java.util.regex.Pattern.compile(p).matcher(s).find()
            catch { case _: Exception => false } // invalid regex → no match
          }
        case ("is_empty", _) => chars.exists(_.isEmpty)
        case ("iequals", Vector(p)) =>
          chars.exists(_.toLowerCase == p.toLowerCase)
        case ("gt", _) => (num, argNum(0)) match {
          case (Some(a), Some(b)) => a > b; case _ => false
        }
        case ("lt", _) => (num, argNum(0)) match {
          case (Some(a), Some(b)) => a < b; case _ => false
        }
        case ("eq", _) => (num, argNum(0)) match {
          case (Some(a), Some(b)) => math.abs(a - b) < 1e-10; case _ => false
        }
        case ("in_range", _) => (num, argNum(0), argNum(1)) match {
          case (Some(x), Some(lo), Some(hi)) => x >= lo && x <= hi
          case _ => false
        }
        case _ => false
      }
  }

  private def valueEq(a: WValue, b: WValue): Boolean = (a, b) match {
    case (WDigit(x), WDigit(y)) => x == y
    case (WFloat(x), WFloat(y)) => x == y
    case (WBool(x), WBool(y)) => x == y
    case _ => a.sval == b.sval
  }

  private def typedLiteral(dtype: String, lit: String): WValue = dtype match {
    case "chars" => WChars(lit)
    case "digit" => try WDigit(lit.toLong) catch { case _: NumberFormatException => WNull }
    case "float" => try WFloat(lit.toDouble) catch { case _: NumberFormatException => WNull }
    case "bool" => WBool(lit == "true")
    case "ip" => WIp(lit)
    case "time" => TimeP.auto.parseSegment(lit) match { case One(t: WTime) => t; case _ => WNull }
    case "auto" => AutoVal.typed(lit)
    case _ => WChars(lit)
  }

  private def cast(v: WValue, dtype: Option[String]): WValue = WCast(v, dtype)

  private def jsonPathRead(path: String, st: TransformState): Option[WValue] = {
    val segs = path.split('/').filter(_.nonEmpty).toVector
    if (segs.isEmpty) return None
    var cur: Option[WValue] = st.findRead(segs.head)
    for (seg <- segs.drop(1)) {
      cur = cur.flatMap {
        case WObj(fs) => fs.find(_._1 == seg).map(_._2)
        case WArr(xs) if seg.startsWith("[") && seg.endsWith("]") =>
          val i = seg.drop(1).dropRight(1).toInt
          xs.lift(i)
        case WArr(xs) if seg.forall(_.isDigit) => xs.lift(seg.toInt)
        case WChars(s) =>
          // lenient: JSON-encoded string field
          JsonP.parseSegment(s) match {
            case Named(fs) => fs.find(_._1 == seg).map(_._2)
            case _ => None
          }
        case _ => None
      }
    }
    cur
  }

  /** SQL lookup against KnowDB (reference sql.rs:30-130): single table,
    * equality via hash probe when possible, else filtered scan. Returns
    * the selected columns of the first matching row. */
  private def evalSql(sql: SqlE, st: TransformState): Option[Vector[WValue]] = {
    knowDb.table(sql.table).flatMap { tbl =>
      // fast path: single equality condition → hash probe
      val rows: Vector[Vector[String]] = sql.cond match {
        case SqlCmp(col, "=", rhs) =>
          rhsValue(rhs, st) match {
            case Some(v) => tbl.lookupEq(col, v)
            case None => Vector.empty
          }
        case cond => tbl.rows.filter(r => sqlCondEval(cond, tbl, r, st))
      }
      rows.headOption.map { row =>
        val cols = if (sql.cols == Vector("*")) tbl.columns else sql.cols
        cols.map(c => {
          val i = tbl.idx(c)
          if (i >= 0 && i < row.length) AutoVal.typed(row(i)) else WNull
        })
      }
    }
  }

  private def rhsValue(rhs: SqlRhs, st: TransformState): Option[String] = rhs match {
    case RhsLit(v) => Some(v)
    case RhsAcq(a, ip4) =>
      eval(a, st).map { v =>
        if (ip4) OmlPipes.ip4ToInt(v.sval).map(_.toString).getOrElse(v.sval) else v.sval
      }
  }

  private def sqlCondEval(c: SqlCond, tbl: KnowDb.Table, row: Vector[String],
                          st: TransformState): Boolean = c match {
    case SqlAnd(l, r) => sqlCondEval(l, tbl, row, st) && sqlCondEval(r, tbl, row, st)
    case SqlOr(l, r) => sqlCondEval(l, tbl, row, st) || sqlCondEval(r, tbl, row, st)
    case SqlNot(i) => !sqlCondEval(i, tbl, row, st)
    case SqlCmp(col, op, rhs) =>
      val ci = tbl.idx(col)
      if (ci < 0) return false
      val lv = row(ci)
      val rv = rhsValue(rhs, st).getOrElse(return false)
      val cmpNum: Option[Int] =
        try Some(java.lang.Long.compare(lv.toLong, rv.toLong))
        catch { case _: NumberFormatException =>
          try Some(java.lang.Double.compare(lv.toDouble, rv.toDouble))
          catch { case _: NumberFormatException => None }
        }
      val cmp = cmpNum.getOrElse(lv.compareTo(rv))
      op match {
        case "=" | "==" => cmp == 0
        case "!=" => cmp != 0
        case "<" => cmp < 0
        case "<=" => cmp <= 0
        case ">" => cmp > 0
        case ">=" => cmp >= 0
        case _ => false
      }
  }
}

/** OML pipe functions (reference PipeFun enum,
  * crates/wp-oml/src/language/syntax/functions/pipe/mod.rs:18-43). */
object OmlPipes {
  import java.nio.charset.Charset

  def ip4ToInt(s: String): Option[Long] = {
    val parts = s.split("\\.", -1)
    if (parts.length != 4) return None
    try {
      val v = parts.map(_.toLong)
      if (v.exists(x => x < 0 || x > 255)) None
      else Some((v(0) << 24) | (v(1) << 16) | (v(2) << 8) | v(3))
    } catch { case _: NumberFormatException => None }
  }

  /** EncodeType name → JVM charset, mirroring the reference's
    * encoding_rs choices AND its explicit fallbacks (pipe/base64.rs). */
  private def charsetForEncodeType(enc: String): Charset = Charset.forName(enc match {
    case "Utf8"        => "UTF-8"
    case "Utf16le"     => "UTF-16LE"
    case "Utf16be"     => "UTF-16BE"
    case "Windows949"  => "GB18030" // reference fallback (no 949 in encoding_rs)
    case "EucJp"       => "EUC-JP"
    case "Windows31j"  => "Shift_JIS" // reference uses SHIFT_JIS for 31J
    case "Iso2022Jp"   => "ISO-2022-JP"
    case "Gbk"         => "GB18030" // reference decodes GBK via GB18030
    case "Gb18030"     => "GB18030"
    case "HZ"          => "UTF-8" // reference fallback (lossy)
    case "Big52003"    => "Big5"
    case "MacCyrillic" => "x-MacCyrillic"
    case "Windows874"  => "x-windows-874"
    case w if w.startsWith("Windows12") => "windows-" + w.stripPrefix("Windows")
    case "Ascii"       => "UTF-8" // reference: "ASCII is a subset of UTF-8"
    case "Ibm866"      => "IBM866"
    case i if i.startsWith("Iso8859") => "ISO-8859-" + i.stripPrefix("Iso8859")
    case "Koi8R"       => "KOI8-R"
    case "Koi8U"       => "KOI8-U"
    case "MacRoman"    => "x-MacRoman" // encoding_rs MACINTOSH
    case _             => "UTF-8"
  })

  /** imap-types escape_byte_string: printable ASCII passes through,
    * backslash/quote escape, CR/LF → \r \n, everything else → \xHH. */
  private def escapeByteString(bytes: Array[Byte]): String = {
    val sb = new StringBuilder(bytes.length + 16)
    bytes.foreach { b =>
      (b & 0xFF) match {
        case 0x0D => sb.append("\\r")
        case 0x0A => sb.append("\\n")
        case 0x5C => sb.append("\\\\")
        case 0x22 => sb.append("\\\"")
        case p if p >= 0x20 && p < 0x7F => sb.append(p.toChar)
        case other => sb.append(f"\\x$other%02x")
      }
    }
    sb.toString
  }

  def apply(fn: String, args: Vector[String], v: WValue,
            semanticEnabled: Boolean = true): Option[WValue] = fn match {
    case "base64_encode" =>
      Some(WChars(java.util.Base64.getEncoder.encodeToString(v.sval.getBytes("UTF-8"))))
    case "base64_decode" =>
      // full EncodeType surface (reference pipe/base64.rs enum +
      // evaluator arms, incl. its documented fallbacks: Gbk and
      // Windows949 decode as GB18030, Iso88591 as windows-1252, HZ and
      // Ascii as lossy UTF-8); a failed base64 decode yields an EMPTY
      // string field, not a dropped field (evaluator else-branch)
      try {
        val bytes = java.util.Base64.getDecoder.decode(v.sval)
        val enc = args.headOption.getOrElse("Utf8")
        val out =
          if (enc == "Imap") escapeByteString(bytes)
          else new String(bytes, charsetForEncodeType(enc))
        Some(WChars(out))
      } catch { case _: Exception => Some(WChars("")) }
    case "html_escape" =>
      Some(WChars(v.sval.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
        .replace("\"", "&quot;").replace("'", "&#39;")))
    case "html_unescape" =>
      Some(WChars(v.sval.replace("&lt;", "<").replace("&gt;", ">").replace("&quot;", "\"")
        .replace("&#39;", "'").replace("&amp;", "&")))
    case "str_escape" =>
      Some(WChars(v.sval.replace("\\", "\\\\").replace("\"", "\\\"")
        .replace("\n", "\\n").replace("\t", "\\t").replace("\r", "\\r")))
    case "str_unescape" =>
      Some(WChars(v.sval.replace("\\n", "\n").replace("\\t", "\t").replace("\\r", "\r")
        .replace("\\\"", "\"").replace("\\\\", "\\")))
    case "json_escape" => Some(WChars(Json.quote(v.sval).drop(1).dropRight(1)))
    case "json_unescape" =>
      Some(WChars(v.sval.replace("\\\"", "\"").replace("\\\\", "\\")
        .replace("\\n", "\n").replace("\\t", "\t").replace("\\r", "\r")))
    case "Time::to_ts" => toTs(v, 8 * 3600, 1L) // default UTC+8 (reference pipe/time.rs)
    case "Time::to_ts_ms" => toTs(v, 8 * 3600, 1000L)
    case "Time::to_ts_us" => toTs(v, 8 * 3600, 1000000L)
    case "Time::to_ts_zone" =>
      val z = args.headOption.map(_.toInt).getOrElse(0)
      val unit = args.lift(1).getOrElse("s") match {
        case "ms" => 1000L; case "us" => 1000000L; case _ => 1L
      }
      toTs(v, z * 3600, unit)
    case "nth" =>
      val i = args.headOption.map(_.toInt).getOrElse(0)
      v match { case WArr(xs) => xs.lift(i); case _ => None }
    case "get" =>
      val k = args.headOption.getOrElse("")
      v match { case WObj(fs) => fs.find(_._1 == k).map(_._2); case _ => None }
    case "path" =>
      val s = v.sval
      args.headOption match {
        case Some("name") => Some(WChars(s.substring(s.lastIndexOf('/') + 1)))
        case _ =>
          val i = s.lastIndexOf('/')
          Some(WChars(if (i <= 0) "/" else s.substring(0, i)))
      }
    case "url" =>
      try {
        val u = new java.net.URI(v.sval)
        args.headOption match {
          case Some("domain") | Some("host") => Some(WChars(Option(u.getHost).getOrElse("")))
          case Some("uri") => Some(WChars(Option(u.getRawPath).getOrElse("") +
            Option(u.getRawQuery).map("?" + _).getOrElse("")))
          case Some("path") => Some(WChars(Option(u.getRawPath).getOrElse("")))
          case Some("params") => Some(WChars(Option(u.getRawQuery).getOrElse("")))
          case _ => Some(WChars(v.sval))
        }
      } catch { case _: Exception => None }
    case "starts_with" =>
      val p = args.headOption.map(a => a.stripPrefix("'").stripSuffix("'")
        .stripPrefix("\"").stripSuffix("\"")).getOrElse("")
      Some(WBool(v.sval.startsWith(p)))
    case "map_to" =>
      Some(AutoVal.typed(args.headOption.map(a => a.stripPrefix("'").stripSuffix("'")
        .stripPrefix("\"").stripSuffix("\"")).getOrElse("")))
    case "sxf_get" =>
      // extract a named field from semi-structured text: key=value,
      // key: value, or "key":"value" forms (reference documents this pipe
      // in 04-functions-reference.md; no in-repo impl — behavior derived
      // from the doc's contract)
      args.headOption.flatMap { key =>
        val s = v.sval
        var i = s.indexOf(key)
        while (i >= 0) {
          val after = i + key.length
          val boundedBefore = i == 0 || !Character.isLetterOrDigit(s.charAt(i - 1))
          var j = after
          while (j < s.length && s.charAt(j) == '"') j += 1
          while (j < s.length && (s.charAt(j) == ' ')) j += 1
          if (boundedBefore && j < s.length && (s.charAt(j) == '=' || s.charAt(j) == ':')) {
            var k = j + 1
            while (k < s.length && s.charAt(k) == ' ') k += 1
            if (k < s.length && s.charAt(k) == '"') {
              val e = s.indexOf('"', k + 1)
              return Some(WChars(if (e < 0) s.substring(k + 1) else s.substring(k + 1, e)))
            } else {
              var e = k
              while (e < s.length && !",; \t".contains(s.charAt(e))) e += 1
              return Some(WChars(s.substring(k, e).trim))
            }
          }
          i = s.indexOf(key, i + 1)
        }
        None
      }
    case "to_str" => Some(WChars(v.sval))
    case "to_json" => Some(WChars(v.jval))
    case "skip_empty" => if (v.sval.isEmpty) None else Some(v)
    case "ip4_to_int" => ip4ToInt(v.sval).map(WDigit(_))
    // gated by the engine-level semantic switch (reference
    // extract_word.rs:311-312,370-371: disabled → empty obj / empty
    // chars; [semantic].enabled in wparse.toml, default off there —
    // library embedding here defaults on)
    case "extract_main_word" =>
      Some(if (semanticEnabled) WChars(ExtractWords.mainWord(v.sval)) else WChars(""))
    case "extract_subject_object" =>
      Some(if (semanticEnabled) ExtractWords.subjectObject(v.sval) else WObj(Vector.empty))
    case _ => Some(v)
  }

  private def toTs(v: WValue, zoneShiftSec: Int, unit: Long): Option[WValue] = v match {
    case WTime(us, _) =>
      // naive datetime interpreted in the given zone → epoch
      val epochUs = us - zoneShiftSec * 1000000L
      Some(WDigit(epochUs / (1000000L / unit)))
    case WDigit(d) => Some(WDigit(d))
    case WChars(s) =>
      TimeP.auto.parseSegment(s) match {
        case One(WTime(us, _)) =>
          Some(WDigit((us - zoneShiftSec * 1000000L) / (1000000L / unit)))
        case _ => None
      }
    case _ => None
  }
}

/** Target-dtype cast, shared by the in-eval path and SpillEnrich's
  * post-join completion (identical typing either route). */
private[oml] object WCast {
  def apply(v: WValue, dtype: Option[String]): WValue = dtype match {
    case None | Some("auto") => v
    case Some("chars") => WChars(v.sval)
    case Some("digit") => v match {
      case d: WDigit => d
      case WFloat(f) => WDigit(f.toLong)
      case WBool(b) => WDigit(if (b) 1 else 0)
      case WTime(us, _) => WDigit(us)
      case o => try WDigit(o.sval.toLong) catch { case _: NumberFormatException => WNull }
    }
    case Some("float") => v match {
      case f: WFloat => f
      case WDigit(d) => WFloat(d.toDouble)
      case o => try WFloat(o.sval.toDouble) catch { case _: NumberFormatException => WNull }
    }
    case Some("ip") => WIp(v.sval)
    case Some("bool") => v match {
      case b: WBool => b
      case o => WBool(o.sval == "true")
    }
    case Some("time") => v match {
      case t: WTime => t
      case o => TimeP.auto.parseSegment(o.sval) match { case One(t: WTime) => t; case _ => WNull }
    }
    case Some("obj") => v
    case Some("array") => v match { case a: WArr => a; case o => WArr(Vector(o)) }
    case Some(_) => v
  }
}
