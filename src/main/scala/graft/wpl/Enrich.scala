package graft.wpl

/** Parse-time enrichment for the `+geo()/+zone()/+device()` subfield
  * syntax (reference fixture tests/json_test/rule.wpl:1 —
  * `json( @src-ip +geo(city_name), @dst-ip +zone(zone_name),
  * @dev-name+device(device_val) )`): the parsed subfield value is looked
  * up in a knowledge table at parse time and the result is emitted as an
  * extra named field alongside the subfield itself.
  *
  * The enricher is immutable + serializable and ships WITH the compiled
  * parser (expression/closure), so executors see the same tables without
  * any registry bootstrapping — the Spark analogue of the reference's
  * per-worker KnowDB clones.
  *
  * Kinds:
  *  - `geo` / `zone`: IPv4 range tables (the reference's ip_addr GeoIP
  *    shape — wpl_rule.rs ip_addr test rule: ip_beg/ip_end + city_name) —
  *    sorted-array binary search, same trick as knowdb/RangeLookup.
  *  - `device` (and any other kind): exact-match string table.
  */
final class Enricher(val tables: Map[String, Enricher.Table]) extends Serializable {
  /** Looked-up value or null (missing table / no match). */
  def lookup(kind: String, value: String): String = {
    val t = tables.getOrElse(kind, null)
    if (t == null || value == null) null else t.lookup(value)
  }
  def isEmpty: Boolean = tables.isEmpty
}

object Enricher {
  trait Table extends Serializable { def lookup(value: String): String }

  /** Exact-match table (device names → vendor, etc.). */
  final class ExactTable(m: Map[String, String]) extends Table {
    def lookup(value: String): String = m.getOrElse(value, null)
  }

  /** IPv4 range table: (begIncl, endIncl, out) rows, binary-searched. */
  final class IpRangeTable(rows: Seq[(Long, Long, String)]) extends Table {
    private val sorted = rows.sortBy(_._1).toArray
    private val begs = sorted.map(_._1)
    def lookup(value: String): String = {
      val ip = ip4ToLong(value)
      if (ip < 0) return null
      var lo = 0; var hi = begs.length - 1; var ans = -1
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        if (begs(mid) <= ip) { ans = mid; lo = mid + 1 } else hi = mid - 1
      }
      if (ans >= 0 && ip <= sorted(ans)._2) sorted(ans)._3 else null
    }
  }

  /** Dotted-quad to unsigned int, -1 if not IPv4. */
  def ip4ToLong(s: String): Long = {
    var i = 0; var part = 0; var v = 0L; var acc = 0L; var digits = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '.') {
        if (digits == 0 || v > 255 || part >= 3) return -1
        acc = (acc << 8) | v; part += 1; v = 0; digits = 0
      } else if (c >= '0' && c <= '9') {
        v = v * 10 + (c - '0'); digits += 1
        if (digits > 3) return -1
      } else return -1
      i += 1
    }
    if (part != 3 || digits == 0 || v > 255) -1 else (acc << 8) | v
  }

  val empty = new Enricher(Map.empty)
}
