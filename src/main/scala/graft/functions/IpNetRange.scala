package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** CIDR → (start, end) u32 range (SURVEY.md §1.2: `IpNet` keeps the
  * string plus derived range longs so ip_geo-style lookups can use
  * range joins / binary search instead of per-record CIDR math). */
object IpNetRange {

  /** "10.1.0.0/16" → (167837696, 167903231); null for invalid input. */
  def range(cidr: String): Option[(Long, Long)] = {
    if (cidr == null) return None
    val slash = cidr.indexOf('/')
    if (slash <= 0) return None
    val ip = Ip4ToInt.parse(cidr.substring(0, slash))
    if (ip < 0) return None
    val prefix = try cidr.substring(slash + 1).toInt catch {
      case _: NumberFormatException => return None
    }
    if (prefix < 0 || prefix > 32) return None
    val mask = if (prefix == 0) 0L else (0xFFFFFFFFL << (32 - prefix)) & 0xFFFFFFFFL
    val start = ip & mask
    Some((start, start | (~mask & 0xFFFFFFFFL)))
  }

  private val startUdf = udf((c: String) => range(c).map(_._1))
  private val endUdf = udf((c: String) => range(c).map(_._2))

  def ipnet_start(c: Column): Column = startUdf(c)
  def ipnet_end(c: Column): Column = endUdf(c)

  /** Membership test without a join: ip ∈ cidr. */
  def contains(cidr: String, ipInt: Long): Boolean =
    range(cidr).exists { case (s, e) => ipInt >= s && ipInt <= e }
}
