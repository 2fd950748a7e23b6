package graft.oml

import graft.wpl._

/** Privacy/masking section execution (reference grammar §隐私段 — the
  * engine ships the DSL but runtime masking is opt-in; same here:
  * `OmlEval` output can be passed through `apply` when enabled). */
object Privacy {

  def mask(kind: String, v: WValue): WValue = kind match {
    case "privacy_ip" | "privacy_specify_ip" =>
      val s = v.sval
      val i = s.lastIndexOf('.')
      WChars(if (i > 0) s.substring(0, i) + ".0" else "0.0.0.0")
    case "privacy_mobile" =>
      val s = v.sval
      WChars(if (s.length == 11) s.substring(0, 3) + "****" + s.substring(7) else "***")
    case "privacy_id_card" =>
      val s = v.sval
      WChars(if (s.length == 18) s.substring(0, 6) + "********" + s.substring(14) else "***")
    case "privacy_mail" =>
      val s = v.sval
      val at = s.indexOf('@')
      WChars(if (at > 0) s"${s.charAt(0)}***${s.substring(at)}" else "***")
    case "privacy_domain" | "privacy_specify_domain" =>
      val parts = v.sval.split('.')
      WChars(if (parts.length >= 2) "***." + parts.takeRight(1).mkString else "***")
    case "privacy_specify_name" | "privacy_specify_address" |
         "privacy_specify_company" => WChars("***")
    case "privacy_keymsg" =>
      WChars(f"${TextAnalysis2.fnv(v.sval)}%016x") // irreversible fingerprint
    case _ => v
  }

  /** Apply a model's privacy declarations to an output record. */
  def apply(fields: Vector[WField], privacy: Vector[(String, String)]): Vector[WField] = {
    if (privacy.isEmpty) return fields
    val m = privacy.toMap
    fields.map { f =>
      m.get(f.name) match {
        case Some(kind) => WField(f.name, mask(kind, f.value))
        case None => f
      }
    }
  }
}

private object TextAnalysis2 {
  def fnv(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) { h ^= s.charAt(i).toLong; h *= 0x100000001b3L; i += 1 }
    h
  }
}
