package graft.wpl

import org.scalatest.funsuite.AnyFunSuite

/** Separator-pattern examples from the reference spec
  * (docs/usage/en/03-wpl/08-sep-pattern.md + grammar §Separators). */
class SepPatternSpec extends AnyFunSuite {

  private def fields(o: ParseOutcome): Vector[WField] = o match {
    case PSuccess(_, fs) => fs
    case PPartial(_, fs, _) => fs
    case o2 => fail(o2.toString)
  }

  test("chars{*=}: match to first equals sign") {
    val p = Sep.compilePattern("*=")
    // find = (tokenEnd, resume): token is what * swallowed, = consumed
    assert(p.find("key=value", 0) == Sep.pack(3, 4))
  }

  test("chars{\\s=}: whitespace then equals") {
    val p = Sep.compilePattern("\\s=")
    // separator occurrence = "  =" starting at index 3
    assert(p.find("abc  =def", 0) == Sep.pack(3, 6))
  }

  test("{*(key=)}: match to 'key=' and preserve it for the next field") {
    val p = Sep.compilePattern("*(key=)")
    // token ends where 'key=' starts; nothing consumed past it
    assert(p.find("prefix key=v", 0) == Sep.pack(7, 7))
    val mp = Runtime.compile("package /s { rule r { (chars:a{*(key=)},kv) } }")
    val fs = fields(mp.parseLine("prefix key=v"))
    assert(fs == Vector(WField("a", WChars("prefix ")), WField("key", WChars("v"))))
  }

  test("{field?:\\s}: literal + any char + colon + whitespace") {
    val p = Sep.compilePattern("field?:\\s")
    assert(p.find("xx fieldA: yy", 0) == Sep.pack(3, 11))
  }

  test("\\s(\\S=) kvarr scan: whitespace sep preserving next key lookahead") {
    val p = Sep.compilePattern("\\s(\\S=)")
    // matches the space only when a token= follows (kvarr pair boundary)
    assert(p.find("a=1 b=2", 0) == Sep.pack(3, 4))
    // no match when what follows isn't key=
    assert(p.find("a=1 end", 0) == Sep.NotFound)
  }

  test("macros: \\h horizontal-only, \\H non-horizontal") {
    val h = Sep.compilePattern("\\h")
    assert(h.consumeAt("a \tb", 1) == 3)
    assert(h.consumeAt("a\nb", 1) == -1) // \n is not horizontal ws
  }

  test("escaped literals: \\* matches a literal star") {
    val p = Sep.compilePattern("\\*\\*")
    assert(p.find("a**b", 0) == Sep.pack(1, 3))
  }

  test("sep pattern as field separator end-to-end") {
    val mp = Runtime.compile("""package /s { rule r { (digit:a{\s->\s},digit:b) } }""")
    assert(fields(mp.parseLine("12 -> 34")) ==
      Vector(WField("a", WDigit(12)), WField("b", WDigit(34))))
  }
}
