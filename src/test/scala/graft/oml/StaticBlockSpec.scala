package graft.oml

import org.scalatest.funsuite.AnyFunSuite
import graft.wpl._

/** Golden test: the VERBATIM new-DSL example from the reference design
  * doc docs/dar/oml_static_blocks.md:34-86 (apache_e1 template-array
  * dispatch) — static object templates, match with predicate arms
  * resolving to static symbols, and `| get()` projection off the
  * matched template. */
class StaticBlockSpec extends AnyFunSuite {

  private val apacheE1 =
    """name : /oml/apache_error_e1
      rule : apache/error/e1_jk2_found_child
      ---
      static {
          e1_template = object {
              id = "E1";
              tpl = "jk2_init() Found child <*> in scoreboard slot <*>"
          };
          e2_template = object {
              id = "E2";
              tpl = "workerEnv.init() ok <*>"
          };
          e3_template = object {
              id = "E3";
              tpl = "mod_jk child workerEnv in error state <*>"
          };
          e4_template = object {
              id = "E4";
              tpl = "[client <*>] Directory index forbidden by rule: <*>"
          };
          e5_template = object {
              id = "E5";
              tpl = "jk2_init() Can't find child <*> in scoreboard"
          };
          e6_template = object {
              id = "E6";
              tpl = "mod_jk child init <*> <*>"
          };
      }

      Time = read(Time);
      Level = read(Level);
      Content = read(Content);

      target_template = match read(Content) {
          starts_with("jk2_init() Found child") => e1_template;
          starts_with("workerEnv.init() ok") => e2_template;
          starts_with("mod_jk child workerEnv in error state") => e3_template;
          contains("Directory index forbidden by rule:") => e4_template;
          starts_with("jk2_init() Can't find child") => e5_template;
          starts_with("mod_jk child init") => e6_template;
      };

      EventId = target_template | get(id);
      EventTemplate = target_template | get(tpl);
    """

  private def run(content: String): Map[String, WValue] = {
    val model = OmlText.parse(apacheE1)
    val out = new OmlEval(model).transform(Vector(
      WField("Time", WChars("Sun Dec 04 04:47:44 2005")),
      WField("Level", WChars("error")),
      WField("Content", WChars(content)))).get
    out.map(f => f.name -> f.value).toMap
  }

  test("template dispatch: each loghub event id resolves from its static template") {
    val cases = Seq(
      "jk2_init() Found child 6725 in scoreboard slot 10" -> "E1",
      "workerEnv.init() ok /etc/httpd/conf/workers2.properties" -> "E2",
      "mod_jk child workerEnv in error state 6" -> "E3",
      "[client 61.138.216.82] Directory index forbidden by rule: /var/www/html/" -> "E4",
      "jk2_init() Can't find child 6725 in scoreboard" -> "E5",
      "mod_jk child init 1 -2" -> "E6")
    for ((content, id) <- cases) {
      val m = run(content)
      assert(m("EventId") == WChars(id), content)
      assert(m("Content") == WChars(content))
    }
    // the matched template text projects out of the static object
    val m = run("workerEnv.init() ok /etc/x")
    assert(m("EventTemplate") == WChars("workerEnv.init() ok <*>"))
  }

  test("static symbols are readable per record without read()") {
    val m = run("jk2_init() Found child 1 in scoreboard slot 2")
    assert(m("target_template").isInstanceOf[WObj])
    assert(m("EventId") == WChars("E1"))
  }
}
