package graft.config

import org.scalatest.funsuite.AnyFunSuite

/** Edge cases of the vendored TOML reader (beyond the ConfigSpec
  * YAML↔TOML round-trip): quoting, comments, multi-line arrays, dotted
  * and quoted keys, arrays of tables, loud rejection of unsupported
  * syntax.
  */
class TomlParserSpec extends AnyFunSuite {

  private def parse(s: String) = TomlParser.parse(s)

  test("scalars: strings (basic + literal + escapes), ints, floats, bools") {
    val n = parse(
      """a = "x \"quoted\" y"
        |b = 'literal \n kept'
        |c = 42
        |d = -3.5
        |e = true
        |f = 1_000_000
        |""".stripMargin)
    assert(n.get("a").asText == "x \"quoted\" y")
    assert(n.get("b").asText == "literal \\n kept") // literal strings keep backslashes
    assert(n.get("c").asLong == 42L)
    assert(n.get("d").asDouble == -3.5)
    assert(n.get("e").asBoolean)
    assert(n.get("f").asLong == 1000000L)
  }

  test("comments stripped outside strings, kept inside") {
    val n = parse(
      """a = "has # inside" # trailing comment
        |# full-line comment
        |b = 1
        |""".stripMargin)
    assert(n.get("a").asText == "has # inside")
    assert(n.get("b").asInt == 1)
  }

  test("tables, dotted keys, quoted key segments") {
    val n = parse(
      """[outer.inner]
        |x = 1
        |"dotted.key" = 2
        |[other]
        |y.z = 3
        |""".stripMargin)
    assert(n.at("/outer/inner/x").asInt == 1)
    assert(n.at("/outer/inner/dotted.key").asInt == 2)
    assert(n.at("/other/y/z").asInt == 3)
  }

  test("arrays: inline, nested, multi-line") {
    val n = parse(
      """a = [1, 2, 3]
        |b = [[1, 2], ["x", "y"]]
        |c = [
        |  "one",
        |  "two",
        |]
        |""".stripMargin)
    assert(n.get("a").size == 3 && n.get("a").get(2).asInt == 3)
    assert(n.get("b").get(1).get(0).asText == "x")
    assert(n.get("c").size == 2 && n.get("c").get(1).asText == "two")
  }

  test("arrays of tables with nested array-of-table children") {
    val n = parse(
      """[[src]]
        |name = "a"
        |[[src.cols]]
        |id = 1
        |[[src.cols]]
        |id = 2
        |[[src]]
        |name = "b"
        |[[src.cols]]
        |id = 9
        |""".stripMargin)
    assert(n.get("src").size == 2)
    assert(n.at("/src/0/cols/1/id").asInt == 2)
    assert(n.at("/src/1/cols/0/id").asInt == 9) // children attach to the LAST table
  }

  test("inline tables, including nested keys") {
    val n = parse("""m = { a = 1, b = "x", c.d = true }""")
    assert(n.at("/m/a").asInt == 1)
    assert(n.at("/m/b").asText == "x")
    assert(n.at("/m/c/d").asBoolean)
  }

  test("duplicate keys and redefined tables fail loudly (TOML semantics, not last-wins)") {
    // a copy-pasted duplicate assignment must not silently drop the
    // value the author meant
    intercept[IllegalArgumentException](parse("a = 1\na = 2"))
    intercept[IllegalArgumentException](parse("[t]\nx = 1\nx = 2"))
    intercept[IllegalArgumentException](parse("[t]\na = 1\n[t]\nb = 2"))
    intercept[IllegalArgumentException](parse("""m = { a = 1, a = 2 }"""))
    // but each [[x]] element may define its own [x.sub] table
    val n = parse(
      """[[f]]
        |[f.p]
        |c = "red"
        |[[f]]
        |[f.p]
        |c = "blue"
        |""".stripMargin)
    assert(n.at("/f/0/p/c").asText == "red" && n.at("/f/1/p/c").asText == "blue")
    // and a super-table implicitly created by [a.b] may be defined later
    val m = parse("[a.b]\nx = 1\n[a]\ny = 2")
    assert(m.at("/a/b/x").asInt == 1 && m.at("/a/y").asInt == 2)
  }

  test("basic strings: literal tab, \\u and \\U escapes, escaped-quote keys") {
    // a literal tab is VALID inside a TOML basic string (a JSON parser
    // rejects it); \UXXXXXXXX is core TOML
    val n = parse("a = \"col\tA\"\nb = \"\\u0041\\U0001F600\"")
    assert(n.get("a").asText == "col\tA")
    assert(n.get("b").asText == "A" + new String(Character.toChars(0x1F600)))
    // an escaped quote inside a quoted key is part of the KEY
    val k = parse("\"a\\\"b\" = 1")
    assert(k.get("a\"b").asInt == 1)
    // unbalanced quote in a key fails instead of being ignored
    intercept[IllegalArgumentException](parse("\"a = 1"))
    // unknown escapes fail, not pass through
    intercept[IllegalArgumentException](parse("""a = "\q""""))
  }

  test("unsupported syntax fails loudly, never mis-parses") {
    intercept[IllegalArgumentException](parse("a = 1979-05-27")) // dates unsupported
    intercept[IllegalArgumentException](parse("just a line"))
    intercept[IllegalArgumentException](parse("a = [1, 2")) // unterminated
    // trailing tokens after a closed string are rejected, not dropped
    intercept[IllegalArgumentException](parse("""a = "x" "y""""))
    intercept[IllegalArgumentException](parse("""a = 'x' trailing"""))
  }
}
