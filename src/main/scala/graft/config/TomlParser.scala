package graft.config

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.{ArrayNode, JsonNodeFactory, ObjectNode}

/** Minimal TOML → Jackson tree parser, covering the subset a pipeline
  * config uses (reference `config/config_loader.rs:8-44` accepts TOML as
  * a first-class format via the `config` crate; no TOML library exists
  * on this classpath, so this is a small from-scratch reader):
  *
  *   - `[table]` / `[a.b]` headers, `[[array-of-tables]]` headers;
  *   - `key = value` with dotted and quoted keys;
  *   - basic ("…", with escapes) and literal ('…') strings;
  *   - integers, floats, booleans;
  *   - arrays (incl. multi-line) and inline tables `{k = v, …}`;
  *   - `#` comments and blank lines.
  *
  * Dates, multi-line strings, and exotic escapes are outside the config
  * surface and rejected loudly rather than mis-parsed.
  */
object TomlParser {

  private val F = JsonNodeFactory.instance

  def parse(text: String): ObjectNode = {
    val root = F.objectNode()
    // Current insertion point (set by table headers).
    var current: ObjectNode = root

    val logical = logicalLines(text)
    logical.foreach { line =>
      val s = line.trim
      if (s.isEmpty) ()
      else if (s.startsWith("[[") && s.endsWith("]]")) {
        val path = keyPath(s.substring(2, s.length - 2).trim)
        val parent = descend(root, path.init)
        val arr = parent.get(path.last) match {
          case a: ArrayNode => a
          case null => val a = F.arrayNode(); parent.set[ArrayNode](path.last, a); a
          case other => fail(s"[[${path.mkString(".")}]] conflicts with $other")
        }
        val obj = F.objectNode()
        arr.add(obj)
        current = obj
      } else if (s.startsWith("[") && s.endsWith("]")) {
        val path = keyPath(s.substring(1, s.length - 1).trim)
        current = descend(root, path)
      } else {
        val eq = indexOfTopLevel(s, '=')
        if (eq < 0) fail(s"expected key = value, got: $s")
        val path = keyPath(s.substring(0, eq).trim)
        val target = descendInto(current, path.init)
        target.set[ObjectNode](path.last, value(s.substring(eq + 1).trim))
        ()
      }
    }
    root
  }

  /** Join lines so that unterminated arrays continue onto the next line. */
  private def logicalLines(text: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var pending = ""
    text.linesIterator.foreach { raw =>
      val line = stripComment(raw)
      val cand = if (pending.isEmpty) line else pending + " " + line.trim
      if (openBrackets(cand) > 0) pending = cand
      else { out += cand; pending = "" }
    }
    if (pending.trim.nonEmpty) fail(s"unterminated value: $pending")
    out.toSeq
  }

  private def stripComment(line: String): String = {
    var i = 0; var inB = false; var inL = false
    while (i < line.length) {
      val c = line.charAt(i)
      if (inB) { if (c == '\\') i += 1 else if (c == '"') inB = false }
      else if (inL) { if (c == '\'') inL = false }
      else c match {
        case '"'  => inB = true
        case '\'' => inL = true
        case '#'  => return line.substring(0, i)
        case _    => ()
      }
      i += 1
    }
    line
  }

  private def openBrackets(s: String): Int = {
    var depth = 0; var i = 0; var inB = false; var inL = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (inB) { if (c == '\\') i += 1 else if (c == '"') inB = false }
      else if (inL) { if (c == '\'') inL = false }
      else c match {
        case '"'       => inB = true
        case '\''      => inL = true
        case '[' | '{' => depth += 1
        case ']' | '}' => depth -= 1
        case _         => ()
      }
      i += 1
    }
    depth
  }

  /** First top-level (outside quotes/brackets) occurrence of `ch`. */
  private def indexOfTopLevel(s: String, ch: Char): Int = {
    var i = 0; var depth = 0; var inB = false; var inL = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (inB) { if (c == '\\') i += 1 else if (c == '"') inB = false }
      else if (inL) { if (c == '\'') inL = false }
      else if (c == '"') inB = true
      else if (c == '\'') inL = true
      else if (c == '[' || c == '{') depth += 1
      else if (c == ']' || c == '}') depth -= 1
      else if (c == ch && depth == 0) return i
      i += 1
    }
    -1
  }

  /** Dotted key path, honoring quoted segments. */
  private def keyPath(s: String): Seq[String] = {
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0; val cur = new StringBuilder; var inB = false; var inL = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (inB) { if (c == '"') inB = false else cur.append(c) }
      else if (inL) { if (c == '\'') inL = false else cur.append(c) }
      else c match {
        case '"'  => inB = true
        case '\'' => inL = true
        case '.'  => parts += cur.result().trim; cur.clear()
        case c2   => cur.append(c2)
      }
      i += 1
    }
    parts += cur.result().trim
    val path = parts.toSeq
    require(path.forall(_.nonEmpty), s"bad key '$s'")
    path
  }

  /** Walk/create object nodes along a path; a trailing array-of-tables
    * segment targets its LAST element (TOML semantics).
    */
  private def descend(node: ObjectNode, path: Seq[String]): ObjectNode =
    path.foldLeft(node) { (acc, k) =>
      acc.get(k) match {
        case o: ObjectNode => o
        case a: ArrayNode if a.size() > 0 && a.get(a.size() - 1).isObject =>
          a.get(a.size() - 1).asInstanceOf[ObjectNode]
        case null => val o = F.objectNode(); acc.set[ObjectNode](k, o); o
        case other => fail(s"key '$k' already holds $other")
      }
    }

  private def descendInto(node: ObjectNode, path: Seq[String]): ObjectNode =
    descend(node, path)

  private[config] def value(s: String): com.fasterxml.jackson.databind.JsonNode = s match {
    case "" => fail("empty value")
    case _ if s.startsWith("\"") =>
      // The closing quote must END the value — trailing tokens after it
      // (`name = "a" "b"`) are rejected, not silently dropped (Jackson
      // alone would parse the first string and ignore the rest).
      require(s.length >= 2 && closingQuoteIndex(s) == s.length - 1,
        s"malformed string value: $s")
      // Jackson understands JSON string escapes, a superset match for
      // the TOML basic-string escapes used in configs.
      new ObjectMapper().readTree(s)
    case _ if s.startsWith("'") =>
      require(s.endsWith("'") && s.length >= 2 &&
        s.indexOf('\'', 1) == s.length - 1, s"malformed literal string: $s")
      F.textNode(s.substring(1, s.length - 1))
    case "true"  => F.booleanNode(true)
    case "false" => F.booleanNode(false)
    case _ if s.startsWith("[") =>
      require(s.endsWith("]"), s"unterminated array: $s")
      val arr = F.arrayNode()
      splitTopLevel(s.substring(1, s.length - 1)).foreach(v => arr.add(value(v.trim)))
      arr
    case _ if s.startsWith("{") =>
      require(s.endsWith("}"), s"unterminated inline table: $s")
      val obj = F.objectNode()
      splitTopLevel(s.substring(1, s.length - 1)).foreach { kv =>
        val eq = indexOfTopLevel(kv, '=')
        require(eq > 0, s"bad inline table entry: $kv")
        val path = keyPath(kv.substring(0, eq).trim)
        descend(obj, path.init).set[ObjectNode](path.last, value(kv.substring(eq + 1).trim))
      }
      obj
    case _ =>
      val t = s.replace("_", "")
      t.toLongOption.map(F.numberNode)
        .orElse(t.toDoubleOption.map(F.numberNode))
        .getOrElse(fail(s"unsupported TOML value: $s"))
  }

  /** Split on top-level commas (outside quotes/brackets), dropping
    * empty trailing entries.
    */
  private def splitTopLevel(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var start = 0; var i = 0; var depth = 0; var inB = false; var inL = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (inB) { if (c == '\\') i += 1 else if (c == '"') inB = false }
      else if (inL) { if (c == '\'') inL = false }
      else if (c == '"') inB = true
      else if (c == '\'') inL = true
      else if (c == '[' || c == '{') depth += 1
      else if (c == ']' || c == '}') depth -= 1
      else if (c == ',' && depth == 0) { out += s.substring(start, i); start = i + 1 }
      i += 1
    }
    out += s.substring(start)
    out.toSeq.map(_.trim).filter(_.nonEmpty)
  }

  /** Index of the unescaped closing quote of a basic string starting
    * at 0, or -1.
    */
  private def closingQuoteIndex(s: String): Int = {
    var i = 1
    while (i < s.length) {
      s.charAt(i) match {
        case '\\' => i += 2
        case '"'  => return i
        case _    => i += 1
      }
    }
    -1
  }

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"TOML parse error: $msg")
}
