package graft.config

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
    // Explicitly-defined [table] headers: TOML errors on redefining
    // one (a copy-pasted duplicate section would otherwise silently
    // merge). Implicit creation via [a.b] does NOT define [a].
    val defined = scala.collection.mutable.Set.empty[Seq[String]]

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
        // each [[x]] element may re-define its own [x.sub] tables —
        // they belong to the NEW element, not the previous one
        defined.filterInPlace(p => !p.startsWith(path))
      } else if (s.startsWith("[") && s.endsWith("]")) {
        val path = keyPath(s.substring(1, s.length - 1).trim)
        if (!defined.add(path))
          fail(s"table [${path.mkString(".")}] is defined twice — TOML " +
            "rejects redefinition; a duplicated section would silently merge")
        current = descend(root, path)
      } else {
        val eq = indexOfTopLevel(s, '=')
        if (eq < 0) fail(s"expected key = value, got: $s")
        val path = keyPath(s.substring(0, eq).trim)
        val target = descend(current, path.init)
        // TOML rejects assigning one key twice — the LAST value would
        // otherwise silently win over the one the author meant.
        if (target.has(path.last))
          fail(s"duplicate key '${path.mkString(".")}' — the earlier " +
            "value would be silently overwritten")
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

  /** Dotted key path, honoring quoted segments. Basic-string (`"…"`)
    * segments decode escapes — without that, `"a\"b"` would terminate
    * at the escaped quote and silently yield the wrong key — and an
    * unbalanced quote at end-of-key fails instead of being ignored.
    */
  private def keyPath(s: String): Seq[String] = {
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0; val cur = new StringBuilder; var inB = false; var inL = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (inB) {
        if (c == '\\') {
          val (decoded, next) = decodeEscape(s, i)
          cur.append(decoded); i = next - 1
        } else if (c == '"') inB = false
        else cur.append(c)
      }
      else if (inL) { if (c == '\'') inL = false else cur.append(c) }
      else c match {
        case '"'  => inB = true
        case '\'' => inL = true
        case '.'  => parts += cur.result().trim; cur.clear()
        case c2   => cur.append(c2)
      }
      i += 1
    }
    if (inB || inL) fail(s"unbalanced quote in key '$s'")
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

  private[config] def value(s: String): com.fasterxml.jackson.databind.JsonNode = s match {
    case "" => fail("empty value")
    case _ if s.startsWith("\"") =>
      // The closing quote must END the value — trailing tokens after it
      // (`name = "a" "b"`) are rejected, not silently dropped.
      require(s.length >= 2 && closingQuoteIndex(s) == s.length - 1,
        s"malformed string value: $s")
      // Genuine TOML basic-string decoding (NOT delegated to a JSON
      // parser, which rejects valid TOML content: a literal tab inside
      // the string, and the core \UXXXXXXXX 8-hex-digit escape).
      F.textNode(unescapeBasic(s.substring(1, s.length - 1)))
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
        val target = descend(obj, path.init)
        if (target.has(path.last))
          fail(s"duplicate key '${path.mkString(".")}' in inline table: $s")
        target.set[ObjectNode](path.last, value(kv.substring(eq + 1).trim))
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

  /** Decode the escape sequence at `s(i) == '\\'`; returns the decoded
    * text and the index just past the sequence. The TOML basic-string
    * escape set: \b \t \n \f \r \" \\ \u (4 hex) \U (8 hex); anything
    * else fails loudly.
    */
  private def decodeEscape(s: String, i: Int): (String, Int) = {
    if (i + 1 >= s.length) fail(s"dangling escape in: $s")
    s.charAt(i + 1) match {
      case 'b'  => ("\b", i + 2)
      case 't'  => ("\t", i + 2)
      case 'n'  => ("\n", i + 2)
      case 'f'  => ("\f", i + 2)
      case 'r'  => ("\r", i + 2)
      case '"'  => ("\"", i + 2)
      case '\\' => ("\\", i + 2)
      case 'u' =>
        if (i + 6 > s.length) fail(s"truncated \\u escape in: $s")
        (String.valueOf(Character.toChars(
          Integer.parseInt(s.substring(i + 2, i + 6), 16))), i + 6)
      case 'U' =>
        if (i + 10 > s.length) fail(s"truncated \\U escape in: $s")
        (String.valueOf(Character.toChars(
          Integer.parseInt(s.substring(i + 2, i + 10), 16))), i + 10)
      case other => fail(s"unsupported escape \\$other in: $s")
    }
  }

  /** TOML basic-string body → decoded text. */
  private[config] def unescapeBasic(body: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < body.length) {
      val c = body.charAt(i)
      if (c == '\\') {
        val (decoded, next) = decodeEscape(body, i)
        sb.append(decoded); i = next
      } else { sb.append(c); i += 1 }
    }
    sb.result()
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
