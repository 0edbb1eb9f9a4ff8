package graft.spatial

import scala.collection.mutable.{ArrayBuffer, LinkedHashMap}

/**
 * Minimal recursive-descent JSON parser (objects, arrays, strings, numbers,
 * booleans, null) — enough to read GeoParquet `geo` footer documents
 * robustly, including nested `crs` objects and `bbox` arrays that a regex
 * scrape cannot handle. No external dependency (zero-egress build).
 */
object MiniJson {

  sealed trait Value
  case class JObj(fields: LinkedHashMap[String, Value]) extends Value {
    def get(key: String): Option[Value] = fields.get(key)
  }
  case class JArr(items: Vector[Value]) extends Value
  case class JStr(s: String) extends Value
  case class JNum(d: Double) extends Value
  case class JBool(b: Boolean) extends Value
  case object JNull extends Value

  def parse(s: String): Option[Value] =
    try {
      val p = new Parser(s)
      val v = p.value()
      p.ws()
      if (p.pos == s.length) Some(v) else None
    } catch { case _: Exception => None }

  /** Compact deterministic serializer: insertion-ordered object fields
    * (JObj is a LinkedHashMap), integral doubles rendered without ".0"
    * (PROJJSON `"code": 4326` survives a parse→render cycle), standard
    * string escaping. render∘parse is idempotent, which is what the CRS
    * passthrough needs: the first read normalizes the `crs` member once
    * and every later round trip is byte-identical. */
  def render(v: Value): String = {
    val sb = new StringBuilder
    def str(s: String): Unit = {
      sb.append('"')
      s.foreach {
        case '"' => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
        case c => sb.append(c)
      }
      sb.append('"')
    }
    def go(v: Value): Unit = v match {
      case JObj(fields) =>
        sb.append('{')
        var first = true
        fields.foreach { case (k, fv) =>
          if (!first) sb.append(',')
          first = false
          str(k); sb.append(':'); go(fv)
        }
        sb.append('}')
      case JArr(items) =>
        sb.append('[')
        var first = true
        items.foreach { it =>
          if (!first) sb.append(',')
          first = false
          go(it)
        }
        sb.append(']')
      case JStr(s) => str(s)
      case JNum(d) =>
        if (d == math.rint(d) && math.abs(d) < 1e15 && !d.isInfinite)
          sb.append(d.toLong.toString)
        else sb.append(d.toString)
      case JBool(b) => sb.append(b.toString)
      case JNull => sb.append("null")
    }
    go(v)
    sb.toString
  }

  /** Recursion bound: adversarially nested input (100k `[`s) would
    * otherwise StackOverflowError — an Error, so it sails past the
    * `catch Exception` guards and kills the executor task. Real GeoJSON
    * and `geo` footers nest a handful of levels. */
  private val MaxDepth = 512

  private final class Parser(s: String) {
    var pos = 0
    private var depth = 0

    def ws(): Unit = while (pos < s.length && s.charAt(pos).isWhitespace) pos += 1

    private def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"$msg at $pos")

    private def expect(c: Char): Unit = {
      ws()
      if (pos >= s.length || s.charAt(pos) != c) fail(s"expected '$c'")
      pos += 1
    }

    def value(): Value = {
      ws()
      if (pos >= s.length) fail("eof")
      depth += 1
      if (depth > MaxDepth) fail("nesting too deep")
      val v = s.charAt(pos) match {
        case '{' => obj()
        case '[' => arr()
        case '"' => JStr(str())
        case 't' => lit("true", JBool(true))
        case 'f' => lit("false", JBool(false))
        case 'n' => lit("null", JNull)
        case _ => num()
      }
      depth -= 1
      v
    }

    private def lit(text: String, v: Value): Value = {
      if (!s.startsWith(text, pos)) fail(s"expected $text")
      pos += text.length
      v
    }

    private def obj(): JObj = {
      expect('{')
      val m = LinkedHashMap.empty[String, Value]
      ws()
      if (pos < s.length && s.charAt(pos) == '}') { pos += 1; return JObj(m) }
      var done = false
      while (!done) {
        ws()
        val k = str()
        expect(':')
        m(k) = value()
        ws()
        if (pos < s.length && s.charAt(pos) == ',') pos += 1
        else { expect('}'); done = true }
      }
      JObj(m)
    }

    private def arr(): JArr = {
      expect('[')
      val out = new ArrayBuffer[Value]
      ws()
      if (pos < s.length && s.charAt(pos) == ']') { pos += 1; return JArr(out.toVector) }
      var done = false
      while (!done) {
        out += value()
        ws()
        if (pos < s.length && s.charAt(pos) == ',') pos += 1
        else { expect(']'); done = true }
      }
      JArr(out.toVector)
    }

    private def str(): String = {
      expect('"')
      val sb = new java.lang.StringBuilder
      while (pos < s.length && s.charAt(pos) != '"') {
        val c = s.charAt(pos)
        if (c == '\\') {
          pos += 1
          if (pos >= s.length) fail("bad escape")
          s.charAt(pos) match {
            case '"' => sb.append('"')
            case '\\' => sb.append('\\')
            case '/' => sb.append('/')
            case 'b' => sb.append('\b')
            case 'f' => sb.append('\f')
            case 'n' => sb.append('\n')
            case 'r' => sb.append('\r')
            case 't' => sb.append('\t')
            case 'u' =>
              if (pos + 4 >= s.length) fail("bad unicode escape")
              sb.append(Integer.parseInt(s.substring(pos + 1, pos + 5), 16).toChar)
              pos += 4
            case other => fail(s"bad escape \\$other")
          }
        } else sb.append(c)
        pos += 1
      }
      expect('"')
      sb.toString
    }

    private def num(): JNum = {
      val start = pos
      while (pos < s.length && { val c = s.charAt(pos)
        c.isDigit || c == '-' || c == '+' || c == '.' || c == 'e' || c == 'E' }) pos += 1
      if (pos == start) fail("expected number")
      JNum(java.lang.Double.parseDouble(s.substring(start, pos)))
    }
  }
}
