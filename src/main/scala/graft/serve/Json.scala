package graft.serve

import scala.collection.immutable.ListMap

/** Minimal JSON value model + parser + writer for the serving layer.
  *
  * Hand-rolled on purpose: the server's payloads are route metadata and
  * result rows (never the data plane — row sets cross as DataFrames /
  * parquet), so a dependency-free codec with deterministic field order
  * (insertion-ordered objects) keeps responses stable for golden specs.
  * Number formatting follows JSON: integral doubles print without the
  * trailing `.0` only when they round-trip as Long (mirrors how the
  * reference's FastAPI/pydantic serializes ints vs floats).
  */
sealed trait JVal {
  def render: String = Json.write(this)
}
case object JNull extends JVal
final case class JBool(v: Boolean) extends JVal
final case class JNum(v: Double) extends JVal
final case class JStr(v: String) extends JVal
final case class JArr(items: Seq[JVal]) extends JVal
final case class JObj(fields: ListMap[String, JVal]) extends JVal {
  def apply(key: String): JVal = fields.getOrElse(key, JNull)
  def str(key: String): Option[String] = fields.get(key).collect { case JStr(s) => s }
  def num(key: String): Option[Double] = fields.get(key).collect { case JNum(n) => n }
  def int(key: String): Option[Int] = num(key).map(_.toInt)
  def arr(key: String): Option[Seq[JVal]] = fields.get(key).collect { case JArr(a) => a }
}

object JObj {
  def apply(fields: (String, JVal)*): JObj = JObj(ListMap(fields: _*))
}

object Json {

  def write(v: JVal): String = { val sb = new StringBuilder; put(sb, v); sb.toString }

  private def put(sb: StringBuilder, v: JVal): Unit = v match {
    case JNull    => sb.append("null")
    case JBool(b) => sb.append(if (b) "true" else "false")
    case JNum(n) =>
      if (n.isNaN || n.isInfinite) sb.append("null")
      else if (n == n.toLong && math.abs(n) < 1e15) sb.append(n.toLong.toString)
      else sb.append(n.toString)
    case JStr(s) => putString(sb, s)
    case JArr(items) =>
      sb.append('[')
      var first = true
      items.foreach { it => if (!first) sb.append(','); first = false; put(sb, it) }
      sb.append(']')
    case JObj(fields) =>
      sb.append('{')
      var first = true
      fields.foreach { case (k, fv) =>
        if (!first) sb.append(','); first = false
        putString(sb, k); sb.append(':'); put(sb, fv)
      }
      sb.append('}')
  }

  private def putString(sb: StringBuilder, s: String): Unit = {
    sb.append('"')
    s.foreach {
      case '"'  => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < 0x20 => sb.append(f"\\u${c.toInt}%04x")
      case c    => sb.append(c)
    }
    sb.append('"')
  }

  /** Parse one JSON document; throws IllegalArgumentException on junk. */
  def parse(text: String): JVal = {
    val p = new Parser(text)
    val v = p.value()
    p.skipWs()
    require(p.eof, s"trailing characters at ${p.pos}")
    v
  }

  private final class Parser(s: String) {
    var pos = 0
    def eof: Boolean = pos >= s.length
    def skipWs(): Unit =
      while (!eof && Character.isWhitespace(s.charAt(pos))) pos += 1
    private def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"JSON parse error at $pos: $msg")
    private def expect(c: Char): Unit = {
      if (eof || s.charAt(pos) != c) fail(s"expected '$c'")
      pos += 1
    }

    def value(): JVal = {
      skipWs()
      if (eof) fail("unexpected end")
      s.charAt(pos) match {
        case '{' => obj()
        case '[' => arr()
        case '"' => JStr(string())
        case 't' => lit("true"); JBool(true)
        case 'f' => lit("false"); JBool(false)
        case 'n' => lit("null"); JNull
        case _   => number()
      }
    }

    private def lit(word: String): Unit = {
      if (!s.regionMatches(pos, word, 0, word.length)) fail(s"expected $word")
      pos += word.length
    }

    private def obj(): JObj = {
      expect('{'); skipWs()
      var fields = ListMap.empty[String, JVal]
      if (!eof && s.charAt(pos) == '}') { pos += 1; return JObj(fields) }
      var done = false
      while (!done) {
        skipWs()
        val k = string()
        skipWs(); expect(':')
        fields = fields.updated(k, value())
        skipWs()
        if (eof) fail("unterminated object")
        s.charAt(pos) match {
          case ',' => pos += 1
          case '}' => pos += 1; done = true
          case c   => fail(s"unexpected '$c' in object")
        }
      }
      JObj(fields)
    }

    private def arr(): JArr = {
      expect('['); skipWs()
      val items = Seq.newBuilder[JVal]
      if (!eof && s.charAt(pos) == ']') { pos += 1; return JArr(items.result()) }
      var done = false
      while (!done) {
        items += value()
        skipWs()
        if (eof) fail("unterminated array")
        s.charAt(pos) match {
          case ',' => pos += 1
          case ']' => pos += 1; done = true
          case c   => fail(s"unexpected '$c' in array")
        }
      }
      JArr(items.result())
    }

    private def string(): String = {
      expect('"')
      val sb = new StringBuilder
      while (true) {
        if (eof) fail("unterminated string")
        val c = s.charAt(pos); pos += 1
        c match {
          case '"'  => return sb.toString
          case '\\' =>
            if (eof) fail("bad escape")
            val e = s.charAt(pos); pos += 1
            e match {
              case '"'  => sb.append('"')
              case '\\' => sb.append('\\')
              case '/'  => sb.append('/')
              case 'b'  => sb.append('\b')
              case 'f'  => sb.append('\f')
              case 'n'  => sb.append('\n')
              case 'r'  => sb.append('\r')
              case 't'  => sb.append('\t')
              case 'u'  =>
                if (pos + 4 > s.length) fail("bad \\u escape")
                sb.append(Integer.parseInt(s.substring(pos, pos + 4), 16).toChar)
                pos += 4
              case other => fail(s"bad escape \\$other")
            }
          case ch => sb.append(ch)
        }
      }
      throw new IllegalStateException("unreachable")
    }

    private def number(): JNum = {
      val start = pos
      if (!eof && (s.charAt(pos) == '-' || s.charAt(pos) == '+')) pos += 1
      while (!eof && "0123456789.eE+-".indexOf(s.charAt(pos)) >= 0) pos += 1
      if (pos == start) fail("expected value")
      try JNum(s.substring(start, pos).toDouble)
      catch { case _: NumberFormatException => fail("bad number") }
    }
  }
}
