package graft.ingest

import java.nio.charset.StandardCharsets
import java.util.zip.Inflater

import scala.collection.mutable

/** Minimal pure-JVM PDF text extraction — no dependencies, built from
  * the public PDF 32000-1:2008 format spec. Closes SURVEY §2 S4: the
  * reference parses PDFs per page with Docling
  * (`/root/reference/backend/process/parsing.py:98-133`); this extractor
  * produces one text per page from the raw bytes so [[Ingest.explodePages]]
  * can run on real PDFs, not only text stand-ins.
  *
  * Scope (deliberate): text content only — `Tj`/`TJ`/`'`/`"` operators
  * inside `BT..ET`, decoded per-font via ToUnicode CMaps, WinAnsi or
  * encoding /Differences; Form XObjects are recursed so header/body text
  * drawn indirectly is not lost. Structure recovered: classic xref
  * tables, xref STREAMS (PDF 1.5 `/W`+`/Index`), hybrid files
  * (`/XRefStm`), object streams (`/ObjStm`), FlateDecode with PNG
  * predictors. Type0 fonts WITHOUT a ToUnicode map decode through the
  * embedded TrueType program's own `cmap` (CID→GID→Unicode inversion)
  * or, failing that, an Identity-CID heuristic gated to printable
  * blocks — so CJK documents keep their body text. NOT in scope
  * (documented, like the reference's OCR leg): raster/OCR text and
  * full table-structure reconstruction; codes no fallback resolves are
  * dropped rather than emitted as garbage.
  *
  * Everything here is driver-free and allocation-local: one [[Pdf.Doc]]
  * per file inside a `mapPartitions` iterator — the same executor-side
  * amortization contract as every other [[PageExtractor]].
  */
private[ingest] object Pdf {

  // ---------------------------------------------------------------- model

  sealed trait Obj
  final case class PNum(v: Double) extends Obj { def toInt: Int = v.toInt }
  final case class PBool(b: Boolean) extends Obj
  final case class PStr(bytes: Array[Byte]) extends Obj
  final case class PName(s: String) extends Obj
  final case class PArr(items: Vector[Obj]) extends Obj
  final case class PDict(m: Map[String, Obj]) extends Obj {
    def get(k: String): Option[Obj] = m.get(k)
  }
  final case class PRef(num: Int, gen: Int) extends Obj
  final case class PStream(dict: PDict, raw: Array[Byte]) extends Obj
  case object PNull extends Obj

  sealed trait Tok
  final case class TObj(o: Obj) extends Tok
  final case class TOp(op: String) extends Tok

  // ---------------------------------------------------------------- lexer

  /** Byte-level tokenizer for both object syntax and content streams. */
  final class Lex(val buf: Array[Byte], var pos: Int = 0,
      val allowRefs: Boolean = true) {

    private def isWs(c: Int) =
      c == ' ' || c == '\n' || c == '\r' || c == '\t' || c == '\f' || c == 0
    private def isDelim(c: Int) =
      c == '(' || c == ')' || c == '<' || c == '>' || c == '[' || c == ']' ||
        c == '{' || c == '}' || c == '/' || c == '%'

    def eof: Boolean = pos >= buf.length
    def peek: Int = if (eof) -1 else buf(pos) & 0xff

    def skipWs(): Unit = {
      while (!eof) {
        val c = peek
        if (isWs(c)) pos += 1
        else if (c == '%') { // comment to EOL
          while (!eof && peek != '\n' && peek != '\r') pos += 1
        } else return
      }
    }

    def startsWith(s: String): Boolean = {
      if (pos + s.length > buf.length) return false
      var i = 0
      while (i < s.length) {
        if (buf(pos + i) != s.charAt(i)) return false
        i += 1
      }
      true
    }

    /** Bare keyword: run of non-ws non-delimiter bytes. */
    def readKeyword(): String = {
      val start = pos
      while (!eof && !isWs(peek) && !isDelim(peek)) pos += 1
      new String(buf, start, pos - start, StandardCharsets.ISO_8859_1)
    }

    private def readName(): PName = {
      pos += 1 // '/'
      val sb = new StringBuilder
      while (!eof && !isWs(peek) && !isDelim(peek)) {
        val c = peek
        if (c == '#' && pos + 2 < buf.length) {
          val h = Integer.parseInt(
            new String(buf, pos + 1, 2, StandardCharsets.ISO_8859_1), 16)
          sb.append(h.toChar); pos += 3
        } else { sb.append(c.toChar); pos += 1 }
      }
      PName(sb.toString)
    }

    private def readLiteralString(): PStr = {
      pos += 1 // '('
      val out = new java.io.ByteArrayOutputStream()
      var depth = 1
      while (!eof && depth > 0) {
        val c = peek; pos += 1
        c match {
          case '(' => depth += 1; out.write(c)
          case ')' => depth -= 1; if (depth > 0) out.write(c)
          case '\\' if !eof =>
            val e = peek; pos += 1
            e match {
              case 'n' => out.write('\n')
              case 'r' => out.write('\r')
              case 't' => out.write('\t')
              case 'b' => out.write('\b')
              case 'f' => out.write('\f')
              case '(' => out.write('(')
              case ')' => out.write(')')
              case '\\' => out.write('\\')
              case '\r' => if (peek == '\n') pos += 1 // line continuation
              case '\n' => // line continuation
              case d if d >= '0' && d <= '7' => // octal, up to 3 digits
                var v = d - '0'
                var n = 1
                while (n < 3 && peek >= '0' && peek <= '7') {
                  v = v * 8 + (peek - '0'); pos += 1; n += 1
                }
                out.write(v & 0xff)
              case other => out.write(other)
            }
          case _ => out.write(c)
        }
      }
      PStr(out.toByteArray)
    }

    private def readHexString(): PStr = {
      pos += 1 // '<'
      val out = new java.io.ByteArrayOutputStream()
      var hi = -1
      while (!eof && peek != '>') {
        val c = peek; pos += 1
        val d = Character.digit(c, 16)
        if (d >= 0) {
          if (hi < 0) hi = d
          else { out.write((hi << 4) | d); hi = -1 }
        }
      }
      if (hi >= 0) out.write(hi << 4) // odd digit: trailing 0
      if (!eof) pos += 1 // '>'
      PStr(out.toByteArray)
    }

    private def readNumber(): PNum = {
      val start = pos
      if (peek == '+' || peek == '-') pos += 1
      while (!eof && ((peek >= '0' && peek <= '9') || peek == '.')) pos += 1
      val s = new String(buf, start, pos - start, StandardCharsets.ISO_8859_1)
      PNum(if (s.isEmpty || s == "-" || s == "+") 0.0 else s.toDouble)
    }

    /** Container-nesting depth guard: a file of 100k `[` bytes would
      * otherwise recurse parseObject to StackOverflowError (an Error —
      * it escapes the Exception-based fail-soft guards). 256 is far
      * beyond any legitimate document; past it the parse aborts with a
      * plain Exception the extractors already catch per page/file. */
    private var nest = 0
    private def enterNest(): Unit = {
      nest += 1
      if (nest > 256) throw new IllegalStateException(
        s"container nesting deeper than 256 at byte $pos")
    }

    /** Parse one object. With `allowRefs`, `N G R` collapses to [[PRef]]. */
    def parseObject(): Obj = {
      skipWs()
      if (eof) return PNull
      peek match {
        case '<' =>
          if (startsWith("<<")) {
            enterNest()
            pos += 2
            val m = Map.newBuilder[String, Obj]
            var done = false
            while (!done) {
              skipWs()
              if (eof || startsWith(">>")) { pos = math.min(pos + 2, buf.length); done = true }
              else if (peek == '/') {
                val k = readName().s
                m += k -> parseObject()
              } else { parseObject(); () } // tolerate junk key
            }
            nest -= 1
            PDict(m.result())
          } else readHexString()
        case '(' => readLiteralString()
        case '/' => readName()
        case '[' =>
          enterNest()
          pos += 1
          val items = Vector.newBuilder[Obj]
          var done = false
          while (!done) {
            skipWs()
            if (eof || peek == ']') { if (!eof) pos += 1; done = true }
            else items += parseObject()
          }
          nest -= 1
          PArr(items.result())
        case c if (c >= '0' && c <= '9') || c == '+' || c == '-' || c == '.' =>
          val n = readNumber()
          if (allowRefs && n.v >= 0 && n.v == math.floor(n.v)) {
            val save = pos
            skipWs()
            if (!eof && peek >= '0' && peek <= '9') {
              val g = readNumber()
              skipWs()
              if (!eof && peek == 'R' &&
                  (pos + 1 >= buf.length || isWs(buf(pos + 1) & 0xff) ||
                    isDelim(buf(pos + 1) & 0xff))) {
                pos += 1
                return PRef(n.toInt, g.toInt)
              }
            }
            pos = save
          }
          n
        case _ =>
          readKeyword() match {
            case "true"  => PBool(true)
            case "false" => PBool(false)
            case "null"  => PNull
            case ""      => pos += 1; PNull // unknown delimiter: skip a byte
            case _       => PNull
          }
      }
    }

    /** Content-stream / CMap token: object or bare operator. */
    def nextToken(): Option[Tok] = {
      skipWs()
      if (eof) return None
      val c = peek
      if (c == '<' || c == '(' || c == '/' || c == '[' ||
          (c >= '0' && c <= '9') || c == '+' || c == '-' || c == '.')
        Some(TObj(parseObject()))
      else if (c == ']' || c == '>' || c == ')' || c == '{' || c == '}') {
        pos += 1; nextToken() // stray close: skip
      } else {
        val kw = readKeyword()
        if (kw.isEmpty) { pos += 1; nextToken() }
        else Some(TOp(kw))
      }
    }
  }

  // ------------------------------------------------------------- filters

  private def inflate(data: Array[Byte]): Array[Byte] = {
    val inf = new Inflater()
    inf.setInput(data)
    val out = new java.io.ByteArrayOutputStream(math.max(64, data.length * 4))
    val chunk = new Array[Byte](8192)
    try {
      var n = inf.inflate(chunk)
      while (n > 0 || (!inf.finished() && !inf.needsInput())) {
        if (n > 0) out.write(chunk, 0, n)
        n = inf.inflate(chunk)
      }
    } catch {
      case _: java.util.zip.DataFormatException => // keep partial output
    } finally inf.end()
    out.toByteArray
  }

  /** PNG predictors (the only ones PDF writers use for xref/obj streams). */
  private def unpredict(data: Array[Byte], parms: PDict,
      resolve: Obj => Obj): Array[Byte] = {
    val pred = parms.get("Predictor").map(resolve).collect {
      case PNum(v) => v.toInt }.getOrElse(1)
    if (pred < 10) return data
    val columns = parms.get("Columns").map(resolve).collect {
      case PNum(v) => v.toInt }.getOrElse(1)
    val colors = parms.get("Colors").map(resolve).collect {
      case PNum(v) => v.toInt }.getOrElse(1)
    val bpc = parms.get("BitsPerComponent").map(resolve).collect {
      case PNum(v) => v.toInt }.getOrElse(8)
    val bpp = math.max(1, colors * bpc / 8)
    val rowLen = (columns * colors * bpc + 7) / 8
    val nRows = data.length / (rowLen + 1)
    val out = new Array[Byte](nRows * rowLen)
    val prev = new Array[Byte](rowLen)
    var r = 0
    while (r < nRows) {
      val ft = data(r * (rowLen + 1)) & 0xff
      val src = r * (rowLen + 1) + 1
      val dst = r * rowLen
      var i = 0
      while (i < rowLen) {
        val raw = data(src + i) & 0xff
        val left = if (i >= bpp) out(dst + i - bpp) & 0xff else 0
        val up = prev(i) & 0xff
        val ul = if (i >= bpp) prev(i - bpp) & 0xff else 0
        val v = ft match {
          case 0 => raw
          case 1 => raw + left
          case 2 => raw + up
          case 3 => raw + ((left + up) / 2)
          case 4 => // Paeth
            val p = left + up - ul
            val pa = math.abs(p - left); val pb = math.abs(p - up)
            val pc = math.abs(p - ul)
            raw + (if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul)
          case _ => raw
        }
        out(dst + i) = (v & 0xff).toByte
        i += 1
      }
      System.arraycopy(out, dst, prev, 0, rowLen)
      r += 1
    }
    out
  }

  // ----------------------------------------------------------------- doc

  /** One parsed PDF file: xref resolution, object loading, page walk,
    * per-page text. Instances are single-threaded and short-lived. */
  private val EndstreamMarker: Array[Byte] =
    "endstream".getBytes(StandardCharsets.ISO_8859_1)

  /** First index of `marker` in `buf` at/after `from`, RELATIVE to
    * `from`; -1 if absent. A raw byte scan — no String copy of the
    * remaining file. */
  private def indexOfBytes(buf: Array[Byte], from: Int,
      marker: Array[Byte]): Int = {
    var i = math.max(0, from)
    val last = buf.length - marker.length
    while (i <= last) {
      var j = 0
      while (j < marker.length && buf(i + j) == marker(j)) j += 1
      if (j == marker.length) return i - from
      i += 1
    }
    -1
  }

  final class Doc(bytes: Array[Byte]) {

    private sealed trait XEntry
    private final case class XOff(off: Long) extends XEntry
    private final case class XInStm(stm: Int, idx: Int) extends XEntry

    private val xref = mutable.Map.empty[Int, XEntry]
    private var rootRef: Obj = PNull
    private val objCache = mutable.Map.empty[Int, Obj]
    private val objStmCache =
      mutable.Map.empty[Int, (Array[Byte], Vector[(Int, Int)], Int)]

    locally {
      val tailStart = math.max(0, bytes.length - 2048)
      val tail = new String(bytes, tailStart, bytes.length - tailStart,
        StandardCharsets.ISO_8859_1)
      val i = tail.lastIndexOf("startxref")
      require(i >= 0, "no startxref")
      val lex = new Lex(bytes, tailStart + i + "startxref".length)
      val off = lex.parseObject() match {
        case PNum(v) => v.toLong
        case other   => sys.error(s"bad startxref: $other")
      }
      readXrefChain(off, mutable.Set.empty)
      require(rootRef != PNull, "no /Root in any trailer")
    }

    private def readXrefChain(off: Long, seen: mutable.Set[Long]): Unit = {
      if (off < 0 || off >= bytes.length || !seen.add(off)) return
      val lex = new Lex(bytes, off.toInt)
      lex.skipWs()
      if (lex.startsWith("xref")) readClassicXref(lex, seen)
      else readXrefStream(lex, seen)
    }

    /** Classic cross-reference table + trailer (PDF 1.0 format). */
    private def readClassicXref(lex: Lex, seen: mutable.Set[Long]): Unit = {
      lex.pos += "xref".length
      var done = false
      while (!done) {
        lex.skipWs()
        if (lex.startsWith("trailer")) {
          lex.pos += "trailer".length
          lex.parseObject() match {
            case d: PDict =>
              if (rootRef == PNull) d.get("Root").foreach(rootRef = _)
              // hybrid file: the xref STREAM carries the ObjStm entries;
              // spec order is XRefStm before Prev
              d.get("XRefStm").collect { case PNum(v) =>
                readXrefChain(v.toLong, seen) }
              d.get("Prev").collect { case PNum(v) =>
                readXrefChain(v.toLong, seen) }
            case _ =>
          }
          done = true
        } else if (lex.peek >= '0' && lex.peek <= '9') {
          val start = lex.parseObject().asInstanceOf[PNum].toInt
          val count = lex.parseObject().asInstanceOf[PNum].toInt
          var i = 0
          while (i < count) {
            lex.skipWs()
            val o = lex.readKeyword() // 10-digit offset
            lex.skipWs()
            lex.readKeyword() // 5-digit gen (unused)
            lex.skipWs()
            val flag = lex.readKeyword()
            val num = start + i
            if (flag == "n" && !xref.contains(num))
              xref(num) = XOff(o.toLong)
            i += 1
          }
        } else done = true // malformed: stop this section
      }
    }

    /** PDF 1.5 cross-reference stream (`/Type /XRef`, `/W`, `/Index`). */
    private def readXrefStream(lex: Lex, seen: mutable.Set[Long]): Unit = {
      val (dict, data) = parseIndirectAt(lex) match {
        case PStream(d, raw) => (d, decodeStream(d, raw))
        case other           => sys.error(s"expected xref stream, got $other")
      }
      if (rootRef == PNull) dict.get("Root").foreach(rootRef = _)
      val w = dict.get("W") match {
        case Some(PArr(items)) => items.collect { case PNum(v) => v.toInt }
        case _                 => sys.error("xref stream missing /W")
      }
      val size = dict.get("Size").collect { case PNum(v) => v.toInt }.getOrElse(0)
      val index = dict.get("Index") match {
        case Some(PArr(items)) =>
          items.collect { case PNum(v) => v.toInt }.grouped(2).toSeq
        case _ => Seq(Seq(0, size))
      }
      val entryLen = w.sum
      var p = 0
      def field(width: Int): Long = {
        var v = 0L
        var i = 0
        while (i < width) { v = (v << 8) | (data(p) & 0xff); p += 1; i += 1 }
        v
      }
      index.foreach {
        case Seq(start, count) =>
          var i = 0
          while (i < count && p + entryLen <= data.length) {
            val t = if (w(0) == 0) 1L else field(w(0))
            val f2 = field(w(1))
            val f3 = field(w(2))
            val num = start + i
            if (!xref.contains(num)) t match {
              case 1 => xref(num) = XOff(f2)
              case 2 => xref(num) = XInStm(f2.toInt, f3.toInt)
              case _ => // free
            }
            i += 1
          }
        case _ =>
      }
      dict.get("Prev").collect { case PNum(v) => readXrefChain(v.toLong, seen) }
    }

    /** Parse `N G obj <object> [stream...endstream]` at the lexer. */
    private def parseIndirectAt(lex: Lex): Obj = {
      lex.skipWs()
      lex.parseObject() // object number (as plain num: "N G obj" not an R)
      lex.skipWs()
      lex.parseObject() // generation
      lex.skipWs()
      require(lex.readKeyword() == "obj", "expected 'obj'")
      val o = lex.parseObject()
      lex.skipWs()
      o match {
        case d: PDict if lex.startsWith("stream") =>
          lex.pos += "stream".length
          if (lex.peek == '\r') lex.pos += 1
          if (lex.peek == '\n') lex.pos += 1
          val len = resolve(d.get("Length").getOrElse(PNull)) match {
            case PNum(v) => v.toInt
            case _ =>
              // damaged Length: scan the raw bytes for "endstream" —
              // building a String of the whole remaining file here would
              // cost ~2× the file size in allocation per damaged stream,
              // on the executor hot path
              math.max(0, indexOfBytes(bytes, lex.pos, EndstreamMarker))
          }
          val end = math.min(lex.pos + len, bytes.length)
          PStream(d, java.util.Arrays.copyOfRange(bytes, lex.pos, end))
        case other => other
      }
    }

    /** Follow indirect references, DEPTH-BOUNDED: a malformed or
      * adversarial file can contain a reference cycle (`1 0 obj 1 0 R
      * endobj`), and unbounded recursion would raise StackOverflowError
      * — an Error, not an Exception, which would escape the fail-soft
      * guards and kill the Spark task. Real chains are 1–2 hops; past
      * 32 the chain is garbage and resolves to null. */
    def resolve(o: Obj): Obj = {
      var cur = o
      var hops = 0
      while (cur.isInstanceOf[PRef] && hops < 32) {
        cur = obj(cur.asInstanceOf[PRef].num)
        hops += 1
      }
      if (cur.isInstanceOf[PRef]) PNull else cur
    }

    def obj(num: Int): Obj = objCache.getOrElseUpdate(num, loadObj(num))

    private def loadObj(num: Int): Obj = xref.get(num) match {
      case Some(XOff(off)) if off >= 0 && off < bytes.length =>
        parseIndirectAt(new Lex(bytes, off.toInt))
      case Some(XInStm(stm, idx)) => objFromStream(stm, idx)
      case _ => PNull
    }

    /** Load from an object stream (`/Type /ObjStm`): header is N pairs of
      * (objnum, relative offset), bodies start at /First. */
    private def objFromStream(stmNum: Int, idx: Int): Obj = {
      val (data, pairs, first) = objStmCache.getOrElseUpdate(stmNum, {
        obj(stmNum) match {
          case PStream(d, raw) =>
            val data = decodeStream(d, raw)
            val n = resolve(d.get("N").getOrElse(PNull)) match {
              case PNum(v) => v.toInt; case _ => 0 }
            val first = resolve(d.get("First").getOrElse(PNull)) match {
              case PNum(v) => v.toInt; case _ => 0 }
            val lex = new Lex(data, 0, allowRefs = false)
            val pairs = Vector.newBuilder[(Int, Int)]
            var i = 0
            while (i < n) {
              val on = lex.parseObject().asInstanceOf[PNum].toInt
              val off = lex.parseObject().asInstanceOf[PNum].toInt
              pairs += ((on, off))
              i += 1
            }
            (data, pairs.result(), first)
          case _ => (Array.empty[Byte], Vector.empty[(Int, Int)], 0)
        }
      })
      if (idx < 0 || idx >= pairs.length) return PNull
      val lex = new Lex(data, first + pairs(idx)._2)
      lex.parseObject()
    }

    def decodeStream(dict: PDict, raw: Array[Byte]): Array[Byte] = {
      val filters = resolve(dict.get("Filter").getOrElse(PNull)) match {
        case PName(f)   => Seq(f)
        case PArr(fs)   => fs.collect { case PName(f) => f }
        case _          => Seq.empty
      }
      val parms = resolve(dict.get("DecodeParms").getOrElse(PNull)) match {
        case d: PDict => Seq(Some(d))
        case PArr(ps) => ps.map(resolve).map {
          case d: PDict => Some(d); case _ => None }
        case _ => Seq.empty
      }
      filters.zipWithIndex.foldLeft(raw) { case (data, (f, i)) =>
        f match {
          case "FlateDecode" | "Fl" =>
            val d = inflate(data)
            parms.lift(i).flatten.map(unpredict(d, _, resolve)).getOrElse(d)
          case _ => data // DCTDecode etc: images, never text
        }
      }
    }

    // ------------------------------------------------------------- pages

    /** Page dicts in document order with inherited /Resources. */
    def pages: Vector[(PDict, PDict)] = {
      val root = resolve(rootRef) match {
        case d: PDict => d; case _ => return Vector.empty
      }
      val out = Vector.newBuilder[(PDict, PDict)]
      val seen = mutable.Set.empty[Obj]
      def walk(node: Obj, inherited: PDict, depth: Int): Unit = {
        if (depth > 64 || !seen.add(node)) return
        resolve(node) match {
          case d: PDict =>
            val res = resolve(d.get("Resources").getOrElse(PNull)) match {
              case r: PDict => r; case _ => inherited
            }
            d.get("Type").map(resolve) match {
              case Some(PName("Page")) => out += ((d, res))
              case _ => d.get("Kids").map(resolve) match {
                case Some(PArr(kids)) =>
                  kids.foreach(walk(_, res, depth + 1))
                case _ =>
              }
            }
          case _ =>
        }
      }
      walk(root.get("Pages").getOrElse(PNull), PDict(Map.empty), 0)
      out.result()
    }

    /** Concatenated decoded content streams of a page. */
    def pageContent(page: PDict): Array[Byte] = {
      def streamBytes(o: Obj): Seq[Array[Byte]] = resolve(o) match {
        case PStream(d, raw) => Seq(decodeStream(d, raw))
        case PArr(items)     => items.flatMap(streamBytes)
        case _               => Seq.empty
      }
      val parts = streamBytes(page.get("Contents").getOrElse(PNull))
      if (parts.isEmpty) Array.empty
      else {
        val out = new java.io.ByteArrayOutputStream()
        parts.foreach { p => out.write(p); out.write('\n') }
        out.toByteArray
      }
    }

    // ------------------------------------------------------------- fonts

    /** Per-font byte→text decoder. */
    final class Font(toUni: Map[Int, String], codeBytes: Int,
        simpleTable: Array[String],
        cidFallback: Int => Option[String] = _ => None) {
      def decode(s: Array[Byte]): String = {
        val sb = new StringBuilder(s.length)
        if (codeBytes == 2) {
          var i = 0
          while (i + 1 < s.length) {
            val code = ((s(i) & 0xff) << 8) | (s(i + 1) & 0xff)
            // ToUnicode first; otherwise the Type0 fallback chain
            // (embedded-cmap inversion or Identity heuristic). A CID
            // neither resolves is dropped: emitting the raw glyph id
            // would be garbage text, worse than a gap
            toUni.get(code) match {
              case Some(u) => sb ++= u
              case None    => cidFallback(code).foreach(sb ++= _)
            }
            i += 2
          }
        } else {
          var i = 0
          while (i < s.length) {
            val code = s(i) & 0xff
            toUni.get(code) match {
              case Some(u) => sb ++= u
              case None =>
                val t = simpleTable(code)
                if (t != null) sb ++= t
            }
            i += 1
          }
        }
        sb.toString
      }
    }

    private val fontCache = mutable.Map.empty[Obj, Font]

    def fontFor(fontRef: Obj): Font =
      fontCache.getOrElseUpdate(fontRef, buildFont(fontRef))

    private def buildFont(fontRef: Obj): Font = {
      val fd = resolve(fontRef) match {
        case d: PDict => d
        case _        => return new Font(Map.empty, 1, winAnsiTable())
      }
      val isType0 = fd.get("Subtype").map(resolve).contains(PName("Type0"))
      val toUni = resolve(fd.get("ToUnicode").getOrElse(PNull)) match {
        case PStream(d, raw) => parseToUnicode(decodeStream(d, raw))
        case _               => Map.empty[Int, String]
      }
      if (isType0) new Font(toUni, 2, Array.empty,
        if (toUni.nonEmpty) _ => None else type0Fallback(fd))
      else {
        val table = winAnsiTable()
        resolve(fd.get("Encoding").getOrElse(PNull)) match {
          case PName("MacRomanEncoding") => // ASCII part identical; accept
          case d: PDict =>
            resolve(d.get("Differences").getOrElse(PNull)) match {
              case PArr(items) =>
                var code = 0
                items.foreach {
                  case PNum(v)  => code = v.toInt
                  case PName(g) =>
                    if (code >= 0 && code < 256)
                      table(code) = Agl.toUnicode(g)
                    code += 1
                  case _ =>
                }
              case _ =>
            }
          case _ => // WinAnsi or absent: table as built
        }
        new Font(toUni, 1, table)
      }
    }

    /** CID→text fallback chain for a Type0 font that ships NO ToUnicode
      * map (common in CJK PDFs — the reference's own corpus is Korean):
      *
      * 1. EMBEDDED-CMAP INVERSION — the correct path when the descendant
      *    CIDFont embeds its TrueType program (`FontFile2`): CID→GID via
      *    `CIDToGIDMap` (Identity or the embedded stream), then
      *    GID→Unicode by inverting the font's own `cmap` table
      *    ([[TrueTypeCmap.inverse]]). Subset fonts carry exactly the
      *    glyphs the document uses, so the inverse is effectively 1:1.
      * 2. IDENTITY HEURISTIC — some producers write Identity-ordered
      *    CIDs that ARE Unicode code points. Emit the code point itself,
      *    but ONLY for plausibly-printable blocks (ASCII, Hangul, CJK,
      *    kana): a subset-font glyph id that happens to be small fails
      *    the gate and is dropped rather than emitted as garbage. */
    private def type0Fallback(fd: PDict): Int => Option[String] = {
      val desc = resolve(fd.get("DescendantFonts").getOrElse(PNull)) match {
        case PArr(items) if items.nonEmpty => resolve(items.head) match {
          case d: PDict => Some(d)
          case _        => None
        }
        case _ => None
      }
      val cidToGid: Int => Int = desc.flatMap { d =>
        resolve(d.get("CIDToGIDMap").getOrElse(PNull)) match {
          case PStream(sd, raw) =>
            val bytes = decodeStream(sd, raw)
            Some((cid: Int) =>
              if (2 * cid + 1 < bytes.length)
                ((bytes(2 * cid) & 0xff) << 8) | (bytes(2 * cid + 1) & 0xff)
              else 0)
          case _ => None // /Identity or absent: CID == GID
        }
      }.getOrElse((cid: Int) => cid)
      val gidToUni: Map[Int, String] = desc.flatMap { d =>
        resolve(d.get("FontDescriptor").getOrElse(PNull)) match {
          case fdd: PDict =>
            resolve(fdd.get("FontFile2").getOrElse(PNull)) match {
              case PStream(sd, raw) =>
                TrueTypeCmap.inverse(decodeStream(sd, raw))
              case _ => None
            }
          case _ => None
        }
      }.getOrElse(Map.empty)
      if (gidToUni.nonEmpty) (cid: Int) => gidToUni.get(cidToGid(cid))
      else (cid: Int) =>
        if (plausibleCodePoint(cid)) Some(cid.toChar.toString) else None
    }

    /** bfchar/bfrange sections of a ToUnicode CMap. */
    private def parseToUnicode(data: Array[Byte]): Map[Int, String] = {
      val lex = new Lex(data, 0, allowRefs = false)
      val m = Map.newBuilder[Int, String]
      def codeOf(o: Obj): Int = o match {
        case PStr(b) =>
          var v = 0
          b.foreach(x => v = (v << 8) | (x & 0xff))
          v
        case PNum(v) => v.toInt
        case _       => -1
      }
      def strOf(o: Obj): String = o match {
        case PStr(b) => new String(b, StandardCharsets.UTF_16BE)
        case _       => ""
      }
      val pending = mutable.ArrayBuffer.empty[Obj]
      var tok = lex.nextToken()
      while (tok.isDefined) {
        tok.get match {
          case TOp("beginbfchar") =>
            var t = lex.nextToken()
            val buf = mutable.ArrayBuffer.empty[Obj]
            while (t.isDefined && t.get != TOp("endbfchar")) {
              t.get match { case TObj(o) => buf += o; case _ => }
              t = lex.nextToken()
            }
            buf.grouped(2).foreach {
              case mutable.ArrayBuffer(src, dst) =>
                val c = codeOf(src)
                if (c >= 0) m += c -> strOf(dst)
              case _ =>
            }
          case TOp("beginbfrange") =>
            var t = lex.nextToken()
            val buf = mutable.ArrayBuffer.empty[Obj]
            while (t.isDefined && t.get != TOp("endbfrange")) {
              t.get match { case TObj(o) => buf += o; case _ => }
              t = lex.nextToken()
            }
            buf.grouped(3).foreach {
              case mutable.ArrayBuffer(lo, hi, dst) =>
                val l = codeOf(lo); val h = codeOf(hi)
                dst match {
                  case PArr(items) =>
                    items.zipWithIndex.foreach { case (d, i) =>
                      if (l + i <= h) m += (l + i) -> strOf(d)
                    }
                  case PStr(b) =>
                    val base = strOf(PStr(b))
                    if (base.nonEmpty) {
                      var c = l
                      while (c <= h && c - l < 65536) {
                        val incremented = base.dropRight(1) +
                          (base.last + (c - l)).toChar
                        m += c -> incremented
                        c += 1
                      }
                    }
                  case _ =>
                }
              case _ =>
            }
          case TObj(o) => pending += o
          case _       => pending.clear()
        }
        tok = lex.nextToken()
      }
      m.result()
    }

    // -------------------------------------------------------------- text

    /** Text of one page: BT..ET runs through Tj/TJ/'/" with per-font
      * decoding; Td, TD, T-star, Tm and ET breaks become newlines; Form
      * XObjects (`Do`) recurse with their own resources. */
    def pageText(page: PDict, resources: PDict): String = {
      val runs = mutable.ArrayBuffer.empty[Run]
      extractText(pageContent(page), resources, runs, 0)
      PdfLayout.render(runs)
    }

    /** True when the page's resources (or nested Form XObjects, same
      * depth bound as text extraction) contain a raster Image XObject —
      * the signal that an empty text layer means a SCANNED page rather
      * than a blank one. Drives the raster-only fail contract in
      * [[PdfPageExtractor]]: the reference OCRs such pages
      * (`parsing.py:38-40`); without the OCR leg they must surface as
      * `status="fail"`, never as silent empty text. */
    def hasRasterImage(resources: PDict, depth: Int = 0): Boolean = {
      if (depth > 8) return false
      val xs = resolve(resources.get("XObject").getOrElse(PNull)) match {
        case d: PDict => d.m; case _ => Map.empty[String, Obj]
      }
      xs.values.map(resolve).exists {
        case PStream(d, _) =>
          val st = d.get("Subtype").map(resolve)
          st.contains(PName("Image")) ||
            (st.contains(PName("Form")) &&
              (resolve(d.get("Resources").getOrElse(PNull)) match {
                case r: PDict => hasRasterImage(r, depth + 1)
                case _ => false
              }))
        case _ => false
      }
    }

    /** Decoded payloads of the page's raster Image XObjects in
      * resource-name order (recursing into Form XObjects, same depth
      * bound as [[hasRasterImage]]). Flate unwraps; other filters pass
      * through as stored — a DCTDecode image IS its JPEG bytes. This is
      * the OCR seam's input: [[PdfPageExtractor]] hands these to an
      * [[OcrEngine]] when the page's text layer is empty
      * (reference `parsing.py:38-40`). */
    def rasterImages(resources: PDict, depth: Int = 0): Seq[Array[Byte]] = {
      if (depth > 8) return Seq.empty
      val xs = resolve(resources.get("XObject").getOrElse(PNull)) match {
        case d: PDict => d.m; case _ => Map.empty[String, Obj]
      }
      xs.toSeq.sortBy(_._1).map(t => resolve(t._2)).flatMap {
        case PStream(d, raw) =>
          d.get("Subtype").map(resolve) match {
            case Some(PName("Image")) => Seq(decodeStream(d, raw))
            case Some(PName("Form")) =>
              resolve(d.get("Resources").getOrElse(PNull)) match {
                case r: PDict => rasterImages(r, depth + 1)
                case _        => Seq.empty
              }
            case _ => Seq.empty
          }
        case _ => Seq.empty
      }
    }

    /** Content-stream walk emitting POSITIONED runs: one run per text
      * anchor (a `Td`/`TD`/`Tm`/`T*` position change flushes the run in
      * progress), with the text-space (x, y) the run started at. The
      * line matrix is tracked as a pure translation — scale/rotation are
      * ignored, which is exact for the horizontal text that makes up
      * tables and body copy. Positions feed [[PdfLayout]]'s row
      * clustering and lattice-table detection. */
    private def extractText(content: Array[Byte], resources: PDict,
        runs: mutable.ArrayBuffer[Run], depth: Int): Unit = {
      if (depth > 8) return
      val fonts = resolve(resources.get("Font").getOrElse(PNull)) match {
        case d: PDict => d.m; case _ => Map.empty[String, Obj]
      }
      val xobjects = resolve(resources.get("XObject").getOrElse(PNull)) match {
        case d: PDict => d.m; case _ => Map.empty[String, Obj]
      }
      val lex = new Lex(content, 0, allowRefs = false)
      val operands = mutable.ArrayBuffer.empty[Obj]
      var font: Font = null
      var x = 0.0
      var y = 0.0
      var tl = 0.0 // leading (TL / TD); 0 = never set
      var lineX = 0.0
      var lineY = 0.0
      val cur = new StringBuilder
      def flush(): Unit = {
        if (cur.nonEmpty) {
          runs += Run(lineX, lineY, cur.toString)
          cur.clear()
        }
      }
      def numAt(i: Int): Double = operands.lift(i) match {
        case Some(PNum(v)) => v
        case _             => 0.0
      }
      def nextLine(): Unit = {
        flush()
        // unset leading: fall back to a nominal line height so `'`/T*
        // still break lines instead of merging into the previous row
        y -= (if (tl != 0) tl else 12.0)
      }
      def show(o: Obj): Unit = o match {
        case PStr(b) =>
          if (cur.isEmpty) { lineX = x; lineY = y }
          if (font != null) cur ++= font.decode(b)
          else cur ++= new String(b, StandardCharsets.ISO_8859_1)
        case _ =>
      }
      var tok = lex.nextToken()
      while (tok.isDefined) {
        tok.get match {
          case TObj(o) => operands += o
          case TOp(op) =>
            op match {
              case "Tf" =>
                operands.headOption.collect { case PName(n) =>
                  fonts.get(n).foreach(f => font = fontFor(f))
                }
              case "Tj" => operands.lastOption.foreach(show)
              case "'" =>
                nextLine(); operands.lastOption.foreach(show)
              case "\"" =>
                nextLine(); operands.lastOption.foreach(show)
              case "TJ" =>
                operands.lastOption.collect { case PArr(items) =>
                  items.foreach {
                    case s: PStr => show(s)
                    case PNum(v) =>
                      // big negative kern = inter-word gap (thousandths
                      // of an em; -180 is the usual space threshold)
                      if (v < -180 && cur.nonEmpty) cur += ' '
                    case _ =>
                  }
                }
              case "TL" => tl = numAt(0)
              case "Td" => flush(); x += numAt(0); y += numAt(1)
              case "TD" =>
                flush(); tl = -numAt(1); x += numAt(0); y += numAt(1)
              case "Tm" => flush(); x = numAt(4); y = numAt(5)
              case "T*" => nextLine()
              case "BT" => flush(); x = 0; y = 0
              case "ET" => flush()
              case "Do" =>
                operands.headOption.collect { case PName(n) =>
                  xobjects.get(n).map(resolve).collect {
                    case PStream(d, raw)
                        if d.get("Subtype").map(resolve)
                          .contains(PName("Form")) =>
                      val res = resolve(d.get("Resources")
                        .getOrElse(PNull)) match {
                        case r: PDict => r; case _ => resources
                      }
                      flush()
                      extractText(decodeStream(d, raw), res, runs, depth + 1)
                  }
                }
              case "BI" =>
                // inline image: scan past binary payload to EI
                var done = false
                while (!done && !lex.eof) {
                  if (lex.startsWith("EI") &&
                      (lex.pos + 2 >= content.length ||
                        (content(lex.pos + 2) & 0xff) <= ' ')) {
                    lex.pos += 2; done = true
                  } else lex.pos += 1
                }
              case _ => // graphics operators: irrelevant to text
            }
            operands.clear()
        }
        tok = lex.nextToken()
      }
      flush()
    }
  }

  /** A positioned text run: the text shown from one anchor point
    * (text-space translation at the first show operator of the run). */
  private[ingest] final case class Run(x: Double, y: Double, text: String)

  /** Layout reconstruction over positioned runs — the `do_table_structure`
    * leg of S4 (`parsing.py:39`): the reference exports detected tables
    * as markdown pipes inside `page_content`; this recovers the same
    * output SHAPE from run geometry alone (lattice heuristic), no ML.
    *
    * Rows = runs clustered by quantized y. A TABLE BAND opens where two
    * consecutive rows share ≥2 x-anchors (distinct cell columns at the
    * same x across lines is the lattice signature; flowing text has one
    * anchor per row) and extends through rows whose anchors stay inside
    * the band's columns — which keeps a wrapped cell's continuation
    * lines (they anchor at their own column) in the band. Band rows
    * render as `| a | b |` pipes with a `| --- |` separator under the
    * first row; everything else renders one line per run, row by row.
    * Known limit, documented: a two-column PAGE layout shares the
    * lattice signature and would table-ize — the reference's ML layout
    * model is the production answer there; its corpus (and this one) is
    * single-column. */
  private object PdfLayout {
    private def qy(v: Double): Long = math.round(v / 2.0) // 2pt row snap
    private def qx(v: Double): Long = math.round(v / 2.0)

    def render(runs: collection.Seq[Run]): String = {
      val clean = runs.iterator
        .map(r => Run(r.x, r.y, r.text.trim)).filter(_.text.nonEmpty)
        .toVector
      // rows keyed by quantized y, first-appearance order (content order
      // ≈ reading order for the text itself; geometry only decides
      // row/cell membership)
      val byRow = mutable.LinkedHashMap.empty[Long, mutable.ArrayBuffer[Run]]
      clean.foreach(r =>
        byRow.getOrElseUpdate(qy(r.y), mutable.ArrayBuffer.empty) += r)
      val rows: Vector[(Vector[Long], Seq[Run])] = byRow.values.iterator
        .map(rs => (rs.map(r => qx(r.x)).distinct.sorted.toVector, rs.toSeq))
        .toVector

      val out = new StringBuilder
      var i = 0
      while (i < rows.length) {
        val (a0, _) = rows(i)
        val opens = a0.size >= 2 && i + 1 < rows.length &&
          rows(i + 1)._1.count(a0.contains) >= 2
        if (opens) {
          val bandAnchors = (a0 ++ rows(i + 1)._1).distinct.sorted
          var j = i + 2
          while (j < rows.length && rows(j)._1.forall(bandAnchors.contains))
            j += 1
          val cols = bandAnchors
          def pipeRow(rs: Seq[Run]): Unit = {
            out ++= cols.map(c =>
                rs.filter(r => qx(r.x) == c).map(_.text).mkString(" "))
              .mkString("| ", " | ", " |\n")
          }
          pipeRow(rows(i)._2)
          out ++= cols.map(_ => "---").mkString("| ", " | ", " |\n")
          (i + 1 until j).foreach(k => pipeRow(rows(k)._2))
          i = j
        } else {
          rows(i)._2.sortBy(r => qx(r.x)).foreach { r =>
            out ++= r.text; out += '\n'
          }
          i += 1
        }
      }
      out.toString
        .split("\n").iterator.map(_.trim).filter(_.nonEmpty)
        .mkString("\n")
    }
  }

  /** Printable-block gate for the Identity-CID heuristic: ASCII, Hangul
    * (syllables + jamo), CJK unified, kana, CJK punctuation. */
  private def plausibleCodePoint(c: Int): Boolean =
    (c >= 0x20 && c < 0x7f) ||
      (c >= 0xAC00 && c <= 0xD7A3) ||
      (c >= 0x1100 && c <= 0x11FF) ||
      (c >= 0x3130 && c <= 0x318F) ||
      (c >= 0x4E00 && c <= 0x9FFF) ||
      (c >= 0x3040 && c <= 0x30FF) ||
      (c >= 0x3000 && c <= 0x303F)

  /** Minimal TrueType `cmap` reader: just enough of the public sfnt
    * format (OpenType spec, `cmap` formats 4 and 12) to INVERT an
    * embedded font's glyph mapping — gid → unicode — for the Type0
    * no-ToUnicode fallback. Prefers (3,10) UCS-4, then (3,1) BMP, then
    * any Unicode-platform subtable; bounded work (entry cap) so a
    * hostile font can't inflate the map. Fail-soft: any structural
    * surprise returns None and the caller falls through to the
    * Identity heuristic. */
  private object TrueTypeCmap {
    private val MaxEntries = 300000

    def inverse(font: Array[Byte]): Option[Map[Int, String]] = try {
      def u16(o: Int): Int = ((font(o) & 0xff) << 8) | (font(o + 1) & 0xff)
      def u32(o: Int): Int =
        ((font(o) & 0xff) << 24) | ((font(o + 1) & 0xff) << 16) |
          ((font(o + 2) & 0xff) << 8) | (font(o + 3) & 0xff)
      if (font.length < 12) return None
      val numTables = u16(4)
      var cmapOff = -1
      var i = 0
      while (i < numTables && cmapOff < 0) {
        val rec = 12 + 16 * i
        if (rec + 16 <= font.length &&
            new String(font, rec, 4, "ISO-8859-1") == "cmap")
          cmapOff = u32(rec + 8)
        i += 1
      }
      if (cmapOff < 0 || cmapOff + 4 > font.length) return None
      val n = u16(cmapOff + 2)
      var best = -1
      var bestScore = 0
      var j = 0
      while (j < n) {
        val rec = cmapOff + 4 + 8 * j
        if (rec + 8 <= font.length) {
          val score = (u16(rec), u16(rec + 2)) match {
            case (3, 10) => 3
            case (3, 1)  => 2
            case (0, _)  => 1
            case _       => 0
          }
          if (score > bestScore) {
            bestScore = score
            best = cmapOff + u32(rec + 4)
          }
        }
        j += 1
      }
      if (best < 0 || best + 2 > font.length) return None
      val out = Map.newBuilder[Int, String]
      var added = 0
      u16(best) match {
        case 4 =>
          val segX2 = u16(best + 6)
          val seg = segX2 / 2
          val endO = best + 14
          val startO = endO + segX2 + 2
          val deltaO = startO + segX2
          val rangeO = deltaO + segX2
          var s = 0
          while (s < seg && added < MaxEntries) {
            val end = u16(endO + 2 * s)
            val start = u16(startO + 2 * s)
            val delta = u16(deltaO + 2 * s)
            val ro = u16(rangeO + 2 * s)
            var c = start
            while (c <= end && c != 0xFFFF && added < MaxEntries) {
              val gid =
                if (ro == 0) (c + delta) & 0xffff
                else {
                  val addr = rangeO + 2 * s + ro + 2 * (c - start)
                  if (addr + 1 < font.length) {
                    val g = u16(addr)
                    if (g == 0) 0 else (g + delta) & 0xffff
                  } else 0
                }
              if (gid != 0) { out += gid -> c.toChar.toString; added += 1 }
              c += 1
            }
            s += 1
          }
        case 12 =>
          val nGroups = u32(best + 12)
          var g = 0
          while (g < nGroups && added < MaxEntries) {
            val go = best + 16 + 12 * g
            if (go + 12 <= font.length) {
              val sc = u32(go)
              val ec = u32(go + 4)
              val sg = u32(go + 8)
              var c = sc
              while (c <= ec && added < MaxEntries) {
                out += (sg + (c - sc)) -> new String(Character.toChars(c))
                added += 1
                c += 1
              }
            }
            g += 1
          }
        case _ => return None
      }
      val m = out.result() - 0 // gid 0 is .notdef
      if (m.isEmpty) None else Some(m)
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  // ---------------------------------------------------- encoding tables

  /** WinAnsiEncoding → Unicode (Latin-1 plus the 0x80–0x9F overrides). */
  private def winAnsiTable(): Array[String] = {
    val t = new Array[String](256)
    var i = 32
    while (i < 256) { t(i) = i.toChar.toString; i += 1 }
    val over = Map(
      0x80 -> "€", 0x82 -> "‚", 0x83 -> "ƒ", 0x84 -> "„",
      0x85 -> "…", 0x86 -> "†", 0x87 -> "‡", 0x88 -> "ˆ",
      0x89 -> "‰", 0x8a -> "Š", 0x8b -> "‹", 0x8c -> "Œ",
      0x8e -> "Ž", 0x91 -> "‘", 0x92 -> "’", 0x93 -> "“",
      0x94 -> "”", 0x95 -> "•", 0x96 -> "–", 0x97 -> "—",
      0x98 -> "˜", 0x99 -> "™", 0x9a -> "š", 0x9b -> "›",
      0x9c -> "œ", 0x9e -> "ž", 0x9f -> "Ÿ")
    over.foreach { case (c, s) => t(c) = s }
    Seq(0x81, 0x8d, 0x8f, 0x90, 0x9d).foreach(c => t(c) = null)
    t
  }

  /** Small Adobe-Glyph-List subset for /Differences tables: the glyph
    * names LaTeX/Office writers actually emit for Latin text. */
  private object Agl {
    private val named = Map(
      "space" -> " ", "exclam" -> "!", "quotedbl" -> "\"",
      "numbersign" -> "#", "dollar" -> "$", "percent" -> "%",
      "ampersand" -> "&", "quotesingle" -> "'", "parenleft" -> "(",
      "parenright" -> ")", "asterisk" -> "*", "plus" -> "+", "comma" -> ",",
      "hyphen" -> "-", "period" -> ".", "slash" -> "/", "zero" -> "0",
      "one" -> "1", "two" -> "2", "three" -> "3", "four" -> "4",
      "five" -> "5", "six" -> "6", "seven" -> "7", "eight" -> "8",
      "nine" -> "9", "colon" -> ":", "semicolon" -> ";", "less" -> "<",
      "equal" -> "=", "greater" -> ">", "question" -> "?", "at" -> "@",
      "bracketleft" -> "[", "backslash" -> "\\", "bracketright" -> "]",
      "asciicircum" -> "^", "underscore" -> "_", "grave" -> "`",
      "braceleft" -> "{", "bar" -> "|", "braceright" -> "}",
      "asciitilde" -> "~", "quoteleft" -> "‘",
      "quoteright" -> "’", "quotedblleft" -> "“",
      "quotedblright" -> "”", "endash" -> "–",
      "emdash" -> "—", "bullet" -> "•", "ellipsis" -> "…",
      "fi" -> "ﬁ", "fl" -> "ﬂ", "ff" -> "ﬀ",
      "ffi" -> "ﬃ", "ffl" -> "ﬄ", "trademark" -> "™",
      "copyright" -> "©", "registered" -> "®",
      "degree" -> "°", "multiply" -> "×", "divide" -> "÷")
    def toUnicode(glyph: String): String =
      if (glyph.length == 1) glyph // a, A, 0 …
      else named.getOrElse(glyph,
        // uniXXXX / uXXXX[XX] forms
        if (glyph.startsWith("uni") && glyph.length >= 7)
          try String.valueOf(
            Integer.parseInt(glyph.substring(3, 7), 16).toChar)
          catch { case _: NumberFormatException => "?" }
        else "?")
  }
}

/** S4 — real PDF page extraction, pure JVM (see [[Pdf]] for scope).
  * One [[Pdf.Doc]] per file; per-page failures degrade to an error row
  * for that page, whole-file failures to a single `status="fail"` row —
  * the same fail-soft contract as the other extractors
  * (reference `parsing.py:134-155`). */
final case class PdfPageExtractor(maxPages: Int = 10000,
    ocr: OcrEngine = NoOcr)
    extends PageExtractor {
  import PdfPageExtractor.FailSoft

  def extract(path: String, content: Array[Byte]): Seq[PageText] =
    try {
      val doc = new Pdf.Doc(content)
      val pages = doc.pages.take(maxPages)
      if (pages.isEmpty) Seq(PageText(0, "", Some("no pages")))
      else pages.zipWithIndex.map { case ((page, res), i) =>
        try {
          val text = doc.pageText(page, res)
          // raster-only page (scanned: images, no text layer): the
          // reference OCRs it (`parsing.py:38-40`). With an [[OcrEngine]]
          // plugged the recognized text becomes the page content (a
          // SUCCESS row, like the reference); without one — or when
          // recognition fails on every image — this is a FAIL row
          // (`parsing.py:139-154`), never silent empty text — the first
          // thing a user with scanned PDFs would otherwise hit
          if (text.isEmpty && doc.hasRasterImage(res)) {
            val recognized = doc.rasterImages(res).iterator
              .map(ocr.recognize)
              .collect { case Right(t) if t.nonEmpty => t }.toSeq
            if (recognized.nonEmpty)
              PageText(i + 1, recognized.mkString("\n"), None)
            else if (ocr eq NoOcr)
              PageText(i + 1, "", Some(s"page ${i + 1}: no text layer " +
                "(raster-only page; OCR not available)"))
            else
              PageText(i + 1, "", Some(s"page ${i + 1}: no text layer " +
                s"(raster-only page; OCR '${ocr.name}' recognized nothing)"))
          } else PageText(i + 1, text, None)
        } catch {
          case FailSoft(msg) =>
            PageText(i + 1, "", Some(s"page ${i + 1}: $msg"))
        }
      }
    } catch {
      case FailSoft(msg) => Seq(PageText(0, "", Some(msg)))
    }
}

object PdfPageExtractor {
  /** The fail-soft net for untrusted bytes: NonFatal covers ordinary
    * parse failures; StackOverflowError is included EXPLICITLY because
    * a malformed file can still blow the stack somewhere the depth
    * guards don't reach, and SOE is an Error that `case e: Exception`
    * would let escape — killing the whole Spark task for one bad file.
    * Genuine VM-fatal errors (OOM, internal) still propagate. */
  private[ingest] object FailSoft {
    def unapply(t: Throwable): Option[String] = t match {
      case e if scala.util.control.NonFatal(e) =>
        Some(Option(e.getMessage).getOrElse(e.getClass.getSimpleName))
      case e: StackOverflowError =>
        Some("StackOverflowError: runaway recursion in malformed file")
      case _ => None
    }
  }
}
