package graft.serve

import java.nio.charset.StandardCharsets.UTF_8

/** Request-body decoding for the serving layer: `application/x-www-form-
  * urlencoded` and `multipart/form-data` (the two encodings FastAPI's
  * `Form(...)`/`File(...)` accept — every reference route body is one of
  * these or JSON).
  *
  * The multipart reader is a single-pass boundary splitter over the raw
  * bytes: file parts keep their bytes verbatim (uploads are binary),
  * text fields decode as UTF-8. Uploads here are route-plane payloads
  * (one file per request, like the reference's `UploadFile`); bulk data
  * enters the engine through the ingest sources, not this door.
  */
object Forms {

  final case class FilePart(filename: String, bytes: Array[Byte])
  final case class FormData(fields: Map[String, String],
      files: Map[String, FilePart]) {
    def required(name: String): String = fields.getOrElse(name,
      throw new IllegalArgumentException(s"missing form field: $name"))
  }

  def parseQuery(rawQuery: String): Map[String, String] =
    if (rawQuery == null || rawQuery.isEmpty) Map.empty
    else rawQuery.split("&").toSeq.flatMap { kv =>
      kv.split("=", 2) match {
        case Array(k, v) => Some(dec(k) -> dec(v))
        case Array(k)    => Some(dec(k) -> "")
        case _           => None
      }
    }.toMap

  private def dec(s: String) =
    java.net.URLDecoder.decode(s, UTF_8)

  def parseBody(contentType: String, body: Array[Byte]): FormData = {
    val ct = Option(contentType).getOrElse("")
    if (ct.startsWith("multipart/form-data")) parseMultipart(ct, body)
    else FormData(parseQuery(new String(body, UTF_8)), Map.empty)
  }

  /** RFC 2046 multipart split on the declared boundary. Part bodies are
    * delimited by CRLF + boundary; the final boundary carries `--`. */
  def parseMultipart(contentType: String, body: Array[Byte]): FormData = {
    val boundary = contentType.split(";").map(_.trim)
      .find(_.startsWith("boundary="))
      .map(_.stripPrefix("boundary=").stripPrefix("\"").stripSuffix("\""))
      .getOrElse(throw new IllegalArgumentException("multipart without boundary"))
    val delim = ("--" + boundary).getBytes(UTF_8)

    var fields = Map.empty[String, String]
    var files  = Map.empty[String, FilePart]

    var at = indexOf(body, delim, 0)
    while (at >= 0) {
      val partStart = at + delim.length
      // "--" after the delimiter = closing boundary
      if (partStart + 1 < body.length &&
          body(partStart) == '-' && body(partStart + 1) == '-') {
        at = -1
      } else {
        val contentStart = skipCrlf(body, partStart)
        val next = indexOf(body, delim, contentStart)
        require(next > 0, "unterminated multipart body")
        // part = headers CRLF CRLF content CRLF (before next boundary)
        val headerEnd = indexOf(body, "\r\n\r\n".getBytes(UTF_8), contentStart)
        require(headerEnd > 0 && headerEnd < next, "multipart part without headers")
        val headers = new String(body, contentStart, headerEnd - contentStart, UTF_8)
        val contentFrom = headerEnd + 4
        val contentTo = math.max(contentFrom, next - 2) // strip trailing CRLF
        val content = java.util.Arrays.copyOfRange(body, contentFrom, contentTo)

        val disp = headers.linesIterator
          .find(_.toLowerCase.startsWith("content-disposition"))
          .getOrElse("")
        val name = attr(disp, "name").getOrElse("")
        attr(disp, "filename") match {
          case Some(fn) if name.nonEmpty =>
            files += name -> FilePart(fn, content)
          case _ if name.nonEmpty =>
            fields += name -> new String(content, UTF_8)
          case _ => ()
        }
        at = next
        if (at >= body.length) at = -1
      }
    }
    FormData(fields, files)
  }

  private def attr(header: String, key: String): Option[String] = {
    val m = java.util.regex.Pattern
      .compile(key + "=\"([^\"]*)\"").matcher(header)
    if (m.find()) Some(m.group(1)) else None
  }

  private def skipCrlf(b: Array[Byte], from: Int): Int = {
    var i = from
    if (i + 1 < b.length && b(i) == '\r' && b(i + 1) == '\n') i += 2
    i
  }

  private def indexOf(haystack: Array[Byte], needle: Array[Byte], from: Int): Int = {
    var i = math.max(0, from)
    val last = haystack.length - needle.length
    while (i <= last) {
      var j = 0
      while (j < needle.length && haystack(i + j) == needle(j)) j += 1
      if (j == needle.length) return i
      i += 1
    }
    -1
  }
}
