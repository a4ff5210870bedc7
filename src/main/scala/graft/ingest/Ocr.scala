package graft.ingest

/** The OCR SEAM — the raster leg of S4 (reference `parsing.py:38-40`
  * runs EasyOCR en+ko over every page image). One interface: raster
  * image bytes in, recognized text out. Implementations must be
  * Serializable — they ride into the `mapPartitions` closure of
  * [[Ingest.explodePages]] and are reused across a partition's files,
  * exactly like [[graft.multimodal.FrameDecoder]] on the video side.
  *
  * Three implementations ship: [[NoOcr]] (the default: recognition is
  * unavailable, so a raster-only page surfaces as the reference's
  * `status="fail"` row — never silent empty text), [[StubOcrEngine]]
  * (deterministic md5-derived pseudo-text exercising every seam call
  * site), and [[TemplateOcrEngine]] — REAL recognition, pure JVM:
  * binarize → segment → 5×7 template match, recovering machine-set
  * text from scanned (DCTDecode/PNG/BMP) pages end-to-end
  * (TemplateOcrSpec drives a raster-only PDF through the extractor and
  * gets its pinned text back). An open-vocabulary neural binding
  * (EasyOCR parity) is a fourth implementation of THIS trait; callers
  * and the q31 document schema don't change, which is the point of the
  * seam.
  */
trait OcrEngine extends Serializable {

  /** Label reported in fail-row errors when recognition fails. */
  def name: String

  /** Recognize text on one raster image (payload as stored in the
    * container — a DCTDecode PDF image IS its JPEG bytes). Fail-soft:
    * a Left never kills the page, it demotes it to a fail row. */
  def recognize(imageBytes: Array[Byte]): Either[String, String]
}

/** Recognition unavailable (the default): every raster-only page keeps
  * the reference's fail-row contract (`parsing.py:139-154`). */
object NoOcr extends OcrEngine {
  def name = "none"
  def recognize(imageBytes: Array[Byte]): Either[String, String] =
    Left("OCR not available")
}

/** Deterministic stand-in for a real OCR model (which needs a native /
  * model runtime this container doesn't have): the "recognized text"
  * derives from md5 of the image payload — engine- and run-stable, so
  * specs can pin exact bytes-in/text-out behavior. Clearly a stub; a
  * real engine replaces it without touching any call site. */
object StubOcrEngine extends OcrEngine {
  def name = "stub"
  def recognize(imageBytes: Array[Byte]): Either[String, String] =
    if (imageBytes == null || imageBytes.isEmpty) Left("empty image")
    else {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(imageBytes)
      val hex = d.take(8).map(b => f"$b%02x").mkString
      Right(s"[ocr-stub $hex ${imageBytes.length}B]")
    }
}
