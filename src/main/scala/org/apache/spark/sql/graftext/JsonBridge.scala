// Same private[sql]-bridge rationale as CosineSimilarityExpr.
package org.apache.spark.sql.graftext

import java.io.CharArrayWriter

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.json.{JacksonGenerator, JSONOptions}
import org.apache.spark.sql.types.StructType

/** Bridge to Catalyst's own JSON writer (`JacksonGenerator`,
  * private[sql]) so external sinks serialize rows EXACTLY like
  * `to_json` / the JSON file sink does — same timestamp formats, same
  * nested struct/array/map handling — instead of a hand-rolled encoder
  * drifting from engine semantics. */
object JsonBridge {

  /** A reusable per-task row→JSON-string encoder (NOT thread-safe —
    * one per DataWriter). */
  final class RowJson(schema: StructType, timeZoneId: String = "UTC") {
    private val buf = new CharArrayWriter()
    private val gen = new JacksonGenerator(
      schema,
      buf,
      new JSONOptions(Map.empty[String, String], timeZoneId))

    def apply(row: InternalRow): String = {
      gen.write(row)
      gen.flush()
      val s = buf.toString
      buf.reset()
      s
    }
  }

  def encoder(schema: StructType, timeZoneId: String = "UTC"): RowJson =
    new RowJson(schema, timeZoneId)
}
