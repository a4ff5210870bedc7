package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SFT-dialogue assembly — the step that turns an event/message log
  * into training conversations: per conversation, order the turns,
  * render each as `role: text`, and join them into one training
  * document (the chat-template stage of an instruction-tuning
  * pipeline, minus the model-specific special tokens).
  *
  * Scale shape: ONE groupBy on the conversation key. `collect_list`
  * here is per-conversation, not per-corpus — a conversation is
  * human-sized (the same bound that makes the reference's chat logs
  * fit a request), so the grouped state is bounded the way q77's
  * per-doc chunk list is. Ordering happens INSIDE the group via
  * `array_sort` on a (ts, id) struct — no corpus-wide window, no
  * driver collect. Output rows carry the md5 + lengths rather than
  * the full rendered text so audits stay metadata-sized; callers
  * wanting the text take `rendered` before the md5 projection.
  */
object Conversations {

  /** One row per conversation: turn count, rendered length, and the
    * md5 fingerprint of the rendered dialogue (`role: text` lines,
    * newline-joined, turns ordered by (ts, id)). */
  def assemble(msgs: DataFrame, convCol: String, tsCol: String,
      idCol: String, roleCol: String, textCol: String): DataFrame =
    msgs
      .select(col(convCol).as("conv_id"),
        struct(col(tsCol), col(idCol),
          concat(coalesce(col(roleCol), lit("")), lit(": "),
            coalesce(col(textCol), lit(""))).as("line")).as("turn"))
      .groupBy("conv_id")
      .agg(count(lit(1)).as("n_turns"),
        array_sort(collect_list(col("turn"))).as("turns"))
      .select(col("conv_id"), col("n_turns"),
        concat_ws("\n", transform(col("turns"), _.getField("line")))
          .as("rendered"))

  /** Fingerprint projection of [[assemble]] for oracle-sized output. */
  def assembleFingerprints(msgs: DataFrame, convCol: String, tsCol: String,
      idCol: String, roleCol: String, textCol: String): DataFrame =
    assemble(msgs, convCol, tsCol, idCol, roleCol, textCol)
      .select(col("conv_id"), col("n_turns"),
        length(col("rendered")).as("n_chars"),
        md5(col("rendered")).as("convo_md5"))
}
