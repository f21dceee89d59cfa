package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Chat-template rendering for SFT corpora (beyond-parity): turn
  * ordered (conversation, turn, role, text) rows into the single
  * training string a fine-tune run consumes, PLUS the character
  * coordinates of every assistant response inside it — the loss
  * mask. Rendering without the mask coordinates is half an
  * operator: the trainer needs to know which token spans contribute
  * loss, and recovering them after the fact (by re-searching the
  * rendered string) breaks the moment a user turn quotes an
  * assistant turn.
  *
  * Segment layout per turn: `tag(role) + text + turnSep`,
  * concatenated in turn order. A turn's segment start is the
  * running sum of prior segment lengths (one window over the
  * conversation, ordered by the turn column); the assistant span is
  * `[start + len(tag), start + len(tag) + len(text))` — exactly the
  * response text, tags and separators carry no loss.
  *
  * Scale shape: one hash-partition by conversation does everything
  * — the offsets window, the in-row ordered assembly (same
  * collect_list + array_sort shape as [[Sequences.ordered]]; a
  * conversation is bounded, a corpus is not), and the span-to-text
  * join all share it, so the text shuffles once. Offsets are
  * integer arithmetic on lengths — engine-exact, which is how the
  * sft1 oracle can slice the same spans back out character-for-
  * character.
  */
object ChatFormat {

  /** Per-assistant-span rows: (conv, turn_rank, start_char,
    * end_char, span_text) with `span_text` SLICED FROM the rendered
    * conversation — the output self-verifies that the coordinates
    * land on the response text. Offsets are 0-based character
    * positions, end exclusive. (conv, orderCol) pairs must be
    * unique (same contract as [[Modes.scdHistory]]). */
  def assistantSpans(turns: DataFrame, convCol: String, orderCol: String,
      roleCol: String, textCol: String,
      userTag: String = "<|user|>\n", asstTag: String = "<|assistant|>\n",
      turnSep: String = "\n"): DataFrame = {
    val w = Window.partitionBy(convCol).orderBy(orderCol)
    val segged = turns
      .withColumn("__seg", segCol(roleCol, textCol, userTag, asstTag, turnSep))
      .withColumn("turn_rank", row_number().over(w).cast("long"))
      .withColumn("__start",
        coalesce(sum(length(col("__seg")))
          .over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val rendered = segged.groupBy(col(convCol))
      .agg(orderedConcat(orderCol).as("__full"))
    segged.filter(col(roleCol) === "assistant")
      .select(col(convCol), col("turn_rank"),
        (col("__start") + lit(tagLen(asstTag))).as("start_char"),
        (col("__start") + lit(tagLen(asstTag)) + length(col(textCol))).as("end_char"))
      .join(rendered, Seq(convCol))
      .withColumn("span_text",
        expr("substring(__full, start_char + 1, end_char - start_char)"))
      .drop("__full")
  }

  /** DPO-style preference pairs: per `promptCol` group of candidate
    * responses, emit the best- and worst-scored candidate with a
    * strict margin. Tiebreaks are deterministic — equal scores break
    * to the SMALLER id for chosen and the LARGER id for rejected —
    * and groups without a strict preference (margin 0, or a single
    * candidate) are dropped: a DPO pair with equal reward carries no
    * training signal.
    *
    * Scale shape: ONE map-side-combinable aggregate (max_by/min_by
    * over an ordering struct) — no window, no per-group sort; the
    * shuffle carries one pair of (id, score) structs per prompt. */
  def preferencePairs(cands: DataFrame, promptCol: String, idCol: String,
      scoreCol: Column): DataFrame = {
    val payload = struct(col(idCol).as("id"), scoreCol.as("s"))
    val ord = struct(scoreCol, negate(col(idCol)))
    cands.groupBy(col(promptCol)).agg(
      max_by(payload, ord).as("__c"),
      min_by(payload, ord).as("__r"))
      .select(col(promptCol),
        col("__c.id").as("chosen_id"), col("__c.s").as("chosen_score"),
        col("__r.id").as("rejected_id"), col("__r.s").as("rejected_score"),
        (col("__c.s") - col("__r.s")).as("margin"))
      .filter(col("margin") > 0)
  }

  /** Rendered conversation per group — the training string itself. */
  def render(turns: DataFrame, convCol: String, orderCol: String,
      roleCol: String, textCol: String,
      userTag: String = "<|user|>\n", asstTag: String = "<|assistant|>\n",
      turnSep: String = "\n"): DataFrame = {
    turns.withColumn("__seg", segCol(roleCol, textCol, userTag, asstTag, turnSep))
      .groupBy(col(convCol))
      .agg(orderedConcat(orderCol).as("text"),
        count(lit(1)).as("n_turns"))
  }

  // Codepoints, not UTF-16 units: offsets/substring are codepoint-based,
  // so a non-BMP char in the tag must count as 1 here too.
  private def tagLen(tag: String): Long = tag.codePointCount(0, tag.length).toLong

  // one tag+text+separator segment per turn — the single source of the
  // rendering layout for both render() and assistantSpans()
  private def segCol(roleCol: String, textCol: String, userTag: String,
      asstTag: String, turnSep: String): Column = {
    val tag = when(col(roleCol) === "assistant", lit(asstTag))
      .otherwise(lit(userTag))
    concat(tag, col(textCol), lit(turnSep))
  }

  // __seg segments concatenated in orderCol order within the group
  private def orderedConcat(orderCol: String): Column =
    concat_ws("", transform(
      array_sort(collect_list(struct(col(orderCol).as("o"), col("__seg").as("s")))),
      x => x("s")))
}
