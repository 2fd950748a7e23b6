package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SFT (instruction-tuning) data preparation: render ordered
  * conversation turns into a chat-template string and compute the
  * assistant loss-mask spans — the step between curated raw dialogs and
  * a token-level training shard. The mask is emitted as CHARACTER
  * offsets into the rendered string (1-based, inclusive), so a
  * downstream tokenizer with offset mapping can project it to token
  * masks without re-parsing the template.
  *
  * Template per turn: `<|role|>content<|end|>`; a conversation is its
  * turns concatenated in turn order with no joiner, so every offset is
  * a prefix-sum of piece lengths — no scan over the rendered string.
  *
  * Scale shape: one turn-indexing window per conversation (bounded by
  * turns-per-conversation, never corpus-wide), map-only piece
  * rendering, then one per-conversation aggregation whose ordered
  * string concat both engines support natively (sorted struct array /
  * string_agg ORDER BY). Everything is integer arithmetic + string
  * concat — bit-replayable.
  */
object SftPack {

  private val endTag = "<|end|>"

  /** Per-turn rendering with offsets: piece text, 1-based piece start,
    * and the content's [start, end] char span inside the conversation
    * render (the loss-mask span when the turn is an assistant turn). */
  def renderTurns(turns: DataFrame, convCol: Column, orderCol: Column,
                  tieCol: Column, roleCol: Column,
                  contentCol: Column): DataFrame = {
    val w = Window.partitionBy(col("conv")).orderBy(col("ord"), col("tie"))
    turns
      .select(convCol.as("conv"), orderCol.as("ord"), tieCol.as("tie"),
        roleCol.as("role"), contentCol.as("content"))
      .withColumn("piece",
        concat(lit("<|"), col("role"), lit("|>"), col("content"),
          lit(endTag)))
      .withColumn("plen", length(col("piece")).cast("long"))
      .withColumn("turn_idx", row_number().over(w))
      .withColumn("cum", sum(col("plen")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("piece_start", col("cum") - col("plen") + 1L)
      .withColumn("content_start",
        col("piece_start") + length(col("role")).cast("long") + 4L)
      .withColumn("content_end", col("cum") - lit(endTag.length.toLong))
      .drop("ord", "tie")
  }

  /** Per-conversation card: the full render, assistant loss-mask spans
    * in canonical `start-end;start-end` form, and mask-coverage stats.
    * `maskRole` marks which turns train (assistant, typically). */
  def conversationCards(rendered: DataFrame,
                        maskRole: String = "assistant"): DataFrame = {
    val isMask = col("role") === maskRole
    rendered
      .groupBy(col("conv"))
      .agg(
        count(lit(1)).as("n_turns"),
        sum(when(isMask, 1L).otherwise(0L)).as("n_mask_turns"),
        max(col("cum")).as("render_len"),
        sum(when(isMask, col("content_end") - col("content_start") + 1L)
          .otherwise(0L)).as("mask_chars"),
        concat_ws("", transform(
          sort_array(collect_list(struct(col("turn_idx"), col("piece")))),
          x => x.getField("piece"))).as("render"),
        concat_ws(";", transform(
          sort_array(collect_list(when(isMask,
            struct(col("turn_idx"), concat(col("content_start"), lit("-"),
              col("content_end")).as("sp"))))),
          x => x.getField("sp"))).as("mask_spans"))
      .select(col("conv"), col("n_turns"), col("n_mask_turns"),
        col("render_len"), col("mask_chars"),
        round(col("mask_chars").cast("double") /
          col("render_len").cast("double"), 4).as("mask_ratio"),
        md5(col("render")).as("render_md5"), col("mask_spans"))
  }

  /** Dialog-shape validation over [[renderTurns]] output — the gates
    * an SFT data pipeline runs BEFORE packing: strict role alternation
    * (consecutive same-role turns are merge candidates or logging
    * bugs), no empty turns, user-first, assistant-last. Per
    * conversation: violation counts + the conjunctive `valid` flag.
    * One ordered window pass (lag + row bounds) per conversation key;
    * map-side otherwise. */
  def dialogChecks(rendered: DataFrame): DataFrame = {
    // renderTurns already materialized the order as turn_idx (and
    // dropped ord/tie) — lag over it
    val w = Window.partitionBy(col("conv")).orderBy(col("turn_idx"))
    val byConv = Window.partitionBy(col("conv"))
    rendered
      .withColumn("prev_role", lag(col("role"), 1).over(w))
      .withColumn("nc", count(lit(1)).over(byConv))
      .groupBy(col("conv"))
      .agg(count(lit(1)).as("n_turns"),
        sum(when(col("role") === col("prev_role"), 1L).otherwise(0L))
          .as("n_role_violations"),
        sum(when(length(trim(col("content"))) === 0, 1L).otherwise(0L))
          .as("n_empty_turns"),
        max(when(col("turn_idx") === 1, col("role") === "user"))
          .as("starts_with_user"),
        max(when(col("turn_idx") === col("nc"), col("role") === "assistant"))
          .as("ends_with_assistant"))
      .withColumn("valid",
        col("n_role_violations") === 0 && col("n_empty_turns") === 0 &&
          col("starts_with_user") && col("ends_with_assistant"))
  }
}
