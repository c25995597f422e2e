package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Transition-grammar validation: cross-row constraint checks over an
  * ordered sequence within a partition key — the conversation-STRUCTURE
  * analog of the reference's per-record field checks
  * (`/root/reference/src/core/verification.py` validates one record at a
  * time and simply cannot see "a tool turn must follow an assistant turn";
  * this operator family is what that rule set becomes on a 10¹²-turn
  * table).
  *
  * A [[Rule]] fires on a `(prev_state, state)` pair; `prev_state` is NULL
  * exactly at the sequence's first row, so first-row rules ("a
  * conversation must open with system/user", "a session must open with
  * signup") are ordinary rules over a null prev. Multiple rules may fire
  * on one row — each emits its own violation row, mirroring the
  * reference's multi-issue accumulation per record.
  *
  * Scale shape (same contract as [[Validator.tsOrderViolations]]): only
  * NARROW columns — partition key, order key(s), state — enter the window
  * exchange; payload text never shuffles. The plain variant windows on the
  * partition key; [[transitionViolationsSegmented]] is the row-identical
  * skew escape hatch for pathological hot keys (one conversation with
  * 10⁸ turns), range-splitting each key into bounded segments and
  * stitching boundary pairs through a per-segment first/last aggregate —
  * parallelism becomes #segments, not #keys.
  */
object Grammar {

  /** One grammar rule: `fires(prev_state, state)` over adjacent rows.
    * `prev` is NULL on the first row of each partition key's sequence.
    */
  final case class Rule(name: String, fires: (Column, Column) => Column)

  /** Conversation-transcript role grammar (the transcript-native rule set;
    * roles: system / user / assistant / tool):
    *  - FIRST_ROLE: a conversation opens with system or user;
    *  - SYSTEM_RESTART: system only ever opens (no mid-conversation system);
    *  - TOOL_CONTEXT: a tool result follows an assistant turn (or another
    *    tool result — parallel calls);
    *  - USER_ECHO: no two adjacent user turns.
    */
  val roleRules: Seq[Rule] = Seq(
    Rule("FIRST_ROLE", (prev, cur) =>
      prev.isNull && !cur.isin("system", "user")),
    Rule("SYSTEM_RESTART", (prev, cur) =>
      prev.isNotNull && cur === "system"),
    Rule("TOOL_CONTEXT", (prev, cur) =>
      cur === "tool" && (prev.isNull || !prev.isin("assistant", "tool"))),
    Rule("USER_ECHO", (prev, cur) => prev === "user" && cur === "user"))

  /** Event-session grammar over the events stream (types: signup / view /
    * click / purchase / error): a session opens with signup, signup never
    * repeats, and a purchase is primed by a view or click.
    */
  val sessionRules: Seq[Rule] = Seq(
    Rule("FIRST_EVENT", (prev, cur) => prev.isNull && cur =!= "signup"),
    Rule("REPEAT_SIGNUP", (prev, cur) => prev.isNotNull && cur === "signup"),
    Rule("UNPRIMED_PURCHASE", (prev, cur) =>
      cur === "purchase" && (prev.isNull || !prev.isin("click", "view"))))

  private def applyRules(
      paired: DataFrame, keep: Seq[String], rules: Seq[Rule]): DataFrame = {
    val out = keep.map(col) ++ Seq(
      col("__prev").as("prev_state"), col("__cur").as("state"))
    rules
      .map(r => paired
        .filter(r.fires(col("__prev"), col("__cur")))
        .select(out :+ lit(r.name).as("rule"): _*))
      .reduce(_.unionByName(_))
  }

  /** Plain variant: one window over `partCol` ordered by `orderCols`.
    * Emits one row per fired (row, rule): partCol, orderCols…, prev_state,
    * state, rule. `orderCols` should make the order total (ties only
    * between value-identical duplicate rows, which lag through to
    * identical pairs either way).
    */
  def transitionViolations(
      df: DataFrame,
      partCol: String,
      orderCols: Seq[String],
      stateCol: String,
      rules: Seq[Rule]): DataFrame = {
    val w = Window.partitionBy(partCol).orderBy(orderCols.map(col): _*)
    val paired = df
      .select((partCol +: orderCols).map(col) :+ col(stateCol).as("__cur"): _*)
      .withColumn("__prev", lag("__cur", 1).over(w))
    applyRules(paired, partCol +: orderCols, rules)
  }

  /** Skew-proof variant, row-identical to [[transitionViolations]] ordered
    * by a single numeric `orderCol` (spec-asserted): each key is
    * range-split into `segSize`-row segments (`seg = floor(order /
    * segSize)`), adjacent pairs resolve within segments, and each
    * segment's first row takes its `prev_state` from the nearest earlier
    * non-empty segment's last row via a tiny per-segment window —
    * the [[Validator.tsOrderViolationsSegmented]] stitch, applied to an
    * arbitrary rule set.
    */
  def transitionViolationsSegmented(
      df: DataFrame,
      partCol: String,
      orderCol: String,
      stateCol: String,
      rules: Seq[Rule],
      segSize: Int = 1 << 16): DataFrame = {
    val narrow = df
      .select(col(partCol), col(orderCol), col(stateCol).as("__cur"),
        floor(col(orderCol).cast("double") / segSize).as("__seg"))
    val wSeg = Window.partitionBy(partCol, "__seg").orderBy(orderCol)
    val inSeg = narrow
      .withColumn("__prev", lag("__cur", 1).over(wSeg))
      .filter(col("__prev").isNotNull)
    val segAgg = narrow
      .groupBy(col(partCol), col("__seg"))
      .agg(
        min(struct(col(orderCol), col("__cur"))).as("first"),
        max(struct(col(orderCol), col("__cur"))).as("last"))
    val wKey = Window.partitionBy(partCol).orderBy("__seg")
    val boundary = segAgg
      .select(col(partCol),
        col(s"first.$orderCol").as(orderCol),
        col("first.__cur").as("__cur"),
        lag("last.__cur", 1).over(wKey).as("__prev"))
    applyRules(
      inSeg.select(col(partCol), col(orderCol), col("__cur"), col("__prev"))
        .unionByName(boundary),
      Seq(partCol, orderCol), rules)
  }

  /** Corpus-wide transition matrix: how often each (prev_state, state)
    * adjacency occurs across all conversations — the descriptive
    * companion of [[transitionViolations]] (the rule set says what's
    * FORBIDDEN; the matrix shows what IS, and is where new rules come
    * from — a nonzero (assistant → assistant) cell at audit time is a
    * rule candidate). Each conversation's first row counts as a
    * (`<start>`, state) transition.
    *
    * Scale shape: the same narrow keyed window as the violation check
    * (payload never shuffles — only part/order/state columns enter the
    * window exchange), then one partial-combine count over (prev, cur) —
    * cardinality bounded by |states|², tiny by construction.
    */
  def transitionMatrix(
      df: DataFrame,
      partCol: String,
      orderCols: Seq[String],
      stateCol: String): DataFrame = {
    val w = Window.partitionBy(partCol).orderBy(orderCols.map(col): _*)
    df
      .select((partCol +: orderCols).map(col) :+ col(stateCol).as("__cur"): _*)
      .withColumn("__prev", lag("__cur", 1).over(w))
      .groupBy(
        coalesce(col("__prev"), lit("<start>")).as("prev_state"),
        col("__cur").as("state"))
      .agg(count(lit(1)).as("n"))
  }
}
