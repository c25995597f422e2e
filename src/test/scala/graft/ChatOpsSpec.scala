package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.ChatOps

class ChatOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(m: Int) = Timestamp.valueOf(f"2026-01-01 00:$m%02d:00")

  private val turns = Seq(
    (1L, ts(1), 10L, "user", "hello there"),
    (1L, ts(2), 11L, "assistant", "hi, how can I help?"),
    (1L, ts(3), 12L, "user", "run the tests"),
    (2L, ts(1), 20L, "user", "hello there"),
    (2L, ts(2), 21L, "assistant", "hi, how can I help?"),
    (2L, ts(3), 22L, "user", "different third turn"),
    (3L, ts(9), 30L, "system", null))

  test("renderConversations orders turns by (ts, tie) and renders " +
    "role-tagged lines; null text/role are safe") {
    val df = turns.toDF("conv", "ts", "eid", "role", "txt")
    val out = ChatOps
      .renderConversations(df, "conv", "ts", "eid", "role", "txt")
      .as[(Long, String, Long, Long)].collect().sortBy(_._1)
    assert(out(0)._2 ===
      "<|user|>hello there\n<|assistant|>hi, how can I help?\n" +
        "<|user|>run the tests")
    assert(out(0)._3 === 3L)
    assert(out(2)._2 === "<|system|>")
    assert(out(2)._4 === 2L, "10-char render estimates floor(10/4) tokens")
  }

  test("convSizeAudit measures a planted mega-conversation up front: " +
    "oversized convs and their turn mass are counted in one row") {
    val mega = (0 until 500).map(i =>
      (99L, ts(1), 1000L + i, "user", s"turn $i"))
    val df = (turns ++ mega).toDF("conv", "ts", "eid", "role", "txt")
    val Seq((nc, mx, nOver, nTurns)) =
      ChatOps.convSizeAudit(df, "conv", maxTurns = 100L)
        .as[(Long, Long, Long, Long)].collect().toSeq
    assert(nc === 4L, "three normal convs + the mega one")
    assert(mx === 500L)
    assert(nOver === 1L && nTurns === 500L,
      "exactly the mega-conversation is flagged with its turn count")
    // clean input: zero oversized
    val Seq((_, mx2, z1, z2)) =
      ChatOps.convSizeAudit(turns.toDF("conv", "ts", "eid", "role", "txt"),
        "conv", maxTurns = 100L).as[(Long, Long, Long, Long)].collect().toSeq
    assert(mx2 === 3L && z1 === 0L && z2 === 0L)
  }

  test("render order is deterministic under repartitioning even with " +
    "tied timestamps (tie column breaks them)") {
    val tied = Seq(
      (1L, ts(5), 2L, "b", "second"), (1L, ts(5), 1L, "a", "first"))
      .toDF("conv", "ts", "eid", "role", "txt")
    val a = ChatOps
      .renderConversations(tied, "conv", "ts", "eid", "role", "txt")
      .as[(Long, String, Long, Long)].head()
    val b = ChatOps
      .renderConversations(tied.repartition(5), "conv", "ts", "eid", "role",
        "txt")
      .as[(Long, String, Long, Long)].head()
    assert(a === b)
    assert(a._2 === "<|a|>first\n<|b|>second")
  }

  test("messagesJson emits valid, order-preserving JSON that round-trips " +
    "through from_json, with quotes/backslashes/newlines escaped") {
    val tricky = Seq(
      (1L, ts(1), 1L, "user", "say \"hi\" with a \\ and\nnewline\ttab"),
      (1L, ts(2), 2L, "assistant", "{\"k\": 1}"))
      .toDF("conv", "ts", "eid", "role", "txt")
    val out = ChatOps
      .messagesJson(tricky, "conv", "ts", "eid", "role", "txt")
    val json = out.select(col("messages_json")).as[String].head()
    val parsed = out.select(from_json(col("messages_json"),
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("role",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("content",
            org.apache.spark.sql.types.StringType))))).as("a"))
      .select(explode(col("a")).as("m"))
      .select(col("m.role"), col("m.content"))
      .as[(String, String)].collect()
    assert(parsed.toSeq === Seq(
      ("user", "say \"hi\" with a \\ and\nnewline\ttab"),
      ("assistant", "{\"k\": 1}")))
    assert(json.startsWith("[{\"role\":\"user\",\"content\":\"say \\\"hi\\\""))
  }

  test("prefixDedup groups conversations sharing their first k turns and " +
    "keeps the lowest conv id") {
    val df = turns.toDF("conv", "ts", "eid", "role", "txt")
    val byK2 = ChatOps
      .prefixDedup(df, "conv", "ts", "eid", "role", "txt", k = 2)
      .as[(String, Long, Long, Long)].collect()
    // convs 1 and 2 share their first two turns; conv 3 is alone
    assert(byK2.length === 2)
    val shared = byK2.find(_._3 === 2L).get
    assert(shared._2 === 1L, "keeper is min conv id")
    assert(shared._4 === 6L, "total turns across the cluster")
    val byK3 = ChatOps
      .prefixDedup(df, "conv", "ts", "eid", "role", "txt", k = 3)
      .as[(String, Long, Long, Long)].collect()
    assert(byK3.length === 3, "k=3 separates the diverging third turn")
  }

  test("dedupTurns drops exactly the (role, text) contents recurring in " +
    "≥ ⌈frac·convs⌉ distinct conversations; within-conv repeats don't " +
    "count twice; null role/text are hashable") {
    val df = turns.toDF("conv", "ts", "eid", "role", "txt")
    // 3 distinct convs; frac 0.6 → threshold ceil(1.8)=2 distinct convs.
    // "hello there" and "hi, how can I help?" appear in convs 1 AND 2 →
    // drop; every other turn (incl. conv 3's null text) appears in one
    // conv only → keep.
    val kept = ChatOps.dedupTurns(df, "conv", "role", "txt", 0.6)
      .select("eid").as[Long].collect().toSet
    assert(kept === Set(12L, 22L, 30L))

    // a turn REPEATED inside one conversation is one distinct conv, not
    // two: it must survive the same threshold
    val rep = (df.union(Seq((1L, ts(4), 13L, "user", "run the tests"))
      .toDF("conv", "ts", "eid", "role", "txt")))
    val kept2 = ChatOps.dedupTurns(rep, "conv", "role", "txt", 0.6)
      .select("eid").as[Long].collect().toSet
    assert(kept2 === Set(12L, 13L, 22L, 30L))

    // frac above every content's share keeps everything
    val all = ChatOps.dedupTurns(df, "conv", "role", "txt", 1.0)
      .select("eid").as[Long].collect().toSet
    assert(all.size === turns.size)

    // threshold floor: on a tiny corpus (< 1/frac distinct convs) the
    // ceil() threshold degenerates to 1, which without a floor drops EVERY
    // turn (each occurs in ≥1 conversation — its own). A turn seen only in
    // its own conversation is never boilerplate: the floor of 2 keeps the
    // single-conversation corpus intact at any fraction.
    val solo = df.filter($"conv" === 1L)
    val keptSolo = ChatOps.dedupTurns(solo, "conv", "role", "txt", 0.3)
      .select("eid").as[Long].collect().toSet
    assert(keptSolo === solo.select("eid").as[Long].collect().toSet,
      "single-conversation corpus must survive dedupTurns whole")
  }

  test("interArrival: hand-computed gaps land in their power-of-two " +
    "buckets; first turns contribute no gap; boundary values stay in " +
    "their own bucket") {
    def t(ms: Long) = new Timestamp(ms)
    val df = Seq(
      (1L, t(0), 1L), (1L, t(1), 2L),      // gap 1 → bucket 1
      (1L, t(3), 3L),                       // gap 2 → bucket 2
      (1L, t(1027), 4L),                    // gap 1024 → bucket 1024
      (2L, t(500), 5L), (2L, t(1525), 6L),  // gap 1025 → bucket 2048
      (3L, t(9), 7L)                        // single turn: no gaps
    ).toDF("conv", "ts", "eid")
    val r = ChatOps.interArrival(df, "conv", "ts", "eid")
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(x => x._1 -> x).toMap
    assert(r === Map(
      1L -> ((1L, 1L, 1L, 1L, 1L)),
      2L -> ((2L, 1L, 2L, 2L, 2L)),
      1024L -> ((1024L, 1L, 1024L, 1024L, 1024L)),
      2048L -> ((2048L, 1L, 1025L, 1025L, 1025L))))
  }

  test("sftCorpus composes boilerplate-turn dedup, prefix dedup, and JSON " +
    "rendering: branches collapse to the keeper, boilerplate turns vanish " +
    "from the rendered output") {
    val df = turns.toDF("conv", "ts", "eid", "role", "txt")
    // boilerFrac 0.6: the two turns shared by convs 1+2 drop FIRST; the
    // surviving convs then all have distinct (shorter) prefixes, so all
    // three render
    val out = ChatOps
      .sftCorpus(df, "conv", "ts", "eid", "role", "txt", 0.6, 2)
      .as[(Long, String, Long)].collect().map(r => r._1 -> r).toMap
    assert(out.keySet === Set(1L, 2L, 3L))
    assert(out(1L)._3 === 1L, "only the non-boilerplate turn remains")
    assert(out(1L)._2.contains("run the tests"))
    assert(!out(1L)._2.contains("hello there"), "boilerplate dropped")

    // boilerFrac 1.0 keeps all turns → convs 1 and 2 share their 2-turn
    // prefix and collapse to keeper conv 1
    val collapsed = ChatOps
      .sftCorpus(df, "conv", "ts", "eid", "role", "txt", 1.0, 2)
      .as[(Long, String, Long)].collect().map(r => r._1 -> r).toMap
    assert(collapsed.keySet === Set(1L, 3L))
    assert(collapsed(1L)._3 === 3L)
    assert(collapsed(1L)._2.startsWith("[{\"role\":\"user\""))
  }

  test("echoSignals: verbatim echo scores 10^6, unrelated turns score low, " +
    "first turns absent, threshold flags only the echo") {
    import graft.ops.ChatOps
    val turns = Seq(
      ("c1", 0, "user", "please list the three largest tables in the db"),
      ("c1", 1, "assistant",
        "please list the three largest tables in the db"), // verbatim echo
      ("c1", 2, "user", "completely different next question about indexes"),
      ("c2", 0, "user", "alpha beta gamma delta epsilon zeta eta theta"),
      ("c2", 1, "assistant", "totally unrelated reply words nothing shared"))
      .toDF("conv_id", "turn_idx", "role", "text")
    val got = ChatOps.echoSignals(turns, "conv_id", "turn_idx", "role", "text")
      .select("conv_id", "turn_idx", "echo_ppm", "is_echo")
      .as[(String, Int, Long, Boolean)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(got.size === 3, "first turn of each conversation is absent")
    assert(got(("c1", 1)) === ((1000000L, true)), "verbatim echo = 10^6")
    assert(!got(("c1", 2))._2 && !got(("c2", 1))._2, "no false echoes")
    assert(got(("c1", 2))._1 < 600000L)
  }

  test("echoSignals: echo_ppm is an exact multiple of 10^6/k and invariant " +
    "under repartitioning") {
    import graft.ops.ChatOps
    val turns = graft.sources.TranscriptGen.transcripts(spark,
      graft.sources.TranscriptGen.Config(nConvs = 120L))
    val a = ChatOps.echoSignals(turns, "conv_id", "turn_idx", "role", "text")
      .select("conv_id", "turn_idx", "echo_ppm")
      .as[(String, Int, Long)].collect().toSet
    assert(a.nonEmpty)
    assert(a.forall(_._3 % 62500L == 0), "k=16 grid")
    val b = ChatOps.echoSignals(turns.repartition(13), "conv_id", "turn_idx",
        "role", "text")
      .select("conv_id", "turn_idx", "echo_ppm")
      .as[(String, Int, Long)].collect().toSet
    assert(a === b)
  }
}
