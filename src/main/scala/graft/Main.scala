package graft

import org.apache.spark.SparkConf
import org.apache.spark.sql.SparkSession

import graft.engine.{Runner, Validator}

/** spark-submit entrypoint for the validation engine (the north rule's
  * "launched by spark-submit on a multi-executor cluster" surface):
  *
  * {{{
  * spark-submit --class graft.Main --master <cluster> graft.jar \
  *   --input  /data/transcripts \
  *   --conversations /data/conversations \
  *   --out    /runs/2026-08-16 \
  *   --run-id nightly [--mode audit|strict] [--no-resume]
 *   [--tool-args /data/toolcalls] [--temporal]
  * }}}
  *
  * Master/executor topology comes entirely from spark-submit (no `.master()`
  * override here — a bare JVM launch falls back to `local[*]`). Audit mode
  * runs the full checkpoint-resumable [[Runner]] (violations + verdicts +
  * manifest sinks, per-partition lineage); strict mode aborts on the
  * deterministic first violation with exit code 2, the reference's
  * HTTP-400 analog (`api.py:85-89`); corpus mode runs the
  * [[graft.ops.CorpusPipeline]] construction funnel over a documents table
  * (`--input` docs, optional `--bench` eval set) and writes the surviving
  * corpus split-partitioned under `--out` plus a per-stage funnel report;
  * sft mode runs [[graft.ops.ChatOps.sftCorpus]] over a transcript table
  * (conv_id, turn_idx, role, text, ts) and writes JSONL-ready messages
  * rows under `--out`, gated by a conversation-size audit
  * ([[graft.ops.ChatOps.convSizeAudit]]): conversations over `--max-turns`
  * (default 100000) are counted, reported, and excluded up front instead
  * of OOMing the per-conversation assembly tasks.
  */
object Main {

  private case class Opts(
      input: String = "",
      conversations: Option[String] = None,
      bench: Option[String] = None,
      toolArgs: Option[String] = None,
      temporal: Boolean = false,
      out: String = "",
      runId: String = "run",
      mode: String = "audit",
      resume: Boolean = true,
      maxTurns: Long = 100000L)

  private def parse(args: List[String], o: Opts = Opts()): Opts = args match {
    case "--input" :: v :: rest         => parse(rest, o.copy(input = v))
    case "--conversations" :: v :: rest => parse(rest, o.copy(conversations = Some(v)))
    case "--bench" :: v :: rest         => parse(rest, o.copy(bench = Some(v)))
    case "--tool-args" :: v :: rest     => parse(rest, o.copy(toolArgs = Some(v)))
    case "--temporal" :: rest           => parse(rest, o.copy(temporal = true))
    case "--out" :: v :: rest           => parse(rest, o.copy(out = v))
    case "--run-id" :: v :: rest        => parse(rest, o.copy(runId = v))
    case "--mode" :: v :: rest          => parse(rest, o.copy(mode = v))
    case "--no-resume" :: rest          => parse(rest, o.copy(resume = false))
    case "--max-turns" :: v :: rest     => parse(rest, o.copy(maxTurns = v.toLong))
    case Nil                            => o
    case other :: _ =>
      throw new IllegalArgumentException(s"unknown argument: $other")
  }

  def main(args: Array[String]): Unit = {
    val o = parse(args.toList)
    require(o.input.nonEmpty, "--input is required")
    require(Set("audit", "strict", "corpus", "sft").contains(o.mode),
      s"--mode must be audit, strict, corpus, or sft, got ${o.mode}")
    // fail fast, never silently skip a check the user opted into
    require(!o.temporal || o.conversations.nonEmpty,
      "--temporal requires --conversations (the parent table carrying created_ts)")
    // the deep-check sinks only run in the audit branch — reject the flags
    // anywhere else rather than parse-and-ignore them
    require(o.toolArgs.isEmpty && !o.temporal || o.mode == "audit",
      s"--tool-args/--temporal run only in audit mode, got --mode ${o.mode}")
    if (o.mode != "strict") require(o.out.nonEmpty, s"--out is required in ${o.mode} mode")

    val builder = SparkSession.builder()
      .appName("graft-validate")
      .config("spark.sql.session.timeZone", "UTC")
    // spark-submit supplies the master; bare JVM launches fall back local.
    // Stop the session on exit only if this main created it (embedded
    // callers — tests, notebooks — keep theirs).
    val preExisting = SparkSession.getDefaultSession.isDefined
    val spark =
      if (new SparkConf().contains("spark.master")) builder.getOrCreate()
      else builder.master("local[*]").getOrCreate()
    try {
      if (o.mode == "corpus") {
        // corpus-construction funnel over a documents table
        // (doc_id, text, source[, …]); --bench points at the eval set to
        // decontaminate against (defaults to the input itself sampled 1/50,
        // which keeps the smoke path self-contained)
        import org.apache.spark.sql.functions.col
        val docs = spark.read.parquet(o.input)
        val bench = o.bench.map(spark.read.parquet(_))
          .getOrElse(docs.filter(col("doc_id") % 50 === 0))
        // managed caches: closing the handle drops only THIS invocation's
        // persisted intermediates — safe if an embedding caller runs other
        // pipelines in the same session concurrently
        val (annotated, caches) = graft.ops.CorpusPipeline
          .annotateManaged(docs, bench, "text", "doc_id", "source")
        // two actions consume the annotated DAG (corpus write + funnel
        // report) and it contains the minhash-LSH + connected-components
        // stages — persist so the expensive funnel runs once, not twice
        val ann = annotated
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        ann.filter(col("drop_stage").isNull).drop("drop_stage")
          .write.mode("overwrite").partitionBy("split")
          .parquet(s"${o.out}/corpus")
        val funnel = graft.ops.CorpusPipeline.funnel(ann)
          .orderBy("stage").collect()
        ann.unpersist()
        caches.close()
        funnel.foreach(r => System.err.println(s"FUNNEL ${r.mkString("\t")}"))
        val kept = funnel.filter(_.getString(0).startsWith("kept:"))
          .map(_.getLong(1)).sum
        println(s"""{"status":"done","mode":"corpus","kept":$kept,""" +
          s""""total":${funnel.map(_.getLong(1)).sum}}""")
        return // finally handles spark.stop()
      }
      if (o.mode == "sft") {
        // transcript → SFT export: boilerplate-turn dedup, shared-prefix
        // collapse, JSONL messages rendering — one text file row per
        // surviving conversation (the downstream trainer's input format)
        import org.apache.spark.sql.functions.{col, count, lit}
        val turns = spark.read.parquet(o.input)
        // group-size gate BEFORE the whole-conversation assembly: the
        // render ops materialize one conversation per task, so an
        // adversarial mega-conversation must be counted and excluded up
        // front (ChatOps.convSizeAudit), not discovered as an executor
        // OOM mid-assembly; --max-turns sets the bound (default 100k)
        val Seq((nConvsIn, maxSeen, nOver, turnsOver)) = graft.ops.ChatOps
          .convSizeAudit(turns, "conv_id", o.maxTurns)
          .collect().toSeq
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        val kept =
          if (nOver == 0) turns
          else {
            System.err.println(s"CONV AUDIT: dropping $nOver oversized " +
              s"conversations ($turnsOver turns > ${o.maxTurns}/conv; " +
              s"max seen $maxSeen)")
            val over = turns.groupBy(col("conv_id"))
              .agg(count(lit(1)).as("__n"))
              .filter(col("__n") > o.maxTurns).select("conv_id")
            turns.join(over, Seq("conv_id"), "left_anti")
          }
        val out = graft.ops.ChatOps.sftCorpus(
            kept, "conv_id", "ts", "turn_idx", "role", "text")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        out.select("messages_json")
          .write.mode("overwrite").text(s"${o.out}/sft")
        val n = out.count() // served from the persisted frame
        out.unpersist()
        println(s"""{"status":"done","mode":"sft","conversations":$n,""" +
          s""""convs_in":$nConvsIn,"max_turns_seen":$maxSeen,""" +
          s""""oversized_convs_dropped":$nOver}""")
        return // finally handles spark.stop()
      }
      val turns = spark.read.parquet(o.input)
      val convs = o.conversations.map(spark.read.parquet(_))
      o.mode match {
        case "strict" =>
          try Validator.validateStrict(turns, convs)
          catch {
            case e: IllegalStateException =>
              System.err.println(s"STRICT VALIDATION FAILED: ${e.getMessage}")
              if (!preExisting) spark.stop()
              sys.exit(2)
          }
          println("""{"status":"valid","mode":"strict"}""")
        case _ =>
          val r = Runner.run(spark, turns, convs, o.out, o.runId,
            resume = o.resume)
          val nViol = r.verdicts
            .agg(org.apache.spark.sql.functions.sum("n_violations"))
            .collect()(0).getLong(0)
          // opt-in deep checks, each to its own sink (default paths/goldens
          // untouched): --tool-args validates nested JSON payloads against
          // the tool-arg schema catalog; --temporal flags turns whose ts
          // precedes their conversation's created_ts
          val nToolViol = o.toolArgs.map { p =>
            val v = graft.checks.ToolArgs.violations(
              spark.read.parquet(p), "tool", "args",
              Seq("conv_id", "turn_idx"))
            v.write.mode("overwrite").parquet(s"${o.out}/tool_violations")
            spark.read.parquet(s"${o.out}/tool_violations").count()
          }
          val nTemporal = convs.filter(_ => o.temporal).map { c =>
            val v = Validator.temporalViolations(turns, c, "conv_id", "ts",
              "created_ts", idCols = Seq("conv_id", "turn_idx"))
            v.write.mode("overwrite").parquet(s"${o.out}/temporal_violations")
            spark.read.parquet(s"${o.out}/temporal_violations").count()
          }
          val extras = nToolViol.map(n => s""","n_tool_violations":$n""")
            .getOrElse("") +
            nTemporal.map(n => s""","n_temporal_violations":$n""")
              .getOrElse("")
          println(
            s"""{"status":"done","mode":"audit","run_id":"${o.runId}",""" +
              s""""validated_parts":${r.validatedParts},""" +
              s""""skipped_parts":${r.skippedParts},"n_violations":$nViol""" +
              extras + "}")
      }
    } finally if (!preExisting) spark.stop()
  }
}
