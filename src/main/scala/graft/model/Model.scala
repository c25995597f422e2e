package graft.model

import java.sql.Timestamp

/** Core typed row models for the validation engine.
  *
  * The subject table mirrors `BASELINE.json` `input_hint`:
  * `transcripts(conv_id, turn_idx, role, text, tool, ts)`.
  *
  * The reference's unit of data is one nested software-metadata record
  * (reference `src/core/models.py:60-96`); here the unit is one conversation
  * (a group of `Turn` rows keyed by `conv_id`), with each schema field of the
  * record mapped to a column of the turn row (SURVEY.md §1.3).
  */
final case class Turn(
    conv_id: String,
    turn_idx: Int,
    role: String,
    text: String,
    tool: String,
    ts: Timestamp,
    part_id: Int
)

/** One violated rule on one turn. `message` byte-matches the reference's
  * f-string message formats (reference `src/core/verification.py:40,51,60,70,
  * 80,88,111,118,141,147`); `text` carries the original per-turn text
  * untouched — the byte-parity invariant of the north star.
  */
final case class Violation(
    conv_id: String,
    turn_idx: Int,
    part_id: Int,
    rule_id: String,
    field: String,
    message: String,
    text: String
)

/** Per-partition pass/fail verdict: `status = "valid"` iff zero issues,
  * mirroring reference `src/core/verification.py:239-245` (`as_dict`).
  */
final case class PartitionVerdict(
    part_id: Int,
    status: String,
    n_rows: Long,
    n_violations: Long,
    n_warnings: Long
)

/** One row of the single-pass wide column-stats aggregate (SURVEY.md §2.5). */
final case class ColStats(
    column: String,
    n: Long,
    null_rate: Double,
    n_distinct_approx: Long,
    min: String,
    max: String,
    q_tdigest: Seq[Double] // p50 / p90 / p99
)

/** Checkpoint-resume lineage record, one per validated partition
  * (SURVEY.md §7.1 M5).
  */
final case class ManifestEntry(
    run_id: String,
    part_id: Int,
    snapshot: String,
    status: String,
    n_rows: Long,
    n_violations: Long,
    wall_ms: Long
)

/** Conversations dimension for the referential-integrity check — the engine
  * analog of the reference's `@id -> node` entity index
  * (reference `src/core/models.py:282`).
  */
final case class Conversation(
    conv_id: String,
    channel: String,
    created_ts: Timestamp
)
