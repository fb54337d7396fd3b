package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/**
 * As-of (point-in-time) join: for every left "probe" row, attach the
 * single right "state" row with the same key whose timestamp is the
 * latest at-or-before the probe's (backward, the default), or the
 * earliest at-or-after it (forward). LEFT-OUTER semantics: a probe with
 * no qualifying state keeps null state columns. This is the standard
 * feature-store / training-pipeline primitive ("the user's attributes
 * as of the example's event time") that plain equi/range joins can't
 * express without an explosion; the reference has no such operator
 * (SURVEY §2 J7 — its `warc_ts` is payload only), so this extends the
 * engine the way a web-scale corpus needs.
 *
 * Spark-first plan — UNION-AND-WINDOW, not a range join:
 *  1. tag probes and states, union them on a common schema
 *     (state payload nulled on probe rows and vice versa);
 *  2. one window `partitionBy(keys).orderBy(ts, side)` running
 *     `last(state_struct, ignoreNulls = true)` over
 *     [unboundedPreceding, currentRow] — each probe row picks up the
 *     most recent state struct that sorted at-or-before it;
 *  3. keep probe rows, project the struct fields out.
 *
 * Scale: ONE shuffle (hash on keys) + one in-partition sort — the same
 * cost as any keyed aggregation — versus a naive
 * `l.ts >= r.ts` range join whose intermediate is |probes| × |states|
 * per key. State rows ride the shuffle once regardless of probe count.
 * Skew bound: one key's full history must sort within one task — at
 * 100 TB that is the per-key volume (fine for user/entity keys; a
 * single global key would need time-bucketed pre-splitting, which
 * changes semantics at bucket edges and is deliberately not hidden
 * inside this operator).
 *
 * Tie semantics: with `strict = false` (inclusive, DuckDB
 * `ASOF JOIN ... ON l.ts >= r.ts`), a state AT the probe's exact
 * timestamp applies — the state sorts before the probe via the side
 * tag. With `strict = true` the probe sorts first, so only strictly
 * earlier (later, when forward) states apply. A whole state row whose
 * value columns are all null is still a match (the struct wrapper is
 * non-null on every state row — `last(ignoreNulls)` skips PROBE rows,
 * never a real state with null fields, matching SQL ASOF exactly).
 *
 * Preconditions: `leftTs`/`rightTs` must have identical types (no
 * implicit casts under ANSI); `valueCols` must not collide with left
 * columns (alias on the right beforehand — e.g. expose the matched
 * state time by duplicating it under a new name). Null-ts probes match
 * nothing; null-ts states are dropped. For a deterministic result the
 * right side should be unique per (keys, ts) — among exact-timestamp
 * duplicates the surviving state is otherwise unspecified (same as SQL
 * ASOF).
 */
object AsofJoin {
  private val TsCol = "__asof_ts"
  private val SideCol = "__asof_side"
  private val StateCol = "__asof_state"

  def apply(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      valueCols: Seq[String],
      strict: Boolean = false,
      forward: Boolean = false): DataFrame = {
    require(keys.nonEmpty, "as-of join needs at least one key column")
    require(valueCols.nonEmpty, "as-of join needs at least one state column to attach")
    val lSchema = left.schema
    val rSchema = right.schema
    val lTsType = lSchema(leftTs).dataType
    val rTsType = rSchema(rightTs).dataType
    require(lTsType == rTsType,
      s"as-of timestamps must have identical types (ANSI: no implicit casts); " +
        s"got $leftTs: ${lTsType.sql} vs $rightTs: ${rTsType.sql}")
    val clash = valueCols.toSet.intersect(left.columns.toSet)
    require(clash.isEmpty, s"state columns collide with left columns: ${clash.mkString(", ")}")
    val missing = valueCols.filterNot(right.columns.contains)
    require(missing.isEmpty, s"state columns absent from right: ${missing.mkString(", ")}")

    val leftPayload = left.columns.filterNot(keys.contains).toSeq
    val stateType = StructType(valueCols.map(c => rSchema(c)))
    // inclusive: state sorts before an equal-ts probe (so it applies);
    // strict: probe first (so it doesn't)
    val probeTag = if (strict) 0 else 1

    val probes = left.select(
      keys.map(col) ++ Seq(
        col(leftTs).as(TsCol),
        lit(probeTag).as(SideCol),
        lit(null).cast(stateType).as(StateCol)) ++
        leftPayload.map(col): _*)
    val states = right
      .where(col(rightTs).isNotNull)
      .select(
        keys.map(col) ++ Seq(
          col(rightTs).as(TsCol),
          lit(1 - probeTag).as(SideCol),
          struct(valueCols.map(col): _*).as(StateCol)) ++
          leftPayload.map(c => lit(null).cast(lSchema(c).dataType).as(c)): _*)

    // null-ts probes must sort where no state precedes them in either
    // direction (backward asc: nulls first; forward desc: nulls FIRST,
    // overriding Spark's desc default of nulls-last)
    val tsOrder = if (forward) col(TsCol).desc_nulls_first else col(TsCol).asc_nulls_first
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(tsOrder, col(SideCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    probes.unionByName(states)
      .withColumn(StateCol, last(col(StateCol), ignoreNulls = true).over(w))
      .where(col(SideCol) === probeTag)
      .select(keys.map(col) ++ leftPayload.map(col) ++
        valueCols.map(c => col(StateCol).getField(c).as(c)): _*)
  }
}
