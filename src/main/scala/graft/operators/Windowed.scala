package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window-function operators (SURVEY §2.5 beyond-reference W2-W4).
  *
  * The reference has no OVER clause anywhere (SURVEY §2.5 survey note);
  * these are the window building blocks its pipelines would need at
  * scale, re-expressed Spark-first. Every operator here costs exactly
  * ONE shuffle (the Window partitionBy exchange) and never self-joins:
  * at 100 TB the alternative formulations — latest-version via
  * groupBy+join-back, as-of via range join, sessions via
  * cross-timestamp joins — all add an extra shuffle or an O(n·m)
  * comparison, where a window is a single partition-local sorted pass.
  */
object Windowed {

  /** Latest-version-per-key dedup — the `row_number() = 1` idiom SURVEY
    * §2.5 names as the natural building block for Delta-less SCD2
    * (keep the newest row per business key). `tieBreak` makes the
    * survivor total-order deterministic when `orderCol` ties. */
  def keepLatest(df: DataFrame, keyCols: Seq[String], orderCol: Column,
      tieBreak: Seq[Column] = Nil): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(orderCol.desc +: tieBreak.map(_.desc): _*)
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
  }

  /** As-of join: for each left row, the single most recent right row of
    * the same key with `rightTs <= leftTs` (inclusive), or NULL.
    *
    * Implemented with the union+window pattern, not a range join: both
    * inputs are tagged and unioned, one window per key ordered by
    * (ts, side) carries the last-seen right payload forward
    * (`last(_, ignoreNulls)`), and left rows are kept. Cost is one
    * shuffle of |left|+|right| rows and a partition-local sort — no
    * per-key row explosion, no O(|left|·|right|) candidate pairs, which
    * is what a `l.ts >= r.ts` theta-join degenerates to before pruning.
    * Right rows at exactly `leftTs` sort BEFORE the left row (side
    * tag 0 < 1), giving the inclusive semantics of e.g. DuckDB's
    * native `ASOF JOIN`.
    *
    * `rightPayload` columns come back prefixed `asof_`; `tieBreak`
    * names RIGHT-frame columns that totalize the order of right rows
    * sharing (key, ts): the row with the GREATEST tieBreak values is
    * the deterministic survivor. The columns are carried through the
    * internal right projection under `_tb_i` aliases (left rows hold
    * NULL there, which never matters — left rows already sort after
    * every same-ts right row via the side tag), so they need not exist
    * on the left frame and never collide with its column names. */
  def asofJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTs: String, rightTs: String, rightPayload: Seq[String],
      tieBreak: Seq[String] = Nil): DataFrame = {
    val tbAliases = tieBreak.indices.map(i => s"_tb_$i")
    val l = left.withColumn("_ts", col(leftTs)).withColumn("_side", lit(1))
    val r = right.select(
      (keyCols.map(col) ++
        Seq(col(rightTs).as("_ts"), struct(rightPayload.map(col): _*).as("_payload")) ++
        tieBreak.zip(tbAliases).map { case (c, a) => col(c).as(a) }): _*)
      .withColumn("_side", lit(0))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    // Among right rows tied on (key, ts), ascending _tb_i order makes
    // `last(...)` pick the greatest-tieBreak row — a total order, so
    // the surviving payload is deterministic for any caller.
    val order = (col("_ts") +: col("_side") +: tbAliases.map(col)).map(_.asc)
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = unioned
      .withColumn("_asof", last(col("_payload"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
    val out = rightPayload.foldLeft(matched) { (df, c) =>
      df.withColumn(s"asof_$c", col(s"_asof.$c"))
    }
    out.drop(Seq("_ts", "_side", "_payload", "_asof") ++ tbAliases: _*)
  }

  /** Gap-based sessionization: rows of the same key whose `tsSecCol`
    * (epoch seconds, integer) gaps exceed `gapSec` start a new session;
    * `session_id` numbers sessions 1..n per key. Two chained window
    * functions over the SAME (partitionBy, orderBy) spec — Catalyst
    * plans them in one Window exchange, so the whole operator is a
    * single shuffle + one partition-local sort. All-integer arithmetic:
    * engine-independent, no float drift in the gap compare. */
  def sessionize(df: DataFrame, keyCols: Seq[String], tsSecCol: String,
      gapSec: Long, tieBreak: Seq[String] = Nil): DataFrame = {
    val order = (col(tsSecCol) +: tieBreak.map(col)).map(_.asc)
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(order: _*)
    val isNew = when(
      col(tsSecCol) - lag(col(tsSecCol), 1).over(w) > gapSec ||
        lag(col(tsSecCol), 1).over(w).isNull, 1L).otherwise(0L)
    df.withColumn("_new_session", isNew)
      .withColumn("session_id",
        sum(col("_new_session")).over(w.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
      .drop("_new_session")
  }

  /** Session-local first-order Markov transition matrix: for every
    * ordered pair of event types, how often does `from` immediately
    * precede `to` INSIDE one session, and what fraction of `from`'s
    * outgoing transitions does that represent — the behavioral-sequence
    * model behind next-event prediction and funnel diagnostics.
    *
    * Shuffle discipline: the `lead` runs over the SAME
    * (key, ts, tieBreak) window spec the [[sessionize]] pass uses — NOT
    * a (key, session_id)-partitioned window, which would hash-partition
    * on a different key and buy a second exchange. Cross-session pairs
    * are instead guarded out by comparing `lead(session_id)` with the
    * row's own: one exchange keyed on the session keys drives
    * sessionize + both leads. The (from, to) census is a hash agg onto
    * a |types|² frame — tiny by construction — and row totals broadcast
    * back (the a21 pattern; never an empty-`over()` window). `p` is the
    * single terminal double division of two exact counts. */
  def transitionMatrix(df: DataFrame, keyCols: Seq[String], tsSecCol: String,
      typeCol: String, gapSec: Long, tieBreak: Seq[String] = Nil): DataFrame = {
    val order = (col(tsSecCol) +: tieBreak.map(col)).map(_.asc)
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(order: _*)
    val trans = sessionize(df, keyCols, tsSecCol, gapSec, tieBreak)
      .withColumn("_next_type", lead(col(typeCol), 1).over(w))
      .withColumn("_next_sess", lead(col("session_id"), 1).over(w))
      .filter(col("_next_sess") === col("session_id"))
      .groupBy(col(typeCol).as("from_type"), col("_next_type").as("to_type"))
      .agg(count(lit(1)).as("n_trans"))
    val totals = trans.groupBy("from_type").agg(sum("n_trans").as("n_from"))
    trans.join(broadcast(totals), "from_type")
      .select(col("from_type"), col("to_type"), col("n_trans"), col("n_from"),
        (col("n_trans").cast("double") / col("n_from").cast("double")).as("p"))
  }

  /** Truncated EWMA (α = 1/2) over a trailing window of the last
    * `lookback` rows per key — the exponentially-weighted smoother for
    * event metrics. The recursion s = 0.5·s + 0.5·v runs as an explicit
    * LEFT FOLD over the frame's value list, which pins the accumulation
    * order — a plain windowed SUM of weighted terms would be partial-
    * merge-order-dependent in its low bits, and α = 1/2 keeps every
    * weight an exact power of two. Truncation bounds both the state and
    * the error (the dropped tail carries weight 2^−lookback ≈ 1e−6 at
    * 20). One exchange on the key; the fold is partition-local.
    * Engines that seed their fold from the list head instead of an
    * initial value reproduce it by prepending the 0 seed.
    *
    * Null policy (r8 advice): `valueCol` must be NON-NULL. collect_list
    * silently drops nulls, which would shrink the frame and silently pull
    * older rows' weights up — so instead of inheriting that surprise, a
    * null measurement raises in-plan (`raise_error` rides the collected
    * value, un-prunable). Callers with legitimately-null measurements
    * must coalesce/filter to an explicit policy BEFORE calling; the w13
    * oracle mirrors this contract by running over a non-null measure. */
  def ewma(df: DataFrame, keyCols: Seq[String], orderCols: Seq[String],
      valueCol: String, lookback: Int = 20): DataFrame = {
    require(lookback >= 1 && lookback <= 64, s"lookback=$lookback out of range")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(orderCols.map(col(_).asc): _*)
      .rowsBetween(-(lookback - 1), Window.currentRow)
    val guarded = when(col(valueCol).isNotNull, col(valueCol).cast("double"))
      .otherwise(expr("CAST(raise_error('ewma: null value in \\'" + valueCol +
        "\\' — coalesce or filter nulls to an explicit policy first') AS DOUBLE)"))
    df.withColumn("_vals", collect_list(guarded).over(w))
      .withColumn("ewma",
        aggregate(col("_vals"), lit(0.0), (acc, x) => acc * 0.5 + x * 0.5))
      .drop("_vals")
  }

  /** Rolling z-score anomaly detection over a trailing window of the
    * last `lookback` rows per key — the metric-drift / outlier flag an
    * ingestion pipeline runs over event streams.
    *
    * Engine-portability is the design constraint: `stddev` over doubles
    * is partial-merge-order-dependent, so instead the caller supplies
    * the measure as an exact INTEGER column (`valueIntCol`, e.g.
    * `round(value * 1000)` for 3-dp data) and the window computes only
    * integer sums (Σv, Σv²) — exact and order-independent — before one
    * fixed-shape double evaluation of mean/variance
    * (`(s2 − s1²/n)/(n−1)`, the textbook shortcut). Any engine
    * replaying the same formula over the same integers lands on the
    * same bits. All three window aggregates share ONE
    * (partitionBy, orderBy, frame) spec = one exchange + one
    * partition-local sort. `orderCols` must totalize the order.
    * Emits `z` (NULL until `minRows` fill the window, or when the
    * window is constant) and `is_anomaly` (|z| > threshold). */
  def rollingZscore(df: DataFrame, keyCols: Seq[String],
      orderCols: Seq[Column], valueIntCol: Column, lookback: Int = 20,
      minRows: Int = 5, threshold: Double = 2.5): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(orderCols: _*)
      .rowsBetween(-(lookback - 1), Window.currentRow)
    val n = count(lit(1)).over(w).cast("double")
    val s1 = sum(valueIntCol).over(w).cast("double")
    val s2 = sum(valueIntCol * valueIntCol).over(w).cast("double")
    val mean = s1 / n
    val variance = (s2 - s1 * s1 / n) / (n - lit(1.0))
    val std = sqrt(variance)
    val z = when(n >= minRows && std > 0,
      (valueIntCol.cast("double") - mean) / std)
    df.withColumn("z", z)
      .withColumn("is_anomaly", coalesce(abs(col("z")) > threshold, lit(false)))
  }
}
