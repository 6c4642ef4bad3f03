package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Tables._

/** Round-10 time-series wave: banded dynamic-time-warping similarity
  * between entity demand curves — the elastic-alignment complement to
  * q_time_rolling_corr (Pearson punishes a 1-month lag between two
  * otherwise identical seasonal curves; DTW aligns through it).
  *
  * Scale notes:
  *  - The fact table collapses to (entity, month, count) with ONE
  *    map-side-combined aggregate; the series table is
  *    entity-cardinality-bounded with calendar-bounded arrays, so the
  *    pairwise stage operates on a table orders of magnitude smaller
  *    than the corpus — the same collapse-then-pair discipline as the
  *    governance audits.
  *  - The pair join is a broadcast self-join on the bounded series
  *    table (nation² pairs); per-pair cost is O(len·band) via the
  *    native dtw_band's rolling two-row DP, not O(len²).
  *  - Determinism: series arrays come from sort_array(collect_list)
  *    over unique months; z-normalization derives mean/std from EXACT
  *    integer Σx/Σx² (never a streaming double aggregate), so every
  *    array value — and the pure DP on top — is partition-invariant. */
object Analytics45 {

  /** Pairwise DTW distances between nations' z-normalized monthly
    * order-count series (all years): which markets move together even
    * when one lags. Output: every nation pair with raw and
    * length-normalized DTW; band = 3 months of warp. */
  private def qTimeDtw(s: SparkSession, d: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val cust = t(s, d, "customer")
      .select(col("c_custkey").as("ck"), col("c_nationkey").as("nat"))
    val mo = t(s, d, "orders")
      .select(col("o_custkey").as("ck"),
        (year(col("o_orderdate")) * 100 + month(col("o_orderdate")))
          .as("ym"))
      .join(cust.hint("shuffle_hash"), Seq("ck"))
      .groupBy(col("nat"), col("ym")).agg(count(lit(1)).as("cnt"))
    val ser = mo.groupBy(col("nat"))
      .agg(sort_array(collect_list(struct(col("ym"), col("cnt"))))
          .as("sc"),
        sum(col("cnt")).as("sx"), sum(col("cnt") * col("cnt")).as("sxx"),
        count(lit(1)).as("n"))
      .select(col("nat"), col("n"),
        expr("""transform(sc, p ->
            (cast(p.cnt as double) - sx / cast(n as double))
            / greatest(sqrt(cast(sxx as double) / cast(n as double)
                - (sx / cast(n as double)) * (sx / cast(n as double))),
              1e-9d))""").as("z"))
    val a = ser.select(col("nat").as("nat_a"), col("n").as("n_a"),
      col("z").as("za"))
    val b = ser.select(col("nat").as("nat_b"), col("n").as("n_b"),
      col("z").as("zb"))
    a.join(broadcast(b), col("nat_a") < col("nat_b"))
      .select(col("nat_a"), col("nat_b"), col("n_a"), col("n_b"),
        round(expr("dtw_band(za, zb, 3)"), 6).as("dtw"),
        round(expr("dtw_band(za, zb, 3)")
          / (dbl(col("n_a")) + dbl(col("n_b"))), 6).as("dtw_norm"))
      .orderBy(col("nat_a"), col("nat_b"))
  }

  val defs: Map[String, Relational.Q] = Map(
    "q_time_dtw" -> (qTimeDtw _),
  )

  /** DTW's banded DP is not SQL-expressible (declared per SURVEY §2.C
    * rule 4); DtwSpec pins the expression against hand-computed
    * fixtures, identity/symmetry properties, lag-alignment behavior,
    * and the query's partition-invariant determinism. */
  val sql: Map[String, String] = Map.empty
}
