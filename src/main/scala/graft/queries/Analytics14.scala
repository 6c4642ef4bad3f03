package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Tables._

/** Round-7 fourteenth wave: Spearman rank correlation (the monotone
  * sibling of q_agg_corr's Pearson), one-way ANOVA (the k-group
  * generalization of q_agg_ttest), and a nearest-event join — the
  * bidirectional counterpart of q_join_asof, done as one windowed pass
  * with zero joins.
  *
  * Scale notes:
  *  - Spearman never sorts the raw fact stream: values sit on exact
  *    decimal lattices, so the fact scan collapses (one map-side-
  *    combined shuffle) to the bounded (g, x, y) count grid, and the
  *    doubled tie-averaged rank (2·avg-rank = 2·count_less +
  *    count_eq + 1) of each lattice value comes from a cumulative sum
  *    over the tiny marginal tables. Ranks stay EXACT — the grid is a
  *    lossless regrouping — and all five moment sums run in
  *    DECIMAL(38,0), order-free and engine-portable. The former
  *    exact-per-row-rank variant sorted the full stream at
  *    parallelism = |groups| = 3 (the VERDICT r7 scale-concentrator).
  *  - ANOVA collapses the scan to k=3 per-group exact decimal moment
  *    rows in one shuffle; the only double arithmetic is the final
  *    3-term F assembly, routed through the round-9dp/DECIMAL-sum
  *    trick (Analytics9 discipline) so summation order can't flip a
  *    bit.
  *  - Nearest-join: the naive shape is signup⋈click per user with an
  *    abs-delta argmin (a per-user quadratic blowup); this runs ONE
  *    user-keyed sort and takes the preceding/following click from
  *    frame-bounded IGNORE NULLS window picks — linear, join-free,
  *    and the same plan shape survives any user fan-out because the
  *    window never materializes a pair list. */
object Analytics14 {

  /** Spearman rank correlation between l_quantity and l_extendedprice
    * per return flag: tie-averaged ranks in doubled-integer space,
    * Pearson assembled from exact DECIMAL(38,0) moment sums.
    *
    * Rank algebra over the BOUNDED lattice count grid (the
    * q_agg_mannwhitney discipline): both columns sit on exact decimal
    * lattices, so the doubled tie-averaged rank of a value is
    * 2·count_less + count_eq + 1 — computable from the (g, value)
    * count table's cumulative sum. The fact stream pays ONE map-side-
    * combined shuffle to the joint (g, x, y) grid; every window and
    * join after that runs over bounded lattice tables, so no task ever
    * sorts the raw fact stream at parallelism = |groups|. Ranks are
    * EXACT (not approximate): the grid is a lossless regrouping. */
  private def qAggSpearman(s: SparkSession, d: String): DataFrame = {
    val pairs = t(s, d, "lineitem")
      .select(col("l_returnflag").as("g"),
        col("l_quantity").as("x"), col("l_extendedprice").as("y"))
      .groupBy(col("g"), col("x"), col("y")).agg(count(lit(1)).as("cnt"))
    // (g, value) → doubled tie-averaged rank, from the marginal counts
    def dranks(v: String, out: String): DataFrame = {
      val m = pairs.groupBy(col("g"), col(v)).agg(sum(col("cnt")).as("c"))
      val wCum = Window.partitionBy(col("g")).orderBy(col(v))
        .rowsBetween(Window.unboundedPreceding, -1)
      m.withColumn("cum", coalesce(sum(col("c")).over(wCum), lit(0L)))
        .select(col("g"), col(v),
          (lit(2L) * col("cum") + col("c") + lit(1L))
            .cast("decimal(38,0)").as(out))
    }
    val joint = pairs
      .join(dranks("x", "drx"), Seq("g", "x"))
      .join(dranks("y", "dry"), Seq("g", "y"))
      .select(col("g"), col("cnt").cast("decimal(38,0)").as("c"),
        col("drx"), col("dry"))
    joint.groupBy(col("g"))
      .agg(sum(col("c")).as("n"),
        sum(col("c") * col("drx")).as("sx"),
        sum(col("c") * col("dry")).as("sy"),
        sum(col("c") * col("drx") * col("dry")).as("sxy"),
        sum(col("c") * col("drx") * col("drx")).as("sxx"),
        sum(col("c") * col("dry") * col("dry")).as("syy"))
      .withColumn("dxx", dbl(col("n") * col("sxx") - col("sx") * col("sx")))
      .withColumn("dyy", dbl(col("n") * col("syy") - col("sy") * col("sy")))
      .select(col("g").as("l_returnflag"), col("n").cast("long").as("n"),
        // constant column ⇒ zero variance of ranks ⇒ rho undefined
        // (NULL, not an ANSI divide-by-zero)
        when(col("dxx") > 0 && col("dyy") > 0,
          round(dbl(col("n") * col("sxy") - col("sx") * col("sy")) /
            sqrt(col("dxx") * col("dyy")), 6)).as("rho"))
      .orderBy(col("l_returnflag"))
  }

  /** One-way ANOVA of l_quantity across return flags: per-group exact
    * decimal moments in one shuffle, F assembled from round-9dp
    * decimal-summed group terms. */
  private def qAggAnova(s: SparkSession, d: String): DataFrame = {
    val g = t(s, d, "lineitem")
      .select(col("l_returnflag").as("g"), dec(col("l_quantity")).as("x"))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("ng"), sum(col("x")).as("sg"),
        sum(col("x") * col("x")).as("ssg"))
    // per-group S_g²/n_g is the only rational term; round to 9 dp and
    // sum in DECIMAL so the 3-term reduction is order-free
    val terms = g.select(col("ng"), col("sg"), col("ssg"),
      expr("CAST(ROUND(CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE) " +
        "/ CAST(ng AS DOUBLE), 9) AS DECIMAL(28,9))").as("t"))
    terms.agg(
      count(lit(1)).as("k"), sum(col("ng")).as("n"),
      sum(col("sg")).as("s"), sum(col("ssg")).as("ss"),
      sum(col("t")).as("st"))
      .select(col("k"), col("n"),
        // SS reported in THOUSANDS: at sf1 the raw ~1.25e9 values land
        // exactly on 6dp round midpoints where Spark (half-up) and
        // DuckDB (half-even) split — the q_agg_chow SSR class, caught
        // by the r15 sf1 value campaign; /1000 moves the lattice three
        // decades off the midpoints (4e-10 relative margin)
        round((dbl(col("st")) - dbl(col("s")) * dbl(col("s"))
          / dbl(col("n"))) / 1000.0, 6).as("ssb_k"),
        round((dbl(col("ss")) - dbl(col("st"))) / 1000.0, 6).as("ssw_k"),
        // k=1 (no between-variance) or SSW=0 (constant data) ⇒ F
        // undefined → NULL, not an ANSI divide-by-zero
        when(col("k") > 1 && col("n") > col("k") &&
            dbl(col("ss")) - dbl(col("st")) > 0,
          round(((dbl(col("st")) - dbl(col("s")) * dbl(col("s")) / dbl(col("n")))
            / (dbl(col("k")) - 1.0)) /
            ((dbl(col("ss")) - dbl(col("st"))) / (dbl(col("n")) - dbl(col("k")))),
            6)).as("f_stat"))
  }

  /** Nearest-event join: for every signup, the temporally closest click
    * by the same user in EITHER direction (ties → the earlier click),
    * via frame-bounded IGNORE NULLS window picks over one user-keyed
    * sort — no join, no per-user pair blowup. */
  private def qJoinNearest(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
      .filter(col("event_type").isin("signup", "click"))
      .select(col("user_id"), col("event_id"), col("event_type"), col("us"))
    val ord = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
    val before = ord.rowsBetween(Window.unboundedPreceding, -1)
    val after = ord.rowsBetween(1, Window.unboundedFollowing)
    val cUs = when(col("event_type") === "click", col("us"))
    val cId = when(col("event_type") === "click", col("event_id"))
    // one projection → one Window node per frame (withColumn chains
    // would leave 4 un-collapsed Window passes: CollapseWindow only
    // merges adjacent nodes, and each withColumn interposes a Project)
    val scored = ev
      .select(col("user_id"), col("event_id"), col("event_type"), col("us"),
        last(cUs, ignoreNulls = true).over(before).as("pus"),
        last(cId, ignoreNulls = true).over(before).as("pid"),
        first(cUs, ignoreNulls = true).over(after).as("nus"),
        first(cId, ignoreNulls = true).over(after).as("nid"))
      .filter(col("event_type") === "signup")
    val pickNext = col("pus").isNull ||
      (col("nus").isNotNull && (col("nus") - col("us")) < (col("us") - col("pus")))
    scored
      .filter(col("pus").isNotNull || col("nus").isNotNull)
      .select(col("user_id"), col("event_id"),
        when(pickNext, col("nid")).otherwise(col("pid")).as("near_id"),
        when(pickNext, col("nus") - col("us"))
          .otherwise(col("pus") - col("us")).as("delta_us"))
      .orderBy(col("user_id"), col("event_id"))
  }

  val defs: Map[String, Relational.Q] = Map(
    "q_agg_spearman" -> (qAggSpearman _),
    "q_agg_anova" -> (qAggAnova _),
    "q_join_nearest" -> (qJoinNearest _),
  )

  val sql: Map[String, String] = Map(
    "q_agg_spearman" ->
      """WITH ranked AS (
        |  SELECT l_returnflag AS g,
        |    CAST(2 * rank() OVER (PARTITION BY l_returnflag
        |                          ORDER BY l_quantity)
        |       + count(*) OVER (PARTITION BY l_returnflag, l_quantity)
        |       - 1 AS HUGEINT) AS rx,
        |    CAST(2 * rank() OVER (PARTITION BY l_returnflag
        |                          ORDER BY l_extendedprice)
        |       + count(*) OVER (PARTITION BY l_returnflag, l_extendedprice)
        |       - 1 AS HUGEINT) AS ry
        |  FROM lineitem),
        |m AS (
        |  SELECT g, CAST(count(*) AS HUGEINT) AS n,
        |    sum(rx) AS sx, sum(ry) AS sy, sum(rx * ry) AS sxy,
        |    sum(rx * rx) AS sxx, sum(ry * ry) AS syy
        |  FROM ranked GROUP BY g)
        |SELECT g AS l_returnflag, CAST(n AS BIGINT) AS n,
        |  round(CAST(n * sxy - sx * sy AS DOUBLE)
        |    / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
        |         * CAST(n * syy - sy * sy AS DOUBLE)), 6) AS rho
        |FROM m ORDER BY l_returnflag""".stripMargin,
    "q_agg_anova" ->
      """WITH g AS (
        |  SELECT l_returnflag AS g, CAST(count(*) AS BIGINT) AS ng,
        |    sum(CAST(l_quantity AS DECIMAL(18,4))) AS sg,
        |    sum(CAST(l_quantity AS DECIMAL(18,4))
        |      * CAST(l_quantity AS DECIMAL(18,4))) AS ssg
        |  FROM lineitem GROUP BY l_returnflag),
        |terms AS (
        |  SELECT ng, sg, ssg,
        |    CAST(ROUND(CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE)
        |      / CAST(ng AS DOUBLE), 9) AS DECIMAL(28,9)) AS t
        |  FROM g),
        |agg AS (
        |  SELECT CAST(count(*) AS BIGINT) AS k,
        |    CAST(sum(ng) AS BIGINT) AS n,
        |    CAST(sum(sg) AS DECIMAL(38,4)) AS s,
        |    CAST(sum(ssg) AS DECIMAL(38,8)) AS ss,
        |    CAST(sum(t) AS DECIMAL(38,9)) AS st
        |  FROM terms)
        |SELECT k, n,
        |  round((CAST(st AS DOUBLE)
        |    - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
        |    / 1000.0, 6) AS ssb_k,
        |  round((CAST(ss AS DOUBLE) - CAST(st AS DOUBLE)) / 1000.0, 6)
        |    AS ssw_k,
        |  round(((CAST(st AS DOUBLE)
        |      - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
        |      / (CAST(k AS DOUBLE) - 1.0))
        |    / ((CAST(ss AS DOUBLE) - CAST(st AS DOUBLE))
        |      / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE))), 6) AS f_stat
        |FROM agg""".stripMargin,
    "q_join_nearest" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS us
        |  FROM events WHERE event_type IN ('signup', 'click')),
        |scored AS (
        |  SELECT user_id, event_id, event_type, us,
        |    last_value(CASE WHEN event_type = 'click' THEN us END
        |               IGNORE NULLS) OVER (
        |      PARTITION BY user_id ORDER BY us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pus,
        |    last_value(CASE WHEN event_type = 'click' THEN event_id END
        |               IGNORE NULLS) OVER (
        |      PARTITION BY user_id ORDER BY us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pid,
        |    first_value(CASE WHEN event_type = 'click' THEN us END
        |                IGNORE NULLS) OVER (
        |      PARTITION BY user_id ORDER BY us, event_id
        |      ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nus,
        |    first_value(CASE WHEN event_type = 'click' THEN event_id END
        |                IGNORE NULLS) OVER (
        |      PARTITION BY user_id ORDER BY us, event_id
        |      ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nid
        |  FROM ev)
        |SELECT user_id, event_id,
        |  CASE WHEN pus IS NULL
        |         OR (nus IS NOT NULL AND (nus - us) < (us - pus))
        |       THEN nid ELSE pid END AS near_id,
        |  CASE WHEN pus IS NULL
        |         OR (nus IS NOT NULL AND (nus - us) < (us - pus))
        |       THEN nus - us ELSE pus - us END AS delta_us
        |FROM scored
        |WHERE event_type = 'signup'
        |  AND (pus IS NOT NULL OR nus IS NOT NULL)
        |ORDER BY user_id, event_id""".stripMargin,
  )
}
