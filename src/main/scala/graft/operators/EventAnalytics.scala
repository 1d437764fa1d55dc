package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream analytics over the batch events table (DRIVER-EXT,
  * SURVEY.md §2.10 sibling surface): the two census shapes every
  * product-analytics pipeline runs — ordered funnels and cohort
  * retention — expressed as single-shuffle plans with exact,
  * SQL-replayable semantics.
  */
object EventAnalytics {

  /** Per-user GREEDY SEQUENTIAL funnel progress: how many of `steps`
    * the user completed in order, where step i+1 must occur STRICTLY
    * after the greedy (earliest-valid) occurrence of step i. Greedy
    * matching is the standard funnel semantics (it maximizes
    * progression: taking the earliest valid occurrence of each step
    * never excludes a later completion), and the strict `>` makes the
    * answer independent of how same-timestamp events tie-break —
    * which is what lets the oracle replay it with per-step
    * min-after-min subqueries instead of the event-by-event scan.
    *
    * Shape at 100 TB: ONE shuffle — events project to (user, ts,
    * type), group by user, and the sorted per-user array is folded by
    * a catalyst `aggregate` lambda holding a (step-index, last-ts)
    * state; k never touches the plan size. The per-user
    * `collect_list` is bounded by that user's event count — for
    * adversarial hot users, pre-filter to the step types (done here:
    * only events whose type appears in `steps` enter the list).
    * Returns (user, steps_reached). */
  def funnelUsers(events: DataFrame, userCol: String, tsCol: String,
                  typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.length == steps.length,
      "repeated step types are ambiguous — name each stage uniquely")
    val k = steps.length
    val stepsArr = array(steps.map(lit): _*)
    // cast up front: the events loader yields TIMESTAMP_NTZ, and the
    // fold state/unix_micros need one concrete timestamp type. The
    // NTZ cast resolves wall-clock fields in the SESSION time zone —
    // pin spark.sql.session.timeZone (this repo's drivers use UTC) or
    // pass real TIMESTAMP columns, else emitted epoch values and
    // cross-DST latencies shift with the session. Null-timestamp
    // events are dropped up front (they cannot order, and min(ts)
    // semantics — the oracle's closed form — ignore them too)
    val sorted = sort_array(collect_list(struct(
      col(tsCol).cast("timestamp").as("ts"), col(typeCol).as("tp"))))
    val fold: (Column, Column) => Column = (acc, x) =>
      when(acc.getField("idx") < k
          && x.getField("tp") ===
            element_at(stepsArr, acc.getField("idx") + 1)
          && (acc.getField("idx") === 0
            || x.getField("ts") > acc.getField("last")),
        struct((acc.getField("idx") + 1).as("idx"),
          x.getField("ts").as("last")))
        .otherwise(acc)
    events
      .filter(col(typeCol).isin(steps: _*) && col(tsCol).isNotNull)
      .groupBy(col(userCol).as("user"))
      .agg(sorted.as("__evs"))
      .select(col("user"), aggregate(col("__evs"),
        struct(lit(0).as("idx"),
          lit(null).cast("timestamp").as("last")),
        fold).getField("idx").as("steps_reached"))
  }

  /** [[funnelUsers]] keeping each reached step's GREEDY timestamp
    * (epoch micros, exact longs): (user, times) with
    * `size(times) = steps_reached`. Same one-shuffle fold; the state
    * additionally accumulates `unix_micros` per advance. */
  def funnelUserTimes(events: DataFrame, userCol: String, tsCol: String,
                      typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.length == steps.length,
      "repeated step types are ambiguous — name each stage uniquely")
    val k = steps.length
    val stepsArr = array(steps.map(lit): _*)
    // cast up front: the events loader yields TIMESTAMP_NTZ, and the
    // fold state/unix_micros need one concrete timestamp type. The
    // NTZ cast resolves wall-clock fields in the SESSION time zone —
    // pin spark.sql.session.timeZone (this repo's drivers use UTC) or
    // pass real TIMESTAMP columns, else emitted epoch values and
    // cross-DST latencies shift with the session. Null-timestamp
    // events are dropped up front (they cannot order, and min(ts)
    // semantics — the oracle's closed form — ignore them too)
    val sorted = sort_array(collect_list(struct(
      col(tsCol).cast("timestamp").as("ts"), col(typeCol).as("tp"))))
    val fold: (Column, Column) => Column = (acc, x) =>
      when(size(acc.getField("times")) < k
          && x.getField("tp") ===
            element_at(stepsArr, size(acc.getField("times")) + 1)
          && (size(acc.getField("times")) === 0
            || x.getField("ts") > acc.getField("last")),
        struct(x.getField("ts").as("last"),
          concat(acc.getField("times"),
            array(unix_micros(x.getField("ts")))).as("times")))
        .otherwise(acc)
    events
      .filter(col(typeCol).isin(steps: _*) && col(tsCol).isNotNull)
      .groupBy(col(userCol).as("user"))
      .agg(sorted.as("__evs"))
      .select(col("user"), aggregate(col("__evs"),
        struct(lit(null).cast("timestamp").as("last"),
          lit(Array.empty[Long]).as("times")),
        fold).getField("times").as("times"))
  }

  /** Funnel LATENCY census: for every step past the first,
    * (step_idx, step, n_users, p50_us, p90_us) of the time from the
    * step-1 greedy occurrence to that step's — exact interpolated
    * percentiles over epoch-microsecond longs (rounded to 1), one
    * explode + one aggregation over [[funnelUserTimes]]. */
  def funnelLatency(events: DataFrame, userCol: String, tsCol: String,
                    typeCol: String, steps: Seq[String]): DataFrame = {
    val stepsArr = array(steps.map(lit): _*)
    funnelUserTimes(events, userCol, tsCol, typeCol, steps)
      .filter(size(col("times")) >= 2)
      .select(explode(transform(sequence(lit(2), size(col("times"))),
        i => struct(i.as("step_idx"),
          (get(col("times"), i - 1)
            - get(col("times"), lit(0))).as("lat_us")))).as("s"))
      .select(col("s.step_idx"), col("s.lat_us"))
      .groupBy(col("step_idx"))
      .agg(count(lit(1)).as("n_users"),
        round(percentile(col("lat_us"), lit(0.5)), 1).as("p50_us"),
        round(percentile(col("lat_us"), lit(0.9)), 1).as("p90_us"))
      .select(col("step_idx"),
        get(stepsArr, col("step_idx") - 1).as("step"),
        col("n_users"), col("p50_us"), col("p90_us"))
  }

  /** The funnel census: (step_idx, step, n_users) where `n_users`
    * counts users whose greedy progression reached step_idx — one
    * aggregation over [[funnelUsers]], unpivoted to a row per step
    * (counts are monotone non-increasing by construction). */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
             typeCol: String, steps: Seq[String]): DataFrame = {
    val fu = funnelUsers(events, userCol, tsCol, typeCol, steps)
    // coalesce: over an EMPTY user set (no step events at all) the
    // sums are null, and the census contract is 0
    val aggs = steps.indices.map(i =>
      coalesce(sum(when(col("steps_reached") >= i + 1, 1L)
        .otherwise(0L)), lit(0L)).as(s"__n$i"))
    fu.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(steps.zipWithIndex.map { case (st, i) =>
        struct(lit(i + 1).as("step_idx"), lit(st).as("step"),
          col(s"__n$i").as("n_users"))
      }: _*)).as("s"))
      .select(col("s.step_idx"), col("s.step"), col("s.n_users"))
  }

  /** Event-transition census (the first-order Markov view of the
    * stream): for every (from, to) pair of CONSECUTIVE events within
    * a user's timeline, the count and the row-normalized transition
    * probability. Consecutive = `lead` over (ts, type) — the type in
    * the sort key makes same-instant ordering deterministic, so the
    * census (and its oracle) is a pure function of the data. One
    * shuffle (the per-user window); the census aggregation reuses its
    * partitioning-compatible keys. Returns (from_type, to_type, n,
    * p rounded to 4). */
  def transitions(events: DataFrame, userCol: String, tsCol: String,
                  typeCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol).asc, col("from_type").asc)
    val pairs = events
      .select(col(userCol), col(tsCol), col(typeCol).as("from_type"))
      .withColumn("to_type", lead(col("from_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
    val counted = pairs.groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    val w2 = Window.partitionBy(col("from_type"))
    counted.withColumn("p",
        round(col("n") / sum(col("n")).over(w2), 4))
      .select(col("from_type"), col("to_type"), col("n"), col("p"))
  }

  /** STATIONARY DISTRIBUTION of the [[transitions]] Markov chain —
    * the steady-state behavior mix ("where do users spend their time
    * in the long run"), the eigenvector reading of the transition
    * census. Deterministic synchronous power iteration from the
    * uniform vector: p' = p·P renormalized per step. Sink states
    * (types appearing only as targets) get an IMPLICIT SELF-LOOP —
    * the standard stochastic completion; without it a chain whose
    * mass drains entirely into a sink renormalizes 0/0 (caught by
    * the two-event spec fixture — renormalization alone is an
    * fp-drift guard, NOT a sink fix). Returns (state, p) after
    * `iters` rounds.
    *
    * Shape at scale: the state space is the TYPE alphabet (tiny);
    * each round is one broadcast-sized join + partial-agg groupBy on
    * the edge table — the [[graft.operators.PageRank]] per-round
    * shape with lineage cut every third round. Deterministic and
    * fully SQL-replayable by unrolling rounds (q210). */
  def stationaryDistribution(events: DataFrame, userCol: String,
                             tsCol: String, typeCol: String,
                             iters: Int = 10,
                             driverThreshold: Long = 1L << 20): DataFrame = {
    require(iters >= 1 && iters <= 100,
      s"iters must be in [1,100], got $iters")
    val edges = transitions(events, userCol, tsCol, typeCol)
      .select(col("from_type"), col("to_type"),
        col("n").cast("double").as("__n"))
      .localCheckpoint()
    // r18 opt: adaptive driver cutover (the PageRank.run /
    // connectedComponentMinLabel pattern). The transition matrix is
    // bounded by (#distinct event types)^2 — already aggregated, so
    // when it fits comfortably on the driver the power iteration is a
    // tight local loop instead of iters x (join + two aggregations +
    // rescale) jobs, whose per-job overhead dominates on small state
    // spaces (q210's stage profile: 85 jobs for a handful of states).
    // Identical recurrence — step, mass-normalize, absent states get
    // 0 mass; string states only (the event-type case); anything else
    // takes the distributed loop below. Summation order may differ at
    // ~1 ulp, as between any two executions of a distributed sum.
    if (edges.schema("from_type").dataType ==
          org.apache.spark.sql.types.StringType &&
        edges.count() <= driverThreshold) {
      val spark = events.sparkSession
      import spark.implicits._
      val es = edges.select(col("from_type"), col("to_type"), col("__n"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
      val states = es.iterator.flatMap(t => Iterator(t._1, t._2))
        .toArray.distinct.sorted
      require(states.nonEmpty,
        "no transitions — need at least two events per key")
      val idx = states.zipWithIndex.toMap
      val out = new Array[Double](states.length)
      es.foreach { case (f, _, n) => out(idx(f)) += n }
      // sink states self-loop with probability 1 (the distributed
      // loop's sinks union)
      val pr = es.map { case (f, t, n) => (idx(f), idx(t), n / out(idx(f))) } ++
        states.indices.filter(out(_) == 0.0).map(i => (i, i, 1.0))
      var p = Array.fill(states.length)(1.0 / states.length)
      var it = 0
      while (it < iters) {
        val m = new Array[Double](states.length)
        pr.foreach { case (f, t, w) => m(t) += p(f) * w }
        val tot = m.sum
        p = m.map(_ / tot)
        it += 1
      }
      return states.zip(p).toSeq.toDF("state", "p")
    }
    val outSum = edges.groupBy(col("from_type"))
      .agg(sum(col("__n")).as("__out"))
    val states = edges.select(col("from_type").as("state"))
      .union(edges.select(col("to_type")))
      .distinct().localCheckpoint()
    val sinks = states.join(
      edges.select(col("from_type").as("state")).distinct(),
      Seq("state"), "left_anti")
    val probs = edges.join(outSum, Seq("from_type"))
      .select(col("from_type"), col("to_type"),
        (col("__n") / col("__out")).as("__pr"))
      .unionByName(sinks.select(col("state").as("from_type"),
        col("state").as("to_type"), lit(1.0).as("__pr")))
      .localCheckpoint()
    val k = states.count()
    require(k > 0, "no transitions — need at least two events per key")
    var p = states.withColumn("p", lit(1.0 / k))
    for (i <- 1 to iters) {
      val stepped = p.join(probs, p("state") === probs("from_type"))
        .groupBy(col("to_type").as("state"))
        .agg(sum(col("p") * col("__pr")).as("__m"))
      val mass = stepped.agg(sum(col("__m")).as("__tot"))
      val next = states
        .join(stepped, Seq("state"), "left")
        .crossJoin(broadcast(mass))
        .select(col("state"),
          (coalesce(col("__m"), lit(0.0)) / col("__tot")).as("p"))
      p = if (i % 3 == 0 || i == iters) next.localCheckpoint()
          else next
    }
    p.select(col("state"), col("p"))
  }

  /** Cohort retention census: users cohorted by the ISO week of
    * their FIRST event; for each (cohort, period) — period =
    * `periodDays`-day offsets from the cohort week start — the
    * distinct users active in that period over the cohort size.
    * Returns (cohort string, period, n_cohort, n_active, retention
    * rounded to 4). Period 0 always exists (the first event itself);
    * cohort dates render as strings (the oracle-parity rule for
    * dates).
    *
    * Shape at 100 TB: first-event table = one partial-agg groupBy on
    * the user key; activity rows join it on the same key (AQE-planned
    * shuffle join — the first-event side has one row per user);
    * per-(cohort, period) distinct is the only other exchange, and
    * cohort sizes (weeks x 1 row) broadcast into the final select. */
  def cohortRetention(events: DataFrame, userCol: String, tsCol: String,
                      periodDays: Int = 7): DataFrame = {
    require(periodDays >= 1, s"periodDays must be >= 1, got $periodDays")
    val first = events.groupBy(col(userCol).as("__u"))
      .agg(min(col(tsCol)).as("__first"))
      .withColumn("__cohort", to_date(date_trunc("week", col("__first"))))
    val active = events
      .select(col(userCol).as("__u"), to_date(col(tsCol)).as("__d"))
      .join(first, Seq("__u"))
      .select(col("__u"), col("__cohort"),
        floor(datediff(col("__d"), col("__cohort")) / periodDays)
          .cast("int").as("period"))
      .distinct()
    val sizes = first.groupBy(col("__cohort"))
      .agg(count(lit(1)).as("n_cohort"))
    active.groupBy(col("__cohort"), col("period"))
      .agg(count(lit(1)).as("n_active"))
      .join(broadcast(sizes), Seq("__cohort"))
      .select(col("__cohort").cast("string").as("cohort"), col("period"),
        col("n_cohort"), col("n_active"),
        round(col("n_active") / col("n_cohort"), 4).as("retention"))
  }

  /** Per-user WINDOWED funnel progression — [[funnelUsers]] under a
    * conversion window anchored at the user's FIRST-TOUCH step-1
    * time (greedy min; a later step-1 occurrence never re-anchors —
    * the attribution semantics that keeps the census replayable as
    * the min-after-min chain plus a bound). Returns
    * (user, steps_reached); the anchor rides the fold state. */
  def funnelUsersWindowed(events: DataFrame, userCol: String,
                          tsCol: String, typeCol: String,
                          steps: Seq[String],
                          windowSeconds: Long): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.length == steps.length,
      "repeated step types are ambiguous — name each stage uniquely")
    require(windowSeconds >= 1,
      s"windowSeconds must be >= 1, got $windowSeconds")
    val k = steps.length
    val stepsArr = array(steps.map(lit): _*)
    val winUs = windowSeconds * 1000000L
    val sorted = sort_array(collect_list(struct(
      col(tsCol).cast("timestamp").as("ts"), col(typeCol).as("tp"))))
    val fold: (Column, Column) => Column = (acc, x) =>
      when(acc.getField("idx") < k
          && x.getField("tp") ===
            element_at(stepsArr, acc.getField("idx") + 1)
          && (acc.getField("idx") === 0
            || (x.getField("ts") > acc.getField("last")
              && unix_micros(x.getField("ts"))
                <= acc.getField("anchor") + winUs)),
        struct((acc.getField("idx") + 1).as("idx"),
          x.getField("ts").as("last"),
          when(acc.getField("idx") === 0,
            unix_micros(x.getField("ts")))
            .otherwise(acc.getField("anchor")).as("anchor")))
        .otherwise(acc)
    events
      .filter(col(typeCol).isin(steps: _*) && col(tsCol).isNotNull)
      .groupBy(col(userCol).as("user"))
      .agg(sorted.as("__evs"))
      .select(col("user"), aggregate(col("__evs"),
        struct(lit(0).as("idx"),
          lit(null).cast("timestamp").as("last"),
          lit(null).cast("long").as("anchor")),
        fold).getField("idx").as("steps_reached"))
  }

  /** WINDOWED funnel census — [[funnel]] under a conversion window:
    * steps past the first must land within `windowSeconds` of the
    * user's FIRST-TOUCH step-1 time (greedy min — the standard
    * first-touch attribution semantics; a later step-1 occurrence
    * never re-anchors the window, which keeps the census replayable
    * as the same min-after-min chain with the window bound added).
    * Same one-shuffle fold as [[funnelUsers]], with the anchor time
    * carried in the fold state. */
  def funnelWindowed(events: DataFrame, userCol: String, tsCol: String,
                     typeCol: String, steps: Seq[String],
                     windowSeconds: Long): DataFrame = {
    val fu = funnelUsersWindowed(events, userCol, tsCol, typeCol,
      steps, windowSeconds)
    val aggs = steps.indices.map(i =>
      coalesce(sum(when(col("steps_reached") >= i + 1, 1L)
        .otherwise(0L)), lit(0L)).as(s"__n$i"))
    fu.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(steps.zipWithIndex.map { case (st, i) =>
        struct(lit(i + 1).as("step_idx"), lit(st).as("step"),
          col(s"__n$i").as("n_users"))
      }: _*)).as("s"))
      .select(col("s.step_idx"), col("s.step"), col("s.n_users"))
  }

  /** Time-weighted average of a sampled value per user — the correct
    * mean over IRREGULARLY sampled state (a session's price/level/
    * quality signal observed at events): each observation weights by
    * how long it remained current, Σ v_i·(t_{i+1}−t_i) / (t_n−t_1).
    * Users with one observation (or all at one instant: zero total
    * duration) emit null — an unweightable mean, not 0. Ties order
    * by (ts, value) so the census is deterministic; epoch-micros
    * longs carry the weights (the sessionize discipline). One
    * per-user window + one aggregation. Returns (user, n_obs,
    * duration_us, twap rounded 6). */
  def timeWeightedAvg(events: DataFrame, userCol: String, tsCol: String,
                      valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(userCol))
      .orderBy(col("__us").asc, col("__v").asc)
    events
      .filter(col(tsCol).isNotNull && col(valueCol).isNotNull)
      .select(col(userCol),
        unix_micros(col(tsCol).cast("timestamp")).as("__us"),
        col(valueCol).cast("double").as("__v"))
      .withColumn("__dur", lead(col("__us"), 1).over(w) - col("__us"))
      .groupBy(col(userCol))
      .agg(count(lit(1)).as("n_obs"),
        (max(col("__us")) - min(col("__us"))).as("duration_us"),
        when(max(col("__us")) - min(col("__us")) > 0,
          round(sum(col("__v") * col("__dur"))
            / (max(col("__us")) - min(col("__us"))), 6)).as("twap"))
  }

  /** Path n-gram census — the order-n generalization of
    * [[transitions]]: every run of `n` CONSECUTIVE events in a
    * user's timeline, counted across users. The top paths are the
    * "how do users actually move" readout funnels can only confirm
    * hypotheses about. Consecutive = a lead chain over (ts, type) —
    * the type in the sort key pins same-instant ordering exactly as
    * [[transitions]] does, so the census is deterministic and
    * SQL-replayable. Returns (path "a>b>c", n) — one per-user window
    * (a single shuffle; all n−1 leads share the frame) plus the
    * census aggregation. */
  def pathNgrams(events: DataFrame, userCol: String, tsCol: String,
                 typeCol: String, n: Int): DataFrame = {
    require(n >= 2 && n <= 8,
      s"path length must be in [2,8], got $n — longer paths explode " +
        "the census domain; chain filters instead")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol).asc, col("__t0").asc)
    val steps = (1 until n).foldLeft(
      events.select(col(userCol), col(tsCol),
        col(typeCol).as("__t0"))) { (df, i) =>
      df.withColumn(s"__t$i", lead(col("__t0"), i).over(w))
    }
    steps
      .filter((1 until n).map(i => col(s"__t$i").isNotNull)
        .reduce(_ && _))
      .select(concat_ws(">",
        (0 until n).map(i => col(s"__t$i")): _*).as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n"))
  }

  /** BATCH sessionization — the gaps-and-islands assignment every
    * behavioral pipeline starts from (the batch sibling of
    * EventStream.sessionize's mapGroupsWithState path, for replaying
    * history rather than tailing a stream): a user's events split
    * into sessions wherever the gap to the previous event exceeds
    * `gapSeconds`. Returns one row per session: (user, session_idx
    * 1-based in time order, session_start, session_end, n_events,
    * duration_s).
    *
    * Determinism: the island flag compares CONSECUTIVE timestamps
    * under an order by ts, so it is a pure function of each user's
    * timestamp MULTISET — equal-ts events yield gap 0 regardless of
    * how the sort tie-breaks, and every emitted column is an
    * aggregate over the resulting islands. Null timestamps are
    * dropped up front (they cannot order). Gap arithmetic runs on
    * `unix_micros` longs — exact integers, no timestamp-subtraction
    * parity risk (the funnelLatency discipline).
    *
    * Shape at 100 TB: ONE hash shuffle on the user key; both windows
    * (the lag and the running island sum) and the final session
    * aggregation share that partitioning, so Catalyst plans a single
    * Exchange with two in-partition sorts — no global sort, no
    * second shuffle. Hot users cost their own event count in one
    * task's sort, the same bound as every per-user window here. */
  def sessions(events: DataFrame, userCol: String, tsCol: String,
               gapSeconds: Long): DataFrame = {
    require(gapSeconds >= 1, s"gapSeconds must be >= 1, got $gapSeconds")
    import org.apache.spark.sql.expressions.Window
    val wOrd = Window.partitionBy(col(userCol)).orderBy(col("__us").asc)
    val wRun = wOrd.rowsBetween(Window.unboundedPreceding,
      Window.currentRow)
    events
      .filter(col(tsCol).isNotNull)
      .select(col(userCol),
        unix_micros(col(tsCol).cast("timestamp")).as("__us"))
      .withColumn("__new",
        when(col("__us") - coalesce(lag(col("__us"), 1).over(wOrd),
          col("__us")) > gapSeconds * 1000000L, 1L).otherwise(0L))
      .withColumn("session_idx", sum(col("__new")).over(wRun) + 1L)
      .groupBy(col(userCol), col("session_idx"))
      .agg(timestamp_micros(min(col("__us"))).as("session_start"),
        timestamp_micros(max(col("__us"))).as("session_end"),
        count(lit(1)).as("n_events"),
        (max(col("__us")) - min(col("__us"))).as("duration_us"),
        round((max(col("__us")) - min(col("__us"))) / 1000000.0, 3)
          .as("duration_s"))
  }

  /** Marketing-style TOUCH ATTRIBUTION: for every conversion event,
    * the first and last touch event by the same user within a
    * trailing `lookbackSec` window (conversion instant included) —
    * the two canonical single-touch attribution models in one pass.
    * Returns the conversion rows with (first_type, first_id,
    * last_type, last_id), nulls when no touch precedes in window
    * ("organic" conversions — kept, a dropped row would understate
    * conversion counts in any census built on this).
    *
    * Shape at scale: NOT a touches x conversions join (a power user
    * with 10^4 touches and 10^3 conversions would build 10^7 join
    * rows) — one RANGE-framed window over the user's timeline
    * computes both ends: min/max over `when(isTouch,
    * struct(ts, id, type))` with rangeBetween(−lookback, 0); struct
    * ordering gives the deterministic (ts, id) tie-break, null
    * non-touch rows are ignored by min/max, and the frame bound
    * keeps per-row state window-sized. One hash exchange on the
    * user, shared with everything else on that key. */
  def attribution(events: DataFrame, userCol: String, tsCol: String,
                  idCol: String, typeCol: String,
                  conversionType: String, touchTypes: Seq[String],
                  lookbackSec: Long): DataFrame = {
    require(touchTypes.nonEmpty, "attribution needs touch types")
    require(!touchTypes.contains(conversionType),
      s"$conversionType cannot be both touch and conversion — credit " +
        "would self-attribute")
    require(lookbackSec > 0, s"lookbackSec must be positive")
    val sec = (unix_micros(col(tsCol).cast("timestamp")) / 1000000L)
      .cast("long")
    val e = events.withColumn("__sec", sec)
    val w = Window.partitionBy(col(userCol)).orderBy(col("__sec"))
      .rangeBetween(-lookbackSec, 0)
    val touch = when(col(typeCol).isin(touchTypes: _*),
      struct(col("__sec").as("ts"), col(idCol).as("id"),
        col(typeCol).as("typ")))
    e.withColumn("__first", min(touch).over(w))
      .withColumn("__last", max(touch).over(w))
      .filter(col(typeCol) === conversionType)
      .select(col(userCol), col(idCol).as("conversion_id"),
        col(tsCol).as("conversion_ts"),
        col("__first.typ").as("first_type"),
        col("__first.id").as("first_id"),
        col("__last.typ").as("last_type"),
        col("__last.id").as("last_id"))
  }
}
