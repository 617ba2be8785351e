package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.engine.{Cols, Tables}
import graft.engine.Cols.cents

/** Event-stream / JSON query inventory (SURVEY.md §2.8 F5/F7, §2.3 J4/J5,
  * §2.9 T6). The reference's whole domain is JSON event records
  * (psuedo_code.txt:273-296); the driver `events` table carries a JSON
  * `props` string plus a nanosecond timestamp, exercising:
  *   - F5 JSON scalar access (`get_json_object`)
  *   - F7 time bucketing (`window()` — epoch-aligned tumbling windows)
  *   - J4 range self-join (pairs of events within a time window)
  *   - J5 as-of join (nearest earlier event per key) via window functions
  * Timestamps are exposed to oracles as epoch microseconds (`ts_us`) so no
  * timezone/precision ambiguity can reach the hash comparison.
  */
object EventOps {
  type Q = (SparkSession, String) => DataFrame
  private def ev(s: SparkSession, d: String) = Tables.load(s, d, "events")

  val defs: Map[String, Q] = Map(
    // F5: JSON field extraction from the props payload column.
    "q21_json_extract" -> ((s, d) => {
      ev(s, d)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"), max(col("k")).as("max_k"))
        .orderBy("event_type")
    }),

    // F7/T6: epoch-aligned tumbling window aggregation (batch window()).
    "q22_hourly_traffic" -> ((s, d) => {
      ev(s, d)
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("value_c"))
        .select(unix_micros(col("w.start").cast("timestamp")).as("hour_us"),
          col("event_type"), col("n"), col("value_c"))
        .orderBy("hour_us", "event_type")
    }),

    // J4: range self-join — ordered event pairs of the same user within
    // 5 minutes. Joining on user_id alone would be O(n²) per user (a power
    // user with 10⁶ events at 100 TB puts 10¹² pairs on one key), so the
    // equi key is (user_id, 5-minute time bucket): the left side also emits
    // the adjacent bucket, because a match at distance ≤ bucket width can
    // only live in the same or the next bucket. Every candidate pair
    // appears exactly once (the right-side bucket is a function of us2).
    "q23_event_pairs" -> ((s, d) => {
      val bucketUs = 300000000L // 5 min in µs — equal to the join range
      val e = ev(s, d).select(col("user_id"), col("event_type"), col("ts_us"))
        .withColumn("bk0", expr(s"ts_us div $bucketUs"))
      val a = e.select(col("user_id"), col("event_type").as("t1"), col("ts_us").as("us1"),
        explode(array(col("bk0"), col("bk0") + 1)).as("bk"))
      val b = e.select(col("user_id"), col("event_type").as("t2"), col("ts_us").as("us2"),
        col("bk0").as("bk"))
      a.join(b, Seq("user_id", "bk"))
        .filter(col("us2") > col("us1") && col("us2") - col("us1") <= lit(bucketUs))
        .groupBy("t1", "t2")
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy("t1", "t2")
    }),

    // J5: as-of join — for each view event, the most recent strictly-earlier
    // purchase of the same user, as a single pass over a sorted window
    // (no join at all: one shuffle on user_id, then last(ignoreNulls)).
    "q24_asof_purchase" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      ev(s, d)
        .withColumn("prev_purchase_us",
          last(when(col("event_type") === "purchase", col("ts_us")), ignoreNulls = true).over(w))
        .filter(col("event_type") === "view")
        .select(col("event_id"), col("user_id"), col("ts_us"), col("prev_purchase_us"))
        .orderBy("event_id")
    }),

    // T6/F7: gap-based sessionization with the built-in session_window
    // operator (dynamic-gap session windows; one shuffle on user_id).
    // A session extends while consecutive events are < 30 min apart;
    // start/end are exposed as epoch-microsecond min/max so the oracle
    // comparison is pure integer arithmetic. The streaming twin
    // (flatMapGroupsWithState closed sessions) is cross-checked against
    // this in StreamingSpec.
    "q47_user_sessions" -> ((s, d) => {
      ev(s, d)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
        .agg(count(lit(1)).as("n_events"),
          min(col("ts_us")).as("start_us"), max(col("ts_us")).as("end_us"))
        .select("user_id", "n_events", "start_us", "end_us")
        .orderBy("user_id", "start_us")
    }),

    // J1 under SKEW: salted hot-key join. event_type has 5 values over
    // 100k rows — a shuffle join on it hashes each hot key onto ONE
    // reducer (at 100 TB, one task gets 20 TB and the stage never ends).
    // The salting pattern: the fact side appends salt =
    // pmod(xxhash64(row key), S); the dim side is replicated ×S
    // (posexplode over a sequence); the join key becomes (type, salt), so
    // every hot key spreads over S reducers. Each fact row still matches
    // EXACTLY ONE dim replica, so results are identical to the unsalted
    // join — which is what the DuckDB oracle checks. The merge hint keeps
    // the demo honest at test scale (a 5-row dim would otherwise
    // broadcast, which is the right fix for small dims — salting is the
    // big×big path where neither side broadcasts). SkewSpec asserts the
    // plan is a non-broadcast SMJ and that the hot key's rows actually
    // spread across partitions.
    "q59_salted_join" -> ((s, d) => {
      val salts = 8
      val fact = ev(s, d)
        .select(col("event_id"), col("event_type"), col("value"))
        .withColumn("salt", pmod(xxhash64(col("event_id")), lit(salts)).cast("int"))
      val dim = ev(s, d)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("type_n"))
        .select(col("event_type"), col("type_n"),
          explode(sequence(lit(0), lit(salts - 1))).as("salt"))
      fact.hint("merge").join(dim, Seq("event_type", "salt"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("sum_value_c"),
          max(col("type_n")).as("type_n"))
        .orderBy("event_type")
    }),

    // W2: lag/lead analytics over the per-user event timeline.
    "q25_session_gaps" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
      ev(s, d)
        .select(col("event_id"), col("user_id"),
          lag(col("event_id"), 1).over(w).as("prev_event_id"),
          lead(col("event_id"), 1).over(w).as("next_event_id"),
          (col("ts_us") - lag(col("ts_us"), 1).over(w)).as("gap_us"))
        .orderBy("event_id")
    }))

  val oracles: Map[String, String] = Map(
    "q21_json_extract" ->
      """SELECT event_type, COUNT(*) AS n,
         CAST(SUM(TRY_CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
         MAX(TRY_CAST(json_extract_string(props, '$.k') AS INT)) AS max_k
         FROM events GROUP BY 1 ORDER BY 1""",
    "q22_hourly_traffic" ->
      """SELECT (epoch_us(ts) // 3600000000) * 3600000000 AS hour_us, event_type,
         COUNT(*) AS n, CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS value_c
         FROM events GROUP BY 1, 2 ORDER BY 1, 2""",
    "q23_event_pairs" ->
      """SELECT a.event_type AS t1, b.event_type AS t2, COUNT(*) AS n_pairs
         FROM events a JOIN events b ON a.user_id = b.user_id
           AND epoch_us(b.ts) > epoch_us(a.ts)
           AND epoch_us(b.ts) - epoch_us(a.ts) <= 300000000
         GROUP BY 1, 2 ORDER BY 1, 2""",
    "q24_asof_purchase" ->
      """SELECT event_id, user_id, epoch_us(ts) AS ts_us, prev_purchase_us
         FROM (SELECT event_id, user_id, ts, event_type,
                 LAST_VALUE(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_purchase_us
               FROM events) x
         WHERE event_type = 'view' ORDER BY event_id""",
    "q47_user_sessions" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events),
         g AS (SELECT user_id, us,
                 CASE WHEN us - LAG(us) OVER w >= 1800000000 THEN 1 ELSE 0 END AS brk
               FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)),
         s AS (SELECT user_id, us,
                 SUM(brk) OVER (PARTITION BY user_id ORDER BY us
                                ROWS UNBOUNDED PRECEDING) AS sid
               FROM g)
         SELECT user_id, COUNT(*) AS n_events, MIN(us) AS start_us, MAX(us) AS end_us
         FROM s GROUP BY user_id, sid ORDER BY user_id, start_us""",
    "q59_salted_join" ->
      """WITH dim AS (SELECT event_type, COUNT(*) AS type_n FROM events GROUP BY 1)
         SELECT e.event_type, COUNT(*) AS n,
           CAST(SUM(CAST(ROUND(e.value*100) AS BIGINT)) AS BIGINT) AS sum_value_c,
           MAX(d.type_n) AS type_n
         FROM events e JOIN dim d ON e.event_type = d.event_type
         GROUP BY 1 ORDER BY 1""",
    "q25_session_gaps" ->
      """SELECT event_id, user_id,
         LAG(event_id, 1) OVER w AS prev_event_id,
         LEAD(event_id, 1) OVER w AS next_event_id,
         epoch_us(ts) - LAG(epoch_us(ts), 1) OVER w AS gap_us
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
         ORDER BY event_id""")
}
