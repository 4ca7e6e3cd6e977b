package graft.queries

import graft.Tables
import graft.ops.CoreOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Queries exercising every operator the reference itself implements
  * (SURVEY.md §2.1-2.8), generalized from the Riot-match pipeline to the
  * driver testdata. Each entry has a DuckDB oracle with identical column
  * names and a total ORDER BY (driver hash-compares values).
  */
object ReferenceQueries {

  private val propsSchema = StructType(Seq(StructField("k", LongType)))

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    // P3+P5+F1+F2+F5+A1+P1 in one pipeline (SURVEY §7.1): parse nested
    // JSON, struct-flatten, ms->date derivation, conditional projection,
    // filter, dedup. Mirrors reference utils/utils.py:78-153.
    "q_flatten_project" -> { (s, dir) =>
      val e = Tables(s, dir, "events")
        .withColumn("props", from_json(col("props"), propsSchema))
      CoreOps.flattenStruct(e)
        .select(
          col("event_id"), col("user_id"), col("event_type"),
          date_format(col("ts"), "yyyy-MM-dd").as("day"),
          col("props_k"),
          when(col("props_k").isNotNull && col("props_k") > 50, "high")
            .otherwise("low").as("k_band"),
          col("value"))
        .filter(col("event_type") =!= "error")
        .dropDuplicates("event_id")
        .orderBy("event_id")
    },

    // S2+U1+A1+L1: union-all of overlapping scans -> distinct -> limit,
    // the match-ID listing shape (reference matches.py:21-53), with the
    // intended dedup semantics (the reference computes but drops them).
    "q_union_distinct_limit" -> { (s, dir) =>
      val o = Tables(s, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      o.filter(col("o_totalprice") < 100000)
        .unionByName(o.filter(col("o_orderstatus") === "F"))
        .distinct()
        .orderBy("o_orderkey")
        .limit(100)
    },

    // J1: array membership lookup + element extraction (reference
    // utils/utils.py:93-107,149-150) over a real array column.
    "q_array_lookup" -> { (s, dir) =>
      val words = split(col("text"), " ")
      Tables(s, dir, "documents").select(
        col("doc_id"),
        size(words).cast(LongType).as("n_tokens"),
        element_at(words, 1).as("first_word"),
        element_at(words, -1).as("last_word"),
        array_position(words, "merge").as("merge_pos"))
        .orderBy("doc_id")
    },

    // F3+J2+P5: static map lookup as a constant-folded when-chain
    // (reference get_queue_id utils/utils.py:63-76) + conditional band.
    "q_cond_project" -> { (s, dir) =>
      val codes = Seq("click" -> 1, "view" -> 2, "purchase" -> 3, "signup" -> 4, "error" -> 5)
      Tables(s, dir, "events").select(
        col("event_id"), col("event_type"),
        CoreOps.lookupMap(col("event_type"), codes).as("type_code"),
        when(col("value") >= 100, "big").otherwise("small").as("size_band"))
        .orderBy("event_id")
    },

    // J2 as a real broadcast dim join: customer -> nation -> region.
    "q_dim_join" -> { (s, dir) =>
      val c = Tables(s, dir, "customer")
      val n = Tables(s, dir, "nation")
      val r = Tables(s, dir, "region")
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(
          count(lit(1)).as("n_customers"),
          CoreOps.dsum(col("c_acctbal")).as("sum_acctbal"))
        .orderBy("r_name")
    },

    // P1+A2: status filter + counted rejects (reference pipeline.py:45-46),
    // 'error' events playing the non-200 responses.
    "q_status_filter" -> { (s, dir) =>
      Tables(s, dir, "events")
        .filter(col("event_type") === "error")
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_errors"), CoreOps.dsum(col("value")).as("sum_value"))
        .orderBy("user_id")
    },

    // F5: JSON point lookups without full parse (get_json_object), the
    // response.json() analog (reference pipeline.py:67).
    "q_json_extract" -> { (s, dir) =>
      Tables(s, dir, "events").select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast(LongType).as("k_value"))
        .filter(col("k_value") > 90)
        .orderBy("event_id")
    },

    // F5 extension — Spark 4 VARIANT: the open-schema path for payloads
    // whose shape drifts (the reference's raw API JSON is exactly this).
    // A nested document is built in-row, parsed to the binary variant
    // encoding once, then typed `variant_get` paths drive a filter and
    // an aggregate — no schema declared anywhere, fields stay lazily
    // typed. The oracle recomputes from the flat columns, so the check
    // proves the variant encode → path-extract round trip is lossless
    // (sums ride the DECIMAL(18,4) exact-grid like every value agg).
    // Spark 4 NATIVE XML (moved into sql/core in 4.0): to_xml renders
    // each order as an element, from_xml parses it back through a typed
    // schema — the export-feed ingest shape without an external
    // spark-xml package. The roundtrip is lossless for the typed
    // fields (whatever rendering to_xml picks, from_xml inverts it),
    // so the oracle aggregates the original columns directly; the sum
    // goes through the exact-decimal route like q_variant_extract's.
    "q_xml_extract" -> { (s, dir) =>
      val sch = org.apache.spark.sql.types.StructType.fromDDL(
        "id BIGINT, status STRING, total DOUBLE")
      Tables(s, dir, "orders")
        .withColumn("x", to_xml(struct(
          col("o_orderkey").as("id"), col("o_orderstatus").as("status"),
          col("o_totalprice").cast(DoubleType).as("total"))))
        .select(from_xml(col("x"), sch).as("r"))
        .select(col("r.status").as("status"), col("r.total").as("total"))
        .filter(col("total") > 100000.0)
        .groupBy("status")
        .agg(count(lit(1)).as("n"),
          graft.ops.CoreOps.dsum(col("total")).as("sum_total"))
        .orderBy("status")
    },

    "q_variant_extract" -> { (s, dir) =>
      val doc = to_json(struct(
        col("event_type").as("t"), col("value").as("v"),
        struct(col("user_id").as("u"),
          get_json_object(col("props"), "$.k").cast(LongType).as("k")).as("meta")))
      Tables(s, dir, "events")
        .withColumn("var", parse_json(doc))
        .select(
          variant_get(col("var"), "$.t", "string").as("t"),
          variant_get(col("var"), "$.meta.k", "bigint").as("k"),
          variant_get(col("var"), "$.v", "double").as("v"))
        .filter(col("k") > 50)
        .groupBy("t")
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
          graft.ops.CoreOps.dsum(col("v")).as("sum_value"))
        .orderBy("t")
    },

    // J2 extension — Spark 4 collations: the dirty-data dim join where
    // reference codes arrive in inconsistent case (every real lookup
    // table eventually does). UTF8_LCASE collation makes the EQUALITY
    // case-insensitive inside the join operator itself, where a
    // lower()-wrapped key would block any future dictionary/stats
    // reuse on the column. Spark 4.1 IGNORES the broadcast hint when
    // the collation is applied as a collate() EXPRESSION inside the
    // join condition (a schema-level collated column would broadcast
    // via collationkey — CollationPlanSpec pins both spellings) —
    // measured at 12.5 s for a 5-row dim at sf0.1 when the raw fact
    // shuffled/sorted through the resulting SMJ. The keeper fix is
    // better than either spelling: the partial COUNT/SUM aggregate
    // runs BELOW the join on the binary-collation event_type (sums
    // distribute over the join), and the collated SMJ + regroup see
    // |distinct types| rows, not the corpus — flat at 100 TB, and
    // collated grouping itself is sort-based (the other cliff), so
    // grouping on the binary key is the right call twice over.
    "q_collated_join" -> { (s, dir) =>
      import s.implicits._
      val dim = Seq(
        ("CLICK", "engagement"), ("View", "engagement"),
        ("Purchase", "conversion"), ("ERROR", "ops"), ("signup", "growth"))
        .toDF("code", "category")
      Tables(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n0"),
          sum(col("value").cast(DecimalType(18, 4))).as("v0"))
        .join(dim,
          collate(col("event_type"), "UTF8_LCASE") ===
            collate(col("code"), "UTF8_LCASE"))
        .groupBy("category")
        .agg(sum(col("n0")).as("n"),
          sum(col("v0")).cast(DoubleType).as("sum_value"))
        .orderBy("category")
    },

    // S2: the reference's paginated pushdown-capable match-ID listing as
    // a real DataSourceV2 connector (graft.sources.MatchIdsSource) —
    // queue predicate + limit reach the source (spec-verified fetch
    // counts; no DuckDB twin exists, so rows-only here).
    "q_rest_scan" -> { (s, _) =>
      s.read.format("graft.sources.MatchIdsSource")
        .option("queues", "400,430,450").option("idsPerQueue", 500)
        .load()
        .filter(col("queue").isin(400, 450))
        .groupBy(col("queue"))
        .agg(count(lit(1)).as("n_ids"), min(col("match_id")).as("first_id"))
        .orderBy("queue")
    },

    // F1: unix-ms epoch -> date string (reference utils/utils.py:84-91),
    // ms epochs derived from the events timestamps.
    "q_ms_to_date" -> { (s, dir) =>
      Tables(s, dir, "events").select(
        col("event_id"),
        unix_millis(col("ts")).as("epoch_ms"),
        CoreOps.msToDate(unix_millis(col("ts"))).as("event_date"))
        .orderBy("event_id")
    })

  val oracles: Map[String, String] = Map(
    // The DSv2 source is synthetic-deterministic (NA1_<queue>_<seq> ids),
    // so its aggregate has a golden result: the oracle pins that filter
    // pushdown + limit produce exactly the right rows end to end.
    "q_rest_scan" ->
      """SELECT queue, n_ids, first_id FROM (VALUES
           (400, CAST(500 AS BIGINT), 'NA1_400_0000000'),
           (450, CAST(500 AS BIGINT), 'NA1_450_0000000'))
         t(queue, n_ids, first_id) ORDER BY queue""",
    "q_flatten_project" ->
      """SELECT event_id, user_id, event_type,
         strftime(ts, '%Y-%m-%d') AS day,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS props_k,
         CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
              THEN 'high' ELSE 'low' END AS k_band,
         value
         FROM events WHERE event_type <> 'error' ORDER BY event_id""",
    "q_union_distinct_limit" ->
      """SELECT DISTINCT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM (
           SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM orders WHERE o_totalprice < 100000
           UNION ALL
           SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM orders WHERE o_orderstatus = 'F')
         ORDER BY o_orderkey LIMIT 100""",
    "q_array_lookup" ->
      """SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         string_split(text, ' ')[1] AS first_word,
         string_split(text, ' ')[-1] AS last_word,
         CAST(list_position(string_split(text, ' '), 'merge') AS BIGINT) AS merge_pos
         FROM documents ORDER BY doc_id""",
    "q_cond_project" ->
      """SELECT event_id, event_type,
         CASE event_type WHEN 'click' THEN 1 WHEN 'view' THEN 2 WHEN 'purchase' THEN 3
                         WHEN 'signup' THEN 4 WHEN 'error' THEN 5 END AS type_code,
         CASE WHEN value >= 100 THEN 'big' ELSE 'small' END AS size_band
         FROM events ORDER BY event_id""",
    "q_dim_join" ->
      """SELECT r_name, count(*) AS n_customers,
         CAST(CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_acctbal
         FROM customer JOIN nation ON c_nationkey = n_nationkey
                       JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name ORDER BY r_name""",
    "q_status_filter" ->
      """SELECT user_id, count(*) AS n_errors,
         CAST(CAST(sum(CAST(value AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_value
         FROM events WHERE event_type = 'error'
         GROUP BY user_id ORDER BY user_id""",
    "q_json_extract" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value
         FROM events WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 90
         ORDER BY event_id""",
    "q_ms_to_date" ->
      """SELECT event_id, epoch_ms(ts) AS epoch_ms,
         strftime(ts, '%Y-%m-%d') AS event_date
         FROM events ORDER BY event_id""",
    "q_collated_join" ->
      """WITH dim(code, category) AS (VALUES
           ('CLICK', 'engagement'), ('View', 'engagement'),
           ('Purchase', 'conversion'), ('ERROR', 'ops'), ('signup', 'growth'))
         SELECT category, count(*) AS n,
           CAST(CAST(sum(CAST(value AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_value
         FROM events e JOIN dim d ON lower(e.event_type) = lower(d.code)
         GROUP BY category ORDER BY category""",
    "q_variant_extract" ->
      """SELECT event_type AS t, count(*) AS n,
         CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
         CAST(CAST(sum(CAST(value AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_value
         FROM events
         WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
         GROUP BY event_type ORDER BY t""",

    "q_xml_extract" ->
      """SELECT o_orderstatus AS status, CAST(count(*) AS BIGINT) AS n,
         CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE)
           AS sum_total
         FROM orders WHERE o_totalprice > 100000.0
         GROUP BY o_orderstatus ORDER BY status""")
}
