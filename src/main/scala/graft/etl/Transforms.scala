package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}

import graft.Tables

/** ETL transform layer — Spark-native rebuilds of the reference's pandas
  * cleaning pipelines `eda_complaints` (python.py:66-111) and `eda_demo`
  * (python.py:115-185), mapped onto the driver corpus's `events` table
  * (FIXTURES.md role mapping). Each pandas idiom becomes one lazy DataFrame
  * chain — Catalyst collapses the whole transform into a single plan with
  * projection pruning and filter pushdown (verified: PushedFilters on the
  * ts range reaches the parquet scan).
  *
  * Determinism policy (SURVEY.md §5): the reference's unseeded
  * np.random.choice imputation (python.py:73-100) is replaced by a
  * hash-indexed pick from the sorted distinct value list — same
  * distributional idea, reproducible on both engines; ROW_NUMBER mode picks
  * carry (count DESC, value ASC) tie-breakers; medians are rounded to 6dp
  * because the two engines' interpolation formulas may differ in the last
  * ulp.
  *
  * Scale notes: pivots enumerate their key domain explicitly (no
  * collect-distinct pass); imputation fill values are per-group aggregates
  * joined back via broadcast (group cardinality is bounded); the
  * hash-indexed random pick cross-joins a single-row aggregate (broadcast
  * nested loop of 1 row — constant memory at any SF).
  */
object Transforms {

  /** The 5-value event_type domain, enumerated so pivot needs no extra
    * domain-discovery job (python.py:159-160's pivot_table columns). */
  private val EventTypes = Seq("click", "error", "purchase", "signup", "view")

  /** A9 pivot + A10 melt round-trip + A13 first-value aggregate
    * (python.py:129 melt, 159-160 pivot_table aggfunc='first').
    * Long → wide (pivot with explicit domain) → long again (unpivot), plus
    * a deterministic first-value (min_by over the unique event_id ordering).
    * The unpivot restores the pre-pivot long shape — the round trip is the
    * melt↔pivot inverse pair the reference's ETL relies on. */
  def meltPivot(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val grouped = ev
      .groupBy((col("user_id") % 50).as("grp"), col("event_type"))
      .agg(round(sum(col("value")), 6).as("total"),
        min_by(col("value"), col("event_id")).as("first_val"))
    val wide = grouped
      .groupBy(col("grp"))
      .pivot("event_type", EventTypes)
      .agg(first(col("total")))  // A13: one row per (grp, type) → first is exact
    val long = wide.unpivot(
      Array(col("grp")),
      EventTypes.map(col).toArray,
      "event_type", "total")
    long
      .filter(col("total").isNotNull)
      .join(grouped.select("grp", "event_type", "first_val"),
        Seq("grp", "event_type"))
      .orderBy("grp", "event_type")
  }

  val meltPivotSql: String =
    """WITH grouped AS (
      |  SELECT user_id % 50 AS grp, event_type,
      |         round(sum(value), 6) AS total,
      |         min_by(value, event_id) AS first_val
      |  FROM events GROUP BY 1, 2
      |), wide AS (
      |  SELECT grp,
      |         first(total) FILTER (WHERE event_type = 'click')    AS click,
      |         first(total) FILTER (WHERE event_type = 'error')    AS error,
      |         first(total) FILTER (WHERE event_type = 'purchase') AS purchase,
      |         first(total) FILTER (WHERE event_type = 'signup')   AS signup,
      |         first(total) FILTER (WHERE event_type = 'view')     AS view
      |  FROM grouped GROUP BY grp
      |), long AS (
      |  SELECT grp, 'click' AS event_type, click AS total FROM wide
      |  UNION ALL SELECT grp, 'error', error FROM wide
      |  UNION ALL SELECT grp, 'purchase', purchase FROM wide
      |  UNION ALL SELECT grp, 'signup', signup FROM wide
      |  UNION ALL SELECT grp, 'view', view FROM wide
      |)
      |SELECT l.grp, l.event_type, l.total, g.first_val
      |FROM long l JOIN grouped g USING (grp, event_type)
      |WHERE l.total IS NOT NULL
      |ORDER BY grp, event_type""".stripMargin

  /** P8 null-mask + A11 grouped median imputation + A12 grouped mode
    * imputation + F10 deterministic random-choice imputation
    * (python.py:73-100, 170-181). Nulls are injected deterministically
    * (event_id ≡ 0 mod 7 for value, ≡ 0 mod 11 for event_type), then:
    *  - value_filled: per-(user_id%10) exact median of surviving values;
    *  - type_filled: per-(user_id%10) mode with (count DESC, value ASC)
    *    tie-break, via ROW_NUMBER over the group's value counts;
    *  - type_random: md5-hash-indexed pick from the global sorted distinct
    *    event_type list (the reproducible np.random.choice stand-in). */
  def groupImpute(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .withColumn("grp", col("user_id") % 10)
      .withColumn("value_n",
        when(col("event_id") % 7 === 0, lit(null)).otherwise(col("value")))
      .withColumn("type_n",
        when(col("event_id") % 11 === 0, lit(null)).otherwise(col("event_type")))
    val medians = ev.groupBy("grp")
      .agg(median(col("value_n")).as("grp_median"))
    val modes = ev.filter(col("type_n").isNotNull)
      .groupBy(col("grp"), col("type_n")).count()
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("grp"))
          .orderBy(col("count").desc, col("type_n"))))
      .filter(col("rn") === 1)
      .select(col("grp"), col("type_n").as("grp_mode"))
    val domain = ev.filter(col("type_n").isNotNull)
      .agg(array_sort(collect_set(col("type_n"))).as("types"))
    ev
      .join(broadcast(medians), Seq("grp"))
      .join(broadcast(modes), Seq("grp"))
      .crossJoin(broadcast(domain))
      .select(
        col("event_id"), col("grp"),
        round(coalesce(col("value_n"), col("grp_median")), 6).as("value_filled"),
        coalesce(col("type_n"), col("grp_mode")).as("type_filled"),
        coalesce(col("type_n"),
          element_at(col("types"),
            (conv(substring(md5(col("event_id").cast("string")), 1, 8), 16, 10)
              .cast("long") % size(col("types")) + 1).cast("int")))
          .as("type_random"))
      .orderBy("event_id")
  }

  val groupImputeSql: String =
    """WITH ev AS (
      |  SELECT event_id, user_id % 10 AS grp,
      |         CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS value_n,
      |         CASE WHEN event_id % 11 = 0 THEN NULL ELSE event_type END AS type_n
      |  FROM events
      |), medians AS (
      |  SELECT grp, median(value_n) AS grp_median FROM ev GROUP BY grp
      |), modes AS (
      |  SELECT grp, type_n AS grp_mode FROM (
      |    SELECT grp, type_n, count(*) AS c,
      |           ROW_NUMBER() OVER (PARTITION BY grp ORDER BY count(*) DESC, type_n) AS rn
      |    FROM ev WHERE type_n IS NOT NULL GROUP BY grp, type_n
      |  ) WHERE rn = 1
      |), domain AS (
      |  SELECT list_sort(list(DISTINCT type_n)) AS types FROM ev WHERE type_n IS NOT NULL
      |)
      |SELECT event_id, grp,
      |       round(coalesce(value_n, grp_median), 6) AS value_filled,
      |       coalesce(type_n, grp_mode) AS type_filled,
      |       coalesce(type_n,
      |         types[(('0x' || substr(md5(event_id::VARCHAR), 1, 8))::BIGINT % len(types) + 1)::INT])
      |         AS type_random
      |FROM ev
      |JOIN medians USING (grp)
      |JOIN modes USING (grp)
      |CROSS JOIN domain
      |ORDER BY event_id""".stripMargin

  /** The eda_complaints-shaped cleaning chain (python.py:66-111): column
    * drops (P2), column-name predicate projection (P3), date-range filter
    * pushed to the scan (P4), TO_DATE round-trip (F2), binary flag mapping
    * (F7), split-from-right (F8, python.py:132's rsplit), substring
    * replace + value remap (F9), and int cast (F11). */
  def cleanEvents(spark: SparkSession, dir: String): DataFrame = {
    val raw = Tables.events(spark, dir).drop("props") // P2
    // P3: keep columns whose name does not end in `_id` (metadata-level
    // projection, mirroring python.py:121-124's census-name filter) — plus
    // event_id retained explicitly as the row key.
    val kept = raw.columns.toSeq.filterNot(_.endsWith("_id"))
    val df = raw.select((col("event_id") +: kept.map(col)): _*)
    df
      .filter(col("ts").between("2024-01-05", "2024-01-25")) // P4
      .withColumn("day", to_date(date_format(col("ts"), "yyyy-MM-dd"), "yyyy-MM-dd")) // F2
      .withColumn("is_error", when(col("event_type") === "error", 1).otherwise(0)) // F7
      .withColumn("metric", concat(col("event_type"), lit("."), date_format(col("ts"), "yyyy")))
      .withColumn("metric_name", regexp_extract(col("metric"), "^(.*)\\.([0-9]{4})$", 1)) // F8
      .withColumn("metric_year", regexp_extract(col("metric"), "^(.*)\\.([0-9]{4})$", 2).cast("int"))
      .withColumn("type_clean", // F9: substring replace + value remap
        when(regexp_replace(col("event_type"), "^e", "E") === "Error", "incident")
          .otherwise(regexp_replace(col("event_type"), "^e", "E")))
      .withColumn("value_int", col("value").cast("int")) // F11
      .select("event_id", "day", "event_type", "type_clean", "is_error",
        "metric_name", "metric_year", "value_int")
      .orderBy("event_id")
  }

  val cleanEventsSql: String =
    """SELECT event_id,
      |       strftime(ts, '%Y-%m-%d')::DATE AS day,
      |       event_type,
      |       CASE WHEN regexp_replace(event_type, '^e', 'E') = 'Error' THEN 'incident'
      |            ELSE regexp_replace(event_type, '^e', 'E') END AS type_clean,
      |       CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS is_error,
      |       regexp_extract(event_type || '.' || strftime(ts, '%Y'), '^(.*)\.([0-9]{4})$', 1) AS metric_name,
      |       regexp_extract(event_type || '.' || strftime(ts, '%Y'), '^(.*)\.([0-9]{4})$', 2)::INT AS metric_year,
      |       trunc(value)::INT AS value_int  -- Spark's double->int cast truncates; DuckDB's rounds
      |FROM events
      |WHERE ts BETWEEN '2024-01-05' AND '2024-01-25'
      |ORDER BY event_id""".stripMargin

  /** S3 JSON flatten (python.py:59's json_normalize): parse the string
    * `props` JSON with an explicit schema, flatten the nested field, and
    * aggregate it per event_type. S2's projection-into-nested-source is the
    * same select on the parsed struct. */
  def jsonFlatten(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val schema = StructType(Seq(StructField("k", IntegerType)))
    ev
      .withColumn("props_k", from_json(col("props"), schema).getField("k"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("props_k")).as("k_sum"),
        min(col("props_k")).as("k_min"),
        max(col("props_k")).as("k_max"))
      .orderBy("event_type")
  }

  val jsonFlattenSql: String =
    """SELECT event_type, count(*) AS n,
      |       CAST(sum(json_extract(props, '$.k')::INT) AS BIGINT) AS k_sum,
      |       min(json_extract(props, '$.k')::INT) AS k_min,
      |       max(json_extract(props, '$.k')::INT) AS k_max
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** COMPOSITE ETL entry — the full python.py stage ORDER in one
    * oracle-paired chain (extract → clean → aggregate → pivot → melt →
    * group-median impute → load, python.py:66-185). The pieces are
    * verified separately (`etl_clean_events`, `etl_melt_pivot`,
    * `etl_group_impute`, `etl_json_flatten`); this entry pins their
    * COMPOSITION — the reference runs them as one pipeline
    * (eda_complaints then eda_demo's melt→pivot_table→groupwise-median
    * fill before load, python.py:110/185), and a refactor that reorders
    * or drops a stage must fail an entry, not just a unit test.
    *
    * Null policy: imputation holes are injected deterministically after
    * the melt ((grp + len(type)) ≡ 0 mod 9 — the `etl_group_impute`
    * idiom), so the impute stage always has work at every SF, then
    * filled with the per-event_type 6dp-rounded median of surviving
    * totals (python.py:170-175's groupby-median fillna).
    *
    * Scale shape: one shuffle for the (grp, type) aggregate (map-side
    * partials), a domain-enumerated pivot (no collect-distinct pass),
    * unpivot is map-side, and the median table is type-cardinality rows
    * broadcast back — the whole pipeline is one pass over the fact scan
    * (with the ts filter pushed) plus bounded-size joins. */
  def etlFullPipeline(spark: SparkSession, dir: String): DataFrame = {
    // stage 1-2: extract + clean (P2 drop, P4 pushed range filter, F11 cast)
    val cleaned = Tables.events(spark, dir)
      .drop("props")
      .filter(col("ts").between("2024-01-05", "2024-01-25"))
      .select((col("user_id") % 50).as("grp"), col("event_type"),
        col("value").cast("int").as("value_int"))
    // stage 3: aggregate long → pivot wide (explicit domain)
    val wide = cleaned
      .groupBy("grp")
      .pivot("event_type", EventTypes)
      .agg(sum(col("value_int")))
    // stage 4: melt back to long + deterministic imputation holes
    val long = wide.unpivot(
        Array(col("grp")),
        EventTypes.map(col).toArray,
        "event_type", "total")
      .withColumn("total_n",
        when((col("grp") + length(col("event_type"))) % 9 === 0, lit(null))
          .otherwise(col("total").cast("double")))
    // stage 5: impute with the per-type median of surviving totals
    val med = long.filter(col("total_n").isNotNull)
      .groupBy("event_type")
      .agg(round(median(col("total_n")), 6).as("type_median"))
    // stage 6: load-shaped final projection
    long.join(broadcast(med), Seq("event_type"))
      .select(col("grp"), col("event_type"),
        round(coalesce(col("total_n"), col("type_median")), 6).as("total_filled"),
        col("total_n").isNull.as("was_imputed"))
      .orderBy("grp", "event_type")
  }

  val etlFullPipelineSql: String =
    """WITH cleaned AS (
      |  SELECT user_id % 50 AS grp, event_type, trunc(value)::INT AS value_int
      |  FROM events WHERE ts BETWEEN '2024-01-05' AND '2024-01-25'
      |), agged AS (
      |  SELECT grp, event_type, sum(value_int) AS total FROM cleaned GROUP BY 1, 2
      |), wide AS (
      |  SELECT grp,
      |         first(total) FILTER (WHERE event_type = 'click')    AS click,
      |         first(total) FILTER (WHERE event_type = 'error')    AS error,
      |         first(total) FILTER (WHERE event_type = 'purchase') AS purchase,
      |         first(total) FILTER (WHERE event_type = 'signup')   AS signup,
      |         first(total) FILTER (WHERE event_type = 'view')     AS view
      |  FROM agged GROUP BY grp
      |), long AS (
      |  SELECT grp, 'click' AS event_type, click AS total FROM wide
      |  UNION ALL SELECT grp, 'error', error FROM wide
      |  UNION ALL SELECT grp, 'purchase', purchase FROM wide
      |  UNION ALL SELECT grp, 'signup', signup FROM wide
      |  UNION ALL SELECT grp, 'view', view FROM wide
      |), holed AS (
      |  SELECT grp, event_type,
      |         CASE WHEN (grp + length(event_type)) % 9 = 0 THEN NULL
      |              ELSE total::DOUBLE END AS total_n
      |  FROM long
      |), med AS (
      |  SELECT event_type, round(median(total_n), 6) AS type_median
      |  FROM holed WHERE total_n IS NOT NULL GROUP BY event_type
      |)
      |SELECT h.grp, h.event_type,
      |       round(coalesce(h.total_n, m.type_median), 6) AS total_filled,
      |       h.total_n IS NULL AS was_imputed
      |FROM holed h JOIN med m USING (event_type)
      |ORDER BY grp, event_type""".stripMargin

  /** Schema-drift union — the ingest step that reconciles two crawl
    * snapshots whose schemas evolved between runs: the older extract
    * lacks a column the newer one added (`lang`), the newer one dropped
    * a column the older one carried (`n_chars`). `unionByName` with
    * `allowMissingColumns` aligns BY NAME and null-fills the gaps —
    * positional UNION would silently pair mismatched columns, the
    * classic schema-drift corruption. A `snapshot` tag preserves
    * provenance for the downstream drift reports (`length_psi_drift`).
    *
    * Scale shape: pure map-side — two scans, a column alignment, zero
    * exchanges beyond the final presentation sort; drift reconciliation
    * costs nothing but the scans at any corpus size. */
  def unionSchemaDrift(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val older = d.filter(col("doc_id") % 2 === 0)
      .select(col("doc_id"), col("source"), col("n_chars"))
      .withColumn("snapshot", lit("s1"))
    val newer = d.filter(col("doc_id") % 2 === 1)
      .select(col("doc_id"), col("source"), col("lang"))
      .withColumn("snapshot", lit("s2"))
    older.unionByName(newer, allowMissingColumns = true)
      .orderBy("doc_id")
  }

  val unionSchemaDriftSql: String =
    """SELECT doc_id, source, n_chars, 's1' AS snapshot, CAST(NULL AS VARCHAR) AS lang
      |FROM documents WHERE doc_id % 2 = 0
      |UNION ALL
      |SELECT doc_id, source, CAST(NULL AS BIGINT) AS n_chars, 's2' AS snapshot, lang
      |FROM documents WHERE doc_id % 2 = 1
      |ORDER BY doc_id""".stripMargin
}
