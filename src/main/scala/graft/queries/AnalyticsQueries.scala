package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Determinism._
import graft.operators.CacheOnce.PersistFreshOps

/** Round-8 analytics additions: the exact-quantile / graph-motif /
  * data-profiling / wide-pivot / changelog-compaction family — the
  * warehouse-side primitives a curation stack reports with, each in
  * its scale-safe shape with a DuckDB oracle.
  */
object AnalyticsQueries {

  /** q117 — EXACT per-group quantiles (p50/p90/p99) via the
    * value-histogram cumulative shape: the ground truth q70's
    * approx-percentile sketch is allowed to approximate (deva exposes
    * quantiles through its stats pipe ops; the exact form is what a
    * report quotes).
    *
    * Scale/shape: the corpus collapses FIRST to the (event_type,
    * cents) count frame — bounded by the value domain, not the row
    * count, so the cumulative window runs over a histogram that stays
    * the same size at 100 TB. Rank targets are pure integer math
    * (ceil(p·n/100) as (p·n+99) div 100 — no double rounding at
    * exact rank boundaries), and the selected quantile is a min over
    * the qualifying histogram rows: every step is order-free and
    * engine-portable. The only corpus-linear work is the one
    * histogram aggregation with map-side partials.
    */
  def q117_exact_quantiles(spark: SparkSession, dir: String): DataFrame = {
    val hist = Tables.events(spark, dir)
      .groupBy(col("event_type"), dec2(col("value")).as("v"))
      .agg(count(lit(1)).as("c"))
    val cum = hist.withColumn("cum",
      sum(col("c")).over(Window.partitionBy(col("event_type")).orderBy(col("v"))))
    val tot = hist.groupBy(col("event_type")).agg(sum(col("c")).as("n"))
    cum.join(broadcast(tot), "event_type")
      .select(col("event_type"), col("v"), col("cum"), col("n"),
        explode(array(lit(50L), lit(90L), lit(99L))).as("p"))
      .filter(col("cum") >= expr("(p * n + 99) div 100"))
      .groupBy(col("event_type"), col("p"))
      .agg(min(col("v")).cast("double").as("q"))
      .orderBy(col("event_type"), col("p"))
  }

  val q117_exact_quantiles_sql: String =
    """WITH hist AS (
      |  SELECT event_type, CAST(value AS DECIMAL(18,2)) AS v, COUNT(*) AS c
      |  FROM events GROUP BY 1, 2),
      |cum AS (
      |  SELECT event_type, v, c,
      |    SUM(c) OVER (PARTITION BY event_type ORDER BY v) AS cum
      |  FROM hist),
      |tot AS (SELECT event_type, SUM(c) AS n FROM hist GROUP BY 1),
      |ps AS (SELECT * FROM (VALUES (50), (90), (99)) AS t(pp))
      |SELECT c.event_type, CAST(ps.pp AS BIGINT) AS p, CAST(MIN(c.v) AS DOUBLE) AS q
      |FROM cum c JOIN tot t USING (event_type) CROSS JOIN ps
      |WHERE c.cum >= (ps.pp * t.n + 99) // 100
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** q118 — triangle counting over the supplier ASSOCIATION graph
    * (suppliers co-occurring in ≥ 5 orders — the support threshold is
    * part of the graph construction, as in market-basket association
    * graphs: an unthresholded co-occurrence projection of a dense
    * bipartite layer approaches the complete graph and its triangle
    * set grows cubically with no analytic meaning), DEGREE-ORIENTED:
    * each undirected
    * edge is directed from its lower-(degree, id) endpoint, wedges
    * are enumerated only among a node's out-neighbors, and a wedge is
    * a triangle iff its closing edge exists with the same
    * orientation. Orientation bounds every node's wedge fan-out by
    * its OUT-degree ≤ O(√m) on any graph (Chiba–Nishizeki / the
    * standard MapReduce triangle scheme) — an id-ordered enumeration
    * would square the hubs that a power-law co-occurrence graph
    * always has. The count is orientation-independent, so the oracle
    * runs the naive id-ordered 3-way self-join: the gate proves the
    * oriented plan ≡ naive, triangle for triangle.
    *
    * Scale/shape: in-order pair expansion is bounded by
    * suppliers-per-order (q45's in-bucket idiom); the degree table
    * joins edge-keyed (never collected); triangles attribute to their
    * least supplier id, whose nation gives a label-sized final agg.
    */
  def q118_triangles(spark: SparkSession, dir: String): DataFrame =
    trianglesFrom(spark, dir, Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("o"), col("l_suppkey").as("s")))

  /** The triangle-count tail over an (o, s) order-membership frame —
    * shared verbatim by batch q118 and its streaming twin q230
    * (pairing #50): one-shuffle co-occurrence edge build (VERDICT
    * r8: the distinct + self-join form paid two exchanges for the
    * same graph; kernel in operators/Triangles, spec'd on a planted
    * graph), degree-oriented enumeration, nation rollup.
    */
  private[queries] def trianglesFrom(spark: SparkSession, dir: String,
      os: DataFrame): DataFrame = {
    val edges = graft.operators.Triangles.cooccurrenceEdges(
      os, "o", "s", minSupport = 5)
    val tri = graft.operators.Triangles.triangles(edges)
      .select(least(col("u"), col("v"), col("w")).as("m"))
    tri.join(Tables.supplier(spark, dir), col("m") === col("s_suppkey"))
      .groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("n_tri"))
      .orderBy(col("s_nationkey"))
  }

  val q118_triangles_sql: String =
    """WITH os AS (SELECT DISTINCT l_orderkey AS o, l_suppkey AS s FROM lineitem),
      |e AS (SELECT a, b FROM (
      |        SELECT x.s AS a, y.s AS b, COUNT(*) AS c
      |        FROM os x JOIN os y ON x.o = y.o AND x.s < y.s
      |        GROUP BY 1, 2)
      |      WHERE c >= 5),
      |tri AS (SELECT e1.a AS m
      |        FROM e e1 JOIN e e2 ON e2.a = e1.b
      |                  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b)
      |SELECT s_nationkey, COUNT(*) AS n_tri
      |FROM tri JOIN supplier ON s_suppkey = m
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** q119 — one-pass column profiler over `documents` (the
    * deequ/data-quality summary every ingest step should emit):
    * per-column null counts, exact distinct counts, and numeric/length
    * extremes, unpivoted to (col_name, metric, value) rows.
    *
    * Scale/shape: ONE corpus scan; the multi-column exact
    * countDistinct costs one Expand (×5 on the pruned 5-column
    * projection) — the honest exact shape. At 100 TB a profiler swaps
    * in approx_count_distinct (same plan minus the Expand; HLL
    * partials merge map-side) — the spec asserts the approx path
    * lands within its error band of these exact counts. Extremes and
    * null counts are plain min/max/conditional-count partials.
    */
  def q119_profile(spark: SparkSession, dir: String): DataFrame = {
    def nulls(c: String) = sum(when(col(c).isNull, 1L).otherwise(0L))
    val row = Tables.documents(spark, dir).agg(
      count(lit(1)).as("n_rows"),
      nulls("doc_id").as("docid_nulls"), countDistinct(col("doc_id")).as("docid_distinct"),
      nulls("text").as("text_nulls"), countDistinct(col("text")).as("text_distinct"),
      min(length(col("text"))).cast("long").as("text_minlen"),
      max(length(col("text"))).cast("long").as("text_maxlen"),
      nulls("lang").as("lang_nulls"), countDistinct(col("lang")).as("lang_distinct"),
      nulls("source").as("source_nulls"), countDistinct(col("source")).as("source_distinct"),
      nulls("n_chars").as("nchars_nulls"), countDistinct(col("n_chars")).as("nchars_distinct"),
      min(col("n_chars")).as("nchars_min"), max(col("n_chars")).as("nchars_max"),
      sum(col("n_chars")).as("nchars_sum"))
    row.select(expr(
      """stack(16,
        |  '_table',  'rows',     n_rows,
        |  'doc_id',  'nulls',    docid_nulls,
        |  'doc_id',  'distinct', docid_distinct,
        |  'text',    'nulls',    text_nulls,
        |  'text',    'distinct', text_distinct,
        |  'text',    'min_len',  text_minlen,
        |  'text',    'max_len',  text_maxlen,
        |  'lang',    'nulls',    lang_nulls,
        |  'lang',    'distinct', lang_distinct,
        |  'source',  'nulls',    source_nulls,
        |  'source',  'distinct', source_distinct,
        |  'n_chars', 'nulls',    nchars_nulls,
        |  'n_chars', 'distinct', nchars_distinct,
        |  'n_chars', 'min',      nchars_min,
        |  'n_chars', 'max',      nchars_max,
        |  'n_chars', 'sum',      nchars_sum) AS (col_name, metric, value)""".stripMargin))
      .orderBy(col("col_name"), col("metric"))
  }

  val q119_profile_sql: String =
    """SELECT col_name, metric, CAST(value AS BIGINT) AS value FROM (
      |  SELECT '_table' AS col_name, 'rows' AS metric, COUNT(*)::BIGINT AS value FROM documents
      |  UNION ALL SELECT 'doc_id', 'nulls', COUNT(*) FILTER (doc_id IS NULL) FROM documents
      |  UNION ALL SELECT 'doc_id', 'distinct', COUNT(DISTINCT doc_id) FROM documents
      |  UNION ALL SELECT 'text', 'nulls', COUNT(*) FILTER (text IS NULL) FROM documents
      |  UNION ALL SELECT 'text', 'distinct', COUNT(DISTINCT text) FROM documents
      |  UNION ALL SELECT 'text', 'min_len', MIN(LENGTH(text)) FROM documents
      |  UNION ALL SELECT 'text', 'max_len', MAX(LENGTH(text)) FROM documents
      |  UNION ALL SELECT 'lang', 'nulls', COUNT(*) FILTER (lang IS NULL) FROM documents
      |  UNION ALL SELECT 'lang', 'distinct', COUNT(DISTINCT lang) FROM documents
      |  UNION ALL SELECT 'source', 'nulls', COUNT(*) FILTER (source IS NULL) FROM documents
      |  UNION ALL SELECT 'source', 'distinct', COUNT(DISTINCT source) FROM documents
      |  UNION ALL SELECT 'n_chars', 'nulls', COUNT(*) FILTER (n_chars IS NULL) FROM documents
      |  UNION ALL SELECT 'n_chars', 'distinct', COUNT(DISTINCT n_chars) FROM documents
      |  UNION ALL SELECT 'n_chars', 'min', MIN(n_chars) FROM documents
      |  UNION ALL SELECT 'n_chars', 'max', MAX(n_chars) FROM documents
      |  UNION ALL SELECT 'n_chars', 'sum', SUM(n_chars) FROM documents
      |) ORDER BY col_name, metric""".stripMargin

  /** q120 — wide pivot through Spark's NATIVE pivot operator with
    * explicit values (q29 hand-writes the conditional aggregation;
    * this exercises the relational PIVOT surface itself): daily
    * event-type matrix, count + exact-decimal sum per cell.
    *
    * Scale/shape: pivot WITH a value list is a single map-side
    * conditional aggregation — one shuffle on the day key, columns
    * bounded by the declared label set. (Valueless pivot would run a
    * distinct-collect job first and embed an unbounded label set in
    * the schema — never that form at scale.)
    */
  def q120_pivot_wide(spark: SparkSession, dir: String): DataFrame =
    pivotWideFrom(Tables.events(spark, dir)
      .withColumn("day", to_date(col("ts")))
      .groupBy(col("day"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(dec2(col("value"))).as("s")))

  /** The wide-pivot tail over pre-aggregated (day, event_type, n, s)
    * CELLS — shared verbatim by batch q120 and its streaming twin
    * q234 (pairing #54). The cell split is free for the batch (the
    * pivot's partial aggregation computed the cells anyway) and is
    * exactly the label-bounded state the twin maintains online; the
    * sums here are identities over one row per cell.
    */
  private[queries] def pivotWideFrom(cells: DataFrame): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    val piv = cells
      .groupBy(col("day"))
      .pivot("event_type", types)
      .agg(sum(col("n")).as("n"), sum(col("s")).cast("double").as("amt"))
    // pivot leaves empty cells null; counts must read 0 like the
    // oracle's FILTER form (sums stay NULL in both engines)
    val fixed = types.foldLeft(piv) { (df, t) =>
      df.withColumn(s"${t}_n", coalesce(col(s"${t}_n"), lit(0L)))
    }
    fixed.orderBy(col("day"))
  }

  val q120_pivot_wide_sql: String = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    val cells = types.map { t =>
      s"""  COUNT(*) FILTER (event_type = '$t') AS ${t}_n,
         |  CAST(SUM(CAST(value AS DECIMAL(18,2))) FILTER (event_type = '$t') AS DOUBLE) AS ${t}_amt""".stripMargin
    }.mkString(",\n")
    s"""SELECT CAST(ts AS DATE) AS day,
       |$cells
       |FROM events GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** q121 — changelog compaction to the latest snapshot: one row per
    * user carrying the fields of that user's last event ((ts,
    * event_id)-latest — the CDC "upsert view" every incremental
    * ingest materializes).
    *
    * Scale/shape: a SINGLE max(struct(...)) aggregation — the struct
    * comparison is lexicographic on the (ts, event_id) total-order
    * prefix, so the agg is associative and merges MAP-SIDE: each
    * task reduces its slice to one candidate row per key before the
    * shuffle. The window row_number() form sorts whole partitions
    * and cannot partial-aggregate; at 100 TB of changelog that's the
    * difference between shuffling one row per (task, key) and
    * shuffling the corpus. The oracle runs the naive
    * max-ts-then-max-id lookup, so the gate proves struct-max ≡
    * naive row-for-row; a spec asserts ≡ the window form too.
    */
  def q121_latest_snapshot(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(max(struct(col("ts"), col("event_id"), col("event_type"),
        dec2(col("value")).as("v"))).as("m"))
      .select(col("user_id"),
        col("m.ts").as("last_ts"),
        col("m.event_id").as("last_event"),
        col("m.event_type").as("last_type"),
        col("m.v").cast("double").as("last_value"))
      .orderBy(col("user_id"))

  val q121_latest_snapshot_sql: String =
    """WITH mt AS (SELECT user_id, MAX(ts) AS last_ts FROM events GROUP BY 1),
      |me AS (SELECT e.user_id, m.last_ts, MAX(e.event_id) AS last_event
      |       FROM events e JOIN mt m ON e.user_id = m.user_id AND e.ts = m.last_ts
      |       GROUP BY 1, 2)
      |SELECT m.user_id, m.last_ts, m.last_event,
      |  e.event_type AS last_type,
      |  CAST(CAST(e.value AS DECIMAL(18,2)) AS DOUBLE) AS last_value
      |FROM me m JOIN events e ON e.user_id = m.user_id AND e.event_id = m.last_event
      |ORDER BY m.user_id""".stripMargin

  /** q122 — contamination cliques: triangles of the q95 source-overlap
    * graph (sources as nodes, an edge when two sources share verbatim
    * 50-token windows). A PAIR in q95 is a mirror/repost; a TRIANGLE
    * is a syndication ring — content circulating through ≥3 sources,
    * the strongest signal that q81/q82's mixing weights double-count
    * a text lineage. The operator's second domain (VERDICT r8's
    * suggested client): the same degree-oriented kernel that counted
    * supplier co-occurrence motifs (q118, long keys) runs unchanged
    * over a string-keyed provenance graph — node type is incidental
    * to the orientation argument.
    *
    * Scale/shape: the edge frame is q95's output — label-bounded
    * (≤ sources²/2 rows, dozens-sized), so the triangle join is
    * trivially broadcastable and the real work is q95's
    * candidates-then-verify window pass (rolling-hash kernel, one
    * corpus-keyed aggregation). The oracle runs the naive id-ordered
    * 3-way self-join over the SAME edge construction, so the gate
    * proves oriented ≡ naive on a second graph shape (strings,
    * near-clique density) beyond q118's power-law longs.
    */
  def q122_source_triangles(spark: SparkSession, dir: String): DataFrame = {
    val edges = TextQueries.q95_source_overlap(spark, dir)
      .select(col("src_a").as("a"), col("src_b").as("b"))
    val tri = graft.operators.Triangles.triangles(edges)
      .select(array_sort(array(col("u"), col("v"), col("w"))).as("t"))
    tri.select(element_at(col("t"), 1).as("src_a"),
        element_at(col("t"), 2).as("src_b"),
        element_at(col("t"), 3).as("src_c"))
      .orderBy(col("src_a"), col("src_b"), col("src_c"))
  }

  val q122_source_triangles_sql: String =
    s"""WITH e AS (${TextQueries.q95_source_overlap_sql})
       |SELECT e1.src_a AS src_a, e1.src_b AS src_b, e2.src_b AS src_c
       |FROM e e1 JOIN e e2 ON e2.src_a = e1.src_b
       |  JOIN e e3 ON e3.src_a = e1.src_a AND e3.src_b = e2.src_b
       |ORDER BY 1, 2, 3""".stripMargin

  /** q125 — SCD2 history build: the other half of CDC. q121/q124
    * compact a changelog to its LATEST snapshot; a warehouse dimension
    * keeps the FULL history as type-2 validity intervals
    * ([valid_from, valid_to) per (key, attribute-version), open-ended
    * for the current row). Two sub-steps, both standard: change
    * compression (drop updates that repeat the previous value — a
    * CDC feed re-emits unchanged rows constantly) and interval
    * stitching (valid_to = next change's valid_from).
    *
    * Scale/shape: ONE shuffle on the dimension key (user_id,
    * event_type); the lag (compression) and lead (stitching) windows
    * share that partitioning and ordering, and the filter between
    * them preserves both, so Catalyst plans a single Exchange + a
    * single Sort with two Window nodes over it — per-key history
    * never leaves its partition. Ordering is (ts, event_id) so
    * same-timestamp updates resolve deterministically in both
    * engines. At 100 TB this is the canonical "windowed scan"
    * plan: linear, partition-local after one shuffle, no joins.
    */
  def q125_scd2(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    scd2From(Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"),
        dec2(col("value")).as("v"), col("ts"), col("event_id"))
      .withColumn("prev_v", lag(col("v"), 1).over(w))
      .filter(col("prev_v").isNull || col("v") =!= col("prev_v")))
  }

  /** The SCD2 interval-build tail over a CHANGE-POINT frame
    * (user_id, event_type, v, ts, event_id) — shared verbatim by
    * batch q125 and its streaming twin q232 (pairing #52). The
    * valid_to window runs over change points only, never raw
    * events — which is exactly why the streaming twin's per-key
    * change-log state makes the online build cheap.
    */
  private[queries] def scd2From(changes: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    changes
      .withColumn("valid_to", lead(col("ts"), 1).over(w))
      .select(col("user_id"), col("event_type"),
        col("v").cast("double").as("value"),
        col("ts").as("valid_from"), col("valid_to"),
        col("valid_to").isNull.as("is_current"))
      .orderBy(col("user_id"), col("event_type"), col("valid_from"))
  }

  val q125_scd2_sql: String =
    """WITH ordered AS (
      |  SELECT user_id, event_type, CAST(value AS DECIMAL(18,2)) AS v,
      |    ts, event_id,
      |    LAG(CAST(value AS DECIMAL(18,2))) OVER
      |      (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS prev_v
      |  FROM events),
      |changes AS (
      |  SELECT * FROM ordered WHERE prev_v IS NULL OR v <> prev_v),
      |stitched AS (
      |  SELECT user_id, event_type, v, ts,
      |    LEAD(ts) OVER
      |      (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS valid_to
      |  FROM changes)
      |SELECT user_id, event_type, CAST(v AS DOUBLE) AS value,
      |  ts AS valid_from, valid_to, (valid_to IS NULL) AS is_current
      |FROM stitched
      |ORDER BY user_id, event_type, valid_from""".stripMargin

  /** q128 — Z-order layout keys + zone-map bounds: Morton-interleave
    * (user_id, value-cents) into one 32-bit key, split the key space
    * into 64 equal ranges (the "files" a layout write would produce
    * under repartitionByRange(z)), and report each range's row count
    * and per-dimension min/max — exactly the zone-map metadata a
    * parquet reader prunes with. The output IS the scale argument:
    * every bucket's (x, y) bounding box is a small rectangle, so a
    * selective predicate on EITHER dimension eliminates most buckets
    * — multi-column scan pruning that a single-column sort cannot
    * give (see [[graft.operators.ZOrder]]; ZOrderSpec quantifies the
    * pruning ratio against a row-order layout).
    *
    * Scale/shape: the key is a codegen'd bit-arithmetic projection
    * (no shuffle of its own); the bucket stats are one map-side-
    * partial aggregation over 64 groups. Bucketing by fixed key
    * ranges (z >> 26) rather than a range partitioner keeps the
    * result sampling-free and deterministic in both engines.
    */
  def q128_zorder(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.ZOrder
    val base = Tables.events(spark, dir).select(
      col("user_id").as("u"),
      (dec2(col("value")) * 100).cast("long").as("c"))
    // domain bounds as a 1-row broadcast scalar frame, so both
    // dimensions stretch to the full 16-bit range at ANY scale factor
    // (raw user_id spans 6 bits at sf0.01 — interleaving unstretched
    // bits would leave the key dominated by one dimension)
    val rng = base.agg(
      min(col("u")).as("mnu"), max(col("u")).as("mxu"),
      min(col("c")).as("mnc"), max(col("c")).as("mxc"))
    val scaled = base.crossJoin(broadcast(rng)).select(
      expr("((u - mnu) * 65536) div (mxu - mnu + 1)").as("x"),
      expr("((c - mnc) * 65536) div (mxc - mnc + 1)").as("y"))
    scaled.withColumn("z", ZOrder.interleave16(col("x"), col("y")))
      .groupBy(shiftright(col("z"), 26).as("bucket"))
      .agg(count(lit(1)).as("n"),
        min(col("x")).as("min_x"), max(col("x")).as("max_x"),
        min(col("y")).as("min_y"), max(col("y")).as("max_y"))
      .orderBy(col("bucket"))
  }

  val q128_zorder_sql: String = {
    import graft.operators.ZOrder
    val z = ZOrder.interleave16Sql("x", "y")
    s"""WITH d AS (
       |  SELECT user_id AS u,
       |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
       |  FROM events),
       |rng AS (SELECT MIN(u) AS mnu, MAX(u) AS mxu,
       |               MIN(c) AS mnc, MAX(c) AS mxc FROM d),
       |s AS (
       |  SELECT ((u - mnu) * 65536) // (mxu - mnu + 1) AS x,
       |         ((c - mnc) * 65536) // (mxc - mnc + 1) AS y
       |  FROM d CROSS JOIN rng),
       |k AS (SELECT x, y, $z AS z FROM s)
       |SELECT z >> 26 AS bucket, COUNT(*) AS n,
       |  MIN(x) AS min_x, MAX(x) AS max_x,
       |  MIN(y) AS min_y, MAX(y) AS max_y
       |FROM k GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** q129 — snapshot drift detection: the data-quality gate a
    * recurring 100 TB ingest runs before promoting a new snapshot —
    * compare per-segment volume, audience, and value statistics of
    * the NEWER half of the data against the OLDER half and flag
    * segments whose volume ratio leaves a band. (q119 profiles one
    * snapshot; this diffs two. deva pipelines express it as two
    * stats passes + a Python zip; here the halves are CONDITIONAL
    * AGGREGATES in one corpus pass.)
    *
    * Scale/shape: the time midpoint is a 1-row scalar frame
    * (broadcast), then ONE groupBy(event_type) with when()-guarded
    * partial aggs computes both halves' profiles simultaneously — no
    * self-join of two profile runs, no second scan. Exact-decimal
    * means; the volume ratio is one IEEE division of exact longs.
    */
  def q129_profile_drift(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select(
      col("event_type"), col("user_id"),
      unix_micros(col("ts")).as("us"), dec2(col("value")).as("v"))
    val mid = ev.agg(expr("(min(us) + max(us)) div 2").as("mid"))
    val old_ = col("us") < col("mid")
    ev.crossJoin(broadcast(mid))
      .groupBy(col("event_type"))
      .agg(
        count(when(old_, 1)).as("n_old"),
        count(when(!old_, 1)).as("n_new"),
        count_distinct(when(old_, col("user_id"))).as("users_old"),
        count_distinct(when(!old_, col("user_id"))).as("users_new"),
        (sum(when(old_, col("v"))).cast("double") / count(when(old_, 1))).as("mean_old"),
        (sum(when(!old_, col("v"))).cast("double") / count(when(!old_, 1))).as("mean_new"))
      .select(col("event_type"), col("n_old"), col("n_new"),
        (col("n_new").cast("double") / col("n_old")).as("volume_ratio"),
        col("users_old"), col("users_new"),
        col("mean_old"), col("mean_new"),
        (col("n_new").cast("double") / col("n_old") < 0.8 ||
          col("n_new").cast("double") / col("n_old") > 1.25).as("drifted"))
      .orderBy(col("event_type"))
  }

  val q129_profile_drift_sql: String =
    """WITH ev AS (
      |  SELECT event_type, user_id, epoch_us(ts) AS us,
      |    CAST(value AS DECIMAL(18,2)) AS v
      |  FROM events),
      |mid AS (SELECT (MIN(us) + MAX(us)) // 2 AS mid FROM ev),
      |prof AS (
      |  SELECT event_type,
      |    COUNT(CASE WHEN us < mid THEN 1 END) AS n_old,
      |    COUNT(CASE WHEN us >= mid THEN 1 END) AS n_new,
      |    COUNT(DISTINCT CASE WHEN us < mid THEN user_id END) AS users_old,
      |    COUNT(DISTINCT CASE WHEN us >= mid THEN user_id END) AS users_new,
      |    CAST(SUM(CASE WHEN us < mid THEN v END) AS DOUBLE)
      |      / COUNT(CASE WHEN us < mid THEN 1 END) AS mean_old,
      |    CAST(SUM(CASE WHEN us >= mid THEN v END) AS DOUBLE)
      |      / COUNT(CASE WHEN us >= mid THEN 1 END) AS mean_new
      |  FROM ev CROSS JOIN mid GROUP BY 1)
      |SELECT event_type, n_old, n_new,
      |  CAST(n_new AS DOUBLE) / n_old AS volume_ratio,
      |  users_old, users_new, mean_old, mean_new,
      |  (CAST(n_new AS DOUBLE) / n_old < 0.8
      |    OR CAST(n_new AS DOUBLE) / n_old > 1.25) AS drifted
      |FROM prof ORDER BY event_type""".stripMargin

  /** q131 — per-group correlation + OLS regression from EXACT integer
    * moments: for each (event_type, day), the Pearson correlation and
    * the least-squares line of value-cents against hour-of-day — the
    * "does the metric drift within the day, and how fast" fit every
    * monitoring report quotes (deva pipelines run numpy over
    * collected lists; here the five moments are one map-side-partial
    * aggregation and the fit is closed-form arithmetic on them).
    *
    * Determinism: x = hour (≤23), y = cents — all five moments are
    * exact int64 sums, and every n·Σxy − Σx·Σy style term is exact
    * integer arithmetic; the ONLY float ops are the final casts,
    * sqrts and divisions, each correctly-rounded IEEE from identical
    * integers in both engines. Degenerate groups (n < 3 or zero
    * variance) are filtered on integer conditions so no engine ever
    * divides by zero.
    *
    * Scale/shape: one groupBy with five sum partials — the classic
    * "moments, not data" reduction: the shuffle carries 5 longs per
    * group whatever the corpus size. The (type, day) key keeps
    * per-group n bounded by daily volume, which is what keeps the
    * int64 moment bound (n·Σy² < 2^63) safe at ANY corpus size —
    * grouping only by type would let n grow with the corpus.
    */
  def q131_daily_regression(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select(
      col("event_type"), to_date(col("ts")).as("day"),
      hour(col("ts")).cast("long").as("x"),
      (dec2(col("value")) * 100).cast("long").as("y"))
    val m = ev.groupBy(col("event_type"), col("day")).agg(
      count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("y") * col("y")).as("syy"),
      sum(col("x") * col("y")).as("sxy"))
    val vx = col("n") * col("sxx") - col("sx") * col("sx")
    val vy = col("n") * col("syy") - col("sy") * col("sy")
    val cov = col("n") * col("sxy") - col("sx") * col("sy")
    m.filter(col("n") >= 3 && vx > 0 && vy > 0)
      .select(col("event_type"), col("day"), col("n"),
        (cov.cast("double") / (sqrt(vx.cast("double")) * sqrt(vy.cast("double"))))
          .as("corr"),
        (cov.cast("double") / vx.cast("double")).as("slope_cents_per_hour"),
        ((col("sy").cast("double") - (cov.cast("double") / vx.cast("double"))
          * col("sx").cast("double")) / col("n").cast("double")).as("intercept_cents"))
      .orderBy(col("event_type"), col("day"))
  }

  val q131_daily_regression_sql: String =
    """WITH ev AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day,
      |    CAST(hour(ts) AS BIGINT) AS x,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS y
      |  FROM events),
      |m AS (
      |  SELECT event_type, day, COUNT(*) AS n,
      |    SUM(x) AS sx, SUM(y) AS sy,
      |    SUM(x * x) AS sxx, SUM(y * y) AS syy, SUM(x * y) AS sxy
      |  FROM ev GROUP BY 1, 2)
      |SELECT event_type, day, n,
      |  CAST(n * sxy - sx * sy AS DOUBLE)
      |    / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
      |       * sqrt(CAST(n * syy - sy * sy AS DOUBLE))) AS corr,
      |  CAST(n * sxy - sx * sy AS DOUBLE)
      |    / CAST(n * sxx - sx * sx AS DOUBLE) AS slope_cents_per_hour,
      |  (CAST(sy AS DOUBLE)
      |    - (CAST(n * sxy - sx * sy AS DOUBLE)
      |       / CAST(n * sxx - sx * sx AS DOUBLE)) * CAST(sx AS DOUBLE))
      |    / CAST(n AS DOUBLE) AS intercept_cents
      |FROM m
      |WHERE n >= 3 AND n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
      |ORDER BY event_type, day""".stripMargin

  /** q133 — CUSUM changepoint detection per event_type: the classic
    * level-shift detector (Page 1954) completing the monitoring kit
    * (q108 point anomaly, q126 smoothing, q129 snapshot drift — this
    * one catches SUSTAINED mean shifts a point detector misses).
    *
    * The scale insight: CUSUM is defined RECURSIVELY
    * (S_t = max(0, S_{t-1} + d_t)) — per-row sequential state that
    * looks unexpressible as a window aggregate. But it decomposes in
    * closed form: S_t = cum_t − min(0, min_{j≤t} cum_j), the prefix
    * sum minus the running prefix minimum — TWO frame functions over
    * ONE shared (type) exchange and sort, instead of a sequential
    * per-key loop (mapGroups would work but abandons codegen and
    * whole-partition vectorization).
    *
    * Determinism: everything up to the final /100 display division
    * is exact integer arithmetic — cents, a half-up integer mean
    * (2·sum+n) div (2·n), slack and threshold in integer cents; the
    * running extremes are integer min/max, so the shift flag cannot
    * differ between engines.
    */
  def q133_cusum(spark: SparkSession, dir: String): DataFrame = {
    val slackCents = 100L     // k: ignore drifts smaller than $1
    val threshCents = 50000L  // h: alarm at $500 accumulated excess
    val ev = Tables.events(spark, dir).select(
      col("event_type"), col("event_id"), col("ts"),
      (dec2(col("value")) * 100).cast("long").as("cents"))
    val mu = ev.groupBy(col("event_type"))
      .agg(expr("(2 * sum(cents) + count(1)) div (2 * count(1))").as("mu"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("ts"), col("event_id"))
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.join(broadcast(mu), "event_type")
      .withColumn("d", col("cents") - col("mu") - lit(slackCents))
      .withColumn("cs", sum(col("d")).over(cum))
      .withColumn("s", col("cs") - least(lit(0L), min(col("cs")).over(cum)))
      .select(col("event_type"), col("event_id"), col("ts"),
        (col("s").cast("double") / 100.0).as("cusum_dollars"),
        (col("s") > lit(threshCents)).as("shifted"))
      .orderBy(col("event_type"), col("ts"), col("event_id"))
  }

  val q133_cusum_sql: String =
    """WITH ev AS (
      |  SELECT event_type, event_id, ts,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      |  FROM events),
      |mu AS (
      |  SELECT event_type,
      |    (2 * SUM(cents) + COUNT(*)) // (2 * COUNT(*)) AS mu
      |  FROM ev GROUP BY 1),
      |d AS (
      |  SELECT ev.event_type, event_id, ts, cents - mu - 100 AS d
      |  FROM ev JOIN mu USING (event_type)),
      |c1 AS (
      |  SELECT event_type, event_id, ts, SUM(d) OVER w AS cs
      |  FROM d
      |  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      |c2 AS (
      |  SELECT event_type, event_id, ts, cs,
      |    LEAST(0, MIN(cs) OVER w) AS floor_cs
      |  FROM c1
      |  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
      |SELECT event_type, event_id, ts,
      |  CAST(cs - floor_cs AS DOUBLE) / 100.0 AS cusum_dollars,
      |  (cs - floor_cs > 50000) AS shifted
      |FROM c2 ORDER BY event_type, ts, event_id""".stripMargin

  /** q135 — ranking-function surface: ntile deciles, percent_rank
    * and cume_dist per event_type over a TOTAL order (value, then
    * event_id — rank ties would otherwise make percent_rank/ntile
    * engine-dependent at tie boundaries). Closes the window-function
    * inventory: rank/row_number (q09), lag/lead (q113/q125), frame
    * aggregates (q10/q108), and now the distribution functions.
    *
    * Scale/shape: one (type) exchange + one sort, three window
    * functions sharing the spec in a single WindowExec pass. The
    * distribution functions need the partition COUNT, which
    * WindowExec gets from the partition itself — no extra pass.
    * Doubles are (rank−1)/(n−1) style integer-derived IEEE divisions
    * — identical cross-engine by the q131 argument.
    */
  def q135_deciles(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type"))
      .orderBy(dec2(col("value")), col("event_id"))
    Tables.events(spark, dir)
      .select(col("event_type"), col("event_id"),
        dec2(col("value")).cast("double").as("value"),
        ntile(10).over(w).cast("long").as("decile"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume"))
      .orderBy(col("event_type"), col("event_id"))
  }

  val q135_deciles_sql: String =
    """SELECT event_type, event_id,
      |  CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE) AS value,
      |  CAST(NTILE(10) OVER w AS BIGINT) AS decile,
      |  PERCENT_RANK() OVER w AS pct_rank,
      |  CUME_DIST() OVER w AS cume
      |FROM events
      |WINDOW w AS (PARTITION BY event_type
      |  ORDER BY CAST(value AS DECIMAL(18,2)), event_id)
      |ORDER BY event_type, event_id""".stripMargin

  /** q136 — audience reconciliation via the NATIVE set operators:
    * retained / churned / new users between the older and newer half
    * of the data — INTERSECT and EXCEPT exercised as first-class
    * relational surface (q28's semi/anti joins express the same
    * semantics join-wise; a user of the reference writing set algebra
    * should find the set operators themselves verified).
    *
    * Scale/shape: both halves collapse to distinct user frames FIRST
    * (conditional agg on the broadcast midpoint — one corpus pass for
    * both sides); the set ops then run on user-sized frames. Spark
    * plans INTERSECT/EXCEPT as left-semi/left-anti hash joins over
    * the distinct frames — the same shuffle economics as q28, with
    * set semantics (dedup) guaranteed by the operator.
    */
  def q136_set_reconcile(spark: SparkSession, dir: String): DataFrame =
    setReconcileFrom(Tables.events(spark, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("us")))

  /** The INTERSECT/EXCEPT reconcile tail over a (user_id, us) event
    * frame — shared verbatim by batch q136 and its streaming twin
    * q233 (pairing #53): global time midpoint, old/new halves,
    * retained/churned/new segments. The midpoint is a property of
    * the WHOLE history (min+max over all events), which is exactly
    * why the twin's per-user timestamp state replays here instead of
    * segmenting on the stream.
    */
  private[queries] def setReconcileFrom(ev: DataFrame): DataFrame = {
    val mid = ev.agg(expr("(min(us) + max(us)) div 2").as("mid"))
    val tagged = ev.crossJoin(broadcast(mid))
    val olds = tagged.filter(col("us") < col("mid")).select(col("user_id")).distinct()
    val news = tagged.filter(col("us") >= col("mid")).select(col("user_id")).distinct()
    val retained = olds.intersect(news).select(lit("retained").as("segment"), col("user_id"))
    val churned = olds.except(news).select(lit("churned").as("segment"), col("user_id"))
    val fresh = news.except(olds).select(lit("new").as("segment"), col("user_id"))
    retained.unionByName(churned).unionByName(fresh)
      .orderBy(col("segment"), col("user_id"))
  }

  val q136_set_reconcile_sql: String =
    """WITH ev AS (SELECT user_id, epoch_us(ts) AS us FROM events),
      |mid AS (SELECT (MIN(us) + MAX(us)) // 2 AS mid FROM ev),
      |olds AS (SELECT DISTINCT user_id FROM ev CROSS JOIN mid WHERE us < mid),
      |news AS (SELECT DISTINCT user_id FROM ev CROSS JOIN mid WHERE us >= mid)
      |SELECT 'retained' AS segment, user_id
      |  FROM (SELECT user_id FROM olds INTERSECT SELECT user_id FROM news)
      |UNION ALL
      |SELECT 'churned' AS segment, user_id
      |  FROM (SELECT user_id FROM olds EXCEPT SELECT user_id FROM news)
      |UNION ALL
      |SELECT 'new' AS segment, user_id
      |  FROM (SELECT user_id FROM news EXCEPT SELECT user_id FROM olds)
      |ORDER BY segment, user_id""".stripMargin

  /** q169 — global Pearson correlation MATRIX over lineitem's four
    * measures (quantity, price, discount, tax), melted to one row per
    * unordered pair — the feature-correlation screen an EDA/feature-
    * selection pass runs before modeling. Completes the moment family:
    * q131 fits per-GROUP x-vs-y; this is the all-pairs matrix over
    * the WHOLE corpus in one scan.
    *
    * Determinism: measures become exact cents (dec2×100 longs);
    * per-row products stay < 2^63 (price² ≈ 1.2e14) but their SUMS
    * don't at corpus scale, so every moment accumulates in
    * DECIMAL(38,0) (the q144 Gini discipline — exact to 1e38, which
    * covers 1e12 rows of price²) mirroring DuckDB's HUGEINT SUM;
    * all n·Σxy − ΣxΣy terms are exact decimal integers and the ONLY
    * float ops are the final casts/sqrts/division, identical IEEE in
    * both engines.
    *
    * Scale/shape: ONE corpus scan → 15 map-side-partial moment sums
    * → a single 1-row frame; the 6 matrix cells are an in-plan
    * explode of that row (never a re-scan per cell, never a driver
    * collect). The shuffle carries 15 decimals total. At 100 TB the
    * plan is unchanged — the reduction is all partial aggregation.
    */
  def q169_corr_matrix(spark: SparkSession, dir: String): DataFrame = {
    val cents = (c: String) => (dec2(col(c)) * 100).cast("long")
    val v = Tables.lineitem(spark, dir).select(
      cents("l_quantity").as("q"), cents("l_extendedprice").as("p"),
      cents("l_discount").as("d"), cents("l_tax").as("t"))
    def dsum38(c: org.apache.spark.sql.Column) = sum(c.cast("decimal(38,0)"))
    val vars = Seq("q", "p", "d", "t")
    val sums =
      vars.map(a => dsum38(col(a)).as(s"s_$a")) ++
      (for (a <- vars; b <- vars if a <= b)
        yield dsum38(col(a) * col(b)).as(s"s_$a$b"))
    corrMatrixFrom(v.agg(count(lit(1)).as("n"), sums: _*))
  }

  /** The correlation-matrix tail over the ONE-ROW moment frame
    * (n plus the 4 linear and 10 canonical-pair product sums, each
    * DECIMAL(38,0)) — shared verbatim by batch q169 and its
    * streaming twin q213 (pairing #33): every cell is exact integer
    * algebra until the final double division.
    */
  private[queries] def corrMatrixFrom(m: DataFrame): DataFrame = {
    val label = Map("q" -> "quantity", "p" -> "price", "d" -> "discount", "t" -> "tax")
    def cell(a: String, b: String) = {
      val (x, y) = if (a <= b) (a, b) else (b, a)
      val cov = col("n") * col(s"s_$x$y") - col(s"s_$x") * col(s"s_$y")
      val vx = col("n") * col(s"s_$x$x") - col(s"s_$x") * col(s"s_$x")
      val vy = col("n") * col(s"s_$y$y") - col(s"s_$y") * col(s"s_$y")
      struct(lit(label(a)).as("var_a"), lit(label(b)).as("var_b"),
        (cov.cast("double") / (sqrt(vx.cast("double")) * sqrt(vy.cast("double"))))
          .as("corr"))
    }
    // unordered pairs, emitted so (var_a, var_b) labels sort ascending
    val pairs = Seq(("d", "p"), ("d", "q"), ("d", "t"), ("p", "q"), ("p", "t"), ("q", "t"))
    m.select(col("n"), explode(array(pairs.map { case (a, b) => cell(a, b) }: _*)).as("r"))
      .select(col("r.var_a").as("var_a"), col("r.var_b").as("var_b"),
        col("n"), col("r.corr").as("corr"))
      .orderBy(col("var_a"), col("var_b"))
  }

  val q169_corr_matrix_sql: String = {
    val label = Map("q" -> "quantity", "p" -> "price", "d" -> "discount", "t" -> "tax")
    val colOf = Map("q" -> "l_quantity", "p" -> "l_extendedprice",
      "d" -> "l_discount", "t" -> "l_tax")
    val vars = Seq("q", "p", "d", "t")
    val cents = vars.map(a =>
      s"CAST(CAST(${colOf(a)} AS DECIMAL(18,2)) * 100 AS BIGINT) AS $a").mkString(", ")
    val sums = (vars.map(a => s"SUM($a) AS s_$a") ++
      (for (a <- vars; b <- vars if a <= b) yield s"SUM($a * $b) AS s_$a$b")).mkString(", ")
    def cellSql(a: String, b: String) = {
      val (x, y) = if (a <= b) (a, b) else (b, a)
      s"""SELECT '${label(a)}' AS var_a, '${label(b)}' AS var_b, n,
         |  CAST(n * s_$x$y - s_$x * s_$y AS DOUBLE)
         |    / (sqrt(CAST(n * s_$x$x - s_$x * s_$x AS DOUBLE))
         |       * sqrt(CAST(n * s_$y$y - s_$y * s_$y AS DOUBLE))) AS corr
         |FROM m""".stripMargin
    }
    val pairs = Seq(("d", "p"), ("d", "q"), ("d", "t"), ("p", "q"), ("p", "t"), ("q", "t"))
    s"""WITH v AS (SELECT $cents FROM lineitem),
       |m AS (SELECT COUNT(*) AS n, $sums FROM v)
       |${pairs.map { case (a, b) => cellSql(a, b) }.mkString("\nUNION ALL\n")}
       |ORDER BY var_a, var_b""".stripMargin
  }

  /** q182 — POINT-IN-TIME join against the SCD2 dimension: each
    * purchase looks up the user's view-stream value that was CURRENT
    * at purchase time ("what the user was seeing when they bought") —
    * the temporal-correctness join every feature store and lakehouse
    * audit needs (training-serving skew is exactly a PIT join done
    * wrong). Composes q125's SCD2 stitching with the interval lookup.
    *
    * Scale/shape: the join is EQUALITY-keyed on user_id (hash join,
    * AQE-free to broadcast a small dim) with the validity-interval
    * predicate in the join condition; per-user histories are
    * change-count bounded, so the filter fans out per-key history
    * size, never corpus². Intervals partition time per key (lead over
    * the same window), so at most one row matches — LEFT join keeps
    * pre-first-view purchases with a NULL as-of value.
    */
  def q182_pit_join(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val dim = Tables.events(spark, dir)
      .filter(col("event_type") === "view")
      .select(col("user_id"), dec2(col("value")).as("v"), col("ts"), col("event_id"))
      .withColumn("prev_v", lag(col("v"), 1).over(w))
      .filter(col("prev_v").isNull || col("v") =!= col("prev_v"))
      .withColumn("valid_to", lead(col("ts"), 1).over(w))
      .select(col("user_id").as("d_user"), col("v"),
        col("ts").as("valid_from"), col("valid_to"))
    val facts = Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"),
        dec2(col("value")).cast("double").as("purchase_value"))
    facts.join(dim,
        facts("user_id") === dim("d_user") &&
          facts("ts") >= dim("valid_from") &&
          (dim("valid_to").isNull || facts("ts") < dim("valid_to")),
        "left")
      .select(col("event_id"), col("user_id"), col("ts"),
        col("purchase_value"), col("v").cast("double").as("asof_view_value"))
      .orderBy(col("event_id"))
  }

  val q182_pit_join_sql: String =
    """WITH v AS (
      |  SELECT user_id, CAST(value AS DECIMAL(18,2)) AS v, ts, event_id,
      |    LAG(CAST(value AS DECIMAL(18,2))) OVER
      |      (PARTITION BY user_id ORDER BY ts, event_id) AS prev_v
      |  FROM events WHERE event_type = 'view'),
      |ch AS (SELECT * FROM v WHERE prev_v IS NULL OR v <> prev_v),
      |dim AS (
      |  SELECT user_id AS d_user, v, ts AS valid_from,
      |    LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
      |  FROM ch),
      |facts AS (
      |  SELECT event_id, user_id, ts,
      |    CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE) AS purchase_value
      |  FROM events WHERE event_type = 'purchase')
      |SELECT f.event_id, f.user_id, f.ts, f.purchase_value,
      |  CAST(d.v AS DOUBLE) AS asof_view_value
      |FROM facts f LEFT JOIN dim d
      |  ON f.user_id = d.d_user AND f.ts >= d.valid_from
      |  AND (d.valid_to IS NULL OR f.ts < d.valid_to)
      |ORDER BY f.event_id""".stripMargin

  /** q183 — CDC SNAPSHOT DIFF: row-level reconciliation of two table
    * versions into added/deleted/updated/unchanged counts per event
    * type — the change-audit report behind every versioned-table
    * "what changed between snapshot A and B" question (q142 LOCATES
    * divergence cheaply via bucket fingerprints; this CLASSIFIES it
    * row by row once located). Snapshot B is simulated in-plan from
    * the same deterministic rules in both engines: ids ≡0 mod 97
    * deleted, ≡0 mod 101 get value+1 (updates), ≡0 mod 103 cloned to
    * id+10⁹ (inserts).
    *
    * Scale/shape: ONE full-outer hash join on the key, class = null-
    * pattern + payload comparison (exact decimals), label-bounded
    * final agg with map-side partials. At 100 TB both sides partition
    * by the join key and the diff never materializes matched rows —
    * only the class counts.
    */
  def q183_snapshot_diff(spark: SparkSession, dir: String): DataFrame =
    snapshotDiffFrom(Tables.events(spark, dir)
      .select(col("event_id"), col("event_type"), dec2(col("value")).as("v")))

  /** The CDC classification tail over the compacted
    * (event_id, event_type, v) snapshot image — shared verbatim by
    * batch q183 and its streaming twin q242 (pairing #62). Both
    * compared snapshots derive from the image inside the tail, so
    * the twin only has to maintain the image online (the q124
    * changelog-compaction state).
    */
  private[queries] def snapshotDiffFrom(ev: DataFrame): DataFrame = {
    val a = ev
    val base = ev
      .filter(pmod(col("event_id"), lit(97L)) =!= 0)
      .select(col("event_id"), col("event_type"),
        when(pmod(col("event_id"), lit(101L)) === 0, col("v") + lit(1).cast("decimal(18,2)"))
          .otherwise(col("v")).as("v"))
    val inserts = ev
      .filter(pmod(col("event_id"), lit(103L)) === 0)
      .select((col("event_id") + lit(1000000000L)).as("event_id"),
        col("event_type"), col("v"))
    val b = base.unionByName(inserts)
    a.select(col("event_id"), col("event_type").as("ta"), col("v").as("va"))
      .join(b.select(col("event_id"), col("event_type").as("tb"), col("v").as("vb")),
        Seq("event_id"), "full_outer")
      .select(coalesce(col("ta"), col("tb")).as("event_type"),
        when(col("ta").isNull, "added")
          .when(col("tb").isNull, "deleted")
          .when(col("va") =!= col("vb"), "updated")
          .otherwise("unchanged").as("class"))
      .groupBy(col("event_type"), col("class"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("event_type"), col("class"))
  }

  val q183_snapshot_diff_sql: String =
    """WITH a AS (
      |  SELECT event_id, event_type, CAST(value AS DECIMAL(18,2)) AS v FROM events),
      |b AS (
      |  SELECT event_id, event_type,
      |    CASE WHEN event_id % 101 = 0
      |      THEN CAST(value AS DECIMAL(18,2)) + CAST(1 AS DECIMAL(18,2))
      |      ELSE CAST(value AS DECIMAL(18,2)) END AS v
      |  FROM events WHERE event_id % 97 <> 0
      |  UNION ALL
      |  SELECT event_id + 1000000000, event_type, CAST(value AS DECIMAL(18,2))
      |  FROM events WHERE event_id % 103 = 0),
      |d AS (
      |  SELECT COALESCE(a.event_type, b.event_type) AS event_type,
      |    CASE WHEN a.event_id IS NULL THEN 'added'
      |         WHEN b.event_id IS NULL THEN 'deleted'
      |         WHEN a.v <> b.v THEN 'updated'
      |         ELSE 'unchanged' END AS class
      |  FROM a FULL OUTER JOIN b ON a.event_id = b.event_id)
      |SELECT event_type, class, COUNT(*) AS n
      |FROM d GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** q186 — LOCAL CLUSTERING COEFFICIENT per node, rolled up to
    * nation cells: cc(v) = 2·T(v) / (deg(v)·(deg(v)−1)) over the
    * q118 supplier association graph — the "how clique-ish is each
    * node's neighborhood" diagnostic that separates hub-and-spoke
    * from community structure (Watts–Strogatz; the graph-family
    * completion beside triangle counts q118, census q180, PageRank
    * q97, k-hop q138). T(v) comes from the degree-oriented
    * [[graft.operators.Triangles]] kernel — each triangle surfaces
    * once and explodes to its three corners, so per-node counts stay
    * exact without a second enumeration; the oracle recomputes them
    * from the naive id-ordered 3-way self-join, proving oriented ≡
    * naive per NODE (a strictly finer check than q118's per-nation
    * triangle totals).
    *
    * Determinism: T and deg are exact longs; cc = 2.0·T/(d·(d−1)) is
    * one double multiply + divide of exact integers in identical
    * order both engines, quantized DECIMAL(18,6) (q91's rule) before
    * the order-free decimal sum; avg divides the exact decimal sum
    * by the exact count. Scale/shape: triangle corners and degrees
    * are edge-keyed aggs (never collected); the rollup is
    * label-bounded.
    */
  def q186_clustering_coeff(spark: SparkSession, dir: String): DataFrame =
    clusteringCoeffFrom(spark, dir, Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("o"), col("l_suppkey").as("s")))

  /** The clustering-coefficient tail over an (o, s) order-membership
    * frame — shared verbatim by batch q186 and its streaming twin
    * q225 (pairing #45): co-occurrence edges (min-support 5),
    * degree-oriented triangle enumeration, per-node coefficients,
    * nation rollup.
    */
  private[queries] def clusteringCoeffFrom(spark: SparkSession, dir: String,
      os: DataFrame): DataFrame = {
    val edges = graft.operators.Triangles.cooccurrenceEdges(
      os, "o", "s", minSupport = 5).persistFresh()
    val tri = graft.operators.Triangles.triangles(edges)
    val triPerNode = tri
      .select(explode(array(col("u"), col("v"), col("w"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("t"))
    val deg = edges.select(col("a").as("node"))
      .unionByName(edges.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("d"))
    val cc = deg.join(triPerNode, Seq("node"), "left")
      .select(col("node"),
        coalesce(col("t"), lit(0L)).as("t"),
        decq(when(col("d") >= 2,
          lit(2.0) * coalesce(col("t"), lit(0L)) / (col("d") * (col("d") - 1)))
          .otherwise(lit(0.0)), 6).as("cc"))
    cc.join(Tables.supplier(spark, dir), col("node") === col("s_suppkey"))
      .groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("n_nodes"),
        sum(col("t")).as("tri_corners"),
        (sum(col("cc")).cast("double") / count(lit(1))).as("avg_cc"))
      .orderBy(col("s_nationkey"))
  }

  val q186_clustering_coeff_sql: String =
    """WITH os AS (SELECT DISTINCT l_orderkey AS o, l_suppkey AS s FROM lineitem),
      |e AS (SELECT a, b FROM (
      |        SELECT x.s AS a, y.s AS b, COUNT(*) AS c
      |        FROM os x JOIN os y ON x.o = y.o AND x.s < y.s
      |        GROUP BY 1, 2)
      |      WHERE c >= 5),
      |tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
      |        FROM e e1 JOIN e e2 ON e2.a = e1.b
      |                  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
      |tn AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS t FROM (
      |         SELECT x AS node FROM tri
      |         UNION ALL SELECT y FROM tri
      |         UNION ALL SELECT z FROM tri) GROUP BY 1),
      |degs AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS d FROM (
      |         SELECT a AS node FROM e UNION ALL SELECT b FROM e) GROUP BY 1),
      |ccf AS (SELECT dg.node, COALESCE(tn.t, 0) AS t,
      |         """.stripMargin +
      graft.functions.Determinism.decqSql(
        """CASE WHEN dg.d >= 2
          |           THEN 2.0 * COALESCE(tn.t, 0) / (dg.d * (dg.d - 1))
          |           ELSE 0.0 END""".stripMargin, 6) +
    """ AS cc
      |        FROM degs dg LEFT JOIN tn ON tn.node = dg.node)
      |SELECT s_nationkey, CAST(COUNT(*) AS BIGINT) AS n_nodes,
      |  CAST(SUM(t) AS BIGINT) AS tri_corners,
      |  CAST(SUM(cc) AS DOUBLE) / COUNT(*) AS avg_cc
      |FROM ccf JOIN supplier ON s_suppkey = node
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** q189 — MULTI-ITERATION PageRank (3 power-iteration rounds over
    * the customer–supplier bipartite graph) as ONE declarative plan:
    * q97 is the single-step kernel and operators/PageRank the
    * run-to-convergence production path (no cross-engine oracle —
    * doubles to a tolerance); this query is the missing middle — a
    * FIXED iteration count whose every intermediate is cross-engine
    * bit-exact, so DuckDB replays the whole power iteration as
    * chained CTEs and the gate hashes the final vector.
    *
    * The induction that makes 3 rounds of float math hash-stable:
    * per-edge contribution = pr_prev / deg is one double division of
    * a bit-identical double by an exact long (identical both
    * engines), floor-quantized through decq at scale 12 (q97's
    * move, re-edged in r11 — raw double→DECIMAL cast rounding is
    * engine-version-sensitive) so the
    * per-node mass sum is an order-free exact decimal sum; the new
    * pr = 0.15/n + 0.85·(sum as double) is again fixed-order double
    * arithmetic — bit-identical input, bit-identical output, so the
    * property carries across rounds. (PageRank.run deliberately
    * does NOT quantize — tolerance-converged production ranks don't
    * need it; the gate form pays one decimal cast per edge per
    * round to be provable.)
    *
    * Scale/shape: the symmetrized edge frame + degrees persist once
    * and only the node-sized rank vector moves per round; exactly 3
    * plan iterations, each referencing the previous vector ONCE
    * (linear lineage — the twice-referencing delta loop is what
    * forces PageRank.run's localCheckpoint); n is a 1-row scalar.
    */
  def q189_pagerank_iter(spark: SparkSession, dir: String): DataFrame = {
    val edges = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("a"), (col("l_suppkey") * 2 + 1).as("b"))
      .distinct()
    pagerankIterFrom(edges)
  }

  /** The multi-iteration PageRank tail over a distinct encoded
    * (a, b) bipartite edge frame — shared verbatim by batch q189 and
    * its streaming twin q226 (pairing #46): symmetrization, degree
    * build, three decq-quantized power iterations, node decode.
    */
  private[queries] def pagerankIterFrom(edges: DataFrame): DataFrame = {
    val sym = edges.select(col("a").as("src"), col("b").as("dst"))
      .unionAll(edges.select(col("b").as("src"), col("a").as("dst")))
      .persist()
    val deg = sym.groupBy(col("src")).agg(count(lit(1)).as("deg")).persistFresh()
    val n = deg.count() // 1-row scalar (node count), the q104-audited class
    // The deg join is loop-INVARIANT: hoist it out of the power
    // iterations and cache the joined edge frame pre-partitioned by
    // dst (REPARTITION_BY_NUM — an explicit count, or AQE would
    // coalesce it and the cached HashPartitioning would stop matching
    // the aggs below). Each iteration's node-sized pr join broadcasts
    // and preserves that partitioning, so the groupBy(dst) needs NO
    // exchange — the 3 per-iteration edge-sized shuffles become 0.
    // At a scale where pr outgrows broadcast and the join turns SMJ,
    // the src shuffle reappears and this is no worse than the
    // unpartitioned cache.
    val shuffleN = edges.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val symDeg = sym.join(deg, "src").repartition(shuffleN, col("dst")).persist()
    var pr = deg.select(col("src").as("id"), lit(1.0 / n).as("pr"))
    for (_ <- 1 to 3) {
      val contrib = symDeg
        .join(pr.withColumnRenamed("id", "src"), "src")
        .select(col("dst"),
          // floor-int64 quantization (decq): scale 12 keeps the
          // scaled value inside exact-long range for any plausible
          // rank mass; a raw double→DECIMAL cast's rounding is
          // engine-version-sensitive (round-10 lesson)
          decq(col("pr") / col("deg").cast("double"), 12, 28).as("c"))
      pr = contrib.groupBy(col("dst"))
        .agg(sum(col("c")).as("m"))
        .select(col("dst").as("id"),
          (lit(0.15 / n) + lit(0.85) * col("m").cast("double")).as("pr"))
        // eager lineage cut per iteration (node-sized): without it the
        // round-k pr carries k joined-agg layers of plan — size stats
        // vanish, the NEXT pr join falls back to SMJ and re-shuffles
        // the edge frame by src, defeating the dst pre-partitioning.
        // LogicalRDD also sidesteps the cache-on-cache trap a persist
        // here would create over symDeg (PLANS r10).
        .localCheckpoint(true)
    }
    // Release the loop-only caches (ADVICE r12): pr is an eager
    // LogicalRDD after the last localCheckpoint, so neither sym nor
    // symDeg can be re-read — only deg stays cached for the final
    // decode join (callers' clearCache releases it). Without this the
    // three stacked persists (sym, deg, symDeg) outlive every
    // invocation in a many-query session.
    sym.unpersist(blocking = true)
    symDeg.unpersist(blocking = true)
    pr.join(deg, pr("id") === deg("src"))
      .select(
        when(col("id") % 2 === 0,
          // integer division (ADVICE r14 / VERDICT r15 item 2): `/` is
          // double division, exact only below 2^53 — `div` matches the
          // oracle's `//` at any key (hitsFrom precedent)
          concat(lit("c"), expr("id div 2").cast("string")))
          .otherwise(
            concat(lit("s"), expr("(id - 1) div 2").cast("string")))
          .as("node"),
        col("deg"), col("pr"))
      .orderBy(col("node"))
  }

  val q189_pagerank_iter_sql: String = {
    def round(prev: String, i: Int): String =
      s"""c$i AS (
         |  SELECT s.dst, ${graft.functions.Determinism.decqSql(
                "p.pr / CAST(d.deg AS DOUBLE)", 12, 28)} AS c
         |  FROM sym s JOIN deg d USING (src) JOIN $prev p ON p.id = s.src),
         |p$i AS (
         |  SELECT dst AS id,
         |    CAST(0.15 AS DOUBLE) / CAST(nn.n AS DOUBLE) +
         |      CAST(0.85 AS DOUBLE) * CAST(SUM(c) AS DOUBLE) AS pr
         |  FROM c$i, nn GROUP BY dst, nn.n)""".stripMargin
    s"""WITH e AS (
       |  SELECT DISTINCT o_custkey * 2 AS a, l_suppkey * 2 + 1 AS b
       |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
       |sym AS (SELECT a AS src, b AS dst FROM e
       |        UNION ALL SELECT b AS src, a AS dst FROM e),
       |deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM sym GROUP BY src),
       |nn AS (SELECT COUNT(*) AS n FROM deg),
       |p0 AS (SELECT src AS id, CAST(1.0 AS DOUBLE) / CAST(nn.n AS DOUBLE) AS pr
       |       FROM deg, nn),
       |${round("p0", 1)},
       |${round("p1", 2)},
       |${round("p2", 3)}
       |SELECT CASE WHEN p.id % 2 = 0 THEN 'c' || CAST(p.id // 2 AS VARCHAR)
       |            ELSE 's' || CAST((p.id - 1) // 2 AS VARCHAR) END AS node,
       |  d.deg, p.pr
       |FROM p3 p JOIN deg d ON d.src = p.id
       |ORDER BY node""".stripMargin
  }

  /** q272 — HITS hubs & authorities over the DIRECTED customer→
    * supplier purchase graph (Kleinberg's mutual-reinforcement
    * ranking): a customer is a good HUB if it buys from good
    * authorities, a supplier a good AUTHORITY if good hubs buy from
    * it — the bipartite-native centrality PageRank's symmetrized
    * random walk (q189) cannot express (PageRank mixes both roles
    * into one score; HITS keeps the two sides' roles distinct, which
    * is what a marketplace/curation screen wants: "influential
    * buyers" vs "canonical suppliers"). Two full mutual-reinforcement
    * rounds, genuinely iterative — auth² aggregates hub¹ which
    * aggregates auth¹: a one-shot degree count cannot produce it.
    *
    * Exactness — STRONGER than the PageRank doctrine: HITS power
    * iterations are pure edge-sums, so skipping the classical
    * per-round normalization (a rescale that cancels in the final
    * relative scores) keeps every intermediate an EXACT INTEGER —
    * auth¹ = indegree, hub¹ = Σ auth¹, auth² = Σ hub¹, hub² = Σ auth²
    * in DECIMAL(38,0) (bounded by d⁴ ≤ 10³² at in/out-degree 10⁸ —
    * inside the cap; no decq, no float drift anywhere in the loop).
    * The only floats are the final mirrored casts and the per-side
    * max-normalized relative score (one division of exact decimals).
    *
    * Scale/shape: the pagerankIterFrom hygiene — edge frame
    * persisted+counted (exact AQE stats), each round ONE hash join
    * of the edge frame against a node-bounded frame + one agg
    * shuffle, eager lineage cut per round, edge cache released
    * before the readout; max scalars broadcast.
    */
  def q272_hits(spark: SparkSession, dir: String): DataFrame = {
    val edges = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("a"), (col("l_suppkey") * 2 + 1).as("b"))
      .distinct()
    hitsFrom(edges)
  }

  /** The HITS tail over a distinct encoded (a, b) DIRECTED bipartite
    * edge frame — shared verbatim by batch q272 and its streaming
    * twin q273 (pairing #85): two exact-integer mutual-reinforcement
    * rounds, per-side max normalization, node decode.
    */
  private[graft] def hitsFrom(edges: DataFrame): DataFrame = {
    // persist-then-RELEASE builder → borrowPersist (ownership-aware:
    // a plain unpersist would steal a live identical-plan entry from
    // whichever invocation owns it — the q138/q249 edge-frame lesson)
    val (e, release) = graft.operators.CacheOnce.borrowPersist(edges)
    e.count() // eager: four round-joins consume it — a cold cache would race
    val auth1 = e.groupBy(col("b"))
      .agg(count(lit(1)).cast("decimal(38,0)").as("a1"))
    val hub1 = e.join(auth1, "b").groupBy(col("a"))
      .agg(sum(col("a1")).as("h1")).localCheckpoint(true)
    val auth2 = e.join(hub1, "a").groupBy(col("b"))
      .agg(sum(col("h1")).as("a2")).localCheckpoint(true)
    val hub2 = e.join(auth2, "b").groupBy(col("a"))
      .agg(sum(col("a2")).as("h2")).localCheckpoint(true)
    // rounds are eager LogicalRDDs — the edge cache has no reader left
    release()
    val hm = hub2.agg(max(col("h2")).as("m"))
    val am = auth2.agg(max(col("a2")).as("m"))
    hub2.crossJoin(broadcast(hm))
      .select(
        // integer division (ADVICE r14): `/` is double division, exact
        // only below 2^53 — `div` matches the oracle's `//` at any key
        concat(lit("c"), expr("a div 2").cast("string")).as("node"),
        lit("hub").as("kind"),
        col("h2").cast("double").as("score"),
        (col("h2").cast("double") / col("m").cast("double")).as("rel"))
      .unionAll(auth2.crossJoin(broadcast(am))
        .select(
          concat(lit("s"), expr("(b - 1) div 2").cast("string")).as("node"),
          lit("auth").as("kind"),
          col("a2").cast("double").as("score"),
          (col("a2").cast("double") / col("m").cast("double")).as("rel")))
      .orderBy(col("kind"), col("node"))
  }

  val q272_hits_sql: String =
    s"""WITH e AS (
       |  SELECT DISTINCT o_custkey * 2 AS a, l_suppkey * 2 + 1 AS b
       |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
       |a1t AS (SELECT b, CAST(COUNT(*) AS DECIMAL(38,0)) AS a1 FROM e GROUP BY b),
       |h1t AS (SELECT a, SUM(a1) AS h1 FROM e JOIN a1t USING (b) GROUP BY a),
       |a2t AS (SELECT b, SUM(h1) AS a2 FROM e JOIN h1t USING (a) GROUP BY b),
       |h2t AS (SELECT a, SUM(a2) AS h2 FROM e JOIN a2t USING (b) GROUP BY a),
       |hm AS (SELECT MAX(h2) AS m FROM h2t),
       |am AS (SELECT MAX(a2) AS m FROM a2t)
       |SELECT node, kind, score, rel FROM (
       |  SELECT 'c' || CAST(a // 2 AS VARCHAR) AS node, 'hub' AS kind,
       |    CAST(h2 AS DOUBLE) AS score,
       |    CAST(h2 AS DOUBLE) / CAST(m AS DOUBLE) AS rel
       |  FROM h2t, hm
       |  UNION ALL
       |  SELECT 's' || CAST((b - 1) // 2 AS VARCHAR) AS node, 'auth' AS kind,
       |    CAST(a2 AS DOUBLE) AS score,
       |    CAST(a2 AS DOUBLE) / CAST(m AS DOUBLE) AS rel
       |  FROM a2t, am)
       |ORDER BY kind, node""".stripMargin

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q189_pagerank_iter" -> (q189_pagerank_iter _),
    "q272_hits" -> (q272_hits _),
    "q186_clustering_coeff" -> (q186_clustering_coeff _),
    "q182_pit_join" -> (q182_pit_join _),
    "q183_snapshot_diff" -> (q183_snapshot_diff _),
    "q169_corr_matrix" -> (q169_corr_matrix _),
    "q136_set_reconcile" -> (q136_set_reconcile _),
    "q135_deciles" -> (q135_deciles _),
    "q133_cusum" -> (q133_cusum _),
    "q131_daily_regression" -> (q131_daily_regression _),
    "q129_profile_drift" -> (q129_profile_drift _),
    "q128_zorder" -> (q128_zorder _),
    "q125_scd2" -> (q125_scd2 _),
    "q117_exact_quantiles" -> (q117_exact_quantiles _),
    "q118_triangles" -> (q118_triangles _),
    "q119_profile" -> (q119_profile _),
    "q120_pivot_wide" -> (q120_pivot_wide _),
    "q121_latest_snapshot" -> (q121_latest_snapshot _),
    "q122_source_triangles" -> (q122_source_triangles _)
  )

  def oracles: Map[String, String] = Map(
    "q189_pagerank_iter" -> q189_pagerank_iter_sql,
    "q272_hits" -> q272_hits_sql,
    "q186_clustering_coeff" -> q186_clustering_coeff_sql,
    "q182_pit_join" -> q182_pit_join_sql,
    "q183_snapshot_diff" -> q183_snapshot_diff_sql,
    "q169_corr_matrix" -> q169_corr_matrix_sql,
    "q125_scd2" -> q125_scd2_sql,
    "q128_zorder" -> q128_zorder_sql,
    "q129_profile_drift" -> q129_profile_drift_sql,
    "q131_daily_regression" -> q131_daily_regression_sql,
    "q133_cusum" -> q133_cusum_sql,
    "q135_deciles" -> q135_deciles_sql,
    "q136_set_reconcile" -> q136_set_reconcile_sql,
    "q117_exact_quantiles" -> q117_exact_quantiles_sql,
    "q118_triangles" -> q118_triangles_sql,
    "q119_profile" -> q119_profile_sql,
    "q120_pivot_wide" -> q120_pivot_wide_sql,
    "q121_latest_snapshot" -> q121_latest_snapshot_sql,
    "q122_source_triangles" -> q122_source_triangles_sql
  )
}
