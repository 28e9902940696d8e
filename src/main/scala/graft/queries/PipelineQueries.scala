package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** LLM-training-data pipeline queries over the `documents` / `embeddings` /
  * `events` tables (beyond the reference's own operator set — these are the
  * large-scale data-curation operators the north star asks for): exact and
  * fuzzy deduplication, similarity search, text analysis.
  *
  * Every query here is designed 100 TB-first: hash-bucketed joins (never
  * all-pairs), map-side partial aggregation, pure column expressions (no
  * per-row Scala UDFs), and DuckDB-expressible semantics for the oracle gate.
  */
object PipelineQueries {

  private[queries] def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  private[queries] def embs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/embeddings.parquet")

  /** The events table carries TIMESTAMP(NANOS) parquet (unsupported by
    * Spark's reader natively): read `ts` as raw nanos via the legacy conf.
    * DuckDB truncates ns→µs on read, so `ts div 1000` reproduces its
    * `epoch_us` exactly. */
  private[queries] def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.read.parquet(s"$dir/events.parquet")
  }

  import graft.operators.TextOps

  // ------------------------------------------------------------------ text

  /** SQL list literal for a stopword profile. */
  private def sqlList(ws: Seq[String]): String =
    ws.map(w => s"'$w'").mkString(", ")

  /** DuckDB occurrence count of profile words among the tokens column `w`. */
  private def hitSql(ws: Seq[String]): String =
    s"len(list_filter(w, t -> t IN (${sqlList(ws)})))"

  /** DuckDB argmax-with-priority-tiebreak over the per-language scores
    * s_<lang> — the same logic as [[TextOps.langIdCol]]. */
  private val langCaseSql: String = {
    val langs = TextOps.LangProfiles.map(_._1)
    val arms = langs.zipWithIndex.map { case (l, i) =>
      val earlier = langs.take(i).map(e => s"s_$l > s_$e")
      val later   = langs.drop(i + 1).map(e => s"s_$l >= s_$e")
      val cond = (earlier ++ later).mkString(" AND ")
      s"WHEN $cond THEN '$l'"
    }
    s"CASE ${arms.mkString(" ")} ELSE '${langs.head}' END"
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "txt_stats" -> ((s, d) =>
      docs(s, d)
        .groupBy("source")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(size(TextOps.tokens(col("text")))).as("tok_sum"),
          sum(length(col("text"))).as("char_sum"),
          countDistinct(col("lang")).as("lang_cnt"))),

    "txt_langid" -> ((s, d) =>
      docs(s, d)
        .select(TextOps.langIdCol(col("text")).as("predicted"))
        .groupBy("predicted").agg(count(lit(1)).as("cnt"))),

    "txt_quality" -> ((s, d) =>
      docs(s, d)
        .select(TextOps.qualityScoreCol(col("text")).as("score"))
        .groupBy("score").agg(count(lit(1)).as("cnt"))
        .select(col("score").cast("long").as("score"), col("cnt"))),

    "tok_count" -> ((s, d) =>
      docs(s, d)
        .groupBy("lang")
        .agg(
          sum(regexp_count(col("text"), lit("[a-z0-9]+"))).as("alnum_cnt"),
          sum(regexp_count(col("text"), lit("[^a-z0-9 ]"))).as("other_cnt"))),

    "txt_fingerprint" -> ((s, d) =>
      docs(s, d)
        .select(col("doc_id"),
          TextOps.fingerprintCol(col("text"), 5).as("fp"))),

    "dedup_exact" -> ((s, d) => TextOps.dedupExact(docs(s, d))),

    // MinHash+LSH near-dup pairs: word-3-gram shingles, 12 one-row bands,
    // verified true Jaccard ≥ 1/2 (integer cross-multiply). The oracle is
    // the all-pairs check — sound because a J ≥ 0.5 pair escapes all 12
    // bands with probability ≤ 0.5^12 ≈ 2e-4 (and the corpus' planted
    // near-dups sit at J ≥ 0.85: miss probability ~1e-10).
    "dedup_minhash" -> ((s, d) =>
      graft.operators.DedupOps.minhashNearDups(docs(s, d), "doc_id", 3, 12, 1, 2)),

    // SimHash signatures (xxhash64-based — engine-specific, rows-only gate).
    "dedup_simhash" -> ((s, d) =>
      docs(s, d).select(col("doc_id"),
        graft.operators.DedupOps.simhashCol(col("text")).as("simhash"))),

    // ---------------------------------------------------------- similarity
    // Exact cosine top-10 for 8 query vectors (broadcast baseline).
    "knn_brute" -> ((s, d) =>
      graft.operators.VectorOps.knnBrute(
        embs(s, d), "vec_id", "embedding", col("vec_id") < 8, 10)),

    // Random-hyperplane LSH top-5: 4 tables × 4 sign bits; candidates via
    // (table, bucket) equi-join, exact re-rank. Oracle replays the same
    // hyperplane constants in SQL.
    "knn_lsh" -> ((s, d) =>
      graft.operators.VectorOps.knnLsh(
        embs(s, d), "vec_id", "embedding", col("vec_id") < 8, 5,
        LshTables, LshBits, EmbDims)),

    // -------------------------------------------------------------- events
    // Gap-based sessionization (30-min gap) — the classic event-stream
    // windowing op: lag over (user, time), count gap breaks. Exact integer
    // arithmetic via microsecond epochs.
    "evt_sessions" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("us", "event_id")
      events(s, d)
        .select(col("user_id"), col("event_id"), expr("ts div 1000").as("us"))
        .select(col("user_id"),
          when(col("us") - lag("us", 1).over(w) > SessionGapUs, 1)
            .otherwise(0).as("brk"))
        .groupBy("user_id")
        .agg((sum(col("brk")) + lit(1)).as("n_sessions"), count(lit(1)).as("n_events"))
    }),

    // Per-event-type top-3 users by event count (rank window, deterministic
    // (count desc, user_id) tiebreak).
    "evt_topk" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("event_type").orderBy(col("cnt").desc, col("user_id"))
      events(s, d)
        .groupBy("event_type", "user_id").agg(count(lit(1)).as("cnt"))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .select(col("event_type"), col("user_id"), col("cnt"),
          col("rnk").cast("long").as("rnk"))
    })
  )

  private val SessionGapUs = 1800L * 1000000L

  private val EmbDims   = 64
  private val LshTables = 4
  private val LshBits   = 4

  /** DuckDB double-precision cosine with the same sequential fold and the
    * same float→double casts as [[graft.operators.VectorOps.cosine]]. */
  private def cosSql(a: String, b: String): String = {
    def d(x: String, y: String) =
      s"list_sum([CAST($x[i] AS DOUBLE) * CAST($y[i] AS DOUBLE) for i in range(1, ${EmbDims + 1})])"
    s"${d(a, b)} / (sqrt(${d(a, a)}) * sqrt(${d(b, b)}))"
  }

  // DuckDB equivalents. Dialect notes: regexp_replace needs the 'g' flag
  // (Spark replaces all matches by default); tokens via string_split; list
  // comprehensions for shingles.
  private val langScores =
    TextOps.LangProfiles.map { case (l, ws) => s"${hitSql(ws)} AS s_$l" }.mkString(", ")

  val oracles: Map[String, String] = Map(
    "txt_stats" ->
      """SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS tok_sum,
        |CAST(SUM(len(text)) AS BIGINT) AS char_sum,
        |CAST(COUNT(DISTINCT lang) AS BIGINT) AS lang_cnt
        |FROM documents GROUP BY source""".stripMargin,

    "txt_langid" ->
      s"""WITH t AS (SELECT string_split(text, ' ') AS w FROM documents),
         |sc AS (SELECT $langScores FROM t)
         |SELECT $langCaseSql AS predicted, CAST(COUNT(*) AS BIGINT) AS cnt
         |FROM sc GROUP BY 1""".stripMargin,

    "txt_quality" ->
      s"""WITH t AS (SELECT text, string_split(text, ' ') AS w, len(text) AS nc FROM documents),
         |f AS (SELECT
         |  (CASE WHEN nc >= 50 AND nc <= 2000 THEN 1 ELSE 0 END)
         |  + (CASE WHEN len(w) >= 10 AND len(w) <= 500 THEN 1 ELSE 0 END)
         |  + (CASE WHEN ${hitSql(TextOps.LangProfiles.head._2)} * 5 >= len(w) THEN 1 ELSE 0 END)
         |  + (CASE WHEN nc - (len(w) - 1) >= len(w) * 3 AND nc - (len(w) - 1) <= len(w) * 8 THEN 1 ELSE 0 END)
         |  AS score FROM t)
         |SELECT CAST(score AS BIGINT) AS score, CAST(COUNT(*) AS BIGINT) AS cnt
         |FROM f GROUP BY 1""".stripMargin,

    "tok_count" ->
      """SELECT lang,
        |CAST(SUM(len(regexp_extract_all(text, '[a-z0-9]+'))) AS BIGINT) AS alnum_cnt,
        |CAST(SUM(len(regexp_extract_all(text, '[^a-z0-9 ]'))) AS BIGINT) AS other_cnt
        |FROM documents GROUP BY lang""".stripMargin,

    "txt_fingerprint" ->
      """SELECT doc_id, CASE WHEN len(w) >= 5 THEN
        |  list_min([md5(array_to_string(w[i:i+4], ' ')) for i in range(1, len(w) - 3)])
        |END AS fp
        |FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)""".stripMargin,

    "dedup_exact" ->
      """SELECT md5(regexp_replace(lower(trim(text)), ' +', ' ', 'g')) AS h,
        |CAST(MIN(doc_id) AS BIGINT) AS keep_id,
        |CAST(COUNT(*) AS BIGINT) AS dup_cnt
        |FROM documents GROUP BY 1""".stripMargin,

    "evt_sessions" ->
      s"""WITH t AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
         |b AS (SELECT user_id,
         |  CASE WHEN us - LAG(us) OVER (PARTITION BY user_id ORDER BY us, event_id) > $SessionGapUs
         |       THEN 1 ELSE 0 END AS brk FROM t)
         |SELECT user_id, CAST(SUM(brk) + 1 AS BIGINT) AS n_sessions,
         |CAST(COUNT(*) AS BIGINT) AS n_events
         |FROM b GROUP BY user_id""".stripMargin,

    "evt_topk" ->
      """WITH c AS (SELECT event_type, user_id, CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM events GROUP BY 1, 2),
        |r AS (SELECT event_type, user_id, cnt,
        |  ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY cnt DESC, user_id) AS rnk FROM c)
        |SELECT event_type, user_id, cnt, CAST(rnk AS BIGINT) AS rnk
        |FROM r WHERE rnk <= 3""".stripMargin,

    "knn_brute" -> {
      val cos = cosSql("q.v", "x.v")
      s"""WITH e AS (SELECT vec_id, embedding AS v FROM embeddings),
         |s AS (SELECT q.vec_id AS qid, x.vec_id AS nid, $cos AS sim
         |  FROM e q, e x WHERE q.vec_id < 8 AND x.vec_id != q.vec_id)
         |SELECT qid, nid, CAST(rnk AS BIGINT) AS rnk FROM (
         |  SELECT qid, nid, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rnk FROM s)
         |WHERE rnk <= 10""".stripMargin
    },

    "knn_lsh" -> {
      val planeRows = (for { t <- 0 until LshTables; b <- 0 until LshBits } yield {
        val vals = (0 until EmbDims)
          .map(i => graft.operators.VectorOps.planeText((t * LshBits + b) * EmbDims + i))
          .mkString(", ")
        s"($t, $b, [$vals])"
      }).mkString(",\n")
      val pdot = s"list_sum([CAST(e.v[i] AS DOUBLE) * pl.p[i] for i in range(1, ${EmbDims + 1})])"
      val cos  = cosSql("a.v", "b.v")
      s"""WITH planes(t, b, p) AS (VALUES
         |$planeRows),
         |e AS (SELECT vec_id, embedding AS v FROM embeddings),
         |buck AS (SELECT e.vec_id AS id, pl.t,
         |  CAST(SUM(CASE WHEN $pdot >= 0 THEN (1 << pl.b) ELSE 0 END) AS INTEGER) AS bucket
         |  FROM e, planes pl GROUP BY 1, 2),
         |cand AS (SELECT q.id AS qid, x.id AS nid
         |  FROM buck q JOIN buck x ON q.t = x.t AND q.bucket = x.bucket AND x.id != q.id
         |  WHERE q.id < 8 GROUP BY 1, 2),
         |s AS (SELECT c.qid, c.nid, $cos AS sim
         |  FROM cand c JOIN e a ON a.vec_id = c.qid JOIN e b ON b.vec_id = c.nid)
         |SELECT qid, nid, CAST(rnk AS BIGINT) AS rnk FROM (
         |  SELECT qid, nid, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rnk FROM s)
         |WHERE rnk <= 5""".stripMargin
    },

    "dedup_minhash" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |sh AS (SELECT doc_id,
        |  list_distinct([array_to_string(w[i:i+2], ' ') for i in range(1, len(w) - 1)]) AS s
        |  FROM toks WHERE len(w) >= 3)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(len(list_intersect(a.s, b.s)) AS BIGINT) AS c_inter,
        |  CAST(len(list_distinct(list_concat(a.s, b.s))) AS BIGINT) AS c_union
        |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |WHERE len(list_intersect(a.s, b.s)) * 2 >= len(list_distinct(list_concat(a.s, b.s)))""".stripMargin
  )
}
