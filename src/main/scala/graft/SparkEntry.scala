package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the operator battery (graft.Queries); `oracleSql` carries a
  * DuckDB-equivalent for every SQL-expressible query with identical column
  * names (float-derived columns are floor-quantized to integers on both
  * sides so hashes are engine-stable). Non-SQL-expressible operators
  * (MinHash-LSH, SimHash, ANN-LSH, the EL pipeline, the stubbed media
  * decode) are registered without an oracle → rows-only check.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Queries.aggPushdown(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // core relational operators
    "q_agg_pushdown" -> (Queries.aggPushdown _),
    "q_join_broadcast" -> (Queries.joinBroadcast _),
    "q_window_topk" -> (Queries.windowTopK _),
    "q_anti_join" -> (Queries.antiJoin _),
    "q_semi_join" -> (Queries.semiJoin _),
    "q_conv_window" -> (Queries.convWindow _),
    "q_limit_sort" -> (Queries.limitSort _),
    "q_set_ops" -> (Queries.setOps _),
    "q_rollup" -> (Queries.rollupAgg _),
    "q_event_hourly" -> (Queries.eventHourly _),
    // text analysis / dedup over documents
    "q_doc_token_stats" -> (Queries.docTokenStats _),
    "q_doc_quality" -> (Queries.docQuality _),
    "q_doc_langid" -> (Queries.docLangId _),
    "q_doc_dedup_exact" -> (Queries.docDedupExact _),
    "q_doc_fingerprint" -> (Queries.docFingerprint _),
    "q_doc_shingle_jaccard" -> ((s: SparkSession, d: String) => Queries.docShingleJaccard(s, d)),
    "q_doc_minhash_buckets" -> (Queries.docMinhashBuckets _),
    "q_doc_simhash" -> (Queries.docSimhash _),
    "q_stream_dedup" -> (Queries.streamDedupExact _),
    // similarity search over embeddings
    "q_embed_cosine_topk" -> ((s: SparkSession, d: String) => Queries.embedCosineTopK(s, d)),
    "q_embed_label_stats" -> (Queries.embedLabelStats _),
    "q_embed_ann_lsh" -> ((s: SparkSession, d: String) => Queries.embedAnnLsh(s, d)),
    "q_embed_ivf_topk" -> ((s: SparkSession, d: String) => Queries.embedIvfTopK(s, d)),
    // multimodal plumbing
    "q_mm_meta" -> (Queries.mmMeta _),
    "q_mm_decode_stub" -> (Queries.mmDecodeStub _),
    "q_mm_frame_sample" -> ((s: SparkSession, d: String) => Queries.mmFrameSample(s, d)),
    // entity-linking pipeline (deterministic synthetic transcripts)
    "q_el_exact" -> (Queries.elExact _),
    "q_el_cascade" -> (Queries.elCascade _),
    "q_el_prompt_tier" -> (Queries.elPromptTier _),
    "q_el_contrastive" -> (Queries.elContrastivePairs _),
    "q_el_clusters" -> (Queries.elClusters _))

  def oracleSql: Map[String, String] = Map(
    "q_agg_pushdown" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
        | COUNT(*) AS n
        |FROM lineitem WHERE l_quantity > 10
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_join_broadcast" ->
      """SELECT n_name,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        | COUNT(*) AS n_orders
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q_window_topk" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
        | SELECT o_custkey, o_orderkey, o_totalprice,
        |  ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
        | FROM orders) WHERE rk <= 3
        |ORDER BY o_custkey, rk""".stripMargin,
    "q_anti_join" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,
    "q_semi_join" ->
      """SELECT p_partkey, p_name, p_size FROM part p
        |WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey)
        |ORDER BY p_partkey""".stripMargin,
    "q_conv_window" ->
      """SELECT user_id, event_id, event_type,
        | LAG(event_type, 1) OVER w AS prev_type,
        | LEAD(event_type, 1) OVER w AS next_type,
        | ROW_NUMBER() OVER w AS turn_rank
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, turn_rank""".stripMargin,
    "q_limit_sort" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
        |LIMIT 20""".stripMargin,
    "q_set_ops" ->
      """SELECT o_custkey FROM (
        | SELECT o_custkey FROM orders WHERE o_totalprice > 200000
        | UNION
        | SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        | EXCEPT
        | SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW')
        |ORDER BY o_custkey""".stripMargin,
    "q_rollup" ->
      """SELECT COALESCE(o_orderstatus, 'ALL') AS o_orderstatus,
        | COALESCE(o_orderpriority, 'ALL') AS o_orderpriority,
        | COUNT(*) AS n,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
        |FROM orders
        |GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus, o_orderpriority""".stripMargin,
    "q_event_hourly" ->
      """SELECT DATE_TRUNC('hour', ts) AS hour, event_type, COUNT(*) AS n,
        | CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_doc_token_stats" ->
      """SELECT doc_id, lang,
        | LEN(STRING_SPLIT_REGEX(text, '\s+')) AS n_ws_tokens,
        | LEN(STRING_SPLIT_REGEX(text, '[^a-z0-9]+')) AS n_word_tokens,
        | LENGTH(text) AS n_chars
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_doc_quality" ->
      """SELECT doc_id, n_chars, n_alpha, n_digit, n_space,
        | CAST(FLOOR(10000 * n_alpha / n_chars) AS BIGINT) AS alpha_bp,
        | CAST(FLOOR(10000 * n_digit / n_chars) AS BIGINT) AS digit_bp
        |FROM (
        | SELECT doc_id, LENGTH(text) AS n_chars,
        |  LENGTH(text) - LENGTH(REGEXP_REPLACE(text, '[a-zA-Z]', '', 'g')) AS n_alpha,
        |  LENGTH(text) - LENGTH(REGEXP_REPLACE(text, '[0-9]', '', 'g')) AS n_digit,
        |  LENGTH(text) - LENGTH(REGEXP_REPLACE(text, '\s', '', 'g')) AS n_space
        | FROM documents)
        |ORDER BY doc_id""".stripMargin,
    "q_doc_langid" ->
      """SELECT doc_id, lang, en_hits, de_hits, fr_hits, es_hits,
        | CASE WHEN en_hits >= GREATEST(de_hits, fr_hits, es_hits) THEN 'en'
        |      WHEN de_hits >= GREATEST(fr_hits, es_hits) THEN 'de'
        |      WHEN fr_hits >= es_hits THEN 'fr'
        |      ELSE 'es' END AS pred_lang
        |FROM (
        | SELECT doc_id, lang,
        |  LEN(STRING_SPLIT_REGEX(' ' || text || ' ', '\sthe\s')) - 1
        |   + LEN(STRING_SPLIT_REGEX(' ' || text || ' ', '\sa\s')) - 1
        |   + LEN(STRING_SPLIT_REGEX(' ' || text || ' ', '\svalue\s')) - 1
        |   + LEN(STRING_SPLIT_REGEX(' ' || text || ' ', '\sfast\s')) - 1 AS en_hits,
        |  LEN(STRING_SPLIT_REGEX(' ' || text || ' ', '\sder\s')) - 1
        |   + LEN(STRING_SPLIT_REGEX(' ' || text || ' ', '\sund\s')) - 1
        |   + LEN(STRING_SPLIT_REGEX(' ' || text || ' ', '\snicht\s')) - 1 AS de_hits,
        |  LEN(STRING_SPLIT_REGEX(' ' || text || ' ', '\sle\s')) - 1
        |   + LEN(STRING_SPLIT_REGEX(' ' || text || ' ', '\set\s')) - 1
        |   + LEN(STRING_SPLIT_REGEX(' ' || text || ' ', '\spas\s')) - 1 AS fr_hits,
        |  LEN(STRING_SPLIT_REGEX(' ' || text || ' ', '\sel\s')) - 1
        |   + LEN(STRING_SPLIT_REGEX(' ' || text || ' ', '\sy\s')) - 1
        |   + LEN(STRING_SPLIT_REGEX(' ' || text || ' ', '\sno\s')) - 1 AS es_hits
        | FROM documents)
        |ORDER BY doc_id""".stripMargin,
    "q_doc_dedup_exact" ->
      """SELECT MD5(text) AS content_hash, MIN(doc_id) AS canonical_doc, COUNT(*) AS n_dups
        |FROM documents GROUP BY MD5(text) ORDER BY canonical_doc""".stripMargin,
    "q_doc_fingerprint" ->
      """SELECT doc_id,
        | MD5(REGEXP_REPLACE(LOWER(text), '[^a-z0-9]+', ' ', 'g')) AS fingerprint
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_doc_shingle_jaccard" ->
      """WITH toks AS (
        | SELECT doc_id, STRING_SPLIT_REGEX(text, '\s+') AS w FROM documents),
        |sh AS (
        | SELECT DISTINCT doc_id,
        |  UNNEST(LIST_TRANSFORM(GENERATE_SERIES(1, GREATEST(LEN(w) - 3, 1)),
        |    i -> MD5(ARRAY_TO_STRING(w[i:i+3], ' ')))) AS shingle
        | FROM toks),
        |cnt AS (SELECT doc_id, COUNT(*) AS n_shingles FROM sh GROUP BY doc_id),
        |rare AS (SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) <= 100),
        |shr AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN rare USING (shingle)),
        |inter AS (
        | SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
        | FROM shr a JOIN shr b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        | GROUP BY a.doc_id, b.doc_id)
        |SELECT doc_a, doc_b, n_common,
        | CAST(FLOOR(10000 * n_common / (ca.n_shingles + cb.n_shingles - n_common)) AS BIGINT) AS jaccard_bp
        |FROM inter
        |JOIN cnt ca ON ca.doc_id = doc_a
        |JOIN cnt cb ON cb.doc_id = doc_b
        |WHERE FLOOR(10000 * n_common / (ca.n_shingles + cb.n_shingles - n_common)) >= 2000
        |ORDER BY doc_a, doc_b""".stripMargin,
    "q_embed_label_stats" ->
      """SELECT label, COUNT(*) AS n, CAST(SUM(sq_norm_q) AS BIGINT) AS sum_sq_norm_q FROM (
        | SELECT label,
        |  CAST(LIST_SUM(LIST_TRANSFORM(embedding,
        |    v -> CAST(FLOOR((CAST(v AS DOUBLE) * CAST(v AS DOUBLE)) * 10000.0) AS BIGINT))) AS BIGINT) AS sq_norm_q
        | FROM embeddings)
        |GROUP BY label ORDER BY label""".stripMargin,
    "q_embed_cosine_topk" ->
      """WITH q AS (
        | SELECT vec_id AS query_id, embedding AS qvec FROM embeddings WHERE vec_id < 10),
        |scored AS (
        | SELECT q.query_id, e.vec_id,
        |  LIST_SUM(LIST_TRANSFORM(GENERATE_SERIES(1, LEN(q.qvec)),
        |    i -> CAST(q.qvec[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))
        |  / (SQRT(LIST_SUM(LIST_TRANSFORM(q.qvec, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))
        |   * SQRT(LIST_SUM(LIST_TRANSFORM(e.embedding, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))))
        |  AS cos_sim
        | FROM q, embeddings e WHERE e.vec_id <> q.query_id),
        |ranked AS (
        | SELECT query_id, vec_id, cos_sim,
        |  ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, vec_id ASC) AS rk
        | FROM scored)
        |SELECT query_id, vec_id, CAST(FLOOR(cos_sim * 10000) AS BIGINT) AS cos_bp, rk
        |FROM ranked WHERE rk <= 5
        |ORDER BY query_id, rk""".stripMargin,
    "q_mm_meta" ->
      """SELECT doc_id,
        | OCTET_LENGTH(ENCODE(text)) AS n_bytes,
        | MD5(text) AS payload_md5
        |FROM documents ORDER BY doc_id""".stripMargin)
}
