package graft.queries

import graft.Tables
import graft.functions.{TextOps, VectorOps}
import graft.multimodal.MultimodalOps
import graft.operators.DedupOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** LLM-training-data pipeline queries over `documents` and `embeddings`:
  * dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding
  * cosine), similarity search (brute-force + LSH), text analysis
  * (lang-ID, quality, token counts, fingerprints), multimodal plumbing.
  *
  * Oracle coverage: everything whose semantics ANSI SQL + DuckDB can
  * express bit-identically is oracled (exact dedup, n-gram Jaccard,
  * text stats, fingerprints, brute-force cosine); hash-family ops
  * (MinHash/SimHash/LSH) are validated by ScalaTest specs with planted
  * duplicates instead (xxhash64 has no DuckDB twin).
  */
object TextQueries {

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Exact dedup groups: one narrow hash aggregate over md5(norm text).
    "q_dedup_exact" -> { (s, dir) =>
      DedupOps.exactDupGroups(Tables(s, dir, "documents"), "doc_id", "text")
        .orderBy("text_hash")
    },

    // MinHash+LSH: per-doc signature + band hashes (the shuffle keys for
    // candidate generation) + LSH candidate count. Rows-only check here;
    // pair semantics proven in DedupSpec with planted near-dups.
    "q_dedup_minhash" -> { (s, dir) =>
      val d = Tables(s, dir, "documents")
      // Narrow (5 longs + 16-long sig per doc) and consumed by two plan
      // branches — cache so signatures are computed exactly once.
      val bandedFull = DedupOps.withMinHashBands(d, "text", k = 16, bands = 4)
        .select(col("doc_id"), col("minhash_sig"),
          col("band_0"), col("band_1"), col("band_2"), col("band_3"))
        .cache()
      val banded = bandedFull.drop("minhash_sig")
      val cands = DedupOps.minHashCandidatePairsFromBanded(bandedFull, "doc_id", bands = 4)
      // one explode, not unionAll of two projections — a Union would plan
      // the candidate join subtree twice
      val candCounts = cands
        .select(explode(array(col("id_a"), col("id_b"))).as("doc_id"))
        .groupBy("doc_id").agg(count(lit(1)).as("n_candidates"))
      banded.join(candCounts, Seq("doc_id"), "left")
        .na.fill(0, Seq("n_candidates"))
        .orderBy("doc_id")
    },

    // SimHash: 64-bit signature as 4 Hamming-LSH bands per doc.
    "q_dedup_simhash" -> { (s, dir) =>
      DedupOps.withSimHashBands(Tables(s, dir, "documents"), "text")
        .select(col("doc_id"), col("simhash_bands").as("bands"))
        .select(
          col("doc_id"),
          element_at(col("bands"), 1).as("band_0"),
          element_at(col("bands"), 2).as("band_1"),
          element_at(col("bands"), 3).as("band_2"),
          element_at(col("bands"), 4).as("band_3"))
        .orderBy("doc_id")
    },

    // Exact n-gram Jaccard near-dup pairs via inverted shingle index —
    // deterministic (no hashing), so fully oracle-checked.
    "q_ngram_jaccard" -> { (s, dir) =>
      DedupOps.ngramJaccardPairs(Tables(s, dir, "documents"), "doc_id", "text",
        threshold = 0.05, n = 3)
        .orderBy("id_a", "id_b")
    },

    // Brute-force cosine top-5 for the first 5 vectors: exact ANN baseline.
    "q_embed_cosine_topk" -> { (s, dir) =>
      val e = Tables(s, dir, "embeddings")
      VectorOps.bruteForceTopK(e.filter(col("vec_id") < 5), e, k = 5)
        .select(col("q_id"), col("rk"), col("n_id"), col("cos_sim"))
        .orderBy("q_id", "rk")
    },

    // Same top-k via the typed TopKAggregator (partial-agg reduction:
    // <= k rows per map task reach the shuffle) — must hash-match the
    // window form's oracle exactly.
    "q_embed_topk_agg" -> { (s, dir) =>
      val e = Tables(s, dir, "embeddings")
      VectorOps.bruteForceTopKAgg(e.filter(col("vec_id") < 5), e, k = 5)
        .select(col("q_id"), col("rk").cast(LongType).as("rk"), col("n_id"), col("cos_sim"))
        .orderBy("q_id", "rk")
    },

    // LSH-bucketed ANN (single-probe) — the 100 TB path; recall vs the
    // brute-force baseline is asserted in VectorSpec.
    "q_embed_ann_lsh" -> { (s, dir) =>
      val e = Tables(s, dir, "embeddings")
      VectorOps.lshTopK(e.filter(col("vec_id") < 50), e, k = 5, bits = 4, dim = 64)
        .select(col("q_id"), col("rk"), col("n_id"), col("cos_sim"))
        .orderBy("q_id", "rk")
    },

    // IVF-flat ANN (centroid cells, nprobe=4 of nlist=16) — the second
    // scale path; recall vs brute force asserted in VectorSpec.
    "q_embed_ann_ivf" -> { (s, dir) =>
      val e = Tables(s, dir, "embeddings")
      VectorOps.ivfTopK(e.filter(col("vec_id") < 50), e, k = 5)
        .select(col("q_id"), col("rk"), col("n_id"), col("cos_sim"))
        .orderBy("q_id", "rk")
    },

    // Embedding near-dup pairs above a cosine threshold, LSH-bucketed.
    // Self-match excluded; synthetic corpus has no near-dups (planted
    // ones covered in DedupSpec), so threshold is low to keep rows.
    "q_embed_neardup" -> { (s, dir) =>
      DedupOps.embeddingNearDupPairs(Tables(s, dir, "embeddings"),
        "vec_id", "embedding", threshold = 0.3, bits = 4, dim = 64)
        .select(col("id_a"), col("id_b"))
        .orderBy("id_a", "id_b")
    },

    // Text statistics: token counts, length, diversity, punct/stopword
    // ratios — one codegen'd pass, no shuffle.
    "q_text_stats" -> { (s, dir) =>
      Tables(s, dir, "documents").select(
        col("doc_id"),
        length(col("text")).cast(LongType).as("n_chars"),
        TextOps.tokenCount(col("text")).as("n_tokens"),
        TextOps.tokenCountBpeIsh(col("text")).as("n_tokens_bpeish"),
        size(array_distinct(TextOps.tokens(col("text")))).cast(LongType).as("n_distinct_tokens"),
        TextOps.stopwordCount(col("text")).as("n_stopwords"))
        .orderBy("doc_id")
    },

    // Language-ID heuristic (marker argmax) + quality score.
    "q_lang_quality" -> { (s, dir) =>
      Tables(s, dir, "documents").select(
        col("doc_id"), col("lang"),
        TextOps.langId(col("text")).as("pred_lang"),
        round(TextOps.qualityScore(col("text")), 6).as("quality"))
        .orderBy("doc_id")
    },

    // Winnowing fingerprint sets (rolling-hash; no DuckDB twin → rows
    // only; copy-detection property proven in TextOpsSpec).
    "q_winnow" -> { (s, dir) =>
      Tables(s, dir, "documents").select(
        col("doc_id"),
        size(TextOps.winnowFingerprints(col("text"))).cast(LongType).as("n_fps"),
        element_at(TextOps.winnowFingerprints(col("text")), 1).as("first_fp"))
        .orderBy("doc_id")
    },

    // Document fingerprint over normalized text.
    "q_fingerprint" -> { (s, dir) =>
      Tables(s, dir, "documents").select(
        col("doc_id"),
        TextOps.fingerprint(col("text")).as("fp"))
        .orderBy("doc_id")
    },

    // Multimodal: blob metadata (oracle-checkable half of media handling).
    "q_blob_meta" -> { (s, dir) =>
      val d = MultimodalOps.withBlob(Tables(s, dir, "documents"), "text")
      MultimodalOps.blobMeta(d, "doc_id", "blob").orderBy("doc_id")
    },

    // Multimodal: one-to-many frame sampling through the batched
    // plumbing (rows-only; stride/shape proven in MultimodalSpec).
    "q_media_frames" -> { (s, dir) =>
      import org.apache.spark.sql.Encoders
      val d = MultimodalOps.withBlob(Tables(s, dir, "documents"), "text")
        .filter(col("doc_id") % 3 === 2) // the "video" subset
        .select(col("doc_id").as("media_id"), lit("video").as("kind"), col("blob"))
        .as(Encoders.product[MultimodalOps.MediaRow])
      MultimodalOps.sampleFrames(s, d, everyNth = 50).toDF()
        .select(col("media_id"), col("frame_idx"), length(col("frame")).as("n_frame_bytes"))
        .orderBy("media_id", "frame_idx")
    },

    // Multimodal: batched fake-decode through the mapPartitions plumbing
    // (no oracle — codec is stubbed; schema/batch shape tested in spec).
    "q_media_decode" -> { (s, dir) =>
      import org.apache.spark.sql.Encoders
      val d = MultimodalOps.withBlob(Tables(s, dir, "documents"), "text")
        .select(
          col("doc_id").as("media_id"),
          when(col("doc_id") % 3 === 0, "image")
            .when(col("doc_id") % 3 === 1, "audio")
            .otherwise("video").as("kind"),
          col("blob"))
        .as(Encoders.product[MultimodalOps.MediaRow])
      MultimodalOps.decodeFeatures(s, d).toDF().orderBy("media_id")
    })

  val oracles: Map[String, String] = Map(
    "q_dedup_exact" ->
      """SELECT md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS text_hash,
         count(*) AS n_copies, min(doc_id) AS keep_id
         FROM documents GROUP BY 1 ORDER BY text_hash""",
    "q_ngram_jaccard" ->
      """WITH sh AS (
           SELECT doc_id AS id, unnest(list_distinct(
             list_transform(range(1, greatest(len(string_split(text,' ')) - 1, 1)),
               i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1] || ' ' || string_split(text,' ')[i+2])
           )) AS sh
           FROM documents WHERE len(string_split(text,' ')) >= 3),
         sizes AS (SELECT id, count(*) AS n_sh FROM sh GROUP BY id),
         shared AS (
           SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_shared
           FROM sh a JOIN sh b ON a.sh = b.sh AND a.id < b.id
           GROUP BY a.id, b.id)
         SELECT id_a, id_b,
           CAST(n_shared AS DOUBLE) / (sa.n_sh + sb.n_sh - n_shared) AS jaccard
         FROM shared
           JOIN sizes sa ON sa.id = id_a
           JOIN sizes sb ON sb.id = id_b
         WHERE CAST(n_shared AS DOUBLE) / (sa.n_sh + sb.n_sh - n_shared) >= 0.05
         ORDER BY id_a, id_b""",
    "q_embed_topk_agg" ->
      """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings),
         scored AS (
           SELECT q.vec_id AS q_id, c.vec_id AS n_id,
             list_sum(list_transform(range(1, len(q.vec) + 1), i -> q.vec[i] * c.vec[i]))
               / (sqrt(list_sum(list_transform(range(1, len(q.vec) + 1), i -> q.vec[i] * q.vec[i])))
                * sqrt(list_sum(list_transform(range(1, len(c.vec) + 1), i -> c.vec[i] * c.vec[i])))) AS cos_sim
           FROM v q JOIN v c ON q.vec_id < 5 AND q.vec_id <> c.vec_id),
         ranked AS (
           SELECT q_id, n_id, cos_sim,
             row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, n_id) AS rk
           FROM scored)
         SELECT q_id, CAST(rk AS BIGINT) AS rk, n_id, cos_sim FROM ranked
         WHERE rk <= 5 ORDER BY q_id, rk""",
    "q_embed_cosine_topk" ->
      """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings),
         scored AS (
           SELECT q.vec_id AS q_id, c.vec_id AS n_id,
             list_sum(list_transform(range(1, len(q.vec) + 1), i -> q.vec[i] * c.vec[i]))
               / (sqrt(list_sum(list_transform(range(1, len(q.vec) + 1), i -> q.vec[i] * q.vec[i])))
                * sqrt(list_sum(list_transform(range(1, len(c.vec) + 1), i -> c.vec[i] * c.vec[i])))) AS cos_sim
           FROM v q JOIN v c ON q.vec_id < 5 AND q.vec_id <> c.vec_id),
         ranked AS (
           SELECT q_id, n_id, cos_sim,
             row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, n_id) AS rk
           FROM scored)
         SELECT q_id, CAST(rk AS BIGINT) AS rk, n_id, cos_sim FROM ranked
         WHERE rk <= 5 ORDER BY q_id, rk""",
    "q_text_stats" ->
      """SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         CAST(len(regexp_split_to_array(text, '[\s]+'))
            + len(regexp_split_to_array(text, '[^\pL\pN\s]')) - 1 AS BIGINT) AS n_tokens_bpeish,
         CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct_tokens,
         CAST(len(list_filter(string_split(text, ' '),
           t -> t IN ('the','a','of','and','to','in','is','on','for','with'))) AS BIGINT) AS n_stopwords
         FROM documents ORDER BY doc_id""",
    "q_lang_quality" ->
      """WITH scores AS (
           SELECT doc_id, lang, text,
             len(list_filter(string_split(text,' '), t -> t IN ('the','and','is','of','was','are'))) AS s_en,
             len(list_filter(string_split(text,' '), t -> t IN ('der','und','das','ein','ist','nicht'))) AS s_de,
             len(list_filter(string_split(text,' '), t -> t IN ('le','les','et','une','est','pas'))) AS s_fr,
             len(list_filter(string_split(text,' '), t -> t IN ('el','los','las','una','es','como'))) AS s_es,
             CAST(len(list_distinct(string_split(text,' '))) AS DOUBLE) / len(string_split(text,' ')) AS diversity,
             CAST(len(list_filter(string_split(text,' '),
               t -> t IN ('the','a','of','and','to','in','is','on','for','with'))) AS DOUBLE)
               / len(string_split(text,' ')) AS stop_ratio,
             CAST(length(regexp_replace(text, '[\p{L}\p{N}\s]', '', 'g')) AS DOUBLE) / length(text) AS punct_ratio
           FROM documents)
         SELECT doc_id, lang,
           CASE
             WHEN s_en >= greatest(s_en, s_de, s_fr, s_es) AND s_en > 0 THEN 'en'
             WHEN s_de >= greatest(s_en, s_de, s_fr, s_es) AND s_de > 0 THEN 'de'
             WHEN s_fr >= greatest(s_en, s_de, s_fr, s_es) AND s_fr > 0 THEN 'fr'
             WHEN s_es >= greatest(s_en, s_de, s_fr, s_es) AND s_es > 0 THEN 'es'
             ELSE 'und' END AS pred_lang,
           round(least(length(text) / 500.0, 1.0) * 0.3
             + diversity * 0.4
             + least(stop_ratio * 5.0, 1.0) * 0.2
             + (1.0 - least(punct_ratio * 10.0, 1.0)) * 0.1, 6) AS quality
         FROM scores ORDER BY doc_id""",
    "q_fingerprint" ->
      """SELECT doc_id,
         substring(md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))), 1, 16) AS fp
         FROM documents ORDER BY doc_id""",
    "q_blob_meta" ->
      """SELECT doc_id, CAST(length(text) AS BIGINT) AS n_bytes, md5(text) AS digest
         FROM documents ORDER BY doc_id""")
}
