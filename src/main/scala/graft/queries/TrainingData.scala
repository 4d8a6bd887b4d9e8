package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{TextFunctions => T}
import graft.ops.Dedup

/** Training-data pipeline operators over the `documents` and
  * `embeddings` tables: dedup (exact / n-gram Jaccard / MinHash+LSH /
  * SimHash / embedding-cosine), ANN similarity search, text analysis
  * (language-ID, quality metrics, token counting, fingerprinting) and
  * multimodal binary-column plumbing.
  *
  * Every hash here is md5-derived (see TextFunctions.hash60) so DuckDB
  * reproduces signatures bit-for-bit — even MinHash/LSH/SimHash are
  * oracle-checked, not just rows-only.
  *
  * ORACLE AUTHORING RULE (round-6 postmortem): every integer `sum()`
  * that reaches an oracle's output — directly or via a CTE — must be
  * wrapped `CAST(... AS BIGINT)`. DuckDB types integer sums HUGEINT
  * (int128); `fetchall()` hides it (plain Python int, so the local
  * check_oracle.py passes) but the pandas/arrow export the driver's
  * comparator uses renders HUGEINT as float64 — `12345.0` vs the
  * Spark parquet's int64 `12345`, a hash mismatch with rows and
  * schema still matching. That uncast-sum column was the single
  * common construct in all 7 round-6 driver-red rows (and in
  * round-5's q86) and in no green row. Gate: `sbt "runMain
  * graft.tools.DumpOracle /tmp/o.json"` then
  * `python3 tools/audit_oracle_types.py /tmp/o.json
  * /root/testdata/sf0.001` must print `0 flagged` before committing
  * a new query.
  */
object TrainingData extends QueryPack {

  private val K = 16      // minhash signature width
  private val BAND_ROWS = 4 // -> 4 LSH bands

  // ---- generated oracle fragments (kept in lockstep with the Scala ops) ----

  /** DuckDB 60-bit seeded hash of an expression — mirror of hash60. */
  private def dkHash(seed: Int, e: String) =
    s"CAST(('0x'||substr(md5('$seed|'||$e),1,15)) AS BIGINT)"

  /** The 3-shingle CTE chain over an arbitrary source relation — the
    * harness queries (q122/q157) run it over a deterministic modulus
    * SAMPLE of documents (the q112/q126 protocol: exact truth on the
    * sample bounds the all-pairs cost without losing the
    * precision/recall signal). */
  private def dkShinglesFrom(src: String) = s"""
      toks AS (SELECT doc_id, string_split(text,' ') AS ws FROM $src),
      sh AS (SELECT DISTINCT doc_id, sh FROM
        (SELECT doc_id, unnest([ws[i]||' '||ws[i+1]||' '||ws[i+2]
                                for i in generate_series(1, len(ws)-2)]) AS sh
         FROM toks WHERE len(ws) >= 3))"""

  private val dkShingles = dkShinglesFrom("documents")

  private val dkSig = {
    // mirrors TextFunctions.hash31/minhashPerm: one md5 base hash per
    // shingle reduced mod P, then k LCG permutations (exact in int64)
    val P = T.MINHASH_P
    val mins = (0 until K)
      .map(i => s"min((h31 * ${T.minhashA(i)} + ${T.minhashB(i)}) % $P) AS mh$i")
      .mkString(",\n               ")
    s"""hb AS (SELECT doc_id, ${dkHash(0, "sh")} % $P AS h31 FROM sh),
      sig AS (SELECT doc_id, $mins
        FROM hb GROUP BY doc_id)"""
  }

  private val dkSimhash = s"""
      t AS (SELECT doc_id, unnest(string_split(text,' ')) AS tok FROM documents),
      h AS (SELECT doc_id, ${dkHash(0, "tok")} AS hv FROM t),
      bits AS (SELECT doc_id, b,
                 sum(CASE WHEN (hv >> b) & 1 = 1 THEN 1 ELSE -1 END) AS s
               FROM h, range(0,60) r(b) GROUP BY doc_id, b),
      sim AS (SELECT doc_id,
                CAST(sum(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << b)
                         ELSE 0 END) AS BIGINT) AS simhash
              FROM bits GROUP BY doc_id)"""

  private val dkQuantized = """
      q AS (SELECT vec_id, [CAST(round(CAST(x AS DOUBLE)*1000) AS BIGINT)
                            for x in embedding] AS qv FROM embeddings),
      n AS (SELECT vec_id, qv,
              list_aggregate([qv[i]*qv[i] for i in generate_series(1,64)],'sum') AS nsq
            FROM q)"""

  private def dkDot(a: String, b: String) =
    s"list_aggregate([$a.qv[i]*$b.qv[i] for i in generate_series(1,64)],'sum')"

  // ---- queries ----

  /** Exact dedup: hash-groupBy on the normalized-text fingerprint. */
  val q18 = Q(
    "q18_exact_dedup",
    (s, dir) => {
      Dedup.exactDupGroups(Tables(s, dir, "documents"), "doc_id", "text")
        .orderBy(col("fp"))
    },
    Some("""
      SELECT md5(trim(lower(regexp_replace(text, '\s+', ' ', 'g')))) AS fp,
             min(doc_id) AS keeper, count(*) AS n_docs
      FROM documents GROUP BY 1 ORDER BY fp"""),
    covers = Seq("TD-dedup-exact"))

  /** Token counting + quality metrics (length/word-shape ratios). */
  val q19 = Q(
    "q19_text_quality",
    (s, dir) => {
      import s.implicits._
      val toks = T.tokens($"text")
      Tables(s, dir, "documents")
        .select(
          $"doc_id",
          length($"text").cast("long").as("n_chars"),
          T.tokenCount($"text").cast("long").as("n_tokens"),
          ((length($"text") - T.tokenCount($"text") + 1).cast("double") /
            T.tokenCount($"text").cast("double")).as("avg_token_len"),
          (T.stopwordHits(toks, T.lexicons.toMap.apply("en")).cast("double") /
            T.tokenCount($"text").cast("double")).as("en_stopword_ratio"))
        .orderBy($"doc_id")
    },
    Some("""
      SELECT doc_id,
             CAST(length(text) AS BIGINT) AS n_chars,
             CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens,
             CAST(length(text) - len(string_split(text,' ')) + 1 AS DOUBLE)
               / CAST(len(string_split(text,' ')) AS DOUBLE) AS avg_token_len,
             CAST(len([t for t in string_split(text,' ')
                       if t IN ('the','and','is','of','to','a','in')]) AS DOUBLE)
               / CAST(len(string_split(text,' ')) AS DOUBLE) AS en_stopword_ratio
      FROM documents ORDER BY doc_id"""),
    covers = Seq("TD-text-quality", "TD-token-count"))

  /** Stopword-lexicon language ID with deterministic argmax. */
  val q20 = Q(
    "q20_langid",
    (s, dir) => {
      import s.implicits._
      Tables(s, dir, "documents")
        .select($"doc_id", $"lang", T.langId($"text").as("lang_pred"))
        .withColumn("agrees", $"lang" === $"lang_pred")
        .orderBy($"doc_id")
    },
    Some {
      val hits = T.lexicons.map { case (lang, ws) =>
        s"len([t for t in string_split(text,' ') if t IN (${ws.map(w => s"'$w'").mkString(",")})]) AS h_$lang"
      }.mkString(",\n               ")
      val langs = T.lexicons.map(_._1)
      val m = s"greatest(${langs.map("h_" + _).mkString(",")})"
      val cases = langs.map(l => s"WHEN h_$l = $m AND $m > 0 THEN '$l'")
        .mkString(" ")
      s"""
      WITH scored AS (SELECT doc_id, lang, $hits FROM documents)
      SELECT doc_id, lang,
             CASE $cases ELSE 'und' END AS lang_pred,
             lang = (CASE $cases ELSE 'und' END) AS agrees
      FROM scored ORDER BY doc_id"""
    },
    covers = Seq("TD-langid"))

  /** Shared Jaccard-pairs oracle, parameterized by threshold (used by
    * q21 and q70 — one template, no fragile text substitution). */
  private def jaccardOracle(minJ: Double): String = s"""
      WITH $dkShingles,
      sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
      inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
                FROM sh a JOIN sh b USING(sh)
                WHERE a.doc_id < b.doc_id GROUP BY 1, 2)
      SELECT id_a, id_b, n_inter,
             CAST(n_inter AS DOUBLE) / CAST(sa.n + sb.n - n_inter AS DOUBLE) AS jaccard
      FROM inter JOIN sizes sa ON id_a = sa.doc_id
                 JOIN sizes sb ON id_b = sb.doc_id
      WHERE CAST(n_inter AS DOUBLE) / CAST(sa.n + sb.n - n_inter AS DOUBLE) >= $minJ
      ORDER BY id_a, id_b"""

  /** All-pairs 3-gram Jaccard near-dup detection (threshold 0.2;
    * the corpus plants ~25 such pairs). */
  val q21 = Q(
    "q21_jaccard_pairs",
    (s, dir) => {
      Dedup.jaccardPairs(Tables(s, dir, "documents"), "doc_id", "text",
          n = 3, minJ = 0.2)
        .orderBy(col("id_a"), col("id_b"))
    },
    Some(jaccardOracle(0.2)),
    covers = Seq("TD-dedup-ngram"))

  /** Prefix-filtered EXACT Jaccard (PPJoin family) at the realistic
    * near-dup threshold 0.7 — prefix filtering prunes by (1-t), so the
    * high thresholds real dedup uses are exactly where it collapses the
    * candidate set (at t=0.7 each doc exposes only ~30% of its
    * shingles). The corpus's 25 planted near-dup pairs are all
    * J >= 0.7, so the result matches q21's pair set. This is the
    * exact-Jaccard scale path; q21 keeps the low-threshold
    * inverted-index baseline. */
  val q70 = Q(
    "q70_jaccard_prefix",
    (s, dir) => {
      Dedup.jaccardPairsPrefix(Tables(s, dir, "documents"), "doc_id", "text",
          n = 3, minJ = 0.7)
        .orderBy(col("id_a"), col("id_b"))
    },
    Some(jaccardOracle(0.7)),
    covers = Seq("TD-dedup-ngram"))

  /** MinHash signatures (k=16, md5-seeded) — bit-for-bit oracle. */
  val q22 = Q(
    "q22_minhash_signatures",
    (s, dir) => {
      Dedup.minhashSignatures(Tables(s, dir, "documents"), "doc_id", "text",
          n = 3, k = K)
        .orderBy(col("doc_id"))
    },
    Some(s"""
      WITH $dkShingles,
      $dkSig
      SELECT * FROM sig ORDER BY doc_id"""),
    covers = Seq("TD-dedup-minhash"))

  /** LSH candidate pairs: 4 bands x 4 rows over the k=16 signature. */
  val q23 = Q(
    "q23_lsh_candidates",
    (s, dir) => {
      val sig = Dedup.minhashSignatures(Tables(s, dir, "documents"),
        "doc_id", "text", n = 3, k = K)
      Dedup.lshCandidatePairs(sig, "doc_id", k = K, rows = BAND_ROWS)
        .orderBy(col("id_a"), col("id_b"))
    },
    Some {
      val bandRows = (0 until K / BAND_ROWS).map { b =>
        val key = (b * BAND_ROWS until (b + 1) * BAND_ROWS)
          .map(i => s"CAST(mh$i AS VARCHAR)").mkString("||'_'||")
        s"SELECT doc_id, $b AS band, $key AS band_key FROM sig"
      }.mkString("\n        UNION ALL\n        ")
      s"""
      WITH $dkShingles,
      $dkSig,
      bands AS (
        $bandRows)
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b USING(band, band_key)
      WHERE a.doc_id < b.doc_id
      ORDER BY id_a, id_b"""
    },
    covers = Seq("TD-dedup-lsh"))

  /** 60-bit SimHash per document (one aggregation pass in Spark). */
  val q24 = Q(
    "q24_simhash",
    (s, dir) => {
      Dedup.simhash(Tables(s, dir, "documents"), "doc_id", "text")
        .orderBy(col("doc_id"))
    },
    Some(s"""
      WITH $dkSimhash
      SELECT doc_id, simhash FROM sim ORDER BY doc_id"""),
    covers = Seq("TD-dedup-simhash"))

  /** SimHash near-dup pairs: hamming(xor) <= 10. */
  val q25 = Q(
    "q25_simhash_pairs",
    (s, dir) => {
      val sh = Dedup.simhash(Tables(s, dir, "documents"), "doc_id", "text")
      Dedup.simhashNearPairs(sh, "doc_id", maxDist = 10)
        .orderBy(col("id_a"), col("id_b"))
    },
    Some(s"""
      WITH $dkSimhash
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
      FROM sim a JOIN sim b ON a.doc_id < b.doc_id
      WHERE bit_count(xor(a.simhash, b.simhash)) <= 10
      ORDER BY id_a, id_b"""),
    covers = Seq("TD-dedup-simhash"))

  /** DuckDB banded hyperplane bucket: band t, bit j uses plane index
    * t*bitsPerBand+j — exact mirror of Dedup.lshBucket(planeOffset). */
  private def dkBand(alias: String, t: Int, bitsPerBand: Int): String =
    (0 until bitsPerBand).map { j =>
      val p = t * bitsPerBand + j
      val a = T.minhashA(p); val b = T.minhashB(p)
      s"""CASE WHEN list_aggregate([$alias.qv[ij] * ((($a*ij + $b) % 1009) - 504)
           for ij in generate_series(1,64)], 'sum') >= 0
         THEN ${1L << j} ELSE 0 END"""
    }.mkString(" + ")

  /** Embedding-cosine near-dup pairs — the banded-LSH scale path:
    * candidates collide in ≥1 of 4 hyperplane bands, then the exact
    * quantized cosine is verified. Deterministic integer buckets keep
    * even the approximate generator oracle-checkable. */
  val q26 = Q(
    "q26_embedding_dups",
    (s, dir) => {
      Dedup.embeddingDupPairsLsh(Tables(s, dir, "embeddings"), "vec_id",
          "embedding", minCos = 0.4)
        .orderBy(col("id_a"), col("id_b"))
    },
    Some(s"""
      WITH $dkQuantized,
      bkt AS (SELECT vec_id, qv, nsq,
                ${(0 until 4).map(t => s"(${dkBand("n", t, 4)}) AS band$t").mkString(",\n                ")}
              FROM n)
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             ${dkDot("a", "b")} / (sqrt(a.nsq) * sqrt(b.nsq)) AS cosine
      FROM bkt a JOIN bkt b ON a.vec_id < b.vec_id
       AND (a.band0 = b.band0 OR a.band1 = b.band1 OR
            a.band2 = b.band2 OR a.band3 = b.band3)
      WHERE ${dkDot("a", "b")} / (sqrt(a.nsq) * sqrt(b.nsq)) >= 0.4
      ORDER BY id_a, id_b"""),
    covers = Seq("TD-dedup-cosine"))

  /** All-pairs exact baseline of q26 (ground truth for recall at test
    * scale; NOT the production path — O(n²)). */
  val q66 = Q(
    "q66_embedding_dups_exact",
    (s, dir) => {
      Dedup.embeddingDupPairsExact(Tables(s, dir, "embeddings"), "vec_id",
          "embedding", minCos = 0.4)
        .orderBy(col("id_a"), col("id_b"))
    },
    Some(s"""
      WITH $dkQuantized
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             ${dkDot("a", "b")} / (sqrt(a.nsq) * sqrt(b.nsq)) AS cosine
      FROM n a JOIN n b ON a.vec_id < b.vec_id
      WHERE ${dkDot("a", "b")} / (sqrt(a.nsq) * sqrt(b.nsq)) >= 0.4
      ORDER BY id_a, id_b"""),
    covers = Seq("TD-dedup-cosine"))

  /** Brute-force ANN: top-5 cosine neighbors for query vectors
    * (vec_id < 10), query side broadcast. */
  val q27 = Q(
    "q27_ann_topk",
    (s, dir) => {
      import s.implicits._
      val emb = Tables(s, dir, "embeddings")
      Dedup.annTopK(emb, emb.filter($"vec_id" < 10), "vec_id", "embedding",
          k = 5)
        .orderBy(col("id_q"), col("rank"))
    },
    Some(s"""
      WITH $dkQuantized,
      scored AS (
        SELECT qs.vec_id AS id_q, cs.vec_id AS id_c,
               ${dkDot("qs", "cs")} / (sqrt(qs.nsq) * sqrt(cs.nsq)) AS cosine
        FROM n qs JOIN n cs ON qs.vec_id < 10 AND qs.vec_id <> cs.vec_id)
      SELECT id_q, rank, id_c, cosine FROM (
        SELECT *, CAST(row_number() OVER
          (PARTITION BY id_q ORDER BY cosine DESC, id_c ASC) AS INT) AS rank
        FROM scored)
      WHERE rank <= 5 ORDER BY id_q, rank"""),
    covers = Seq("TD-ann"))

  /** Multimodal plumbing: treat text as an opaque binary payload with
    * typed metadata; "decode" is a deterministic md5-derived stub (the
    * container has no image/audio codecs — SURVEY brief), but the
    * schema/partitioning/batch path is the real one. */
  val q28 = Q(
    "q28_multimodal_features",
    (s, dir) => {
      import s.implicits._
      val payload = $"text".cast("binary")
      Tables(s, dir, "documents")
        .select(
          $"doc_id",
          length(payload).cast("long").as("payload_bytes"),
          md5(payload).as("content_hash"),
          conv(substring(md5(payload), 1, 2), 16, 10).cast("int").as("f0"),
          conv(substring(md5(payload), 3, 2), 16, 10).cast("int").as("f1"),
          conv(substring(md5(payload), 5, 2), 16, 10).cast("int").as("f2"),
          conv(substring(md5(payload), 7, 2), 16, 10).cast("int").as("f3"))
        .orderBy($"doc_id")
    },
    Some("""
      SELECT doc_id,
             CAST(length(text) AS BIGINT) AS payload_bytes,
             md5(text) AS content_hash,
             CAST(('0x'||substr(md5(text),1,2)) AS INT) AS f0,
             CAST(('0x'||substr(md5(text),3,2)) AS INT) AS f1,
             CAST(('0x'||substr(md5(text),5,2)) AS INT) AS f2,
             CAST(('0x'||substr(md5(text),7,2)) AS INT) AS f3
      FROM documents ORDER BY doc_id"""),
    covers = Seq("TD-multimodal"))

  /** LSH-bucketed ANN (the at-scale variant of q27): only same-bucket
    * pairs are scored. The deterministic integer hyperplanes make the
    * approximation itself oracle-checkable. */
  val q52 = Q(
    "q52_ann_lsh",
    (s, dir) => {
      import s.implicits._
      val emb = Tables(s, dir, "embeddings")
      Dedup.annTopKLsh(emb, emb.filter($"vec_id" < 10), "vec_id",
          "embedding", k = 5, bits = 8)
        .orderBy(col("id_q"), col("rank"))
    },
    Some {
      val dotW = (alias: String) => (0 until 8).map { j =>
        val a = T.minhashA(j); val b = T.minhashB(j)
        s"""CASE WHEN list_aggregate([$alias.qv[ij] * ((($a*ij + $b) % 1009) - 504)
             for ij in generate_series(1,64)], 'sum') >= 0
           THEN ${1L << j} ELSE 0 END"""
      }.mkString(" + ")
      s"""
      WITH $dkQuantized,
      b AS (SELECT vec_id, qv, nsq, ${dotW("n")} AS bucket FROM n),
      scored AS (
        SELECT qs.vec_id AS id_q, cs.vec_id AS id_c,
               ${dkDot("qs", "cs")} / (sqrt(qs.nsq) * sqrt(cs.nsq)) AS cosine
        FROM b qs JOIN b cs ON qs.bucket = cs.bucket
        WHERE qs.vec_id < 10 AND qs.vec_id <> cs.vec_id)
      SELECT id_q, rank, id_c, cosine FROM (
        SELECT *, CAST(row_number() OVER
          (PARTITION BY id_q ORDER BY cosine DESC, id_c ASC) AS INT) AS rank
        FROM scored)
      WHERE rank <= 5 ORDER BY id_q, rank"""
    },
    covers = Seq("TD-ann-lsh"))

  /** Multi-probe LSH ANN (recall knob between q52's exact-bucket LSH
    * and q27's brute force): queries additionally probe all buckets at
    * hamming distance 1 — candidates are exactly the corpus rows with
    * bit_count(xor(buckets)) <= 1, still fully deterministic. */
  val q68 = Q(
    "q68_ann_multiprobe",
    (s, dir) => {
      import s.implicits._
      val emb = Tables(s, dir, "embeddings")
      Dedup.annTopKMultiProbe(emb, emb.filter($"vec_id" < 10), "vec_id",
          "embedding", k = 5, bits = 8)
        .orderBy(col("id_q"), col("rank"))
    },
    Some {
      val dotW = (alias: String) => (0 until 8).map { j =>
        val a = T.minhashA(j); val b = T.minhashB(j)
        s"""CASE WHEN list_aggregate([$alias.qv[ij] * ((($a*ij + $b) % 1009) - 504)
             for ij in generate_series(1,64)], 'sum') >= 0
           THEN ${1L << j} ELSE 0 END"""
      }.mkString(" + ")
      s"""
      WITH $dkQuantized,
      b AS (SELECT vec_id, qv, nsq, ${dotW("n")} AS bucket FROM n),
      scored AS (
        SELECT qs.vec_id AS id_q, cs.vec_id AS id_c,
               ${dkDot("qs", "cs")} / (sqrt(qs.nsq) * sqrt(cs.nsq)) AS cosine
        FROM b qs JOIN b cs
          ON bit_count(xor(qs.bucket, cs.bucket)) <= 1
        WHERE qs.vec_id < 10 AND qs.vec_id <> cs.vec_id)
      SELECT id_q, rank, id_c, cosine FROM (
        SELECT *, CAST(row_number() OVER
          (PARTITION BY id_q ORDER BY cosine DESC, id_c ASC) AS INT) AS rank
        FROM scored)
      WHERE rank <= 5 ORDER BY id_q, rank"""
    },
    covers = Seq("TD-ann-lsh"))

  /** IVF ANN (the FAISS-style centroid-partitioned scale path,
    * completing the ANN family next to brute force q27, LSH q52 and
    * multi-probe q68): deterministic coarse quantizer = the 8
    * smallest-id vectors, corpus assigned to its argmax-cosine cell,
    * queries probe their 2 nearest cells. Exact integer dot products
    * make assignment, probes and scores oracle-reproducible. */
  val q79 = Q(
    "q79_ann_ivf",
    (s, dir) => {
      import s.implicits._
      val emb = Tables(s, dir, "embeddings")
      Dedup.annTopKIvf(emb, emb.filter($"vec_id" < 10), "vec_id",
          "embedding", k = 5, nCells = 8, nProbe = 2)
        .orderBy(col("id_q"), col("rank"))
    },
    Some(s"""
      WITH $dkQuantized,
      cents AS (SELECT vec_id AS cell, qv AS cqv, nsq AS cnsq
                FROM n ORDER BY vec_id LIMIT 8),
      assign AS (
        SELECT v.vec_id, c.cell,
               row_number() OVER (PARTITION BY v.vec_id ORDER BY
                 list_aggregate([v.qv[i]*c.cqv[i] for i in generate_series(1,64)],'sum')
                   / (sqrt(v.nsq) * sqrt(c.cnsq)) DESC, c.cell ASC) AS rn
        FROM n v, cents c),
      cellmap AS (SELECT vec_id, cell FROM assign WHERE rn = 1),
      probes AS (SELECT vec_id, cell FROM assign WHERE rn <= 2 AND vec_id < 10),
      scored AS (
        SELECT p.vec_id AS id_q, m.vec_id AS id_c,
               ${dkDot("qq", "cc")} / (sqrt(qq.nsq) * sqrt(cc.nsq)) AS cosine
        FROM probes p JOIN cellmap m ON p.cell = m.cell
        JOIN n qq ON qq.vec_id = p.vec_id
        JOIN n cc ON cc.vec_id = m.vec_id
        WHERE p.vec_id <> m.vec_id)
      SELECT id_q, rank, id_c, cosine FROM (
        SELECT *, CAST(row_number() OVER
          (PARTITION BY id_q ORDER BY cosine DESC, id_c ASC) AS INT) AS rank
        FROM scored)
      WHERE rank <= 5 ORDER BY id_q, rank"""),
    covers = Seq("TD-ann-ivf"))

  /** Winnowing fingerprints (MOSS): per-doc selected k-gram hashes —
    * the local-similarity document sketch; any shared run of w+n-1
    * tokens between docs shares a fingerprint. */
  val q80 = Q(
    "q80_winnowing",
    (s, dir) => {
      Dedup.winnowingFingerprints(Tables(s, dir, "documents"),
          "doc_id", "text", n = 3, w = 4)
        .orderBy(col("doc_id"), col("fp"))
    },
    Some(s"""
      WITH toks AS (SELECT doc_id, string_split(text,' ') AS ws FROM documents),
      g AS (SELECT doc_id,
              unnest([{'pos': i, 'hv': ${dkHash(0, "ws[i]||' '||ws[i+1]||' '||ws[i+2]")}}
                      for i in generate_series(1, len(ws)-2)]) AS u
            FROM toks WHERE len(ws) >= 3),
      h AS (SELECT doc_id, u.pos AS pos, u.hv AS hv FROM g),
      w AS (SELECT doc_id, pos, hv,
              min(hv) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS wmin
            FROM h)
      SELECT DISTINCT doc_id, hv AS fp FROM w WHERE pos >= 4 AND hv = wmin
      ORDER BY doc_id, fp"""),
    covers = Seq("TD-fingerprint"))

  /** The corpus-curation pipeline end-to-end (CorpusPipeline): quality
    * envelope → language filter ('en') → exact dedup, emitting the
    * surviving docs — the composed form of q18/q19/q20, oracle-checked
    * as one chain (near-dup stage is registry/spec-covered; its CC
    * iteration isn't single-query SQL). */
  val q69 = Q(
    "q69_corpus_pipeline",
    (s, dir) => {
      import graft.pipelines.CorpusPipeline
      CorpusPipeline.dedupExact(
          CorpusPipeline.languageFilter(
            CorpusPipeline.qualityFilter(Tables(s, dir, "documents"))))
        .select(col("doc_id"), col("n_tokens"))
        .orderBy(col("doc_id"))
    },
    Some {
      val hits = T.lexicons.map { case (lang, ws) =>
        s"len([t for t in string_split(text,' ') if t IN (${ws.map(w => s"'$w'").mkString(",")})]) AS h_$lang"
      }.mkString(",\n               ")
      val langs = T.lexicons.map(_._1)
      val m = s"greatest(${langs.map("h_" + _).mkString(",")})"
      val cases = langs.map(l => s"WHEN h_$l = $m AND $m > 0 THEN '$l'")
        .mkString(" ")
      s"""
      WITH q AS (
        SELECT doc_id, text,
               CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens,
               CAST(length(text) - len(string_split(text,' ')) + 1 AS DOUBLE)
                 / CAST(len(string_split(text,' ')) AS DOUBLE) AS avg_token_len
        FROM documents),
      f AS (SELECT * FROM q
            WHERE n_tokens BETWEEN 5 AND 10000 AND avg_token_len <= 15.0),
      scored AS (SELECT *, $hits FROM f),
      langed AS (SELECT doc_id, text, n_tokens FROM scored
                 WHERE (CASE $cases ELSE 'und' END) = 'en'),
      fpd AS (SELECT *, md5(trim(lower(regexp_replace(text, '\\s+', ' ', 'g')))) AS fp
              FROM langed),
      keep AS (SELECT fp, min(doc_id) AS keeper FROM fpd GROUP BY fp)
      SELECT d.doc_id, d.n_tokens
      FROM fpd d JOIN keep k ON d.fp = k.fp AND d.doc_id = k.keeper
      ORDER BY d.doc_id"""
    },
    covers = Seq("TD-text-quality", "TD-langid", "TD-dedup-exact"))

  /** Batch-incremental first-seen ingestion (CorpusPipeline.ingestNew):
    * documents arrive as two batches (even doc_ids, then odd); each
    * batch emits only never-seen content, earliest id winning within a
    * batch. The oracle restates the two-batch run declaratively: a
    * fingerprint's winner is the min doc_id within the EARLIEST batch
    * containing it. Exercises the persistent seen-table state machine
    * (atomic swap + replay-stable claims) end to end. */
  val q75 = Q(
    "q75_incremental_ingest",
    (s, dir) => {
      import graft.pipelines.CorpusPipeline
      val docs = Tables(s, dir, "documents")
      val seen = java.nio.file.Files
        .createTempDirectory("graft_q75_").toString + "/seen"
      // ingestNew materializes its result internally, so chaining
      // batches in-process is safe with no caller-side pin
      val even = CorpusPipeline.ingestNew(s,
        docs.filter(pmod(col("doc_id"), lit(2)) === 0), seen, "b0")
      val odd = CorpusPipeline.ingestNew(s,
        docs.filter(pmod(col("doc_id"), lit(2)) === 1), seen, "b1")
      even.withColumn("batch", lit(0))
        .unionByName(odd.withColumn("batch", lit(1)))
        .select(col("doc_id"), col("batch"))
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH d AS (
        SELECT doc_id,
               md5(trim(lower(regexp_replace(text, '\s+', ' ', 'g')))) AS fp,
               CAST(doc_id % 2 AS INT) AS b
        FROM documents),
      w AS (SELECT fp, min(b) AS mb FROM d GROUP BY fp),
      k AS (SELECT d.fp, d.b AS batch, min(d.doc_id) AS doc_id
            FROM d JOIN w ON d.fp = w.fp AND d.b = w.mb
            GROUP BY d.fp, d.b)
      SELECT doc_id, batch FROM k ORDER BY doc_id"""),
    covers = Seq("TD-dedup-exact", "ST1"))

  /** REAL image decode through the JDK codec (javax.imageio): each doc
    * id is rendered to a grayscale PNG whose pixel function is
    * closed-form in the id (Multimodal.ImageCodec.syntheticPng), the
    * engine decodes the actual PNG bytes partition-parallel and emits
    * header dimensions + exact pixel statistics — and the oracle
    * recomputes those statistics from the pixel formula alone, so a
    * codec that mis-decoded a single pixel hash-fails. (Audio/video
    * remain stubbed: the JVM ships no codecs for them.) */
  val q76 = Q(
    "q76_image_decode",
    (s, dir) => {
      import s.implicits._
      import graft.ops.Multimodal
      val media = Tables(s, dir, "documents").select($"doc_id").as[Long]
        .map(id => Multimodal.MediaRow(id, "image",
          Multimodal.ImageCodec.syntheticPng(id)))
      Multimodal.imageStats(media).toDF().orderBy($"media_id")
    },
    Some("""
      WITH m AS (
        SELECT doc_id, CAST(8 + doc_id % 9 AS INT) AS w,
               CAST(8 + doc_id % 7 AS INT) AS h
        FROM documents),
      px AS (
        SELECT m.doc_id, m.w, m.h,
               (x.i * 7 + y.j * 13 + m.doc_id) % 256 AS v
        FROM m, range(0, 16) x(i), range(0, 14) y(j)
        WHERE x.i < m.w AND y.j < m.h)
      SELECT doc_id AS media_id, w AS width, h AS height,
             COUNT(*) AS n_px,
             CAST(SUM(v) AS DOUBLE) / COUNT(*) AS mean_intensity
      FROM px GROUP BY 1, 2, 3 ORDER BY media_id"""),
    covers = Seq("TD-multimodal"))

  /** Near-dup PAIR→CLUSTER resolution (the stage q69 stops before):
    * MinHash→LSH candidate pairs (exactly q23's construction) resolved
    * into connected components by Dedup.duplicateClusters (min-label +
    * pointer-jumping to fixpoint), with the keeper decision. The oracle
    * restates the fixpoint declaratively: a recursive reachability
    * closure over the undirected pair edges, cluster = min reachable
    * id — so the iterative distributed algorithm is hash-checked
    * against the mathematical definition of its answer. */
  val q77 = Q(
    "q77_dedup_clusters",
    (s, dir) => {
      val sig = Dedup.minhashSignatures(Tables(s, dir, "documents"),
        "doc_id", "text", n = 3, k = K)
      // pairs feed four subtrees (both endpoint unions + both edge
      // directions); pin the tiny pair set so the signature+band join
      // runs once, not per consumer
      val pairs = Dedup.lshCandidatePairs(sig, "doc_id", k = K, rows = BAND_ROWS)
        .localCheckpoint()
      val ids = pairs.select(col("id_a").as("doc_id"))
        .unionByName(pairs.select(col("id_b").as("doc_id"))).distinct()
      val decided = Dedup.dedupDecision(ids, "doc_id", pairs)
      // dedupDecision materializes its CC frontier eagerly, so the pair
      // checkpoint is dead here — free it rather than leak per run
      graft.CacheTracker.releaseCheckpoint(pairs)
      decided.orderBy(col("doc_id"))
    },
    Some {
      val bandRows = (0 until K / BAND_ROWS).map { b =>
        val key = (b * BAND_ROWS until (b + 1) * BAND_ROWS)
          .map(i => s"CAST(mh$i AS VARCHAR)").mkString("||'_'||")
        s"SELECT doc_id, $b AS band, $key AS band_key FROM sig"
      }.mkString("\n        UNION ALL\n        ")
      s"""
      WITH RECURSIVE $dkShingles,
      $dkSig,
      bands AS (
        $bandRows),
      pairs AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bands a JOIN bands b USING(band, band_key)
        WHERE a.doc_id < b.doc_id),
      edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
                UNION ALL
                SELECT id_b AS src, id_a AS dst FROM pairs),
      nodes AS (SELECT DISTINCT src AS node FROM edges),
      reach AS (
        SELECT node, node AS m FROM nodes
        UNION
        SELECT e.dst AS node, r.m
        FROM reach r JOIN edges e ON e.src = r.node
      )
      SELECT node AS doc_id, MIN(m) AS cluster, node = MIN(m) AS keep
      FROM reach GROUP BY node ORDER BY doc_id"""
    },
    covers = Seq("TD-dedup-clusters", "TD-dedup-lsh"))

  /** Benchmark decontamination (train/test overlap removal — the
    * GPT-3-style exact n-gram collision rule): source 'src0' plays the
    * held-out benchmark, every other doc is corpus; corpus docs
    * sharing ≥1 word 4-gram with the benchmark are dropped. Both sides
    * shingle once; the match is an equi-join on the 60-bit gram hash
    * (benchmark side distinct + broadcastable). */
  val q83 = Q(
    "q83_decontaminate",
    (s, dir) => {
      import graft.pipelines.CorpusPipeline
      val docs = Tables(s, dir, "documents")
      CorpusPipeline.decontaminate(
          docs.filter(col("source") =!= "src0"),
          docs.filter(col("source") === "src0"),
          n = 4)
        .select(col("doc_id"), col("source"))
        .orderBy(col("doc_id"))
    },
    Some {
      val grams = "[ws[i]||' '||ws[i+1]||' '||ws[i+2]||' '||ws[i+3] " +
        "for i in generate_series(1, len(ws)-3)]"
      s"""
      WITH c AS (SELECT doc_id, source, text FROM documents WHERE source <> 'src0'),
      b AS (SELECT text FROM documents WHERE source = 'src0'),
      cg AS (SELECT DISTINCT doc_id, ${dkHash(0, "g")} AS h
             FROM (SELECT doc_id, unnest($grams) AS g
                   FROM (SELECT doc_id, string_split(text,' ') AS ws FROM c)
                   WHERE len(ws) >= 4)),
      bg AS (SELECT DISTINCT ${dkHash(0, "g")} AS h
             FROM (SELECT unnest($grams) AS g
                   FROM (SELECT string_split(text,' ') AS ws FROM b)
                   WHERE len(ws) >= 4)),
      bad AS (SELECT DISTINCT doc_id FROM cg JOIN bg USING (h))
      SELECT doc_id, source FROM c
      WHERE doc_id NOT IN (SELECT doc_id FROM bad)
      ORDER BY doc_id"""
    },
    covers = Seq("TD-decontaminate", "TD-dedup-ngram"))

  /** Incremental NEAR-dup ingestion end to end
    * (CorpusPipeline.ingestNewNearDup, the state machine behind
    * StreamingDedup.runNearDupSink): documents arrive as two batches
    * (even doc_ids, then odd); a doc is admitted iff it shares no LSH
    * band with an earlier ADMITTED doc, min id winning within a batch
    * component. The oracle restates the greedy two-batch run
    * declaratively: batch-0 admission = min-reachable-id over the
    * even-doc band-collision graph; batch-1 drops odds colliding with
    * batch-0 admitted bands, then resolves the remaining odd components
    * the same way. Exercises bucket-table persistence, suppression,
    * intra-batch clustering and the atomic swap in one oracle-gated
    * chain. */
  val q82 = Q(
    "q82_neardup_ingest",
    (s, dir) => {
      import graft.pipelines.CorpusPipeline
      val docs = Tables(s, dir, "documents")
      val bucket = java.nio.file.Files
        .createTempDirectory("graft_q82_").toString + "/buckets"
      val even = CorpusPipeline.ingestNewNearDup(s,
        docs.filter(pmod(col("doc_id"), lit(2)) === 0), bucket, "b0")
      val odd = CorpusPipeline.ingestNewNearDup(s,
        docs.filter(pmod(col("doc_id"), lit(2)) === 1), bucket, "b1")
      even.withColumn("batch", lit(0))
        .unionByName(odd.withColumn("batch", lit(1)))
        .select(col("doc_id"), col("batch"))
        .orderBy(col("doc_id"))
    },
    Some {
      val bandRows = (0 until K / BAND_ROWS).map { b =>
        val key = (b * BAND_ROWS until (b + 1) * BAND_ROWS)
          .map(i => s"CAST(mh$i AS VARCHAR)").mkString("||'_'||")
        s"SELECT doc_id, $b AS band, $key AS band_key FROM sig"
      }.mkString("\n        UNION ALL\n        ")
      s"""
      WITH RECURSIVE $dkShingles,
      $dkSig,
      bands AS (
        $bandRows),
      ev AS (SELECT doc_id FROM documents WHERE doc_id % 2 = 0),
      od AS (SELECT doc_id FROM documents WHERE doc_id % 2 = 1),
      bands0 AS (SELECT b.* FROM bands b JOIN ev USING (doc_id)),
      edges0 AS (
        SELECT DISTINCT a.doc_id AS src, b.doc_id AS dst
        FROM bands0 a JOIN bands0 b USING (band, band_key)
        WHERE a.doc_id <> b.doc_id),
      reach0 AS (
        SELECT doc_id AS node, doc_id AS m FROM ev
        UNION
        SELECT e.dst AS node, r.m FROM reach0 r JOIN edges0 e ON e.src = r.node
      ),
      admit0 AS (SELECT node AS doc_id FROM reach0 GROUP BY node
                 HAVING node = MIN(m)),
      bucket0 AS (SELECT DISTINCT band, band_key
                  FROM bands0 JOIN admit0 USING (doc_id)),
      sup1 AS (SELECT DISTINCT b.doc_id
               FROM bands b JOIN od USING (doc_id)
               JOIN bucket0 USING (band, band_key)),
      live1 AS (SELECT doc_id FROM od
                WHERE doc_id NOT IN (SELECT doc_id FROM sup1)),
      bands1 AS (SELECT b.* FROM bands b JOIN live1 USING (doc_id)),
      edges1 AS (
        SELECT DISTINCT a.doc_id AS src, b.doc_id AS dst
        FROM bands1 a JOIN bands1 b USING (band, band_key)
        WHERE a.doc_id <> b.doc_id),
      reach1 AS (
        SELECT doc_id AS node, doc_id AS m FROM live1
        UNION
        SELECT e.dst AS node, r.m FROM reach1 r JOIN edges1 e ON e.src = r.node
      ),
      admit1 AS (SELECT node AS doc_id FROM reach1 GROUP BY node
                 HAVING node = MIN(m))
      SELECT doc_id, 0 AS batch FROM admit0
      UNION ALL
      SELECT doc_id, 1 AS batch FROM admit1
      ORDER BY doc_id"""
    },
    covers = Seq("TD-dedup-lsh", "TD-dedup-clusters", "ST1"))

  /** Tumbling-window aggregation over the event stream (Spark
    * `window()` — the Structured Streaming windowed-agg shape, run
    * batch here): per hour × event_type counts and exact value sums. */
  val q53 = Q(
    "q53_event_windows",
    (s, dir) => {
      import s.implicits._
      Tables(s, dir, "events")
        .groupBy(window($"ts", "1 hour"), $"event_type")
        .agg(
          count(lit(1)).as("n_events"),
          sum($"value".cast("decimal(18,6)")).cast("double").as("sum_value"))
        .select($"window.start".as("window_start"), $"event_type",
          $"n_events", $"sum_value")
        .orderBy($"window_start", $"event_type")
    },
    Some("""
      SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS window_start,
             event_type, count(*) AS n_events,
             CAST(CAST(sum(CAST(value AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS sum_value
      FROM events
      GROUP BY 1, 2 ORDER BY window_start, event_type"""),
    covers = Seq("ST-window-agg"))

  /** Graded contamination scoring (PaLM-style n-gram containment):
    * src0 plays the benchmark again (as in q83); every other doc gets
    * the fraction of its distinct word 4-grams that appear anywhere in
    * the benchmark, plus the ≥τ flag. Integer counts + one IEEE
    * division → bit-stable. */
  val q85 = Q(
    "q85_contamination",
    (s, dir) => {
      import graft.pipelines.CorpusPipeline
      val docs = Tables(s, dir, "documents")
      CorpusPipeline.containmentScores(
          docs.filter(col("source") =!= "src0"),
          docs.filter(col("source") === "src0"),
          n = 4, tau = 0.25)
        .orderBy(col("doc_id"))
    },
    Some {
      val grams = "[ws[i]||' '||ws[i+1]||' '||ws[i+2]||' '||ws[i+3] " +
        "for i in generate_series(1, len(ws)-3)]"
      s"""
      WITH c AS (SELECT doc_id, text FROM documents WHERE source <> 'src0'),
      b AS (SELECT text FROM documents WHERE source = 'src0'),
      cg AS (SELECT DISTINCT doc_id, ${dkHash(0, "g")} AS h
             FROM (SELECT doc_id, unnest($grams) AS g
                   FROM (SELECT doc_id, string_split(text,' ') AS ws FROM c)
                   WHERE len(ws) >= 4)),
      bg AS (SELECT DISTINCT ${dkHash(0, "g")} AS h
             FROM (SELECT unnest($grams) AS g
                   FROM (SELECT string_split(text,' ') AS ws FROM b)
                   WHERE len(ws) >= 4)),
      s AS (SELECT doc_id, count(*) AS n_grams FROM cg GROUP BY 1),
      ht AS (SELECT doc_id, count(*) AS bench_hits
             FROM cg JOIN bg USING (h) GROUP BY 1)
      SELECT c.doc_id,
             coalesce(s.n_grams, 0) AS n_grams,
             coalesce(ht.bench_hits, 0) AS bench_hits,
             CASE WHEN coalesce(s.n_grams, 0) = 0 THEN CAST(0.0 AS DOUBLE)
                  ELSE CAST(coalesce(ht.bench_hits, 0) AS DOUBLE) / s.n_grams
             END AS containment,
             (CASE WHEN coalesce(s.n_grams, 0) = 0 THEN CAST(0.0 AS DOUBLE)
                   ELSE CAST(coalesce(ht.bench_hits, 0) AS DOUBLE) / s.n_grams
              END) >= 0.25 AS contaminated
      FROM c LEFT JOIN s USING (doc_id) LEFT JOIN ht USING (doc_id)
      ORDER BY c.doc_id"""
    },
    covers = Seq("TD-decontaminate", "TD-quality-containment"))

  /** Repetition quality signal (the Gopher/RefinedWeb top-n-gram
    * fraction rule): per doc, share of 2-gram occurrences (with
    * multiplicity) taken by the most frequent 2-gram; short docs score
    * 0. The ratio is a single IEEE division of two exact int64s, so
    * the hash compare is bit-stable. */
  val q84 = Q(
    "q84_repetition",
    (s, dir) => {
      import graft.pipelines.CorpusPipeline
      CorpusPipeline.repetitionScores(Tables(s, dir, "documents"), n = 2)
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH g AS (
        SELECT doc_id, unnest([ws[i]||' '||ws[i+1]
                               for i in generate_series(1, len(ws)-1)]) AS g
        FROM (SELECT doc_id, string_split(text,' ') AS ws FROM documents)
        WHERE len(ws) >= 2),
      c AS (SELECT doc_id, g, count(*) AS c FROM g GROUP BY 1, 2),
      r AS (SELECT doc_id, max(c) AS top_gram_count,
                   CAST(sum(c) AS BIGINT) AS n_grams
            FROM c GROUP BY 1)
      SELECT d.doc_id,
             coalesce(r.top_gram_count, 0) AS top_gram_count,
             coalesce(r.n_grams, 0) AS n_grams,
             CASE WHEN r.n_grams IS NULL THEN CAST(0.0 AS DOUBLE)
                  ELSE CAST(r.top_gram_count AS DOUBLE) / r.n_grams
             END AS rep_ratio
      FROM documents d LEFT JOIN r USING (doc_id)
      ORDER BY d.doc_id"""),
    covers = Seq("TD-quality-repetition"))

  /** Token-budget shard packing (sequence-packing front half): shard =
    * exclusive running token total in doc order, integer-divided by the
    * budget. The Spark side decomposes the prefix sum two-level (see
    * [[graft.pipelines.CorpusPipeline.packShards]]); the oracle states
    * the same quantity as one global window — algebraically identical,
    * which is exactly what the hash compare proves. */
  val q86 = Q(
    "q86_shard_pack",
    (s, dir) => {
      import graft.pipelines.CorpusPipeline
      CorpusPipeline.packShards(
          Tables(s, dir, "documents"), budgetTokens = 2000,
          bucket = expr("doc_id DIV 256"))
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH t AS (SELECT doc_id,
                   CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens
                 FROM documents)
      SELECT doc_id, n_tokens,
             CAST(floor(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               / 2000.0) AS BIGINT) AS shard
      FROM t ORDER BY doc_id"""),
    covers = Seq("TD-shard-pack"))

  /** Stratified quota sampling by (lang, source) with a seeded
    * deterministic hash draw — the data-mixing primitive. */
  val q87 = Q(
    "q87_stratified_sample",
    (s, dir) => {
      import graft.pipelines.CorpusPipeline
      CorpusPipeline.stratifiedSample(
          Tables(s, dir, "documents"), quota = 40, seed = 7)
        .orderBy(col("doc_id"))
    },
    Some(s"""
      SELECT doc_id, lang, source, sample_rank FROM (
        SELECT doc_id, lang, source,
               row_number() OVER (PARTITION BY lang, source
                 ORDER BY ${dkHash(7, "CAST(doc_id AS VARCHAR)")}, doc_id)
                 AS sample_rank
        FROM documents)
      WHERE sample_rank <= 40 ORDER BY doc_id"""),
    covers = Seq("TD-stratified-sample"))

  /** Embedding cluster coherence: per-label centroid tightness stats
    * over exact quantized integer vectors (mean via the DECIMAL(18,6)
    * channel — see [[graft.ops.EmbeddingStats.clusterCoherence]]). */
  val q88 = Q(
    "q88_cluster_coherence",
    (s, dir) => {
      graft.ops.EmbeddingStats.clusterCoherence(Tables(s, dir, "embeddings"))
        .orderBy(col("label"))
    },
    Some("""
      WITH q AS (SELECT vec_id, label,
                   [CAST(round(CAST(x AS DOUBLE)*1000) AS BIGINT)
                    for x in embedding] AS qv
                 FROM embeddings),
      u AS (SELECT vec_id, label, i, qv[i] AS v
            FROM q, generate_series(1,64) g(i)),
      cent AS (SELECT label, i, CAST(sum(v) AS BIGINT) AS s
               FROM u GROUP BY 1, 2),
      cn AS (SELECT label, CAST(sum(s*s) AS BIGINT) AS cnsq
             FROM cent GROUP BY 1),
      per AS (SELECT u.vec_id, u.label,
                CAST(sum(u.v * c.s) AS BIGINT) AS dot,
                CAST(sum(u.v * u.v) AS BIGINT) AS nsq
              FROM u JOIN cent c ON u.label = c.label AND u.i = c.i
              GROUP BY 1, 2),
      cos AS (SELECT p.label,
                CASE WHEN p.nsq = 0 OR c.cnsq = 0 THEN CAST(0.0 AS DOUBLE)
                     ELSE CAST(p.dot AS DOUBLE)
                          / (sqrt(CAST(p.nsq AS DOUBLE))
                             * sqrt(CAST(c.cnsq AS DOUBLE))) END AS cos
              FROM per p JOIN cn c USING (label))
      SELECT label, count(*) AS n_vecs,
             CAST(CAST(sum(CAST(cos AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE)
               / count(*) AS mean_cos,
             min(cos) AS min_cos, max(cos) AS max_cos
      FROM cos GROUP BY label ORDER BY label"""),
    covers = Seq("TD-cluster-coherence"))

  /** Asymmetric containment pairs (excerpt/quote detection):
    * C = |A∩B| / min(|A|,|B|) over 3-gram sets with boilerplate grams
    * (df > 30) excluded — the df cap is part of the operator contract
    * AND the scale lever (bucket fan-out ≤ maxDf²). Complement of q21's
    * symmetric Jaccard: a short doc quoted inside a long one scores ~1
    * here while its Jaccard is ~0. */
  val q89 = Q(
    "q89_containment_pairs",
    (s, dir) => {
      Dedup.containmentPairs(Tables(s, dir, "documents"), "doc_id", "text",
          n = 3, minC = 0.6, maxDf = 30)
        .orderBy(col("id_a"), col("id_b"))
    },
    Some(s"""
      WITH $dkShingles,
      fr AS (SELECT sh, count(*) AS df FROM sh GROUP BY 1),
      kept AS (SELECT s.doc_id, s.sh FROM sh s JOIN fr USING (sh)
               WHERE df <= 30),
      sizes AS (SELECT doc_id, count(*) AS n FROM kept GROUP BY 1),
      inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                       count(*) AS n_inter
                FROM kept a JOIN kept b USING (sh)
                WHERE a.doc_id < b.doc_id GROUP BY 1, 2)
      SELECT id_a, id_b, n_inter, sa.n AS n_a, sb.n AS n_b,
             CAST(n_inter AS DOUBLE)
               / CAST(least(sa.n, sb.n) AS DOUBLE) AS containment
      FROM inter JOIN sizes sa ON id_a = sa.doc_id
                 JOIN sizes sb ON id_b = sb.doc_id
      WHERE CAST(n_inter AS DOUBLE)
              / CAST(least(sa.n, sb.n) AS DOUBLE) >= 0.6
      ORDER BY id_a, id_b"""),
    covers = Seq("TD-dedup-containment"))

  /** Rate-based mixture sampling (q87's streaming-safe complement):
    * explicit target shares per lang, acceptance rate min(1,
    * share·total/n_s), deterministic Bernoulli accept via the seeded
    * 60-bit hash against ⌊rate·2⁶⁰⌋. Strata not in the spec drop. */
  val q90 = Q(
    "q90_mixture_sample",
    (s, dir) => {
      import graft.pipelines.CorpusPipeline
      CorpusPipeline.mixtureSample(Tables(s, dir, "documents"),
          shares = Seq("en" -> 0.6, "de" -> 0.3, "fr" -> 0.1),
          targetTotal = 300, seed = 11)
        .orderBy(col("doc_id"))
    },
    Some(s"""
      WITH n AS (SELECT lang, count(*) AS n_s FROM documents GROUP BY 1),
      r AS (SELECT lang,
              least(CAST(1.0 AS DOUBLE),
                    (CASE lang WHEN 'en' THEN CAST(0.6 AS DOUBLE)
                               WHEN 'de' THEN CAST(0.3 AS DOUBLE)
                               WHEN 'fr' THEN CAST(0.1 AS DOUBLE)
                               ELSE CAST(0.0 AS DOUBLE) END)
                    * CAST(300.0 AS DOUBLE)
                    / CAST(n_s AS DOUBLE)) AS accept_rate
            FROM n),
      t AS (SELECT lang, accept_rate,
              CAST(floor(accept_rate * 1152921504606846976.0) AS BIGINT)
                AS thresh
            FROM r)
      SELECT d.doc_id, d.lang, t.accept_rate
      FROM documents d JOIN t USING (lang)
      WHERE ${dkHash(11, "CAST(doc_id AS VARCHAR)")} < t.thresh
      ORDER BY d.doc_id"""),
    covers = Seq("TD-mixture-sample"))

  /** PII scrub (`graft.ops.Pii`): detect and redact phone-shaped
    * substrings and account-number digit runs before text reaches a
    * tokenizer. The corpus tables carry no natural PII, so the query
    * first formats a deterministic support-message per customer row
    * (phone present on 2 of 3 rows — both branches exercised), then
    * runs the real detection/redaction expressions; the oracle
    * re-derives the message AND the scrub in DuckDB, so one mis-masked
    * character hash-fails. Pure narrow projection — codegen'd regex
    * over the scan, no shuffle, the 100 TB shape of a scrub pass. */
  val q92 = Q(
    "q92_pii_scrub",
    (s, dir) => {
      import graft.ops.Pii
      val c = Tables(s, dir, "customer")
      val k = col("c_custkey")
      val phone = concat(
        ((k % 90) + 10).cast("string"), lit("-"),
        ((k % 900) + 100).cast("string"), lit("-"),
        (((k * 7) % 900) + 100).cast("string"), lit("-"),
        (((k * 13) % 9000) + 1000).cast("string"))
      val acct = (lit(10000000L) + (k * 7919) % 90000000L).cast("string")
      val msg = concat(lit("customer "), col("c_name"),
        when(k % 3 === 0, lit(""))
          .otherwise(concat(lit(" call "), phone)),
        lit(" ref "), acct)
      c.select(k.as("c_custkey"),
          Pii.hasPhone(msg).as("has_phone"),
          Pii.digitCount(msg).as("n_digits"),
          Pii.redactDigitRuns(
            regexp_replace(msg, Pii.PhonePattern, "<PHONE>"), "<ID>")
            .as("scrubbed"))
        .orderBy(col("c_custkey"))
    },
    Some("""
      WITH m AS (
        SELECT c_custkey,
               'customer ' || c_name ||
               (CASE WHEN c_custkey % 3 = 0 THEN ''
                     ELSE ' call ' ||
                          CAST((c_custkey % 90) + 10 AS VARCHAR) || '-' ||
                          CAST((c_custkey % 900) + 100 AS VARCHAR) || '-' ||
                          CAST(((c_custkey * 7) % 900) + 100 AS VARCHAR) || '-' ||
                          CAST(((c_custkey * 13) % 9000) + 1000 AS VARCHAR)
                END) ||
               ' ref ' ||
               CAST(10000000 + (c_custkey * 7919) % 90000000 AS VARCHAR) AS msg
        FROM customer)
      SELECT c_custkey,
             regexp_matches(msg, '[0-9]{2}-[0-9]{3}-[0-9]{3}-[0-9]{4}')
               AS has_phone,
             CAST(len(msg) - len(regexp_replace(msg, '[0-9]', '', 'g'))
               AS BIGINT) AS n_digits,
             regexp_replace(
               regexp_replace(msg, '[0-9]{2}-[0-9]{3}-[0-9]{3}-[0-9]{4}',
                              '<PHONE>', 'g'),
               '[0-9]{6,}', '<ID>', 'g') AS scrubbed
      FROM m ORDER BY c_custkey"""),
    covers = Seq("TD-pii-scrub"))

  /** Tokenizer-vocabulary head ([[CorpusPipeline.topTokens]]): top-50
    * tokens by occurrence with deterministic tie-break and coverage
    * share — one explode + one map-side-combined aggregation +
    * TakeOrdered; the shuffle carries |vocab| rows, not |tokens|. */
  val q93 = Q(
    "q93_top_tokens",
    (s, dir) => {
      import graft.pipelines.CorpusPipeline
      CorpusPipeline.topTokens(Tables(s, dir, "documents"), k = 50)
        .orderBy(col("rank"))
    },
    Some("""
      WITH t AS (SELECT unnest(string_split(text, ' ')) AS token
                 FROM documents),
      c AS (SELECT token, count(*) AS n_occ FROM t GROUP BY 1),
      tot AS (SELECT CAST(sum(n_occ) AS BIGINT) AS total FROM c),
      top AS (SELECT token, n_occ FROM c
              ORDER BY n_occ DESC, token LIMIT 50)
      SELECT CAST(row_number() OVER (ORDER BY n_occ DESC, token) AS INT)
               AS rank,
             token, n_occ,
             CAST(n_occ AS DOUBLE) / CAST(tot.total AS DOUBLE) AS coverage
      FROM top, tot ORDER BY rank"""),
    covers = Seq("TD-vocab-head"))

  /** Duplicated-span fraction ([[CorpusPipeline.dupSpanFraction]]):
    * per doc, share of its distinct 5-gram windows occurring in >= 2
    * documents — the sub-document boilerplate diagnostic doc-level
    * dedup can't see. Gram-hash equi-joins only; no similarity join. */
  val q94 = Q(
    "q94_dup_spans",
    (s, dir) => {
      import graft.pipelines.CorpusPipeline
      CorpusPipeline.dupSpanFraction(Tables(s, dir, "documents"), n = 5)
        .orderBy(col("doc_id"))
    },
    Some {
      val grams = "[ws[i]||' '||ws[i+1]||' '||ws[i+2]||' '||ws[i+3]||' '||ws[i+4] " +
        "for i in generate_series(1, len(ws)-4)]"
      s"""
      WITH g AS (
        SELECT DISTINCT doc_id, ${dkHash(0, "g")} AS h
        FROM (SELECT doc_id, unnest($grams) AS g
              FROM (SELECT doc_id, string_split(text,' ') AS ws
                    FROM documents)
              WHERE len(ws) >= 5)),
      f AS (SELECT h, count(*) AS df FROM g GROUP BY 1),
      p AS (SELECT doc_id, count(*) AS n_grams,
                   count(*) FILTER (WHERE f.df >= 2) AS n_dup_grams
            FROM g JOIN f USING (h) GROUP BY 1)
      SELECT d.doc_id,
             coalesce(p.n_grams, 0) AS n_grams,
             coalesce(p.n_dup_grams, 0) AS n_dup_grams,
             CASE WHEN coalesce(p.n_grams, 0) = 0 THEN CAST(0.0 AS DOUBLE)
                  ELSE CAST(p.n_dup_grams AS DOUBLE) / CAST(p.n_grams AS DOUBLE)
             END AS dup_fraction
      FROM documents d LEFT JOIN p USING (doc_id)
      ORDER BY d.doc_id"""
    },
    covers = Seq("TD-dup-spans"))

  /** Epoch-weighted upsampling ([[CorpusPipeline.upsampleMixture]]):
    * q90's uncapped complement — rate > 1 replicates docs
    * floor(rate)× plus a seeded-hash Bernoulli for the fraction, the
    * fixed-budget multi-epoch data recipe. Replica set is
    * deterministic, so the oracle reproduces every (doc_id, copy)
    * row exactly. */
  val q95 = Q(
    "q95_upsample_mixture",
    (s, dir) => {
      import graft.pipelines.CorpusPipeline
      CorpusPipeline.upsampleMixture(Tables(s, dir, "documents"),
          shares = Seq("en" -> 0.55, "de" -> 0.25, "fr" -> 0.2),
          targetTotal = 1200, seed = 17)
        .orderBy(col("doc_id"), col("copy"))
    },
    Some(s"""
      WITH n AS (SELECT lang, count(*) AS n_s FROM documents GROUP BY 1),
      r AS (SELECT lang,
              (CASE lang WHEN 'en' THEN CAST(0.55 AS DOUBLE)
                         WHEN 'de' THEN CAST(0.25 AS DOUBLE)
                         WHEN 'fr' THEN CAST(0.2 AS DOUBLE)
                         ELSE CAST(0.0 AS DOUBLE) END)
              * CAST(1200.0 AS DOUBLE) / CAST(n_s AS DOUBLE) AS rate
            FROM n),
      b AS (SELECT lang, rate,
              CAST(floor(rate) AS BIGINT) AS base,
              CAST(floor((rate - floor(rate)) * 1152921504606846976.0)
                AS BIGINT) AS thresh
            FROM r),
      c AS (SELECT d.doc_id, d.lang, b.rate,
              b.base + (CASE WHEN
                ${dkHash(17, "CAST(doc_id AS VARCHAR)")} < b.thresh
                THEN 1 ELSE 0 END) AS n_copies
            FROM documents d JOIN b USING (lang))
      SELECT doc_id, lang, rate, n_copies,
             unnest(generate_series(1, n_copies)) AS copy
      FROM c WHERE n_copies >= 1
      ORDER BY doc_id, copy"""),
    covers = Seq("TD-upsample-mixture"))

  /** Context-window chunking ([[CorpusPipeline.chunkTokens]]): token
    * windows of 64 every 48 (16-token overlap), chunk identity = the
    * seeded 60-bit content hash. Explode-only — no shuffle. */
  val q99 = Q(
    "q99_chunking",
    (s, dir) => {
      import graft.pipelines.CorpusPipeline
      CorpusPipeline.chunkTokens(Tables(s, dir, "documents"),
          width = 64, stride = 48)
        .orderBy(col("doc_id"), col("start"))
    },
    Some(s"""
      WITH toks AS (SELECT doc_id, string_split(text,' ') AS ws
                    FROM documents),
      ch AS (SELECT doc_id, ws,
                    unnest(generate_series(1, len(ws), 48)) AS start
             FROM toks)
      SELECT doc_id,
             CAST(start AS INT) AS start,
             CAST(len(ws[start:least(start+63, len(ws))]) AS INT)
               AS n_chunk_toks,
             ${dkHash(0, "array_to_string(ws[start:least(start+63, len(ws))],' ')")}
               AS chunk_hash
      FROM ch ORDER BY doc_id, start"""),
    covers = Seq("TD-chunking"))

  /** Cross-source contamination matrix
    * ([[CorpusPipeline.crossSourceOverlap]]): per source pair, the
    * distinct shared whole-doc fingerprints and shared 5-gram span
    * hashes — key equi-joins with per-key fan-out ≤ #sources. */
  val q100 = Q(
    "q100_source_overlap",
    (s, dir) => {
      import graft.pipelines.CorpusPipeline
      CorpusPipeline.crossSourceOverlap(Tables(s, dir, "documents"))
        .orderBy(col("source_a"), col("source_b"))
    },
    Some(s"""
      WITH d AS (SELECT DISTINCT source,
               md5(trim(lower(regexp_replace(text, '\\s+', ' ', 'g')))) AS k
             FROM documents),
      fp AS (SELECT a.source AS source_a, b.source AS source_b,
                    count(*) AS n_shared_fps
             FROM d a JOIN d b ON a.k = b.k AND a.source < b.source
             GROUP BY 1, 2),
      g AS (SELECT DISTINCT source, ${dkHash(0, "g")} AS k FROM
              (SELECT source,
                      unnest([ws[i]||' '||ws[i+1]||' '||ws[i+2]||' '||ws[i+3]||' '||ws[i+4]
                              for i in generate_series(1, len(ws)-4)]) AS g
               FROM (SELECT source, string_split(text,' ') AS ws FROM documents)
               WHERE len(ws) >= 5)),
      sp AS (SELECT a.source AS source_a, b.source AS source_b,
                    count(*) AS n_shared_grams
             FROM g a JOIN g b ON a.k = b.k AND a.source < b.source
             GROUP BY 1, 2)
      SELECT coalesce(fp.source_a, sp.source_a) AS source_a,
             coalesce(fp.source_b, sp.source_b) AS source_b,
             coalesce(fp.n_shared_fps, 0) AS n_shared_fps,
             coalesce(sp.n_shared_grams, 0) AS n_shared_grams
      FROM fp FULL OUTER JOIN sp
        ON fp.source_a = sp.source_a AND fp.source_b = sp.source_b
      ORDER BY 1, 2"""),
    covers = Seq("TD-cross-source"))

  /** Deterministic train/val/test split ([[CorpusPipeline.splitAssign]]):
    * seeded-hash mod-100 cuts (80/10/10), verified via per-(lang,split)
    * counts — uniform within every stratum by construction. */
  val q101 = Q(
    "q101_train_split",
    (s, dir) => {
      import graft.pipelines.CorpusPipeline
      CorpusPipeline.splitAssign(Tables(s, dir, "documents"))
        .groupBy(col("lang"), col("split"))
        .agg(count(lit(1)).as("n_docs"),
          min(col("doc_id")).as("min_doc_id"),
          max(col("doc_id")).as("max_doc_id"))
        .orderBy(col("lang"), col("split"))
    },
    Some(s"""
      WITH a AS (SELECT doc_id, lang,
               CASE WHEN ${dkHash(21, "CAST(doc_id AS VARCHAR)")} % 100 < 80
                      THEN 'train'
                    WHEN ${dkHash(21, "CAST(doc_id AS VARCHAR)")} % 100 < 90
                      THEN 'val'
                    ELSE 'test' END AS split
             FROM documents)
      SELECT lang, split, count(*) AS n_docs,
             min(doc_id) AS min_doc_id, max(doc_id) AS max_doc_id
      FROM a GROUP BY 1, 2 ORDER BY 1, 2"""),
    covers = Seq("TD-split"))

  /** BM25 lexical retrieval ([[graft.ops.Retrieval.bm25TopK]]):
    * query-by-document top-20 with odds-ratio idf and fixed-order
    * summation (see Retrieval's scaladoc for why both are exact
    * cross-engine). tf/df aggregations + broadcast query terms. */
  val q102 = Q(
    "q102_bm25_topk",
    (s, dir) => {
      graft.ops.Retrieval.bm25TopK(Tables(s, dir, "documents"),
        queryDocId = 42L, k = 20)
    },
    Some("""
      WITH toks AS (SELECT doc_id, unnest(string_split(text,' ')) AS tok
                    FROM documents),
      tf AS (SELECT doc_id, tok, CAST(count(*) AS DOUBLE) AS tf
             FROM toks GROUP BY 1, 2),
      dfreq AS (SELECT tok, CAST(count(*) AS DOUBLE) AS df
                FROM tf GROUP BY 1),
      dl AS (SELECT doc_id, CAST(len(string_split(text,' ')) AS DOUBLE) AS dl
             FROM documents),
      st AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs,
                    CAST(sum(len(string_split(text,' '))) AS DOUBLE) AS tot_toks
             FROM documents),
      qt AS (SELECT DISTINCT unnest(string_split(text,' ')) AS tok
             FROM documents WHERE doc_id = 42),
      sc AS (SELECT tf.doc_id,
               (((n_docs - df) + 0.5) / (df + 0.5)) *
               ((tf * 2.5) /
                (tf + (1.5 * (0.25 + ((0.75 * dl) / (tot_toks / n_docs))))))
                 AS term_score
             FROM tf JOIN qt USING (tok) JOIN dfreq USING (tok)
                  JOIN dl USING (doc_id), st),
      ag AS (SELECT doc_id, count(*) AS n_matched_terms,
                    list_sort(list(term_score)) AS ss
             FROM sc GROUP BY 1)
      SELECT doc_id, n_matched_terms,
             list_reduce(ss, (a, b) -> a + b) AS score
      FROM ag ORDER BY score DESC, doc_id LIMIT 20"""),
    covers = Seq("TD-bm25"))

  /** Weighted priority sampling ([[CorpusPipeline.weightedSample]]):
    * per lang, the 25 docs with smallest hash60(id)/n_tokens —
    * token-weighted PPS draw (Duffield/Lund/Thorup), deterministic
    * and bit-exact (one double division per doc). */
  val q103 = Q(
    "q103_weighted_sample",
    (s, dir) => {
      import graft.pipelines.CorpusPipeline
      val d = Tables(s, dir, "documents")
        .withColumn("n_tokens", T.tokenCount(col("text")).cast("long"))
      CorpusPipeline.weightedSample(d, k = 25,
          weight = col("n_tokens"), seed = 33)
        .select(col("doc_id"), col("lang"), col("n_tokens"), col("priority"))
        .orderBy(col("lang"), col("priority"), col("doc_id"))
    },
    Some(s"""
      WITH d AS (SELECT doc_id, lang,
               len(string_split(text,' ')) AS n_tokens,
               CAST(${dkHash(33, "CAST(doc_id AS VARCHAR)")} AS DOUBLE) /
                 CAST(len(string_split(text,' ')) AS DOUBLE) AS priority
             FROM documents),
      r AS (SELECT *, row_number() OVER
               (PARTITION BY lang ORDER BY priority ASC, doc_id ASC) AS rn
            FROM d)
      SELECT doc_id, lang, n_tokens, priority
      FROM r WHERE rn <= 25
      ORDER BY lang, priority, doc_id"""),
    covers = Seq("TD-weighted-sample"))

  /** Int8 scalar quantization of the embedding store with per-vector
    * audit stats (amax scale, saturation count, worst reconstruction
    * error, exact int code norm) — see [[graft.ops.Quantization]].
    * Pure narrow projection: runs at scan speed at any scale. */
  val q105 = Q(
    "q105_int8_quant",
    (s, dir) => {
      graft.ops.Quantization.int8Stats(Tables(s, dir, "embeddings"))
        .orderBy(col("vec_id"))
    },
    Some("""
      WITH v AS (SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS xd
                 FROM embeddings),
      m AS (SELECT vec_id, xd,
                   list_max([abs(x) for x in xd]) AS amax FROM v),
      sc AS (SELECT vec_id, xd, amax, amax / 127.0 AS scl FROM m),
      q AS (SELECT vec_id, xd, amax, scl,
              CASE WHEN amax = 0 THEN [CAST(0 AS BIGINT) for x in xd]
                   ELSE [CAST(GREATEST(-127, LEAST(127,
                          FLOOR(x / scl + 0.5))) AS BIGINT) for x in xd]
              END AS q8
            FROM sc)
      SELECT vec_id, amax,
             CAST(len([x for x in q8 if abs(x) = 127]) AS BIGINT) AS n_sat,
             CASE WHEN amax = 0 THEN 0.0
                  ELSE list_max([abs(xd[i] - CAST(q8[i] AS DOUBLE) * scl)
                                 for i in generate_series(1, len(xd))])
             END AS max_abs_err,
             CAST(list_sum([x * x for x in q8]) AS BIGINT) AS qnorm_sq
      FROM q ORDER BY vec_id"""),
    covers = Seq("TD-int8-quant"))

  /** Fixed-width training-sequence packing over the concatenated
    * doc_id-ordered token stream (width 128, docs cross boundaries) —
    * the pretraining feed shape; see
    * [[graft.pipelines.CorpusPipeline.packSequences]]. */
  val q106 = Q(
    "q106_seq_pack",
    (s, dir) => {
      import graft.pipelines.CorpusPipeline
      CorpusPipeline.packSequences(
          Tables(s, dir, "documents"), width = 128,
          bucket = expr("doc_id DIV 256"))
        .orderBy(col("seq_id"))
    },
    Some("""
      WITH t AS (SELECT doc_id,
                   CAST(len(string_split(text,' ')) AS BIGINT) AS n_toks
                 FROM documents),
      p AS (SELECT doc_id, n_toks,
              CAST(coalesce(sum(n_toks) OVER (ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                AS BIGINT) AS st
            FROM t WHERE n_toks > 0),
      e AS (SELECT doc_id, n_toks, st,
              unnest(generate_series(st // 128, (st + n_toks - 1) // 128))
                AS seq_id
            FROM p)
      SELECT seq_id, count(*) AS n_docs, min(doc_id) AS first_doc,
             max(doc_id) AS last_doc,
             CAST(sum(LEAST(st + n_toks, (seq_id + 1) * 128)
                    - GREATEST(st, seq_id * 128)) AS BIGINT) AS n_tokens
      FROM e GROUP BY seq_id ORDER BY seq_id"""),
    covers = Seq("TD-seq-pack"))

  /** Duplicated-span removal (Lee et al. applied): tokens inside any
    * 5-gram occurring in ≥2 distinct docs are cut, survivors re-joined
    * — see [[graft.pipelines.CorpusPipeline.removeDupSpans]]. The
    * oracle rebuilds each cleaned doc with positional list
    * comprehensions over the same dup-start sets. */
  val q107 = Q(
    "q107_dup_span_removal",
    (s, dir) => {
      import graft.pipelines.CorpusPipeline
      CorpusPipeline.removeDupSpans(Tables(s, dir, "documents"), n = 5)
        .orderBy(col("doc_id"))
    },
    Some(s"""
      WITH toks AS (SELECT doc_id, string_split(text,' ') AS ws
                    FROM documents),
      g AS (
        SELECT doc_id, st,
               ${dkHash(0, "array_to_string(ws[st:st+4], ' ')")} AS h
        FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws)-4)) AS st
              FROM toks WHERE len(ws) >= 5)),
      f AS (SELECT h FROM (SELECT h, count(DISTINCT doc_id) AS df
                           FROM g GROUP BY 1) WHERE df >= 2),
      d AS (SELECT doc_id, list(st) AS dups FROM g JOIN f USING (h)
            GROUP BY 1),
      sel AS (SELECT t.doc_id, t.ws,
                     coalesce(d.dups, CAST([] AS BIGINT[])) AS dups
              FROM toks t LEFT JOIN d USING (doc_id)),
      fin AS (
        SELECT doc_id, ws,
          [ws[i] for i in generate_series(1, len(ws))
             if len(list_filter(dups, s -> s <= i AND i <= s + 4)) = 0]
            AS kept
        FROM sel)
      SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_tokens,
             CAST(len(ws) - len(kept) AS BIGINT) AS n_removed,
             coalesce(array_to_string(kept, ' '), '') AS text_clean
      FROM fin ORDER BY doc_id"""),
    covers = Seq("TD-dup-span-removal"))

  /** BPE merge-pair statistics over the word histogram (the
    * tokenizer-training inner loop's first round) — top-20 adjacent
    * character pairs by corpus-weighted count, deterministic
    * tie-break; see [[graft.pipelines.CorpusPipeline.bpePairStats]]. */
  val q108 = Q(
    "q108_bpe_pairs",
    (s, dir) => {
      import graft.pipelines.CorpusPipeline
      CorpusPipeline.bpePairStats(Tables(s, dir, "documents"), k = 20)
        .orderBy(col("rank"))
    },
    Some("""
      WITH wds AS (SELECT unnest(string_split(text,' ')) AS w
                   FROM documents),
      v AS (SELECT w, count(*) AS wc FROM wds WHERE len(w) >= 2
            GROUP BY 1),
      p AS (SELECT wc, unnest([substr(w, i, 2)
              for i in generate_series(1, len(w)-1)]) AS pair FROM v),
      a AS (SELECT pair, CAST(sum(wc) AS BIGINT) AS n_occ FROM p
            GROUP BY 1)
      SELECT CAST(row_number() OVER (ORDER BY n_occ DESC, pair) AS INT)
               AS rank, pair, n_occ
      FROM a ORDER BY n_occ DESC, pair LIMIT 20"""),
    covers = Seq("TD-bpe-pairs"))

  /** Seeded ±1 sign random projection of the embedding store onto 8
    * pseudo-random directions — exact int64 in quantized units, the
    * matrix derived from the hash so no engine materializes it; see
    * [[graft.ops.RandomProjection.signProject]]. */
  val q109 = Q(
    "q109_random_projection",
    (s, dir) => {
      graft.ops.RandomProjection
        .signProject(Tables(s, dir, "embeddings"), k = 8, seed = 11)
        .orderBy(col("vec_id"))
    },
    Some {
      val ys = (0 until 8).map { j =>
        val sign = s"CASE WHEN ${dkHash(11, s"CAST(i-1 AS VARCHAR)||'_$j'")}" +
          s" % 2 = 0 THEN 1 ELSE -1 END"
        s"""CAST(list_sum([qv[i] * ($sign)
             for i in generate_series(1, len(qv))]) AS BIGINT) AS y$j"""
      }.mkString(",\n             ")
      s"""
      WITH qe AS (SELECT vec_id,
                    [CAST(round(CAST(x AS DOUBLE)*1000) AS BIGINT)
                     for x in embedding] AS qv
                  FROM embeddings)
      SELECT vec_id,
             $ys
      FROM qe ORDER BY vec_id"""
    },
    covers = Seq("TD-random-projection"))

  /** Occurrence-weighted token-rarity quality scores (log-free CCNet
    * analog, sorted-fold deterministic) — see
    * [[graft.pipelines.CorpusPipeline.rarityScores]]. */
  val q110 = Q(
    "q110_rarity_score",
    (s, dir) => {
      import graft.pipelines.CorpusPipeline
      CorpusPipeline.rarityScores(Tables(s, dir, "documents"))
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH toks AS (SELECT doc_id, unnest(string_split(text,' ')) AS tok
                    FROM documents),
      dfreq AS (SELECT tok, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df
                FROM toks GROUP BY 1),
      nd AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents),
      r AS (SELECT doc_id, ((n_docs - df) + 0.5) / (df + 0.5) AS r
            FROM toks JOIN dfreq USING (tok), nd),
      ag AS (SELECT doc_id, count(*) AS n_tokens,
                    list_sort(list(r)) AS rs
             FROM r GROUP BY 1)
      SELECT doc_id, n_tokens,
             list_reduce(rs, (a, b) -> a + b) / CAST(n_tokens AS DOUBLE)
               AS rarity
      FROM ag ORDER BY doc_id"""),
    covers = Seq("TD-rarity-filter"))

  /** SemDeDup-style semantic dedup within embedding clusters
    * ([[graft.ops.Dedup.semanticDedup]]): LSH candidates → exact
    * cosine ≥ 0.4 → same-label components → keep the member with the
    * LOWEST centroid cosine (the informative outlier). The oracle
    * restates the whole chain: q88's member-centroid cosines, q26's
    * banded hyperplane candidates restricted to same-label, q77's
    * recursive min-reachable-id closure, one keeper window. */
  val q111 = Q(
    "q111_semantic_dedup",
    (s, dir) => {
      Dedup.semanticDedup(Tables(s, dir, "embeddings"), minCos = 0.4)
        .orderBy(col("vec_id"))
    },
    Some {
      val bands = (0 until 4)
        .map(t => s"(${dkBand("n", t, 4)}) AS band$t")
        .mkString(",\n                ")
      s"""
      WITH RECURSIVE
      q AS (SELECT vec_id, label,
              [CAST(round(CAST(x AS DOUBLE)*1000) AS BIGINT)
               for x in embedding] AS qv
            FROM embeddings),
      n AS (SELECT vec_id, label, qv,
              list_aggregate([qv[i]*qv[i]
                for i in generate_series(1,64)],'sum') AS nsq
            FROM q),
      u AS (SELECT vec_id, label, i, qv[i] AS v
            FROM q, generate_series(1,64) g(i)),
      cent AS (SELECT label, i, CAST(sum(v) AS BIGINT) AS s
               FROM u GROUP BY 1, 2),
      cn AS (SELECT label, CAST(sum(s*s) AS BIGINT) AS cnsq
             FROM cent GROUP BY 1),
      per AS (SELECT u.vec_id, u.label,
                CAST(sum(u.v * c.s) AS BIGINT) AS dot,
                CAST(sum(u.v * u.v) AS BIGINT) AS nsq
              FROM u JOIN cent c ON u.label = c.label AND u.i = c.i
              GROUP BY 1, 2),
      mc AS (SELECT p.vec_id, p.label,
               CASE WHEN p.nsq = 0 OR c.cnsq = 0 THEN CAST(0.0 AS DOUBLE)
                    ELSE CAST(p.dot AS DOUBLE)
                         / (sqrt(CAST(p.nsq AS DOUBLE))
                            * sqrt(CAST(c.cnsq AS DOUBLE))) END AS cos_centroid
             FROM per p JOIN cn c USING (label)),
      bkt AS (SELECT vec_id, label, qv, nsq,
                $bands
              FROM n),
      pr AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
             FROM bkt a JOIN bkt b ON a.vec_id < b.vec_id
              AND a.label = b.label
              AND (a.band0 = b.band0 OR a.band1 = b.band1 OR
                   a.band2 = b.band2 OR a.band3 = b.band3)
             WHERE ${dkDot("a", "b")} / (sqrt(a.nsq) * sqrt(b.nsq)) >= 0.4),
      nodes AS (SELECT id_a AS node FROM pr UNION SELECT id_b FROM pr),
      edges AS (SELECT id_a AS src, id_b AS dst FROM pr
                UNION SELECT id_b, id_a FROM pr),
      reach AS (SELECT node, node AS m FROM nodes
                UNION
                SELECT e.dst AS node, r.m
                FROM reach r JOIN edges e ON e.src = r.node),
      comp AS (SELECT node AS vec_id, min(m) AS cluster
               FROM reach GROUP BY 1),
      fin AS (SELECT mc.vec_id, mc.label, mc.cos_centroid,
                coalesce(comp.cluster, mc.vec_id) AS cluster
              FROM mc LEFT JOIN comp USING (vec_id))
      SELECT vec_id, label, cos_centroid, cluster,
             row_number() OVER (PARTITION BY cluster
               ORDER BY cos_centroid, vec_id) = 1 AS kept
      FROM fin ORDER BY vec_id"""
    },
    covers = Seq("TD-semantic-dedup", "TD-dedup-cosine", "TD-dedup-clusters"))

  /** Recall@k of the q52 LSH ANN against the q27 exact baseline
    * ([[graft.ops.Dedup.annRecall]]) — deterministic on both sides, so
    * the recall numbers themselves are oracle-exact. */
  val q112 = Q(
    "q112_ann_recall",
    (s, dir) => {
      import s.implicits._
      val emb = Tables(s, dir, "embeddings")
      Dedup.annRecall(emb, emb.filter($"vec_id" < 10), "vec_id",
          "embedding", k = 5, bits = 8)
        .orderBy(col("id_q"))
    },
    Some {
      val dotW = (alias: String) => (0 until 8).map { j =>
        val a = T.minhashA(j); val b = T.minhashB(j)
        s"""CASE WHEN list_aggregate([$alias.qv[ij] * ((($a*ij + $b) % 1009) - 504)
             for ij in generate_series(1,64)], 'sum') >= 0
           THEN ${1L << j} ELSE 0 END"""
      }.mkString(" + ")
      s"""
      WITH $dkQuantized,
      ex AS (SELECT id_q, id_c FROM (
          SELECT qs.vec_id AS id_q, cs.vec_id AS id_c,
                 row_number() OVER (PARTITION BY qs.vec_id ORDER BY
                   ${dkDot("qs", "cs")} / (sqrt(qs.nsq) * sqrt(cs.nsq)) DESC,
                   cs.vec_id ASC) AS rank
          FROM n qs JOIN n cs ON qs.vec_id < 10 AND qs.vec_id <> cs.vec_id)
        WHERE rank <= 5),
      b AS (SELECT vec_id, qv, nsq, ${dotW("n")} AS bucket FROM n),
      ap AS (SELECT id_q, id_c FROM (
          SELECT qs.vec_id AS id_q, cs.vec_id AS id_c,
                 row_number() OVER (PARTITION BY qs.vec_id ORDER BY
                   ${dkDot("qs", "cs")} / (sqrt(qs.nsq) * sqrt(cs.nsq)) DESC,
                   cs.vec_id ASC) AS rank
          FROM b qs JOIN b cs ON qs.bucket = cs.bucket
          WHERE qs.vec_id < 10 AND qs.vec_id <> cs.vec_id)
        WHERE rank <= 5)
      SELECT ex.id_q, count(ap.id_c) AS n_hits,
             CAST(count(ap.id_c) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS recall
      FROM ex LEFT JOIN ap ON ex.id_q = ap.id_q AND ex.id_c = ap.id_c
      GROUP BY ex.id_q ORDER BY ex.id_q"""
    },
    covers = Seq("TD-ann-recall", "TD-ann-lsh"))

  /** Per-source curation funnel ([[CorpusPipeline.curationFunnel]]):
    * counts per source at raw → quality → lang → dedup — the pipeline
    * observability row set. Oracle = q69's stage chain carried through
    * with the source column, one count per stage. */
  val q113 = Q(
    "q113_curation_funnel",
    (s, dir) => {
      import graft.pipelines.CorpusPipeline
      CorpusPipeline.curationFunnel(Tables(s, dir, "documents"))
        .orderBy(col("stage_ord"), col("source"))
    },
    Some {
      val hits = T.lexicons.map { case (lang, ws) =>
        s"len([t for t in string_split(text,' ') if t IN (${ws.map(w => s"'$w'").mkString(",")})]) AS h_$lang"
      }.mkString(",\n               ")
      val langs = T.lexicons.map(_._1)
      val m = s"greatest(${langs.map("h_" + _).mkString(",")})"
      val cases = langs.map(l => s"WHEN h_$l = $m AND $m > 0 THEN '$l'")
        .mkString(" ")
      s"""
      WITH q0 AS (
        SELECT doc_id, source, text,
               CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens,
               CAST(length(text) - len(string_split(text,' ')) + 1 AS DOUBLE)
                 / CAST(len(string_split(text,' ')) AS DOUBLE) AS avg_token_len
        FROM documents),
      f AS (SELECT * FROM q0
            WHERE n_tokens BETWEEN 5 AND 10000 AND avg_token_len <= 15.0),
      scored AS (SELECT *, $hits FROM f),
      langed AS (SELECT doc_id, source, text FROM scored
                 WHERE (CASE $cases ELSE 'und' END) = 'en'),
      fpd AS (SELECT *, md5(trim(lower(regexp_replace(text, '\\s+', ' ', 'g')))) AS fp
              FROM langed),
      keep AS (SELECT fp, min(doc_id) AS keeper FROM fpd GROUP BY fp),
      ded AS (SELECT d.doc_id, d.source
              FROM fpd d JOIN keep k ON d.fp = k.fp AND d.doc_id = k.keeper)
      SELECT 0 AS stage_ord, 'raw' AS stage, source, count(*) AS n_docs
      FROM documents GROUP BY source
      UNION ALL SELECT 1, 'quality', source, count(*) FROM f GROUP BY source
      UNION ALL SELECT 2, 'lang', source, count(*) FROM langed GROUP BY source
      UNION ALL SELECT 3, 'dedup', source, count(*) FROM ded GROUP BY source
      ORDER BY stage_ord, source"""
    },
    covers = Seq("TD-curation-funnel", "TD-text-quality", "TD-langid"))

  /** q106's content path: the actual packed-sequence token text
    * ([[CorpusPipeline.packSequenceText]]) — one corpus-wide token
    * shuffle keyed by seq_id, order rebuilt deterministically. */
  val q114 = Q(
    "q114_seq_pack_text",
    (s, dir) => {
      import graft.pipelines.CorpusPipeline
      CorpusPipeline.packSequenceText(
          Tables(s, dir, "documents"), width = 128,
          bucket = expr("doc_id DIV 256"))
        .orderBy(col("seq_id"))
    },
    Some("""
      WITH t AS (SELECT doc_id, string_split(text,' ') AS ws,
                   CAST(len(string_split(text,' ')) AS BIGINT) AS n_toks
                 FROM documents),
      p AS (SELECT doc_id, ws, n_toks,
              CAST(coalesce(sum(n_toks) OVER (ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                AS BIGINT) AS st
            FROM t WHERE n_toks > 0),
      e AS (SELECT st + i - 1 AS gpos, ws[i] AS tok
            FROM (SELECT st, ws, unnest(generate_series(1, len(ws))) AS i
                  FROM p))
      SELECT gpos // 128 AS seq_id, count(*) AS n_tokens,
             string_agg(tok, ' ' ORDER BY gpos) AS text
      FROM e GROUP BY 1 ORDER BY seq_id"""),
    covers = Seq("TD-seq-pack"))

  /** CCNet-style block-level dedup ([[CorpusPipeline.dedupBlocks]]):
    * 16-token blocks, corpus-wide first occurrence survives, docs
    * rebuilt from surviving blocks. The oracle restates the keeper as
    * a window rank over the same md5 block hash. */
  val q115 = Q(
    "q115_block_dedup",
    (s, dir) => {
      import graft.pipelines.CorpusPipeline
      CorpusPipeline.dedupBlocks(Tables(s, dir, "documents"),
          blockTokens = 16)
        .orderBy(col("doc_id"))
    },
    Some(s"""
      WITH toks AS (SELECT doc_id, string_split(text,' ') AS ws FROM documents),
      b AS (SELECT doc_id, i AS block_idx,
              array_to_string(ws[(i*16+1):(i*16+16)], ' ') AS block
            FROM (SELECT doc_id, ws,
                    unnest(generate_series(0,
                      CAST(ceil(len(ws)/16.0) AS BIGINT) - 1)) AS i
                  FROM toks)),
      h AS (SELECT doc_id, block_idx, block, ${dkHash(0, "block")} AS h FROM b),
      k AS (SELECT *, row_number() OVER (PARTITION BY h
              ORDER BY doc_id, block_idx) AS rn FROM h)
      SELECT doc_id,
             count(*) AS n_blocks,
             count(*) FILTER (WHERE rn > 1) AS n_dup_blocks,
             coalesce(string_agg(block, ' ' ORDER BY block_idx)
               FILTER (WHERE rn = 1), '') AS text_clean
      FROM k GROUP BY doc_id ORDER BY doc_id"""),
    covers = Seq("TD-dedup-block"))

  /** Gopher-style composite quality rules
    * ([[CorpusPipeline.gopherRules]]): named per-rule booleans +
    * conjunction, all exact-integer-derived. */
  val q116 = Q(
    "q116_gopher_rules",
    (s, dir) => {
      import graft.pipelines.CorpusPipeline
      CorpusPipeline.gopherRules(Tables(s, dir, "documents"))
        .orderBy(col("doc_id"))
    },
    Some {
      val en = T.lexicons.toMap.apply("en").map(w => s"'$w'").mkString(",")
      s"""
      WITH m AS (SELECT doc_id,
               CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens,
               CAST(length(text) - len(string_split(text,' ')) + 1 AS DOUBLE)
                 / CAST(len(string_split(text,' ')) AS DOUBLE) AS avg_token_len,
               CAST(len([t for t in string_split(text,' ')
                         if regexp_matches(t, '[a-z]')]) AS DOUBLE)
                 / CAST(len(string_split(text,' ')) AS DOUBLE) AS alpha_frac,
               CAST(len([t for t in string_split(text,' ')
                         if t IN ($en)]) AS BIGINT) AS stop_hits
             FROM documents)
      SELECT *,
             n_tokens BETWEEN 10 AND 10000 AS r_token_count,
             avg_token_len BETWEEN 2.0 AND 12.0 AS r_avg_len,
             alpha_frac >= 0.7 AS r_alpha,
             stop_hits >= 2 AS r_stopwords,
             (n_tokens BETWEEN 10 AND 10000)
               AND (avg_token_len BETWEEN 2.0 AND 12.0)
               AND alpha_frac >= 0.7 AND stop_hits >= 2 AS pass
      FROM m ORDER BY doc_id"""
    },
    covers = Seq("TD-quality-rules", "TD-text-quality"))

  /** α=1/2 temperature mixture shares
    * ([[CorpusPipeline.temperatureShares]]): source share ∝ sqrt(p) —
    * sqrt is correctly rounded, so the shares oracle-match exactly. */
  val q117 = Q(
    "q117_temperature_mix",
    (s, dir) => {
      import graft.pipelines.CorpusPipeline
      CorpusPipeline.temperatureShares(Tables(s, dir, "documents"))
        .orderBy(col("source"))
    },
    Some("""
      WITH c AS (SELECT source, count(*) AS n_docs FROM documents
                 GROUP BY source),
      t AS (SELECT sum(n_docs) AS n FROM c),
      w AS (SELECT source, n_docs,
              CAST(n_docs AS DOUBLE) / CAST(n AS DOUBLE) AS p,
              sqrt(CAST(n_docs AS DOUBLE) / CAST(n AS DOUBLE)) AS wr
            FROM c, t),
      z AS (SELECT list_reduce(list_sort(list(wr)), (a, b) -> a + b) AS z
            FROM w)
      SELECT source, n_docs, p, wr / z AS share
      FROM w, z ORDER BY source"""),
    covers = Seq("TD-mixture-temperature"))

  /** HyperLogLog register sketch over the distinct-token stream
    * ([[graft.functions.HllSketch.registers]], p=6 → 64 buckets):
    * exact-integer registers, oracle-checked bit-for-bit; the
    * harmonic-mean estimate is spec-verified driver-side. */
  val q118 = Q(
    "q118_hll_registers",
    (s, dir) => {
      val toks = Tables(s, dir, "documents")
        .select(explode(T.tokens(col("text"))).as("tok")).distinct()
      graft.functions.HllSketch.registers(toks, col("tok"), p = 6, seed = 0)
        .orderBy(col("bucket"))
    },
    Some {
      val mask = (1L << 54) - 1
      s"""
      WITH d AS (SELECT DISTINCT tok FROM
             (SELECT unnest(string_split(text,' ')) AS tok FROM documents)),
      h AS (SELECT ${dkHash(0, "tok")} AS h FROM d),
      r AS (SELECT h >> 54 AS bucket,
              CAST(CASE WHEN (h & $mask) = 0 THEN 55
                   ELSE 54 - (length(bin(h & $mask)) - 1) END AS BIGINT) AS rho
            FROM h)
      SELECT bucket, max(rho) AS max_rho
      FROM r GROUP BY bucket ORDER BY bucket"""
    },
    covers = Seq("TD-sketch-hll"))

  /** Boilerplate-prefix detection ([[CorpusPipeline.boilerplatePrefix]]):
    * per-(source, 8-token-prefix) document frequency flags template
    * instances. */
  val q119 = Q(
    "q119_boilerplate_prefix",
    (s, dir) => {
      import graft.pipelines.CorpusPipeline
      CorpusPipeline.boilerplatePrefix(Tables(s, dir, "documents"),
          prefixTokens = 8, minDf = 3)
        .orderBy(col("doc_id"))
    },
    Some(s"""
      WITH p AS (SELECT doc_id, source,
              ${dkHash(0, "array_to_string(string_split(text,' ')[1:8], ' ')")}
                AS ph
            FROM documents),
      d AS (SELECT source, ph, count(*) AS prefix_df FROM p
            GROUP BY source, ph)
      SELECT doc_id, p.source, prefix_df, prefix_df >= 3 AS is_boilerplate
      FROM p JOIN d USING (source, ph) ORDER BY doc_id"""),
    covers = Seq("TD-boilerplate"))

  /** OOV rate against the corpus' own top-20 token head
    * ([[CorpusPipeline.oovRate]]) — tokenizer-coverage diagnostic. */
  val q120 = Q(
    "q120_oov_rate",
    (s, dir) => {
      import graft.pipelines.CorpusPipeline
      CorpusPipeline.oovRate(Tables(s, dir, "documents"), vocabSize = 20)
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH tk AS (SELECT doc_id, unnest(string_split(text,' ')) AS tok
                  FROM documents),
      v AS (SELECT tok FROM
              (SELECT tok, count(*) AS n FROM tk GROUP BY tok)
            ORDER BY n DESC, tok LIMIT 20)
      SELECT tk.doc_id,
             CAST(count(*) AS BIGINT) AS n_tokens,
             CAST(count(*) FILTER (WHERE v.tok IS NULL) AS BIGINT) AS n_oov,
             CAST(count(*) FILTER (WHERE v.tok IS NULL) AS DOUBLE)
               / CAST(count(*) AS DOUBLE) AS oov_rate
      FROM tk LEFT JOIN v ON tk.tok = v.tok
      GROUP BY tk.doc_id ORDER BY doc_id"""),
    covers = Seq("TD-oov-rate", "TD-token-count"))

  /** Adjacent-bigram collocations ranked by lift (log-free PMI)
    * ([[CorpusPipeline.collocationLift]]), top-15 by frequency with
    * deterministic tie-break. */
  val q121 = Q(
    "q121_collocation_lift",
    (s, dir) => {
      import graft.pipelines.CorpusPipeline
      CorpusPipeline.collocationLift(Tables(s, dir, "documents"), k = 15)
        .orderBy(col("n_ab").desc, col("tok_a"), col("tok_b"))
    },
    Some("""
      WITH toks AS (SELECT string_split(text,' ') AS ws FROM documents),
      uni AS (SELECT tok, count(*) AS n_tok FROM
                (SELECT unnest(ws) AS tok FROM toks) GROUP BY tok),
      n1 AS (SELECT CAST(sum(n_tok) AS BIGINT) AS n1 FROM uni),
      bi AS (SELECT tok_a, tok_b, count(*) AS n_ab FROM (
               SELECT ws[i] AS tok_a, ws[i+1] AS tok_b
               FROM (SELECT ws, unnest(generate_series(1, len(ws)-1)) AS i
                     FROM toks))
             GROUP BY tok_a, tok_b),
      n2 AS (SELECT CAST(sum(n_ab) AS BIGINT) AS n2 FROM bi),
      top AS (SELECT * FROM bi ORDER BY n_ab DESC, tok_a, tok_b LIMIT 15)
      SELECT t.tok_a, t.tok_b, t.n_ab,
             (CAST(t.n_ab AS DOUBLE) / CAST(n2 AS DOUBLE)) /
             ((CAST(ua.n_tok AS DOUBLE) / CAST(n1 AS DOUBLE)) *
              (CAST(ub.n_tok AS DOUBLE) / CAST(n1 AS DOUBLE))) AS lift
      FROM top t JOIN uni ua ON t.tok_a = ua.tok
                 JOIN uni ub ON t.tok_b = ub.tok, n1, n2
      ORDER BY n_ab DESC, tok_a, tok_b"""),
    covers = Seq("TD-collocations"))

  /** LSH dedup-quality harness: candidate pairs (q23's banded LSH) vs
    * exact Jaccard ≥ 0.5 truth (q21's machinery) — the pair-level
    * precision/recall a production dedup tunes (bands, rows, k)
    * against, the q112 evaluation pattern applied to TEXT near-dup.
    * One-row output of exact counts + two single divisions. */
  val q122 = Q(
    "q122_lsh_dedup_quality",
    (s, dir) => {
      // deterministic 1/2 modulus sample (round-7 VERDICT ask #5, the
      // q112/q126 protocol): the truth side is a declared all-pairs
      // baseline, so the sample bounds its every-sweep cost while
      // measuring the same precision/recall curve (67 of 256 planted
      // pairs survive at sf0.1, 6 of 25 at the sf0.01 gate)
      val docs = Tables(s, dir, "documents")
        .filter(pmod(col("doc_id"), lit(2)) === 0)
      // ONE tokenize+shingle pass feeds both sides of the evaluation
      // (round-8 VERDICT ask #8): the exact-Jaccard truth and the
      // MinHash signatures derive from the same persisted index
      val shIdx = graft.CacheTracker.track(
        Dedup.shingleIndex(docs, "doc_id", "text", 3))
      val truth = Dedup.jaccardPairsFromIndex(shIdx, "doc_id", minJ = 0.5)
        .select(col("id_a"), col("id_b"))
      val sig = Dedup.minhashSignaturesFromIndex(shIdx, "doc_id", K)
      val cand = Dedup.lshCandidatePairs(sig, "doc_id", k = K,
          rows = BAND_ROWS).select(col("id_a"), col("id_b"))
      // one full-outer join + one aggregate: truth and cand each
      // evaluate ONCE (the previous three-aggregate crossJoin ran the
      // all-pairs truth and the LSH chain twice each)
      truth.withColumn("__t", lit(1L))
        .join(cand.withColumn("__c", lit(1L)), Seq("id_a", "id_b"),
          "full_outer")
        .agg(
          coalesce(sum(col("__t")), lit(0L)).cast("long").as("n_true"),
          coalesce(sum(col("__c")), lit(0L)).cast("long").as("n_cand"),
          coalesce(sum(col("__t") * col("__c")), lit(0L)).cast("long")
            .as("n_hits"))
        .select(col("n_true"), col("n_cand"), col("n_hits"),
          (col("n_hits").cast("double") / col("n_cand").cast("double"))
            .as("pair_precision"),
          (col("n_hits").cast("double") / col("n_true").cast("double"))
            .as("pair_recall"))
    },
    Some {
      val bandRows = (0 until K / BAND_ROWS).map { b =>
        val key = (b * BAND_ROWS until (b + 1) * BAND_ROWS)
          .map(i => s"CAST(mh$i AS VARCHAR)").mkString("||'_'||")
        s"SELECT doc_id, $b AS band, $key AS band_key FROM sig"
      }.mkString("\n        UNION ALL\n        ")
      s"""
      WITH ${dkShinglesFrom("(SELECT * FROM documents WHERE doc_id % 2 = 0)")},
      $dkSig,
      sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
      inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
                FROM sh a JOIN sh b USING(sh)
                WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
      truth AS (SELECT id_a, id_b FROM inter
                JOIN sizes sa ON id_a = sa.doc_id
                JOIN sizes sb ON id_b = sb.doc_id
                WHERE CAST(n_inter AS DOUBLE)
                  / CAST(sa.n + sb.n - n_inter AS DOUBLE) >= 0.5),
      bands AS (
        $bandRows),
      cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
               FROM bands a JOIN bands b USING(band, band_key)
               WHERE a.doc_id < b.doc_id),
      hit AS (SELECT count(*) AS n FROM truth JOIN cand USING (id_a, id_b))
      SELECT CAST((SELECT count(*) FROM truth) AS BIGINT) AS n_true,
             CAST((SELECT count(*) FROM cand) AS BIGINT) AS n_cand,
             CAST((SELECT n FROM hit) AS BIGINT) AS n_hits,
             CAST((SELECT n FROM hit) AS DOUBLE)
               / CAST((SELECT count(*) FROM cand) AS DOUBLE) AS pair_precision,
             CAST((SELECT n FROM hit) AS DOUBLE)
               / CAST((SELECT count(*) FROM truth) AS DOUBLE) AS pair_recall"""
    },
    covers = Seq("TD-dedup-quality", "TD-dedup-lsh", "TD-dedup-ngram"))

  /** Content-defined chunking ([[CorpusPipeline.contentDefinedChunks]],
    * w=3 window, 4 mask bits → expected 16-token chunks): boundaries
    * where the rolling window hash ≡ 0 (mod 16) — the dedup-stable
    * chunking of storage/incremental-ingest systems. */
  val q123 = Q(
    "q123_cdc_chunks",
    (s, dir) => {
      import graft.pipelines.CorpusPipeline
      CorpusPipeline.contentDefinedChunks(Tables(s, dir, "documents"),
          w = 3, maskBits = 4)
        .orderBy(col("doc_id"), col("chunk_idx"))
    },
    Some(s"""
      WITH toks AS (SELECT doc_id, string_split(text,' ') AS ws FROM documents),
      bp AS (SELECT doc_id, ws, len(ws) AS n,
               [i for i in generate_series(3, len(ws))
                if (${dkHash(0, "array_to_string(ws[(i-2):i], ' ')")} % 16) = 0]
                 AS bs
             FROM toks),
      sp AS (SELECT doc_id, ws,
               list_prepend(1, [b + 1 for b in bs]) AS starts,
               list_append(bs, n) AS ends
             FROM bp),
      ch AS (SELECT doc_id, ws, starts[i] AS s, ends[i] AS e
             FROM (SELECT doc_id, ws, starts, ends,
                     unnest(generate_series(1, len(starts))) AS i
                   FROM sp)
             WHERE starts[i] <= ends[i])
      SELECT doc_id,
             CAST(row_number() OVER (PARTITION BY doc_id ORDER BY s) - 1
               AS INTEGER) AS chunk_idx,
             CAST(e - s + 1 AS BIGINT) AS n_chunk_toks,
             ${dkHash(0, "array_to_string(ws[s:e], ' ')")} AS chunk_hash
      FROM ch ORDER BY doc_id, chunk_idx"""),
    covers = Seq("TD-cdc-chunking"))

  /** Exact token-length quantiles via the bounded value histogram
    * ([[CorpusPipeline.lengthQuantiles]]) — nearest-rank p50/p90/p99. */
  val q124 = Q(
    "q124_length_quantiles",
    (s, dir) => {
      import graft.pipelines.CorpusPipeline
      CorpusPipeline.lengthQuantiles(Tables(s, dir, "documents"))
        .orderBy(col("p"))
    },
    Some("""
      WITH c AS (SELECT CAST(len(string_split(text,' ')) AS BIGINT) AS v,
                   count(*) AS n FROM documents GROUP BY v),
      cum AS (SELECT v, sum(n) OVER (ORDER BY v) AS cum FROM c),
      tt AS (SELECT count(*) AS n_total FROM documents),
      pp AS (SELECT unnest([CAST(0.5 AS DOUBLE), CAST(0.9 AS DOUBLE),
                            CAST(0.99 AS DOUBLE)]) AS p)
      SELECT p, min(v) AS quantile
      FROM pp, tt, cum
      WHERE cum >= CAST(ceil(p * n_total) AS BIGINT)
      GROUP BY p ORDER BY p"""),
    covers = Seq("TD-length-quantiles"))

  /** Per-source total-variation drift from the corpus token
    * distribution ([[CorpusPipeline.sourceDivergence]]) — log-free
    * KL-style drift detection, exact integer sums, one division. */
  val q125 = Q(
    "q125_source_divergence",
    (s, dir) => {
      import graft.pipelines.CorpusPipeline
      CorpusPipeline.sourceDivergence(Tables(s, dir, "documents"))
        .orderBy(col("source"))
    },
    Some("""
      WITH tk AS (SELECT source, unnest(string_split(text,' ')) AS tok
                  FROM documents),
      st AS (SELECT source, tok, count(*) AS n_st FROM tk
             GROUP BY source, tok),
      ct AS (SELECT tok, count(*) AS n_t FROM tk GROUP BY tok),
      ns AS (SELECT source, count(*) AS n_s FROM tk GROUP BY source),
      nn AS (SELECT count(*) AS n FROM tk)
      SELECT s.source, ns.n_s AS n_tokens_src,
             CAST(sum(abs(s.n_st * n - c.n_t * ns.n_s)) +
                  ns.n_s * (n - sum(c.n_t)) AS DOUBLE)
               / CAST(2 * ns.n_s * n AS DOUBLE) AS tv_distance
      FROM st s JOIN ct c USING (tok) JOIN ns USING (source), nn
      GROUP BY s.source, ns.n_s, nn.n
      ORDER BY source"""),
    covers = Seq("TD-source-drift"))

  /** Band-count tuning harness for the embedding LSH generator (the
    * knob behind q26 AND q111's candidate stage): verified-pair recall
    * of [[graft.ops.Dedup.embeddingDupPairsLsh]] vs the q66 exact
    * truth at bands ∈ {2, 4, 8} (OR-construction: more bands = higher
    * recall, fatter candidate set). Verified pairs are a SUBSET of the
    * truth by construction (same exact-cosine threshold), so recall is
    * the whole story and precision is 1. Exact integer buckets make
    * the recall numbers themselves oracle-checkable — the q112/q122
    * evaluation pattern completing the harness family. Truth side is
    * the declared all-pairs baseline; run on a sample at scale. */
  val q126 = Q(
    "q126_embedding_lsh_quality",
    (s, dir) => {
      // harness runs on a deterministic 1/6 modulus sample (round-6/7
      // VERDICT asks: sample the truth side the way q112 does — the
      // ANN-benchmark protocol): the truth side is all-pairs by
      // definition, so the sample bounds its cost while measuring the
      // same band-recall curve (24 true pairs at sf0.1, 6 at sf0.01)
      val emb = graft.CacheTracker.track(Tables(s, dir, "embeddings")
        .filter(pmod(col("vec_id"), lit(6)) === 0))
      val nTrue = Dedup.embeddingDupPairsExact(emb, "vec_id", "embedding",
          minCos = 0.4).agg(count(lit(1)).as("n_true"))
      val found = Seq(2, 4, 8).map { b =>
        Dedup.embeddingDupPairsLsh(emb, "vec_id", "embedding",
            minCos = 0.4, bands = b)
          .agg(count(lit(1)).as("n_found"))
          .select(lit(b).as("bands"), col("n_found"))
      }.reduce(_ unionByName _)
      found.crossJoin(broadcast(nTrue))
        .select(col("bands"), col("n_true"), col("n_found"),
          (col("n_found").cast("double") / col("n_true").cast("double"))
            .as("band_recall"))
        .orderBy(col("bands"))
    },
    Some {
      def bkt(b: Int): String = {
        val cols = (0 until b)
          .map(t => s"(${dkBand("n", t, 4)}) AS band$t")
          .mkString(",\n                ")
        s"""bkt$b AS (SELECT vec_id, qv, nsq,
                $cols
              FROM nf n)"""
      }
      def f(b: Int): String = {
        val anyMatch = (0 until b).map(t => s"x.band$t = y.band$t")
          .mkString(" OR ")
        s"""f$b AS (SELECT CAST($b AS INTEGER) AS bands, count(*) AS n_found
             FROM (SELECT 1 FROM bkt$b x JOIN bkt$b y
                   ON x.vec_id < y.vec_id AND ($anyMatch)
                   WHERE ${dkDot("x", "y")} / (sqrt(x.nsq) * sqrt(y.nsq))
                     >= 0.4))"""
      }
      s"""
      WITH $dkQuantized,
      nf AS (SELECT * FROM n WHERE vec_id % 6 = 0),
      ${bkt(2)},
      ${bkt(4)},
      ${bkt(8)},
      tr AS (SELECT count(*) AS n_true
             FROM (SELECT 1 FROM nf x JOIN nf y ON x.vec_id < y.vec_id
                   WHERE ${dkDot("x", "y")} / (sqrt(x.nsq) * sqrt(y.nsq))
                     >= 0.4)),
      ${f(2)},
      ${f(4)},
      ${f(8)}
      SELECT bands, n_true, n_found,
             CAST(n_found AS DOUBLE) / CAST(n_true AS DOUBLE) AS band_recall
      FROM (SELECT * FROM f2 UNION ALL SELECT * FROM f4
            UNION ALL SELECT * FROM f8), tr
      ORDER BY bands"""
    },
    covers = Seq("TD-dedup-quality", "TD-dedup-cosine"))

  /** Shared k-means oracle CTE chain (k=4, one Lloyd update; assumes
    * the `q` CTE from [[dkQuantized]]): init = 4 smallest-id vectors,
    * fixed-order distance folds, exact integer per-dim sums, means by
    * one division, empty clusters carry the previous mean, `d2` =
    * distances to the trained centroids. Used by q127 and q128. */
  /** Lloyd-k-means oracle CTE chain, split by TRAIN relation (init +
    * assign/update rounds → c1) and ENCODE relation (final d2 distance
    * table) — identical when both are `q`; q186 trains on a batch-0
    * view and assigns everything. */
  private def dkKmeansCtesSrc(train: String, enc: String): String = {
    val dist =
      s"""list_reduce([(CAST(a.qv[i] AS DOUBLE) - c.m[i]) *
             (CAST(a.qv[i] AS DOUBLE) - c.m[i])
             for i in generate_series(1,64)], (x, y) -> x + y)"""
    s"""init AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT)
                 AS cid,
                 [CAST(v AS DOUBLE) for v in qv] AS m
               FROM (SELECT vec_id, qv FROM $train ORDER BY vec_id LIMIT 4)),
      d1 AS (SELECT a.vec_id, c.cid, $dist AS dist_sq
             FROM $train a CROSS JOIN init c),
      a1 AS (SELECT vec_id, cid FROM
               (SELECT *, row_number() OVER (PARTITION BY vec_id
                  ORDER BY dist_sq, cid) AS rn FROM d1)
             WHERE rn = 1),
      s1 AS (SELECT a1.cid, i, sum($train.qv[i]) AS s, count(*) AS n
             FROM a1 JOIN $train USING (vec_id)
             CROSS JOIN generate_series(1,64) g(i)
             GROUP BY a1.cid, i),
      u1 AS (SELECT cid, list(CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
                              ORDER BY i) AS m
             FROM s1 GROUP BY cid),
      c1 AS (SELECT init.cid, coalesce(u1.m, init.m) AS m
             FROM init LEFT JOIN u1 USING (cid)),
      d2 AS (SELECT a.vec_id, c.cid, $dist AS dist_sq
             FROM $enc a CROSS JOIN c1 c)"""
  }

  private val dkKmeansCtes: String = dkKmeansCtesSrc("q", "q")

  /** Distributed Lloyd k-means training ([[graft.ops.KMeans.assign]],
    * k=4, one full update round): the TRAINING side of the IVF path —
    * q79 probes fixed centroids, this op produces trained ones. Exact
    * integer per-dim sums + one division per mean + fixed-order
    * distance folds make even the trained assignments oracle-exact;
    * the oracle unrolls the iteration (init → assign → integer sums →
    * means with empty-cluster carry → final assign). */
  val q127 = Q(
    "q127_kmeans_train",
    (s, dir) => {
      graft.ops.KMeans.assign(Tables(s, dir, "embeddings"), k = 4,
          iters = 1)
        .orderBy(col("vec_id"))
    },
    Some(s"""
      WITH $dkQuantized,
      $dkKmeansCtes
      SELECT vec_id, cid AS cluster, dist_sq FROM
        (SELECT *, row_number() OVER (PARTITION BY vec_id
           ORDER BY dist_sq, cid) AS rn FROM d2)
      WHERE rn = 1 ORDER BY vec_id"""),
    covers = Seq("TD-kmeans", "TD-ann-ivf"))

  /** IVF ANN over TRAINED centroids ([[graft.ops.KMeans.ivfSearch]]):
    * q79's probe pattern with q127's Lloyd-trained coarse quantizer —
    * train → index → probe → exact-cosine top-k, end-to-end in-plan
    * (the centroid table is never collected), every stage oracle-exact. */
  val q128 = Q(
    "q128_ivf_trained",
    (s, dir) => {
      import s.implicits._
      val emb = Tables(s, dir, "embeddings")
      graft.ops.KMeans.ivfSearch(emb, emb.filter($"vec_id" < 10),
          k = 4, iters = 1, nProbe = 2, topK = 5)
        .orderBy(col("id_q"), col("rank"))
    },
    Some {
      val dist =
        s"""list_reduce([(CAST(a.qv[i] AS DOUBLE) - c.m[i]) *
               (CAST(a.qv[i] AS DOUBLE) - c.m[i])
               for i in generate_series(1,64)], (x, y) -> x + y)"""
      s"""
      WITH $dkQuantized,
      $dkKmeansCtes,
      ca AS (SELECT vec_id, cid AS cluster FROM
               (SELECT *, row_number() OVER (PARTITION BY vec_id
                  ORDER BY dist_sq, cid) AS rn FROM d2)
             WHERE rn = 1),
      pr AS (SELECT a.vec_id AS id_q, c.cid AS cluster,
               row_number() OVER (PARTITION BY a.vec_id
                 ORDER BY $dist, c.cid) AS prn
             FROM q a CROSS JOIN c1 c WHERE a.vec_id < 10),
      sc AS (SELECT p.id_q, ix.vec_id AS id_c,
               ${dkDot("qq", "cc")} / (sqrt(qq.nsq) * sqrt(cc.nsq)) AS cosine
             FROM (SELECT id_q, cluster FROM pr WHERE prn <= 2) p
             JOIN ca ix USING (cluster)
             JOIN n qq ON qq.vec_id = p.id_q
             JOIN n cc ON cc.vec_id = ix.vec_id
             WHERE ix.vec_id <> p.id_q)
      SELECT id_q, rank, id_c, cosine FROM
        (SELECT *, CAST(row_number() OVER (PARTITION BY id_q
           ORDER BY cosine DESC, id_c) AS INT) AS rank FROM sc)
      WHERE rank <= 5 ORDER BY id_q, rank"""
    },
    covers = Seq("TD-ann-ivf", "TD-kmeans"))

  /** Count-Min sketch registers over the token stream
    * ([[graft.functions.CmsSketch.registers]], depth 4 × width 32):
    * the per-key FREQUENCY sketch (heavy hitters, quota enforcement)
    * completing the KMV/HLL family — exact-integer cells (sum of
    * occurrences per (row, hash-mod-width)), emitted DENSE with zeros
    * so the merge identity is in the table; the registers themselves
    * hash-match the oracle, the min-over-rows point estimate is
    * spec-verified ([[graft.functions.CmsSketch.estimate]]). */
  val q129 = Q(
    "q129_cms_registers",
    (s, dir) => {
      val toks = Tables(s, dir, "documents")
        .select(explode(T.tokens(col("text"))).as("tok"))
      graft.functions.CmsSketch.registers(toks, col("tok"),
          depth = 4, width = 32)
        .orderBy(col("row"), col("col"))
    },
    Some {
      val cellRows = (0 until 4).map { j =>
        s"""SELECT $j AS row, ${dkHash(100 + j, "tok")} % 32 AS col,
               count(*) AS cnt FROM t GROUP BY 2"""
      }.mkString("\n        UNION ALL\n        ")
      s"""
      WITH t AS (SELECT unnest(string_split(text,' ')) AS tok FROM documents),
      cells AS (
        $cellRows),
      grid AS (SELECT r AS row, c AS col
               FROM generate_series(0,3) g(r), generate_series(0,31) h(c))
      SELECT CAST(grid.row AS INTEGER) AS row, CAST(grid.col AS INTEGER) AS col,
             CAST(coalesce(cells.cnt, 0) AS BIGINT) AS cnt
      FROM grid LEFT JOIN cells ON grid.row = cells.row AND grid.col = cells.col
      ORDER BY row, col"""
    },
    covers = Seq("TD-sketch-cms", "TD-token-count"))

  /** Per-source token-budget quota fill
    * ([[CorpusPipeline.quotaFill]], budget 2000): each source admits
    * its hash-priority-ordered document prefix until the running token
    * total exceeds the budget — the data-recipe admission step, with
    * the running sum decomposed by q86's two-level prefix sum (top
    * hash bits as monotone buckets) instead of one data-sized window
    * per source. */
  val q130 = Q(
    "q130_quota_fill",
    (s, dir) => {
      import graft.pipelines.CorpusPipeline
      CorpusPipeline.quotaFill(Tables(s, dir, "documents"),
          budgetTokens = 2000L)
        .orderBy(col("source"), col("cum_tokens"), col("doc_id"))
    },
    Some(s"""
      WITH t AS (SELECT doc_id, source,
               CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens,
               ${dkHash(7, "CAST(doc_id AS VARCHAR)")} AS pri
             FROM documents),
      c AS (SELECT doc_id, source, n_tokens,
              CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY pri, doc_id
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
            FROM t)
      SELECT doc_id, source, n_tokens, cum_tokens
      FROM c WHERE cum_tokens <= 2000
      ORDER BY source, cum_tokens, doc_id"""),
    covers = Seq("TD-mixture-budget", "TD-token-count"))

  /** Within-doc duplicate 3-gram coverage
    * ([[CorpusPipeline.dupNgramCoverage]]) — the Gopher
    * self-repetition kill signal: fraction of a doc's tokens inside
    * any 3-gram occurring ≥ 2 times in that same doc; all aggregation
    * doc-keyed, interval union as a distinct-covered-position count. */
  val q131 = Q(
    "q131_dup_ngram_coverage",
    (s, dir) => {
      import graft.pipelines.CorpusPipeline
      CorpusPipeline.dupNgramCoverage(Tables(s, dir, "documents"), n = 3)
        .orderBy(col("doc_id"))
    },
    Some(s"""
      WITH toks AS (SELECT doc_id, string_split(text,' ') AS ws FROM documents),
      g AS (SELECT doc_id, i AS st,
              ${dkHash(0, "ws[i]||' '||ws[i+1]||' '||ws[i+2]")} AS h
            FROM (SELECT doc_id, ws,
                    unnest(generate_series(1, len(ws)-2)) AS i
                  FROM toks WHERE len(ws) >= 3)),
      d AS (SELECT doc_id, h FROM g GROUP BY doc_id, h HAVING count(*) >= 2),
      cov AS (SELECT DISTINCT g.doc_id, g.st + o AS p
              FROM g JOIN d USING (doc_id, h), generate_series(0,2) t(o)),
      c AS (SELECT doc_id, count(*) AS n_dup_covered FROM cov GROUP BY doc_id)
      SELECT t.doc_id, CAST(len(ws) AS BIGINT) AS n_tokens,
             CAST(coalesce(c.n_dup_covered, 0) AS BIGINT) AS n_dup_covered,
             CAST(coalesce(c.n_dup_covered, 0) AS DOUBLE)
               / CAST(len(ws) AS DOUBLE) AS dup_frac
      FROM toks t LEFT JOIN c USING (doc_id) ORDER BY doc_id"""),
    covers = Seq("TD-quality-rules", "TD-dup-span"))

  /** Train/test near-dup LEAKAGE audit
    * ([[CorpusPipeline.trainTestLeak]]): banded-LSH candidates
    * filtered to pairs CROSSING the q101 split boundary, then
    * exact-Jaccard-verified (≥ 0.5) — the split-integrity check that
    * catches held-out docs whose near-copy sits in train. */
  val q132 = Q(
    "q132_train_test_leak",
    (s, dir) => {
      import graft.pipelines.CorpusPipeline
      CorpusPipeline.trainTestLeak(Tables(s, dir, "documents"))
        .orderBy(col("leak_id"), col("train_id"))
    },
    Some {
      val bandRows = (0 until K / BAND_ROWS).map { b =>
        val key = (b * BAND_ROWS until (b + 1) * BAND_ROWS)
          .map(i => s"CAST(mh$i AS VARCHAR)").mkString("||'_'||")
        s"SELECT doc_id, $b AS band, $key AS band_key FROM sig"
      }.mkString("\n        UNION ALL\n        ")
      val h100 = s"${dkHash(21, "CAST(doc_id AS VARCHAR)")} % 100"
      s"""
      WITH $dkShingles,
      $dkSig,
      sp AS (SELECT doc_id,
               CASE WHEN $h100 < 80 THEN 'train'
                    WHEN $h100 < 90 THEN 'val'
                    ELSE 'test' END AS split
             FROM documents),
      bands AS (
        $bandRows),
      cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
               FROM bands a JOIN bands b USING (band, band_key)
               WHERE a.doc_id < b.doc_id),
      cr AS (SELECT id_a, id_b, sa.split AS sp_a, sb.split AS sp_b
             FROM cand JOIN sp sa ON id_a = sa.doc_id
                       JOIN sp sb ON id_b = sb.doc_id
             WHERE (sa.split = 'train') <> (sb.split = 'train')),
      sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
      inter AS (SELECT cr.id_a, cr.id_b, sp_a, sp_b, count(*) AS n_inter
                FROM cr JOIN sh a ON cr.id_a = a.doc_id
                        JOIN sh b ON cr.id_b = b.doc_id AND a.sh = b.sh
                GROUP BY cr.id_a, cr.id_b, sp_a, sp_b),
      j AS (SELECT id_a, id_b, sp_a, sp_b,
              CAST(n_inter AS DOUBLE)
                / CAST(sa.n + sb.n - n_inter AS DOUBLE) AS jaccard
            FROM inter JOIN sizes sa ON id_a = sa.doc_id
                       JOIN sizes sb ON id_b = sb.doc_id)
      SELECT CASE WHEN sp_a <> 'train' THEN id_a ELSE id_b END AS leak_id,
             CASE WHEN sp_a <> 'train' THEN sp_a ELSE sp_b END AS split,
             CASE WHEN sp_a = 'train' THEN id_a ELSE id_b END AS train_id,
             jaccard
      FROM j WHERE jaccard >= 0.5
      ORDER BY leak_id, train_id"""
    },
    covers = Seq("TD-decontamination", "TD-dedup-lsh", "TD-split"))

  /** Label-error candidates by centroid-distance ratio
    * ([[graft.ops.EmbeddingStats.labelOutliers]]): n²·dist² to the own-
    * label centroid stays exact int64 (n·q_i − s_i form — the mean
    * never materializes), ratio = value / label mean, top-20. */
  val q133 = Q(
    "q133_label_outliers",
    (s, dir) => {
      graft.ops.EmbeddingStats.labelOutliers(
        Tables(s, dir, "embeddings"), topK = 20)
    },
    Some("""
      WITH q2 AS (SELECT vec_id, label,
               [CAST(round(CAST(x AS DOUBLE)*1000) AS BIGINT)
                for x in embedding] AS qv FROM embeddings),
      u AS (SELECT vec_id, label, i AS pos, qv[i] AS v
            FROM q2, generate_series(1,64) g(i)),
      cent AS (SELECT label, pos, sum(v) AS s, count(*) AS n
               FROM u GROUP BY label, pos),
      d AS (SELECT u.vec_id, u.label,
              CAST(sum((cent.n * u.v - cent.s) * (cent.n * u.v - cent.s))
                AS BIGINT) AS nsq_d2
            FROM u JOIN cent ON u.label = cent.label AND u.pos = cent.pos
            GROUP BY u.vec_id, u.label),
      m AS (SELECT label, sum(nsq_d2) AS tot, count(*) AS cnt
            FROM d GROUP BY label)
      SELECT vec_id, d.label, nsq_d2,
             CASE WHEN tot = 0 THEN 0.0
                  ELSE CAST(nsq_d2 AS DOUBLE)
                    / (CAST(tot AS DOUBLE) / CAST(cnt AS DOUBLE)) END
               AS outlier_ratio
      FROM d JOIN m ON d.label = m.label
      ORDER BY outlier_ratio DESC, vec_id LIMIT 20"""),
    covers = Seq("TD-label-errors", "TD-embedding-stats"))

  /** Z-order layout + per-file skipping stats
    * ([[graft.ops.Layout.zOrderFiles]]): orders clustered on the
    * Morton interleave of (custkey, order date), cut into 1024-row
    * files; the output IS the per-file min/max range table that read-
    * time data skipping would prune against. File numbering via the
    * q86 two-level prefix sum (top z-bits as monotone buckets). */
  val q134 = Q(
    "q134_zorder_layout",
    (s, dir) => {
      val orders = Tables(s, dir, "orders")
      graft.ops.Layout.zOrderFiles(orders,
          x = col("o_custkey"),
          y = datediff(col("o_orderdate").cast("date"), lit("1970-01-01")),
          tie = col("o_orderkey"),
          rowsPerFile = 1024L, bits = 16)
        .orderBy(col("file_id"))
    },
    Some {
      val z = (0 until 16).map(b =>
        s"(((x >> $b) & 1) << ${2 * b}) | (((y >> $b) & 1) << ${2 * b + 1})")
        .mkString(" | ")
      s"""
      WITH t AS (SELECT o_orderkey, CAST(o_custkey AS BIGINT) AS x,
               CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
                 AS y
             FROM orders),
      z AS (SELECT x, y, o_orderkey, ($z) AS zv FROM t),
      r AS (SELECT x, y, CAST((row_number() OVER (ORDER BY zv, o_orderkey)
               - 1) // 1024 AS BIGINT) AS file_id FROM z)
      SELECT file_id, count(*) AS n_rows,
             min(x) AS min_x, max(x) AS max_x,
             min(y) AS min_y, max(y) AS max_y
      FROM r GROUP BY file_id ORDER BY file_id"""
    },
    covers = Seq("TD-layout-zorder"))

  /** CMS accuracy harness: exact top-10 token counts vs the
    * Count-Min point estimate from the q129 registers — the sketch
    * tuning harness (depth/width vs overestimate), completing the
    * harness family (q112 ANN, q122 text LSH, q126 embedding LSH);
    * the CMS guarantee est ≥ exact makes `overestimate` ≥ 0 by
    * construction, and all quantities are exact integers. */
  val q135 = Q(
    "q135_cms_accuracy",
    (s, dir) => {
      val toks = Tables(s, dir, "documents")
        .select(explode(T.tokens(col("text"))).as("tok"))
      val ex = toks.groupBy(col("tok")).agg(count(lit(1)).as("n_exact"))
      val top = ex.orderBy(col("n_exact").desc, col("tok")).limit(10)
      val reg = graft.functions.CmsSketch.registers(toks, col("tok"),
        depth = 4, width = 32)
      val est = graft.functions.CmsSketch.estimate(reg,
          top.select(col("tok")), col("tok"), depth = 4, width = 32)
        .select(col("key").as("tok"), col("est").as("cms_est"))
      top.join(est, Seq("tok"))
        .select(col("tok"), col("n_exact"), col("cms_est"),
          (col("cms_est") - col("n_exact")).as("overestimate"))
        .orderBy(col("n_exact").desc, col("tok"))
    },
    Some {
      val cellRows = (0 until 4).map { j =>
        s"""SELECT $j AS row, ${dkHash(100 + j, "tok")} % 32 AS col,
               count(*) AS cnt FROM t GROUP BY 2"""
      }.mkString("\n        UNION ALL\n        ")
      val keyRows = (0 until 4).map { j =>
        s"SELECT tok, $j AS row, ${dkHash(100 + j, "tok")} % 32 AS col FROM top"
      }.mkString("\n        UNION ALL\n        ")
      s"""
      WITH t AS (SELECT unnest(string_split(text,' ')) AS tok FROM documents),
      ex AS (SELECT tok, count(*) AS n_exact FROM t GROUP BY tok),
      top AS (SELECT tok, n_exact FROM ex ORDER BY n_exact DESC, tok LIMIT 10),
      cells AS (
        $cellRows),
      keyed AS (
        $keyRows),
      est AS (SELECT k.tok, min(c.cnt) AS cms_est
              FROM keyed k JOIN cells c ON k.row = c.row AND k.col = c.col
              GROUP BY k.tok)
      SELECT top.tok, CAST(top.n_exact AS BIGINT) AS n_exact,
             CAST(est.cms_est AS BIGINT) AS cms_est,
             CAST(est.cms_est - top.n_exact AS BIGINT) AS overestimate
      FROM top JOIN est USING (tok)
      ORDER BY n_exact DESC, tok"""
    },
    covers = Seq("TD-sketch-cms", "TD-dedup-quality"))

  /** Chunk-adjacency recovery by content overlap
    * ([[CorpusPipeline.stitchPairs]]): chunk the corpus with
    * overlapping windows (width 32, stride 24 → 8-token overlap),
    * then recover which chunk follows which purely from content —
    * suffix-8 hash equi-joined to prefix-8 hash. Consecutive chunks
    * of the same doc re-link by construction; cross-doc links expose
    * shared boilerplate seams. */
  val q136 = Q(
    "q136_stitch_pairs",
    (s, dir) => {
      import graft.pipelines.CorpusPipeline
      val ch = Tables(s, dir, "documents")
        .select(col("doc_id"), T.tokens(col("text")).as("ws"))
        .select(col("doc_id"), col("ws"),
          explode(sequence(lit(1), size(col("ws")), lit(24))).as("start"))
        .select(
          concat_ws("_", col("doc_id"), col("start")).as("chunk_id"),
          concat_ws(" ", slice(col("ws"), col("start"), lit(32))).as("text"))
      CorpusPipeline.stitchPairs(ch, k = 8)
        .orderBy(col("id_a"), col("id_b"))
    },
    Some(s"""
      WITH toks AS (SELECT doc_id, string_split(text,' ') AS ws FROM documents),
      ch AS (SELECT CAST(doc_id AS VARCHAR)||'_'||CAST(start AS VARCHAR)
               AS chunk_id,
               ws[start:least(start+31, len(ws))] AS cw
             FROM (SELECT doc_id, ws,
                     unnest(generate_series(1, len(ws), 24)) AS start
                   FROM toks)),
      f AS (SELECT chunk_id,
              ${dkHash(0, "array_to_string(cw[1:8],' ')")} AS pre,
              ${dkHash(0, "array_to_string(cw[len(cw)-7:len(cw)],' ')")} AS suf
            FROM ch WHERE len(cw) >= 16)
      SELECT a.chunk_id AS id_a, b.chunk_id AS id_b
      FROM f a JOIN f b ON a.suf = b.pre AND a.chunk_id <> b.chunk_id
      ORDER BY id_a, id_b"""),
    covers = Seq("TD-cdc-chunking", "TD-boilerplate"))

  /** Corpus snapshot diff ([[CorpusPipeline.snapshotDiff]]): the
    * incremental-reprocessing change feed — added/removed/changed
    * between two corpus versions (both derived deterministically from
    * the documents table: prev drops ids ≡ 3 mod 17 and appends
    * ' legacy' to ids ≡ 5 mod 13; curr drops ids ≡ 7 mod 19). */
  val q137 = Q(
    "q137_snapshot_diff",
    (s, dir) => {
      import graft.pipelines.CorpusPipeline
      val docs = Tables(s, dir, "documents")
      val prev = docs.filter(col("doc_id") % 17 =!= 3)
        .withColumn("text", when(col("doc_id") % 13 === 5,
          concat(col("text"), lit(" legacy"))).otherwise(col("text")))
      val curr = docs.filter(col("doc_id") % 19 =!= 7)
      CorpusPipeline.snapshotDiff(prev, curr)
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH prev AS (SELECT doc_id,
               CASE WHEN doc_id % 13 = 5 THEN text || ' legacy'
                    ELSE text END AS text
             FROM documents WHERE doc_id % 17 <> 3),
      curr AS (SELECT doc_id, text FROM documents WHERE doc_id % 19 <> 7),
      p AS (SELECT doc_id,
              md5(trim(lower(regexp_replace(text, '\s+', ' ', 'g')))) AS fp
            FROM prev),
      c AS (SELECT doc_id,
              md5(trim(lower(regexp_replace(text, '\s+', ' ', 'g')))) AS fp
            FROM curr)
      SELECT doc_id,
             CASE WHEN p.fp IS NULL THEN 'added'
                  WHEN c.fp IS NULL THEN 'removed'
                  WHEN p.fp <> c.fp THEN 'changed'
                  ELSE 'unchanged' END AS status
      FROM p FULL JOIN c USING (doc_id)
      WHERE p.fp IS NULL OR c.fp IS NULL OR p.fp <> c.fp
      ORDER BY doc_id"""),
    covers = Seq("TD-snapshot-diff", "TD-dedup-exact"))

  /** Tokenizer fertility per source
    * ([[CorpusPipeline.tokenizerFertility]]): subword-to-word ratio
    * with the BPE-alphabet proxy (letter runs | digit runs | single
    * punctuation) — the tokenizer-coverage diagnostic behind
    * per-source token budgeting. */
  val q138 = Q(
    "q138_tokenizer_fertility",
    (s, dir) => {
      import graft.pipelines.CorpusPipeline
      CorpusPipeline.tokenizerFertility(Tables(s, dir, "documents"))
        .orderBy(col("source"))
    },
    Some("""
      WITH t AS (SELECT source,
               CAST(len(string_split(text,' ')) AS BIGINT) AS w,
               CAST(len(regexp_extract_all(lower(text),
                 '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS BIGINT) AS s
             FROM documents)
      SELECT source, count(*) AS n_docs, CAST(sum(w) AS BIGINT) AS n_words,
             CAST(sum(s) AS BIGINT) AS n_subtokens,
             CAST(sum(s) AS DOUBLE) / CAST(sum(w) AS DOUBLE) AS fertility
      FROM t GROUP BY source ORDER BY source"""),
    covers = Seq("TD-token-count", "TD-source-drift"))

  /** Per-source exact token-length quantiles
    * ([[CorpusPipeline.lengthQuantilesBy]]): q124's bounded-histogram
    * nearest-rank construction with the cumulative window partitioned
    * by source — the per-stratum length profile. */
  val q139 = Q(
    "q139_length_quantiles_by_source",
    (s, dir) => {
      import graft.pipelines.CorpusPipeline
      CorpusPipeline.lengthQuantilesBy(Tables(s, dir, "documents"))
        .orderBy(col("source"), col("p"))
    },
    Some("""
      WITH c AS (SELECT source,
                   CAST(len(string_split(text,' ')) AS BIGINT) AS v,
                   count(*) AS n FROM documents GROUP BY source, v),
      cum AS (SELECT source, v,
                sum(n) OVER (PARTITION BY source ORDER BY v
                  ROWS UNBOUNDED PRECEDING) AS cumn FROM c),
      tot AS (SELECT source, sum(n) AS t FROM c GROUP BY source),
      pp AS (SELECT unnest([CAST(0.5 AS DOUBLE), CAST(0.9 AS DOUBLE),
                            CAST(0.99 AS DOUBLE)]) AS p)
      SELECT tot.source, p, min(v) AS quantile
      FROM tot, pp, cum
      WHERE cum.source = tot.source
        AND cum.cumn >= CAST(ceil(p * tot.t) AS BIGINT)
      GROUP BY tot.source, p ORDER BY tot.source, p"""),
    covers = Seq("TD-length-quantiles", "TD-source-drift"))

  /** Duplicate-cluster SIZE histogram — dedup observability over the
    * q77 connected components: how many clusters of each size the LSH
    * near-dup graph produced (the shape that tells a mirror-heavy
    * crawl from scattered pairwise near-dups). Two tiny aggregations
    * over the cluster table. */
  val q140 = Q(
    "q140_cluster_size_histogram",
    (s, dir) => {
      val sig = Dedup.minhashSignatures(Tables(s, dir, "documents"),
        "doc_id", "text", n = 3, k = K)
      val pairs = Dedup.lshCandidatePairs(sig, "doc_id", k = K,
        rows = BAND_ROWS).localCheckpoint()
      val ids = pairs.select(col("id_a").as("doc_id"))
        .unionByName(pairs.select(col("id_b").as("doc_id"))).distinct()
      val decided = Dedup.dedupDecision(ids, "doc_id", pairs)
      graft.CacheTracker.releaseCheckpoint(pairs)
      decided.groupBy(col("cluster")).agg(count(lit(1)).as("cluster_size"))
        .groupBy(col("cluster_size")).agg(count(lit(1)).as("n_clusters"))
        .orderBy(col("cluster_size"))
    },
    Some {
      val bandRows = (0 until K / BAND_ROWS).map { b =>
        val key = (b * BAND_ROWS until (b + 1) * BAND_ROWS)
          .map(i => s"CAST(mh$i AS VARCHAR)").mkString("||'_'||")
        s"SELECT doc_id, $b AS band, $key AS band_key FROM sig"
      }.mkString("\n        UNION ALL\n        ")
      s"""
      WITH RECURSIVE $dkShingles,
      $dkSig,
      bands AS (
        $bandRows),
      pairs AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bands a JOIN bands b USING(band, band_key)
        WHERE a.doc_id < b.doc_id),
      edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
                UNION ALL
                SELECT id_b AS src, id_a AS dst FROM pairs),
      nodes AS (SELECT DISTINCT src AS node FROM edges),
      reach AS (
        SELECT node, node AS m FROM nodes
        UNION
        SELECT e.dst AS node, r.m
        FROM reach r JOIN edges e ON e.src = r.node
      ),
      cc AS (SELECT node, MIN(m) AS cluster FROM reach GROUP BY node),
      sz AS (SELECT cluster, count(*) AS cluster_size FROM cc
             GROUP BY cluster)
      SELECT cluster_size, count(*) AS n_clusters
      FROM sz GROUP BY cluster_size ORDER BY cluster_size"""
    },
    covers = Seq("TD-dedup-clusters", "TD-dedup-quality"))

  /** Bloom-filter decontamination
    * ([[CorpusPipeline.bloomDecontaminate]], m=65536 bits, k=3
    * hashes, 4-grams, benchmark = 'src0' as in q83): the sketch
    * variant of exact decontamination — the benchmark ships as a bit
    * set, flagged docs are a SUPERSET of q83's exact hits (false
    * negatives impossible, the safe direction). */
  val q141 = Q(
    "q141_bloom_decontaminate",
    (s, dir) => {
      import graft.pipelines.CorpusPipeline
      val docs = Tables(s, dir, "documents")
      CorpusPipeline.bloomDecontaminate(
          docs.filter(col("source") =!= "src0"),
          docs.filter(col("source") === "src0"))
        .orderBy(col("doc_id"))
    },
    Some {
      val grams = "[ws[i]||' '||ws[i+1]||' '||ws[i+2]||' '||ws[i+3] " +
        "for i in generate_series(1, len(ws)-3)]"
      def ps(g: String) = s"list_distinct([${dkHash(200, g)} % 65536, " +
        s"${dkHash(201, g)} % 65536, ${dkHash(202, g)} % 65536])"
      s"""
      WITH c AS (SELECT doc_id, text FROM documents WHERE source <> 'src0'),
      b AS (SELECT text FROM documents WHERE source = 'src0'),
      bg AS (SELECT DISTINCT g FROM
               (SELECT unnest($grams) AS g
                FROM (SELECT string_split(text,' ') AS ws FROM b))),
      bits AS (SELECT DISTINCT unnest(${ps("g")}) AS bit FROM bg),
      cg AS (SELECT DISTINCT doc_id, g FROM
               (SELECT doc_id, unnest($grams) AS g
                FROM (SELECT doc_id, string_split(text,' ') AS ws FROM c))),
      cp AS (SELECT doc_id, ${dkHash(0, "g")} AS gh, ${ps("g")} AS pl
             FROM cg),
      ex AS (SELECT doc_id, gh, len(pl) AS np, unnest(pl) AS bit FROM cp),
      hit AS (SELECT doc_id, gh FROM ex JOIN bits USING (bit)
              GROUP BY doc_id, gh, np HAVING count(*) = np)
      SELECT doc_id, count(*) AS n_hit_grams
      FROM hit GROUP BY doc_id ORDER BY doc_id"""
    },
    covers = Seq("TD-decontamination", "TD-sketch-bloom"))

  /** Event conversion FUNNEL over the events stream: users with a
    * view, a first click strictly after their first view, and a first
    * purchase strictly after that click — the classic ordered-funnel
    * semantics (each stage anchored to the previous stage's
    * timestamp, not mere co-occurrence), with stage counts and
    * conversion rates. Every stage is one filter + one equi-join on
    * user_id + one min aggregation — scales as three hash joins. */
  val q142 = Q(
    "q142_event_funnel",
    (s, dir) => {
      val ev = Tables(s, dir, "events")
      val v = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts")).as("t_view"))
      val c = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts").as("t_c"))
        .join(v, Seq("user_id")).filter(col("t_c") > col("t_view"))
        .groupBy(col("user_id")).agg(min(col("t_c")).as("t_click"))
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").as("t_p"))
        .join(c, Seq("user_id")).filter(col("t_p") > col("t_click"))
        .groupBy(col("user_id")).agg(min(col("t_p")).as("t_purchase"))
      val nv = v.agg(count(lit(1)).as("n_view_users"))
      val nc = c.agg(count(lit(1)).as("n_click_users"))
      val np = p.agg(count(lit(1)).as("n_purchase_users"))
      nv.crossJoin(broadcast(nc)).crossJoin(broadcast(np))
        .select(col("n_view_users"), col("n_click_users"),
          col("n_purchase_users"),
          (col("n_click_users").cast("double") /
            col("n_view_users").cast("double")).as("view_to_click"),
          (col("n_purchase_users").cast("double") /
            col("n_click_users").cast("double")).as("click_to_purchase"))
    },
    Some("""
      WITH v AS (SELECT user_id, min(ts) AS t_view FROM events
                 WHERE event_type = 'view' GROUP BY user_id),
      c AS (SELECT e.user_id, min(e.ts) AS t_click
            FROM events e JOIN v ON e.user_id = v.user_id
            WHERE e.event_type = 'click' AND e.ts > v.t_view
            GROUP BY e.user_id),
      p AS (SELECT e.user_id
            FROM events e JOIN c ON e.user_id = c.user_id
            WHERE e.event_type = 'purchase' AND e.ts > c.t_click
            GROUP BY e.user_id)
      SELECT (SELECT count(*) FROM v) AS n_view_users,
             (SELECT count(*) FROM c) AS n_click_users,
             (SELECT count(*) FROM p) AS n_purchase_users,
             CAST((SELECT count(*) FROM c) AS DOUBLE)
               / CAST((SELECT count(*) FROM v) AS DOUBLE) AS view_to_click,
             CAST((SELECT count(*) FROM p) AS DOUBLE)
               / CAST((SELECT count(*) FROM c) AS DOUBLE) AS click_to_purchase"""),
    covers = Seq("TD-event-funnel", "A1"))

  /** Class-centroid export ([[graft.ops.EmbeddingStats
    * .classCentroids]]): the per-label mean-embedding prototype table
    * (nearest-class-mean / SemDeDup / coarse-quantizer input); exact
    * integer sums, two IEEE divisions per coordinate. */
  val q143 = Q(
    "q143_class_centroids",
    (s, dir) => {
      graft.ops.EmbeddingStats.classCentroids(Tables(s, dir, "embeddings"))
        .orderBy(col("label"), col("dim"))
    },
    Some("""
      WITH q2 AS (SELECT vec_id, label,
               [CAST(round(CAST(x AS DOUBLE)*1000) AS BIGINT)
                for x in embedding] AS qv FROM embeddings),
      u AS (SELECT label, i AS dim, qv[i] AS v
            FROM q2, generate_series(1,64) g(i))
      SELECT label, CAST(dim AS INTEGER) AS dim,
             count(*) AS n_vecs,
             CAST(sum(v) AS DOUBLE) / CAST(count(*) AS DOUBLE) / 1000.0
               AS centroid
      FROM u GROUP BY label, dim ORDER BY label, dim"""),
    covers = Seq("TD-embedding-stats", "TD-kmeans"))

  /** Hourly event-rate ANOMALY detection: per (event_type, hour)
    * counts, each compared to its trailing-24h mean (rows-preceding
    * window, ≥ 6 trailing hours required); flagged when the hour runs
    * ≥ 2× its trail. The ops-dashboard spike detector. The window
    * partitions by event type over #hours rows — bounded by the TIME
    * DOMAIN, not data volume; counts are exact ints, the mean is one
    * division. */
  val q144 = Q(
    "q144_event_anomaly",
    (s, dir) => {
      val ev = Tables(s, dir, "events")
      val hourly = ev
        .groupBy(col("event_type"),
          date_trunc("hour", col("ts")).as("hour"))
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("hour"))
        .rowsBetween(-24, -1)
      hourly
        .withColumn("__ts", sum(col("n")).over(w))
        .withColumn("__tc", count(col("n")).over(w))
        .filter(col("__tc") >= 6)
        .withColumn("trail_avg",
          col("__ts").cast("double") / col("__tc").cast("double"))
        .filter(col("n").cast("double") >= lit(2.0) * col("trail_avg"))
        .select(col("event_type"), col("hour"), col("n"), col("trail_avg"))
        .orderBy(col("event_type"), col("hour"))
    },
    Some("""
      WITH hourly AS (SELECT event_type, date_trunc('hour', ts) AS hour,
               count(*) AS n
             FROM events GROUP BY event_type, hour),
      t AS (SELECT event_type, hour, n,
              sum(n) OVER (PARTITION BY event_type ORDER BY hour
                ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING) AS ts,
              count(n) OVER (PARTITION BY event_type ORDER BY hour
                ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING) AS tc
            FROM hourly)
      SELECT event_type, hour, n,
             CAST(ts AS DOUBLE) / CAST(tc AS DOUBLE) AS trail_avg
      FROM t
      WHERE tc >= 6
        AND CAST(n AS DOUBLE) >= 2.0 * (CAST(ts AS DOUBLE) / CAST(tc AS DOUBLE))
      ORDER BY event_type, hour"""),
    covers = Seq("TD-event-anomaly", "W1"))

  /** Weekly COHORT RETENTION over the events stream: users cohorted
    * by first-signup week, counted distinct-active in weeks k=0..3
    * after their cohort week, with the retention rate against cohort
    * size — the canonical product-analytics matrix. Three hash
    * aggregations + two equi-joins on user_id/cohort; the (cohort, k)
    * grid is bounded by the time domain. */
  val q145 = Q(
    "q145_cohort_retention",
    (s, dir) => {
      val ev = Tables(s, dir, "events")
      val su = ev.filter(col("event_type") === "signup")
        .groupBy(col("user_id"))
        .agg(min(date_trunc("week", col("ts"))).as("cohort"))
      val sizes = su.groupBy(col("cohort"))
        .agg(count(lit(1)).as("n_cohort"))
      val act = ev.select(col("user_id"),
        date_trunc("week", col("ts")).as("w")).distinct()
      su.join(act, Seq("user_id"))
        // exclude pre-signup activity BEFORE dividing: Spark's `div`
        // truncates toward zero, so datediff in -6..-1 would land in
        // k=0 (DuckDB's `//` floors it to k=-1) — a latent engine/
        // oracle divergence without this guard
        .filter(expr("datediff(w, cohort) >= 0"))
        .withColumn("k", expr("CAST(datediff(w, cohort) div 7 AS BIGINT)"))
        .filter(col("k").between(0, 3))
        .groupBy(col("cohort"), col("k"))
        .agg(count_distinct(col("user_id")).as("n_active"))
        .join(sizes, Seq("cohort"))
        .select(col("cohort"), col("k"), col("n_cohort"), col("n_active"),
          (col("n_active").cast("double") / col("n_cohort").cast("double"))
            .as("retention"))
        .orderBy(col("cohort"), col("k"))
    },
    Some("""
      WITH su AS (SELECT user_id,
                    min(CAST(date_trunc('week', ts) AS TIMESTAMP)) AS cohort
                  FROM events WHERE event_type = 'signup' GROUP BY user_id),
      sizes AS (SELECT cohort, count(*) AS n_cohort FROM su GROUP BY cohort),
      act AS (SELECT DISTINCT user_id,
                CAST(date_trunc('week', ts) AS TIMESTAMP) AS w
              FROM events),
      r AS (SELECT su.cohort, date_diff('day', su.cohort, act.w) // 7 AS k,
              count(DISTINCT su.user_id) AS n_active
            FROM su JOIN act ON su.user_id = act.user_id
            WHERE date_diff('day', su.cohort, act.w) >= 0
              AND date_diff('day', su.cohort, act.w) // 7 BETWEEN 0 AND 3
            GROUP BY su.cohort, k)
      SELECT r.cohort, CAST(k AS BIGINT) AS k, n_cohort, n_active,
             CAST(n_active AS DOUBLE) / CAST(n_cohort AS DOUBLE) AS retention
      FROM r JOIN sizes ON r.cohort = sizes.cohort
      ORDER BY r.cohort, k"""),
    covers = Seq("TD-cohort-retention", "A1"))

  /** Per-source TOP-5 tokens (count desc, token asc tie-break) via a
    * rank window PARTITIONED by source over the per-source vocab —
    * bounded by vocabulary domain, never by data volume; the grouped
    * form of q93's global vocab head. */
  val q146 = Q(
    "q146_top_tokens_by_source",
    (s, dir) => {
      val t = Tables(s, dir, "documents")
        .select(col("source"), explode(T.tokens(col("text"))).as("tok"))
        .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("n"))
      val w = Window.partitionBy(col("source"))
        .orderBy(col("n").desc, col("tok"))
      t.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select(col("source"), col("rank"), col("tok"), col("n"))
        .orderBy(col("source"), col("rank"))
    },
    Some("""
      WITH t AS (SELECT source, tok, count(*) AS n FROM
                   (SELECT source, unnest(string_split(text,' ')) AS tok
                    FROM documents)
                 GROUP BY source, tok),
      r AS (SELECT source, tok, n,
              CAST(row_number() OVER (PARTITION BY source
                ORDER BY n DESC, tok) AS INTEGER) AS rank
            FROM t)
      SELECT source, rank, tok, n FROM r WHERE rank <= 5
      ORDER BY source, rank"""),
    covers = Seq("TD-vocab-head", "W2"))

  /** As-of join, oracle-gated ([[graft.ops.AsofJoin.asofJoin]]):
    * for each error event, the same user's most recent click at or
    * before the error — the point-in-time diagnostic join. One
    * union + one (key)-partitioned sort with last(ignoreNulls) carry
    * — no range-join explosion; ties at equal ts break on the
    * greatest click id (eventOrder), so the survivor is
    * deterministic. Upgrades the op from spec-only to oracle-gated. */
  val q147 = Q(
    "q147_asof_error_click",
    (s, dir) => {
      val ev = Tables(s, dir, "events")
      val errors = ev.filter(col("event_type") === "error")
        .select(col("event_id"), col("user_id"), col("ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"),
          col("ts"), col("ts").as("click_ts"))
      graft.ops.AsofJoin.asofJoin(errors, clicks,
          keys = Seq("user_id"), probeTs = "ts", eventTs = "ts",
          eventValueCols = Seq("click_id", "click_ts"),
          eventOrder = Seq("click_id"))
        .orderBy(col("event_id"))
    },
    Some("""
      WITH p AS (SELECT event_id, user_id, ts FROM events
                 WHERE event_type = 'error'),
      c AS (SELECT event_id AS click_id, user_id, ts AS cts FROM events
            WHERE event_type = 'click'),
      j AS (SELECT p.event_id, p.user_id, p.ts, c.click_id,
              c.cts AS click_ts,
              row_number() OVER (PARTITION BY p.event_id
                ORDER BY c.cts DESC, c.click_id DESC) AS rn
            FROM p LEFT JOIN c
              ON p.user_id = c.user_id AND c.cts <= p.ts)
      SELECT event_id, user_id, ts, click_id AS evt_click_id,
             click_ts AS evt_click_ts
      FROM j WHERE rn = 1 ORDER BY event_id"""),
    covers = Seq("TD-asof-join", "J13"))

  /** Per-source HLL register sketches
    * ([[graft.functions.HllSketch.registersBy]], p=6, distinct TOKENS
    * per source): the grouped-sketch materialization a pipeline keeps
    * per partition — roll up to any coarser grain by re-aggregating
    * max; vocabulary-richness observability. Registers oracle-exact;
    * per-group estimates spec-verified. */
  val q148 = Q(
    "q148_hll_by_source",
    (s, dir) => {
      val t = Tables(s, dir, "documents")
        .select(col("source"), explode(T.tokens(col("text"))).as("tok"))
        .distinct()
      graft.functions.HllSketch.registersBy(t, "source", col("tok"), p = 6)
        .orderBy(col("source"), col("bucket"))
    },
    Some {
      val mask = (1L << 54) - 1
      s"""
      WITH d AS (SELECT DISTINCT source, tok FROM
             (SELECT source, unnest(string_split(text,' ')) AS tok
              FROM documents)),
      h AS (SELECT source, ${dkHash(0, "tok")} AS h FROM d),
      r AS (SELECT source, h >> 54 AS bucket,
              CAST(CASE WHEN (h & $mask) = 0 THEN 55
                   ELSE 54 - (length(bin(h & $mask)) - 1) END AS BIGINT)
                AS rho
            FROM h)
      SELECT source, bucket, max(rho) AS max_rho
      FROM r GROUP BY source, bucket ORDER BY source, bucket"""
    },
    covers = Seq("TD-sketch-hll", "TD-source-drift"))

  /** Interval (band) join, oracle-gated
    * ([[graft.ops.IntervalJoin.intervalJoin]]): clicks within ±5 min
    * of each error event of the same user — the banded rewrite of
    * the non-equi time-range join (probe explodes to 3 adjacent
    * radius buckets, equi-join on (key, bucket), exact |Δ| filter
    * after); zero-match errors kept via the left join back. */
  val q149 = Q(
    "q149_interval_join",
    (s, dir) => {
      val ev = Tables(s, dir, "events")
      val errors = ev.filter(col("event_type") === "error")
        .select(col("event_id"), col("user_id"), col("ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts").as("cts"))
      val pairs = graft.ops.IntervalJoin.intervalJoin(errors, clicks,
        keys = Seq("user_id"), probeTs = "ts", eventTs = "cts",
        radiusSec = 300L)
      val counts = pairs.groupBy(col("event_id"))
        .agg(count(lit(1)).as("n_nearby"))
      errors.join(counts, Seq("event_id"), "left")
        .select(col("event_id"), col("user_id"),
          coalesce(col("n_nearby"), lit(0L)).as("n_nearby"))
        .orderBy(col("event_id"))
    },
    Some("""
      WITH p AS (SELECT event_id, user_id, ts FROM events
                 WHERE event_type = 'error'),
      c AS (SELECT user_id, ts AS cts FROM events
            WHERE event_type = 'click')
      SELECT p.event_id, p.user_id,
             CAST(count(c.cts) AS BIGINT) AS n_nearby
      FROM p LEFT JOIN c ON p.user_id = c.user_id
        AND abs(epoch_us(p.ts) - epoch_us(c.cts)) <= 300000000
      GROUP BY p.event_id, p.user_id ORDER BY p.event_id"""),
    covers = Seq("TD-interval-join", "J13"))

  /** Month-over-month order revenue growth: per-month counts +
    * DECIMAL-channel revenue, lag window for the growth rate — the
    * classic trend analytic; the window runs over #months rows
    * (bounded by the time domain). */
  val q150 = Q(
    "q150_mom_growth",
    (s, dir) => {
      val m = Tables(s, dir, "orders")
        .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast("decimal(18,6)")).cast("double")
            .as("revenue"))
      // deliberate single-partition window: #months rows by domain
      val w = Window.orderBy(col("month"))
      m.withColumn("prev_revenue", lag(col("revenue"), 1).over(w))
        .withColumn("mom_growth",
          when(col("prev_revenue").isNotNull,
            (col("revenue") - col("prev_revenue")) / col("prev_revenue")))
        .orderBy(col("month"))
    },
    Some("""
      WITH m AS (SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP)
               AS month,
               count(*) AS n_orders,
               CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6)))
                 AS VARCHAR) AS DOUBLE) AS revenue
             FROM orders GROUP BY 1)
      SELECT month, n_orders, revenue,
             lag(revenue) OVER (ORDER BY month) AS prev_revenue,
             CASE WHEN lag(revenue) OVER (ORDER BY month) IS NOT NULL
                  THEN (revenue - lag(revenue) OVER (ORDER BY month))
                    / lag(revenue) OVER (ORDER BY month) END AS mom_growth
      FROM m ORDER BY month"""),
    covers = Seq("A1", "W1"))

  /** JSON property extraction + per-type stats over the events
    * stream (P11 parity on events): `props` is a JSON string column;
    * extract `$.k`, aggregate exactly (integer sum, one division). */
  val q151 = Q(
    "q151_props_json_stats",
    (s, dir) => {
      Tables(s, dir, "events")
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"), sum(col("k")).as("sum_k"))
        .withColumn("avg_k",
          col("sum_k").cast("double") / col("n_events").cast("double"))
        .orderBy(col("event_type"))
    },
    Some("""
      SELECT event_type, count(*) AS n_events,
             CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
               AS BIGINT) AS sum_k,
             CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
               AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_k
      FROM events GROUP BY event_type ORDER BY event_type"""),
    covers = Seq("P11", "A1"))

  /** Per-doc NOVELTY score — the inverse of duplication: the fraction
    * of a doc's distinct 3-grams appearing in NO other document
    * (corpus df = 1). The data-mixing signal that prioritizes docs
    * contributing genuinely new content. One df aggregation on the
    * gram hash + one equi-join back + one per-doc aggregation —
    * cost ∝ grams, q94's machinery pointed the other way. */
  val q152 = Q(
    "q152_novelty_score",
    (s, dir) => {
      val docs = Tables(s, dir, "documents")
      val pos = graft.ops.Compute.spread(
          docs.select(col("doc_id"), col("text")))
        .select(col("doc_id"),
          explode(array_distinct(T.shinglesOf(col("text"), 3))).as("g"))
        .select(col("doc_id"), T.hash60(col("g"), 0).as("h"))
      val df = pos.groupBy(col("h"))
        .agg(count_distinct(col("doc_id")).as("__df"))
      val per = pos.join(df, Seq("h"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_grams"),
          sum(when(col("__df") === 1L, 1L).otherwise(0L)).as("n_novel"))
      docs.select(col("doc_id")).join(per, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_grams"), lit(0L)).as("n_grams"),
          coalesce(col("n_novel"), lit(0L)).as("n_novel"),
          when(coalesce(col("n_grams"), lit(0L)) === 0L, lit(0.0))
            .otherwise(col("n_novel").cast("double") /
              col("n_grams").cast("double")).as("novelty"))
        .orderBy(col("doc_id"))
    },
    Some(s"""
      WITH toks AS (SELECT doc_id, string_split(text,' ') AS ws
                    FROM documents),
      g AS (SELECT DISTINCT doc_id,
              ${dkHash(0, "sh")} AS h FROM
              (SELECT doc_id,
                 unnest([ws[i]||' '||ws[i+1]||' '||ws[i+2]
                         for i in generate_series(1, len(ws)-2)]) AS sh
               FROM toks)),
      df AS (SELECT h, count(DISTINCT doc_id) AS ddf FROM g GROUP BY h),
      per AS (SELECT doc_id, count(*) AS n_grams,
                sum(CASE WHEN ddf = 1 THEN 1 ELSE 0 END) AS n_novel
              FROM g JOIN df USING (h) GROUP BY doc_id)
      SELECT t.doc_id,
             CAST(coalesce(n_grams, 0) AS BIGINT) AS n_grams,
             CAST(coalesce(n_novel, 0) AS BIGINT) AS n_novel,
             CASE WHEN coalesce(n_grams, 0) = 0 THEN 0.0
                  ELSE CAST(n_novel AS DOUBLE) / CAST(n_grams AS DOUBLE)
             END AS novelty
      FROM toks t LEFT JOIN per USING (doc_id) ORDER BY doc_id"""),
    covers = Seq("TD-novelty", "TD-dup-span"))

  /** Model-based quality filter through the driver contract
    * ([[graft.ml.QualityClassifier]]): TF-IDF + logistic regression
    * trained on the in-repo clean/garbage fixture corpus, fixture
    * predictions frozen as a golden VALUES table (the q62 pattern) —
    * the learned second pass behind the q116 heuristic rules. */
  val q153 = Q(
    "q153_quality_classifier",
    (s, dir) => {
      import s.implicits._
      val model = graft.ml.QualityClassifier.defaultModel(s)
      val fixtures = graft.ml.QualityClassifier.trainingData.zipWithIndex
        .map { case ((text, label), i) => (i.toLong + 1L, text, label) }
        .toDF("example_id", "text", "expected_label")
      model.score(fixtures, "text")
        .select($"example_id", $"expected_label",
          $"quality_pred".as("predicted_label"))
        .orderBy($"example_id")
    },
    Some {
      val rows = graft.ml.QualityClassifier.trainingData.zipWithIndex
        .map { case ((_, label), i) =>
          // separable 12-example fixture set: exact fit, asserted by
          // QualityClassifierSpec's golden test
          s"(CAST(${i + 1} AS BIGINT), '$label', '$label')"
        }.mkString(",\n        ")
      s"""
      SELECT * FROM (VALUES
        $rows) AS t(example_id, expected_label, predicted_label)
      ORDER BY example_id"""
    },
    covers = Seq("ML-classifier", "TD-quality-rules"))

  /** Single-pass table profile ([[graft.ops.Profiler.profile]]) over
    * lineitem — the ANALYZE/statistics surface: per-column null
    * count, EXACT distinct count, numeric min/max, all from ONE
    * aggregation pass + a constant-size unpivot (the per-column-scan
    * formulation would read the table N times). */
  val q154 = Q(
    "q154_table_profile",
    (s, dir) => {
      graft.ops.Profiler.profile(Tables(s, dir, "lineitem"))
        .orderBy(col("column_name"))
    },
    Some {
      val cols = Seq(
        ("l_orderkey", "bigint", true), ("l_partkey", "bigint", true),
        ("l_suppkey", "bigint", true), ("l_linenumber", "int", true),
        ("l_quantity", "double", true), ("l_extendedprice", "double", true),
        ("l_discount", "double", true), ("l_tax", "double", true),
        ("l_returnflag", "string", false), ("l_linestatus", "string", false),
        ("l_shipdate", "timestamp_ntz", false))
      val rows = cols.map { case (c, t, num) =>
        val mn = if (num) s"CAST(min($c) AS DOUBLE)"
          else "CAST(NULL AS DOUBLE)"
        val mx = if (num) s"CAST(max($c) AS DOUBLE)"
          else "CAST(NULL AS DOUBLE)"
        s"""SELECT '$c' AS column_name, '$t' AS data_type,
            count(*) AS n_rows,
            CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT)
              AS n_nulls,
            count(DISTINCT $c) AS n_distinct,
            $mn AS min_value, $mx AS max_value
          FROM lineitem"""
      }.mkString("\n        UNION ALL\n        ")
      s"""
      SELECT * FROM (
        $rows)
      ORDER BY column_name"""
    },
    covers = Seq("TD-table-profile", "A1"))

  /** Per-source CMS register sketches
    * ([[graft.functions.CmsSketch.registersBy]], depth 4 × width 32,
    * sparse): the grouped frequency-sketch materialization — rolls up
    * to q129's corpus sketch by re-aggregating sum (spec-proven);
    * per-source token-frequency observability at d·w integers per
    * source. */
  val q155 = Q(
    "q155_cms_by_source",
    (s, dir) => {
      val t = Tables(s, dir, "documents")
        .select(col("source"), explode(T.tokens(col("text"))).as("tok"))
      graft.functions.CmsSketch.registersBy(t, "source", col("tok"),
          depth = 4, width = 32)
        .orderBy(col("source"), col("row"), col("col"))
    },
    Some {
      val cellRows = (0 until 4).map { j =>
        s"""SELECT source, $j AS row, ${dkHash(100 + j, "tok")} % 32 AS col,
               count(*) AS cnt FROM t GROUP BY source, 3"""
      }.mkString("\n        UNION ALL\n        ")
      s"""
      WITH t AS (SELECT source, unnest(string_split(text,' ')) AS tok
                 FROM documents)
      SELECT source, CAST(row AS INTEGER) AS row, CAST(col AS INTEGER) AS col,
             CAST(cnt AS BIGINT) AS cnt
      FROM (
        $cellRows)
      ORDER BY source, row, col"""
    },
    covers = Seq("TD-sketch-cms", "TD-source-drift"))

  /** Per-source curation SCORECARD
    * ([[CorpusPipeline.sourceScorecard]]): volume, quality-envelope
    * survivors, exact-dup rate, tokenizer fertility — one row per
    * source, the table a mixing decision reads. */
  val q156 = Q(
    "q156_source_scorecard",
    (s, dir) => {
      import graft.pipelines.CorpusPipeline
      CorpusPipeline.sourceScorecard(Tables(s, dir, "documents"))
        .orderBy(col("source"))
    },
    Some("""
      WITH b AS (SELECT source, text,
               CAST(len(string_split(text,' ')) AS BIGINT) AS nt,
               CAST(length(text) - len(string_split(text,' ')) + 1 AS DOUBLE)
                 / CAST(len(string_split(text,' ')) AS DOUBLE) AS avl
             FROM documents),
      a1 AS (SELECT source, count(*) AS n_docs,
               CAST(sum(nt) AS BIGINT) AS n_tokens,
               CAST(sum(CASE WHEN nt BETWEEN 5 AND 10000 AND avl <= 15.0
                   THEN 1 ELSE 0 END) AS BIGINT) AS n_quality
             FROM b GROUP BY source),
      fp AS (SELECT source, count(DISTINCT
               md5(trim(lower(regexp_replace(text, '\s+', ' ', 'g')))))
               AS n_distinct_fp
             FROM documents GROUP BY source),
      fert AS (SELECT source,
                 CAST(sum(s2) AS DOUBLE) / CAST(sum(w) AS DOUBLE) AS fertility
               FROM (SELECT source,
                       CAST(len(string_split(text,' ')) AS BIGINT) AS w,
                       CAST(len(regexp_extract_all(lower(text),
                         '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS BIGINT) AS s2
                     FROM documents)
               GROUP BY source)
      SELECT a1.source, n_docs, n_tokens, n_quality, n_distinct_fp,
             1.0 - CAST(n_distinct_fp AS DOUBLE) / CAST(n_docs AS DOUBLE)
               AS dup_rate,
             fertility
      FROM a1 JOIN fp ON a1.source = fp.source
              JOIN fert ON a1.source = fert.source
      ORDER BY a1.source"""),
    covers = Seq("TD-source-drift", "TD-curation-funnel"))

  /** MinHash ESTIMATOR error harness: on the LSH candidate pairs, the
    * signature-agreement Jaccard estimate (matching components / k)
    * vs the exact shingle Jaccard — the k-width tuning harness
    * completing the MinHash theory loop (q112/q122 tune the BANDS;
    * this measures the estimator itself). One-row summary through the
    * DECIMAL channel. */
  val q157 = Q(
    "q157_minhash_estimate_error",
    (s, dir) => {
      // same 1/2 modulus sample as q122 (round-7 VERDICT ask #5): the
      // estimate-error statistic is over candidate pairs, and the
      // sampled candidate set carries the same error distribution at
      // a quarter of the signature/shingle-index cost
      val docs = Tables(s, dir, "documents")
        .filter(pmod(col("doc_id"), lit(2)) === 0)
      // ONE tokenize+shingle pass (round-8 VERDICT ask #8): signatures
      // and the exact-Jaccard index both derive from the same persisted
      // shingle index; sig additionally persists because it feeds
      // candidate generation AND both per-side signature attaches
      val shIdx = graft.CacheTracker.track(
        Dedup.shingleIndex(docs, "doc_id", "text", 3))
      val sig = graft.CacheTracker.track(
        Dedup.minhashSignaturesFromIndex(shIdx, "doc_id", K))
      val cand = Dedup.lshCandidatePairs(sig, "doc_id", k = K,
        rows = BAND_ROWS).select(col("id_a"), col("id_b"))
      val sa = sig.columns.filter(_.startsWith("mh")).map(c =>
        col(c).as(s"a_$c"))
      val sb = sig.columns.filter(_.startsWith("mh")).map(c =>
        col(c).as(s"b_$c"))
      val est = cand
        .join(sig.select((col("doc_id").as("id_a") +: sa.toSeq): _*), "id_a")
        .join(sig.select((col("doc_id").as("id_b") +: sb.toSeq): _*), "id_b")
        .withColumn("est",
          (0 until K).map(i =>
            when(col(s"a_mh$i") === col(s"b_mh$i"), 1).otherwise(0))
            .reduce(_ + _).cast("double") / lit(K.toDouble))
        .select(col("id_a"), col("id_b"), col("est"))
      val idx = graft.CacheTracker.track(
        shIdx.select(col("doc_id"), xxhash64(col("sh")).as("sh")))
      val sizes = idx.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
      val exact = est
        .join(idx.select(col("doc_id").as("id_a"), col("sh")), Seq("id_a"))
        .join(idx.select(col("doc_id").as("id_b"), col("sh")),
          Seq("id_b", "sh"))
        .groupBy(col("id_a"), col("id_b"), col("est"))
        .agg(count(lit(1)).as("n_inter"))
        .join(sizes.select(col("doc_id").as("id_a"), col("n_sh").as("na")),
          "id_a")
        .join(sizes.select(col("doc_id").as("id_b"), col("n_sh").as("nb")),
          "id_b")
        .withColumn("exact", col("n_inter").cast("double") /
          (col("na") + col("nb") - col("n_inter")).cast("double"))
      exact.agg(
        count(lit(1)).as("n_pairs"),
        (sum(abs(col("est") - col("exact")).cast("decimal(18,6)"))
          .cast("double") / count(lit(1)).cast("double")).as("mean_abs_err"))
    },
    Some {
      val bandRows = (0 until K / BAND_ROWS).map { b =>
        val key = (b * BAND_ROWS until (b + 1) * BAND_ROWS)
          .map(i => s"CAST(mh$i AS VARCHAR)").mkString("||'_'||")
        s"SELECT doc_id, $b AS band, $key AS band_key FROM sig"
      }.mkString("\n        UNION ALL\n        ")
      val agree = (0 until K).map(i =>
        s"CASE WHEN a.mh$i = b.mh$i THEN 1 ELSE 0 END").mkString(" + ")
      s"""
      WITH ${dkShinglesFrom("(SELECT * FROM documents WHERE doc_id % 2 = 0)")},
      $dkSig,
      bands AS (
        $bandRows),
      cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
               FROM bands a JOIN bands b USING (band, band_key)
               WHERE a.doc_id < b.doc_id),
      est AS (SELECT id_a, id_b,
                CAST($agree AS DOUBLE) / ${K}.0 AS est
              FROM cand JOIN sig a ON cand.id_a = a.doc_id
                        JOIN sig b ON cand.id_b = b.doc_id),
      sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
      inter AS (SELECT e.id_a, e.id_b, e.est, count(*) AS n_inter
                FROM est e JOIN sh a ON e.id_a = a.doc_id
                           JOIN sh b ON e.id_b = b.doc_id AND a.sh = b.sh
                GROUP BY e.id_a, e.id_b, e.est),
      x AS (SELECT i.id_a, i.id_b, i.est,
              CAST(n_inter AS DOUBLE)
                / CAST(sa.n + sb.n - n_inter AS DOUBLE) AS exact
            FROM inter i JOIN sizes sa ON i.id_a = sa.doc_id
                         JOIN sizes sb ON i.id_b = sb.doc_id)
      SELECT count(*) AS n_pairs,
             CAST(CAST(sum(CAST(abs(est - exact) AS DECIMAL(18,6)))
               AS VARCHAR) AS DOUBLE) / CAST(count(*) AS DOUBLE)
               AS mean_abs_err
      FROM x"""
    },
    covers = Seq("TD-dedup-quality", "TD-dedup-lsh"))

  /** Rendezvous (HRW) sharding ([[graft.ops.Sharding]]): shard counts
    * for the documents table at 8 and at 9 shards — the elastic
    * resharding scheme for persistent dedup/sketch state where
    * growing the fleet moves ONLY the keys whose argmax is the new
    * shard (spec-pinned); `hash mod N` would move (N−1)/N of them. */
  val q158 = Q(
    "q158_rendezvous_shards",
    (s, dir) => {
      import graft.ops.Sharding
      val docs = Tables(s, dir, "documents")
      Sharding.shardCounts(docs, col("doc_id"), 8)
        .unionByName(Sharding.shardCounts(docs, col("doc_id"), 9))
        .orderBy(col("n_shards"), col("shard"))
    },
    Some {
      def cfg(n: Int): String =
        s"""SELECT $n AS n_shards, shard, count(*) AS n_docs FROM (
             SELECT doc_id, s AS shard,
               row_number() OVER (PARTITION BY doc_id
                 ORDER BY ${dkHash(11, "CAST(doc_id AS VARCHAR)||'|'||CAST(s AS VARCHAR)")} DESC,
                 s DESC) AS rn
             FROM documents, generate_series(0, ${n - 1}) g(s))
           WHERE rn = 1 GROUP BY shard"""
      s"""
      SELECT CAST(n_shards AS INTEGER) AS n_shards,
             CAST(shard AS INTEGER) AS shard, n_docs
      FROM (
        ${cfg(8)}
        UNION ALL
        ${cfg(9)})
      ORDER BY n_shards, shard"""
    },
    covers = Seq("TD-sharding", "TD-dedup-exact"))

  /** CUBE grouping sets (all four combinations of status × priority)
    * — completes the grouping-sets family next to q60's ROLLUP;
    * grouping() flags disambiguate the total rows, revenue through
    * the DECIMAL channel. */
  val q159 = Q(
    "q159_cube",
    (s, dir) => {
      Tables(s, dir, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast("decimal(18,6)")).cast("double")
            .as("revenue"),
          (grouping(col("o_orderstatus")) === 1).as("is_status_total"),
          (grouping(col("o_orderpriority")) === 1).as("is_priority_total"))
        .orderBy(col("o_orderstatus").asc_nulls_last,
          col("o_orderpriority").asc_nulls_last,
          col("is_status_total"), col("is_priority_total"))
    },
    Some("""
      SELECT o_orderstatus, o_orderpriority,
             count(*) AS n_orders,
             CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS VARCHAR)
               AS DOUBLE) AS revenue,
             grouping(o_orderstatus) = 1 AS is_status_total,
             grouping(o_orderpriority) = 1 AS is_priority_total
      FROM orders
      GROUP BY CUBE (o_orderstatus, o_orderpriority)
      ORDER BY o_orderstatus ASC NULLS LAST,
               o_orderpriority ASC NULLS LAST,
               is_status_total, is_priority_total"""),
    covers = Seq("A-grouping-sets", "A1"))

  /** NTILE quartile bucketing of customers by account balance
    * (deterministic total order: balance, then custkey) with
    * per-bucket stats — the decile/quartile segmentation idiom.
    * NOTE the global-sort shape: ntile is inherently a total order;
    * at 100 TB this runs as a range-partitioned sort (Spark's global
    * Window) or swaps to the q124 histogram quantiles when only the
    * BOUNDARIES matter. */
  val q160 = Q(
    "q160_ntile_quartiles",
    (s, dir) => {
      val w = Window.orderBy(col("c_acctbal"), col("c_custkey"))
      Tables(s, dir, "customer")
        .withColumn("bucket", ntile(4).over(w))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_customers"),
          min(col("c_acctbal")).as("min_bal"),
          max(col("c_acctbal")).as("max_bal"))
        .orderBy(col("bucket"))
    },
    Some("""
      WITH b AS (SELECT c_acctbal,
               ntile(4) OVER (ORDER BY c_acctbal, c_custkey) AS bucket
             FROM customer)
      SELECT CAST(bucket AS INTEGER) AS bucket, count(*) AS n_customers,
             min(c_acctbal) AS min_bal, max(c_acctbal) AS max_bal
      FROM b GROUP BY bucket ORDER BY bucket"""),
    covers = Seq("W2", "A1"))

  /** Gaps-and-islands: longest consecutive-day activity streak per
    * user over the events stream (day − row_number island key) — the
    * classic retention idiom; windows partition by user over distinct
    * active DAYS (bounded by the time domain). */
  val q161 = Q(
    "q161_activity_streaks",
    (s, dir) => {
      val days = Tables(s, dir, "events")
        .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
      val islands = days
        .withColumn("__rn", row_number().over(w))
        .withColumn("__grp", date_sub(col("day"), col("__rn")))
        .groupBy(col("user_id"), col("__grp"))
        .agg(count(lit(1)).as("__len"))
      islands.groupBy(col("user_id"))
        .agg(sum(col("__len")).as("n_active_days"),
          max(col("__len")).as("longest_streak"))
        .orderBy(col("user_id"))
    },
    Some("""
      WITH d AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
                 FROM events),
      i AS (SELECT user_id, day,
              day - CAST(row_number() OVER (PARTITION BY user_id
                ORDER BY day) AS INTEGER) AS grp
            FROM d),
      l AS (SELECT user_id, grp, count(*) AS len
            FROM i GROUP BY user_id, grp)
      SELECT user_id, CAST(sum(len) AS BIGINT) AS n_active_days,
             max(len) AS longest_streak
      FROM l GROUP BY user_id ORDER BY user_id"""),
    covers = Seq("W1", "TD-cohort-retention"))

  /** Recall@5 of the TRAINED IVF path (q128's train→index→probe) vs
    * the exact brute-force baseline — the q112 harness pointed at the
    * trained quantizer, closing the evaluation loop for the
    * k/iters/nProbe knobs. */
  val q162 = Q(
    "q162_ivf_recall",
    (s, dir) => {
      import s.implicits._
      val emb = Tables(s, dir, "embeddings")
      val qs = emb.filter($"vec_id" < 10)
      val exact = Dedup.annTopK(emb, qs, "vec_id", "embedding", 5)
        .select(col("id_q"), col("id_c"))
      val approx = graft.ops.KMeans.ivfSearch(emb, qs, k = 4, iters = 1,
          nProbe = 2, topK = 5)
        .select(col("id_q"), col("id_c")).withColumn("__hit", lit(1))
      exact.join(approx, Seq("id_q", "id_c"), "left")
        .groupBy(col("id_q"))
        .agg(count(col("__hit")).as("n_hits"), count(lit(1)).as("n_true"))
        .withColumn("recall",
          col("n_hits").cast("double") / col("n_true").cast("double"))
        .drop("n_true")
        .orderBy(col("id_q"))
    },
    Some {
      val dist =
        s"""list_reduce([(CAST(a.qv[i] AS DOUBLE) - c.m[i]) *
               (CAST(a.qv[i] AS DOUBLE) - c.m[i])
               for i in generate_series(1,64)], (x, y) -> x + y)"""
      s"""
      WITH $dkQuantized,
      $dkKmeansCtes,
      ex AS (SELECT id_q, id_c FROM (
          SELECT qs.vec_id AS id_q, cs.vec_id AS id_c,
                 row_number() OVER (PARTITION BY qs.vec_id ORDER BY
                   ${dkDot("qs", "cs")} / (sqrt(qs.nsq) * sqrt(cs.nsq)) DESC,
                   cs.vec_id ASC) AS rank
          FROM n qs JOIN n cs ON qs.vec_id < 10 AND qs.vec_id <> cs.vec_id)
        WHERE rank <= 5),
      ca AS (SELECT vec_id, cid AS cluster FROM
               (SELECT *, row_number() OVER (PARTITION BY vec_id
                  ORDER BY dist_sq, cid) AS rn FROM d2)
             WHERE rn = 1),
      pr AS (SELECT a.vec_id AS id_q, c.cid AS cluster,
               row_number() OVER (PARTITION BY a.vec_id
                 ORDER BY $dist, c.cid) AS prn
             FROM q a CROSS JOIN c1 c WHERE a.vec_id < 10),
      sc AS (SELECT p.id_q, ix.vec_id AS id_c,
               ${dkDot("qq", "cc")} / (sqrt(qq.nsq) * sqrt(cc.nsq)) AS cosine
             FROM (SELECT id_q, cluster FROM pr WHERE prn <= 2) p
             JOIN ca ix USING (cluster)
             JOIN n qq ON qq.vec_id = p.id_q
             JOIN n cc ON cc.vec_id = ix.vec_id
             WHERE ix.vec_id <> p.id_q),
      ap AS (SELECT id_q, id_c FROM
        (SELECT *, row_number() OVER (PARTITION BY id_q
           ORDER BY cosine DESC, id_c) AS rank FROM sc)
        WHERE rank <= 5)
      SELECT ex.id_q, count(ap.id_c) AS n_hits,
             CAST(count(ap.id_c) AS DOUBLE) / CAST(count(*) AS DOUBLE)
               AS recall
      FROM ex LEFT JOIN ap ON ex.id_q = ap.id_q AND ex.id_c = ap.id_c
      GROUP BY ex.id_q ORDER BY ex.id_q"""
    },
    covers = Seq("TD-ann-recall", "TD-ann-ivf", "TD-kmeans"))

  /** Per-DIMENSION embedding statistics: count, mean, variance per
    * coordinate — the feature-QA table (dead dimensions, scale
    * drift) read before quantization or projection. Variance via the
    * exact-integer identity (n·Σv² − (Σv)²)/n² on the quantized
    * values, dequantized by two final IEEE divisions — no float
    * summation anywhere. One posexplode + one map-side-combined
    * aggregation; 64 output rows.
    *
    * Count bound: n·Σv² is n²-scaled (|v| ≤ ~1000 ⇒ Σv² ≤ n·10^6),
    * so the int64 identity is exact for n ≲ 3×10^6 vectors; beyond
    * that, route the products through decimal(38,0) as
    * [[graft.ops.EmbeddingStats.labelOutliers]] does for its
    * label-level total. */
  val q163 = Q(
    "q163_dim_stats",
    (s, dir) => {
      import graft.functions.{VectorFunctions => V}
      val u = graft.ops.Compute.spread(Tables(s, dir, "embeddings"))
        .select(posexplode(V.quantize(col("embedding"))).as(Seq("pos", "v")))
      u.groupBy((col("pos") + 1).as("dim"))
        .agg(count(lit(1)).as("n_vecs"),
          sum(col("v")).as("__sv"),
          sum(col("v") * col("v")).as("__svv"))
        .select(col("dim"), col("n_vecs"),
          (col("__sv").cast("double") / col("n_vecs").cast("double") /
            lit(1000.0)).as("mean"),
          ((col("n_vecs") * col("__svv") - col("__sv") * col("__sv"))
            .cast("double") /
            (col("n_vecs") * col("n_vecs")).cast("double") /
            lit(1000000.0)).as("variance"))
        .orderBy(col("dim"))
    },
    Some("""
      WITH q2 AS (SELECT [CAST(round(CAST(x AS DOUBLE)*1000) AS BIGINT)
                          for x in embedding] AS qv FROM embeddings),
      u AS (SELECT i AS dim, qv[i] AS v
            FROM q2, generate_series(1,64) g(i)),
      a AS (SELECT dim, count(*) AS n_vecs, sum(v) AS sv,
              sum(v * v) AS svv
            FROM u GROUP BY dim)
      SELECT CAST(dim AS INTEGER) AS dim, n_vecs,
             CAST(sv AS DOUBLE) / CAST(n_vecs AS DOUBLE) / 1000.0 AS mean,
             CAST(n_vecs * svv - sv * sv AS DOUBLE)
               / CAST(n_vecs * n_vecs AS DOUBLE) / 1000000.0 AS variance
      FROM a ORDER BY dim"""),
    covers = Seq("TD-embedding-stats", "TD-quantization"))

  /** Edit-distance verification of the LSH candidates: Levenshtein
    * distance + normalized similarity for every candidate pair — the
    * character-level verify that catches small in-place edits n-gram
    * Jaccard dilutes (and the third verify lens next to Jaccard and
    * embedding cosine). Candidates come from the banded join as
    * always; the quadratic-in-length distance runs ONLY on candidate
    * pairs (never all-pairs), and both engines implement the same
    * classic DP so the integers hash-match. */
  val q164 = Q(
    "q164_edit_distance_pairs",
    (s, dir) => {
      val docs = Tables(s, dir, "documents")
      val sig = Dedup.minhashSignatures(docs, "doc_id", "text", n = 3, k = K)
      val cand = Dedup.lshCandidatePairs(sig, "doc_id", k = K,
        rows = BAND_ROWS).select(col("id_a"), col("id_b"))
      cand
        .join(docs.select(col("doc_id").as("id_a"), col("text").as("__ta")),
          "id_a")
        .join(docs.select(col("doc_id").as("id_b"), col("text").as("__tb")),
          "id_b")
        .select(col("id_a"), col("id_b"),
          levenshtein(col("__ta"), col("__tb")).cast("long").as("edit_dist"),
          greatest(length(col("__ta")), length(col("__tb"))).cast("long")
            .as("max_len"))
        .withColumn("edit_sim",
          lit(1.0) - col("edit_dist").cast("double") /
            col("max_len").cast("double"))
        .orderBy(col("id_a"), col("id_b"))
    },
    Some {
      val bandRows = (0 until K / BAND_ROWS).map { b =>
        val key = (b * BAND_ROWS until (b + 1) * BAND_ROWS)
          .map(i => s"CAST(mh$i AS VARCHAR)").mkString("||'_'||")
        s"SELECT doc_id, $b AS band, $key AS band_key FROM sig"
      }.mkString("\n        UNION ALL\n        ")
      s"""
      WITH $dkShingles,
      $dkSig,
      bands AS (
        $bandRows),
      cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
               FROM bands a JOIN bands b USING (band, band_key)
               WHERE a.doc_id < b.doc_id)
      SELECT id_a, id_b,
             CAST(levenshtein(da.text, db.text) AS BIGINT) AS edit_dist,
             CAST(greatest(length(da.text), length(db.text)) AS BIGINT)
               AS max_len,
             1.0 - CAST(levenshtein(da.text, db.text) AS DOUBLE)
               / CAST(greatest(length(da.text), length(db.text)) AS DOUBLE)
               AS edit_sim
      FROM cand JOIN documents da ON cand.id_a = da.doc_id
                JOIN documents db ON cand.id_b = db.doc_id
      ORDER BY id_a, id_b"""
    },
    covers = Seq("TD-dedup-edit", "TD-dedup-lsh"))

  /** Join-key SKEW report: the top-10 heaviest lineitem supplier keys
    * with their share of all rows — the diagnostic that decides when
    * a join needs salting ([[graft.ops.Skew]]) or AQE skew handling;
    * one map-side-combined count agg + TakeOrdered + a 1-row total
    * attach (declared). */
  val q165 = Q(
    "q165_skew_report",
    (s, dir) => {
      val li = Tables(s, dir, "lineitem")
      val counts = li.groupBy(col("l_suppkey")).agg(count(lit(1)).as("n"))
      val total = li.agg(count(lit(1)).as("__t"))
      counts.orderBy(col("n").desc, col("l_suppkey")).limit(10)
        .crossJoin(broadcast(total))
        .select(col("l_suppkey"), col("n"),
          (col("n").cast("double") / col("__t").cast("double")).as("share"))
        .orderBy(col("n").desc, col("l_suppkey"))
    },
    Some("""
      WITH c AS (SELECT l_suppkey, count(*) AS n FROM lineitem
                 GROUP BY l_suppkey),
      t AS (SELECT count(*) AS tt FROM lineitem)
      SELECT l_suppkey, n, CAST(n AS DOUBLE) / CAST(tt AS DOUBLE) AS share
      FROM (SELECT * FROM c ORDER BY n DESC, l_suppkey LIMIT 10), t
      ORDER BY n DESC, l_suppkey"""),
    covers = Seq("TD-skew-report", "A1"))

  /** REAL audio decode end to end ([[graft.ops.Multimodal.AudioCodec]],
    * `javax.sound.sampled` — in the JDK, the q76 move for sound):
    * synthetic 8 kHz PCM16 WAVs encoded per doc id, decoded through
    * the real WAV parser partition-parallel, per-clip amplitude
    * statistics vs the closed-form oracle (samples are a pure
    * function of (id, t), so DuckDB regenerates them with a range
    * join — no codec needed on the oracle side). */
  val q166 = Q(
    "q166_audio_decode",
    (s, dir) => {
      import s.implicits._
      import graft.ops.Multimodal
      val media = Tables(s, dir, "documents").select($"doc_id").as[Long]
        .map(id => Multimodal.MediaRow(id, "audio",
          Multimodal.AudioCodec.syntheticWav(id)))
      Multimodal.audioStats(media).toDF().orderBy($"media_id")
    },
    Some("""
      WITH m AS (SELECT doc_id,
                   CAST(1000 + (doc_id % 7) * 100 AS BIGINT) AS n
                 FROM documents),
      s AS (SELECT m.doc_id, ((t.t * 37 + m.doc_id * 13) % 65536) - 32768 AS v
            FROM m, range(0, 1600) t(t) WHERE t.t < m.n)
      SELECT doc_id AS media_id, CAST(8000 AS INTEGER) AS sample_rate,
             CAST(1 AS INTEGER) AS n_channels, CAST(16 AS INTEGER) AS bits,
             count(*) AS n_samples,
             CAST(max(abs(v)) AS BIGINT) AS peak,
             CAST(sum(v) AS DOUBLE) / CAST(count(*) AS DOUBLE)
               AS mean_amplitude,
             sqrt(CAST(sum(v * v) AS DOUBLE) / CAST(count(*) AS DOUBLE))
               AS rms
      FROM s GROUP BY doc_id ORDER BY media_id"""),
    covers = Seq("TD-multimodal"))

  /** Bigram-LM QUALITY score ([[graft.ops.NgramLm.bigramScore]]) —
    * the CCNet perplexity-filter signal: avg log-prob of each doc's
    * token transitions under the corpus' own add-one bigram model.
    * Each ln rides the DECIMAL(18,6) channel before the (exact)
    * decimal sum, so the score is engine-stable; perplexity =
    * e^(−avg_logp) stays with the consumer. */
  val q167 = Q(
    "q167_lm_score",
    (s, dir) => graft.ops.NgramLm.bigramScore(Tables(s, dir, "documents")),
    Some("""
      WITH toks AS (SELECT doc_id, string_split(text,' ') AS ws
                    FROM documents),
      bgp AS (SELECT doc_id, ws[i]||' '||ws[i+1] AS bg, ws[i] AS w1
              FROM (SELECT doc_id, ws,
                      unnest(generate_series(1, len(ws)-1)) AS i
                    FROM toks WHERE len(ws) >= 2)),
      bi AS (SELECT bg, count(*) AS c_bi FROM bgp GROUP BY bg),
      uni AS (SELECT tok, count(*) AS c_uni FROM
                (SELECT unnest(ws) AS tok FROM toks) GROUP BY tok),
      v AS (SELECT count(*) AS vv FROM uni),
      inst AS (SELECT doc_id,
                 CAST(ln((CAST(c_bi AS DOUBLE) + 1.0)
                   / (CAST(c_uni AS DOUBLE) + CAST(vv AS DOUBLE)))
                   AS DECIMAL(18,6)) AS lp
               FROM bgp JOIN bi USING (bg)
                        JOIN uni ON bgp.w1 = uni.tok, v),
      per AS (SELECT doc_id, count(*) AS nb, sum(lp) AS slp
              FROM inst GROUP BY doc_id)
      SELECT d.doc_id, CAST(coalesce(nb, 0) AS BIGINT) AS n_bigrams,
             CASE WHEN coalesce(nb, 0) = 0 THEN 0.0
                  ELSE CAST(CAST(slp AS VARCHAR) AS DOUBLE)
                    / CAST(nb AS DOUBLE) END AS avg_logp
      FROM documents d LEFT JOIN per USING (doc_id) ORDER BY doc_id"""),
    covers = Seq("TD-lm-score", "TD-text-quality"))

  /** PRODUCT QUANTIZATION codes ([[graft.ops.ProductQuantizer]]):
    * 64 dims → 4 subspaces of 16, a k=4 exact-integer Lloyd codebook
    * per subspace (one update round), every vector encoded to its 4
    * nearest-centroid codes + per-subspace reconstruction error —
    * the IVF-PQ compression stage, oracle-gated through the same
    * kmeans parity the q127/q128/q162 family proved. */
  val q168 = Q(
    "q168_pq_codes",
    (s, dir) => {
      graft.ops.ProductQuantizer.encode(Tables(s, dir, "embeddings"),
          dim = 64, m = 4, k = 4, iters = 1)
        .orderBy(col("vec_id"), col("sub"))
    },
    Some {
      val subCtes = (0 until 4).map { sb =>
        val lo = sb * 16
        val dist =
          s"""list_reduce([(CAST(a.qv[$lo + j] AS DOUBLE) - c.m[j]) *
                 (CAST(a.qv[$lo + j] AS DOUBLE) - c.m[j])
                 for j in generate_series(1,16)], (x, y) -> x + y)"""
        s"""init$sb AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1
                     AS BIGINT) AS cid,
                     [CAST(qv[$lo + j] AS DOUBLE)
                      for j in generate_series(1,16)] AS m
                   FROM (SELECT vec_id, qv FROM q ORDER BY vec_id LIMIT 4)),
      d1$sb AS (SELECT a.vec_id, c.cid, $dist AS dist_sq
             FROM q a CROSS JOIN init$sb c),
      a1$sb AS (SELECT vec_id, cid FROM
               (SELECT *, row_number() OVER (PARTITION BY vec_id
                  ORDER BY dist_sq, cid) AS rn FROM d1$sb)
             WHERE rn = 1),
      s1$sb AS (SELECT a1$sb.cid, j, sum(q.qv[$lo + j]) AS sm, count(*) AS n
             FROM a1$sb JOIN q USING (vec_id)
             CROSS JOIN generate_series(1,16) g(j)
             GROUP BY a1$sb.cid, j),
      u1$sb AS (SELECT cid, list(CAST(sm AS DOUBLE) / CAST(n AS DOUBLE)
                              ORDER BY j) AS m
             FROM s1$sb GROUP BY cid),
      c1$sb AS (SELECT init$sb.cid, coalesce(u1$sb.m, init$sb.m) AS m
             FROM init$sb LEFT JOIN u1$sb USING (cid)),
      d2$sb AS (SELECT a.vec_id, c.cid, $dist AS dist_sq
             FROM q a CROSS JOIN c1$sb c),
      a2$sb AS (SELECT vec_id, $sb AS sub, cid AS code, dist_sq FROM
               (SELECT *, row_number() OVER (PARTITION BY vec_id
                  ORDER BY dist_sq, cid) AS rn FROM d2$sb)
             WHERE rn = 1)"""
      }.mkString(",\n      ")
      val union = (0 until 4).map(sb => s"SELECT * FROM a2$sb")
        .mkString("\n        UNION ALL\n        ")
      s"""
      WITH $dkQuantized,
      $subCtes
      SELECT vec_id, CAST(sub AS INTEGER) AS sub,
             CAST(code AS BIGINT) AS code, dist_sq
      FROM (
        $union)
      ORDER BY vec_id, sub"""
    },
    covers = Seq("TD-pq", "TD-quantization", "TD-kmeans"))

  /** ADC top-k search over the q168 PQ codes
    * ([[graft.ops.ProductQuantizer.adcSearch]]) — the IVF-PQ QUERY
    * path: corpus vectors live only as their 4 codes, each query
    * computes one k·m lookup table against the frozen codebooks, and
    * candidate distances are code-lookup sums (sub-order fold). The
    * oracle replays codebook training, corpus encoding, the LUT, and
    * the ranked lookup-sum end to end. */
  val q170 = Q(
    "q170_pq_adc_search",
    (s, dir) => {
      import s.implicits._
      val emb = Tables(s, dir, "embeddings")
      graft.ops.ProductQuantizer.adcSearch(emb,
          emb.filter($"vec_id" < 10), dim = 64, m = 4, k = 4, iters = 1,
          topK = 5)
        .orderBy(col("id_q"), col("rank"))
    },
    Some {
      val subCtes = (0 until 4).map { sb =>
        val lo = sb * 16
        val dist =
          s"""list_reduce([(CAST(a.qv[$lo + j] AS DOUBLE) - c.m[j]) *
                 (CAST(a.qv[$lo + j] AS DOUBLE) - c.m[j])
                 for j in generate_series(1,16)], (x, y) -> x + y)"""
        s"""init$sb AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1
                     AS BIGINT) AS cid,
                     [CAST(qv[$lo + j] AS DOUBLE)
                      for j in generate_series(1,16)] AS m
                   FROM (SELECT vec_id, qv FROM q ORDER BY vec_id LIMIT 4)),
      d1$sb AS (SELECT a.vec_id, c.cid, $dist AS dist_sq
             FROM q a CROSS JOIN init$sb c),
      a1$sb AS (SELECT vec_id, cid FROM
               (SELECT *, row_number() OVER (PARTITION BY vec_id
                  ORDER BY dist_sq, cid) AS rn FROM d1$sb)
             WHERE rn = 1),
      s1$sb AS (SELECT a1$sb.cid, j, sum(q.qv[$lo + j]) AS sm, count(*) AS n
             FROM a1$sb JOIN q USING (vec_id)
             CROSS JOIN generate_series(1,16) g(j)
             GROUP BY a1$sb.cid, j),
      u1$sb AS (SELECT cid, list(CAST(sm AS DOUBLE) / CAST(n AS DOUBLE)
                              ORDER BY j) AS m
             FROM s1$sb GROUP BY cid),
      c1$sb AS (SELECT init$sb.cid, coalesce(u1$sb.m, init$sb.m) AS m
             FROM init$sb LEFT JOIN u1$sb USING (cid)),
      cd$sb AS (SELECT vec_id AS id_c, cid AS code FROM
               (SELECT a.vec_id, c.cid, $dist AS dist_sq,
                  row_number() OVER (PARTITION BY a.vec_id
                    ORDER BY $dist, c.cid) AS rn
                FROM q a CROSS JOIN c1$sb c)
             WHERE rn = 1),
      lut$sb AS (SELECT a.vec_id AS id_q, c.cid AS code, $dist AS d
             FROM q a CROSS JOIN c1$sb c WHERE a.vec_id < 10),
      t$sb AS (SELECT l.id_q, cd$sb.id_c, $sb AS sub, l.d
             FROM cd$sb JOIN lut$sb l USING (code))"""
      }.mkString(",\n      ")
      val union = (0 until 4).map(sb => s"SELECT * FROM t$sb")
        .mkString("\n        UNION ALL\n        ")
      s"""
      WITH $dkQuantized,
      $subCtes,
      terms AS (
        $union),
      ag AS (SELECT id_q, id_c,
               list_reduce(list(d ORDER BY sub), (x, y) -> x + y)
                 AS dist_est
             FROM terms WHERE id_q <> id_c GROUP BY id_q, id_c),
      rk AS (SELECT id_q, id_c, dist_est,
               row_number() OVER (PARTITION BY id_q
                 ORDER BY dist_est, id_c) AS rn
             FROM ag)
      SELECT id_q, CAST(rn AS INTEGER) AS rank, id_c, dist_est
      FROM rk WHERE rn <= 5 ORDER BY id_q, rank"""
    },
    covers = Seq("TD-pq", "TD-ann-ivf"))

  /** Language-ID CONFUSION MATRIX — q20's per-doc agreement rolled up
    * to the (labeled lang × predicted lang) eval table with per-label
    * shares: the classifier-eval harness for the heuristic langid
    * (which cells leak which languages into 'und'). Two tiny aggs +
    * one broadcast join on a ≤#langs-row table. */
  val q169 = Q(
    "q169_langid_confusion",
    (s, dir) => {
      val scored = Tables(s, dir, "documents")
        .select(col("lang"), T.langId(col("text")).as("lang_pred"))
      val m = scored.groupBy(col("lang"), col("lang_pred"))
        .agg(count(lit(1)).as("n"))
      val tot = scored.groupBy(col("lang")).agg(count(lit(1)).as("__t"))
      m.join(broadcast(tot), Seq("lang"))
        .select(col("lang"), col("lang_pred"), col("n"),
          (col("n").cast("double") / col("__t").cast("double")).as("share"))
        .orderBy(col("lang"), col("lang_pred"))
    },
    Some {
      val hits = T.lexicons.map { case (lang, ws) =>
        s"len([t for t in string_split(text,' ') if t IN (${ws.map(w => s"'$w'").mkString(",")})]) AS h_$lang"
      }.mkString(",\n               ")
      val langs = T.lexicons.map(_._1)
      val mx = s"greatest(${langs.map("h_" + _).mkString(",")})"
      val cases = langs.map(l => s"WHEN h_$l = $mx AND $mx > 0 THEN '$l'")
        .mkString(" ")
      s"""
      WITH scored AS (SELECT lang,
               CASE $cases ELSE 'und' END AS lang_pred
             FROM (SELECT lang, text, $hits FROM documents)),
      m AS (SELECT lang, lang_pred, count(*) AS n
            FROM scored GROUP BY lang, lang_pred),
      tot AS (SELECT lang, count(*) AS t FROM scored GROUP BY lang)
      SELECT m.lang, lang_pred, n,
             CAST(n AS DOUBLE) / CAST(t AS DOUBLE) AS share
      FROM m JOIN tot ON m.lang = tot.lang
      ORDER BY m.lang, lang_pred"""
    },
    covers = Seq("TD-langid", "TD-model-eval"))

  /** DSIR importance weights ([[graft.ops.NgramLm.importanceWeights]],
    * Xie et al. 2023): every doc scored under the src0 TARGET bigram
    * model and the general corpus model; importance = target_logp −
    * corpus_logp, the importance-resampling ranking key. Unseen
    * transitions back off to the add-one floor via LEFT joins. */
  val q171 = Q(
    "q171_importance_weights",
    (s, dir) => {
      val docs = Tables(s, dir, "documents")
      graft.ops.NgramLm.importanceWeights(
        docs.filter(col("source") === "src0"), docs)
    },
    Some("""
      WITH toks AS (SELECT doc_id, string_split(text,' ') AS ws
                    FROM documents),
      bgp AS (SELECT doc_id, ws[i]||' '||ws[i+1] AS bg, ws[i] AS w1
              FROM (SELECT doc_id, ws,
                      unnest(generate_series(1, len(ws)-1)) AS i
                    FROM toks WHERE len(ws) >= 2)),
      tdoc AS (SELECT doc_id FROM documents WHERE source = 'src0'),
      tbgp AS (SELECT bgp.* FROM bgp JOIN tdoc USING (doc_id)),
      tbi AS (SELECT bg, count(*) AS c_bi FROM tbgp GROUP BY bg),
      tuni AS (SELECT tok, count(*) AS c_uni FROM
                (SELECT unnest(ws) AS tok FROM toks JOIN tdoc USING (doc_id))
               GROUP BY tok),
      tv AS (SELECT count(*) AS vv FROM tuni),
      cbi AS (SELECT bg, count(*) AS c_bi FROM bgp GROUP BY bg),
      cuni AS (SELECT tok, count(*) AS c_uni FROM
                (SELECT unnest(ws) AS tok FROM toks) GROUP BY tok),
      cv AS (SELECT count(*) AS vv FROM cuni),
      tin AS (SELECT doc_id,
                CAST(ln((CAST(coalesce(c_bi, 0) AS DOUBLE) + 1.0)
                  / (CAST(coalesce(c_uni, 0) AS DOUBLE)
                     + CAST(vv AS DOUBLE)))
                  AS DECIMAL(18,6)) AS lp
              FROM bgp LEFT JOIN tbi USING (bg)
                       LEFT JOIN tuni ON bgp.w1 = tuni.tok, tv),
      tper AS (SELECT doc_id, count(*) AS nb, sum(lp) AS slp
               FROM tin GROUP BY doc_id),
      cin AS (SELECT doc_id,
                CAST(ln((CAST(c_bi AS DOUBLE) + 1.0)
                  / (CAST(c_uni AS DOUBLE) + CAST(vv AS DOUBLE)))
                  AS DECIMAL(18,6)) AS lp
              FROM bgp JOIN cbi USING (bg)
                       JOIN cuni ON bgp.w1 = cuni.tok, cv),
      cper AS (SELECT doc_id, count(*) AS nb, sum(lp) AS slp
               FROM cin GROUP BY doc_id),
      sc AS (SELECT d.doc_id,
               CAST(coalesce(cper.nb, 0) AS BIGINT) AS n_bigrams,
               CASE WHEN coalesce(tper.nb, 0) = 0 THEN 0.0
                    ELSE CAST(CAST(tper.slp AS VARCHAR) AS DOUBLE)
                      / CAST(tper.nb AS DOUBLE) END AS target_logp,
               CASE WHEN coalesce(cper.nb, 0) = 0 THEN 0.0
                    ELSE CAST(CAST(cper.slp AS VARCHAR) AS DOUBLE)
                      / CAST(cper.nb AS DOUBLE) END AS corpus_logp
             FROM documents d LEFT JOIN tper USING (doc_id)
                              LEFT JOIN cper USING (doc_id))
      SELECT doc_id, n_bigrams, target_logp, corpus_logp,
             target_logp - corpus_logp AS importance
      FROM sc ORDER BY doc_id"""),
    covers = Seq("TD-importance-sampling", "TD-lm-score"))

  /** Oracle fragment: the BPE training chain — word-type counts,
    * char-level segmentation, then `n` unrolled find-best-pair /
    * merge-everywhere rounds (kept in lockstep with
    * [[graft.ops.BpeTrainer.merges]]: '|'-wrapped symbols, literal
    * replace, (count DESC, l, r) winner). */
  private def dkBpeChain(n: Int): String = {
    val rounds = (1 to n).map { i =>
      s"""s$i AS (SELECT wc, s, unnest(generate_series(1, len(s)-1)) AS j
             FROM (SELECT wc, string_split(substr(ws, 2, length(ws)-2),
                     '||') AS s
                   FROM v${i - 1})
             WHERE len(s) >= 2),
      p$i AS (SELECT s[j] AS l, s[j+1] AS r,
               CAST(sum(wc) AS BIGINT) AS pair_count
             FROM s$i GROUP BY 1, 2),
      b$i AS (SELECT $i AS iteration, l, r, pair_count FROM p$i
             ORDER BY pair_count DESC, l, r LIMIT 1),
      v$i AS (SELECT w, wc,
               replace(ws, '|'||l||'||'||r||'|', '|'||l||r||'|') AS ws
             FROM v${i - 1}, b$i)"""
    }.mkString(",\n      ")
    s"""w0 AS (SELECT w, count(*) AS wc FROM
             (SELECT unnest(string_split(text,' ')) AS w FROM documents)
             WHERE w <> '' AND w NOT LIKE '%|%' GROUP BY w),
      v0 AS (SELECT w, wc, regexp_replace(w, '(.)', '|\\1|', 'g') AS ws
             FROM w0),
      $rounds"""
  }

  /** BPE merge LEARNING ([[graft.ops.BpeTrainer.merges]], Sennrich et
    * al. 2016) — the real tokenizer-training loop: 5 rounds of
    * most-frequent-adjacent-pair merging over the corpus' word types,
    * each round's winner + count as the learned merge table. Training
    * is vocabulary-bounded (the corpus is touched once); integers and
    * string rewrites only — no floats anywhere. */
  val q172 = Q(
    "q172_bpe_merges",
    (s, dir) => graft.ops.BpeTrainer.merges(
      Tables(s, dir, "documents"), nMerges = 5),
    Some(s"""
      WITH ${dkBpeChain(5)}
      SELECT CAST(iteration AS INTEGER) AS iteration, l AS merge_left,
             r AS merge_right, pair_count
      FROM (SELECT * FROM b1 UNION ALL SELECT * FROM b2
            UNION ALL SELECT * FROM b3 UNION ALL SELECT * FROM b4
            UNION ALL SELECT * FROM b5)
      ORDER BY iteration"""),
    covers = Seq("TD-bpe-train", "TD-token-count"))

  /** Fertility under the LEARNED tokenizer
    * ([[graft.ops.BpeTrainer.segmentCounts]]): apply q172's 5 merges
    * in learn order to every word, per-doc subword counts — q138's
    * diagnostic with the trained BPE instead of the fixed alphabet
    * proxy, closing the tokenizer loop train → segment → measure. */
  val q173 = Q(
    "q173_bpe_fertility",
    (s, dir) => {
      val docs = Tables(s, dir, "documents")
      graft.ops.BpeTrainer.segmentCounts(docs,
        graft.ops.BpeTrainer.merges(docs, nMerges = 5))
    },
    Some(s"""
      WITH ${dkBpeChain(5)},
      seg AS (SELECT w, CAST(len(string_split(substr(ws, 2,
                length(ws)-2), '||')) AS BIGINT) AS n_sub
              FROM v5),
      dtoks AS (SELECT doc_id, w FROM
                 (SELECT doc_id, unnest(string_split(text,' ')) AS w
                  FROM documents)
                WHERE w <> '' AND w NOT LIKE '%|%'),
      per AS (SELECT doc_id, count(*) AS n_words,
                CAST(sum(n_sub) AS BIGINT) AS n_subwords
              FROM dtoks JOIN seg USING (w) GROUP BY doc_id)
      SELECT doc_id, n_words, n_subwords,
             CAST(n_subwords AS DOUBLE) / CAST(n_words AS DOUBLE)
               AS fertility
      FROM per ORDER BY doc_id"""),
    covers = Seq("TD-bpe-train", "TD-token-count"))

  /** Training-order materialization ([[graft.ops.MixtureOrder]]):
    * equal-epoch stride interleave — doc r of n from each source at
    * integer virtual time r·10^6 div n, read order (vt, source,
    * doc_id); the deterministic, resumable "shuffle the sources
    * together" between a mixing recipe (q117/q130) and the loader. */
  val q174 = Q(
    "q174_mixture_order",
    (s, dir) => graft.ops.MixtureOrder.interleave(
      Tables(s, dir, "documents")),
    Some("""
      WITH r AS (SELECT doc_id, source,
               CAST(row_number() OVER (PARTITION BY source
                 ORDER BY doc_id) AS BIGINT) AS src_rank
             FROM documents),
      c AS (SELECT source, count(*) AS n FROM documents GROUP BY source)
      SELECT doc_id, r.source, src_rank,
             CAST((src_rank * 1000000) // n AS BIGINT) AS vt
      FROM r JOIN c ON r.source = c.source
      ORDER BY vt, r.source, doc_id"""),
    covers = Seq("TD-mixture-order", "TD-mixture-temperature"))

  /** Hard-negative mining ([[graft.ops.ContrastiveMining.hardPairs]]):
    * per sampled anchor, the most-similar same-label member (the
    * positive) and most-similar different-label member (the hard
    * negative) — the triplet-building step of contrastive embedding
    * training, on the shared exact-cosine channel. Anchors broadcast
    * (the q112 sampled protocol); full-corpus mining swaps the
    * candidate source to banded LSH. */
  val q175 = Q(
    "q175_hard_negatives",
    (s, dir) => {
      import s.implicits._
      val emb = Tables(s, dir, "embeddings")
      graft.ops.ContrastiveMining.hardPairs(emb, emb.filter($"vec_id" < 20))
    },
    Some(s"""
      WITH q2 AS (SELECT vec_id, label,
               [CAST(round(CAST(x AS DOUBLE)*1000) AS BIGINT)
                for x in embedding] AS qv FROM embeddings),
      n2 AS (SELECT vec_id, label, qv,
               list_aggregate([qv[i]*qv[i]
                 for i in generate_series(1,64)],'sum') AS nsq
             FROM q2),
      sc AS (SELECT a.vec_id AS id_q, a.label AS lab_q,
               b.vec_id AS id_c, b.label AS lab_c,
               ${dkDot("a", "b")} / (sqrt(a.nsq) * sqrt(b.nsq)) AS cosine
             FROM n2 a JOIN n2 b ON a.vec_id <> b.vec_id
             WHERE a.vec_id < 20),
      pos AS (SELECT id_q, lab_q AS label, id_c AS id_pos,
                cosine AS cos_pos
              FROM (SELECT *, row_number() OVER (PARTITION BY id_q
                      ORDER BY cosine DESC, id_c) AS rn
                    FROM sc WHERE lab_q = lab_c) WHERE rn = 1),
      neg AS (SELECT id_q, id_c AS id_neg, cosine AS cos_neg
              FROM (SELECT *, row_number() OVER (PARTITION BY id_q
                      ORDER BY cosine DESC, id_c) AS rn
                    FROM sc WHERE lab_q <> lab_c) WHERE rn = 1)
      SELECT pos.id_q, label, id_pos, cos_pos, id_neg, cos_neg
      FROM pos JOIN neg ON pos.id_q = neg.id_q
      ORDER BY pos.id_q"""),
    covers = Seq("TD-hard-negatives", "TD-embedding-stats"))

  /** Exact embedding COVARIANCE matrix
    * ([[graft.ops.EmbeddingStats.covarianceMatrix]]): upper-triangle
    * (dim_i, dim_j, n, cov) via the integer identity
    * (n·Σxy − Σx·Σy)/n² on the quantized grid — the whitening/PCA
    * prep an eigen solver consumes; q163's per-dim variance is this
    * table's diagonal. Distributed Gram build: one double-explode
    * pass map-side combines into d(d+1)/2 cells. */
  val q176 = Q(
    "q176_embedding_covariance",
    (s, dir) => graft.ops.EmbeddingStats.covarianceMatrix(
      Tables(s, dir, "embeddings")),
    Some("""
      WITH q2 AS (SELECT [CAST(round(CAST(x AS DOUBLE)*1000) AS BIGINT)
                          for x in embedding] AS qv FROM embeddings),
      pairs AS (SELECT i, j, qv[i] AS x, qv[j] AS y
                FROM q2, generate_series(1,64) g(i),
                     generate_series(1,64) h(j)
                WHERE j >= i),
      a AS (SELECT i AS dim_i, j AS dim_j, count(*) AS n,
              sum(x) AS sx, sum(y) AS sy, sum(x*y) AS sxy
            FROM pairs GROUP BY i, j)
      SELECT CAST(dim_i AS INTEGER) AS dim_i,
             CAST(dim_j AS INTEGER) AS dim_j, n,
             CAST(n * sxy - sx * sy AS DOUBLE)
               / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) / 1000000.0
               AS cov
      FROM a ORDER BY dim_i, dim_j"""),
    covers = Seq("TD-embedding-stats", "TD-quantization"))

  /** Recall@5 of the PQ/ADC path vs the exact cosine baseline — the
    * q112/q162 harness pointed at q170's compressed-domain search:
    * how much the m=4×k=4 codebook loses, the number an IVF-PQ
    * deployment tunes (m, k) against. Exact side is the declared
    * brute baseline on sampled queries (the ANN-benchmark protocol). */
  val q177 = Q(
    "q177_pq_recall",
    (s, dir) => {
      import s.implicits._
      val emb = Tables(s, dir, "embeddings")
      val qs = emb.filter($"vec_id" < 10)
      val exact = Dedup.annTopK(emb, qs, "vec_id", "embedding", 5)
        .select(col("id_q"), col("id_c"))
      val approx = graft.ops.ProductQuantizer.adcSearch(emb, qs, dim = 64,
          m = 4, k = 4, iters = 1, topK = 5)
        .select(col("id_q"), col("id_c")).withColumn("__hit", lit(1))
      exact.join(approx, Seq("id_q", "id_c"), "left")
        .groupBy(col("id_q"))
        .agg(count(col("__hit")).as("n_hits"), count(lit(1)).as("n_true"))
        .withColumn("recall",
          col("n_hits").cast("double") / col("n_true").cast("double"))
        .drop("n_true")
        .orderBy(col("id_q"))
    },
    Some {
      val subCtes = (0 until 4).map { sb =>
        val lo = sb * 16
        val dist =
          s"""list_reduce([(CAST(a.qv[$lo + j] AS DOUBLE) - c.m[j]) *
                 (CAST(a.qv[$lo + j] AS DOUBLE) - c.m[j])
                 for j in generate_series(1,16)], (x, y) -> x + y)"""
        s"""init$sb AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1
                     AS BIGINT) AS cid,
                     [CAST(qv[$lo + j] AS DOUBLE)
                      for j in generate_series(1,16)] AS m
                   FROM (SELECT vec_id, qv FROM q ORDER BY vec_id LIMIT 4)),
      d1$sb AS (SELECT a.vec_id, c.cid, $dist AS dist_sq
             FROM q a CROSS JOIN init$sb c),
      a1$sb AS (SELECT vec_id, cid FROM
               (SELECT *, row_number() OVER (PARTITION BY vec_id
                  ORDER BY dist_sq, cid) AS rn FROM d1$sb)
             WHERE rn = 1),
      s1$sb AS (SELECT a1$sb.cid, j, sum(q.qv[$lo + j]) AS sm, count(*) AS n
             FROM a1$sb JOIN q USING (vec_id)
             CROSS JOIN generate_series(1,16) g(j)
             GROUP BY a1$sb.cid, j),
      u1$sb AS (SELECT cid, list(CAST(sm AS DOUBLE) / CAST(n AS DOUBLE)
                              ORDER BY j) AS m
             FROM s1$sb GROUP BY cid),
      c1$sb AS (SELECT init$sb.cid, coalesce(u1$sb.m, init$sb.m) AS m
             FROM init$sb LEFT JOIN u1$sb USING (cid)),
      cd$sb AS (SELECT vec_id AS id_c, cid AS code FROM
               (SELECT a.vec_id, c.cid, $dist AS dist_sq,
                  row_number() OVER (PARTITION BY a.vec_id
                    ORDER BY $dist, c.cid) AS rn
                FROM q a CROSS JOIN c1$sb c)
             WHERE rn = 1),
      lut$sb AS (SELECT a.vec_id AS id_q, c.cid AS code, $dist AS d
             FROM q a CROSS JOIN c1$sb c WHERE a.vec_id < 10),
      t$sb AS (SELECT l.id_q, cd$sb.id_c, $sb AS sub, l.d
             FROM cd$sb JOIN lut$sb l USING (code))"""
      }.mkString(",\n      ")
      val union = (0 until 4).map(sb => s"SELECT * FROM t$sb")
        .mkString("\n        UNION ALL\n        ")
      s"""
      WITH $dkQuantized,
      $subCtes,
      terms AS (
        $union),
      ag AS (SELECT id_q, id_c,
               list_reduce(list(d ORDER BY sub), (x, y) -> x + y)
                 AS dist_est
             FROM terms WHERE id_q <> id_c GROUP BY id_q, id_c),
      ap AS (SELECT id_q, id_c FROM
               (SELECT id_q, id_c,
                  row_number() OVER (PARTITION BY id_q
                    ORDER BY dist_est, id_c) AS rn
                FROM ag) WHERE rn <= 5),
      ex AS (SELECT id_q, id_c FROM (
          SELECT a.vec_id AS id_q, b.vec_id AS id_c,
                 row_number() OVER (PARTITION BY a.vec_id
                   ORDER BY ${dkDot("a", "b")}
                     / (sqrt(a.nsq) * sqrt(b.nsq)) DESC, b.vec_id) AS rn
          FROM n a JOIN n b ON a.vec_id <> b.vec_id
          WHERE a.vec_id < 10) WHERE rn <= 5)
      SELECT ex.id_q, CAST(count(ap.id_c) AS BIGINT) AS n_hits,
             CAST(count(ap.id_c) AS DOUBLE) / CAST(count(*) AS DOUBLE)
               AS recall
      FROM ex LEFT JOIN ap ON ex.id_q = ap.id_q AND ex.id_c = ap.id_c
      GROUP BY ex.id_q ORDER BY ex.id_q"""
    },
    covers = Seq("TD-pq", "TD-ann-recall"))

  /** QUALITY-AWARE dedup keeper: q77's LSH near-dup clusters with the
    * realistic keep policy — the LONGEST member survives (most
    * content retained), ties on id — instead of min-id. The policy
    * swap is a window re-rank over the same cluster table
    * ([[Dedup.duplicateClusters]]), which is exactly how production
    * dedup separates clustering from curation policy; any score
    * column (q167's LM score, q153's classifier) drops into the same
    * ORDER BY. */
  val q178 = Q(
    "q178_dedup_keep_best",
    (s, dir) => {
      val docs = Tables(s, dir, "documents")
      val sig = Dedup.minhashSignatures(docs, "doc_id", "text", n = 3, k = K)
      val pairs = Dedup.lshCandidatePairs(sig, "doc_id", k = K,
        rows = BAND_ROWS).localCheckpoint()
      val ids = pairs.select(col("id_a").as("doc_id"))
        .unionByName(pairs.select(col("id_b").as("doc_id"))).distinct()
      val clusters = Dedup.duplicateClusters(ids, "doc_id", pairs)
      graft.CacheTracker.releaseCheckpoint(pairs)
      val scored = clusters.join(
        docs.select(col("doc_id"), T.tokenCount(col("text")).cast("long")
          .as("n_tokens")), Seq("doc_id"))
      val w = Window.partitionBy(col("cluster"))
        .orderBy(col("n_tokens").desc, col("doc_id"))
      scored.withColumn("keep", row_number().over(w) === 1)
        .select(col("doc_id"), col("cluster"), col("n_tokens"), col("keep"))
        .orderBy(col("doc_id"))
    },
    Some {
      val bandRows = (0 until K / BAND_ROWS).map { b =>
        val key = (b * BAND_ROWS until (b + 1) * BAND_ROWS)
          .map(i => s"CAST(mh$i AS VARCHAR)").mkString("||'_'||")
        s"SELECT doc_id, $b AS band, $key AS band_key FROM sig"
      }.mkString("\n        UNION ALL\n        ")
      s"""
      WITH RECURSIVE $dkShingles,
      $dkSig,
      bands AS (
        $bandRows),
      pairs AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bands a JOIN bands b USING(band, band_key)
        WHERE a.doc_id < b.doc_id),
      edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
                UNION ALL
                SELECT id_b AS src, id_a AS dst FROM pairs),
      nodes AS (SELECT DISTINCT src AS node FROM edges),
      reach AS (
        SELECT node, node AS m FROM nodes
        UNION
        SELECT e.dst AS node, r.m
        FROM reach r JOIN edges e ON e.src = r.node
      ),
      cl AS (SELECT node AS doc_id, MIN(m) AS cluster
             FROM reach GROUP BY node),
      sc AS (SELECT cl.doc_id, cluster,
               CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens
             FROM cl JOIN documents USING (doc_id))
      SELECT doc_id, cluster, n_tokens,
             row_number() OVER (PARTITION BY cluster
               ORDER BY n_tokens DESC, doc_id) = 1 AS keep
      FROM sc ORDER BY doc_id"""
    },
    covers = Seq("TD-dedup-clusters", "TD-curation-policy"))

  /** Oracle fragment: the residual-PQ chain over table `src` (must
    * expose (vec_id, qv) with integer qv) — per-subspace k=4/iters=1
    * Lloyd codebooks + final code assignment, kept in lockstep with
    * [[graft.ops.ProductQuantizer]]'s grouped trainer. CTE names are
    * prefixed `r` so the fragment composes with the coarse-kmeans
    * CTEs in the same WITH. */
  /** Per-subspace residual-PQ oracle chain, split by TRAIN relation
    * (codebook Lloyd rounds → rc1*) and ENCODE relation (final rcd*
    * code assignment) — identical when both are the same; q186 trains
    * on batch-0 residuals and encodes every residual. Both must be
    * CTE names. */
  private def dkPqResChainSrc(train: String, enc: String): String =
    (0 until 4).map { sb =>
      val lo = sb * 16
      val dist =
        s"""list_reduce([(CAST(a.qv[$lo + j] AS DOUBLE) - c.m[j]) *
               (CAST(a.qv[$lo + j] AS DOUBLE) - c.m[j])
               for j in generate_series(1,16)], (x, y) -> x + y)"""
      s"""rinit$sb AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1
                   AS BIGINT) AS cid,
                   [CAST(qv[$lo + j] AS DOUBLE)
                    for j in generate_series(1,16)] AS m
                 FROM (SELECT vec_id, qv FROM $train ORDER BY vec_id LIMIT 4)),
      rd1$sb AS (SELECT a.vec_id, c.cid, $dist AS dist_sq
             FROM $train a CROSS JOIN rinit$sb c),
      ra1$sb AS (SELECT vec_id, cid FROM
               (SELECT *, row_number() OVER (PARTITION BY vec_id
                  ORDER BY dist_sq, cid) AS rn FROM rd1$sb)
             WHERE rn = 1),
      rs1$sb AS (SELECT ra1$sb.cid, j, sum($train.qv[$lo + j]) AS sm,
               count(*) AS n
             FROM ra1$sb JOIN $train USING (vec_id)
             CROSS JOIN generate_series(1,16) g(j)
             GROUP BY ra1$sb.cid, j),
      ru1$sb AS (SELECT cid, list(CAST(sm AS DOUBLE) / CAST(n AS DOUBLE)
                              ORDER BY j) AS m
             FROM rs1$sb GROUP BY cid),
      rc1$sb AS (SELECT rinit$sb.cid, coalesce(ru1$sb.m, rinit$sb.m) AS m
             FROM rinit$sb LEFT JOIN ru1$sb USING (cid)),
      rcd$sb AS (SELECT vec_id, $sb AS sub, cid AS code, dist_sq FROM
               (SELECT a.vec_id, c.cid, $dist AS dist_sq,
                  row_number() OVER (PARTITION BY a.vec_id
                    ORDER BY $dist, c.cid) AS rn
                FROM $enc a CROSS JOIN rc1$sb c)
             WHERE rn = 1)"""
    }.mkString(",\n      ")

  private def dkPqResChain(src: String): String = dkPqResChainSrc(src, src)

  /** Oracle fragment: coarse cell assignment + integer residuals —
    * requires dkKmeansCtes (c1/d2) in the same WITH. */
  private val dkResiduals: String = s"""
      ca AS (SELECT vec_id, cid AS cell FROM
               (SELECT *, row_number() OVER (PARTITION BY vec_id
                  ORDER BY dist_sq, cid) AS rn FROM d2)
             WHERE rn = 1),
      rq AS (SELECT q.vec_id, ca.cell,
               [CAST(q.qv[i] - floor(c1.m[i] + 0.5) AS BIGINT)
                for i in generate_series(1,64)] AS qv
             FROM q JOIN ca ON q.vec_id = ca.vec_id
                    JOIN c1 ON ca.cell = c1.cid)"""

  /** Oracle fragment: the q180 combined-index search chain (probes →
    * per-cell residual queries → ADC LUTs → inverted-list terms →
    * fixed-order fold → dist_est rank `rk`) — assumes dkQuantized +
    * dkKmeansCtes + dkResiduals + dkPqResChain("rq") in the same
    * WITH. Shared by q180 (top-k select) and q188 (exact re-rank of
    * the rk shortlist). */
  private val dkIvfPqSearchChain: String = s"""
      probes AS (SELECT vec_id AS id_q, cid AS cell FROM
                  (SELECT *, row_number() OVER (PARTITION BY vec_id
                     ORDER BY dist_sq, cid) AS rn FROM d2
                   WHERE vec_id < 10)
                 WHERE rn <= 2),
      prq AS (SELECT p.id_q, p.cell,
                [CAST(q.qv[i] - floor(c1.m[i] + 0.5) AS DOUBLE)
                 for i in generate_series(1,64)] AS qv
              FROM probes p JOIN q ON p.id_q = q.vec_id
                   JOIN c1 ON p.cell = c1.cid),
      luts AS (
        ${(0 until 4).map { sb =>
          s"""SELECT pr.id_q, pr.cell, $sb AS sub, c.cid AS code,
               list_reduce([(pr.qv[${sb * 16} + j] - c.m[j]) *
                   (pr.qv[${sb * 16} + j] - c.m[j])
                   for j in generate_series(1,16)], (x, y) -> x + y) AS d
             FROM prq pr CROSS JOIN rc1$sb c"""
        }.mkString("\n        UNION ALL\n        ")}),
      icodes AS (SELECT r.vec_id AS id_c, ca.cell, r.sub, r.code
                 FROM (SELECT * FROM rcd0 UNION ALL SELECT * FROM rcd1
                       UNION ALL SELECT * FROM rcd2
                       UNION ALL SELECT * FROM rcd3) r
                 JOIN ca ON r.vec_id = ca.vec_id),
      terms AS (SELECT l.id_q, i.id_c, l.sub, l.d
                FROM icodes i JOIN luts l
                  ON i.cell = l.cell AND i.sub = l.sub AND i.code = l.code),
      ag AS (SELECT id_q, id_c,
               list_reduce(list(d ORDER BY sub), (x, y) -> x + y)
                 AS dist_est
             FROM terms WHERE id_q <> id_c GROUP BY id_q, id_c),
      rk AS (SELECT id_q, id_c, dist_est,
               row_number() OVER (PARTITION BY id_q
                 ORDER BY dist_est, id_c) AS rn
             FROM ag)"""

  /** IVF-PQ index BUILD ([[graft.ops.ProductQuantizer.ivfPqEncode]],
    * Jégou et al. §IV): coarse k=4 cells + ONE global PQ codebook on
    * the integer residuals — each vector's index entry is (cell,
    * 4 codes), the RAM-resident representation of a billion-vector
    * index. Residuals re-quantize to the grid with the floor-based
    * half-up idiom so the whole chain stays exact-integer. */
  val q179 = Q(
    "q179_ivfpq_encode",
    (s, dir) => {
      // session-shared frozen index (round-8 VERDICT ask #2): train +
      // encode once per session, bit-identical to ivfPqEncode — this
      // query then IS the materialized inverted-list table
      graft.ops.ProductQuantizer.ivfPqIndexShared(
          Tables(s, dir, "embeddings"), s"$dir|embeddings",
          dim = 64, kc = 4, cIters = 1, m = 4, k = 4, iters = 1)
        .codes.orderBy(col("vec_id"), col("sub"))
    },
    Some(s"""
      WITH $dkQuantized,
      $dkKmeansCtes,
      $dkResiduals,
      ${dkPqResChain("rq")}
      SELECT r.vec_id, CAST(ca.cell AS BIGINT) AS cell,
             CAST(sub AS INTEGER) AS sub, CAST(code AS BIGINT) AS code,
             dist_sq
      FROM (SELECT * FROM rcd0 UNION ALL SELECT * FROM rcd1
            UNION ALL SELECT * FROM rcd2 UNION ALL SELECT * FROM rcd3) r
      JOIN ca ON r.vec_id = ca.vec_id
      ORDER BY r.vec_id, sub"""),
    covers = Seq("TD-pq", "TD-ann-ivf", "TD-kmeans"))

  /** IVF-PQ SEARCH ([[graft.ops.ProductQuantizer.ivfPqSearch]]): each
    * query probes its 2 nearest coarse cells, forms the PER-CELL
    * residual, and scores that cell's inverted list through the ADC
    * lookup table — inverted-file pruning + compressed-domain
    * scoring, the complete combined index query path. */
  val q180 = Q(
    "q180_ivfpq_search",
    (s, dir) => {
      import s.implicits._
      val emb = Tables(s, dir, "embeddings")
      val idx = graft.ops.ProductQuantizer.ivfPqIndexShared(emb,
        s"$dir|embeddings", dim = 64, kc = 4, cIters = 1, m = 4, k = 4,
        iters = 1)
      graft.ops.ProductQuantizer.ivfPqSearchIndexed(idx,
          emb.filter($"vec_id" < 10), dim = 64, m = 4, nProbe = 2,
          topK = 5)
        .orderBy(col("id_q"), col("rank"))
    },
    Some {
      s"""
      WITH $dkQuantized,
      $dkKmeansCtes,
      $dkResiduals,
      ${dkPqResChain("rq")},
      $dkIvfPqSearchChain
      SELECT id_q, CAST(rn AS INTEGER) AS rank, id_c, dist_est
      FROM rk WHERE rn <= 5 ORDER BY id_q, rank"""
    },
    covers = Seq("TD-pq", "TD-ann-ivf"))

  /** Unicode NFC normalization effect ([[graft.expressions.NfcNormalize]],
    * the native codegen'd expression — Spark ships no normalizer):
    * the corpus is ASCII, so each doc gets a deterministic decomposed
    * suffix (" cafe" + U+0301 + " caf" + U+00E9) and the query
    * reports raw vs normalized code-point counts + the changed flag —
    * proving the composition actually ran (U+0065 U+0301 → U+00E9).
    * Oracle = DuckDB's utf8proc `nfc_normalize`, the same Unicode
    * algorithm as the JDK normalizer, so the normalized TEXT itself
    * hash-matches, not just the lengths. */
  val q181 = Q(
    "q181_nfc_normalize",
    (s, dir) => {
      val raw = concat(col("text"), lit(" cafe\u0301 caf\u00e9"))
      Tables(s, dir, "documents")
        .select(col("doc_id"),
          length(raw).cast("long").as("n_chars_raw"),
          length(T.nfc(raw)).cast("long").as("n_chars_nfc"),
          (T.nfc(raw) =!= raw).as("changed"),
          substring(T.nfc(raw), -9, 9).as("norm_tail"))
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH r AS (SELECT doc_id,
                   text || ' cafe' || chr(769) || ' caf' || chr(233) AS raw
                 FROM documents)
      SELECT doc_id,
             CAST(length(raw) AS BIGINT) AS n_chars_raw,
             CAST(length(nfc_normalize(raw)) AS BIGINT) AS n_chars_nfc,
             nfc_normalize(raw) <> raw AS changed,
             substr(nfc_normalize(raw), length(nfc_normalize(raw)) - 8, 9)
               AS norm_tail
      FROM r ORDER BY doc_id"""),
    covers = Seq("TD-unicode-normalize", "TD-text-quality"))

  /** Shard packing by the LEARNED tokenizer's budget
    * ([[CorpusPipeline.packShardsFromCounts]] over q173's BPE subword
    * counts): the pack budget a trainer actually consumes is SUBWORD
    * tokens, not whitespace words — q86's two-level prefix sum with
    * the cost column swapped for the trained BPE segmentation, the
    * full compose of train (q172) → segment (q173) → pack. */
  val q182 = Q(
    "q182_bpe_shard_pack",
    (s, dir) => {
      val docs = Tables(s, dir, "documents")
      val counts = graft.ops.BpeTrainer.segmentCounts(docs,
          graft.ops.BpeTrainer.merges(docs, nMerges = 5))
        .select(col("doc_id"), col("n_subwords").as("n_tokens"))
      import graft.pipelines.CorpusPipeline
      CorpusPipeline.packShardsFromCounts(counts, budgetTokens = 4000,
          bucket = expr("doc_id DIV 256"))
        .orderBy(col("doc_id"))
    },
    Some(s"""
      WITH ${dkBpeChain(5)},
      seg AS (SELECT w, CAST(len(string_split(substr(ws, 2,
                length(ws)-2), '||')) AS BIGINT) AS n_sub
              FROM v5),
      dtoks AS (SELECT doc_id, w FROM
                 (SELECT doc_id, unnest(string_split(text,' ')) AS w
                  FROM documents)
                WHERE w <> '' AND w NOT LIKE '%|%'),
      t AS (SELECT doc_id, CAST(sum(n_sub) AS BIGINT) AS n_tokens
            FROM dtoks JOIN seg USING (w) GROUP BY doc_id)
      SELECT doc_id, n_tokens,
             CAST(floor(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               / 4000.0) AS BIGINT) AS shard
      FROM t ORDER BY doc_id"""),
    covers = Seq("TD-shard-pack", "TD-bpe-train"))

  /** Recall@5 of the COMBINED IVF-PQ path vs the exact cosine
    * baseline — q177's harness pointed at q180, closing the
    * compressed-ANN evaluation triangle (q162 trained-IVF, q177
    * raw-space PQ, q183 residual IVF-PQ): the side-by-side numbers
    * that show what inverted-file pruning + residual codebooks
    * trade at equal (m, k) budgets. */
  val q183 = Q(
    "q183_ivfpq_recall",
    (s, dir) => {
      import s.implicits._
      val emb = Tables(s, dir, "embeddings")
      val qs = emb.filter($"vec_id" < 10)
      val exact = Dedup.annTopK(emb, qs, "vec_id", "embedding", 5)
        .select(col("id_q"), col("id_c"))
      val idx = graft.ops.ProductQuantizer.ivfPqIndexShared(emb,
        s"$dir|embeddings", dim = 64, kc = 4, cIters = 1, m = 4, k = 4,
        iters = 1)
      val approx = graft.ops.ProductQuantizer.ivfPqSearchIndexed(idx,
          qs, dim = 64, m = 4, nProbe = 2, topK = 5)
        .select(col("id_q"), col("id_c")).withColumn("__hit", lit(1))
      exact.join(approx, Seq("id_q", "id_c"), "left")
        .groupBy(col("id_q"))
        .agg(count(col("__hit")).as("n_hits"), count(lit(1)).as("n_true"))
        .withColumn("recall",
          col("n_hits").cast("double") / col("n_true").cast("double"))
        .drop("n_true")
        .orderBy(col("id_q"))
    },
    Some {
      s"""
      WITH $dkQuantized,
      $dkKmeansCtes,
      $dkResiduals,
      ${dkPqResChain("rq")},
      probes AS (SELECT vec_id AS id_q, cid AS cell FROM
                  (SELECT *, row_number() OVER (PARTITION BY vec_id
                     ORDER BY dist_sq, cid) AS rn FROM d2
                   WHERE vec_id < 10)
                 WHERE rn <= 2),
      prq AS (SELECT p.id_q, p.cell,
                [CAST(q.qv[i] - floor(c1.m[i] + 0.5) AS DOUBLE)
                 for i in generate_series(1,64)] AS qv
              FROM probes p JOIN q ON p.id_q = q.vec_id
                   JOIN c1 ON p.cell = c1.cid),
      luts AS (
        ${(0 until 4).map { sb =>
          s"""SELECT pr.id_q, pr.cell, $sb AS sub, c.cid AS code,
               list_reduce([(pr.qv[${sb * 16} + j] - c.m[j]) *
                   (pr.qv[${sb * 16} + j] - c.m[j])
                   for j in generate_series(1,16)], (x, y) -> x + y) AS d
             FROM prq pr CROSS JOIN rc1$sb c"""
        }.mkString("\n        UNION ALL\n        ")}),
      icodes AS (SELECT r.vec_id AS id_c, ca.cell, r.sub, r.code
                 FROM (SELECT * FROM rcd0 UNION ALL SELECT * FROM rcd1
                       UNION ALL SELECT * FROM rcd2
                       UNION ALL SELECT * FROM rcd3) r
                 JOIN ca ON r.vec_id = ca.vec_id),
      terms AS (SELECT l.id_q, i.id_c, l.sub, l.d
                FROM icodes i JOIN luts l
                  ON i.cell = l.cell AND i.sub = l.sub AND i.code = l.code),
      ag AS (SELECT id_q, id_c,
               list_reduce(list(d ORDER BY sub), (x, y) -> x + y)
                 AS dist_est
             FROM terms WHERE id_q <> id_c GROUP BY id_q, id_c),
      ap AS (SELECT id_q, id_c FROM
               (SELECT id_q, id_c,
                  row_number() OVER (PARTITION BY id_q
                    ORDER BY dist_est, id_c) AS rn
                FROM ag) WHERE rn <= 5),
      ex AS (SELECT id_q, id_c FROM (
          SELECT a.vec_id AS id_q, b.vec_id AS id_c,
                 row_number() OVER (PARTITION BY a.vec_id
                   ORDER BY ${dkDot("a", "b")}
                     / (sqrt(a.nsq) * sqrt(b.nsq)) DESC, b.vec_id) AS rn
          FROM n a JOIN n b ON a.vec_id <> b.vec_id
          WHERE a.vec_id < 10) WHERE rn <= 5)
      SELECT ex.id_q, CAST(count(ap.id_c) AS BIGINT) AS n_hits,
             CAST(count(ap.id_c) AS DOUBLE) / CAST(count(*) AS DOUBLE)
               AS recall
      FROM ex LEFT JOIN ap ON ex.id_q = ap.id_q AND ex.id_c = ap.id_c
      GROUP BY ex.id_q ORDER BY ex.id_q"""
    },
    covers = Seq("TD-pq", "TD-ann-recall"))

  /** Small-cell SUPPRESSION — the k-anonymity-style aggregate-release
    * rule every data-clearinghouse applies (next to q92's PII scrub):
    * per-(event_type, day) counts publish only when the cell holds
    * ≥ k users; smaller cells roll up into a per-day `__suppressed__`
    * row so the release stays additive without exposing small
    * populations. Two hash aggs + a CASE regroup — no row-level data
    * leaves the engine. */
  val q184 = Q(
    "q184_small_cell_suppression",
    (s, dir) => {
      val k = 40L
      val cells = Tables(s, dir, "events")
        .select(col("event_type"), to_date(col("ts")).as("day"),
          col("user_id"))
        .groupBy(col("event_type"), col("day"))
        .agg(count_distinct(col("user_id")).as("n_users"),
          count(lit(1)).as("n_events"))
      cells
        .select(
          when(col("n_users") >= k, col("event_type"))
            .otherwise(lit("__suppressed__")).as("event_type"),
          col("day"), col("n_users"), col("n_events"))
        .groupBy(col("event_type"), col("day"))
        .agg(sum(col("n_users")).cast("long").as("n_users"),
          sum(col("n_events")).cast("long").as("n_events"),
          count(lit(1)).cast("long").as("n_cells"))
        .orderBy(col("day"), col("event_type"))
    },
    Some("""
      WITH cells AS (SELECT event_type, CAST(ts AS DATE) AS day,
                       count(DISTINCT user_id) AS n_users,
                       count(*) AS n_events
                     FROM events GROUP BY event_type, day),
      r AS (SELECT CASE WHEN n_users >= 40 THEN event_type
                        ELSE '__suppressed__' END AS event_type,
              day, n_users, n_events
            FROM cells)
      SELECT event_type, day, CAST(sum(n_users) AS BIGINT) AS n_users,
             CAST(sum(n_events) AS BIGINT) AS n_events,
             CAST(count(*) AS BIGINT) AS n_cells
      FROM r GROUP BY event_type, day ORDER BY day, event_type"""),
    covers = Seq("TD-privacy-release", "A1"))

  /** REAL video decode ([[graft.ops.Multimodal.VideoCodec]]): each doc
    * id becomes a synthetic uncompressed-DIB AVI (a spec-complete RIFF
    * file), the container parser extracts every frame, and per-frame
    * pixel statistics come off the decoded bytes. DIB is lossless, so
    * the oracle recomputes each frame's mean intensity in closed form
    * from the id — the q76 (PNG) / q166 (WAV) exactness pattern
    * completing the multimodal triple. The 1→n frame fan-out runs
    * partition-parallel on executors. */
  val q185 = Q(
    "q185_video_decode",
    (s, dir) => {
      import s.implicits._
      import graft.ops.Multimodal
      val media = Tables(s, dir, "documents").select($"doc_id").as[Long]
        .map(id => Multimodal.MediaRow(id, "video",
          Multimodal.VideoCodec.syntheticAvi(id)))
      Multimodal.videoFrameStats(media).toDF()
        .orderBy($"media_id", $"frame_idx")
    },
    Some("""
      WITH m AS (SELECT doc_id, 2 + doc_id % 3 AS nf, 8 + doc_id % 5 AS w,
                   6 + doc_id % 4 AS h
                 FROM documents),
      px AS (SELECT m.doc_id, f.f, m.w, m.h,
               (x.x * 7 + y.y * 13 + f.f * 31 + m.doc_id) % 256 AS v
             FROM m, range(0, 4) f(f), range(0, 12) x(x), range(0, 9) y(y)
             WHERE f.f < m.nf AND x.x < m.w AND y.y < m.h)
      SELECT doc_id AS media_id, CAST(f AS INTEGER) AS frame_idx,
             CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
             count(*) AS n_px,
             CAST(sum(v) AS DOUBLE) / CAST(count(*) AS DOUBLE)
               AS mean_intensity
      FROM px GROUP BY 1, 2, 3, 4 ORDER BY media_id, frame_idx"""),
    covers = Seq("TD-multimodal"))

  /** Batch-incremental IVF-PQ index maintenance
    * ([[graft.ops.ProductQuantizer.ivfPqIngest]]): the index state
    * (coarse cells + residual-PQ codebooks) trains ONCE on batch 0;
    * batch 0 then batch 1 encode against the FROZEN state and append
    * to a persistent per-batch index table — how a 100 TB corpus
    * maintains its ANN index between retrains. The oracle trains the
    * same state on the even-id half only (dkKmeansCtesSrc /
    * dkPqResChainSrc train/encode split) and encodes everything, so
    * every ingested (cell, code) row is oracle-exact; the spec pins
    * replay-stability and that batch 1 never retrains. */
  val q186 = Q(
    "q186_ivfpq_ingest",
    (s, dir) => {
      import graft.ops.ProductQuantizer
      val emb = Tables(s, dir, "embeddings")
      val b0 = emb.filter(pmod(col("vec_id"), lit(2)) === 0)
      val b1 = emb.filter(pmod(col("vec_id"), lit(2)) === 1)
      val idx = java.nio.file.Files
        .createTempDirectory("graft_q186_").toString + "/index"
      // frozen state shared per session (trained on batch 0 only —
      // the even half, matching the oracle's train/encode split)
      val st = ProductQuantizer.ivfPqIndexShared(b0,
        s"$dir|embeddings|even", dim = 64, kc = 4, cIters = 1, m = 4,
        k = 4, iters = 1)
      val r0 = ProductQuantizer.ivfPqIngest(s, b0, st.coarse, st.cents,
        idx, "b0", dim = 64, m = 4)
      val r1 = ProductQuantizer.ivfPqIngest(s, b1, st.coarse, st.cents,
        idx, "b1", dim = 64, m = 4)
      r0.withColumn("batch", lit(0))
        .unionByName(r1.withColumn("batch", lit(1)))
        .orderBy(col("vec_id"), col("sub"))
    },
    Some(s"""
      WITH $dkQuantized,
      tr AS (SELECT * FROM q WHERE vec_id % 2 = 0),
      ${dkKmeansCtesSrc("tr", "q")},
      $dkResiduals,
      rtr AS (SELECT * FROM rq WHERE vec_id % 2 = 0),
      ${dkPqResChainSrc("rtr", "rq")}
      SELECT r.vec_id, CAST(ca.cell AS BIGINT) AS cell,
             CAST(sub AS INTEGER) AS sub, CAST(code AS BIGINT) AS code,
             dist_sq, CAST(r.vec_id % 2 AS INTEGER) AS batch
      FROM (SELECT * FROM rcd0 UNION ALL SELECT * FROM rcd1
            UNION ALL SELECT * FROM rcd2 UNION ALL SELECT * FROM rcd3) r
      JOIN ca ON r.vec_id = ca.vec_id
      ORDER BY r.vec_id, sub"""),
    covers = Seq("TD-pq", "TD-ann-ivf", "TD-incremental-ingest"))

  /** REAL frame sampling ([[graft.ops.Multimodal.sampleFrames]]): each
    * clip's container parses once, 2 evenly-spaced REAL frames come
    * out as self-contained lossless PNGs, and each sampled payload
    * decodes through the IMAGE codec — the container → frame → image
    * composition a multimodal curation pipeline runs, all
    * partition-parallel. Sampling picks container indices
    * {⌊nf·i/2⌋} = {0, nf div 2}, and PNG losslessness keeps every
    * decoded statistic closed-form (the q185 oracle restricted to the
    * sampled frames). */
  val q187 = Q(
    "q187_video_frame_sample",
    (s, dir) => {
      import s.implicits._
      import graft.ops.Multimodal
      val media = Tables(s, dir, "documents").select($"doc_id").as[Long]
        .map(id => Multimodal.MediaRow(id, "video",
          Multimodal.VideoCodec.syntheticAvi(id)))
      Multimodal.sampleFrames(media, 2).map { f =>
        val st = Multimodal.ImageCodec.decodeStats(f.media_id, f.payload)
        (f.media_id, f.frame_idx, st.width, st.height, st.mean_intensity)
      }.toDF("media_id", "frame_idx", "width", "height", "mean_intensity")
        .orderBy($"media_id", $"frame_idx")
    },
    Some("""
      WITH m AS (SELECT doc_id, 2 + doc_id % 3 AS nf, 8 + doc_id % 5 AS w,
                   6 + doc_id % 4 AS h
                 FROM documents),
      sel AS (SELECT doc_id, w, h, unnest([CAST(0 AS BIGINT), nf // 2]) AS f
              FROM m),
      px AS (SELECT sel.doc_id, sel.f, sel.w, sel.h,
               (x.x * 7 + y.y * 13 + sel.f * 31 + sel.doc_id) % 256 AS v
             FROM sel, range(0, 12) x(x), range(0, 9) y(y)
             WHERE x.x < sel.w AND y.y < sel.h)
      SELECT doc_id AS media_id, CAST(f AS INTEGER) AS frame_idx,
             CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
             CAST(sum(v) AS DOUBLE) / CAST(count(*) AS DOUBLE)
               AS mean_intensity
      FROM px GROUP BY 1, 2, 3, 4 ORDER BY media_id, frame_idx"""),
    covers = Seq("TD-multimodal"))

  /** IVF-PQ search + EXACT RE-RANK
    * ([[graft.ops.ProductQuantizer.ivfPqRefine]], Jégou et al. §VI):
    * the compressed index shortlists 8 candidates per query (ADC
    * distances), then ONLY those candidates' raw vectors re-rank to
    * top-5 by exact quantized-integer distance — the
    * approximate-shortlist → exact-refine pipeline every production
    * PQ deployment runs. The refinement join touches
    * #queries·shortlist vectors (a point-lookup shape), and the exact
    * fold reuses the engine's fixed-order distance, so the re-ranked
    * order is oracle-exact. */
  val q188 = Q(
    "q188_ivfpq_refine",
    (s, dir) => {
      import s.implicits._
      val emb = Tables(s, dir, "embeddings")
      val idx = graft.ops.ProductQuantizer.ivfPqIndexShared(emb,
        s"$dir|embeddings", dim = 64, kc = 4, cIters = 1, m = 4, k = 4,
        iters = 1)
      graft.ops.ProductQuantizer.ivfPqRefineIndexed(idx, emb,
          emb.filter($"vec_id" < 10), dim = 64, m = 4, nProbe = 2,
          shortlist = 8, topK = 5)
        .orderBy(col("id_q"), col("rank"))
    },
    Some(s"""
      WITH $dkQuantized,
      $dkKmeansCtes,
      $dkResiduals,
      ${dkPqResChain("rq")},
      $dkIvfPqSearchChain,
      sl AS (SELECT id_q, id_c, dist_est FROM rk WHERE rn <= 8),
      ex AS (SELECT s.id_q, s.id_c, s.dist_est,
               list_reduce([(CAST(a.qv[i] AS DOUBLE) - CAST(b.qv[i] AS DOUBLE)) *
                   (CAST(a.qv[i] AS DOUBLE) - CAST(b.qv[i] AS DOUBLE))
                   for i in generate_series(1,64)], (x, y) -> x + y)
                 AS dist_exact
             FROM sl s JOIN q a ON s.id_q = a.vec_id
                       JOIN q b ON s.id_c = b.vec_id),
      rr AS (SELECT *, row_number() OVER (PARTITION BY id_q
               ORDER BY dist_exact, id_c) AS rn2 FROM ex)
      SELECT id_q, CAST(rn2 AS INTEGER) AS rank, id_c, dist_exact, dist_est
      FROM rr WHERE rn2 <= 5 ORDER BY id_q, rank"""),
    covers = Seq("TD-pq", "TD-ann-ivf", "TD-ann-recall"))

  /** T5-style span corruption ([[graft.pipelines.CorpusPipeline
    * .spanCorruption]], Raffel et al. 2020 §3.1.4): deterministic
    * masked-denoising pair construction — fixed 20-token blocks, a
    * seeded hash of (doc_id, block) places each 3-token noise span
    * (15% density), input keeps survivors with one `<extra_id_b>`
    * sentinel per span, target is each sentinel followed by the tokens
    * it hid. Every output string is a pure function of (doc_id, text,
    * seed), so the full input/target TEXTS hash-match the oracle. */
  val q189 = Q(
    "q189_span_corruption",
    (s, dir) => {
      import graft.pipelines.CorpusPipeline
      CorpusPipeline.spanCorruption(Tables(s, dir, "documents"))
        .orderBy(col("doc_id"))
    },
    Some {
      val h = dkHash(0, "doc_id||'#'||CAST(b AS VARCHAR)")
      s"""
      WITH toks AS (SELECT doc_id, string_split(text,' ') AS ws
                    FROM documents),
      t AS (SELECT doc_id, i - 1 AS i0, ws[i] AS tok
            FROM (SELECT doc_id, ws,
                    unnest(generate_series(1, len(ws))) AS i
                  FROM toks)),
      x AS (SELECT doc_id, i0, tok, b, $h % 18 AS off, i0 % 20 AS p
            FROM (SELECT doc_id, i0, tok, i0 // 20 AS b FROM t)),
      m AS (SELECT doc_id, i0, tok, b, off, p,
              (p >= off AND p < off + 3) AS in_span,
              (p = off) AS span_start
            FROM x),
      agg AS (SELECT doc_id,
                CAST(count(*) AS BIGINT) AS n_tokens,
                CAST(sum(CASE WHEN in_span THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_masked,
                coalesce(string_agg(
                  CASE WHEN NOT in_span THEN tok
                       WHEN span_start THEN
                         '<extra_id_'||CAST(b AS VARCHAR)||'>' END,
                  ' ' ORDER BY i0), '') AS input_text,
                coalesce(string_agg(
                  CASE WHEN in_span AND span_start THEN
                         '<extra_id_'||CAST(b AS VARCHAR)||'> '||tok
                       WHEN in_span THEN tok END,
                  ' ' ORDER BY i0), '') AS target_text
              FROM m GROUP BY doc_id)
      SELECT doc_id, n_tokens, n_masked, input_text, target_text
      FROM agg ORDER BY doc_id"""
    },
    covers = Seq("TD-span-corruption", "TD-seq-pack"))

  private val dHashMemo =
    new graft.SessionMemo[org.apache.spark.sql.DataFrame]()

  /** Session-shared 64-bit dHash table over the synthetic PNG corpus —
    * decoded + fingerprinted ONCE per (session, sf dir) and
    * materialized (localCheckpoint), the [[graft.ops.ProductQuantizer
    * .ivfPqIndexShared]] pattern applied to the image modality. In a
    * crawl pipeline the fingerprint table IS the persisted artifact:
    * computed at ingest, consumed by both the pair query (q190) and
    * the cluster/keeper resolution (q193) — neither re-decodes.
    * Deliberately NOT CacheTracker-tracked: like `EdwQueries.star` it
    * models a materialized table that outlives query boundaries. */
  private def imageDHashTable(s: org.apache.spark.sql.SparkSession,
      dir: String)
      : org.apache.spark.sql.DataFrame =
    dHashMemo.getOrElseUpdate(s, dir, {
        import s.implicits._
        import graft.ops.Multimodal
        val media = Tables(s, dir, "documents").select($"doc_id")
          .as[Long].flatMap { id =>
            val orig = Multimodal.MediaRow(id, "image",
              Multimodal.ImageCodec.syntheticPngTextured(id, pert = false))
            if (id % 4 == 0)
              Seq(orig, Multimodal.MediaRow(id + 10000000L, "image",
                Multimodal.ImageCodec.syntheticPngTextured(id, pert = true)))
            else Seq(orig)
          }
        Multimodal.imageDHashes(media).toDF().localCheckpoint()
      })

  /** Perceptual-hash image near-dup — the modality the dedup matrix
    * was missing (text q21–q25, embeddings q26/q111, now pixels): each
    * doc id renders to a REAL PNG, every fourth doc also gets a
    * single-pixel-retouched variant (ImageCodec.syntheticPngNearDup —
    * the recompressed/slightly-recolored crawl case), the engine
    * decodes the actual bytes and fingerprints them with the 64-bit
    * dHash (difference hash over the REAL decoded pixels), and
    * Hamming-≤2 pairs come from the SimHash pigeonhole machinery
    * (Dedup.hammingNearPairs) — an equi-join on (chunk, value), never
    * an all-pairs compare. The oracle recomputes every fingerprint bit
    * from the closed-form pixel function (nearest-neighbor 9×8 grid,
    * integer division) and scores pairs with DuckDB's string hamming —
    * so a codec or hash that mis-decodes one sampled pixel hash-fails. */
  val q190 = Q(
    "q190_image_neardup",
    (s, dir) => {
      import s.implicits._
      val hashes = imageDHashTable(s, dir)
      Dedup.hammingNearPairs(hashes, "media_id", maxDist = 2,
          bits = 64, hashCol = "dhash")
        .withColumn("hamming", col("hamming").cast("long"))
        .orderBy($"id_a", $"id_b")
    },
    Some("""
      WITH m AS (
        SELECT doc_id AS media_id, doc_id AS base, FALSE AS pert,
               CAST(8 + doc_id % 9 AS INT) AS w,
               CAST(8 + doc_id % 7 AS INT) AS h,
               CAST(3 + doc_id % 13 AS INT) AS sa,
               CAST(5 + doc_id % 11 AS INT) AS sb
        FROM documents
        UNION ALL
        SELECT doc_id + 10000000, doc_id, TRUE,
               CAST(8 + doc_id % 9 AS INT), CAST(8 + doc_id % 7 AS INT),
               CAST(3 + doc_id % 13 AS INT), CAST(5 + doc_id % 11 AS INT)
        FROM documents WHERE doc_id % 4 = 0),
      g AS (
        SELECT media_id, y.j * 8 + x.i AS bitpos,
               CASE WHEN
                 (CASE WHEN pert AND ((x.i+1) * w // 9) = 0
                            AND (y.j * h // 8) = 0 THEN 255
                       ELSE (((x.i+1) * w // 9) * ((x.i+1) * w // 9) * 3
                             + (y.j * h // 8) * (y.j * h // 8) * 5
                             + ((x.i+1) * w // 9) * (y.j * h // 8) * 7
                             + ((x.i+1) * w // 9) * sa
                             + (y.j * h // 8) * sb + base) % 256 END)
                 >
                 (CASE WHEN pert AND (x.i * w // 9) = 0
                            AND (y.j * h // 8) = 0 THEN 255
                       ELSE ((x.i * w // 9) * (x.i * w // 9) * 3
                             + (y.j * h // 8) * (y.j * h // 8) * 5
                             + (x.i * w // 9) * (y.j * h // 8) * 7
                             + (x.i * w // 9) * sa
                             + (y.j * h // 8) * sb + base) % 256 END)
                 THEN '1' ELSE '0' END AS b
        FROM m, range(0, 8) x(i), range(0, 8) y(j)),
      hs AS (SELECT media_id, string_agg(b, '' ORDER BY bitpos) AS hstr
             FROM g GROUP BY media_id)
      SELECT a.media_id AS id_a, b.media_id AS id_b,
             CAST(hamming(a.hstr, b.hstr) AS BIGINT) AS hamming
      FROM hs a JOIN hs b ON a.media_id < b.media_id
      WHERE hamming(a.hstr, b.hstr) <= 2
      ORDER BY id_a, id_b"""),
    covers = Seq("TD-dedup-image", "TD-multimodal"))

  /** ExactSubstr duplicated spans (Lee et al. 2021 §3): maximal runs
    * of tokens covered by a ≥8-token substring occurring at least
    * twice ANYWHERE in the corpus (occurrence count, not document
    * frequency — a within-doc verbatim repeat duplicates too), with
    * their actual variable lengths — the long duplicates the fixed
    * 5-gram machinery (q94/q107) cannot see. The oracle restates the
    * interval merge declaratively with window functions over the same
    * dup-start sets. */
  val q191 = Q(
    "q191_exact_substr",
    (s, dir) => {
      import graft.pipelines.CorpusPipeline
      CorpusPipeline.exactSubstrSpans(Tables(s, dir, "documents"), k = 8)
        .orderBy(col("doc_id"), col("span_start"))
    },
    Some(s"""
      WITH toks AS (SELECT doc_id, string_split(text,' ') AS ws
                    FROM documents),
      g AS (
        SELECT doc_id, st,
               ${dkHash(0, "array_to_string(ws[st:st+7], ' ')")} AS h
        FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws)-7)) AS st
              FROM toks WHERE len(ws) >= 8)),
      f AS (SELECT h FROM (SELECT h, count(*) AS c FROM g GROUP BY 1)
            WHERE c >= 2),
      d AS (SELECT doc_id, st - 1 AS st FROM g JOIN f USING (h)),
      s AS (SELECT doc_id, st,
              CASE WHEN lag(st) OVER w IS NULL
                     OR st > lag(st) OVER w + 8 THEN 1 ELSE 0 END AS nw
            FROM d WINDOW w AS (PARTITION BY doc_id ORDER BY st)),
      r AS (SELECT doc_id, st,
              sum(nw) OVER (PARTITION BY doc_id ORDER BY st) AS span
            FROM s)
      SELECT doc_id, CAST(min(st) AS BIGINT) AS span_start,
             CAST(max(st) + 8 - min(st) AS BIGINT) AS span_len
      FROM r GROUP BY doc_id, span ORDER BY doc_id, span_start"""),
    covers = Seq("TD-exact-substr", "TD-dup-span-removal"))

  /** ExactSubstr removal — q191's coverage applied as cleaning: every
    * token inside a ≥8-token substring occurring ≥2 times anywhere is
    * cut, survivors re-joined (Lee et al. 2021 §3.2 released-tool
    * semantics: all occurrences go). The q107 output shape so the two
    * cleaning rules (cross-doc 5-gram df vs corpus-wide 8-gram
    * occurrence) compare row for row. */
  val q192 = Q(
    "q192_exact_substr_removal",
    (s, dir) => {
      import graft.pipelines.CorpusPipeline
      CorpusPipeline.exactSubstrRemove(Tables(s, dir, "documents"), k = 8)
        .orderBy(col("doc_id"))
    },
    Some(s"""
      WITH toks AS (SELECT doc_id, string_split(text,' ') AS ws
                    FROM documents),
      g AS (
        SELECT doc_id, st,
               ${dkHash(0, "array_to_string(ws[st:st+7], ' ')")} AS h
        FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws)-7)) AS st
              FROM toks WHERE len(ws) >= 8)),
      f AS (SELECT h FROM (SELECT h, count(*) AS c FROM g GROUP BY 1)
            WHERE c >= 2),
      d AS (SELECT doc_id, list(st) AS dups FROM g JOIN f USING (h)
            GROUP BY 1),
      sel AS (SELECT t.doc_id, t.ws,
                     coalesce(d.dups, CAST([] AS BIGINT[])) AS dups
              FROM toks t LEFT JOIN d USING (doc_id)),
      fin AS (
        SELECT doc_id, ws,
          [ws[i] for i in generate_series(1, len(ws))
             if len(list_filter(dups, s -> s <= i AND i <= s + 7)) = 0]
            AS kept
        FROM sel)
      SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_tokens,
             CAST(len(ws) - len(kept) AS BIGINT) AS n_removed,
             coalesce(array_to_string(kept, ' '), '') AS text_clean
      FROM fin ORDER BY doc_id"""),
    covers = Seq("TD-exact-substr", "TD-dup-span-removal"))

  /** Image-dedup RESOLUTION — q190's perceptual pairs carried to the
    * keeper decision (q77's pair→cluster stage on the image modality):
    * Hamming-≤2 dHash pairs resolve into connected components
    * (min-label pointer-jumping / bounded union-find), every image —
    * singletons included — gets (cluster, keep); a crawl pipeline drops
    * `keep = false` rows before embedding. Oracle: the same recursive
    * reachability closure as q77, over the closed-form recomputed
    * fingerprints. */
  val q193 = Q(
    "q193_image_dedup_decision",
    (s, dir) => {
      val hashes = imageDHashTable(s, dir)
      val pairs = Dedup.hammingNearPairs(hashes, "media_id", maxDist = 2,
          bits = 64, hashCol = "dhash")
        .select(col("id_a"), col("id_b")).localCheckpoint()
      val decided = Dedup.dedupDecision(hashes.select(col("media_id")),
        "media_id", pairs)
      graft.CacheTracker.releaseCheckpoint(pairs)
      decided.orderBy(col("media_id"))
    },
    Some("""
      WITH RECURSIVE m AS (
        SELECT doc_id AS media_id, doc_id AS base, FALSE AS pert,
               CAST(8 + doc_id % 9 AS INT) AS w,
               CAST(8 + doc_id % 7 AS INT) AS h,
               CAST(3 + doc_id % 13 AS INT) AS sa,
               CAST(5 + doc_id % 11 AS INT) AS sb
        FROM documents
        UNION ALL
        SELECT doc_id + 10000000, doc_id, TRUE,
               CAST(8 + doc_id % 9 AS INT), CAST(8 + doc_id % 7 AS INT),
               CAST(3 + doc_id % 13 AS INT), CAST(5 + doc_id % 11 AS INT)
        FROM documents WHERE doc_id % 4 = 0),
      g AS (
        SELECT media_id, y.j * 8 + x.i AS bitpos,
               CASE WHEN
                 (CASE WHEN pert AND ((x.i+1) * w // 9) = 0
                            AND (y.j * h // 8) = 0 THEN 255
                       ELSE (((x.i+1) * w // 9) * ((x.i+1) * w // 9) * 3
                             + (y.j * h // 8) * (y.j * h // 8) * 5
                             + ((x.i+1) * w // 9) * (y.j * h // 8) * 7
                             + ((x.i+1) * w // 9) * sa
                             + (y.j * h // 8) * sb + base) % 256 END)
                 >
                 (CASE WHEN pert AND (x.i * w // 9) = 0
                            AND (y.j * h // 8) = 0 THEN 255
                       ELSE ((x.i * w // 9) * (x.i * w // 9) * 3
                             + (y.j * h // 8) * (y.j * h // 8) * 5
                             + (x.i * w // 9) * (y.j * h // 8) * 7
                             + (x.i * w // 9) * sa
                             + (y.j * h // 8) * sb + base) % 256 END)
                 THEN '1' ELSE '0' END AS b
        FROM m, range(0, 8) x(i), range(0, 8) y(j)),
      hs AS (SELECT media_id, string_agg(b, '' ORDER BY bitpos) AS hstr
             FROM g GROUP BY media_id),
      pairs AS (SELECT a.media_id AS id_a, b.media_id AS id_b
                FROM hs a JOIN hs b ON a.media_id < b.media_id
                WHERE hamming(a.hstr, b.hstr) <= 2),
      edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
                UNION ALL
                SELECT id_b AS src, id_a AS dst FROM pairs),
      reach AS (
        SELECT media_id AS node, media_id AS mn FROM m
        UNION
        SELECT e.dst AS node, r.mn
        FROM reach r JOIN edges e ON e.src = r.node
      )
      SELECT node AS media_id, MIN(mn) AS cluster, node = MIN(mn) AS keep
      FROM reach GROUP BY node ORDER BY media_id"""),
    covers = Seq("TD-dedup-image", "TD-dedup-clusters"))

  /** Cluster-balanced sampling ([[graft.ops.KMeans
    * .clusterBalancedSample]]): the semantic-diversity draw — k=4
    * trained clusters, each contributing ≤25 vectors in expectation
    * via the seeded-hash acceptance draw; the embedding-space analog
    * of q130's per-source quota and q117's temperature flattening,
    * keyed by learned structure. Oracle: the q127 Lloyd chain +
    * per-cluster rate table + the same 60-bit threshold draw. */
  val q194 = Q(
    "q194_cluster_balanced_sample",
    (s, dir) => {
      graft.ops.KMeans.clusterBalancedSample(
          Tables(s, dir, "embeddings"), k = 4, iters = 1,
          perCluster = 25L, seed = 11)
        .orderBy(col("vec_id"))
    },
    Some(s"""
      WITH $dkQuantized,
      $dkKmeansCtes,
      ca AS (SELECT vec_id, cid AS cluster FROM
               (SELECT *, row_number() OVER (PARTITION BY vec_id
                  ORDER BY dist_sq, cid) AS rn FROM d2)
             WHERE rn = 1),
      rates AS (SELECT cluster,
                  LEAST(1.0, 25.0 / CAST(count(*) AS DOUBLE))
                    AS accept_rate,
                  CAST(floor(LEAST(1.0, 25.0 / CAST(count(*) AS DOUBLE))
                    * 1152921504606846976.0) AS BIGINT) AS th
                FROM ca GROUP BY cluster)
      SELECT vec_id, cluster, accept_rate
      FROM ca JOIN rates USING (cluster)
      WHERE ${dkHash(11, "CAST(vec_id AS VARCHAR)")} < th
      ORDER BY vec_id"""),
    covers = Seq("TD-cluster-balance", "TD-kmeans", "TD-sampling"))

  /** Audio near-dup — the LAST dedup modality (text q21–q25,
    * embeddings q26/q111, pixels q190, now sound): each doc id
    * renders to a REAL WAV ([[graft.ops.Multimodal.AudioCodec
    * .syntheticWavTextured]] — quadratic PCM16 texture), every fourth
    * doc also gets a retouched-intro variant (first four samples
    * pinned — the re-mastered-upload crawl case), the engine decodes
    * the actual bytes through `javax.sound.sampled` and fingerprints
    * the 65 band energies with a 64-bit difference hash
    * ([[graft.ops.Multimodal.AudioCodec.bandHash64]] — exact integer
    * |sample| sums, bit i = energy(i+1) > energy(i)), and Hamming-≤2
    * pairs come from the SimHash pigeonhole machinery — an equi-join
    * on (chunk, value), never an all-pairs compare. The oracle
    * recomputes every energy sum and fingerprint bit from the
    * closed-form sample function (a range join regenerates the PCM),
    * so a codec that mis-decodes one sample hash-fails. */
  private val bHashMemo =
    new graft.SessionMemo[org.apache.spark.sql.DataFrame]()

  /** Session-shared 64-bit band-hash table over the synthetic WAV
    * corpus — decoded + fingerprinted ONCE per (session, sf dir) and
    * materialized, the [[imageDHashTable]] pattern on the audio
    * modality: the fingerprint table is the persisted ingest artifact
    * both the pair query (q195) and the keeper resolution (q203)
    * consume. Untracked localCheckpoint, `EdwQueries.star` precedent. */
  private def audioBandHashTable(s: org.apache.spark.sql.SparkSession,
      dir: String)
      : org.apache.spark.sql.DataFrame =
    bHashMemo.getOrElseUpdate(s, dir, {
        import s.implicits._
        import graft.ops.Multimodal
        val media = Tables(s, dir, "documents").select($"doc_id")
          .as[Long].flatMap { id =>
            val orig = Multimodal.MediaRow(id, "audio",
              Multimodal.AudioCodec.syntheticWavTextured(id, pert = false))
            if (id % 4 == 0)
              Seq(orig, Multimodal.MediaRow(id + 10000000L, "audio",
                Multimodal.AudioCodec.syntheticWavTextured(id, pert = true)))
            else Seq(orig)
          }
        Multimodal.audioBandHashes(media).toDF().localCheckpoint()
      })

  val q195 = Q(
    "q195_audio_neardup",
    (s, dir) => {
      import s.implicits._
      val hashes = audioBandHashTable(s, dir)
      Dedup.hammingNearPairs(hashes, "media_id", maxDist = 2,
          bits = 64, hashCol = "bhash")
        .withColumn("hamming", col("hamming").cast("long"))
        .orderBy($"id_a", $"id_b")
    },
    Some("""
      WITH m AS (
        SELECT doc_id AS media_id, doc_id AS base, FALSE AS pert,
               CAST(1000 + (doc_id % 7) * 100 AS BIGINT) AS n
        FROM documents
        UNION ALL
        SELECT doc_id + 10000000, doc_id, TRUE,
               CAST(1000 + (doc_id % 7) * 100 AS BIGINT)
        FROM documents WHERE doc_id % 4 = 0),
      s AS (SELECT media_id,
              t.t * 65 // n AS win,
              abs(CASE WHEN pert AND t.t < 4 THEN 32767
                   ELSE ((t.t * t.t * 31 + t.t * base * 17
                          + base * base * 7) % 65536) - 32768 END) AS av
            FROM m, range(0, 1600) t(t) WHERE t.t < n),
      e AS (SELECT media_id, win, sum(av) AS s FROM s
            GROUP BY media_id, win),
      b AS (SELECT lo.media_id, lo.win AS bitpos,
              CASE WHEN hi.s > lo.s THEN '1' ELSE '0' END AS b
            FROM e lo JOIN e hi ON lo.media_id = hi.media_id
                                AND hi.win = lo.win + 1
            WHERE lo.win < 64),
      hs AS (SELECT media_id, string_agg(b, '' ORDER BY bitpos) AS hstr
             FROM b GROUP BY media_id)
      SELECT a.media_id AS id_a, b.media_id AS id_b,
             CAST(hamming(a.hstr, b.hstr) AS BIGINT) AS hamming
      FROM hs a JOIN hs b ON a.media_id < b.media_id
      WHERE hamming(a.hstr, b.hstr) <= 2
      ORDER BY id_a, id_b"""),
    covers = Seq("TD-dedup-audio", "TD-multimodal"))

  /** Int8 ADC recall — q105's codes taken to SERVING
    * ([[graft.ops.Quantization.adcTopK]]): both sides of the search
    * live as int8 codes only, similarity is the exact int64 code dot
    * over the exact int code norms (one IEEE division — bit-stable in
    * any engine), and recall@5 is scored against the exact
    * integer-cosine truth the q27 family pinned. The quality harness
    * that decides whether 4× embedding compression costs retrieval —
    * the int8 analog of q177's PQ recall. */
  val q196 = Q(
    "q196_int8_adc_recall",
    (s, dir) => {
      import s.implicits._
      val emb = Tables(s, dir, "embeddings")
      graft.ops.Quantization.adcRecall(emb, emb.filter($"vec_id" < 10),
          k = 5)
        .orderBy(col("id_q"))
    },
    Some(s"""
      WITH $dkQuantized,
      i8 AS (SELECT vec_id, q8,
               list_aggregate([q8[i]*q8[i] for i in generate_series(1,64)],
                 'sum') AS qn
             FROM (SELECT vec_id,
                     CASE WHEN amax = 0
                          THEN [CAST(0 AS BIGINT) for x in xd]
                          ELSE [CAST(GREATEST(-127, LEAST(127,
                                 FLOOR(x / (amax / 127.0) + 0.5)))
                                 AS BIGINT) for x in xd]
                     END AS q8
                   FROM (SELECT vec_id,
                           [CAST(x AS DOUBLE) for x in embedding] AS xd,
                           list_max([abs(CAST(x AS DOUBLE))
                                     for x in embedding]) AS amax
                         FROM embeddings))),
      ex AS (SELECT id_q, id_c FROM (
               SELECT qs.vec_id AS id_q, cs.vec_id AS id_c,
                 row_number() OVER (PARTITION BY qs.vec_id ORDER BY
                   ${dkDot("qs", "cs")} / (sqrt(qs.nsq) * sqrt(cs.nsq))
                     DESC, cs.vec_id ASC) AS rnk
               FROM n qs JOIN n cs
                 ON qs.vec_id < 10 AND qs.vec_id <> cs.vec_id)
             WHERE rnk <= 5),
      ap AS (SELECT id_q, id_c FROM (
               SELECT qs.vec_id AS id_q, cs.vec_id AS id_c,
                 row_number() OVER (PARTITION BY qs.vec_id ORDER BY
                   CASE WHEN qs.qn = 0 OR cs.qn = 0 THEN 0.0
                        ELSE CAST(list_aggregate([qs.q8[i]*cs.q8[i]
                               for i in generate_series(1,64)], 'sum')
                               AS DOUBLE)
                             / (sqrt(CAST(qs.qn AS DOUBLE))
                                * sqrt(CAST(cs.qn AS DOUBLE))) END
                     DESC, cs.vec_id ASC) AS rnk
               FROM i8 qs JOIN i8 cs
                 ON qs.vec_id < 10 AND qs.vec_id <> cs.vec_id)
             WHERE rnk <= 5)
      SELECT ex.id_q,
             CAST(count(ap.id_c) AS BIGINT) AS n_hits,
             CAST(count(*) AS BIGINT) AS n_true,
             CAST(count(ap.id_c) AS DOUBLE) / CAST(count(*) AS DOUBLE)
               AS recall
      FROM ex LEFT JOIN ap ON ex.id_q = ap.id_q AND ex.id_c = ap.id_c
      GROUP BY ex.id_q ORDER BY ex.id_q"""),
    covers = Seq("TD-int8-quant", "TD-ann-recall"))

  /** Unrolled rescaled-power-iteration CTE chain (the
    * [[graft.ops.Pca]] recurrence restated declaratively): per round,
    * t = qv·v (per vector), w_j = Σ qv_j·t (per dimension), then the
    * ≤1024 TRUNCATING rescale — DuckDB `//` and Spark DIV / JVM `/`
    * all truncate toward zero, so the integer iterates agree exactly.
    * Ends with `v{iters}` (the direction), `vv` (Σv²), and `tf` (the
    * final per-vector projection). */
  private def pcaCtes(iters: Int): String = {
    val b = new StringBuilder
    b ++= """qv AS (SELECT vec_id, [CAST(round(CAST(x AS DOUBLE)*1000) AS BIGINT)
                  for x in embedding] AS qv FROM embeddings),
      dims AS (SELECT unnest(generate_series(1, 64)) AS j)"""
    for (it <- 1 to iters) {
      if (it == 1) {
        b ++= s""",
      t1 AS (SELECT vec_id, qv, list_aggregate(qv,'sum') AS t FROM qv),
      w1 AS (SELECT j, sum(qv[j]*t) AS w FROM t1 CROSS JOIN dims GROUP BY j)"""
      } else {
        b ++= s""",
      t$it AS (SELECT q.vec_id, sum(q.qv[v.j]*v.v) AS t
               FROM qv q CROSS JOIN v${it - 1} v GROUP BY q.vec_id),
      w$it AS (SELECT j, sum(q.qv[j]*t$it.t) AS w
               FROM qv q JOIN t$it ON q.vec_id = t$it.vec_id
               CROSS JOIN dims GROUP BY j)"""
      }
      b ++= s""",
      v$it AS (SELECT j, (w*1024)//s AS v FROM w$it CROSS JOIN
               (SELECT greatest(1, max(abs(w))) AS s FROM w$it))"""
    }
    b ++= s""",
      vv AS (SELECT sum(v*v) AS vv FROM v$iters),
      tf AS (SELECT q.vec_id, sum(q.qv[v.j]*v.v) AS t
             FROM qv q CROSS JOIN v$iters v GROUP BY q.vec_id)"""
    b.result()
  }

  /** Leading principal direction by rescaled power iteration
    * ([[graft.ops.Pca.principalDirection]]) — exact-integer mat-vec
    * via G·v = Xᵀ(X·v) (the Gram matrix never materializes), ≤1024
    * truncating rescale per round, Rayleigh eigenvalue over the
    * DECIMAL(38,0) channel. The direction an embedding pipeline
    * estimates before all-but-the-top removal (q198). */
  val q197 = Q(
    "q197_principal_direction",
    (s, dir) =>
      graft.ops.Pca.principalDirection(Tables(s, dir, "embeddings"),
        iters = 4),
    Some(s"""
      WITH ${pcaCtes(4)},
      st2 AS (SELECT sum(CAST(t AS HUGEINT)*t) AS st2 FROM tf)
      SELECT CAST(v.j AS INTEGER) AS dim,
        CASE WHEN vv.vv = 0 THEN 0.0
             ELSE CAST(v.v AS DOUBLE)/sqrt(CAST(vv.vv AS DOUBLE)) END AS u,
        CASE WHEN vv.vv = 0 THEN 0.0
             ELSE CAST(CAST(st2.st2 AS VARCHAR) AS DOUBLE)
               / CAST(vv.vv AS DOUBLE) / 1000000.0 END AS lambda
      FROM v4 v CROSS JOIN vv CROSS JOIN st2 ORDER BY dim"""),
    covers = Seq("TD-pca", "TD-embedding-stats"))

  /** All-but-the-top removal audit ([[graft.ops.Pca.removeTop]],
    * Mu & Viswanath 2018): per vector the exact integer projection
    * onto the iterated direction, the energy share the removal takes
    * (cos², one exact-double division chain), and the residual norm
    * computed as an exact integer sum over the DECIMAL(38,0)/HUGEINT
    * channel — no float accumulation anywhere. */
  val q198 = Q(
    "q198_abtt_removal",
    (s, dir) =>
      graft.ops.Pca.removeTop(Tables(s, dir, "embeddings"), iters = 4)
        .orderBy(col("vec_id")),
    Some(s"""
      WITH ${pcaCtes(4)},
      qn AS (SELECT vec_id, list_aggregate([x*x for x in qv],'sum')
               AS qnorm FROM qv),
      rr AS (SELECT vec_id, sum(aa*aa) AS raw FROM
               (SELECT q.vec_id,
                  CAST(q.qv[v.j]*vv.vv - tf.t*v.v AS HUGEINT) AS aa
                FROM qv q CROSS JOIN v4 v CROSS JOIN vv
                JOIN tf ON q.vec_id = tf.vec_id) GROUP BY vec_id)
      SELECT q.vec_id, CAST(tf.t AS BIGINT) AS dot,
        CASE WHEN vv.vv = 0 OR qn.qnorm = 0 THEN 0.0
             ELSE CAST(tf.t*tf.t AS DOUBLE) / CAST(vv.vv AS DOUBLE)
               / CAST(qn.qnorm AS DOUBLE) END AS removed_share,
        CASE WHEN vv.vv = 0 THEN CAST(qn.qnorm AS DOUBLE)/1000000.0
             ELSE CAST(CAST(rr.raw AS VARCHAR) AS DOUBLE)
               / CAST(vv.vv*vv.vv AS DOUBLE) / 1000000.0
        END AS residual_norm_sq
      FROM qv q JOIN tf ON q.vec_id = tf.vec_id
        JOIN qn ON q.vec_id = qn.vec_id
        JOIN rr ON q.vec_id = rr.vec_id
        CROSS JOIN vv
      ORDER BY q.vec_id"""),
    covers = Seq("TD-pca", "TD-embedding-stats"))

  /** Shared CTE prefix for the greedy-selection oracles: the quantized
    * store plus per-vector exact squared norms. */
  private val coresetBase = """
      qv AS (SELECT vec_id, [CAST(round(CAST(x AS DOUBLE)*1000) AS BIGINT)
                  for x in embedding] AS qv FROM embeddings),
      nq AS (SELECT vec_id, qv,
               CAST(list_sum([x*x for x in qv]) AS BIGINT) AS n FROM qv)"""

  /** Exact integer ‖a−b‖² between a row's list and a 1-row center's. */
  private def dist2(a: String, b: String): String =
    s"CAST(list_sum(list_transform(range(1, 65), j -> ($a[j]-$b[j])*($a[j]-$b[j]))) AS BIGINT)"

  /** Unrolled k-center greedy rounds ([[graft.ops.Coreset.kCenterGreedy]]
    * restated declaratively): c1 = max-norm seed; mI carries the min
    * distance to centers 1..I; cI+1 = argmax of that, ties on vec_id. */
  private def kCenterCtes(k: Int): String = {
    val b = new StringBuilder
    b ++= coresetBase
    b ++= """,
      c1 AS (SELECT vec_id, qv FROM nq ORDER BY n DESC, vec_id LIMIT 1),
      m1 AS (SELECT q.vec_id, q.qv, """ + dist2("q.qv", "c.qv") +
      """ AS mind FROM qv q CROSS JOIN c1 c)"""
    for (i <- 2 to k) {
      b ++= s""",
      c$i AS (SELECT vec_id, qv, mind FROM m${i - 1}
              ORDER BY mind DESC, vec_id LIMIT 1)"""
      if (i < k) b ++= s""",
      m$i AS (SELECT m.vec_id, m.qv,
                least(m.mind, ${dist2("m.qv", "c.qv")}) AS mind
              FROM m${i - 1} m CROSS JOIN c$i c)"""
    }
    b.result()
  }

  /** k-Center greedy coreset selection ([[graft.ops.Coreset.kCenterGreedy]],
    * Gonzalez 1985 / Sener & Savarese 2018) — farthest-point sampling
    * with the coverage-radius curve: k bounded scans, exact integer
    * distances, every argmax tie broken on vec_id. */
  val q199 = Q(
    "q199_kcenter_coreset",
    (s, dir) =>
      graft.ops.Coreset.kCenterGreedy(Tables(s, dir, "embeddings"), k = 8),
    Some(s"""
      WITH ${kCenterCtes(8)},
      picks AS (
        SELECT 1 AS rk, vec_id, CAST(NULL AS BIGINT) AS radius_sq FROM c1
        ${(2 to 8).map(i =>
          s"UNION ALL SELECT $i, vec_id, mind FROM c$i").mkString("\n        ")}
      )
      SELECT rk, vec_id, radius_sq,
        sqrt(CAST(radius_sq AS DOUBLE))/1000.0 AS radius
      FROM picks ORDER BY rk"""),
    covers = Seq("TD-coreset", "TD-embedding-stats"))

  /** Guarded exact-int cosine between a candidate row `c` and a 1-row
    * selection `s` — the [[graft.functions.VectorFunctions.cosineFrom]]
    * channel restated (zero-norm → 0.0, one IEEE division). */
  private def cosSql(c: String, s: String): String =
    s"""CASE WHEN $c.n = 0 OR $s.n = 0 THEN 0.0
        ELSE CAST(CAST(list_sum(list_transform(range(1, 65),
               j -> $c.qv[j]*$s.qv[j])) AS BIGINT) AS DOUBLE)
          / (sqrt(CAST($c.n AS DOUBLE)) * sqrt(CAST($s.n AS DOUBLE)))
        END"""

  /** Unrolled MMR rounds ([[graft.ops.Coreset.mmrTopK]]): the min-id
    * query vector, relevance cosines, then per round the running max
    * similarity to the chosen set and the λ=1/2 argmax. */
  private def mmrCtes(k: Int): String = {
    val b = new StringBuilder
    b ++= coresetBase
    b ++= s""",
      qr AS (SELECT vec_id, qv, n FROM nq ORDER BY vec_id LIMIT 1),
      cand AS (SELECT d.vec_id, d.qv, d.n, ${cosSql("d", "q")} AS rel
               FROM nq d CROSS JOIN qr q WHERE d.vec_id <> q.vec_id),
      s1 AS (SELECT vec_id, qv, n, rel FROM cand
             ORDER BY rel DESC, vec_id LIMIT 1),
      p1 AS (SELECT c.vec_id, c.qv, c.n, c.rel, ${cosSql("c", "s")} AS pen
             FROM cand c CROSS JOIN s1 s WHERE c.vec_id <> s.vec_id)"""
    for (i <- 2 to k) {
      b ++= s""",
      s$i AS (SELECT vec_id, qv, n, rel, pen FROM p${i - 1}
              ORDER BY 0.5*rel - 0.5*pen DESC, vec_id LIMIT 1)"""
      if (i < k) b ++= s""",
      p$i AS (SELECT c.vec_id, c.qv, c.n, c.rel,
                greatest(c.pen, ${cosSql("c", "s")}) AS pen
              FROM p${i - 1} c CROSS JOIN s$i s WHERE c.vec_id <> s.vec_id)"""
    }
    b.result()
  }

  /** MMR-diversified top-k ([[graft.ops.Coreset.mmrTopK]], Carbonell &
    * Goldstein 1998) — λ=1/2 relevance-vs-redundancy greedy re-rank;
    * the power-of-two λ keeps every score an exact IEEE composition of
    * the integer-exact cosines, so the ranking is engine-stable. */
  val q200 = Q(
    "q200_mmr_diversified_topk",
    (s, dir) =>
      graft.ops.Coreset.mmrTopK(Tables(s, dir, "embeddings"), k = 6),
    Some(s"""
      WITH ${mmrCtes(6)},
      picks AS (
        SELECT 1 AS rk, vec_id, rel AS relevance,
          CAST(NULL AS DOUBLE) AS penalty FROM s1
        ${(2 to 6).map(i =>
          s"UNION ALL SELECT $i, vec_id, rel, pen FROM s$i").mkString("\n        ")}
      )
      SELECT rk, vec_id, relevance, penalty,
        0.5*relevance - 0.5*coalesce(penalty, 0.0) AS mmr_score
      FROM picks ORDER BY rk"""),
    covers = Seq("TD-coreset", "TD-mmr"))

  /** The q167 add-one bigram-LM CTE chain (tokens → bigram instances →
    * count tables → decimal-channel per-doc scores), shared by the
    * bucketing oracle. */
  private val lmScoreCtes = """
      toks AS (SELECT doc_id, string_split(text,' ') AS ws
               FROM documents),
      bgp AS (SELECT doc_id, ws[i]||' '||ws[i+1] AS bg, ws[i] AS w1
              FROM (SELECT doc_id, ws,
                      unnest(generate_series(1, len(ws)-1)) AS i
                    FROM toks WHERE len(ws) >= 2)),
      bi AS (SELECT bg, count(*) AS c_bi FROM bgp GROUP BY bg),
      uni AS (SELECT tok, count(*) AS c_uni FROM
                (SELECT unnest(ws) AS tok FROM toks) GROUP BY tok),
      v AS (SELECT count(*) AS vv FROM uni),
      inst AS (SELECT doc_id,
                 CAST(ln((CAST(c_bi AS DOUBLE) + 1.0)
                   / (CAST(c_uni AS DOUBLE) + CAST(vv AS DOUBLE)))
                   AS DECIMAL(18,6)) AS lp
               FROM bgp JOIN bi USING (bg)
                        JOIN uni ON bgp.w1 = uni.tok, v),
      per AS (SELECT doc_id, count(*) AS nb, sum(lp) AS slp
              FROM inst GROUP BY doc_id),
      sc AS (SELECT d.doc_id, d.source,
               CAST(coalesce(nb, 0) AS BIGINT) AS n_bigrams,
               CASE WHEN coalesce(nb, 0) = 0 THEN 0.0
                    ELSE CAST(CAST(slp AS VARCHAR) AS DOUBLE)
                      / CAST(nb AS DOUBLE) END AS avg_logp
             FROM documents d LEFT JOIN per USING (doc_id))"""

  /** CCNet head/middle/tail perplexity split
    * ([[graft.ops.NgramLm.perplexityBuckets]], Wenzek et al. 2020
    * §4.3) — per-source LM-score terciles over the q167 decimal-channel
    * scores; head+middle is what CCNet keeps. Unrankable docs
    * (n_bigrams = 0) get a NULL bucket and kept = false rather than
    * crowding the head with their defined-but-meaningless 0.0. */
  val q201 = Q(
    "q201_ccnet_buckets",
    (s, dir) =>
      graft.ops.NgramLm.perplexityBuckets(Tables(s, dir, "documents")),
    Some(s"""
      WITH $lmScoreCtes,
      rk AS (SELECT doc_id, source, n_bigrams, avg_logp,
               CAST(ntile(3) OVER (PARTITION BY source
                 ORDER BY avg_logp DESC, doc_id) AS INTEGER) AS bucket
             FROM sc WHERE n_bigrams > 0
             UNION ALL
             SELECT doc_id, source, n_bigrams, avg_logp,
               CAST(NULL AS INTEGER)
             FROM sc WHERE n_bigrams = 0)
      SELECT doc_id, source, n_bigrams, avg_logp, bucket,
        CASE WHEN bucket = 1 THEN 'head' WHEN bucket = 2 THEN 'middle'
             WHEN bucket = 3 THEN 'tail' ELSE 'unscored' END AS label,
        coalesce(bucket <= 2, false) AS kept
      FROM rk ORDER BY doc_id"""),
    covers = Seq("TD-lm-score", "TD-curation-policy"))

  /** Interpolated Kneser-Ney bigram scoring
    * ([[graft.ops.NgramLm.kneserNeyScore]], Kneser & Ney 1995 — the
    * KenLM statistic behind the real CCNet filter): absolute discount
    * D = 3/4 interpolating toward the add-one-floored continuation
    * distribution; every probability one IEEE division of exact int64
    * products, every ln on the DECIMAL(18,6) channel. */
  val q202 = Q(
    "q202_kneser_ney_score",
    (s, dir) =>
      graft.ops.NgramLm.kneserNeyScore(Tables(s, dir, "documents")),
    Some("""
      WITH toks AS (SELECT doc_id, string_split(text,' ') AS ws
                    FROM documents),
      bgp AS (SELECT doc_id, ws[i]||' '||ws[i+1] AS bg,
                ws[i] AS w1, ws[i+1] AS w2
              FROM (SELECT doc_id, ws,
                      unnest(generate_series(1, len(ws)-1)) AS i
                    FROM toks WHERE len(ws) >= 2)),
      bi AS (SELECT bg, count(*) AS c_bi FROM bgp GROUP BY bg),
      bw AS (SELECT bg, c_bi, string_split(bg, ' ')[1] AS w1,
               string_split(bg, ' ')[2] AS w2 FROM bi),
      pre AS (SELECT w1, sum(c_bi) AS c_pre, count(*) AS n1
              FROM bw GROUP BY w1),
      cont AS (SELECT w2, count(*) AS n2 FROM bw GROUP BY w2),
      uni AS (SELECT tok, count(*) AS c_uni FROM
                (SELECT unnest(ws) AS tok FROM toks) GROUP BY tok),
      tot AS (SELECT (SELECT count(*) FROM bi) AS nt,
                     (SELECT count(*) FROM uni) AS vv),
      inst AS (SELECT bgp.doc_id,
                 CAST(ln(
                   CAST(greatest(4*c_bi - 3, 0)*(nt + vv)
                        + 3*n1*(n2 + 1) AS DOUBLE)
                   / CAST(4*c_pre*(nt + vv) AS DOUBLE))
                   AS DECIMAL(18,6)) AS lp
               FROM bgp JOIN bi USING (bg)
                        JOIN pre ON bgp.w1 = pre.w1
                        JOIN cont ON bgp.w2 = cont.w2, tot),
      per AS (SELECT doc_id, count(*) AS nb, sum(lp) AS slp
              FROM inst GROUP BY doc_id)
      SELECT d.doc_id, CAST(coalesce(nb, 0) AS BIGINT) AS n_bigrams,
        CASE WHEN coalesce(nb, 0) = 0 THEN 0.0
             ELSE CAST(CAST(slp AS VARCHAR) AS DOUBLE)
               / CAST(nb AS DOUBLE) END AS avg_logp
      FROM documents d LEFT JOIN per USING (doc_id) ORDER BY doc_id"""),
    covers = Seq("TD-lm-score", "TD-kneser-ney"))

  /** Audio-dedup RESOLUTION — q195's perceptual pairs carried to the
    * keeper decision, completing the modality matrix's resolution row
    * (text q77, image q193, now sound): Hamming-≤2 band-hash pairs
    * resolve into connected components (min-label pointer-jumping /
    * bounded union-find), every clip — singletons included — gets
    * (cluster, keep). Consumes the session-shared
    * [[audioBandHashTable]]; no re-decode. Oracle: the q193 recursive
    * reachability closure over q195's closed-form recomputed band
    * energies. */
  val q203 = Q(
    "q203_audio_dedup_decision",
    (s, dir) => {
      val hashes = audioBandHashTable(s, dir)
      val pairs = Dedup.hammingNearPairs(hashes, "media_id", maxDist = 2,
          bits = 64, hashCol = "bhash")
        .select(col("id_a"), col("id_b")).localCheckpoint()
      val decided = Dedup.dedupDecision(hashes.select(col("media_id")),
        "media_id", pairs)
      graft.CacheTracker.releaseCheckpoint(pairs)
      decided.orderBy(col("media_id"))
    },
    Some("""
      WITH RECURSIVE m AS (
        SELECT doc_id AS media_id, doc_id AS base, FALSE AS pert,
               CAST(1000 + (doc_id % 7) * 100 AS BIGINT) AS n
        FROM documents
        UNION ALL
        SELECT doc_id + 10000000, doc_id, TRUE,
               CAST(1000 + (doc_id % 7) * 100 AS BIGINT)
        FROM documents WHERE doc_id % 4 = 0),
      s AS (SELECT media_id,
              t.t * 65 // n AS win,
              abs(CASE WHEN pert AND t.t < 4 THEN 32767
                   ELSE ((t.t * t.t * 31 + t.t * base * 17
                          + base * base * 7) % 65536) - 32768 END) AS av
            FROM m, range(0, 1600) t(t) WHERE t.t < n),
      e AS (SELECT media_id, win, sum(av) AS s FROM s
            GROUP BY media_id, win),
      b AS (SELECT lo.media_id, lo.win AS bitpos,
              CASE WHEN hi.s > lo.s THEN '1' ELSE '0' END AS b
            FROM e lo JOIN e hi ON lo.media_id = hi.media_id
                                AND hi.win = lo.win + 1
            WHERE lo.win < 64),
      hs AS (SELECT media_id, string_agg(b, '' ORDER BY bitpos) AS hstr
             FROM b GROUP BY media_id),
      pairs AS (SELECT a.media_id AS id_a, b.media_id AS id_b
                FROM hs a JOIN hs b ON a.media_id < b.media_id
                WHERE hamming(a.hstr, b.hstr) <= 2),
      edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
                UNION ALL
                SELECT id_b AS src, id_a AS dst FROM pairs),
      reach AS (
        SELECT media_id AS node, media_id AS mn FROM m
        UNION
        SELECT e.dst AS node, r.mn
        FROM reach r JOIN edges e ON e.src = r.node
      )
      SELECT node AS media_id, MIN(mn) AS cluster, node = MIN(mn) AS keep
      FROM reach GROUP BY node ORDER BY media_id"""),
    covers = Seq("TD-dedup-audio", "TD-dedup-clusters"))

  /** Simplified silhouette over the q127-trained clusters
    * ([[graft.ops.KMeans.silhouette]], Hruschka et al. 2004's
    * centroid-based variant): the clustering-quality gate that decides
    * whether the learned structure feeding cluster-balanced sampling
    * (q194) and IVF routing (q128) is worth trusting — a(i) = distance
    * to own centroid, b(i) = min distance to any other, s(i) =
    * (b−a)/max(a,b), per-cluster count + mean. O(n·k) broadcast pass,
    * never the O(n²) textbook form; the oracle replays the q127 Lloyd
    * chain then scores every vector through the same DECIMAL(18,6)
    * channel. */
  val q204 = Q(
    "q204_silhouette",
    (s, dir) => {
      graft.ops.KMeans.silhouette(Tables(s, dir, "embeddings"), k = 4,
        iters = 1)
    },
    Some(s"""
      WITH $dkQuantized,
      $dkKmeansCtes,
      r AS (SELECT vec_id, cid, dist_sq,
              row_number() OVER (PARTITION BY vec_id
                ORDER BY dist_sq, cid) AS rn
            FROM d2),
      ab AS (SELECT vec_id,
               max(CASE WHEN rn = 1 THEN cid END) AS cluster,
               max(CASE WHEN rn = 1 THEN dist_sq END) AS a_sq,
               min(CASE WHEN rn > 1 THEN dist_sq END) AS b_sq
             FROM r GROUP BY vec_id),
      sil AS (SELECT cluster,
                CAST(CASE WHEN greatest(sqrt(a_sq), sqrt(b_sq)) = 0
                          THEN 0.0
                     ELSE (sqrt(b_sq) - sqrt(a_sq))
                          / greatest(sqrt(a_sq), sqrt(b_sq)) END
                     AS DECIMAL(18,6)) AS s
              FROM ab)
      SELECT cluster, CAST(count(*) AS BIGINT) AS n,
             CAST(CAST(sum(s) AS VARCHAR) AS DOUBLE)
               / CAST(count(*) AS DOUBLE) AS avg_sil
      FROM sil GROUP BY cluster ORDER BY cluster"""),
    covers = Seq("TD-kmeans", "TD-cluster-quality"))

  /** The fingerprint-detector quality harness shared by all three
    * binary modalities (q205 image, q214 audio, q215 video): planted
    * truth is known by construction (every fourth doc got a retouched
    * twin at id+10⁷), detected = Hamming-≤2 pairs off the modality's
    * session-shared fingerprint table, score = exact-int hit counting
    * + two final IEEE divisions. */
  private def neardupQuality(s: org.apache.spark.sql.SparkSession,
      dir: String, hashes: org.apache.spark.sql.DataFrame,
      hashCol: String,
      confirmHam: Seq[(String, Int)] = Nil,
      confirmEq: Seq[String] = Nil): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    val detected = Dedup.hammingNearPairsConfirmed(hashes, "media_id",
        maxDist = 2, bits = 64, hashCol = hashCol,
        confirmHam = confirmHam, confirmEq = confirmEq)
      .select(col("id_a"), col("id_b"))
    val planted = Tables(s, dir, "documents").select($"doc_id")
      .filter($"doc_id" % 4 === 0)
      .select($"doc_id".as("id_a"), ($"doc_id" + 10000000L).as("id_b"))
    val hit = detected.join(planted, Seq("id_a", "id_b"), "left_semi")
    detected.agg(count(lit(1)).as("n_detected"))
      .crossJoin(planted.agg(count(lit(1)).as("n_planted")))
      .crossJoin(hit.agg(count(lit(1)).as("n_hit")))
      .select(col("n_detected"), col("n_planted"), col("n_hit"),
        (col("n_hit").cast("double") / col("n_detected").cast("double"))
          .as("precision"),
        (col("n_hit").cast("double") / col("n_planted").cast("double"))
          .as("recall"))
  }

  /** Image near-dup QUALITY harness — the q112/q183 recall-precision
    * protocol applied to the perceptual-hash detector: the planted
    * truth is known by construction (every fourth doc got a retouched
    * twin at id+10⁷), the detected set is q190's Hamming-≤2 pairs off
    * the session-shared fingerprint table, and the score is exact-int
    * hit counting with two final IEEE divisions. This is the gate a
    * crawl pipeline runs before trusting a fingerprint family at a
    * threshold: precision says how much it over-merges, recall says
    * how many retouched twins escape. Oracle: q190's closed-form
    * fingerprint chain + the same planted set. */
  val q205 = Q(
    "q205_image_neardup_quality",
    (s, dir) => neardupQuality(s, dir, imageDHashTable(s, dir), "dhash"),
    Some("""
      WITH m AS (
        SELECT doc_id AS media_id, doc_id AS base, FALSE AS pert,
               CAST(8 + doc_id % 9 AS INT) AS w,
               CAST(8 + doc_id % 7 AS INT) AS h,
               CAST(3 + doc_id % 13 AS INT) AS sa,
               CAST(5 + doc_id % 11 AS INT) AS sb
        FROM documents
        UNION ALL
        SELECT doc_id + 10000000, doc_id, TRUE,
               CAST(8 + doc_id % 9 AS INT), CAST(8 + doc_id % 7 AS INT),
               CAST(3 + doc_id % 13 AS INT), CAST(5 + doc_id % 11 AS INT)
        FROM documents WHERE doc_id % 4 = 0),
      g AS (
        SELECT media_id, y.j * 8 + x.i AS bitpos,
               CASE WHEN
                 (CASE WHEN pert AND ((x.i+1) * w // 9) = 0
                            AND (y.j * h // 8) = 0 THEN 255
                       ELSE (((x.i+1) * w // 9) * ((x.i+1) * w // 9) * 3
                             + (y.j * h // 8) * (y.j * h // 8) * 5
                             + ((x.i+1) * w // 9) * (y.j * h // 8) * 7
                             + ((x.i+1) * w // 9) * sa
                             + (y.j * h // 8) * sb + base) % 256 END)
                 >
                 (CASE WHEN pert AND (x.i * w // 9) = 0
                            AND (y.j * h // 8) = 0 THEN 255
                       ELSE ((x.i * w // 9) * (x.i * w // 9) * 3
                             + (y.j * h // 8) * (y.j * h // 8) * 5
                             + (x.i * w // 9) * (y.j * h // 8) * 7
                             + (x.i * w // 9) * sa
                             + (y.j * h // 8) * sb + base) % 256 END)
                 THEN '1' ELSE '0' END AS b
        FROM m, range(0, 8) x(i), range(0, 8) y(j)),
      hs AS (SELECT media_id, string_agg(b, '' ORDER BY bitpos) AS hstr
             FROM g GROUP BY media_id),
      det AS (SELECT a.media_id AS id_a, b.media_id AS id_b
              FROM hs a JOIN hs b ON a.media_id < b.media_id
              WHERE hamming(a.hstr, b.hstr) <= 2),
      pl AS (SELECT doc_id AS id_a, doc_id + 10000000 AS id_b
             FROM documents WHERE doc_id % 4 = 0),
      hit AS (SELECT * FROM det SEMI JOIN pl USING (id_a, id_b))
      SELECT
        (SELECT count(*) FROM det) AS n_detected,
        (SELECT count(*) FROM pl) AS n_planted,
        (SELECT count(*) FROM hit) AS n_hit,
        CAST((SELECT count(*) FROM hit) AS DOUBLE)
          / CAST((SELECT count(*) FROM det) AS DOUBLE) AS precision,
        CAST((SELECT count(*) FROM hit) AS DOUBLE)
          / CAST((SELECT count(*) FROM pl) AS DOUBLE) AS recall"""),
    covers = Seq("TD-dedup-image", "TD-harness-quality"))

  /** Video near-dup — the LAST modality of the dedup matrix (text
    * q21–q25, embeddings q26/q111, pixels q190, sound q195, now
    * clips): each doc id renders to a REAL uncompressed-DIB AVI, every
    * fourth doc also gets a retouched-intro variant (frame 0's first
    * pixel pinned — the watermarked re-upload crawl case), the engine
    * parses the actual container, decodes every frame, fingerprints
    * the clip with the three-channel fingerprint
    * ([[graft.ops.Multimodal.VideoCodec.fingerprint]] — temporal
    * strict-majority dHash + frame-0 dHash + exact last-frame grid
    * signature), candidates come from the SimHash pigeonhole
    * machinery on the temporal hash, and every candidate passes the
    * TWO-STAGE confirm (round-9 VERDICT ask #1: the single-stage
    * majority hash measured 0.82 precision — same-texture collisions;
    * the confirm channels take the planted gate to 1.0/1.0 at both
    * sf0.01 and sf0.1). The oracle recomputes every frame bit, the
    * majority vote, the confirm hash, and all 72 tail samples from
    * the closed-form pixel function, so a parser or kernel that
    * mis-decodes one sampled pixel hash-fails. */
  private val tHashMemo =
    new graft.SessionMemo[org.apache.spark.sql.DataFrame]()

  /** Session-shared clip-fingerprint table over the synthetic AVI
    * corpus — parsed, frame-decoded + fingerprinted ONCE per
    * (session, sf dir), the [[imageDHashTable]] pattern on the video
    * modality; the pair query (q206), the keeper resolution (q210)
    * and the quality gate (q215) all consume it. Since round 10 the
    * table carries the full THREE-channel fingerprint
    * ([[graft.ops.Multimodal.VideoCodec.fingerprint]]): the
    * temporal-majority candidate hash plus both confirm channels
    * (frame-0 dHash, exact last-frame grid signature) — computed in
    * the same single decode pass, so the two-stage verify costs zero
    * extra decodes. Untracked localCheckpoint, `EdwQueries.star`
    * precedent. */
  private def videoFpTable(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    tHashMemo.getOrElseUpdate(s, dir, {
        import s.implicits._
        import graft.ops.Multimodal
        val media = Tables(s, dir, "documents").select($"doc_id")
          .as[Long].flatMap { id =>
            val orig = Multimodal.MediaRow(id, "video",
              Multimodal.VideoCodec.syntheticAviTextured(id, pert = false))
            if (id % 4 == 0)
              Seq(orig, Multimodal.MediaRow(id + 10000000L, "video",
                Multimodal.VideoCodec
                  .syntheticAviTextured(id, pert = true)))
            else Seq(orig)
          }
        Multimodal.videoFingerprints(media).toDF().localCheckpoint()
      })

  /** The two confirm channels every video-family query applies on top
    * of the temporal-hash candidates (see
    * [[graft.ops.Dedup.hammingNearPairsConfirmed]]): intro-frame dHash
    * within the same radius (a 1-pixel watermark touch-up flips at
    * most two grid comparisons under thumbnail oversampling, so
    * planted twins stay ≤ 2 = the radius), and the
    * exact last-frame grid signature (DIB decode is lossless — a true
    * re-upload's untouched tail frame is byte-identical). */
  private val videoConfirmHam = Seq("fhash0" -> 2)
  private val videoConfirmEq = Seq("tail_sig")

  /** Shared DuckDB oracle fragment for the video family (q206/q210/
    * q215): the closed-form THREE-channel clip fingerprint — per-frame
    * grid bits (fb), the temporal strict-majority hash (vb/hs), the
    * frame-0 confirm hash (f0), the exact last-frame grid signature
    * (ts) — and the two-stage pair set (vpairs): temporal Hamming <= 2
    * AND intro-frame Hamming <= 2 AND byte-equal tail signature,
    * mirroring [[videoConfirmHam]]/[[videoConfirmEq]] bit for bit. */
  private val videoFpSql = """m AS (
        SELECT doc_id AS media_id, doc_id AS base, FALSE AS pert,
               CAST(2 + doc_id % 3 AS INT) AS nf,
               CAST(8 + doc_id % 5 AS INT) AS w,
               CAST(6 + doc_id % 4 AS INT) AS h,
               CAST(3 + doc_id % 13 AS INT) AS sa,
               CAST(5 + doc_id % 11 AS INT) AS sb
        FROM documents
        UNION ALL
        SELECT doc_id + 10000000, doc_id, TRUE,
               CAST(2 + doc_id % 3 AS INT), CAST(8 + doc_id % 5 AS INT),
               CAST(6 + doc_id % 4 AS INT), CAST(3 + doc_id % 13 AS INT),
               CAST(5 + doc_id % 11 AS INT)
        FROM documents WHERE doc_id % 4 = 0),
      fb AS (
        SELECT media_id, nf, y.j * 8 + x.i AS bitpos, f.f AS f,
               CASE WHEN
                 (CASE WHEN pert AND f.f = 0 AND ((x.i+1) * w // 9) = 0
                            AND (y.j * h // 8) = 0 THEN 255
                       ELSE (((x.i+1) * w // 9) * ((x.i+1) * w // 9) * 3
                             + (y.j * h // 8) * (y.j * h // 8) * 5
                             + ((x.i+1) * w // 9) * (y.j * h // 8) * 7
                             + ((x.i+1) * w // 9) * sa
                             + (y.j * h // 8) * sb
                             + f.f * 31 + base) % 256 END)
                 >
                 (CASE WHEN pert AND f.f = 0 AND (x.i * w // 9) = 0
                            AND (y.j * h // 8) = 0 THEN 255
                       ELSE ((x.i * w // 9) * (x.i * w // 9) * 3
                             + (y.j * h // 8) * (y.j * h // 8) * 5
                             + (x.i * w // 9) * (y.j * h // 8) * 7
                             + (x.i * w // 9) * sa
                             + (y.j * h // 8) * sb
                             + f.f * 31 + base) % 256 END)
                 THEN 1 ELSE 0 END AS bit
        FROM m, range(0, 4) f(f), range(0, 8) x(i), range(0, 8) y(j)
        WHERE f.f < nf),
      vb AS (SELECT media_id, bitpos,
               CASE WHEN 2 * sum(bit) > max(nf) THEN '1' ELSE '0' END AS b
             FROM fb GROUP BY media_id, bitpos),
      hs AS (SELECT media_id, string_agg(b, '' ORDER BY bitpos) AS hstr
             FROM vb GROUP BY media_id),
      f0 AS (SELECT media_id,
               string_agg(CASE WHEN bit = 1 THEN '1' ELSE '0' END,
                 '' ORDER BY bitpos) AS f0h
             FROM fb WHERE f = 0 GROUP BY media_id),
      ts AS (
        SELECT media_id,
               string_agg(CAST(v AS VARCHAR), ',' ORDER BY pos) AS tsig
        FROM (
          SELECT media_id, y.j * 9 + x.i AS pos,
                 CASE WHEN pert AND nf - 1 = 0 AND (x.i * w // 9) = 0
                           AND (y.j * h // 8) = 0 THEN 255
                      ELSE ((x.i * w // 9) * (x.i * w // 9) * 3
                            + (y.j * h // 8) * (y.j * h // 8) * 5
                            + (x.i * w // 9) * (y.j * h // 8) * 7
                            + (x.i * w // 9) * sa
                            + (y.j * h // 8) * sb
                            + (nf - 1) * 31 + base) % 256 END AS v
          FROM m, range(0, 9) x(i), range(0, 8) y(j))
        GROUP BY media_id),
      fp AS (SELECT h.media_id, h.hstr, f.f0h, t.tsig
             FROM hs h JOIN f0 f USING (media_id)
                       JOIN ts t USING (media_id)),
      vpairs AS (
        SELECT a.media_id AS id_a, b.media_id AS id_b,
               CAST(hamming(a.hstr, b.hstr) AS BIGINT) AS hamming
        FROM fp a JOIN fp b ON a.media_id < b.media_id
        WHERE hamming(a.hstr, b.hstr) <= 2
          AND hamming(a.f0h, b.f0h) <= 2
          AND a.tsig = b.tsig)"""

  val q206 = Q(
    "q206_video_neardup",
    (s, dir) => {
      import s.implicits._
      val fps = videoFpTable(s, dir)
      Dedup.hammingNearPairsConfirmed(fps, "media_id", maxDist = 2,
          bits = 64, hashCol = "thash",
          confirmHam = videoConfirmHam, confirmEq = videoConfirmEq)
        .withColumn("hamming", col("hamming").cast("long"))
        .orderBy($"id_a", $"id_b")
    },
    Some(s"""
      WITH $videoFpSql
      SELECT id_a, id_b, hamming FROM vpairs ORDER BY id_a, id_b"""),
    covers = Seq("TD-dedup-video", "TD-multimodal"))

  /** Video-dedup RESOLUTION — q206's two-stage-confirmed pairs
    * carried to the keeper decision, completing the resolution row
    * across every binary modality (image q193, audio q203, now
    * clips): confirmed pairs resolve into connected components, every
    * clip gets (cluster, keep). Consuming CONFIRMED pairs matters
    * here more than anywhere — CC is transitive, so one false pair
    * merges two whole families and the keeper deletes a family's
    * worth of real content. Consumes the session-shared
    * [[videoFpTable]]; no container re-parse. Oracle: the q193
    * recursive reachability closure over the closed-form two-stage
    * pair set. */
  val q210 = Q(
    "q210_video_dedup_decision",
    (s, dir) => {
      val fps = videoFpTable(s, dir)
      val pairs = Dedup.hammingNearPairsConfirmed(fps, "media_id",
          maxDist = 2, bits = 64, hashCol = "thash",
          confirmHam = videoConfirmHam, confirmEq = videoConfirmEq)
        .select(col("id_a"), col("id_b")).localCheckpoint()
      val decided = Dedup.dedupDecision(fps.select(col("media_id")),
        "media_id", pairs)
      graft.CacheTracker.releaseCheckpoint(pairs)
      decided.orderBy(col("media_id"))
    },
    Some(s"""
      WITH RECURSIVE $videoFpSql,
      edges AS (SELECT id_a AS src, id_b AS dst FROM vpairs
                UNION ALL
                SELECT id_b AS src, id_a AS dst FROM vpairs),
      reach AS (
        SELECT media_id AS node, media_id AS mn FROM m
        UNION
        SELECT e.dst AS node, r.mn
        FROM reach r JOIN edges e ON e.src = r.node
      )
      SELECT node AS media_id, MIN(mn) AS cluster, node = MIN(mn) AS keep
      FROM reach GROUP BY node ORDER BY media_id"""),
    covers = Seq("TD-dedup-video", "TD-dedup-clusters"))

  /** Zipf-slope fit ([[CorpusPipeline.zipfSlope]], Zipf 1949 /
    * Piantadosi 2014): OLS of ln(freq) on ln(rank) over the top-100
    * vocabulary head — the one-number token-distribution health check
    * (α ≈ −slope drifting from ~1 flags boilerplate flooding or
    * over-cleaning). q93's TakeOrdered head, the decimal-ln channel,
    * exact k-row sums, and a fixed IEEE expression for the fit —
    * every intermediate oracle-exact. */
  val q208 = Q(
    "q208_zipf_slope",
    (s, dir) => {
      import graft.pipelines.CorpusPipeline
      CorpusPipeline.zipfSlope(Tables(s, dir, "documents"), k = 100)
    },
    Some("""
      WITH t AS (SELECT unnest(string_split(text, ' ')) AS token
                 FROM documents),
      c AS (SELECT token, count(*) AS n_occ FROM t GROUP BY 1),
      top AS (SELECT token, n_occ FROM c
              ORDER BY n_occ DESC, token LIMIT 100),
      r AS (SELECT row_number() OVER (ORDER BY n_occ DESC, token) AS rnk,
              n_occ FROM top),
      p AS (SELECT CAST(ln(CAST(rnk AS DOUBLE)) AS DECIMAL(18,6)) AS x,
              CAST(ln(CAST(n_occ AS DOUBLE)) AS DECIMAL(18,6)) AS y
            FROM r),
      p2 AS (SELECT x, y, x * y AS xy, x * x AS xx FROM p),
      s AS (SELECT CAST(count(*) AS BIGINT) AS n,
              CAST(CAST(sum(x) AS VARCHAR) AS DOUBLE) AS sx,
              CAST(CAST(sum(y) AS VARCHAR) AS DOUBLE) AS sy,
              CAST(CAST(sum(xy) AS VARCHAR) AS DOUBLE) AS sxy,
              CAST(CAST(sum(xx) AS VARCHAR) AS DOUBLE) AS sxx
            FROM p2)
      SELECT n,
        (CAST(n AS DOUBLE) * sxy - sx * sy)
          / (CAST(n AS DOUBLE) * sxx - sx * sx) AS slope,
        (sy - ((CAST(n AS DOUBLE) * sxy - sx * sy)
               / (CAST(n AS DOUBLE) * sxx - sx * sx)) * sx)
          / CAST(n AS DOUBLE) AS intercept
      FROM s"""),
    covers = Seq("TD-corpus-stats", "TD-vocab-head"))

  /** Heaps'-law curve ([[CorpusPipeline.heapsLaw]], Heaps 1978):
    * exact vocabulary size vs tokens seen at 16 evenly spaced doc-id
    * cutoffs — each token type reduces to its FIRST containing doc,
    * buckets into its covering checkpoint through exact integer
    * cutoffs, and two 16-row cumulative sums produce the curve. The
    * sublinearity diagnostic for tokenizer planning and
    * boilerplate-corpus detection, with no global sort anywhere. */
  val q209 = Q(
    "q209_heaps_law",
    (s, dir) => {
      import graft.pipelines.CorpusPipeline
      CorpusPipeline.heapsLaw(Tables(s, dir, "documents"),
        nCheckpoints = 16)
    },
    Some("""
      WITH mx AS (SELECT max(doc_id) AS m FROM documents),
      tk AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
             FROM documents),
      fd AS (SELECT tok, min(doc_id) AS fdoc FROM tk GROUP BY 1),
      fb AS (SELECT list_min([i for i in generate_series(1, 16)
                              if (m * i) // 16 >= fdoc]) AS ck
             FROM fd, mx),
      nt AS (SELECT ck, count(*) AS new_types FROM fb GROUP BY 1),
      dt AS (SELECT list_min([i for i in generate_series(1, 16)
                              if (m * i) // 16 >= doc_id]) AS ck,
               len(string_split(text, ' ')) AS ntk
             FROM documents, mx),
      dtg AS (SELECT ck, sum(ntk) AS new_tokens FROM dt GROUP BY 1),
      sp AS (SELECT i AS ckpt, (m * i) // 16 AS cut_doc_id
             FROM generate_series(1, 16) g(i), mx)
      SELECT CAST(ckpt AS BIGINT) AS ckpt,
             CAST(cut_doc_id AS BIGINT) AS cut_doc_id,
             CAST(sum(coalesce(new_tokens, 0)) OVER (ORDER BY ckpt)
               AS BIGINT) AS tokens_seen,
             CAST(sum(coalesce(new_types, 0)) OVER (ORDER BY ckpt)
               AS BIGINT) AS vocab_size
      FROM sp LEFT JOIN nt ON nt.ck = sp.ckpt
              LEFT JOIN dtg ON dtg.ck = sp.ckpt
      ORDER BY ckpt"""),
    covers = Seq("TD-corpus-stats", "TD-vocab-head"))

  /** Metadata-FILTERED ANN ([[Dedup.annTopKLshFiltered]]): top-5 by
    * exact integer cosine among only same-`label` candidates — the
    * filtered vector search every production store serves (language/
    * tenant/split-constrained retrieval). The filter column joins INTO
    * the LSH bucket key, so pruning happens at candidate generation,
    * not as a post-filter that starves below k; bits shrinks to 2
    * because the effective corpus per (bucket, label) cell is the
    * label partition, ~1/10th of the table — the bits knob follows
    * per-partition density, exactly as a production store sizes
    * per-tenant index granularity. Oracle: q52's bucket recompute +
    * the label equality. */
  val q211 = Q(
    "q211_ann_filtered",
    (s, dir) => {
      import s.implicits._
      val emb = Tables(s, dir, "embeddings")
      Dedup.annTopKLshFiltered(emb, emb.filter($"vec_id" < 10),
          "vec_id", "embedding", "label", k = 5, bits = 2)
        .orderBy(col("id_q"), col("rank"))
    },
    Some {
      val dotW = (alias: String) => (0 until 2).map { j =>
        val a = T.minhashA(j); val b = T.minhashB(j)
        s"""CASE WHEN list_aggregate([$alias.qv[ij] * ((($a*ij + $b) % 1009) - 504)
             for ij in generate_series(1,64)], 'sum') >= 0
           THEN ${1L << j} ELSE 0 END"""
      }.mkString(" + ")
      s"""
      WITH $dkQuantized,
      b AS (SELECT n.vec_id, n.qv, n.nsq, e.label, ${dotW("n")} AS bucket
            FROM n JOIN embeddings e ON e.vec_id = n.vec_id),
      scored AS (
        SELECT qs.vec_id AS id_q, qs.label, cs.vec_id AS id_c,
               ${dkDot("qs", "cs")} / (sqrt(qs.nsq) * sqrt(cs.nsq)) AS cosine
        FROM b qs JOIN b cs ON qs.bucket = cs.bucket
                           AND qs.label = cs.label
        WHERE qs.vec_id < 10 AND qs.vec_id <> cs.vec_id)
      SELECT id_q, label, rank, id_c, cosine FROM (
        SELECT *, CAST(row_number() OVER
          (PARTITION BY id_q ORDER BY cosine DESC, id_c ASC) AS INT) AS rank
        FROM scored)
      WHERE rank <= 5 ORDER BY id_q, rank"""
    },
    covers = Seq("TD-ann-lsh", "TD-filtered-ann"))

  /** Leakage-safe train/val/test split
    * ([[CorpusPipeline.splitAssignBy]] over q77's near-dup clusters):
    * the split hash draws on the CLUSTER id, so a near-duplicate
    * family can never straddle train and test — the guard against
    * dup-induced eval inflation (Lee et al. 2021 §6: eval on a
    * near-twin of a training doc measures memorization). Every doc —
    * singletons included — gets (cluster, split); q101's per-split
    * accounting applies downstream unchanged. Oracle: the q77
    * recursive closure seeded from ALL docs + the same 60-bit draw on
    * the cluster id. */
  val q212 = Q(
    "q212_leakage_safe_split",
    (s, dir) => {
      import graft.pipelines.CorpusPipeline
      val docs = Tables(s, dir, "documents")
      val sig = Dedup.minhashSignatures(docs, "doc_id", "text",
        n = 3, k = K)
      val pairs = Dedup.lshCandidatePairs(sig, "doc_id", k = K,
          rows = BAND_ROWS)
        .select(col("id_a"), col("id_b")).localCheckpoint()
      val decided = Dedup.dedupDecision(docs.select(col("doc_id")),
        "doc_id", pairs)
      graft.CacheTracker.releaseCheckpoint(pairs)
      CorpusPipeline.splitAssignBy(decided, "cluster", seed = 22)
        .select(col("doc_id"), col("cluster"), col("split"))
        .orderBy(col("doc_id"))
    },
    Some {
      val bandRows = (0 until K / BAND_ROWS).map { b =>
        val key = (b * BAND_ROWS until (b + 1) * BAND_ROWS)
          .map(i => s"CAST(mh$i AS VARCHAR)").mkString("||'_'||")
        s"SELECT doc_id, $b AS band, $key AS band_key FROM sig"
      }.mkString("\n        UNION ALL\n        ")
      s"""
      WITH RECURSIVE $dkShingles,
      $dkSig,
      bands AS (
        $bandRows),
      prs AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bands a JOIN bands b USING(band, band_key)
        WHERE a.doc_id < b.doc_id),
      edges AS (SELECT id_a AS src, id_b AS dst FROM prs
                UNION ALL
                SELECT id_b AS src, id_a AS dst FROM prs),
      reach AS (
        SELECT doc_id AS node, doc_id AS m FROM documents
        UNION
        SELECT e.dst AS node, r.m
        FROM reach r JOIN edges e ON e.src = r.node
      ),
      cc AS (SELECT node AS doc_id, MIN(m) AS cluster
             FROM reach GROUP BY node)
      SELECT doc_id, cluster,
             CASE WHEN ${dkHash(22, "CAST(cluster AS VARCHAR)")} % 100 < 80
                    THEN 'train'
                  WHEN ${dkHash(22, "CAST(cluster AS VARCHAR)")} % 100 < 90
                    THEN 'val'
                  ELSE 'test' END AS split
      FROM cc ORDER BY doc_id"""
    },
    covers = Seq("TD-split", "TD-dedup-clusters"))

  /** Batch-incremental dedup-DECISION maintenance
    * ([[Dedup.dedupDecisionIngest]]): the keeper decision kept current
    * between retrains — batch 0 (even ids) resolves, batch 1 (odd ids)
    * joins its bands against the persistent band table, replays prior
    * assignments as star edges, and ONE CC relabels everything;
    * min-label confluence makes the incremental state EQUAL to a full
    * recompute, which is exactly what the oracle (q77's closure over
    * all docs) checks. Completes the incremental triptych: exact
    * dedup q75, near-dup candidates q82, now the decision itself. */
  val q213 = Q(
    "q213_decision_ingest",
    (s, dir) => {
      val docs = Tables(s, dir, "documents")
      val root = java.nio.file.Files
        .createTempDirectory("graft_q213_").toString
      Dedup.dedupDecisionIngest(s,
        docs.filter(pmod(col("doc_id"), lit(2)) === 0),
        root + "/bands", root + "/decisions", "b0",
        k = K, rows = BAND_ROWS)
      Dedup.dedupDecisionIngest(s,
          docs.filter(pmod(col("doc_id"), lit(2)) === 1),
          root + "/bands", root + "/decisions", "b1",
          k = K, rows = BAND_ROWS)
        .orderBy(col("doc_id"))
    },
    Some {
      val bandRows = (0 until K / BAND_ROWS).map { b =>
        val key = (b * BAND_ROWS until (b + 1) * BAND_ROWS)
          .map(i => s"CAST(mh$i AS VARCHAR)").mkString("||'_'||")
        s"SELECT doc_id, $b AS band, $key AS band_key FROM sig"
      }.mkString("\n        UNION ALL\n        ")
      s"""
      WITH RECURSIVE $dkShingles,
      $dkSig,
      bands AS (
        $bandRows),
      prs AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bands a JOIN bands b USING(band, band_key)
        WHERE a.doc_id < b.doc_id),
      edges AS (SELECT id_a AS src, id_b AS dst FROM prs
                UNION ALL
                SELECT id_b AS src, id_a AS dst FROM prs),
      reach AS (
        SELECT doc_id AS node, doc_id AS m FROM documents
        UNION
        SELECT e.dst AS node, r.m
        FROM reach r JOIN edges e ON e.src = r.node
      )
      SELECT node AS doc_id, MIN(m) AS cluster, node = MIN(m) AS keep
      FROM reach GROUP BY node ORDER BY doc_id"""
    },
    covers = Seq("TD-dedup-clusters", "TD-incremental-ingest"))

  /** Audio-detector quality gate — the q205 protocol on the band-hash
    * family: planted retouched-intro twins vs q195's Hamming-≤2 pairs
    * off the shared audio fingerprint table. Completes the quality row
    * of the modality matrix alongside q205 (image) and q215 (video):
    * each fingerprint family's over-merge (precision) and escape rate
    * (recall) is measured the same way, so families are comparable at
    * equal Hamming budgets. */
  val q214 = Q(
    "q214_audio_neardup_quality",
    (s, dir) => neardupQuality(s, dir, audioBandHashTable(s, dir),
      "bhash"),
    Some("""
      WITH m AS (
        SELECT doc_id AS media_id, doc_id AS base, FALSE AS pert,
               CAST(1000 + (doc_id % 7) * 100 AS BIGINT) AS n
        FROM documents
        UNION ALL
        SELECT doc_id + 10000000, doc_id, TRUE,
               CAST(1000 + (doc_id % 7) * 100 AS BIGINT)
        FROM documents WHERE doc_id % 4 = 0),
      s AS (SELECT media_id,
              t.t * 65 // n AS win,
              abs(CASE WHEN pert AND t.t < 4 THEN 32767
                   ELSE ((t.t * t.t * 31 + t.t * base * 17
                          + base * base * 7) % 65536) - 32768 END) AS av
            FROM m, range(0, 1600) t(t) WHERE t.t < n),
      e AS (SELECT media_id, win, sum(av) AS s FROM s
            GROUP BY media_id, win),
      b AS (SELECT lo.media_id, lo.win AS bitpos,
              CASE WHEN hi.s > lo.s THEN '1' ELSE '0' END AS b
            FROM e lo JOIN e hi ON lo.media_id = hi.media_id
                                AND hi.win = lo.win + 1
            WHERE lo.win < 64),
      hs AS (SELECT media_id, string_agg(b, '' ORDER BY bitpos) AS hstr
             FROM b GROUP BY media_id),
      det AS (SELECT a.media_id AS id_a, b.media_id AS id_b
              FROM hs a JOIN hs b ON a.media_id < b.media_id
              WHERE hamming(a.hstr, b.hstr) <= 2),
      pl AS (SELECT doc_id AS id_a, doc_id + 10000000 AS id_b
             FROM documents WHERE doc_id % 4 = 0),
      hit AS (SELECT * FROM det SEMI JOIN pl USING (id_a, id_b))
      SELECT
        (SELECT count(*) FROM det) AS n_detected,
        (SELECT count(*) FROM pl) AS n_planted,
        (SELECT count(*) FROM hit) AS n_hit,
        CAST((SELECT count(*) FROM hit) AS DOUBLE)
          / CAST((SELECT count(*) FROM det) AS DOUBLE) AS precision,
        CAST((SELECT count(*) FROM hit) AS DOUBLE)
          / CAST((SELECT count(*) FROM pl) AS DOUBLE) AS recall"""),
    covers = Seq("TD-dedup-audio", "TD-harness-quality"))

  /** Video-detector quality gate — the q205 protocol on the
    * TWO-STAGE detector: planted retouched-intro twins vs q206's
    * confirmed pairs off the shared clip fingerprint table. Round 9
    * measured the single-stage temporal hash at precision 0.82
    * (sf0.01) / 0.14 (sf0.1): tiny thumbnails don't carry 64 bits of
    * entropy, so lookalike textures collide and collisions grow
    * quadratically with corpus size. The two confirm channels
    * (intro-frame dHash <= 2, byte-equal tail signature) measure
    * 1.0/1.0 at BOTH scales — precision restored per-candidate, with
    * recall mathematically safe (the planted retouch flips at most
    * one intro-grid comparison and never touches the tail frame). */
  val q215 = Q(
    "q215_video_neardup_quality",
    (s, dir) => neardupQuality(s, dir, videoFpTable(s, dir), "thash",
      confirmHam = videoConfirmHam, confirmEq = videoConfirmEq),
    Some(s"""
      WITH $videoFpSql,
      det AS (SELECT id_a, id_b FROM vpairs),
      pl AS (SELECT doc_id AS id_a, doc_id + 10000000 AS id_b
             FROM documents WHERE doc_id % 4 = 0),
      hit AS (SELECT * FROM det SEMI JOIN pl USING (id_a, id_b))
      SELECT
        (SELECT count(*) FROM det) AS n_detected,
        (SELECT count(*) FROM pl) AS n_planted,
        (SELECT count(*) FROM hit) AS n_hit,
        CAST((SELECT count(*) FROM hit) AS DOUBLE)
          / CAST((SELECT count(*) FROM det) AS DOUBLE) AS precision,
        CAST((SELECT count(*) FROM hit) AS DOUBLE)
          / CAST((SELECT count(*) FROM pl) AS DOUBLE) AS recall"""),
    covers = Seq("TD-dedup-video", "TD-harness-quality"))


  /** The composed end-to-end STREAMING corpus pipeline as a
    * correctness row ([[graft.streaming.CorpusStream]], round-9
    * VERDICT ask #6): the documents table becomes a 4-file drop
    * directory, a maxFilesPerTrigger=1 AvailableNow stream drains it
    * one file per micro-batch, and each batch runs quality gate →
    * exact-dedup decision → transactional manifest MERGE. The query
    * returns the FINAL COMMITTED table (the q213 pattern: the oracle
    * checks the end state of a multi-batch lifecycle). Min/+ fold
    * invariance makes the committed state equal the batch recompute
    * for ANY batching — which is exactly what the oracle asserts. */
  val q216 = Q(
    "q216_streaming_corpus_pipeline",
    (s, dir) => {
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_q216_").toString
      val docs = Tables(s, dir, "documents")
      docs.repartition(4).write.parquet(s"$tmp/drop")
      val src = s.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$tmp/drop")
      val q = graft.streaming.CorpusStream.runCorpusSink(
        src, s"$tmp/table", s"$tmp/ckpt", minTokens = 5)
      q.awaitTermination()
      graft.ops.ManifestTable.read(s, s"$tmp/table").get
        .orderBy(col("fp"))
    },
    Some("""
      SELECT md5(trim(lower(regexp_replace(text, '\s+', ' ', 'g')))) AS fp,
             min(doc_id) AS keeper, count(*) AS n_docs
      FROM documents
      WHERE len(string_split(text, ' ')) >= 5
      GROUP BY 1 ORDER BY fp"""),
    covers = Seq("TD-streaming-pipeline", "TD-dedup-exact", "M1-merge"))


  /** Index durability: the session-shared IVF-PQ index SAVED to a
    * versioned on-disk store ([[graft.ops.IndexStore]] — the
    * ManifestTable commit protocol over a multi-table payload), loaded
    * back, and served from the parquet frames. Search results are
    * bit-equal to the in-memory q180 path (same probes, same broadcast
    * LUT, same inverted-list equi-join), so this row pins BOTH the
    * round-trip fidelity of the persisted artifact and the claim that
    * serving never needs the training session — the store IS the
    * production architecture (train rarely, save once, serve forever).
    * Oracle: identical SQL to q180. */
  val q217 = Q(
    "q217_ivfpq_persisted_search",
    (s, dir) => {
      import s.implicits._
      val emb = Tables(s, dir, "embeddings")
      val idx = graft.ops.ProductQuantizer.ivfPqIndexShared(emb,
        s"$dir|embeddings", dim = 64, kc = 4, cIters = 1, m = 4, k = 4,
        iters = 1)
      val root = java.nio.file.Files
        .createTempDirectory("graft_q217_").toString + "/idx"
      graft.ops.IndexStore.save(idx, root)
      val loaded = graft.ops.IndexStore.load(s, root).get
      graft.ops.ProductQuantizer.ivfPqSearchIndexed(loaded,
          emb.filter($"vec_id" < 10), dim = 64, m = 4, nProbe = 2,
          topK = 5)
        .orderBy(col("id_q"), col("rank"))
    },
    Some {
      s"""
      WITH $dkQuantized,
      $dkKmeansCtes,
      $dkResiduals,
      ${dkPqResChain("rq")},
      $dkIvfPqSearchChain
      SELECT id_q, CAST(rn AS INTEGER) AS rank, id_c, dist_est
      FROM rk WHERE rn <= 5 ORDER BY id_q, rank"""
    },
    covers = Seq("TD-pq", "TD-ann-ivf", "TD-index-store"))

  /** READ-side data skipping off the q134 z-order layout — closes the
    * layout loop ([[graft.ops.Layout.writeZOrdered]] materializes the
    * clustered files + min/max stats; [[graft.ops.Layout.skipScan]]
    * reads ONLY the files whose range intersects the predicate, via a
    * partition-pruned scan — `numFiles` spec-locked in
    * `LayoutLeakOutlierSpec`). The output carries the pruning
    * effectiveness itself (n_files_read < n_files_total) AND the
    * result of the pruned scan; the oracle recomputes the same file
    * ranges declaratively (the q134 CTE) and the row answer from the
    * raw table — so a pruning bug that dropped a matching file would
    * hash-mismatch on n_rows/sum_price, and a too-timid pruner on
    * n_files_read. The stats collect() is file METADATA (O(files),
    * one row per 1024-row file — exactly a table format's driver-side
    * manifest read, never O(rows)). */
  val q220 = Q(
    "q220_zorder_data_skipping",
    (s, dir) => {
      val orders = Tables(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          col("o_totalprice"), col("o_orderdate"))
      val path = java.nio.file.Files
        .createTempDirectory("graft_q220_").toString + "/orders_z"
      val stats = graft.ops.Layout.writeZOrdered(orders,
        x = col("o_custkey"),
        y = datediff(col("o_orderdate").cast("date"), lit("1970-01-01")),
        tie = col("o_orderkey"),
        rowsPerFile = 1024L, bits = 16, path = path)
      val st = stats.select(col("file_id"), col("min_x"), col("max_x"))
        .collect() // O(files) manifest metadata, not O(rows)
      val (lo, hi) = (100L, 150L)
      val ids = st.filter(r => !(r.getLong(2) < lo || r.getLong(1) > hi))
        .map(_.getLong(0)).toSeq
      graft.ops.Layout.skipScan(s, path, ids)
        .filter(col("o_custkey").between(lo, hi))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("o_totalprice").cast("decimal(18,6)"))
            .cast("double").as("sum_price"))
        .withColumn("n_files_total", lit(st.length.toLong))
        .withColumn("n_files_read", lit(ids.length.toLong))
        .select(col("n_files_total"), col("n_files_read"),
          col("n_rows"), col("sum_price"))
    },
    Some {
      val z = (0 until 16).map(b =>
        s"(((x >> $b) & 1) << ${2 * b}) | (((y >> $b) & 1) << ${2 * b + 1})")
        .mkString(" | ")
      s"""
      WITH t AS (SELECT o_orderkey, CAST(o_custkey AS BIGINT) AS x,
               CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
                 AS y
             FROM orders),
      z AS (SELECT x, y, o_orderkey, ($z) AS zv FROM t),
      r AS (SELECT x, CAST((row_number() OVER (ORDER BY zv, o_orderkey)
               - 1) // 1024 AS BIGINT) AS file_id FROM z),
      f AS (SELECT file_id, min(x) AS min_x, max(x) AS max_x
            FROM r GROUP BY 1),
      c AS (SELECT CAST(count(*) AS BIGINT) AS n_files_total,
                   CAST(count(*) FILTER (WHERE NOT (max_x < 100 OR
                     min_x > 150)) AS BIGINT) AS n_files_read
            FROM f),
      m AS (SELECT CAST(count(*) AS BIGINT) AS n_rows,
                   CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6)))
                     AS VARCHAR) AS DOUBLE) AS sum_price
            FROM orders WHERE o_custkey BETWEEN 100 AND 150)
      SELECT c.n_files_total, c.n_files_read, m.n_rows, m.sum_price
      FROM c, m"""
    },
    covers = Seq("TD-layout-zorder", "TD-data-skipping"))

  /** Per-file BLOOM data skipping on a column the z-order key does NOT
    * cluster (Delta's bloom-filter-index shape): o_orderkey scatters
    * uniformly across the custkey/date-clustered files, so every
    * file's min/max orderkey range spans nearly the whole domain and
    * range pruning reads everything — but an 8192-bit per-file Bloom
    * (two hash60 seeds, 32-bit words built with one bit_or aggregation
    * at (file, word) grain) prunes a point lookup to the files whose
    * two probe bits are both set. Probes: the 5 smallest real keys
    * (every one MUST find its file — Bloom has no false negatives,
    * and the query verifies by joining the candidates back to the
    * assignment) + 5 guaranteed-absent negative keys (their candidate
    * counts are the measured, deterministic false-positive cost).
    * Index size is file metadata: ≤256 words × #files. The oracle
    * rebuilds the identical blooms (md5-derived hash60) and both
    * counts per probe. */
  val q221 = Q(
    "q221_bloom_file_skipping",
    (s, dir) => {
      val M = 8192L
      val orders = Tables(s, dir, "orders")
      val asg = graft.CacheTracker.trackCheckpoint(
        graft.ops.Layout.assignZFiles(
          orders.select(col("o_orderkey"), col("o_custkey"),
            col("o_orderdate")),
          x = col("o_custkey"),
          y = datediff(col("o_orderdate").cast("date"), lit("1970-01-01")),
          tie = col("o_orderkey"),
          rowsPerFile = 1024L, bits = 16)
        .select(col("o_orderkey"), col("file_id"))
        .localCheckpoint())
      def posOf(seed: Int, c: org.apache.spark.sql.Column) =
        T.hash60(c, seed) % M
      val words = Seq(501, 502).map(seed =>
        asg.select(col("file_id"), posOf(seed, col("o_orderkey")).as("h")))
        .reduce(_ unionByName _)
        .select(col("file_id"), shiftright(col("h"), 5).as("word"),
          // 32-bit blocks: bit index ≤ 31, so the shifted value is far
          // from BIGINT's sign bit on BOTH engines (DuckDB range-checks
          // 1<<63; Spark would silently wrap) — cross-engine-safe
          expr("shiftleft(CAST(1 AS BIGINT), CAST(h & 31 AS INT))")
            .as("bit"))
      val bloom = words.groupBy(col("file_id"), col("word"))
        .agg(expr("bit_or(bit)").as("bits"))
      val present = orders.select(col("o_orderkey").as("probe_key"))
        .orderBy(col("probe_key")).limit(5)
      val absent = s.range(1, 6).select((-col("id")).as("probe_key"))
      val probes = present.unionByName(absent)
      val pb = Seq(501, 502).map(seed =>
        probes.select(col("probe_key"), lit(seed).as("j"),
          posOf(seed, col("probe_key")).as("h")))
        .reduce(_ unionByName _)
        .select(col("probe_key"), col("j"),
          shiftright(col("h"), 5).as("word"),
          expr("shiftleft(CAST(1 AS BIGINT), CAST(h & 31 AS INT))")
            .as("mask"))
      val cand = broadcast(pb).join(bloom, Seq("word"))
        .filter((col("bits").bitwiseAND(col("mask"))) =!= 0L)
        .groupBy(col("probe_key"), col("file_id"))
        .agg(countDistinct(col("j")).as("nj"))
        .filter(col("nj") === 2)
        .select(col("probe_key"), col("file_id"))
      val candCounts = cand.groupBy(col("probe_key"))
        .agg(count(lit(1)).as("n_candidate_files"))
      val truth = asg.select(col("o_orderkey").as("__k"),
        col("file_id").as("__f"))
      val found = cand.join(truth,
          col("probe_key") === col("__k") && col("file_id") === col("__f"))
        .groupBy(col("probe_key"))
        .agg(count(lit(1)).as("n_rows_found"))
      val nTotal = asg.select(col("file_id")).distinct().count()
      probes.join(candCounts, Seq("probe_key"), "left")
        .join(found, Seq("probe_key"), "left")
        .select(col("probe_key"),
          lit(nTotal).as("n_files_total"),
          coalesce(col("n_candidate_files"), lit(0L))
            .as("n_candidate_files"),
          coalesce(col("n_rows_found"), lit(0L)).as("n_rows_found"))
        .orderBy(col("probe_key"))
    },
    Some {
      val z = (0 until 16).map(b =>
        s"(((x >> $b) & 1) << ${2 * b}) | (((y >> $b) & 1) << ${2 * b + 1})")
        .mkString(" | ")
      s"""
      WITH t AS (SELECT o_orderkey, CAST(o_custkey AS BIGINT) AS x,
               CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
                 AS y
             FROM orders),
      z AS (SELECT x, y, o_orderkey, ($z) AS zv FROM t),
      asg AS (SELECT o_orderkey,
                CAST((row_number() OVER (ORDER BY zv, o_orderkey) - 1)
                  // 1024 AS BIGINT) AS file_id FROM z),
      w AS (SELECT file_id, h >> 5 AS word,
              CAST(1 AS BIGINT) << CAST(h & 31 AS INTEGER) AS bit
            FROM (SELECT file_id,
                    (${dkHash(501, "o_orderkey")}) % 8192 AS h FROM asg
                  UNION ALL
                  SELECT file_id,
                    (${dkHash(502, "o_orderkey")}) % 8192 FROM asg)),
      bloom AS (SELECT file_id, word, bit_or(bit) AS bits
                FROM w GROUP BY 1, 2),
      probes AS (SELECT o_orderkey AS probe_key FROM
                   (SELECT o_orderkey FROM orders ORDER BY 1 LIMIT 5)
                 UNION ALL
                 SELECT CAST(v AS BIGINT) FROM (VALUES (-1), (-2), (-3),
                   (-4), (-5)) AS neg(v)),
      pb AS (SELECT probe_key, j, h >> 5 AS word,
               CAST(1 AS BIGINT) << CAST(h & 31 AS INTEGER) AS mask
             FROM (SELECT probe_key, 1 AS j,
                     (${dkHash(501, "probe_key")}) % 8192 AS h FROM probes
                   UNION ALL
                   SELECT probe_key, 2,
                     (${dkHash(502, "probe_key")}) % 8192 FROM probes)),
      cand AS (SELECT probe_key, file_id
               FROM pb JOIN bloom USING (word)
               WHERE (bits & mask) <> 0
               GROUP BY 1, 2 HAVING count(DISTINCT j) = 2),
      cc AS (SELECT probe_key, CAST(count(*) AS BIGINT)
               AS n_candidate_files FROM cand GROUP BY 1),
      fr AS (SELECT c.probe_key, CAST(count(*) AS BIGINT) AS n_rows_found
             FROM cand c JOIN asg a ON a.file_id = c.file_id
               AND a.o_orderkey = c.probe_key GROUP BY 1),
      tot AS (SELECT CAST(count(DISTINCT file_id) AS BIGINT)
                AS n_files_total FROM asg)
      SELECT p.probe_key, tot.n_files_total,
             COALESCE(cc.n_candidate_files, 0) AS n_candidate_files,
             COALESCE(fr.n_rows_found, 0) AS n_rows_found
      FROM probes p LEFT JOIN cc USING (probe_key)
        LEFT JOIN fr USING (probe_key), tot
      ORDER BY probe_key"""
    },
    covers = Seq("TD-data-skipping", "TD-bloom-index"))

  override def queries: Seq[Q] =
    Seq(q18, q19, q20, q21, q22, q23, q24, q25, q26, q27, q28, q52, q53,
      q66, q68, q69, q70, q75, q76, q77, q79, q80, q82, q83, q84, q85,
      q86, q87, q88, q89, q90, q92, q93, q94, q95, q99, q100, q101, q102,
      q103, q105, q106, q107, q108, q109, q110, q111, q112, q113, q114,
      q115, q116, q117, q118, q119, q120, q121, q122, q123, q124, q125,
      q126, q127, q128, q129, q130, q131, q132, q133, q134, q135, q136,
      q137, q138, q139, q140, q141, q142, q143, q144, q145, q146, q147,
      q148, q149, q150, q151, q152, q153, q154, q155, q156, q157, q158,
      q159, q160, q161, q162, q163, q164, q165, q166, q167, q168, q169,
      q170, q171, q172, q173, q174, q175, q176, q177, q178, q179, q180,
      q181, q182, q183, q184, q185, q186, q187, q188, q189, q190, q191,
      q192, q193, q194, q195, q196, q197, q198, q199, q200, q201, q202,
      q203, q204, q205, q206, q208, q209, q210, q211, q212, q213,
      q214, q215, q216, q217, q220, q221)
}
