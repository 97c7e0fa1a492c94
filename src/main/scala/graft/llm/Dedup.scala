package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact,
  * n-gram-Jaccard, MinHash+LSH, SimHash.
  *
  * Everything is hash-portable: the hash family is md5 (identical in
  * Spark and DuckDB), so every stage — including the MinHash signatures
  * and LSH candidate sets — is oracle-checkable bit-for-bit.
  *
  * Scale design (100 TB):
  *  - exact dedup = one hash-aggregate on a 32-byte digest, shuffled by
  *    digest — no text payload crosses the wire beyond the first map.
  *  - jaccardPairs is a set-similarity join (explode → co-group by
  *    shingle → pair counts), NOT an O(n²) cross join; the shuffle key
  *    is the shingle, so hot shingles are the skew concern — AQE skew
  *    handling plus the distinct-per-doc projection bound it.
  *  - LSH reduces pair generation to per-bucket joins; band buckets are
  *    the shuffle key, bucket sizes are tiny under uniform hashing.
  */
object Dedup {

  /** Exact dedup: one representative (min doc_id) per distinct text. */
  def exactDedup(documents: DataFrame): DataFrame =
    documents
      .groupBy(md5(col("text")).as("content_hash"))
      .agg(
        min(col("doc_id")).as("doc_id"),
        count(lit(1)).as("n_copies"))
      .select("doc_id", "content_hash", "n_copies")
      .orderBy("doc_id")

  val sqlExactDedup: String =
    """SELECT min(doc_id) AS doc_id, md5(text) AS content_hash,
       count(*) AS n_copies
       FROM documents GROUP BY md5(text) ORDER BY doc_id"""

  /** N-gram Jaccard near-dup pairs above a threshold, via the
    * set-similarity join (intersection counts from a co-group on the
    * shingle, sizes joined back). */
  def jaccardPairs(documents: DataFrame, threshold: Double): DataFrame = {
    val s = TextPrep.shingleSets(documents)
    val sizes = TextPrep.docShingles(documents).select("doc_id", "n")
    val inter = s.as("a")
      .join(s.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("i"))
    inter
      .join(sizes.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sizes.as("sb"), col("doc_b") === col("sb.doc_id"))
      .select(col("doc_a"), col("doc_b"),
        (col("i").cast("double") /
          (col("sa.n") + col("sb.n") - col("i")).cast("double")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .orderBy("doc_a", "doc_b")
  }

  def sqlJaccardPairs(threshold: Double): String =
    s"""WITH ${TextPrep.sqlShingleCtes},
        inter AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
          FROM s a JOIN s b ON a.sh = b.sh AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
        SELECT doc_a, doc_b,
          CAST(i AS DOUBLE) / CAST(sa.n + sb.n - i AS DOUBLE) AS jaccard
        FROM inter JOIN sizes sa ON doc_a = sa.doc_id
                   JOIN sizes sb ON doc_b = sb.doc_id
        WHERE CAST(i AS DOUBLE) / CAST(sa.n + sb.n - i AS DOUBLE) >= $threshold
        ORDER BY doc_a, doc_b"""

  val NumHashes = 16
  val NumBands = 4
  val RowsPerBand: Int = NumHashes / NumBands

  /** MinHash signature: per seed i, min over the doc's shingle set of
    * h_i(sh) = (a(sh) + i·b(sh)) mod P, where a/b are md5-derived base
    * hashes precomputed in docShingles (Kirsch–Mitzenmacher — one md5
    * per shingle, all seeds arithmetic). Row-local, no shuffle. */
  def minhashSignatures(documents: DataFrame): DataFrame =
    signaturesFrom(TextPrep.docShingles(documents))

  private def signaturesFrom(docsPrep: DataFrame): DataFrame =
    docsPrep.select(
      col("doc_id") +:
        (0 until NumHashes).map(i =>
          array_min(zip_with(col("ha"), col("hb"),
            (a, b) => (a + lit(i.toLong) * b) % TextPrep.HashP)).as(s"h$i")): _*)

  /** LSH banding: hash each run of RowsPerBand signature slots to a
    * bucket key; docs sharing any (band, bucket) become candidates. */
  private def bandKeys(sig: DataFrame): DataFrame = {
    val bands = (0 until NumBands).map { b =>
      struct(lit(b).as("band"),
        concat_ws(",",
          (0 until RowsPerBand).map(r => col(s"h${b * RowsPerBand + r}")): _*)
          .as("bkey"))
    }
    sig.select(col("doc_id"), explode(array(bands: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.bkey").as("bkey"))
  }

  /** MinHash+LSH near-dup detection: candidates from shared band
    * buckets, verified with exact Jaccard. Output is every candidate
    * pair with its true Jaccard — bit-portable to the oracle. */
  def minhashLshPairs(documents: DataFrame): DataFrame = {
    // One shared, cached prep: the shingle arrays feed four plan
    // branches (two band-join sides, two verification sides) and Spark
    // does not reuse the exchange across them — without the cache the
    // interpreted shingle pipeline runs 4×. 5000 compact rows/SF0.1.
    val docs = TextPrep.docShingles(documents).cache()
    val bk = bandKeys(signaturesFrom(docs))
    val cand = bk.as("x")
      .join(bk.as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    // Verification ONLY for LSH candidates (this is the point of LSH:
    // the candidate set, not the corpus, drives the verification cost).
    // array_intersect on the two shingle arrays is row-local.
    cand
      .join(docs.select(col("doc_id"), col("shs").as("shs_a"), col("n").as("na")),
        col("doc_a") === col("doc_id")).drop("doc_id")
      .join(docs.select(col("doc_id"), col("shs").as("shs_b"), col("n").as("nb")),
        col("doc_b") === col("doc_id")).drop("doc_id")
      .withColumn("i", size(array_intersect(col("shs_a"), col("shs_b"))).cast("long"))
      .select(col("doc_a"), col("doc_b"),
        (col("i").cast("double") /
          (col("na") + col("nb") - col("i")).cast("double")).as("jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  val sqlMinhashLshPairs: String = {
    val minCols = (0 until NumHashes)
      .map(i => s"list_min(list_transform(generate_series(1, len(ha)), " +
        s"j -> (ha[j] + $i * hb[j]) % ${TextPrep.HashP})) AS h$i")
      .mkString(", ")
    val bandSelects = (0 until NumBands).map { b =>
      val parts = (0 until RowsPerBand)
        .map(r => s"h${b * RowsPerBand + r}").mkString(", ")
      s"SELECT doc_id, $b AS band, concat_ws(',', $parts) AS bkey FROM sig"
    }.mkString(" UNION ALL ")
    s"""WITH ${TextPrep.sqlShingleCtes},
        sig AS (SELECT doc_id, $minCols FROM docs),
        bands AS ($bandSelects),
        cand AS (
          SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
          FROM bands x JOIN bands y
            ON x.band = y.band AND x.bkey = y.bkey AND x.doc_id < y.doc_id),
        verified AS (
          SELECT c.doc_a, c.doc_b,
            CAST(len(list_intersect(da.shs, db.shs)) AS BIGINT) AS i,
            da.n AS na, db.n AS nb
          FROM cand c JOIN docs da ON c.doc_a = da.doc_id
                      JOIN docs db ON c.doc_b = db.doc_id)
        SELECT doc_a, doc_b,
          CAST(i AS DOUBLE) / CAST(na + nb - i AS DOUBLE) AS jaccard
        FROM verified ORDER BY doc_a, doc_b"""
  }

  val SimhashBits = 32

  /** 32-bit SimHash over the word multiset: bit j is the sign of the
    * sum of per-word ±1 votes, where a word votes +1 on bit j iff hex
    * digit j of md5(word) has its high nibble bit set. Portable to any
    * engine with md5. */
  def simhash(documents: DataFrame): DataFrame = {
    val w = documents
      .select(col("doc_id"), explode(TextPrep.wordsCol).as("w"))
    val votes = w.groupBy("doc_id").agg(
      sum(when(substring(md5(col("w")), 1, 1)
        .isin("8", "9", "a", "b", "c", "d", "e", "f"), 1).otherwise(-1)).as("s0"),
      (1 until SimhashBits).map(j =>
        sum(when(substring(md5(col("w")), j + 1, 1)
          .isin("8", "9", "a", "b", "c", "d", "e", "f"), 1).otherwise(-1)).as(s"s$j")): _*)
    val sh = (0 until SimhashBits)
      .map(j => when(col(s"s$j") >= 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce(_ + _)
    votes.select(col("doc_id"), sh.as("simhash")).orderBy("doc_id")
  }

  val sqlSimhash: String = {
    val hexHigh = "('8','9','a','b','c','d','e','f')"
    val sums = (0 until SimhashBits).map(j =>
      s"sum(CASE WHEN substr(md5(w), ${j + 1}, 1) IN $hexHigh THEN 1 ELSE -1 END) AS s$j")
      .mkString(", ")
    val assemble = (0 until SimhashBits)
      .map(j => s"CASE WHEN s$j >= 0 THEN ${1L << j} ELSE 0 END").mkString(" + ")
    s"""WITH w AS (SELECT doc_id, unnest(${TextPrep.sqlWords}) AS w FROM documents),
        b AS (SELECT doc_id, $sums FROM w GROUP BY doc_id)
        SELECT doc_id, CAST($assemble AS BIGINT) AS simhash FROM b ORDER BY doc_id"""
  }

  /** SimHash near-dup pairs: same-language blocking, Hamming distance
    * via bit_count(xor) under a cutoff. */
  def simhashPairs(documents: DataFrame, maxDist: Int): DataFrame = {
    val sh = simhash(documents)
      .join(documents.select("doc_id", "lang"), "doc_id")
    sh.as("a")
      .join(sh.as("b"),
        col("a.lang") === col("b.lang") && col("a.doc_id") < col("b.doc_id"))
      .select(
        col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
      .filter(col("hamming") <= maxDist)
      .orderBy("doc_a", "doc_b")
  }

  def sqlSimhashPairs(maxDist: Int): String = {
    val inner = sqlSimhash.replace("ORDER BY doc_id", "")
    s"""WITH sh AS (SELECT t.doc_id, t.simhash, d.lang
          FROM ($inner) t JOIN documents d ON t.doc_id = d.doc_id)
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
          CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
        FROM sh a JOIN sh b ON a.lang = b.lang AND a.doc_id < b.doc_id
        WHERE bit_count(xor(a.simhash, b.simhash)) <= $maxDist
        ORDER BY doc_a, doc_b"""
  }
}
