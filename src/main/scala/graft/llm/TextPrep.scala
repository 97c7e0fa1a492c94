package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shared text preparation for the LLM-data-pipeline operators:
  * tokenization and shingling, defined ONCE here with their DuckDB
  * oracle SQL twins so Spark and oracle can never drift.
  *
  * Performance shape (measured at sf0.1, see Dedup scaladoc):
  *  - the shingle pipeline is interpreted (higher-order functions), so
  *    it must be evaluated exactly once per document — Catalyst's
  *    CollapseProject happily inlines a projected alias into every
  *    consumer expression, and lambda bodies re-evaluate inlined
  *    subexpressions per element. Both are defused here: a
  *    single-element `transform(array(x), v -> …)` binds `x` to a
  *    lambda variable (evaluated once no matter what references it),
  *    and a pinned repartition materializes the arrays before fan-out.
  */
object TextPrep {

  val ShingleWords = 3

  /** Modulus for the arithmetic MinHash hash family (fits i*b sums in
    * a long with headroom). */
  val HashP = 1000000007L

  /** Word tokens: space-split of lowercased text (corpus is [a-z0-9 ]). */
  def wordsCol: Column = split(lower(col("text")), " ")

  val sqlWords = "string_split(lower(text), ' ')"

  /** Distinct word-3-gram shingles + per-shingle base hashes, computed
    * in ONE bound evaluation per row: struct(shs, ha, hb).
    * ha/hb are the two 60-bit halves of md5(shingle) mod HashP — the
    * base of the Kirsch–Mitzenmacher seed family (one md5 per shingle,
    * every MinHash seed derived arithmetically). */
  private val boundShingleStruct: Column = expr(
    s"""transform(array(
          transform(array(split(lower(text), ' ')), ws ->
            CASE WHEN size(ws) >= $ShingleWords
              THEN array_distinct(transform(sequence(0, size(ws) - $ShingleWords),
                i -> concat_ws(' ', slice(ws, i + 1, $ShingleWords))))
              ELSE array() END)[0]
        ), shs -> named_struct(
          'shs', shs,
          'ha', transform(shs, sh ->
            CAST(conv(substring(md5(sh), 1, 15), 16, 10) AS BIGINT) % $HashP),
          'hb', transform(shs, sh ->
            CAST(conv(substring(md5(sh), 17, 15), 16, 10) AS BIGINT) % $HashP)
        ))[0]""")

  /** documents → (doc_id, lang, shs, ha, hb, n).
    *
    * The repartition sandwich is deliberate:
    *  - first (pinned count) parallelizes the expensive interpreted
    *    projection — the documents parquet is one small file → one
    *    scan task otherwise;
    *  - second is the materialization barrier so downstream consumers
    *    reference attributes, not re-inlined expression trees;
    *  - explicit partition counts because AQE would coalesce these
    *    byte-tiny exchanges to 1–2 tasks and serialize the expensive
    *    projection above them.
    */
  def docShingles(documents: DataFrame): DataFrame = {
    val parts = documents.sparkSession.sparkContext.defaultParallelism
    documents
      .select(col("doc_id"), col("lang"), col("text"))
      .repartition(parts, col("doc_id"))
      .select(col("doc_id"), col("lang"), boundShingleStruct.as("d"))
      .repartition(parts, col("doc_id"))
      .select(col("doc_id"), col("lang"),
        col("d.shs").as("shs"), col("d.ha").as("ha"), col("d.hb").as("hb"))
      .filter(size(col("shs")) > 0)
      .withColumn("n", size(col("shs")).cast("long"))
  }

  /** documents → exploded distinct shingles (doc_id, sh). The base of
    * the all-pairs set-similarity join. */
  def shingleSets(documents: DataFrame): DataFrame =
    docShingles(documents)
      .select(col("doc_id"), explode(col("shs")).as("sh"))

  /** DuckDB twin of the shingle expression over an inlined words expr. */
  def sqlShingles(w: String): String =
    s"list_transform(generate_series(1, len($w) - ${ShingleWords - 1}), " +
      s"i -> array_to_string(($w)[i:i+${ShingleWords - 1}], ' '))"

  /** DuckDB twin CTEs: `docs(doc_id, lang, shs, ha, hb, n)` (array-
    * native), `s(doc_id, sh)` (exploded), `sizes(doc_id, n)`. */
  val sqlShingleCtes: String =
    s"""docs AS (
          SELECT doc_id, lang, shs,
            list_transform(shs, sh ->
              CAST(concat('0x', substr(md5(sh), 1, 15)) AS BIGINT) % $HashP) AS ha,
            list_transform(shs, sh ->
              CAST(concat('0x', substr(md5(sh), 17, 15)) AS BIGINT) % $HashP) AS hb,
            CAST(len(shs) AS BIGINT) AS n
          FROM (
            SELECT doc_id, lang,
              list_distinct(${sqlShingles(sqlWords)}) AS shs
            FROM documents WHERE len($sqlWords) >= $ShingleWords)
        ),
        s AS (SELECT doc_id, unnest(shs) AS sh FROM docs),
        sizes AS (SELECT doc_id, n FROM docs)"""
}
