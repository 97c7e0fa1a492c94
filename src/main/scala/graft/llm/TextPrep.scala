package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shared text preparation for the LLM-data-pipeline operators:
  * tokenization and shingling, defined ONCE here with their DuckDB
  * oracle SQL twins so Spark and oracle can never drift.
  *
  * Scale: all expressions are row-local (no shuffle); they run inside
  * the scan projection, so only `text` is read from parquet.
  */
object TextPrep {

  val ShingleWords = 3

  /** Word tokens: space-split of lowercased text (corpus is [a-z0-9 ]). */
  def wordsCol: Column = split(lower(col("text")), " ")

  val sqlWords = "string_split(lower(text), ' ')"

  /** Word 3-gram shingles over a `words` array column. */
  def shinglesCol: Column =
    expr(s"transform(sequence(0, size(words) - $ShingleWords), " +
      s"i -> concat_ws(' ', slice(words, i + 1, $ShingleWords)))")

  /** DuckDB twin of shinglesCol over an inlined words expression. */
  def sqlShingles(w: String): String =
    s"list_transform(generate_series(1, len($w) - ${ShingleWords - 1}), " +
      s"i -> array_to_string(($w)[i:i+${ShingleWords - 1}], ' '))"

  /** documents → (doc_id, words, shingles) with short docs filtered the
    * same way on both sides. */
  def withShingles(documents: DataFrame): DataFrame =
    documents
      .withColumn("words", wordsCol)
      .filter(size(col("words")) >= ShingleWords)
      .withColumn("shingles", shinglesCol)

  /** documents → exploded distinct shingles (doc_id, sh). The base of
    * the set-similarity pipeline. */
  def shingleSets(documents: DataFrame): DataFrame =
    withShingles(documents)
      .select(col("doc_id"), explode(array_distinct(col("shingles"))).as("sh"))

  /** DuckDB twin CTEs for shingleSets: defines `docs(doc_id, shs)` and
    * `s(doc_id, sh)` and `sizes(doc_id, n)`. */
  val sqlShingleCtes: String =
    s"""docs AS (
          SELECT doc_id, list_distinct(${sqlShingles(sqlWords)}) AS shs
          FROM documents WHERE len($sqlWords) >= $ShingleWords
        ),
        s AS (SELECT doc_id, unnest(shs) AS sh FROM docs),
        sizes AS (SELECT doc_id, count(*) AS n FROM s GROUP BY doc_id)"""
}
