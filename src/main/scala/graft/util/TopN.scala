package graft.util

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic global top-N ranking WITHOUT a global window.
  *
  * `row_number() OVER (ORDER BY ...)` with no partition moves the whole
  * input to one partition (`WindowExec: No Partition Defined`) — fatal
  * when the input is vocabulary/bigram/path-count sized at 100 TB. When
  * only the top N survive anyway, the cap can move BEFORE the sort:
  * `orderBy(key).limit(n)` plans as TakeOrderedAndProject (a size-N heap
  * per partition, driver-merge of N rows), and the rank is then assigned
  * by a single-group sorted re-assembly of those N rows — an aggregate,
  * not a WindowExec, so nothing ever concentrates more than N rows.
  */
object TopN {

  /** Top `n` rows of `df` by ascending `key` (build the key with negated
    * counts for descending order, tie-breaker column last — it must make
    * the key unique or the rank order is nondeterministic), with a
    * 1-based int rank column `rankName` prepended to `df`'s columns. */
  def rankedTopN(df: DataFrame, key: Column, n: Int, rankName: String): DataFrame = {
    val cols = df.columns.toSeq
    df.orderBy(key)
      .limit(n)
      .select(struct(key.as("k"), struct(cols.map(col): _*).as("r")).as("kr"))
      .agg(sort_array(collect_list(col("kr"))).as("xs"))
      .select(posexplode(col("xs")).as(Seq("pos", "e")))
      .select((col("pos") + 1).cast("int").as(rankName) +:
        cols.map(c => col(s"e.r.$c").as(c)): _*)
  }
}
