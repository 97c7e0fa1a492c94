package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** G1: deterministic synthetic transaction generator — the reference's
  * producer distributions (`src/kafka/transaction_producer.py:66-130`)
  * as pure column expressions over spark.range (seed-free determinism:
  * every draw is a hash of the row id, so the same id always produces
  * the same transaction on any cluster/partitioning).
  *
  * Distributions preserved:
  *  - 100 accounts ACC%06d, 50 customers CUST%06d (`:66-67`)
  *  - 5 types uniform; per-type amount ranges: deposit 50–5000,
  *    withdrawal 20–1000, transfer 10–3000, payment 5–500,
  *    refund 5–200 (`:87-96`)
  *  - timestamps uniform over the 24 h before a fixed anchor (`:99-103`)
  *  - status: 4-slot draw [pending, completed ×3] — failed/rejected
  *    never generated (`:124`)
  *  - merchant_info only for payments, 12-merchant catalog (`:69-72,106-113`)
  *  - currency always USD (producer never draws it; model default,
  *    `transaction.py:21`); tags/metadata empty-not-null (`:29-30`)
  *
  * Scale: spark.range parallelizes generation across the cluster with
  * zero input I/O and no shuffle.
  */
object Generator {

  private def h(seed: Int) = pmod(hash(col("id"), lit(seed)), lit(1000000)).cast("double") / 1000000.0

  private def pick(seed: Int, vals: Seq[String]) =
    element_at(array(vals.map(lit): _*), (pmod(hash(col("id"), lit(seed)), lit(vals.size)) + 1).cast("int"))

  def transactions(spark: SparkSession, n: Long,
                   anchorEpochSec: Long = 1704067200L): DataFrame = {
    val types = Schemas.transactionTypes
    val amountLo = map(types.flatMap(t => Seq(lit(t), lit(Map(
      "deposit" -> 50.0, "withdrawal" -> 20.0, "transfer" -> 10.0,
      "payment" -> 5.0, "refund" -> 5.0)(t)))): _*)
    val amountHi = map(types.flatMap(t => Seq(lit(t), lit(Map(
      "deposit" -> 5000.0, "withdrawal" -> 1000.0, "transfer" -> 3000.0,
      "payment" -> 500.0, "refund" -> 200.0)(t)))): _*)
    spark.range(n)
      .withColumn("transaction_id", concat(lit("TXN"), lpad(col("id").cast("string"), 10, "0")))
      .withColumn("account_id",
        concat(lit("ACC"), lpad((pmod(hash(col("id"), lit(1)), lit(100)) + 1).cast("string"), 6, "0")))
      .withColumn("customer_id",
        concat(lit("CUST"), lpad((pmod(hash(col("id"), lit(2)), lit(50)) + 1).cast("string"), 6, "0")))
      .withColumn("transaction_type", pick(3, types))
      .withColumn("amount", round(
        element_at(amountLo, col("transaction_type")) +
          h(4) * (element_at(amountHi, col("transaction_type")) -
            element_at(amountLo, col("transaction_type"))), 2))
      .withColumn("currency", lit("USD"))
      .withColumn("timestamp",
        date_format(timestamp_seconds(lit(anchorEpochSec) - (h(6) * 86400).cast("long")),
          "yyyy-MM-dd'T'HH:mm:ss"))
      .withColumn("status",
        // the producer's exact 4-slot draw: pending 1/4, completed 3/4
        element_at(array(Seq("pending", "completed", "completed", "completed").map(lit): _*),
          (pmod(hash(col("id"), lit(7)), lit(4)) + 1).cast("int")))
      .withColumn("source", pick(8, Schemas.sources))
      .withColumn("description", concat(initcap(col("transaction_type")), lit(" transaction")))
      .withColumn("merchant_info",
        when(col("transaction_type") === "payment",
          map(lit("name"), pick(9, Seq("Amazon", "Walmart", "Target", "Costco",
              "Starbucks", "McDonald's", "Shell", "Exxon", "AT&T", "Verizon",
              "Netflix", "Spotify")),
            lit("category"), pick(10, Seq("retail", "food", "gas", "services", "entertainment")),
            // randint(10000, 99999): always 5 digits
            lit("merchant_id"), concat(lit("M"),
              (pmod(hash(col("id"), lit(11)), lit(90000)) + 10000).cast("string")))))
      // data_source IS drawn by the reference producer
      // (`transaction_producer.py:128`); the remaining Transaction
      // fields exist in the model but are left unset by the producer
      // (`transaction.py:26-38`) — emitted here as typed nulls so the
      // generated frame carries the full schema.
      .withColumn("data_source", pick(12, Schemas.sources))
      .withColumn("reference_id", lit(null).cast("string"))
      .withColumn("location", lit(null).cast("map<string,string>"))
      // tags/metadata default to empty-not-null in the model
      // (`transaction.py:29-30`), so to_dict emits [] / {}
      .withColumn("tags", array().cast("array<string>"))
      .withColumn("metadata", map().cast("map<string,string>"))
      .withColumn("batch_id", lit(null).cast("string"))
      .drop("id")
  }
}
