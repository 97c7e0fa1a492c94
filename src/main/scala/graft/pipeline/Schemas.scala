package graft.pipeline

import org.apache.spark.sql.types._

/** The transaction data model — Scala twin of the reference's
  * Transaction dataclass (`src/models/transaction.py:11-38`) and
  * streaming StructType (`src/spark/transaction_processor.py:122-144`).
  * All fields nullable, flat-ish with three collection fields.
  */
object Schemas {

  case class Transaction(
      transaction_id: String,
      account_id: String,
      customer_id: Option[String],
      transaction_type: String,
      amount: Double,
      currency: String,
      timestamp: String,
      description: Option[String],
      status: String,
      source: Option[String],
      reference_id: Option[String],
      merchant_info: Option[Map[String, String]],
      location: Option[Map[String, String]],
      tags: Option[Seq[String]],
      metadata: Option[Map[String, String]],
      processing_timestamp: Option[String],
      validation_status: Option[String],
      validation_errors: Option[Seq[String]],
      enrichment_status: Option[String],
      data_source: Option[String],
      batch_id: Option[String])

  /** Streaming-side declared schema (`transaction_processor.py:122-144`):
    * JSON parsing against it is permissive — missing fields → null. */
  val transactionSchema: StructType = StructType(Seq(
    StructField("transaction_id", StringType),
    StructField("account_id", StringType),
    StructField("customer_id", StringType),
    StructField("transaction_type", StringType),
    StructField("amount", DoubleType),
    StructField("currency", StringType),
    StructField("timestamp", StringType),
    StructField("description", StringType),
    StructField("status", StringType),
    StructField("source", StringType),
    StructField("reference_id", StringType),
    StructField("merchant_info", MapType(StringType, StringType)),
    StructField("location", MapType(StringType, StringType)),
    StructField("tags", ArrayType(StringType)),
    StructField("metadata", MapType(StringType, StringType)),
    StructField("processing_timestamp", StringType),
    StructField("validation_status", StringType),
    StructField("validation_errors", ArrayType(StringType)),
    StructField("enrichment_status", StringType),
    StructField("data_source", StringType),
    StructField("batch_id", StringType)))

  /** Enum domains (`transaction.py:19-24`, `transaction_validator.py:100-139`). */
  val transactionTypes = Seq("deposit", "withdrawal", "transfer", "payment", "refund")
  val currencies = Seq("USD", "EUR", "GBP", "JPY", "CAD", "AUD")
  val statuses = Seq("pending", "completed", "failed", "rejected")
  val sources = Seq("mobile_app", "web_banking", "branch", "atm", "merchant_pos")
  val accountTypes = Seq("checking", "savings", "credit", "loan", "investment")

  /** Accounts dimension (`src/config/validation_config.yml:47-59`). */
  val accountSchema: StructType = StructType(Seq(
    StructField("account_id", StringType, nullable = false),
    StructField("customer_id", StringType, nullable = false),
    StructField("account_type", StringType),
    StructField("account_status", StringType)))
}
