package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** One registry of every custom Catalyst function this library adds,
  * with the two ways to install it:
  *
  *  - [[GraftFunctions.registerAll]] on an existing session (what the
  *    operators call internally, idempotent), or
  *  - `spark.sql.extensions=graft.functions.GraftExtensions` at session build
  *    time, which makes the functions available in plain `spark.sql`
  *    text on every session of the application — the standard way to
  *    ship library functions to SQL-only users.
  */
object GraftFunctions {

  private def intArg(e: Expression): Int =
    e.eval(InternalRow.empty).asInstanceOf[Number].intValue()

  /** (name, builder) for every SQL-callable function. */
  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "dot_d" -> (e => DotProductD(e(0), e(1))),
    "lsh_bucket_codes" -> (e => LshBucketCodes(e(0), intArg(e(1)))),
    "top_k_by" -> (e => TopKByScore(e(0), e(1), intArg(e(2))).toAggregateExpression()),
    "shingle_hashes" -> (e => ShingleHashes(e(0), intArg(e(1)))),
    "gram_hashes_pos" -> (e => GramHashesPos(e(0), intArg(e(1)))),
    "char_grams" -> (e => CharGrams(e(0), intArg(e(1)))),
    "nfc_normalize" -> (e => NfcNormalize(e(0))),
    "minhash_sigs" -> (e => MinhashSigs(e(0), e(1), intArg(e(2)))),
    "simhash64" -> (e => SimHash64(e(0))),
    "winnow_fps" -> (e => WinnowFingerprints(e(0), intArg(e(1)), intArg(e(2)))),
    "top_word_count" -> (e => TopWordCount(e(0))),
    "html_extract" -> (e => HtmlExtract(e(0))),
    "url_parts" -> (e => UrlParts(e(0))),
    // Spark's own runtime-filter bloom expressions, surfaced as callable
    // functions (they are not in the builtin registry): build over
    // xxhash64 keys, probe with might_contain. Used by the sketch-
    // prefilter + exact-verify decontamination path.
    "bloom_build" -> (e =>
      new org.apache.spark.sql.catalyst.expressions.aggregate
        .BloomFilterAggregate(e(0), e(1)).toAggregateExpression()),
    "bloom_might_contain" -> (e =>
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(e(0), e(1))),
    "cms_build" -> (e => CountMinBuild(e(0)).toAggregateExpression()),
    "cms_query" -> (e => CountMinQuery(e(0), e(1))),
    "mg_build" -> (e => MisraGriesBuild(e(0)).toAggregateExpression()))

  /** Sessions already holding graft's functions. Weak keys: a stopped
    * session must not be pinned in memory by this registry guard. */
  private val registeredSessions =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())

  /** Register every function on a live session. Idempotent AND silent:
    * re-registering an existing name makes `SimpleFunctionRegistry` log a
    * "replaced a previously registered function" WARN, and operators call
    * this on every invocation — in a 96-query bench session that flood was
    * 100% of the harness's captured output tail (round 3). Idempotency is
    * keyed on the SESSION, not on name existence: a user temp function
    * that happens to share a name (e.g. their own `top_k_by`) must not
    * silently shadow graft's — the first registerAll on a session always
    * installs graft's builders (the registry logs one replace-WARN per
    * collision, which is the right notice), and later calls are no-ops.
    *
    * The check-and-register is one synchronized block with the guard set
    * LAST: Bench runs queries on worker threads, and a guard set before
    * the functions land would let a concurrent caller sail past the
    * no-op path and execute mid-registration ("undefined function:
    * top_k_by" — a transient failure the bench would count as real).
    * The lock is uncontended after a session's first call.
    */
  def registerAll(spark: SparkSession): Unit =
    registeredSessions.synchronized {
      if (!registeredSessions.containsKey(spark)) {
        val reg = spark.sessionState.functionRegistry
        all.foreach { case (name, builder) =>
          reg.createOrReplaceTempFunction(name, builder, "built-in")
        }
        registeredSessions.put(spark, java.lang.Boolean.TRUE)
      }
    }

  private[functions] def inject(ext: SparkSessionExtensions): Unit =
    all.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name), builder))
    }
}

/** `--conf spark.sql.extensions=graft.functions.GraftExtensions` */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.inject(ext)
}
