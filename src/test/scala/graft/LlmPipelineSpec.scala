package graft

import org.apache.spark.sql.functions._
import graft.llm.{Curate, Dedup}

/** The operators composed as a user would run them — the full
  * training-data curation story over the real corpus fixture:
  * exact dedup → near-dup clustering with quality representatives →
  * rule filter → deterministic split → chunking. Each individual stage
  * is oracle-verified; this spec checks the INVARIANTS that make the
  * chain a pipeline (conservation, containment, partition), which no
  * single-query oracle sees. */
class LlmPipelineSpec extends SparkSpec {

  test("curation pipeline composes: dedup → reps → filter → split → chunk") {
    val docs = Tables.documents(spark, sf())
    val total = docs.count()
    assert(total > 0)

    // 0. NFC normalization gate: on this corpus nothing changes (the
    //    fixture is ascii), so the normalized content hashes must agree
    //    with raw md5 — the invariant that lets the md5-keyed stages
    //    below run on raw text
    val norm = Curate.normalizeText(docs)
    assert(norm.filter(col("changed")).count() === 0L)
    assert(norm.join(docs, "doc_id")
      .filter(col("content_hash") =!= md5(col("text"))).count() === 0L)

    // 1. exact dedup: copies are conserved — every input doc is counted
    //    under exactly one representative
    val exact = Dedup.exactDedup(docs)
    assert(exact.agg(sum("n_copies")).collect().head.getLong(0) === total)
    val uniq = docs.join(exact.select("doc_id"), "doc_id")
    val nUniq = uniq.count()
    assert(nUniq === exact.count())

    // 2. near-dup clustering over the exact-unique set: every doc lands
    //    in exactly one cluster (isolated docs are singleton clusters),
    //    each cluster elects exactly one member as its representative
    val reps = Dedup.clusterRepresentatives(uniq).cache()
    assert(reps.agg(sum("n_members")).collect().head.getLong(0) === nUniq)
    val repIds = reps.select(col("rep_doc_id").as("doc_id"))
    assert(repIds.join(uniq, "doc_id").count() === reps.count(),
      "every representative must be a member of the surviving set")
    val nSurvivors = reps.count()
    assert(nSurvivors > 0 && nSurvivors <= nUniq)

    // 3. rule filter on the survivors: keep is a subset
    val survivors = docs.join(repIds, "doc_id")
    val kept = Curate.c4Filter(survivors).filter(col("keep")).select("doc_id")
    val nKept = kept.count()
    assert(nKept > 0 && nKept <= nSurvivors)

    // 4. split assignment PARTITIONS the kept set (no doc lost, none
    //    double-assigned, deterministic)
    val splits = Curate.splitAssign(docs.join(kept, "doc_id")).cache()
    assert(splits.count() === nKept)
    assert(splits.select("doc_id").distinct().count() === nKept)
    val bySplit = splits.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySplit.values.sum === nKept)
    assert(bySplit.keySet.subsetOf(Set("train", "validation", "test")))
    assert(bySplit.getOrElse("train", 0L) > 0L)

    // 5. chunking the train split: every train doc yields ≥ 1 chunk,
    //    every chunk is within the context budget and belongs to a
    //    train doc
    val train = docs.join(
      splits.filter(col("split") === "train").select("doc_id"), "doc_id")
    val chunks = Curate.docChunks(train).cache()
    assert(chunks.select("doc_id").distinct().count() === train.count())
    assert(chunks.filter(col("n_chunk_tokens") > Curate.ChunkLen).count() === 0L)
    assert(chunks.join(train.select("doc_id"), "doc_id").count() === chunks.count())

    // determinism: the whole chain reruns to the identical kept set
    val again = Curate.c4Filter(
      docs.join(Dedup.clusterRepresentatives(uniq)
        .select(col("rep_doc_id").as("doc_id")), "doc_id"))
      .filter(col("keep")).select("doc_id")
    assert(again.collect().map(_.getLong(0)).sorted.toSeq ===
      kept.collect().map(_.getLong(0)).sorted.toSeq)
  }
}
