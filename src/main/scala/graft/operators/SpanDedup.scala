package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.text.TextOps

/** Exact-substring (span) deduplication — the "dedup repeated spans,
  * not whole documents" pass (public method: Lee et al. 2022,
  * "Deduplicating Training Data Makes Language Models Better", which
  * removes every repeated span above a token threshold corpus-wide).
  *
  * Semantics: every n-token window that occurs at 2+ positions
  * corpus-wide keeps ONLY its globally-first occurrence (ordered by
  * (doc_id, start) — deterministic); all other occurrences mark their
  * n token positions for removal, overlaps union naturally at the
  * token-index level, and documents are rebuilt from surviving tokens
  * in order. A document consisting entirely of text seen earlier
  * collapses to empty — exactly the Lee et al. behavior whole-doc
  * dedup cannot express (it would keep the doc because it is not an
  * exact duplicate).
  *
  * Scale shape: windows explode to ~|tokens| rows (each carrying a
  * 32-char digest, not the text); first-occurrence election is ONE
  * hash aggregation with a struct-min (no window over the corpus);
  * removal positions explode only from DUPLICATED occurrences; doc
  * rebuild is a per-doc hash agg with an in-group array sort. No
  * corpus-wide sort, no unpartitioned window, nothing driver-sized.
  * The digest is md5 of the joined window so the DuckDB oracle can
  * replay the election bit-for-bit; a production run would swap in
  * xxhash64 (same shape, 8-byte keys).
  */
object SpanDedup {

  private def gramCol(n: Int): Column =
    when(size(col("ws")) < n, array().cast("array<struct<s:long,g:string>>"))
      .otherwise(transform(
        sequence(lit(0L), size(col("ws")).cast("long") - n),
        i => struct(i.as("s"),
          md5(concat_ws(" ", slice(col("ws"), (i + 1).cast("int"), lit(n))))
            .as("g"))))

  /** Per-doc span-dedup report: token count, removed-token count and a
    * digest of the surviving text (md5 of the space-joined kept
    * tokens — md5("") for fully-collapsed docs).
    */
  def dedupSpans(docs: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame = {
    val toks = docs
      .select(col(idCol).as("doc_id"), TextOps.tokens(col(textCol)).as("ws"))
      .localCheckpoint(true) // grams + counts + rebuild share one pass
    val grams = toks
      .select(col("doc_id"), explode(gramCol(n)).as("w"))
      .select(col("doc_id"), col("w.s").as("s"), col("w.g").as("g"))
    // first-occurrence election: one hash agg, struct-min is the keeper
    val dupFirsts = grams.groupBy("g")
      .agg(min(struct(col("doc_id"), col("s"))).as("keep"),
        count(lit(1)).as("cnt"))
      .where(col("cnt") >= 2)
      .select("g", "keep")
    val removedIdx = grams
      .join(dupFirsts, "g")
      .where(struct(col("doc_id"), col("s")) =!= col("keep"))
      .select(col("doc_id"),
        explode(sequence(col("s"), col("s") + (n - 1))).as("idx"))
      .distinct()
    val tokIdx = toks.select(col("doc_id"),
      posexplode(col("ws")).as(Seq("idx", "tok")))
      .withColumn("idx", col("idx").cast("long"))
    val kept = tokIdx
      .join(removedIdx, Seq("doc_id", "idx"), "left_anti")
      .groupBy("doc_id")
      .agg(md5(concat_ws(" ",
        transform(array_sort(collect_list(struct(col("idx"), col("tok")))),
          x => x.getField("tok")))).as("kept_digest"),
        count(lit(1)).as("n_kept"))
    val base = toks.select(col("doc_id"),
      size(col("ws")).cast("long").as("n_tokens"))
    base
      .join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        (col("n_tokens") - coalesce(col("n_kept"), lit(0L)))
          .as("n_removed"),
        coalesce(col("kept_digest"), lit(
          "d41d8cd98f00b204e9800998ecf8427e" /* md5("") */))
          .as("kept_digest"))
      .orderBy("doc_id")
  }
}
