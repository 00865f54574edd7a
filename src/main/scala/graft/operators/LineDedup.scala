package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-level line deduplication — the CCNet-style boilerplate pass
  * (Wenzek et al. 2020 §3.1, public): lines repeated across many
  * documents (headers, navigation, legal footers) are removed before
  * any document-level quality scoring, because boilerplate both skews
  * quality signals and survives document-level dedup.
  *
  * Operates on an exploded line table (id, line_no, line) so the
  * front-end line split (a `split(text, '\n')` + posexplode in real
  * corpora) stays the caller's choice. Two published variants:
  *
  *  - [[dropFrequent]]: remove every occurrence of lines whose corpus
  *    DOCUMENT frequency exceeds a threshold (boilerplate removal).
  *  - [[keepFirst]]: exact line dedup — keep only the first occurrence
  *    of each distinct line, ordered by (id, line_no).
  *
  * Scale shape (100 TB):
  *  - df counting first collapses (line, doc) multiplicity with one
  *    map-side-combining aggregation, then counts docs per line — the
  *    exchange key is an 8-byte xxhash64 of the line, not the line
  *    text, so hot boilerplate lines cost narrow rows. Equality is
  *    verified on the line string at the join (hash only narrows).
  *  - the frequent-line table is df-filtered BEFORE the anti-join, so
  *    its size is bounded by the boilerplate vocabulary, not the
  *    corpus; no broadcast hint — AQE broadcasts when it fits.
  *  - [[keepFirst]] is a min-aggregation per distinct line (map-side
  *    combining), NOT a window over line partitions: a hot line (the
  *    empty string, "home") would serialize one window partition, but
  *    combines in parallel under an aggregation.
  */
object LineDedup {

  /** Lines of documents whose corpus-wide document frequency is at most
    * `maxDf` — i.e. boilerplate (df > maxDf) removed, all other lines
    * kept with their positions. Input columns `(idCol, lineNoCol,
    * lineCol)`; output the same three.
    */
  def dropFrequent(lines: DataFrame, maxDf: Long, idCol: String = "doc_id",
      lineNoCol: String = "line_no", lineCol: String = "line"): DataFrame = {
    val h = xxhash64(col(lineCol))
    // distinct (line, doc) pairs -> docs per line; keep only frequent
    val frequent = lines
      .select(h.as("_h"), col(lineCol).as("_line"), col(idCol).as("_id"))
      .distinct()
      .groupBy("_h", "_line")
      .agg(count(lit(1)).as("_df"))
      .where(col("_df") > maxDf)
    lines.join(frequent,
      h === col("_h") && col(lineCol) === col("_line"), "left_anti")
  }

  /** Exact corpus-level line dedup: one row per distinct line, placed at
    * its first occurrence (minimum (id, line_no)). A min-of-struct
    * aggregation, so order is total and deterministic and hot lines
    * combine map-side instead of serializing a window partition.
    */
  def keepFirst(lines: DataFrame, idCol: String = "doc_id",
      lineNoCol: String = "line_no", lineCol: String = "line"): DataFrame =
    lines
      .groupBy(xxhash64(col(lineCol)).as("_h"), col(lineCol))
      .agg(min(struct(col(idCol).as("id"), col(lineNoCol).as("no")))
        .as("_first"))
      .select(col("_first.id").as(idCol), col("_first.no").as(lineNoCol),
        col(lineCol))

  /** Reassemble a line table back into per-document text, preserving
    * line order. One hash aggregation; the in-group sort is per-doc
    * (array_sort over that doc's surviving lines), never global.
    */
  def reassemble(lines: DataFrame, sep: String = " ",
      idCol: String = "doc_id", lineNoCol: String = "line_no",
      lineCol: String = "line"): DataFrame =
    lines
      .groupBy(idCol)
      .agg(
        count(lit(1)).as("n_lines"),
        array_join(
          transform(
            array_sort(collect_list(struct(col(lineNoCol).as("no"),
              col(lineCol).as("l")))),
            s => s.getField("l")),
          sep).as("text"))
}
