package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextOps

/** The reference engine's flagship computation — an inverted word index —
  * as a single declarative Spark plan.
  *
  * Reference dataflow (`/root/reference/src/tema1.cpp`): tokenize (:144) ->
  * normalize (:88-99) -> drop empties (:148-151) -> per-mapper dedup of
  * (word, doc) pairs (:154-163) -> barrier/shuffle (:170-186) -> group by
  * word into 26 letter buckets (:194-210) -> sort ids asc (:227) -> sort
  * words by (doc-count desc, word asc) (:234).
  *
  * Scale notes (100 TB posture):
  *  - ONE shuffle, not two: `collect_set` dedups (word, doc_id) pairs in
  *    its partial (map-side) aggregation, so a separate `.distinct()`
  *    before the groupBy would only add a second full shuffle of the same
  *    key space. The reference's per-mapper `std::map` dedup (tema1.cpp:
  *    154-158) IS partial aggregation — Spark gives it automatically.
  *  - The explode inflates rows ~`n_words`×, but it runs map-side inside
  *    whole-stage codegen and is immediately collapsed by the partial
  *    aggregate; shuffle volume is O(distinct pairs), same as the
  *    reference's shared `words` vector.
  *  - No driver-side state: the reference slurps the whole corpus into RAM
  *    (tema1.cpp:345-364); here splits stream through executors.
  */
object InvertedIndex {

  /** docs(doc_id, text) -> (word, ids: array<long> sorted asc, n_docs). */
  def apply(docs: DataFrame): DataFrame =
    TextOps.explodedWords(docs, col("doc_id"))
      .groupBy(col("word"))
      .agg(sort_array(collect_set(col("doc_id"))).as("ids"))
      .select(
        col("word"),
        col("ids"),
        size(col("ids")).cast("long").as("n_docs"))

  /** Oracle-friendly projection: posting list as a space-joined string
    * (robustly hashable across engines; also the reference's own line
    * format, tema1.cpp:240-247).
    */
  def asStrings(docs: DataFrame): DataFrame =
    apply(docs).select(
      col("word"),
      array_join(transform(col("ids"), _.cast("string")), " ").as("doc_ids"),
      col("n_docs"))

  /** Scale-path representation: posting lists sharded into bounded
    * chunks. `apply`'s collect_set builds ONE array per word — correct
    * to the reference contract, but at 100 TB a stop-word's posting
    * list (billions of ids) would become a single unspillable row.
    * Sharding bounds every row: ids are ranked within their word and
    * grouped into `shardSize` chunks, so the widest row is O(shardSize)
    * regardless of word frequency, and shards of one word land on
    * different reducers. Downstream consumers union shards (ranges are
    * contiguous and ordered).
    */
  def sharded(docs: DataFrame, shardSize: Int = 10000): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("word")).orderBy(col("doc_id"))
    graft.functions.TextOps.explodedWords(docs, col("doc_id"))
      .distinct()
      .withColumn("rn", row_number().over(w))
      .withColumn("shard", ((col("rn") - 1) / shardSize).cast("int"))
      .groupBy(col("word"), col("shard"))
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"),
        count(lit(1)).cast("long").as("n_docs_in_shard"))
  }

  /** Incremental index maintenance: fold a batch of NEW documents into
    * an existing index without re-reading the indexed corpus — the
    * operation a daily-crawl pipeline runs instead of a full rebuild.
    * The existing index contributes its posting lists as pre-
    * aggregated id arrays; only the delta's text is tokenized. One
    * union + one aggregate; `flatten` merges list-of-lists, and
    * `array_distinct` guards re-delivered docs (idempotent merge).
    * Equivalence to a full rebuild is property-tested.
    */
  def incremental(existing: DataFrame, newDocs: DataFrame): DataFrame =
    apply(newDocs)
      .unionByName(existing)
      .groupBy(col("word"))
      .agg(sort_array(array_distinct(flatten(collect_list(col("ids")))))
        .as("ids"))
      .select(col("word"), col("ids"),
        size(col("ids")).cast("long").as("n_docs"))

  /** Full reference output ordering: letter bucket, then doc-count desc,
    * word asc (tema1.cpp:110-115, :234).
    */
  def ordered(docs: DataFrame): DataFrame =
    apply(docs)
      .withColumn("letter", substring(col("word"), 1, 1))
      .orderBy(col("letter"), col("n_docs").desc, col("word").asc)
}
