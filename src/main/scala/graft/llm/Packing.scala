package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing and chunking — the two remaining shape operators a
  * pretraining data pipeline runs after cleaning/dedup:
  *
  *   - [[packBins]]: assign documents to fixed token-budget bins
  *     (sequence packing — filling each training sequence with several
  *     short documents instead of padding).
  *   - [[chunkTokens]]: split long documents into overlapping windows of
  *     at most `size` tokens (context-length chunking).
  *
  * Both are DETERMINISTIC and partition-independent: packing orders
  * documents by a seeded content hash inside hash-assigned buckets (the
  * same discipline as [[Sampling]] — no RNG state, stable under retries
  * and cluster layout), and chunk boundaries are pure arithmetic on the
  * token array. Either is reproducible by any SQL engine, which is what
  * the driver's DuckDB oracle checks.
  *
  * Scale: packing's running totals are per-BUCKET window sums — B
  * independent partitions, each bounded at |docs|/B rows — never a
  * global ordering (a single global cumulative sum is the classic
  * unscalable formulation). Chunking is scan-side per-row work.
  */
object Packing {

  /** Streaming ("first-fit in arrival order") sequence packing: documents
    * are ordered by seeded hash within `nBuckets` hash-assigned buckets;
    * within a bucket, a document's bin is `floor(tokensBefore / budget)`
    * — i.e. bins are filled left to right and a document whose tail
    * crosses the boundary opens the next bin's budget (the streaming
    * packer's behavior; an exact bin-packing would be neither streaming
    * nor deterministic under growth).
    *
    * Output: idCol, bucket, bin (within bucket), tok_before (running
    * tokens before this doc within the bin's bucket). Global bin id =
    * (bucket, bin).
    */
  def packBins(docs: DataFrame, idCol: String, tokenCountCol: String,
      budget: Long, nBuckets: Int = 8, seed: Int = 7): DataFrame = {
    val bucket = pmod(Sampling.hashBucket(col(idCol), seed),
      lit(nBuckets.toLong))
    val order = Sampling.hashBucket(col(idCol), seed + 1)
    val w = Window.partitionBy("bucket").orderBy(col("_ord"), col(idCol))
    docs.select(col(idCol), col(tokenCountCol).cast("long").as("_n"),
        bucket.as("bucket"), order.as("_ord"))
      .withColumn("_before",
        coalesce(sum(col("_n")).over(
          w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col(idCol), col("bucket"),
        (col("_before") / budget).cast("long").as("bin"),
        col("_n").as("n_tokens"), col("_before").as("tok_before"))
  }

  /** Overlapping token windows: chunk i covers token positions
    * [i·step, i·step + size) with step = size − overlap; the last chunk
    * may be shorter, and a document shorter than `size` yields exactly
    * one chunk. Returns array<struct<chunk_id, text>> — explode it for
    * one row per chunk.
    */
  def chunkTokens(toks: Column, size: Int, overlap: Int): Column = {
    require(size > overlap && overlap >= 0,
      s"need size > overlap >= 0, got size=$size overlap=$overlap")
    val step = size - overlap
    // number of chunks: 1 + ceil(max(0, len - size) / step), via integer
    // arithmetic both engines share: 1 + floor((max(0,len-size)+step-1)/step)
    val len = size_(toks)
    val extra = greatest(len - size, lit(0))
    val nChunks = lit(1) + ((extra + step - 1) / step).cast("int")
    transform(sequence(lit(0), nChunks - 1), i =>
      struct(i.cast("long").as("chunk_id"),
        array_join(slice(toks, i * step + 1, lit(size)), " ").as("text")))
  }

  private def size_(c: Column): Column = org.apache.spark.sql.functions.size(c)
}
