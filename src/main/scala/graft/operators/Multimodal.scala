package graft.operators

import graft.functions.Hashing
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._

/**
 * Multimodal-column plumbing for a training-data pipeline: media payloads
 * are opaque `binary` columns with typed metadata; decode / frame-sample /
 * feature-extract run distributed over partitions, never on the driver.
 *
 * The actual media codecs are NOT available in this environment, so the
 * decode step is a clearly-marked DETERMINISTIC STUB (pseudo-metadata
 * derived from the content hash). Everything around it — binary column
 * handling, schema, explode-based frame fan-out, mapPartitions batch shape,
 * partition-preserving narrow ops — is the real Spark-side design a decoder
 * would plug into (swap `stub*` expressions for the codec call).
 */
object Multimodal {

  /** Attach a binary payload column (here: the UTF-8 bytes of `textCol`;
    * in production: the raw media bytes read from object storage). */
  def withBinaryPayload(docs: DataFrame, textCol: String, as: String = "content"): DataFrame =
    docs.withColumn(as, encode(col(textCol), "UTF-8"))

  /**
   * "Decode" media metadata — STUB: width/height/frame-count are derived
   * deterministically from the md5 of the payload (a real implementation
   * parses the container header here). Shape is the contract: one narrow
   * projection, no shuffle, metadata typed int/string.
   */
  def decodeMetadata(df: DataFrame, binCol: String = "content"): DataFrame = {
    val h = Hashing.stableHash60(col(binCol))
    df.withColumn("byte_len", length(col(binCol)))
      .withColumn("content_md5", md5(col(binCol)))
      .withColumn("width", (lit(64) + h % 448).cast("int"))
      .withColumn("height", (lit(64) + shiftright(h, 9) % 448).cast("int"))
      .withColumn("n_frames", (lit(1) + shiftright(h, 18) % 30).cast("int"))
  }

  /**
   * Frame sampling: fan one payload out to fixed-size byte windows
   * (video → frames, audio → chunks). explode(sequence) is a narrow
   * Generator — parallelism follows the input partitioning; at scale the
   * frame rows inherit the parent file-split locality.
   */
  def sampleFrames(df: DataFrame, binCol: String = "content", frameBytes: Int = 100): DataFrame = {
    val nFrames = floor((length(col(binCol)) - 1) / frameBytes).cast("int") + 1
    df.withColumn("frame_idx", explode(sequence(lit(0), nFrames - 1)))
      .withColumn("frame", substr(col(binCol), col("frame_idx") * frameBytes + 1, lit(frameBytes)))
      .withColumn("frame_md5", md5(col("frame")))
  }

  /**
   * Per-document feature extraction via mapPartitions — the pattern for
   * heavyweight decoders (model inference, image feature nets): the
   * iterator lets an implementation batch rows and amortize per-partition
   * setup (load model once per partition, not per row). STUB feature:
   * a normalized 16-bin byte histogram (deterministic, codec-free).
   *
   * Output is one row per (document, bin) with scalar columns — an array
   * column here would be un-sortable/un-hashable for downstream exact
   * comparison tooling, and the long shape joins/aggregates naturally.
   * Use `featureVectors` to fold back to one array row per document.
   */
  def byteHistogramFeatures(df: DataFrame, idCol: String, binCol: String = "content",
                            bins: Int = 16): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val pairs: Dataset[(Long, Array[Byte])] =
      df.select(col(idCol).cast("long"), col(binCol)).as[(Long, Array[Byte])]
    pairs.mapPartitions { it =>
      // per-partition setup would go here (e.g. ??? -> load decoder/model)
      it.flatMap { case (id, bytes) =>
        val hist = new Array[Long](bins)
        var i = 0
        while (i < bytes.length) {
          hist(((bytes(i) & 0xff) * bins) / 256) += 1L
          i += 1
        }
        (0 until bins).iterator.map { b =>
          val v = if (bytes.length > 0) hist(b).toDouble / bytes.length else 0.0
          (id, b, hist(b), v)
        }
      }
    }.toDF(idCol, "bin", "bin_count", "value")
  }

  /** Fold the long-shape histogram back to a dense per-document vector
    * (for similarity search over the extracted features). */
  def featureVectors(features: DataFrame, idCol: String): DataFrame =
    features.groupBy(col(idCol))
      .agg(transform(array_sort(collect_list(struct(col("bin"), col("value")))),
        s => s.getField("value").cast("float")).as("features"))

  /**
   * Cross-document media near-dup via frame-hash Jaccard — the standard
   * video/image dedup shape (per-frame fingerprints, set overlap): two
   * payloads are near-dups when the Jaccard of their distinct frame-hash
   * sets clears `threshold`. Reuses the inverted-index pair machinery
   * ([[Dedup.jaccardPairsFromHashed]]) on a frame stream instead of text
   * shingles, so at 100 TB only (id, 8-byte frame hash) ever shuffles —
   * payloads stay at the scan. With a real decoder the frames would be
   * decoded keyframes and the hash a perceptual one; sampling, hashing
   * and pairing machinery are identical either way. Ubiquitous frames
   * (padding, black frames, silence) above `maxBucket` docs are dropped
   * exactly like stop-shingles.
   */
  def frameNearDupPairs(df: DataFrame, idCol: String, binCol: String = "content",
                        frameBytes: Int = 100, threshold: Double = 0.5,
                        maxBucket: Int = 1000): DataFrame = {
    val frames = sampleFrames(df.select(col(idCol).as("id"), col(binCol)), binCol, frameBytes)
      .select(col("id"), Hashing.stableHash60(col("frame")).as("h"))
      .distinct()
    Dedup.jaccardPairsFromHashed(frames, threshold, maxBucket)
  }

  /**
   * Temporal segmentation (scene/shot boundary detection) over the frame
   * stream: a boundary wherever the frame fingerprint's Hamming distance
   * to the PREVIOUS frame exceeds `maxHamming`; the first frame always
   * opens scene 0, and scene ids are a running count of boundaries. With
   * a real decoder the fingerprint is a perceptual hash (pHash/dHash —
   * small Hamming distance ⟺ visually similar); the deterministic
   * stand-in hash keeps identical frames at distance 0, so planted
   * repeat/change structure segments exactly (spec-pinned), and the
   * lag + bit_count(xor) + running-sum machinery is what production
   * keyframe extraction runs unchanged.
   *
   * Shape: the frame fan-out is narrow (frames inherit file-split
   * locality), then ONE doc-keyed window computes lag, boundary flag and
   * the running scene id — everything downstream shares that partition.
   */
  def sceneBoundaries(df: DataFrame, idCol: String, binCol: String = "content",
                      frameBytes: Int = 100, maxHamming: Int = 20): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(idCol).orderBy("frame_idx")
    sampleFrames(df, binCol, frameBytes)
      .select(col(idCol), col("frame_idx"),
        Hashing.stableHash60(col("frame")).as("__h"))
      .withColumn("__prev", lag(col("__h"), 1).over(w))
      .withColumn("is_boundary", col("__prev").isNull ||
        bit_count(expr("__h ^ __prev")) > maxHamming)
      .withColumn("scene_id",
        sum(when(col("is_boundary"), 1L).otherwise(0L))
          .over(w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.currentRow)) - 1)
      .select(col(idCol), col("frame_idx"), col("is_boundary"), col("scene_id"))
  }
}
