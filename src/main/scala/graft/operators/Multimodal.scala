package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed in partition-sized batches.
  *
  * The decode step is a clearly-marked STUB (no codec libraries in this
  * environment): [[DecodeStub.decode]] derives deterministic fake features
  * from the bytes. Everything around it — schema, batch iteration,
  * partitioning, typed Encoders — is the real Spark plumbing a production
  * decoder (JNI/ffmpeg/Pandas-UDF analog) would slot into: swap
  * `DecodeStub.decode` for the real codec and nothing else changes.
  *
  * Scale: decode is a narrow mapPartitions — no shuffle; heavy media rows
  * should be ranged into size-bounded input splits
  * (`spark.sql.files.maxPartitionBytes`) so a batch fits executor memory.
  */
object Multimodal {

  final case class MediaRecord(
      doc_id: Long,
      kind: String, // image | audio | video
      media: Array[Byte])

  final case class MediaFeatures(
      doc_id: Long,
      kind: String,
      n_bytes: Long,
      head_sum: Long, // Σ of first 16 byte values (unsigned)
      fake_width: Int, // deterministic stand-ins for decoded dims
      fake_height: Int)

  object DecodeStub {
    /** STUB decoder — deterministic fake of the real codec call.
      * Real implementation would be: decode bytes → pixels/samples →
      * feature extraction (resize, frame-sample, mel-spectrogram, …).
      */
    def decode(r: MediaRecord): MediaFeatures = {
      val head = r.media.take(16).foldLeft(0L)((a, b) => a + (b & 0xff))
      MediaFeatures(
        doc_id = r.doc_id,
        kind = r.kind,
        n_bytes = r.media.length.toLong,
        head_sum = head,
        fake_width = ((r.media.length * 7 + 13) % 1024).toInt + 1,
        fake_height = ((r.media.length * 13 + 7) % 1024).toInt + 1)
    }
  }

  /** Batched decode over partitions — the mapInPandas analog in typed
    * Scala: one iterator per partition, batch shape = partition.
    */
  def decodeFeatures(ds: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.map(DecodeStub.decode))
  }

  final case class ResizedMedia(
      doc_id: Long, kind: String, width: Int, height: Int, media: Array[Byte])

  /** Image resize plumbing: STUB transform (deterministic byte
    * downsampling standing in for a pixel resampler) inside the real
    * batched map — target dims are per-op config like a production
    * preprocessing stage. Output bytes shrink proportionally, proving the
    * pipeline carries REWRITTEN binary payloads, not just metadata.
    */
  def resize(ds: Dataset[MediaRecord], width: Int, height: Int): Dataset[ResizedMedia] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.map { r =>
      // STUB resampler: take every k-th byte to a width*height/64-bounded
      // payload — a real impl decodes, resamples pixels, re-encodes
      val target = math.max(1, width * height / 64)
      val k = math.max(1, r.media.length / target)
      val out = new Array[Byte]((r.media.length + k - 1) / k)
      var i = 0
      while (i < out.length) { out(i) = r.media(i * k); i += 1 }
      ResizedMedia(r.doc_id, r.kind, width, height, out)
    })
  }

  final case class MediaFrame(
      doc_id: Long, kind: String, frame_no: Int, frame: Array[Byte])

  /** Video frame-sampling plumbing: one input row → n sampled frames
    * (flatMap — the row-expanding batch shape a real ffmpeg sampler has).
    * STUB: byte-range slices stand in for decoded frames; stride derives
    * from the payload, sampling is every `everyNth` frame.
    */
  def sampleFrames(ds: Dataset[MediaRecord], everyNth: Int,
                   maxFrames: Int = 8): Dataset[MediaFrame] = {
    import ds.sparkSession.implicits._
    ds.flatMap { r =>
      val frameSize = math.max(1, r.media.length / math.max(1, maxFrames * everyNth))
      val total = r.media.length / frameSize
      (0 until total by everyNth).take(maxFrames).map { f =>
        MediaFrame(r.doc_id, r.kind, f,
          r.media.slice(f * frameSize, (f + 1) * frameSize))
      }
    }
  }

  /** Demo source: wrap a text table's bytes as media blobs (UTF-8), kind
    * round-robin by id — gives the plumbing a deterministic, content-true
    * binary column to chew on.
    */
  def fromDocuments(spark: SparkSession, sfDir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("kind"),
        encode(col("text"), "UTF-8").as("media"))
      .as[MediaRecord]
  }

  /** DataFrame face of the full pipeline (source → batched decode). */
  def featuresFrame(spark: SparkSession, sfDir: String): DataFrame =
    decodeFeatures(fromDocuments(spark, sfDir)).toDF()
}
