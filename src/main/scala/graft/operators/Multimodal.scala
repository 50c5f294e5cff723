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
      width: Int, // REAL header-derived dims for PNG/JPEG/GIF payloads;
      height: Int) // deterministic stub values otherwise

  object DecodeStub {
    /** Half-real decoder: width/height come from the ACTUAL bytes when the
      * payload carries a PNG/JPEG/GIF header ([[graft.core.ImageHeader]] —
      * pure JVM, no codec libs); everything past the header (pixel decode,
      * resample, mel-spectrogram, …) remains a deterministic STUB, so
      * unrecognized payloads fall back to the stub dimension formula.
      */
    def decode(r: MediaRecord): MediaFeatures = {
      val head = r.media.take(16).foldLeft(0L)((a, b) => a + (b & 0xff))
      val (w, h) = graft.core.ImageHeader.parse(r.media).getOrElse(
        (((r.media.length * 7 + 13) % 1024).toInt + 1,
          ((r.media.length * 13 + 7) % 1024).toInt + 1))
      MediaFeatures(
        doc_id = r.doc_id,
        kind = r.kind,
        n_bytes = r.media.length.toLong,
        head_sum = head,
        width = w,
        height = h)
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

  /** Demo source with REAL image headers: every document's bytes wrapped
    * in a minimal PNG container whose IHDR dims derive from the doc id —
    * [[decodeFeatures]] must then recover width/height FROM THE BYTES,
    * which the DuckDB oracle cross-derives from the id formula (two
    * independent paths to the same numbers).
    */
  def pngRecords(spark: SparkSession, sfDir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        MediaRecord(id, "image", graft.core.ImageHeader.pngWrap(
          text.getBytes("UTF-8"), (id % 1024).toInt + 1, (id % 768).toInt + 1))
      }
  }

  /** DataFrame face of the full pipeline (source → batched decode). */
  def featuresFrame(spark: SparkSession, sfDir: String): DataFrame =
    decodeFeatures(fromDocuments(spark, sfDir)).toDF()
}
