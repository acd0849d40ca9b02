package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads travel as opaque
  * `binary` columns with a typed metadata struct; decode / feature-extract
  * runs as a partition-batched kernel over the binary column.
  *
  * The Spark-side shape (schema, partitioning, batch iteration) is real and
  * tested. The media decode itself is a DETERMINISTIC STUB — this
  * environment has no image/audio codecs, so [[decodeStub]] derives fake
  * "features" from the raw bytes. A production deployment replaces ONLY the
  * `decodeOne` body with a real codec call (e.g. JPEG dimensions, PCM
  * duration); everything around it — the mapPartitions batching, the output
  * schema, the null/empty handling — is the production path.
  */
object Multimodal {

  /** Decoded-feature row (the kernel's output schema). */
  final case class MediaFeatures(doc_id: Long, n_bytes: Int, first_byte: Int,
                                 last_byte: Int, fake_width: Int, fake_height: Int)

  /** Wrap a text table into the multimodal layout: `(doc_id, payload BINARY,
    * meta STRUCT<mime STRING, n_bytes INT>)`. In production the payload
    * column comes straight from the store (image bytes); here the UTF-8
    * text bytes stand in.
    */
  def attachPayload(df: DataFrame, idCol: String, textCol: String,
                    mime: String = "text/plain"): DataFrame =
    df.select(
      col(idCol).cast("long").as("doc_id"),
      encode(col(textCol), "UTF-8").as("payload"),
      struct(
        lit(mime).as("mime"),
        octet_length(col(textCol)).as("n_bytes")).as("meta"))

  /** STUB decode of one payload. A real implementation would parse the
    * container format here; the fake features are pure functions of the
    * bytes so tests and oracles stay deterministic. Empty/null payloads
    * yield -1 sentinel bytes (decode-failure convention).
    */
  private def decodeOne(id: Long, payload: Array[Byte]): MediaFeatures = {
    val n = if (payload == null) 0 else payload.length
    val first = if (n == 0) -1 else payload(0) & 0xff
    val last = if (n == 0) -1 else payload(n - 1) & 0xff
    MediaFeatures(id, n, first, last, n % 640, n % 480)
  }

  /** Partition-batched decode over the binary column — the `mapInPandas`
    * analog in Scala: one kernel invocation per partition, streaming
    * through rows without materializing the partition; input partitioning
    * is preserved (no shuffle).
    */
  def decodeStub(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(it => it.map { case (id, payload) => decodeOne(id, payload) })
      .toDF()
  }
}
