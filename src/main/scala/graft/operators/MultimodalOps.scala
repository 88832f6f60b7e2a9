package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for training-data pipelines: image/audio/
  * video travel as opaque `binary` columns with typed metadata, and the
  * decode / feature-extract kernels run per-partition in batches.
  *
  * The Spark-side plumbing here — schemas, binary columns, partition-local
  * batching, deterministic output shape — is real and tested. The media
  * kernels themselves are STUBS (this environment has no image/audio
  * libraries): `stubDecodeMeta` derives deterministic fake dimensions from
  * an md5 of the bytes, and `stubFrameFeatures` emits fixed-length
  * deterministic vectors. Swapping in a real decoder changes ONLY the
  * marked kernel bodies; every plan around them is production-shaped.
  */
object MultimodalOps {

  /** Typed media asset row: the schema a 100 TB media lake would carry. */
  case class MediaAsset(asset_id: Long, media_type: String, content: Array[Byte])

  case class MediaMeta(asset_id: Long, media_type: String, n_bytes: Long,
                       width: Int, height: Int, digest: String)

  case class FrameFeature(asset_id: Long, frame_idx: Int, feature: Array[Float])

  /** Wrap any table with a binary payload column into the asset schema. */
  def asAssets(df: DataFrame, idCol: String, binCol: String,
               mediaType: String): Dataset[MediaAsset] = {
    implicit val enc = Encoders.product[MediaAsset]
    df.select(col(idCol).cast("long").as("asset_id"),
      lit(mediaType).as("media_type"),
      col(binCol).cast("binary").as("content")).as[MediaAsset]
  }

  /** Metadata extraction as a columnar plan (no kernel needed): sizes and
    * digest are real; width/height are the STUB decode — deterministic
    * fakes derived from the digest, standing in for a header parse. */
  def extractMeta(assets: Dataset[MediaAsset]): Dataset[MediaMeta] = {
    implicit val enc = Encoders.product[MediaMeta]
    assets.toDF()
      .withColumn("digest", md5(col("content")))
      .select(col("asset_id"), col("media_type"),
        length(col("content")).cast("long").as("n_bytes"),
        // STUB: fake dimensions from the digest (replace with header parse)
        (conv(substring(col("digest"), 1, 4), 16, 10).cast("int") % 1920 + 1).as("width"),
        (conv(substring(col("digest"), 5, 4), 16, 10).cast("int") % 1080 + 1).as("height"),
        col("digest"))
      .as[MediaMeta]
  }

  /** Per-partition batched kernel execution — the mapInPandas/mapPartitions
    * shape: rows stream in, the kernel sees bounded batches (never the
    * whole partition), outputs are flat feature rows. `batchSize` bounds
    * kernel memory exactly like Arrow batch size does for Pandas UDFs.
    */
  def frameFeatures(assets: Dataset[MediaAsset], framesPerAsset: Int,
                    featureDim: Int, batchSize: Int = 64): Dataset[FrameFeature] = {
    implicit val enc = Encoders.product[FrameFeature]
    assets.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // STUB KERNEL: a real implementation would decode `batch` with an
        // image/video library here. The fake is deterministic in the bytes
        // AND engine-portable (md5-derived, so a SQL oracle can replicate
        // it): feature[j] = first 24 md5 bits of "contentDigest:frame:j"
        // as a dyadic fraction in [0, 1) — exact in float32.
        batch.iterator.flatMap { a =>
          val digest = md5Hex(a.content)
          (0 until framesPerAsset).iterator.map { f =>
            FrameFeature(a.asset_id, f, Array.tabulate(featureDim) { j =>
              val h = md5Bytes(s"$digest:$f:$j".getBytes("UTF-8"))
              val v = ((h(0) & 0xff) << 16) | ((h(1) & 0xff) << 8) | (h(2) & 0xff)
              v / 16777216.0f // 2^24: v fits the float mantissa exactly
            })
          }
        }
      }
    }
  }

  private def md5Bytes(b: Array[Byte]): Array[Byte] =
    java.security.MessageDigest.getInstance("MD5").digest(b)

  private def md5Hex(b: Array[Byte]): String =
    md5Bytes(b).map(x => f"$x%02x").mkString
}
