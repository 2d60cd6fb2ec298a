package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.{Q, Tables}
import graft.functions.DetAgg

/** Multimodal column handling: image/audio/video payloads as opaque
  * `binary` columns plus a typed metadata struct, with decode /
  * feature-extraction / frame-sampling implemented over real Spark
  * plumbing (Dataset + mapPartitions batching — the JVM analog of
  * `mapInPandas`).
  *
  * The actual media DECODE is a deliberate, clearly-marked STUB
  * ([[FakeDecoder]]): no image/audio codecs ship in this environment, so
  * it computes deterministic byte-level features instead. Everything
  * around it — schema, encoders, partition-wise batching, frame
  * sampling, aggregation — is the real production shape: swap
  * `FakeDecoder.decode` for a codec call and nothing else changes.
  *
  * Scale posture: payloads never leave their partition (no shuffle until
  * the final small aggregate); mapPartitions amortizes any per-batch
  * decoder setup across the partition, exactly like a Pandas-UDF batch.
  */
object Multimodal {

  final case class Asset(
      doc_id: Long,
      blob: Array[Byte],
      mime: String,
      width: Int,
      height: Int)

  final case class Features(
      doc_id: Long,
      n_bytes: Int,
      mean_byte: Double,
      byte_entropy: Double,
      n_frames: Int)

  /** STUB decoder — stands in for a real image/audio codec. Deterministic
    * byte-level features so tests and oracles are stable. */
  object FakeDecoder {
    def decode(blob: Array[Byte]): (Double, Double) = {
      // real implementation would be e.g. ImageIO.read / ffmpeg here
      if (blob.isEmpty) (0.0, 0.0)
      else {
        val counts = new Array[Long](256)
        blob.foreach(b => counts(b & 0xff) += 1)
        val n = blob.length.toDouble
        val mean = blob.map(b => (b & 0xff).toLong).sum / n
        val entropy = counts.filter(_ > 0).map { c =>
          val p = c / n; -p * math.log(p) / math.log(2)
        }.sum
        (mean, entropy)
      }
    }
  }

  /** Build a synthetic asset table from `documents`: UTF-8 bytes as the
    * opaque payload + deterministic metadata (real pipelines read the
    * blob column straight from parquet the same way). */
  def assets(docs: DataFrame): Dataset[Asset] = {
    import docs.sparkSession.implicits._
    docs.select(
        col("doc_id"),
        to_binary(col("text"), lit("utf-8")).as("blob"),
        lit("application/octet-stream").as("mime"),
        (col("n_chars") % 640).cast("int").as("width"),
        (col("n_chars") % 480).cast("int").as("height"))
      .as[Asset]
  }

  /** Frame sampling: k fixed-size byte windows at evenly spaced offsets
    * of the payload (the keyframe-sample pattern for video). Pure
    * expressions — no decode, no shuffle. */
  def sampleFrames(assetsDf: DataFrame, k: Int = 4, frameBytes: Int = 16): DataFrame =
    assetsDf.select(col("doc_id"),
      expr(s"""transform(sequence(0, ${k - 1}), i ->
              |  substring(blob,
              |    1 + i * greatest((length(blob) - $frameBytes)
              |                     div greatest(${k - 1}, 1), 0),
              |    $frameBytes))""".stripMargin).as("frames"))

  /** Resize STUB: nearest-neighbor byte-level downsample to `targetBytes`
    * (stands in for image resize — swap the sampling loop for a scaler
    * and the plumbing is unchanged). Runs in mapPartitions like decode. */
  def resize(assetsDs: Dataset[Asset], targetBytes: Int = 64): Dataset[Asset] = {
    import assetsDs.sparkSession.implicits._
    assetsDs.mapPartitions { it =>
      it.map { a =>
        val n = a.blob.length
        val out =
          if (n <= targetBytes) a.blob
          else Array.tabulate(targetBytes)(i => a.blob((i.toLong * n / targetBytes).toInt))
        a.copy(blob = out,
          width = math.min(a.width, targetBytes),
          height = math.min(a.height, targetBytes))
      }
    }
  }

  /** Partition-wise decode + feature extraction (mapPartitions batching). */
  def extractFeatures(assetsDs: Dataset[Asset], k: Int = 4): Dataset[Features] = {
    import assetsDs.sparkSession.implicits._
    assetsDs.mapPartitions { it =>
      // per-partition decoder setup would happen here (once per batch)
      it.map { a =>
        val (mean, entropy) = FakeDecoder.decode(a.blob)
        Features(a.doc_id, a.blob.length, mean, entropy, k)
      }
    }
  }

  val queries: Seq[Q] = Seq(

    Q("q40_multimodal_bytes",
      s"""SELECT source, count(*) AS n_assets,
         |  CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
         |  CAST(max(octet_length(encode(text))) AS BIGINT) AS max_bytes,
         |  ${DetAgg.sql.davg("CAST(octet_length(encode(text)) AS DOUBLE)")} AS avg_bytes
         |FROM documents GROUP BY source ORDER BY source""".stripMargin,
      "Binary payload stats per source: byte lengths computed on the opaque blob column, no decode needed — the cheap metadata pass a media pipeline runs first.") {
      (s, d) =>
        Tables.documents(s, d)
          .select(col("source"), to_binary(col("text"), lit("utf-8")).as("blob"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_assets"),
            sum(length(col("blob"))).as("total_bytes"),
            max(length(col("blob"))).cast("bigint").as("max_bytes"),
            DetAgg.davg(length(col("blob")).cast("double")).as("avg_bytes"))
          .orderBy(col("source"))
    },

    Q("q41_multimodal_features",
      """WITH b AS (
        |  SELECT doc_id, hex(encode(text)) AS hx, octet_length(encode(text)) AS n
        |  FROM documents),
        |resized AS (
        |  SELECT doc_id,
        |    CASE WHEN n <= 128
        |      THEN list_transform(range(n), j -> CAST('0x' || substring(hx, 2*j + 1, 2) AS INTEGER))
        |      ELSE list_transform(range(128), i -> CAST('0x' || substring(hx, 2*((i*n)//128) + 1, 2) AS INTEGER))
        |    END AS bytes
        |  FROM b),
        |base AS (
        |  SELECT doc_id, CAST(len(bytes) AS INTEGER) AS n_bytes,
        |    CASE WHEN len(bytes) = 0 THEN 0.0
        |         ELSE list_sum(list_transform(bytes, x -> CAST(x AS DOUBLE))) / len(bytes)
        |    END AS mean_byte
        |  FROM resized),
        |cnt AS (
        |  SELECT doc_id, v, count(*) AS c
        |  FROM (SELECT doc_id, unnest(bytes) AS v FROM resized) GROUP BY doc_id, v),
        |ent AS (
        |  SELECT doc_id,
        |    round(-sum((CAST(c AS DOUBLE) / s) * ln(CAST(c AS DOUBLE) / s) / ln(2)), 6) AS byte_entropy
        |  FROM (SELECT doc_id, v, c, sum(c) OVER (PARTITION BY doc_id) AS s FROM cnt)
        |  GROUP BY doc_id)
        |SELECT base.doc_id, n_bytes, mean_byte,
        |  COALESCE(byte_entropy, 0.0) AS byte_entropy, 4 AS n_frames
        |FROM base LEFT JOIN ent ON base.doc_id = ent.doc_id
        |ORDER BY base.doc_id""".stripMargin,
      "Stubbed resize + decode + feature extraction via Dataset.mapPartitions (real batching shape; deterministic byte-level features over 128-byte thumbnails). The stub decode is honest-but-deterministic, which makes even this query oracle-able: the DuckDB twin re-derives the nearest-neighbor byte sample from the hex of the utf-8 blob and recomputes mean/entropy in SQL. An EMPTY blob is guarded on the twin side (CASE around the mean's division, LEFT JOIN + COALESCE for entropy) so it agrees with the Spark stub's (0.0, 0.0) instead of NULLing the mean and dropping the row from the inner join. mean_byte needs NO rounding — an integer byte sum is exact in a double in any summation order, and both engines then perform the identical IEEE division (resizing to a power-of-two length makes .xxxxxx5 halves COMMON, where HALF_UP/HALF_EVEN rounding disagreement bites — so not rounding is the safer parity, not a shortcut). byte_entropy is transcendental, so both sides round to 6 decimals to absorb ulp-level ln() differences.") {
      (s, d) =>
        extractFeatures(resize(assets(Tables.documents(s, d)), targetBytes = 128))
          .toDF()
          .select(col("doc_id"), col("n_bytes"), col("mean_byte"),
            round(col("byte_entropy"), 6).as("byte_entropy"), col("n_frames"))
          .orderBy(col("doc_id"))
    },
  )
}
