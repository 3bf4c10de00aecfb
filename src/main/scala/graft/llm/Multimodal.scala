package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal-column operators: typed struct composition of text +
  * embedding + metadata, and a binary media pipeline with a REAL image
  * codec — grayscale PNGs are encoded and decoded through `javax.imageio`
  * (JDK-bundled, zero extra deps) behind `mapPartitions` batch boundaries,
  * the Scala analog of `mapInPandas`.
  *
  * Determinism contract with the DuckDB oracle: pixel values follow a
  * closed formula seeded by the md5 hex-digit sum of the text (identical
  * in both engines), PNG grayscale round-trips losslessly, and the query
  * emits only decoded pixel statistics — never encoder-specific bytes — so
  * DuckDB reproduces every output column by replaying the formula.
  */
object Multimodal {

  // ImageIO defaults to a disk-backed stream cache; executor threads want
  // pure in-memory encode/decode.
  javax.imageio.ImageIO.setUseCache(false)

  /** Native codegen'd dot product (graft.functions.DotProduct). */
  private def dot(a: Column, b: Column): Column = call_function("graft_dot", a, b)
  private def norm(c: Column): Column = sqrt(dot(c, c))

  // ---------------------------------------------------------------------
  // M1 multimodal struct join: one typed record per document carrying
  // {meta{lang, source, n_chars}, text, vec{label, embedding}} — pure
  // StructType composition (SURVEY.md §7.4), then per-source stats read
  // back THROUGH the struct fields (proves the nesting is real, not
  // cosmetic). 100 TB: documents⋈embeddings is a key-equi join on the
  // shared id — co-partitioned/bucketed storage makes it shuffle-free.
  def structJoin(spark: SparkSession, dir: String): DataFrame = {
    graft.GraftExtensions.ensure(spark)
    import spark.implicits._
    val d = Tables.documents(spark, dir)
    val e = Tables.embeddings(spark, dir)
    val rec = d.join(e, d("doc_id") === e("vec_id"))
      .select(
        $"doc_id",
        struct($"lang", $"source", $"n_chars").as("meta"),
        $"text",
        struct($"label", $"embedding").as("vec"))
    rec
      .withColumn("rnrm", round(norm($"vec.embedding"), 6))
      .groupBy($"meta.source".as("source"))
      .agg(
        count(lit(1)).as("n_recs"),
        sum($"meta.n_chars").as("sum_chars"),
        countDistinct($"vec.label").as("n_labels"),
        round(avg($"rnrm"), 6).as("avg_norm"))
      .orderBy($"source")
  }

  val structJoinSql: String =
    """WITH rec AS (
      |  SELECT d.doc_id,
      |    {'lang': d.lang, 'source': d.source, 'n_chars': d.n_chars} AS meta,
      |    d.text,
      |    {'label': e.label, 'embedding': e.embedding} AS vec
      |  FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id)
      |SELECT meta.source AS source,
      |  COUNT(*) AS n_recs,
      |  CAST(SUM(meta.n_chars) AS BIGINT) AS sum_chars,
      |  COUNT(DISTINCT vec.label) AS n_labels,
      |  round(AVG(round(sqrt(list_sum(list_transform(vec.embedding, x -> x::DOUBLE * x))), 6)), 6) AS avg_norm
      |FROM rec GROUP BY source ORDER BY source""".stripMargin

  // ---------------------------------------------------------------------
  // M2 media pipeline over binary columns carrying REAL images. Each doc
  // gets a small grayscale PNG whose pixels follow a deterministic formula
  // (pixel(x,y) = (d1 + 7x + 13y) mod 256, d1 = md5-hex digit sum of the
  // text); the pipeline then DECODES those PNGs with javax.imageio and
  // aggregates decoded pixel statistics. Encode stands in for data arrival
  // (a production corpus reads the bytes from storage); decode is the real
  // production pattern. 100 TB: both codec stages are map-side behind
  // mapPartitions boundaries; binaries never shuffle — only small ints
  // cross the exchange after feature extraction.
  def mediaPipeline(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media = Tables.documents(spark, dir)
      .select($"source", $"n_chars",
        md5($"text").as("md5hex"),
        (lit(4) + $"n_chars" % 12).cast("int").as("w"),
        (lit(4) + ($"n_chars" * 3) % 12).cast("int").as("h"))
      .withColumn("mmeta", struct(                              // typed media metadata
        $"w".as("width"), $"h".as("height"), lit("png").as("format")))
    val features = decodeImages(encodeImages(media))
    features
      // resize: aspect-preserving fit into 224x224 on the DECODED dims —
      // pure integer arithmetic; guards the degenerate 0-dimension case
      .withColumn("fit_w", expr(
        "CASE WHEN dec_w >= dec_h THEN least(dec_w, 224) " +
          "ELSE CAST(dec_w * 224 / greatest(dec_h, 1) AS INT) END"))
      .withColumn("fit_h", expr(
        "CASE WHEN dec_h >= dec_w THEN least(dec_h, 224) " +
          "ELSE CAST(dec_h * 224 / greatest(dec_w, 1) AS INT) END"))
      .withColumn("frames", sequence(lit(0), ($"n_chars" % 10).cast("int")))
      .withColumn("n_sampled", size(filter($"frames", f => f % 3 === 0)))
      .groupBy($"source")
      .agg(
        count(lit(1)).as("n_media"),
        sum($"px_sum").as("sum_px"),
        max($"dec_w").as("max_width"),
        max($"dec_h").as("max_height"),
        sum($"fit_w").as("sum_fit_w"),
        sum($"fit_h").as("sum_fit_h"),
        sum($"n_sampled").as("sum_sampled_frames"),
        expr("bool_and(decode_ok)").as("all_decoded"))
      .orderBy($"source")
  }

  /** Encode each row's deterministic pixel grid as a real grayscale PNG
    * (binary column `media`) behind a `mapPartitions` batch boundary.
    * Expects columns `md5hex` (string), `w`, `h` (int). In production this
    * stage is data arrival — bytes read from object storage — which is why
    * it is kept separate from [[decodeImages]]. */
  def encodeImages(media: DataFrame): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types.BinaryType
    val outSchema = media.schema.add("media", BinaryType)
    val hexIdx = media.schema.fieldIndex("md5hex")
    val wIdx = media.schema.fieldIndex("w")
    val hIdx = media.schema.fieldIndex("h")
    media.mapPartitions { rows =>
      rows.map { r =>
        val hex = r.getString(hexIdx)
        if (hex == null) Row.fromSeq(r.toSeq :+ null)
        else {
          var d1 = 0
          var i = 0
          while (i < hex.length) { d1 += Character.digit(hex.charAt(i), 16); i += 1 }
          val w = r.getInt(wIdx); val h = r.getInt(hIdx)
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
          val raster = img.getRaster
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) { raster.setSample(x, y, 0, (d1 + 7 * x + 13 * y) % 256); x += 1 }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          Row.fromSeq(r.toSeq :+ bos.toByteArray)
        }
      }
    }(Encoders.row(outSchema))
  }

  /** REAL decoder behind a `mapPartitions` batch boundary — the Scala
    * analog of `mapInPandas`: rows stream through executor-sized
    * partitions, `javax.imageio` parses each PNG payload, and the row is
    * widened with decoded features (width, height, pixel sum). Unreadable
    * payloads (null, truncated, or non-image bytes) take the error
    * side-channel — `decode_ok = false` with null features — instead of
    * killing the task, so callers can route failures to a quarantine sink.
    * Deliberately a codegen/pruning boundary — a codec is opaque to
    * Catalyst by nature, which is why it runs before any shuffle
    * (binaries never cross an exchange). */
  def decodeImages(media: DataFrame): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types.{BooleanType, IntegerType, LongType}
    val outSchema = media.schema
      .add("decode_ok", BooleanType)
      .add("dec_w", IntegerType)
      .add("dec_h", IntegerType)
      .add("px_sum", LongType)
    val idx = media.schema.fieldIndex("media")
    media.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](idx)
        val img =
          if (bytes == null) null
          else
            try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
            catch { case _: Exception => null }
        if (img == null) Row.fromSeq(r.toSeq :+ false :+ null :+ null :+ null)
        else {
          val raster = img.getRaster
          val (w, h) = (img.getWidth, img.getHeight)
          var s = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) { s += raster.getSample(x, y, 0); x += 1 }
            y += 1
          }
          Row.fromSeq(r.toSeq :+ true :+ w :+ h :+ s)
        }
      }
    }(Encoders.row(outSchema))
  }

  /** DuckDB can't run a PNG codec, so the oracle replays the pixel formula
    * in closed form — lossless gray PNG means the decoded samples ARE the
    * formula values, and `all_decoded` pins that every payload parsed. */
  val mediaPipelineSql: String =
    """WITH m AS (
      |  SELECT source, n_chars,
      |    CAST(4 + n_chars % 12 AS INT) AS w,
      |    CAST(4 + (n_chars * 3) % 12 AS INT) AS h,
      |    list_sum(list_transform(generate_series(1, 32), i ->
      |      strpos('0123456789abcdef', substr(md5(text), i, 1)) - 1)) AS d1,
      |    len(list_filter(generate_series(0, n_chars % 10), f -> f % 3 = 0)) AS n_sampled
      |  FROM documents),
      |px AS (
      |  SELECT *,
      |    list_sum(flatten(list_transform(generate_series(0, h - 1), y ->
      |      list_transform(generate_series(0, w - 1), x -> (d1 + 7 * x + 13 * y) % 256)))) AS px_sum,
      |    CASE WHEN w >= h THEN least(w, 224)
      |      ELSE CAST(w * 224 // greatest(h, 1) AS INT) END AS fit_w,
      |    CASE WHEN h >= w THEN least(h, 224)
      |      ELSE CAST(h * 224 // greatest(w, 1) AS INT) END AS fit_h
      |  FROM m)
      |SELECT source,
      |  COUNT(*) AS n_media,
      |  CAST(SUM(px_sum) AS BIGINT) AS sum_px,
      |  CAST(MAX(w) AS INT) AS max_width,
      |  CAST(MAX(h) AS INT) AS max_height,
      |  CAST(SUM(fit_w) AS BIGINT) AS sum_fit_w,
      |  CAST(SUM(fit_h) AS BIGINT) AS sum_fit_h,
      |  CAST(SUM(n_sampled) AS BIGINT) AS sum_sampled_frames,
      |  TRUE AS all_decoded
      |FROM px GROUP BY source ORDER BY source""".stripMargin

  // ---------------------------------------------------------------------
  // M2b thumbnail generation: decode each PNG and nearest-neighbor
  // resample it to a fixed 4×4 thumbnail — the actual pixel-resample op
  // an image-training pipeline runs per image (mediaPipeline only
  // computes the FIT DIMENSIONS; this moves the pixels). The resample is
  // pure integer arithmetic on the decoded raster — thumb(x,y) =
  // px(x*w div 4, y*h div 4) — so DuckDB replays it in closed form, and
  // the POSITION-WEIGHTED checksum Σ thumb(x,y)·(1 + 4y + x) pins each
  // pixel to its cell (a bare sum would pass with scrambled layouts).
  // 100 TB: decode + resample are one map-side mapPartitions stage;
  // thumbnails leave the stage as 16 small ints (never the binary), so
  // nothing heavier than the features ever shuffles — the same
  // binary-stays-map-side law the fleet-wide audit enforces.
  private val thumbSide = 4

  def imgThumbnail(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media = Tables.documents(spark, dir)
      .select($"source", $"n_chars",
        md5($"text").as("md5hex"),
        (lit(4) + $"n_chars" % 12).cast("int").as("w"),
        (lit(4) + ($"n_chars" * 3) % 12).cast("int").as("h"))
    decodeThumbnails(encodeImages(media))
      .groupBy($"source")
      .agg(
        count(lit(1)).as("n_imgs"),
        sum($"thumb_sum").as("sum_thumb"),
        sum($"thumb_chk").as("sum_chk"),
        expr("bool_and(decode_ok)").as("all_decoded"))
      .orderBy($"source")
  }

  /** Decode + nearest-neighbor resample behind one `mapPartitions` batch
    * boundary (the codec stage of [[imgThumbnail]]). Emits `thumb_sum`
    * (Σ thumbnail samples) and `thumb_chk` (position-weighted checksum);
    * unreadable payloads take the decode_ok=false side-channel. */
  def decodeThumbnails(media: DataFrame): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types.{BooleanType, LongType}
    val side = thumbSide
    val outSchema = media.schema
      .add("decode_ok", BooleanType)
      .add("thumb_sum", LongType)
      .add("thumb_chk", LongType)
    val idx = media.schema.fieldIndex("media")
    media.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](idx)
        val img =
          if (bytes == null) null
          else
            try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
            catch { case _: Exception => null }
        if (img == null) Row.fromSeq(r.toSeq :+ false :+ null :+ null)
        else {
          val raster = img.getRaster
          val (w, h) = (img.getWidth, img.getHeight)
          var s = 0L
          var chk = 0L
          var y = 0
          while (y < side) {
            var x = 0
            while (x < side) {
              val px = raster.getSample(x * w / side, y * h / side, 0).toLong
              s += px
              chk += px * (1L + side.toLong * y + x)
              x += 1
            }
            y += 1
          }
          Row.fromSeq(r.toSeq :+ true :+ s :+ chk)
        }
      }
    }(Encoders.row(outSchema))
  }

  val imgThumbnailSql: String =
    """WITH m AS (
      |  SELECT source,
      |    CAST(4 + n_chars % 12 AS INT) AS w,
      |    CAST(4 + (n_chars * 3) % 12 AS INT) AS h,
      |    list_sum(list_transform(generate_series(1, 32), i ->
      |      strpos('0123456789abcdef', substr(md5(text), i, 1)) - 1)) AS d1
      |  FROM documents),
      |th AS (
      |  SELECT source,
      |    list_sum(flatten(list_transform(generate_series(0, 3), y ->
      |      list_transform(generate_series(0, 3), x ->
      |        (d1 + 7 * (x * w // 4) + 13 * (y * h // 4)) % 256)))) AS thumb_sum,
      |    list_sum(flatten(list_transform(generate_series(0, 3), y ->
      |      list_transform(generate_series(0, 3), x ->
      |        ((d1 + 7 * (x * w // 4) + 13 * (y * h // 4)) % 256) * (1 + 4 * y + x))))) AS thumb_chk
      |  FROM m)
      |SELECT source,
      |  COUNT(*) AS n_imgs,
      |  CAST(SUM(thumb_sum) AS BIGINT) AS sum_thumb,
      |  CAST(SUM(thumb_chk) AS BIGINT) AS sum_chk,
      |  TRUE AS all_decoded
      |FROM th GROUP BY source ORDER BY source""".stripMargin

  // ---------------------------------------------------------------------
  // M3 video frame sampling over a binary container column: each doc
  // carries a "video" — n_frames raw grayscale frames (w×h bytes each)
  // concatenated into ONE binary value, with a typed {n_frames, w, h}
  // metadata struct (the production shape: opaque bytes + queryable
  // metadata riding the row). The pipeline stride-samples every 2nd frame
  // WITHOUT decoding the rest: sampled offsets come from `sequence`, the
  // frame is sliced out of the container with binary `substring` (so
  // unsampled bytes are never touched past the slice arithmetic), and
  // only the sampled slices hit the raw-frame reader. Pixels follow
  // (d1 + 5f + 7x + 13y) mod 256 (d1 = md5 digit sum), so DuckDB replays
  // every decoded statistic in closed form.
  // 100 TB: sampling drops (stride−1)/stride of decode work before any
  // codec runs; containers never shuffle — the explode emits frame-sized
  // slices inside the map stage and only small ints cross the exchange
  // after feature extraction. With real codecs the same plan holds: the
  // container's frame INDEX (byte ranges in metadata) replaces the
  // fixed-size arithmetic.
  def frameSample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val meta = Tables.documents(spark, dir)
      .select($"doc_id", $"source", md5($"text").as("md5hex"),
        (lit(3) + $"n_chars" % 6).cast("int").as("n_frames"),
        (lit(4) + $"n_chars" % 5).cast("int").as("w"),
        (lit(4) + ($"n_chars" * 3) % 5).cast("int").as("h"))
      .withColumn("vmeta", struct($"n_frames", $"w", $"h"))
    val sampled = encodeVideos(meta)
      .select($"doc_id", $"source", $"vmeta", $"video",
        posexplode(sequence(lit(0), $"vmeta.n_frames" - 1, lit(2))))
      .withColumnRenamed("col", "fidx")
      .select($"doc_id", $"source", $"vmeta", $"fidx",
        expr("substring(video, fidx * vmeta.w * vmeta.h + 1, vmeta.w * vmeta.h)").as("frame"))
    decodeRawFrames(sampled)
      .groupBy($"source")
      .agg(
        countDistinct($"doc_id").as("n_videos"),
        count(lit(1)).as("n_sampled_frames"),
        // frame 0 is sampled from every container (stride anchor), so
        // conditioning on it counts each container's n_frames exactly once
        sum(when($"fidx" === 0, $"vmeta.n_frames").otherwise(0L)).as("sum_container_frames"),
        sum($"f_px_sum").as("sum_px"),
        expr("bool_and(f_len_ok)").as("all_frames_complete"))
      .orderBy($"source")
  }

  /** Container encoder behind a `mapPartitions` batch boundary: packs
    * n_frames w×h raw grayscale frames into one binary `video` column.
    * Stands in for data arrival, like [[encodeImages]]. Expects columns
    * `md5hex`, `n_frames`, `w`, `h`. */
  def encodeVideos(meta: DataFrame): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types.BinaryType
    val outSchema = meta.schema.add("video", BinaryType)
    val hexIdx = meta.schema.fieldIndex("md5hex")
    val nfIdx = meta.schema.fieldIndex("n_frames")
    val wIdx = meta.schema.fieldIndex("w")
    val hIdx = meta.schema.fieldIndex("h")
    meta.mapPartitions { rows =>
      rows.map { r =>
        val hex = r.getString(hexIdx)
        if (hex == null) Row.fromSeq(r.toSeq :+ null)
        else {
          var d1 = 0
          var i = 0
          while (i < hex.length) { d1 += Character.digit(hex.charAt(i), 16); i += 1 }
          val nf = r.getInt(nfIdx); val w = r.getInt(wIdx); val h = r.getInt(hIdx)
          val bytes = new Array[Byte](nf * w * h)
          var f = 0
          var o = 0
          while (f < nf) {
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                bytes(o) = ((d1 + 5 * f + 7 * x + 13 * y) % 256).toByte
                o += 1; x += 1
              }
              y += 1
            }
            f += 1
          }
          Row.fromSeq(r.toSeq :+ bytes)
        }
      }
    }(Encoders.row(outSchema))
  }

  /** Raw-frame reader behind a `mapPartitions` batch boundary: widens each
    * row with the frame's unsigned-byte pixel sum and a length check
    * (truncated slice → f_len_ok=false, the decode error side-channel).
    * Expects columns `frame` (binary) and `vmeta{w, h}`. */
  def decodeRawFrames(frames: DataFrame): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types.{BooleanType, LongType}
    val outSchema = frames.schema
      .add("f_len_ok", BooleanType)
      .add("f_px_sum", LongType)
    val frameIdx = frames.schema.fieldIndex("frame")
    val metaIdx = frames.schema.fieldIndex("vmeta")
    frames.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](frameIdx)
        val m = r.getStruct(metaIdx)
        val expected = m.getInt(m.fieldIndex("w")) * m.getInt(m.fieldIndex("h"))
        if (bytes == null || bytes.length != expected)
          Row.fromSeq(r.toSeq :+ false :+ null)
        else {
          var s = 0L
          var i = 0
          while (i < bytes.length) { s += bytes(i) & 0xff; i += 1 }
          Row.fromSeq(r.toSeq :+ true :+ s)
        }
      }
    }(Encoders.row(outSchema))
  }

  /** Closed-form replay of the sampled-frame pixel sums (raw frames are
    * byte-exact, so the decoded sums ARE the formula values). */
  val frameSampleSql: String =
    """WITH m AS (
      |  SELECT doc_id, source,
      |    CAST(3 + n_chars % 6 AS INT) AS n_frames,
      |    CAST(4 + n_chars % 5 AS INT) AS w,
      |    CAST(4 + (n_chars * 3) % 5 AS INT) AS h,
      |    list_sum(list_transform(generate_series(1, 32), i ->
      |      strpos('0123456789abcdef', substr(md5(text), i, 1)) - 1)) AS d1
      |  FROM documents),
      |sampled AS (
      |  SELECT m.*, unnest(generate_series(0, n_frames - 1, 2)) AS fidx FROM m),
      |px AS (
      |  SELECT *,
      |    list_sum(flatten(list_transform(generate_series(0, h - 1), y ->
      |      list_transform(generate_series(0, w - 1), x ->
      |        (d1 + 5 * fidx + 7 * x + 13 * y) % 256)))) AS f_px_sum
      |  FROM sampled)
      |SELECT source,
      |  COUNT(DISTINCT doc_id) AS n_videos,
      |  COUNT(*) AS n_sampled_frames,
      |  CAST(SUM(CASE WHEN fidx = 0 THEN n_frames ELSE 0 END) AS BIGINT) AS sum_container_frames,
      |  CAST(SUM(f_px_sum) AS BIGINT) AS sum_px,
      |  TRUE AS all_frames_complete
      |FROM px GROUP BY source ORDER BY source""".stripMargin

  // ---------------------------------------------------------------------
  // M4 audio features over a binary PCM column: each doc carries a mono
  // s16le clip (the WAV/FLAC payload shape after container stripping) with
  // typed {n_samples, sample_rate} metadata. Samples follow the
  // deterministic waveform s(t) = ((d1·31 + 7t² + 11t) mod 65536) − 32768
  // (d1 = md5 digit sum), so DuckDB replays every decoded statistic in
  // closed form while the Spark side computes them from the BYTES — the
  // decode (little-endian int16 parsing) is real, not stubbed. Extracted
  // features are the standard audio-curation screens, all integer-exact:
  // total energy (Σs², int64), zero crossings (sign flips — a pitch
  // proxy), peak amplitude, clip count (|s| ≥ 32000 — recording-quality
  // screen), and the loudest 16-sample window's energy (the windowed
  // feature a spectrogram pipeline would compute per hop).
  // 100 TB: both codec stages are map-side behind mapPartitions
  // boundaries; PCM payloads never shuffle — only small ints cross the
  // exchange after feature extraction, so executor memory bounds clip
  // length × rows-per-batch, not corpus size.
  def audioFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val meta = Tables.documents(spark, dir)
      .select($"doc_id", $"source", md5($"text").as("md5hex"),
        (lit(64) + $"n_chars" % 64).cast("int").as("n_samples"))
      .withColumn("ameta", struct($"n_samples", lit(16000).as("sample_rate")))
    decodePcm(encodePcm(meta))
      .groupBy($"source")
      .agg(
        count(lit(1)).as("n_audio"),
        sum($"a_sum_sq").as("sum_energy"),
        sum($"a_zero_cross").as("sum_zero_cross"),
        max($"a_peak").as("max_peak"),
        sum($"a_clipped").as("sum_clipped"),
        sum($"a_max_win_energy").as("sum_max_win_energy"),
        expr("bool_and(a_decode_ok)").as("all_decoded"))
      .orderBy($"source")
  }

  /** PCM encoder behind a `mapPartitions` batch boundary: writes each
    * row's waveform as little-endian signed 16-bit samples (binary column
    * `pcm`). Stands in for data arrival, like [[encodeImages]]. Expects
    * columns `md5hex` and `n_samples`. */
  def encodePcm(meta: DataFrame): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types.BinaryType
    val outSchema = meta.schema.add("pcm", BinaryType)
    val hexIdx = meta.schema.fieldIndex("md5hex")
    val nIdx = meta.schema.fieldIndex("n_samples")
    meta.mapPartitions { rows =>
      rows.map { r =>
        val hex = r.getString(hexIdx)
        if (hex == null) Row.fromSeq(r.toSeq :+ null)
        else {
          var d1 = 0
          var i = 0
          while (i < hex.length) { d1 += Character.digit(hex.charAt(i), 16); i += 1 }
          val n = r.getInt(nIdx)
          val buf = java.nio.ByteBuffer.allocate(n * 2)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          var t = 0
          while (t < n) {
            buf.putShort((((d1 * 31 + 7 * t * t + 11 * t) % 65536) - 32768).toShort)
            t += 1
          }
          Row.fromSeq(r.toSeq :+ buf.array())
        }
      }
    }(Encoders.row(outSchema))
  }

  /** REAL PCM decoder behind a `mapPartitions` batch boundary: parses the
    * payload as little-endian int16 and widens the row with the feature
    * battery. Payloads that are null, odd-length, or shorter than the
    * metadata's sample count take the error side-channel
    * (`a_decode_ok = false`, null features) — the [[decodeImages]]
    * quarantine contract. Expects columns `pcm` (binary) and `ameta`. */
  def decodePcm(media: DataFrame): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types.{BooleanType, IntegerType, LongType}
    val outSchema = media.schema
      .add("a_decode_ok", BooleanType)
      .add("a_sum_sq", LongType)
      .add("a_zero_cross", IntegerType)
      .add("a_peak", IntegerType)
      .add("a_clipped", IntegerType)
      .add("a_max_win_energy", LongType)
    val pcmIdx = media.schema.fieldIndex("pcm")
    val metaIdx = media.schema.fieldIndex("ameta")
    media.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](pcmIdx)
        val m = r.getStruct(metaIdx)
        val n = m.getInt(m.fieldIndex("n_samples"))
        if (bytes == null || bytes.length % 2 != 0 || bytes.length / 2 != n)
          Row.fromSeq(r.toSeq :+ false :+ null :+ null :+ null :+ null :+ null)
        else {
          val buf = java.nio.ByteBuffer.wrap(bytes)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          var sumSq = 0L
          var zc = 0
          var peak = 0
          var clipped = 0
          var maxWin = 0L
          var win = 0L
          var prevNeg = false
          var t = 0
          while (t < n) {
            val s = buf.getShort(t * 2).toInt
            sumSq += s.toLong * s
            win += s.toLong * s
            if (t % 16 == 15 || t == n - 1) { if (win > maxWin) maxWin = win; win = 0L }
            val neg = s < 0
            if (t > 0 && neg != prevNeg) zc += 1
            prevNeg = neg
            val a = if (s < 0) -s else s
            if (a > peak) peak = a
            if (a >= 32000) clipped += 1
            t += 1
          }
          Row.fromSeq(r.toSeq :+ true :+ sumSq :+ zc :+ peak :+ clipped :+ maxWin)
        }
      }
    }(Encoders.row(outSchema))
  }

  /** Closed-form replay of the PCM feature battery (s16le is byte-exact,
    * so the decoded samples ARE the waveform values; all features are
    * integer arithmetic — no float anywhere). */
  val audioFeaturesSql: String =
    """WITH m AS (
      |  SELECT doc_id, source,
      |    CAST(64 + n_chars % 64 AS INT) AS n_samples,
      |    list_sum(list_transform(generate_series(1, 32), i ->
      |      strpos('0123456789abcdef', substr(md5(text), i, 1)) - 1)) AS d1
      |  FROM documents),
      |s AS (
      |  SELECT doc_id, source, n_samples, d1, unnest(generate_series(0, n_samples - 1)) AS t
      |  FROM m),
      |sv AS (
      |  SELECT *, (d1 * 31 + 7 * t * t + 11 * t) % 65536 - 32768 AS v FROM s),
      |feat AS (
      |  SELECT doc_id, source,
      |    SUM(CAST(v AS BIGINT) * v) AS a_sum_sq,
      |    SUM(CASE WHEN t > 0 AND (v < 0) <> (prev_v < 0) THEN 1 ELSE 0 END) AS a_zero_cross,
      |    MAX(abs(v)) AS a_peak,
      |    SUM(CASE WHEN abs(v) >= 32000 THEN 1 ELSE 0 END) AS a_clipped
      |  FROM (SELECT *, lag(v) OVER (PARTITION BY doc_id ORDER BY t) AS prev_v FROM sv) x
      |  GROUP BY doc_id, source),
      |win AS (
      |  SELECT doc_id, MAX(win_sq) AS a_max_win_energy
      |  FROM (SELECT doc_id, t // 16 AS w, SUM(CAST(v AS BIGINT) * v) AS win_sq
      |        FROM sv GROUP BY doc_id, t // 16) wx
      |  GROUP BY doc_id)
      |SELECT f.source,
      |  COUNT(*) AS n_audio,
      |  CAST(SUM(a_sum_sq) AS BIGINT) AS sum_energy,
      |  CAST(SUM(a_zero_cross) AS BIGINT) AS sum_zero_cross,
      |  CAST(MAX(a_peak) AS INT) AS max_peak,
      |  CAST(SUM(a_clipped) AS BIGINT) AS sum_clipped,
      |  CAST(SUM(a_max_win_energy) AS BIGINT) AS sum_max_win_energy,
      |  TRUE AS all_decoded
      |FROM feat f JOIN win ON win.doc_id = f.doc_id
      |GROUP BY f.source ORDER BY f.source""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_struct_join"   -> (structJoin _),
    "mm_media_pipeline" -> (mediaPipeline _),
    "mm_img_thumbnail" -> (imgThumbnail _),
    "mm_frame_sample"  -> (frameSample _),
    "mm_audio_features" -> (audioFeatures _))

  val oracles: Map[String, String] = Map(
    "mm_struct_join"   -> structJoinSql,
    "mm_media_pipeline" -> mediaPipelineSql,
    "mm_img_thumbnail" -> imgThumbnailSql,
    "mm_frame_sample"  -> frameSampleSql,
    "mm_audio_features" -> audioFeaturesSql)
}
