package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal-column operators: typed struct composition of text +
  * embedding + metadata, and an opaque-binary media pipeline (decode /
  * feature-extract / frame-sample) with the Spark-side plumbing real and
  * the codec STUBBED deterministically (no image/audio libs in this
  * container — see `decodeStub`).
  *
  * Determinism contract with the DuckDB oracle: binary payloads derive
  * from md5 (identical bytes both engines), every feature is exact integer
  * arithmetic, and double emissions are round(_, 6) of values whose
  * operands are identical across engines (see Embeddings scaladoc).
  */
object Multimodal {

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
  // M2 media pipeline over opaque binary columns. The media payload is a
  // deterministic stand-in (md5 bytes of the text — identical in both
  // engines); everything downstream is the REAL plumbing a media pipeline
  // needs: a binary column flowing through the plan, a typed metadata
  // struct, per-item feature extraction, and frame sampling via sequence +
  // filter. 100 TB: all map-side; binaries never shuffle (features are
  // extracted before the aggregate, so only small ints cross the exchange).
  def mediaPipeline(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media = Tables.documents(spark, dir)
      .withColumn("media", unhex(md5($"text")))                 // opaque binary payload
      .withColumn("mmeta", struct(                              // typed media metadata
        ($"n_chars" % 640).as("width"),
        (($"n_chars" * 3) % 480).as("height"),
        lit("bin16").as("format")))
    val features = decodeStub(media)
    features
      // resize: aspect-preserving fit into 224x224 — pure integer
      // arithmetic on the metadata (the pixel work would live in the
      // decodeStub boundary); guards the degenerate 0-dimension case
      .withColumn("fit_w", expr(
        "CASE WHEN mmeta.width >= mmeta.height " +
          "THEN least(mmeta.width, 224) " +
          "ELSE CAST(mmeta.width * 224 / greatest(mmeta.height, 1) AS INT) END"))
      .withColumn("fit_h", expr(
        "CASE WHEN mmeta.height >= mmeta.width " +
          "THEN least(mmeta.height, 224) " +
          "ELSE CAST(mmeta.height * 224 / greatest(mmeta.width, 1) AS INT) END"))
      .withColumn("frames", sequence(lit(0), $"n_chars" % 10))  // fake frame index list
      .withColumn("n_sampled", size(filter($"frames", f => f % 3 === 0)))
      .groupBy($"source")
      .agg(
        count(lit(1)).as("n_media"),
        sum($"n_bytes").as("sum_bytes"),
        sum($"checksum").as("sum_checksum"),
        max($"mmeta.width").as("max_width"),
        sum($"fit_w").as("sum_fit_w"),
        sum($"fit_h").as("sum_fit_h"),
        sum($"n_sampled").as("sum_sampled_frames"))
      .orderBy($"source")
  }

  /** STUB decoder behind a REAL `mapPartitions` batch boundary — the Scala
    * analog of `mapInPandas`: rows stream through executor-sized partitions,
    * the decoder sees the raw binary payload per item, and emits the input
    * row widened with decoded features. A real codec (image/audio lib —
    * absent in this container) would replace ONLY the per-item byte loop;
    * the signature, schema handling, and batch shape are what a production
    * decode stage uses. Deliberately a codegen/pruning boundary — decode is
    * opaque to Catalyst by nature, which is why it runs before any shuffle
    * (binaries never cross an exchange).
    *
    * Fake features: payload length + nibble sum of the payload bytes (=
    * the hex-digit sum of md5(text), so the DuckDB oracle replicates it
    * exactly without seeing binaries).
    */
  private def decodeStub(media: DataFrame): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types.{IntegerType, LongType}
    val outSchema = media.schema.add("n_bytes", IntegerType).add("checksum", LongType)
    val idx = media.schema.fieldIndex("media")
    media.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](idx)
        if (bytes == null) {
          // null payload → null features, matching the SQL-expression
          // semantics (and the oracle), not a task-killing NPE
          Row.fromSeq(r.toSeq :+ null :+ null)
        } else {
          var cs = 0L
          var i = 0
          while (i < bytes.length) {
            val b = bytes(i) & 0xff
            cs += (b >> 4) + (b & 0xf)
            i += 1
          }
          Row.fromSeq(r.toSeq :+ bytes.length :+ cs)
        }
      }
    }(Encoders.row(outSchema))
  }

  val mediaPipelineSql: String =
    """WITH media AS (
      |  SELECT source, n_chars,
      |    unhex(md5(text)) AS media,
      |    {'width': n_chars % 640, 'height': (n_chars * 3) % 480, 'format': 'bin16'} AS mmeta,
      |    octet_length(unhex(md5(text))) AS n_bytes,
      |    list_sum(list_transform(generate_series(1, 32), i ->
      |      strpos('0123456789abcdef', substr(md5(text), i, 1)) - 1)) AS checksum,
      |    len(list_filter(generate_series(0, n_chars % 10), f -> f % 3 = 0)) AS n_sampled
      |  FROM documents),
      |fit AS (
      |  SELECT *,
      |    CASE WHEN mmeta.width >= mmeta.height
      |      THEN least(mmeta.width, 224)
      |      ELSE CAST(mmeta.width * 224 // greatest(mmeta.height, 1) AS INT) END AS fit_w,
      |    CASE WHEN mmeta.height >= mmeta.width
      |      THEN least(mmeta.height, 224)
      |      ELSE CAST(mmeta.height * 224 // greatest(mmeta.width, 1) AS INT) END AS fit_h
      |  FROM media)
      |SELECT source,
      |  COUNT(*) AS n_media,
      |  CAST(SUM(n_bytes) AS BIGINT) AS sum_bytes,
      |  CAST(SUM(checksum) AS BIGINT) AS sum_checksum,
      |  CAST(MAX(mmeta.width) AS BIGINT) AS max_width,
      |  CAST(SUM(fit_w) AS BIGINT) AS sum_fit_w,
      |  CAST(SUM(fit_h) AS BIGINT) AS sum_fit_h,
      |  CAST(SUM(n_sampled) AS BIGINT) AS sum_sampled_frames
      |FROM fit GROUP BY source ORDER BY source""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_struct_join"   -> (structJoin _),
    "mm_media_pipeline" -> (mediaPipeline _))

  val oracles: Map[String, String] = Map(
    "mm_struct_join"   -> structJoinSql,
    "mm_media_pipeline" -> mediaPipelineSql)
}
