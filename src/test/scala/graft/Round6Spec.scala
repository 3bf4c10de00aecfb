package graft

import org.apache.spark.sql.functions._

import graft.llm.Curation
import graft.ops.{EventWindows, Relational}
import graft.sources.Formats

/** Round-6 operators: chunking, corpus mixing, deterministic shuffle,
  * extended aggregates, gap-fill, schema-evolution scan.
  */
class Round6Spec extends SparkSpec {

  test("chunk: per-doc chunk count is ceil(n_tok/stride) and sizes are clamped") {
    import spark.implicits._
    val chunks = Curation.chunk(spark, sfDir).cache()
    val docs = Tables.documents(spark, sfDir)
      .select($"doc_id", size(split($"text", " ")).as("n_tok"))
    val per = chunks.groupBy($"doc_id")
      .agg(count(lit(1)).as("n_chunks"), max($"chunk_idx").as("max_idx"),
        max($"n_chunk_tok").as("max_sz"), min($"n_chunk_tok").as("min_sz"))
      .join(docs, "doc_id")
    // starts are 0,40,... < n_tok  →  count = ceil(n_tok/40), idx dense
    assert(per.filter($"n_chunks" =!= ceil($"n_tok" / 40.0).cast("long")).isEmpty)
    assert(per.filter($"max_idx" =!= $"n_chunks" - 1).isEmpty)
    assert(per.filter($"max_sz" > 50 || $"min_sz" < 1).isEmpty)
    // exact size law: each chunk holds min(50, n_tok - 40*idx) tokens
    val sized = chunks.join(docs, "doc_id")
      .filter($"n_chunk_tok" =!= least(lit(50L), $"n_tok" - lit(40L) * $"chunk_idx"))
    assert(sized.isEmpty)
  }

  test("mix: copies respect the per-source weight envelope") {
    import spark.implicits._
    val m = Curation.mix(spark, sfDir)
      .withColumn("w_pct", lit(50) + (substring($"source", 4, 10).cast("int") % 4) * 60)
    // floor(w)×n ≤ n_out ≤ floor(w)×n + n, and the fractional part can
    // only ever add at most one copy per doc
    val bad = m.filter(
      $"n_docs_out" < $"n_docs_in" * expr("w_pct DIV 100") ||
      $"n_docs_out" > $"n_docs_in" * expr("w_pct DIV 100") + $"n_docs_in")
    assert(bad.isEmpty)
    // a pure-downsample source (w=50) never grows
    assert(m.filter($"w_pct" === 50 && $"n_docs_out" > $"n_docs_in").isEmpty)
  }

  test("shuffle: output is a permutation with dense per-shard positions") {
    import spark.implicits._
    val s = Curation.shuffleShards(spark, sfDir).cache()
    val total = Tables.documents(spark, sfDir).count()
    assert(s.count() === total)
    assert(s.select($"doc_id").distinct().count() === total)
    val dense = s.groupBy($"shard")
      .agg(count(lit(1)).as("n"), min($"pos").as("lo"), max($"pos").as("hi"))
      .filter($"lo" =!= 1L || $"hi" =!= $"n")
    assert(dense.isEmpty)
    // seeded md5 order: rerun is byte-identical (determinism contract)
    assert(s.except(Curation.shuffleShards(spark, sfDir)).isEmpty)
  }

  test("a9 battery: count_if/median/max_by agree with first-principles forms") {
    import spark.implicits._
    val a = Relational.a9AggBattery(spark, sfDir).cache()
    val li = Tables.lineitem(spark, sfDir).withColumn("q", $"l_quantity".cast("long"))
    val manual = li.groupBy($"l_returnflag")
      .agg(sum(when($"q" > 25, 1L).otherwise(0L)).as("n_big_manual"),
        min($"q").as("lo"), max($"q").as("hi"))
    val j = a.join(manual, "l_returnflag").cache()
    assert(j.filter($"n_big" =!= $"n_big_manual").isEmpty)
    assert(j.filter($"med_qty" < $"lo" || $"med_qty" > $"hi").isEmpty)
    assert(a.filter(!$"all_le50").isEmpty) // TPC-H quantity ≤ 50 by construction
    // max_by rank: ties on the md5 key imply identical l_suppkey, so the
    // window-ranked pick is unambiguous regardless of tie order
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"l_returnflag")
      .orderBy(expr("md5(concat_ws('|', l_orderkey, l_linenumber, l_partkey, l_suppkey))").desc)
    val top = li.withColumn("rn", row_number().over(w)).filter($"rn" === 1)
      .select($"l_returnflag", $"l_suppkey".as("expect_supp"))
    assert(a.join(top, "l_returnflag").filter($"last_supp" =!= $"expect_supp").isEmpty)
  }

  test("gapfill: ffill copies raw when present and only leads are null") {
    import spark.implicits._
    val g = EventWindows.gapfill(spark, sfDir).cache()
    assert(g.filter($"value_raw".isNotNull && $"ffill" =!= $"value_raw").isEmpty)
    // a null ffill means NO earlier non-null for that user: check via the
    // independent running count of non-nulls
    val ev = Tables.events(spark, sfDir)
      .withColumn("v", when($"event_type" === "view", lit(null).cast("double")).otherwise($"value"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"ts")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val seen = ev.select($"event_id", count($"v").over(w).as("n_seen"))
    val j = g.join(seen, "event_id")
    assert(j.filter($"ffill".isNull && $"n_seen" > 0).isEmpty)
    assert(j.filter($"ffill".isNotNull && $"n_seen" === 0).isEmpty)
    // filled is null only when the user has no non-null at all
    val allNull = ev.groupBy($"user_id").agg(count($"v").as("nn")).filter($"nn" === 0)
    assert(g.filter($"filled".isNull).join(allNull, Seq("user_id"), "left_anti").isEmpty)
  }

  test("int8 quantization: codes stay in range and fidelity stays high") {
    import spark.implicits._
    val q = graft.llm.Embeddings.quantize(spark, sfDir).cache()
    assert(q.filter($"max_q" > 127).isEmpty, "int8 range violated")
    // SQ8 on unit-ish random vectors keeps cosine(original, dequantized)
    // essentially 1 — anything below .999 means the scale math broke
    assert(q.filter($"avg_cos_fidelity" < 0.999).isEmpty)
    assert(q.filter($"avg_l2_err" < 0).isEmpty)
  }

  test("compaction: 64 small files become 4, content preserved") {
    import spark.implicits._
    val agg = Formats.compaction(spark, sfDir)
    def parts(p: String): Int =
      new java.io.File(p).listFiles().count(f => f.getName.startsWith("part-"))
    assert(parts(s"${Formats.compactRoot}/small") === 64)
    assert(parts(s"${Formats.compactRoot}/compacted") === 4)
    val expect = Tables.events(spark, sfDir)
      .groupBy($"event_type").agg(count(lit(1)).as("n_events"))
    assert(agg.select($"event_type", $"n_events").except(expect).isEmpty)
  }

  test("entropy: bounded by ln(4); uniq ratio in (0,1]") {
    import spark.implicits._
    val e = graft.llm.TextAnalysis.entropy(spark, sfDir).cache()
    assert(e.filter($"avg_entropy" < 0 || $"avg_entropy" > math.log(4.0)).isEmpty)
    assert(e.filter($"min_entropy" > $"avg_entropy").isEmpty)
    assert(e.filter($"avg_uniq_ratio" <= 0 || $"avg_uniq_ratio" > 1).isEmpty)
  }

  test("bitwise battery: masks nest and the 16-bit bitmap stays 16-bit") {
    import spark.implicits._
    val b = graft.ops.FunctionBatteries.fBitwiseFuncs(spark, sfDir).cache()
    // and-mask bits ⊆ or-mask bits; bitmap only uses low 16 bits
    assert(b.filter(($"mask_and".bitwiseAND($"mask_or")) =!= $"mask_and").isEmpty)
    assert(b.filter($"bitmap16" < 0 || $"bitmap16" >= (1L << 16)).isEmpty)
  }

  test("merge scan: batch-1 rows read the evolved column as NULL") {
    import spark.implicits._
    val m = Formats.mergeScan(spark, sfDir).cache()
    val b1 = m.filter($"batch" === 1).head()
    val b2 = m.filter($"batch" === 2).head()
    assert(b1.getAs[Long]("n_with_discount") === 0L)
    assert(b1.isNullAt(b1.fieldIndex("sum_disc")))
    assert(b2.getAs[Long]("n_with_discount") === b2.getAs[Long]("n_rows"))
  }

  test("recursive CTE: every part lands exactly once at depth floor(log2 id)") {
    import spark.implicits._
    val r = ops.SqlSurface.sqlRecursiveCte(spark, sfDir).cache()
    // the walk's anchor scopes to ids >= 1 (id 0 sits outside the tree)
    val nParts = Tables.part(spark, sfDir).filter($"p_partkey" >= 1).count()
    assert(r.agg(sum($"n_nodes")).head().getLong(0) === nParts)
    // depth d holds ids in [2^d, 2^(d+1)) — check the bracket on every row
    val bad = r.filter(
      $"min_node" < pow(lit(2.0), $"depth").cast("long") ||
      $"max_node" >= pow(lit(2.0), $"depth" + 1).cast("long"))
    assert(bad.isEmpty)
  }

  test("lateral top-2 matches the window-rank formulation") {
    import spark.implicits._
    val lat = ops.SqlSurface.sqlLateral(spark, sfDir)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey".asc)
    val viaRank = Tables.orders(spark, sfDir)
      .join(Tables.customer(spark, sfDir).filter($"c_mktsegment" === "BUILDING"),
        $"o_custkey" === $"c_custkey")
      .withColumn("rn", row_number().over(w)).filter($"rn" <= 2)
      .select($"c_custkey", $"o_orderkey", $"o_totalprice")
    assert(lat.except(viaRank).isEmpty && viaRank.except(lat).isEmpty)
  }

  test("tpch q18: every surviving order clears the quantity threshold") {
    import spark.implicits._
    val r = ops.SqlSurface.sqlTpchQ18(spark, sfDir).cache()
    assert(r.count() <= 100)
    assert(r.filter($"total_qty" <= 180.0).isEmpty)
    // top-100 by totalprice: the output's min must dominate every
    // qualifying order left out (spot-check via recompute)
    val all = Tables.lineitem(spark, sfDir).groupBy($"l_orderkey")
      .agg(sum($"l_quantity").as("q")).filter($"q" > 180.0)
    assert(r.count() === math.min(100L, all.count()))
  }

  test("variant battery: typed variant_get round-trips the source columns") {
    import spark.implicits._
    val v = graft.ops.FunctionBatteries.fVariantFuncs(spark, sfDir).cache()
    val direct = Tables.documents(spark, sfDir).groupBy($"lang".as("vlang"))
      .agg(count(lit(1)).as("n"), sum($"doc_id").as("sum_id"),
        sum($"n_chars").as("sum_n"), lit(0L).as("n_missing"))
    assert(v.except(direct).isEmpty && direct.except(v).isEmpty)
  }

  test("xml round trip: aggregate equals the direct parquet aggregate") {
    import spark.implicits._
    val x = Formats.xmlRoundtrip(spark, sfDir)
    val direct = Tables.lineitem(spark, sfDir).groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum($"l_quantity".cast(org.apache.spark.sql.types.DecimalType(12, 2)))
          .cast("double").as("sum_qty"),
        min($"l_shipdate".cast("date")).as("min_ship"),
        max($"l_orderkey").as("max_key"))
    assert(x.except(direct).isEmpty && direct.except(x).isEmpty)
  }
}
