package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.EtlOps

/** Gates for the data-layout / weighted-draw operators added in round 11:
  * weighted systematic sampling (q_weighted_sample), the compaction planner
  * (q_compaction_plan), and the Z-order layout family (q_zorder_layout +
  * EtlOps.zorderLayout). The registered queries are DuckDB-oracled; these
  * specs pin the properties the hash gate cannot state — hierarchical ≡
  * naive prefix equivalence, inclusion ∝ weight, bin-capacity bounds, the
  * morton bit contract, and the physical range partitioning.
  */
class LayoutSamplingSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // ---------------- weightedSystematicSample ----------------

  /** Naive single-window restatement of the sampler (the oracle's form). */
  private def naiveWeightedSample(
      df: org.apache.spark.sql.DataFrame,
      k: Long,
      salt: String = "_wsamp"): Seq[Long] = {
    import org.apache.spark.sql.expressions.Window
    val r = conv(substring(md5(concat(col("id").cast("string"), lit(salt))), 1, 15), 16, 10)
      .cast("long")
    val w = Window.orderBy(col("__r"), col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = df.agg(sum(col("w")).as("tw")).as[Long].head()
    df.withColumn("__r", r)
      .withColumn("__ci", sum(col("w")).over(w))
      .filter(expr(s"(__ci * $k) DIV $tot > ((__ci - w) * $k) DIV $tot"))
      .select("id")
      .as[Long]
      .collect()
      .toSeq
      .sorted
  }

  private def sampleIds(
      df: org.apache.spark.sql.DataFrame,
      k: Long,
      salt: String = "_wsamp",
      blockBits: Int = 12): Seq[Long] =
    EtlOps
      .weightedSystematicSample(df, "id", "w", k, salt = salt, blockBits = blockBits)
      .select("id")
      .as[Long]
      .collect()
      .toSeq
      .sorted

  test("weightedSystematicSample: hierarchical prefix ≡ naive single window") {
    // blockBits=2 forces multi-block re-basing on 4 blocks; adversarial
    // partitioning shakes out any partition-order dependence.
    val df = (1L to 400L).map(i => (i, 1L + (i * 7) % 13)).toDF("id", "w").repartition(7)
    assert(sampleIds(df, 37, blockBits = 2) == naiveWeightedSample(df, 37))
  }

  test("weightedSystematicSample: exactly k when no weight exceeds W/k; heavy row always in") {
    val uniform = (1L to 300L).map(i => (i, 10L)).toDF("id", "w")
    assert(sampleIds(uniform, 25).size == 25)

    // One row holding >1/k of the mass crosses a threshold regardless of
    // where the md5 order lands it.
    for (salt <- Seq("_a", "_b", "_c", "_d")) {
      val skewed = ((1L to 99L).map(i => (i, 1L)) :+ (100L, 1000L)).toDF("id", "w")
      assert(sampleIds(skewed, 10, salt = salt).contains(100L), s"salt=$salt lost the heavy row")
    }
  }

  test("weightedSystematicSample: inclusion frequency ∝ weight across salts") {
    // 100 rows of weight 1 vs 100 of weight 5 → P(sel) = k·w/W with
    // W=600, k=20: p₁=1/30, p₅=1/6. Across 40 independent salts the
    // selected-count ratio concentrates near 5.
    val df = ((1L to 100L).map(i => (i, 1L)) ++ (101L to 200L).map(i => (i, 5L)))
      .toDF("id", "w")
      .cache()
    var light = 0
    var heavy = 0
    for (s <- 1 to 40) {
      val ids = sampleIds(df, 20, salt = s"_freq$s")
      light += ids.count(_ <= 100L)
      heavy += ids.count(_ > 100L)
    }
    df.unpersist()
    val ratio = heavy.toDouble / math.max(light, 1)
    assert(ratio > 3.5 && ratio < 6.5, s"weight-5 rows selected ${ratio}x weight-1 rows, expected ≈5x")
    assert(light + heavy == 40 * 20, "uniform small weights must fill all k slots every draw")
  }

  test("weightedSystematicSample: non-positive weight fails loudly") {
    val df = Seq((1L, 5L), (2L, 0L)).toDF("id", "w")
    val e = intercept[Exception] { sampleIds(df, 1) }
    assert(e.getMessage.contains("non-positive weight"), e.getMessage)
  }

  test("weightedSystematicSample: empty input yields an empty sample, not a crash") {
    val df = Seq.empty[(Long, Long)].toDF("id", "w")
    assert(sampleIds(df, 5).isEmpty)
  }

  test("weightedSystematicSample: empty input stays empty under ANSI mode (no DIVIDE_BY_ZERO)") {
    // Pre-fix, the empty case leaned on non-ANSI `x DIV 0 = null` dropping
    // every row; under spark.sql.ansi.enabled=true the same plan raised
    // DIVIDE_BY_ZERO. The explicit `__tw > 0` guard must make the behavior
    // config-independent.
    val prev = spark.conf.get("spark.sql.ansi.enabled", "false")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try {
      val df = Seq.empty[(Long, Long)].toDF("id", "w")
      assert(sampleIds(df, 5).isEmpty)
      // And a non-empty draw still selects under ANSI too.
      val some = Seq((1L, 3L), (2L, 3L), (3L, 3L)).toDF("id", "w")
      assert(sampleIds(some, 2).nonEmpty)
    } finally spark.conf.set("spark.sql.ansi.enabled", prev)
  }

  test("weightedSystematicSample: fractional weight column is rejected, not floored") {
    // A double weight of 0.7 would silently floor to 0 in the long cast
    // and the row could never be selected — refuse the type instead.
    val df = Seq((1L, 1.5), (2L, 0.7)).toDF("id", "w")
    val e = intercept[IllegalArgumentException] {
      EtlOps.weightedSystematicSample(df, "id", "w", 1)
    }
    assert(e.getMessage.contains("integral type"), e.getMessage)
  }

  // ---------------- compactionPlan ----------------

  test("compactionPlan: sequential bins — boundaries covered, overshoot < one file") {
    val files = (1L to 60L)
      .map(i => (if (i % 2 == 0) "a" else "b", i, 100L + (i * 37) % 400))
      .toDF("src", "fid", "bytes")
    val target = 700L
    val plan = EtlOps
      .compactionPlan(files, Seq("src"), "fid", "bytes", target)
      .select("src", "fid", "bytes", "bin")
      .as[(String, Long, Long, Long)]
      .collect()
      .toSeq

    for ((src, group) <- plan.groupBy(_._1)) {
      val bins = group.groupBy(_._4).toSeq.sortBy(_._1)
      // Bin ids are dense from 0 and files pack in fid order.
      assert(bins.map(_._1) == bins.indices.map(_.toLong), s"$src: bins not dense")
      val ordered = group.sortBy(_._2)
      assert(ordered.map(_._4) == ordered.map(_._4).sorted, s"$src: bin not monotone in file order")
      val maxFile = group.map(_._3).max
      var cum = 0L
      for ((bin, fs) <- bins) {
        val sz = fs.map(_._3).sum
        cum += sz
        // No bin closes early: the running total through bin b reaches the
        // (b+1)·target boundary — otherwise its last file would still have
        // started inside bin b's range. (A single bin CAN be small when the
        // previous bin's last file overshot into its range, so a per-bin
        // lower bound does not hold; the boundary-coverage form does.)
        if (bin < bins.size - 1)
          assert(cum >= (bin + 1) * target, s"$src bin $bin closed early: cum=$cum")
        assert(sz < target + maxFile, s"$src bin $bin overshoots by ≥ one file: $sz")
      }
    }
  }

  // ---------------- mortonKey / zorderLayout ----------------

  /** Bit-by-bit reference interleave. */
  private def mortonRef(x: Long, y: Long, bits: Int): Long =
    (0 until bits).map(i => (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))).sum

  test("arrivalLatenessMicros: hierarchical prefix-max ≡ naive global window; hand-computed lateness") {
    import java.sql.Timestamp
    import org.apache.spark.sql.expressions.Window
    // Hand fixture: arrivals 1..6 with one in-order run, one late event,
    // one very late event, and a tie with the high-water mark.
    val ts = Seq(
      (1L, "2024-01-01 10:00:00"), // hwm 10:00
      (2L, "2024-01-01 11:00:00"), // hwm 11:00
      (3L, "2024-01-01 10:30:00"), // 30 min late
      (4L, "2024-01-01 11:00:00"), // ties the hwm: lateness 0
      (5L, "2024-01-01 05:00:00"), // 6 h late
      (6L, "2024-01-01 12:00:00") // in order
    ).map { case (id, t) => (id, Timestamp.valueOf(t)) }.toDF("event_id", "ts")
    val out = graft.operators.EtlOps
      .arrivalLatenessMicros(ts, "ts", "event_id", blocks = 2)
      .orderBy("event_id")
      .select("lateness_us")
      .as[Long]
      .collect()
      .toSeq
    assert(out == Seq(0L, 0L, 1800000000L, 0L, 21600000000L, 0L), s"got $out")

    // Offset arrival domain (a resumed ingestion sequence / snowflake-
    // style ids): blocking must rebase to the observed minimum — a raw
    // id DIV would collapse everything into the last block and quietly
    // become the banned one-reducer window. Same fixture, ids + 1e9.
    val shifted = graft.operators.EtlOps
      .arrivalLatenessMicros(
        ts.withColumn("event_id", col("event_id") + 1000000000L), "ts", "event_id", blocks = 2)
      .orderBy("event_id")
      .select("lateness_us")
      .as[Long]
      .collect()
      .toSeq
    assert(shifted == out, s"offset ids must not change lateness: $shifted")

    // Hierarchical ≡ the naive one-reducer global window, row for row,
    // on real events at sf0.001 — under a block count that forces many
    // non-trivial block boundaries.
    val ev = Tables.events(spark, sfDir).select(col("event_id"), col("ts"))
    val hier = graft.operators.EtlOps
      .arrivalLatenessMicros(ev, "ts", "event_id", blocks = 7)
      .select("event_id", "lateness_us")
    val w = Window.orderBy(col("event_id")).rowsBetween(Window.unboundedPreceding, -1)
    val naive = ev
      .withColumn("pm", max(unix_micros(col("ts"))).over(w))
      .select(
        col("event_id"),
        when(col("pm").isNull, 0L)
          .otherwise(greatest(lit(0L), col("pm") - unix_micros(col("ts"))))
          .as("lateness_us"))
    assert(hier.exceptAll(naive).isEmpty && naive.exceptAll(hier).isEmpty,
      "blocked prefix-max must equal the global running max")
  }

  test("q_vacuum_plan verdicts: one keep per slot (the max version), deletes only old superseded files") {
    val out = QueryRegistry
      .queries("q_vacuum_plan")(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(4), r.getString(5)))
      .toSeq
    val bySlot = out.groupBy(t => (t._1, t._2))
    val wm = out.map(_._4).max
    bySlot.foreach { case (slot, files) =>
      val keeps = files.filter(_._5 == "keep")
      assert(keeps.size == 1, s"slot $slot must keep exactly one file, got $files")
      assert(keeps.head._3 == files.map(_._3).max, s"the kept file must be the max version: $files")
      files.filterNot(_._5 == "keep").foreach { f =>
        val expected = if (f._4 < wm - 7) "delete" else "retain_tt"
        assert(f._5 == expected, s"superseded file $f: expected $expected")
      }
    }
    // The fixture must exercise all three verdicts, or the oracle gates nothing.
    assert(Set("keep", "delete", "retain_tt").subsetOf(out.map(_._5).toSet))
  }

  test("q_time_travel × q_vacuum_plan: reads within retention never need a deleted file; the registered 10-day lag measurably breaks past it") {
    // The two queries run over the SAME versioned file inventory; this
    // pins their composition contract from both sides. Side 1: an as-of
    // read whose lag is WITHIN the vacuum's 7-day retention picks only
    // files vacuum keeps or retains — retention genuinely preserves time
    // travel. Side 2: the registered q_time_travel deliberately reads at
    // lag 10 > 7 (the Delta VACUUM footgun, made measurable) — some of
    // its picks MUST land on 'delete' files, or the fixture isn't
    // exercising the hazard it documents.
    val vac = QueryRegistry
      .queries("q_vacuum_plan")(spark, sfDir)
      .collect()
      .map(r => ((r.getString(0), r.getLong(1), r.getLong(2)), (r.getLong(4), r.getString(5))))
      .toSeq
    val verdicts = vac.toMap
    val wm = vac.map(_._2._1).max
    // Recompute the as-of pick at lag 7 (the retention boundary — the
    // newest read vacuum still guarantees) from vacuum's own file list:
    // latest created_day ≤ asof per slot, version as tie-break.
    val asofInRetention = wm - 7
    vac
      .filter(_._2._1 <= asofInRetention)
      .groupBy(f => (f._1._1, f._1._2))
      .foreach { case (slot, files) =>
        val pick = files.maxBy(f => (f._2._1, f._1._3))
        assert(verdicts(pick._1)._2 != "delete",
          s"slot $slot: in-retention as-of read picks a file vacuum deletes: $pick")
      }
    // The registered read (lag 10) must hit the hazard.
    val tt = QueryRegistry
      .queries("q_time_travel")(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val hazard = tt.count(k => verdicts(k)._2 == "delete")
    assert(hazard > 0,
      "the past-retention read never touched a deleted file — the footgun fixture is dead")
  }

  test("mortonKey matches the reference interleave on randoms") {
    val rnd = new scala.util.Random(7)
    val pts = Seq.fill(300)((rnd.nextInt(1 << 12).toLong, rnd.nextInt(1 << 12).toLong))
    val out = pts
      .toDF("x", "y")
      .select(col("x"), col("y"), EtlOps.mortonKey(col("x"), col("y"), 12).as("z"))
      .as[(Long, Long, Long)]
      .collect()
    out.foreach { case (x, y, z) => assert(z == mortonRef(x, y, 12), s"($x,$y)") }
  }

  test("q_zorder_layout: every z-bucket spans ≤ 32 values in BOTH dimensions") {
    // 64 buckets over an 8+8-bit morton key fix the top 3 bits of each
    // dimension — the locality property that makes min/max file stats
    // prune on either column. A single-key sort would span the full 256
    // in the other dimension.
    val rows = QueryRegistry
      .queries("q_zorder_layout")(spark, sfDir)
      .select("px_min", "px_max", "ox_min", "ox_max")
      .as[(Long, Long, Long, Long)]
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { case (pxn, pxx, oxn, oxx) =>
      assert(pxx - pxn <= 31, s"px span ${pxx - pxn}")
      assert(oxx - oxn <= 31, s"ox span ${oxx - oxn}")
    }
  }

  test("q_skipping_stats: zorder layout skips a strictly larger file fraction on the 2-D box") {
    val rows = QueryRegistry
      .queries("q_skipping_stats")(spark, sfDir)
      .select("layout", "n_files", "files_skipped", "rows_skipped", "n_rows_total")
      .as[(String, Long, Long, Long, Long)]
      .collect()
      .map(r => r._1 -> r)
      .toMap
    val zo = rows("zorder")
    val px = rows("px_sorted")
    // Same corpus under both layouts.
    assert(zo._5 == px._5)
    // The px sort prunes only its own dimension; morton buckets bound BOTH
    // dims, so the skipped-file fraction must be strictly higher.
    assert(zo._3.toDouble / zo._2 > px._3.toDouble / px._2,
      s"zorder ${zo._3}/${zo._2} vs px ${px._3}/${px._2}")
    // A 2-D box over one 32-aligned band pair leaves at most a handful of
    // live buckets under morton; sanity-floor the effect size.
    assert(zo._3 >= zo._2 - 4, s"zorder should skip nearly all buckets: ${zo._3}/${zo._2}")
  }

  test("zorderLayout: physical layout is a range exchange on zval") {
    val df = Tables.lineitem(spark, sfDir).select("l_partkey", "l_orderkey")
    val laid = EtlOps.zorderLayout(df, "l_partkey", "l_orderkey", bits = 8, numFiles = 4)
    val p = laid.queryExecution.executedPlan.toString()
    assert(p.contains("rangepartitioning(zval"), s"expected a range exchange on zval:\n$p")

    // Each range split covers a contiguous, non-overlapping z-range.
    val bounds = laid
      .select(spark_partition_id().as("pid"), col("zval"))
      .groupBy("pid")
      .agg(min("zval").as("lo"), max("zval").as("hi"))
      .orderBy("pid")
      .as[(Int, Long, Long)]
      .collect()
    assert(bounds.length > 1)
    bounds.sliding(2).foreach {
      case Array((_, _, hi1), (_, lo2, _)) => assert(hi1 <= lo2, s"overlapping z-ranges: $hi1 > $lo2")
      case _                               =>
    }
  }
}
