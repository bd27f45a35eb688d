package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.EtlOps

class EtlOpsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("dedupByKey keeps the min-order row per composite key") {
    val df = Seq(
      (1L, "a", "x", 10.0),
      (2L, "a", "x", 20.0),
      (3L, "b", "x", 30.0)
    ).toDF("id", "k1", "k2", "v")
    val out = EtlOps.dedupByKey(df, Seq("k1", "k2"), "id").orderBy("id")
    assert(out.select("id").as[Long].collect().toSeq == Seq(1L, 3L))
  }

  test("forwardFill carries the last non-null forward within the key") {
    val df = Seq(
      (1L, "u", Some(1.0)),
      (2L, "u", None),
      (3L, "u", None),
      (4L, "u", Some(4.0)),
      (5L, "v", None)
    ).toDF("id", "k", "v")
    val out = EtlOps.forwardFill(df, Seq("k"), "id", "v").orderBy("id")
    assert(
      out.select("v").as[Option[Double]].collect().toSeq ==
        Seq(Some(1.0), Some(1.0), Some(1.0), Some(4.0), None)
    )
  }

  test("quarantine splits rows exactly, null predicate counts as good") {
    val df = Seq((1L, Some(-5.0)), (2L, Some(5.0)), (3L, None)).toDF("id", "v")
    val (good, bad) = EtlOps.quarantine(df, col("v") < 0)
    assert(good.select("id").as[Long].collect().toSet == Set(2L, 3L))
    assert(bad.select("id").as[Long].collect().toSet == Set(1L))
  }

  test("celsiusToFahrenheit respects the -90 sentinel") {
    val out = Seq(0.0, 100.0, -99.9)
      .toDF("c")
      .select(EtlOps.celsiusToFahrenheit(col("c")).as("f"))
      .as[Double]
      .collect()
      .toSeq
    assert(out == Seq(32.0, 212.0, -99.9))
  }

  test("normalizeName strips degree/paren/percent and snake_cases") {
    assert(EtlOps.normalizeName("Temperature °F") == "temperature_f")
    assert(EtlOps.normalizeName("Sky Cover (%)") == "sky_cover_pct")
    assert(EtlOps.normalizeName("Wind Speed") == "wind_speed")
  }

  test("timestampFromParts rebuilds yyyymmdd+hhmm integers") {
    val out = Seq((20240131L, 1745L))
      .toDF("d", "t")
      .select(EtlOps.timestampFromParts(col("d"), col("t")).as("ts"))
      .as[Timestamp]
      .head()
    assert(out == Timestamp.valueOf("2024-01-31 17:45:00"))
  }

  test("dropColumnsMatching prunes by regex") {
    val df = Seq((1, 2, 3)).toDF("keep_a", "soil_b", "keep_soil_free")
    assert(EtlOps.dropColumnsMatching(df, "soil").columns.toSeq == Seq("keep_a"))
    assert(EtlOps.dropColumnsMatching(df, "^soil").columns.toSeq == Seq("keep_a", "keep_soil_free"))
  }

  test("castColumns casts listed columns and leaves the rest") {
    val df = Seq(("1", "2.5", 3)).toDF("a", "b", "c")
    val out = EtlOps.castColumns(df, Map("a" -> "int", "b" -> "double"))
    assert(out.schema("a").dataType.typeName == "integer")
    assert(out.schema("b").dataType.typeName == "double")
    assert(out.schema("c").dataType.typeName == "integer")
  }

  test("incrementalSince keeps strictly-newer rows only") {
    val df = Seq(
      (1L, Timestamp.valueOf("2024-01-01 00:00:00")),
      (2L, Timestamp.valueOf("2024-06-01 00:00:00"))
    ).toDF("id", "ts")
    val out = EtlOps.incrementalSince(df, "ts", Timestamp.valueOf("2024-01-01 00:00:00"))
    assert(out.select("id").as[Long].collect().toSeq == Seq(2L))
  }

  test("saltedJoin equals the plain join and spreads a hot key over salts") {
    // 10k rows of one pathological key + a sprinkle of normal keys.
    val fact = spark.range(10000).selectExpr("CAST(id % 10 = 0 AS INT) * 0 + 1 AS k", "id AS v")
      .union(spark.range(100).selectExpr("CAST(2 + id % 5 AS INT) AS k", "id AS v"))
    val dim = Seq((1, "hot"), (2, "a"), (3, "b"), (4, "c"), (5, "d"), (6, "e")).toDF("k", "name")

    val plain = fact.join(dim, Seq("k")).groupBy("k", "name").count()
    val salted = EtlOps.saltedJoin(fact, dim, "k", saltFactor = 8).groupBy("k", "name").count()
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)

    // The hot key must actually occupy multiple salt sub-keys.
    val saltSpread = fact
      .withColumn("__salt", pmod(hash(fact.columns.map(col).toIndexedSeq: _*), lit(8)))
      .filter(col("k") === 1)
      .select("__salt")
      .distinct()
      .count()
    assert(saltSpread > 4, s"hot key spread over only $saltSpread salts")
  }

  test("asofJoin: latest at-or-before match, inclusive ties, null when no prior row") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")), // after r2 → matches r2
      (2L, 10L, ts("2024-01-01 08:00:00")), // equal to r1's ts → inclusive match r1
      (3L, 10L, ts("2024-01-01 07:00:00")), // before any right row → null
      (4L, 20L, ts("2024-01-01 12:00:00"))  // other key, no right rows at all → null
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, ts("2024-01-01 08:00:00"), 101L), // r1
      (10L, ts("2024-01-01 09:00:00"), 102L)  // r2
    ).toDF("user_id", "signup_ts", "signup_id")

    val out = EtlOps
      .asofJoin(left, right, Seq("user_id"), "ts", "signup_ts", Seq("signup_id"))
      .select("event_id", "signup_id")
      .as[(Long, Option[Long])]
      .collect()
      .toMap
    assert(out == Map(1L -> Some(102L), 2L -> Some(101L), 3L -> None, 4L -> None))
  }

  test("asofJoin carries the matched right ROW whole: a null payload field is not backfilled") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val left = Seq((1L, 10L, ts("2024-01-01 12:00:00"))).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, ts("2024-01-01 08:00:00"), Some(101L), Some("gold")),
      // The LATEST right row deliberately nulls its tier — the match must
      // surface that null, not composite the older row's "gold" into it.
      (10L, ts("2024-01-01 09:00:00"), Some(102L), Option.empty[String])
    ).toDF("user_id", "signup_ts", "signup_id", "tier")
    val out = EtlOps
      .asofJoin(left, right, Seq("user_id"), "ts", "signup_ts", Seq("signup_id", "tier"))
      .select("signup_id", "tier")
      .as[(Option[Long], Option[String])]
      .collect()
      .toSeq
    assert(out == Seq((Some(102L), None)),
      s"payload must come from ONE right row (the latest), got $out")
  }

  test("balancedSample tolerates a NULL group value") {
    val withNull = skewedDocs
      .withColumn("lang", when(col("doc_id") % 7 === 0, lit(null)).otherwise(col("lang")))
    // Balance mode: the null group is a group like any other — no NPE, and
    // some of its rows survive the leveling.
    val kept = EtlOps.balancedSample(withNull, by = "lang", idCol = "doc_id")
    assert(kept.filter(col("lang").isNull).count() > 0)
    // Target mode cannot name the null group: its rows drop, named ones keep.
    val targeted = EtlOps
      .balancedSample(withNull, by = "lang", idCol = "doc_id", target = Map("en" -> 1.0))
    assert(targeted.filter(col("lang").isNull).count() == 0)
    assert(targeted.filter(col("lang") === "en").count() > 0)
  }

  test("asofJoin matches a brute-force reference on randomized data") {
    val rng = new scala.util.Random(42)
    val leftRows = (1 to 200).map { i =>
      (i.toLong, (rng.nextInt(8) + 1).toLong, new java.sql.Timestamp(1700000000000L + rng.nextInt(100000) * 1000L))
    }
    // A second, NULLABLE payload column (~1/3 null): the matched right row
    // must arrive whole — per-column carries would backfill a null tier
    // from an older row and this reference would catch it.
    val rightRows = (1 to 80).map { i =>
      ((rng.nextInt(8) + 1).toLong, new java.sql.Timestamp(1700000000000L + rng.nextInt(100000) * 1000L), (1000 + i).toLong,
        if (rng.nextInt(3) == 0) None else Some(s"t${rng.nextInt(4)}"))
    }.distinct
      // one right row per (key, ts): the operator's documented precondition
      // for a deterministic match (q_asof_join pre-dedups the same way)
      .groupBy(r => (r._1, r._2)).map(_._2.maxBy(_._3)).toSeq
    val left = leftRows.toDF("event_id", "user_id", "ts")
    val right = rightRows.toDF("user_id", "signup_ts", "signup_id", "tier")

    val got = EtlOps
      .asofJoin(left, right, Seq("user_id"), "ts", "signup_ts", Seq("signup_id", "tier"))
      .select("event_id", "signup_id", "tier")
      .as[(Long, Option[Long], Option[String])]
      .collect()
      .map(r => r._1 -> ((r._2, r._3)))
      .toMap
    val expected = leftRows.map { case (id, key, ts) =>
      val m = rightRows
        .filter(r => r._1 == key && !r._2.after(ts))
        .sortBy(r => (r._2.getTime, r._3))
        .lastOption
      id -> ((m.map(_._3), m.flatMap(_._4)))
    }.toMap
    assert(got == expected)
  }

  test("rangeJoin: exact interval containment across bin boundaries, no equi key") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val left = Seq(
      (1L, ts("2024-01-01 00:30:00")), // inside w1 only
      (2L, ts("2024-01-01 02:00:00")), // inside w1 (end-inclusive) and w2 (start-inclusive)
      (3L, ts("2024-01-01 05:00:01"))  // just past w2's end → no match
    ).toDF("event_id", "ts")
    val windows = Seq(
      ("w1", ts("2024-01-01 00:00:00"), ts("2024-01-01 02:00:00")),
      ("w2", ts("2024-01-01 02:00:00"), ts("2024-01-01 05:00:00"))
    ).toDF("name", "w_start", "w_end")

    val out = EtlOps
      .rangeJoin(left, windows, "ts", "w_start", "w_end", binWidthUs = 3600000000L)
      .select("event_id", "name")
      .as[(Long, String)]
      .collect()
      .toSet
    assert(out == Set((1L, "w1"), (2L, "w1"), (2L, "w2")))
  }

  // Heavily skewed corpus for the data-derived sampler: 4000 en / 800 de /
  // 200 fr. Rates must come from these observed counts, not constants.
  private def skewedDocs = {
    val rows = (0L until 4000L).map(i => (i, "en")) ++
      (4000L until 4800L).map(i => (i, "de")) ++
      (4800L until 5000L).map(i => (i, "fr"))
    rows.toDF("doc_id", "lang")
  }

  test("balancedSample (uniform target) levels a skewed mix to ~the smallest group") {
    val kept = EtlOps.balancedSample(skewedDocs, by = "lang", idCol = "doc_id")
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    // Smallest group (fr, 200) keeps everything; the others downsample to
    // ≈200 each — md5-threshold selection is binomial, so allow ±30%.
    assert(kept("fr") == 200L, s"min group must be kept whole, got $kept")
    for (l <- Seq("en", "de"))
      assert(kept(l) >= 140 && kept(l) <= 260, s"$l not leveled to ~200: $kept")
  }

  test("balancedSample honors an explicit target mix and drops untargeted groups") {
    val kept = EtlOps
      .balancedSample(skewedDocs, by = "lang", idCol = "doc_id", target = Map("en" -> 0.8, "de" -> 0.2))
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    // S = min(4000/0.8, 800/0.2) = 4000 → en ≈ 3200 (rate 0.8), de = 800
    // (rate 1.0, kept whole), fr absent from the target → dropped.
    assert(!kept.contains("fr"), s"untargeted group must be dropped: $kept")
    assert(kept("de") == 800L, s"rate-1.0 group must be kept whole: $kept")
    assert(kept("en") >= 2880 && kept("en") <= 3520, s"en not at ~3200: $kept")
    val share = kept("en").toDouble / (kept("en") + kept("de"))
    assert(share > 0.75 && share < 0.85, s"achieved mix off target 0.8: $share")
  }

  test("packShards equals the naive single-window prefix sum on a skewed corpus") {
    // One stream holds 20k of 20.05k rows — exactly the skew that makes a
    // bare (stream) window a one-reducer bottleneck. The hierarchical form
    // must still be BIT-identical to the naive definition.
    val rows = (0L until 20000L).map(i => (i, "en", "web", 100L + (i % 7) * 31L)) ++
      (0L until 50L).map(i => (i * 400L + 3L, "fr", "web", 900L + i))
    val df = rows.toDF("doc_id", "lang", "source", "n_tok")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang"), col("source")).orderBy(col("doc_id"))
    val naive = df
      .withColumn("shard_id", floor((sum(col("n_tok")).over(w) - col("n_tok")) / 4096.0).cast("long"))
      .select("doc_id", "lang", "shard_id")
    val packed = EtlOps
      .packShards(df, Seq("lang", "source"), "doc_id", "n_tok", budget = 4096L, blockSize = 256L)
      .select("doc_id", "lang", "shard_id")
    assert(packed.exceptAll(naive).isEmpty && naive.exceptAll(packed).isEmpty,
      "hierarchical packing diverged from the naive prefix sum")
  }

  test("topKPerKey + window equals the bare window under every partitioning, for both call-site orderings (r10 advice)") {
    // The pre-cap's contract: `ord` must be a TOTAL order mirroring the
    // downstream window's (value, unique-id tiebreak). This property test
    // pins it for the two live call-site shapes — q_top_n_per_group's
    // (key, price desc, orderkey asc) and q_embed_outliers' (label, dist
    // desc, vec_id asc) — across adversarial partitionings, with heavy
    // value TIES so an under-specified Ordering would actually bite.
    import org.apache.spark.sql.expressions.Window
    // Deterministic corpus: 4 keys × 60 rows, values drawn from just 5
    // distinct levels → ties everywhere, ids unique.
    val rows = (0L until 240L).map { i =>
      (s"k${i % 4}", (i * 2654435761L % 5L).toDouble, i)
    }
    val k = 3
    val better: Ordering[(String, Double, Long)] =
      Ordering.by[(String, Double, Long), (Double, Long)](r => (-r._2, r._3))
    def windowed(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("key")).orderBy(col("v").desc, col("id"))))
      .filter(col("rn") <= k)
      .select("key", "rn", "id", "v")
      .collect().map(_.toSeq).toSet
    val base = rows.toDF("key", "v", "id")
    val bare = windowed(base)
    val partitionings: Seq[org.apache.spark.sql.DataFrame] = Seq(
      base.repartition(1),
      base.repartition(13),
      base.repartition(col("v")),               // all ties co-located
      base.repartitionByRange(7, col("id").desc),
      base.orderBy(col("id").desc).coalesce(2)  // reversed encounter order
    )
    for ((p, i) <- partitionings.zipWithIndex) {
      val pre = EtlOps.topKPerKey(p.as[(String, Double, Long)], k)(_._1)(better)
        .toDF("key", "v", "id")
      assert(windowed(pre) == bare, s"partitioning #$i changed the top-k result")
    }
    // And the q_embed_outliers shape (Int key, Long id, Double score).
    val rows2 = (0L until 240L).map(i => ((i % 4).toInt, i, (i * 2654435761L % 5L).toDouble))
    val better2: Ordering[(Int, Long, Double)] =
      Ordering.by[(Int, Long, Double), (Double, Long)](r => (-r._3, r._2))
    def windowed2(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("label")).orderBy(col("dist").desc, col("vec_id"))))
      .filter(col("rn") <= k)
      .select("label", "rn", "vec_id", "dist")
      .collect().map(_.toSeq).toSet
    val base2 = rows2.toDF("label", "vec_id", "dist")
    val bare2 = windowed2(base2)
    val pre2 = EtlOps
      .topKPerKey(base2.repartition(11).as[(Int, Long, Double)], k)(_._1)(better2)
      .toDF("label", "vec_id", "dist")
    assert(windowed2(pre2) == bare2)
  }

  test("an Ordering WITHOUT the unique-id tiebreak deterministically violates the pre-cap contract") {
    // Why the contract demands the tiebreak: with all-tied values in one
    // partition, the heap keeps the first k encountered, and `ord.lt` is
    // false for ties — so when encounter order opposes the window's id
    // tiebreak, the pre-cap provably drops the rows the window wants. This
    // is the failure mode a future under-specified caller would ship; it
    // must reproduce deterministically here, not as a rare oracle flake.
    import org.apache.spark.sql.expressions.Window
    val tied = Seq(("a", 1.0, 5L), ("a", 1.0, 4L), ("a", 1.0, 3L), ("a", 1.0, 2L), ("a", 1.0, 1L))
    val underSpecified: Ordering[(String, Double, Long)] =
      Ordering.by[(String, Double, Long), Double](r => -r._2) // ties unresolved
    val pre = EtlOps
      // createDataset preserves Seq order; coalesce(1) keeps it — ids
      // arrive 5,4,3,2,1 so the heap keeps {5,4}.
      .topKPerKey(spark.createDataset(tied).coalesce(1), 2)(_._1)(underSpecified)
      .toDF("key", "v", "id")
    val picked = pre
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("key")).orderBy(col("v").desc, col("id"))))
      .filter(col("rn") <= 2)
      .select("id").as[Long].collect().toSet
    assert(picked == Set(5L, 4L),
      s"expected the under-specified ordering to surface ids {5,4}, got $picked")
    assert(picked != Set(1L, 2L), "the bare window would have picked {1,2} — contract violated as designed")
  }

  test("packShards bounds every window partition by blockSize regardless of stream skew") {
    val df = (0L until 10000L).map(i => (i, "en", "web", 10L)).toDF("doc_id", "lang", "source", "n_tok")
    val maxPart = df
      .withColumn("__blk", floor(col("doc_id") / 256.0).cast("long"))
      .groupBy("lang", "source", "__blk").count()
      .agg(max("count")).as[Long].head()
    assert(maxPart <= 256L, s"window partition exceeded blockSize: $maxPart")
    // And the operator's own output stays correct at that bound.
    val out = EtlOps.packShards(df, Seq("lang", "source"), "doc_id", "n_tok", 4096L, 256L)
    assert(out.count() == 10000L)
    // 10000 rows x 10 tok / 4096 budget → shards 0..24, monotone in doc_id.
    assert(out.agg(max("shard_id")).as[Long].head() == 24L)
  }
}
