package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.expressions.ZOrderValue
import graft.ops.{Packing, RangeJoin}

/** Randomized algebraic properties of the distributed operators — the
  * ScalaCheck layer SURVEY §5 adopts in place of the reference's hand-rolled
  * randomized page/index tests. */
class PropertySpec extends SparkSpec with SlowSuite {

  private def sample[T](g: Gen[T], seed: Long): T =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  test("globalCumsum equals the single-window cumsum on random inputs") {
    import spark.implicits._
    val gen = Gen.listOfN(200, Gen.chooseNum(0L, 1000L))
    for (seed <- 1 to 5) {
      val vals = sample(gen, seed.toLong)
      val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "n")
      val single = df.withColumn("cum", sum("n").over(Window.orderBy("id")))
        .select("id", "cum").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val dist = Packing.globalCumsum(df, "id", col("n"), "cum", 7)
        .select("id", "cum").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(dist == single, s"seed=$seed")
    }
  }

  test("intersectAll/exceptAll partition the left bag on random multisets") {
    import spark.implicits._
    val gen = Gen.listOfN(300, Gen.chooseNum(0, 20))
    for (seed <- 1 to 5) {
      val xs = sample(gen, seed.toLong)
      val ys = sample(gen, seed.toLong + 1000)
      val a = xs.toDF("k")
      val b = ys.toDF("k")
      def bag(df: org.apache.spark.sql.DataFrame): Map[Int, Long] =
        df.groupBy("k").count().collect()
          .map(r => r.getInt(0) -> r.getLong(1)).toMap
      val ia = bag(a.intersectAll(b))
      val ea = bag(a.exceptAll(b))
      val bagA = bag(a)
      val bagB = bag(b)
      // INTERSECT ALL keeps min(m,n); EXCEPT ALL keeps m−n; together they
      // partition A's multiset exactly, key by key.
      for (k <- bagA.keys) {
        val m = bagA(k); val n = bagB.getOrElse(k, 0L)
        assert(ia.getOrElse(k, 0L) === math.min(m, n), s"seed=$seed k=$k ia")
        assert(ea.getOrElse(k, 0L) === math.max(m - n, 0L), s"seed=$seed k=$k ea")
        assert(ia.getOrElse(k, 0L) + ea.getOrElse(k, 0L) === m, s"seed=$seed k=$k sum")
      }
    }
  }

  test("WindowFold.compute equals the naive fold on random token-hash arrays") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val P = graft.functions.Hashing.P
    val gen = for {
      len <- Gen.chooseNum(0, 60)
      hs <- Gen.listOfN(len, Gen.chooseNum(0L, P - 1))
      n <- Gen.chooseNum(1, 25)
    } yield (hs, n)
    for (seed <- 1 to 50) {
      val (hs, n) = sample(gen, seed.toLong)
      val naive =
        if (hs.length < n) Seq.empty[Long]
        else hs.sliding(n).map(_.foldLeft(0L)((a, h) => (a * 31 + h) % P))
          .toSeq.distinct.sorted
      val got = graft.expressions.WindowFold
        .compute(new GenericArrayData(hs.toArray), n)
        .toLongArray().toSeq
      assert(got === naive, s"seed=$seed n=$n len=${hs.length}")
    }
  }

  test("BoundedLevenshtein.compute equals min(full DP, k+1) on random strings") {
    import org.apache.spark.unsafe.types.UTF8String
    def full(s: String, t: String): Int = {
      val dp = Array.tabulate(s.length + 1, t.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to s.length; j <- 1 to t.length)
        dp(i)(j) = math.min(
          dp(i - 1)(j - 1) + (if (s(i - 1) == t(j - 1)) 0 else 1),
          math.min(dp(i - 1)(j), dp(i)(j - 1)) + 1)
      dp(s.length)(t.length)
    }
    val gen = for {
      // tiny alphabet so edits collide and distances spread over [0, len]
      la <- Gen.chooseNum(0, 25)
      lb <- Gen.chooseNum(0, 25)
      a <- Gen.stringOfN(la, Gen.oneOf('a', 'b', 'c'))
      b <- Gen.stringOfN(lb, Gen.oneOf('a', 'b', 'c'))
      k <- Gen.chooseNum(0, 12)
    } yield (a, b, k)
    for (seed <- 1 to 200) {
      val (a, b, k) = sample(gen, seed.toLong)
      // also a shift-heavy pair whose optimal path hugs the band edges
      // (delete a prefix, insert a suffix) — the regression shape of the
      // "flaw"/"lawn" bug where column 0 was treated as unreachable
      val shifted = (a.drop(seed % 3), a + "xy".take(seed % 3))
      for ((x, y) <- Seq((a, b), shifted, shifted.swap)) {
        val want = math.min(full(x, y), k + 1)
        val got = graft.expressions.BoundedLevenshtein.compute(
          UTF8String.fromString(x), UTF8String.fromString(y), k)
        assert(got === want, s"seed=$seed a=$x b=$y k=$k")
      }
    }
  }

  test("capBuckets keeps exactly min(cap, |bucket|) smallest ids on random buckets") {
    import spark.implicits._
    val gen = Gen.listOfN(300, Gen.chooseNum(0, 7))
    for (seed <- 1 to 5) {
      val buckets = sample(gen, seed.toLong)
      val df = buckets.zipWithIndex.map { case (b, i) => (i.toLong, b) }.toDF("id", "b")
      val cap = 1 + seed % 4
      val kept = graft.ops.Skew.capBuckets(df, Seq("b"), "id", cap, s"prop_cap_$seed")
        .collect().map(r => (r.getLong(0), r.getInt(1)))
      val expected = buckets.zipWithIndex
        .map { case (b, i) => (b, i.toLong) }
        .groupBy(_._1)
        .flatMap { case (b, rows) => rows.map(_._2).sorted.take(cap).map(i => (i, b)) }
        .toSet
      assert(kept.toSet == expected, s"seed=$seed cap=$cap")
    }
  }

  test("mixtureSample copies land in {floor(w), ceil(w)} and match the hash gate") {
    import spark.implicits._
    import graft.functions.Hashing.{polyHashDuck => _, polyHashSpark}
    val gen = Gen.listOfN(150, Gen.oneOf("a", "b", "c"))
    for (seed <- 1 to 3) {
      val classes = sample(gen, seed.toLong)
      val docs = classes.zipWithIndex.map { case (c, i) => (i.toLong, c) }.toDF("id", "cls")
      val pcts = Map("a" -> (30 + seed), "b" -> 100, "c" -> (220 + seed))
      val out = graft.ops.Corpus.mixtureSample(docs, "id", "cls", pcts, defaultPct = 0)
        .groupBy("id", "cls").agg(max("n_copies").as("n"), count(lit(1)).as("emitted"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getLong(3)))
      // emitted rows equal n_copies, and n_copies ∈ {floor, ceil} of pct/100
      assert(out.forall { case (_, cls, n, emitted) =>
        val pct = pcts(cls)
        emitted == n.toLong && (n == pct / 100 || n == pct / 100 + 1)
      }, s"seed=$seed")
      // the hash gate is exactly bucket < pct % 100
      val buckets = docs.select(col("id"),
          expr(s"${polyHashSpark("CAST(id AS STRING)")} % 100").as("bk"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(out.forall { case (id, cls, n, _) =>
        val pct = pcts(cls)
        n == pct / 100 + (if (buckets(id) < pct % 100) 1 else 0)
      }, s"seed=$seed gate")
    }
  }

  test("bucketed time-range join equals naive join on random timelines") {
    import spark.implicits._
    val gen = for {
      n <- Gen.chooseNum(20, 80)
      rows <- Gen.listOfN(n, for {
        key <- Gen.chooseNum(1L, 5L)
        ts <- Gen.chooseNum(0L, 100000L)
      } yield (key, ts))
    } yield rows
    for (seed <- 1 to 5) {
      val rows = sample(gen, seed.toLong).zipWithIndex
        .map { case ((k, t), i) => (k, i.toLong, t) }
      val radius = 997L // prime, so bucket edges don't align with data
      val l = rows.toDF("user_id", "lid", "lus")
      val r = rows.map { case (k, i, t) => (k, i + 100000L, t) }
        .toDF("user_id", "rid", "rus")
      val bucketed = RangeJoin.timeRangeJoin(l, r, "user_id",
          col("lus"), col("rus"), radius)
        .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
      val naive = l.join(r, l("user_id") === r("user_id") &&
          abs(r("rus") - l("lus")) <= radius)
        .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
      assert(bucketed == naive, s"seed=$seed")
    }
  }

  test("salted aggregation equals direct GROUP BY on random skewed data") {
    import spark.implicits._
    val gen = Gen.listOfN(300, for {
      key <- Gen.frequency((10, Gen.const(1L)), (1, Gen.chooseNum(2L, 4L)))
      cents <- Gen.chooseNum(0L, 100000L)
    } yield (key, cents / 100.0))
    for (seed <- 1 to 3; salts <- Seq(1, 7)) {
      val rows = sample(gen, seed.toLong)
      val df = rows.toDF("k", "v")
      val salted = graft.ops.Skew.saltedCountSum(df, col("k"), col("v"), salts)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val direct = df.groupBy(col("k").as("k"))
        .agg(count(lit(1)).as("cnt"),
          graft.ops.Relational.sumExact(col("v")).as("sum_val"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(salted == direct, s"seed=$seed salts=$salts")
    }
  }

  test("z-order interleave is injective and order-preserving per axis") {
    val gen = Gen.listOfN(300, Gen.chooseNum(Int.MinValue, Int.MaxValue))
    for (seed <- 1 to 3) {
      val xs = sample(gen, seed.toLong)
      val ys = sample(gen, seed + 100L)
      val zs = xs.zip(ys).map { case (x, y) => ZOrderValue.interleave(x, y) }
      assert(zs.distinct.size == xs.zip(ys).distinct.size) // injective
      // monotone in x for fixed y
      val y0 = ys.head
      val sortedX = xs.sorted
      val zx = sortedX.map(x => ZOrderValue.interleave(x, y0))
      assert(zx == zx.sorted)
    }
  }

  test("applyCdc equals sequential per-key log application on random logs") {
    import spark.implicits._
    import graft.ops.Relational
    val opGen = Gen.oneOf("I", "U", "D")
    val gen = for {
      snapKeys <- Gen.listOfN(12, Gen.chooseNum(0L, 19L)).map(_.distinct)
      n <- Gen.chooseNum(1, 25)
      log <- Gen.listOfN(n, for {
        k <- Gen.chooseNum(0L, 19L)
        op <- opGen
        v <- Gen.chooseNum(0L, 999L)
      } yield (k, op, v))
    } yield (snapKeys, log)
    for (seed <- 1 to 20) {
      val (snapKeys, log) = sample(gen, seed.toLong)
      val snapshot = snapKeys.map(k => (k, k * 1000)).toDF("k", "v")
      val changelog = log.zipWithIndex
        .map { case ((k, op, v), i) => (k, v, op, i.toLong) }
        .toDF("k", "v", "op", "seq")
      val got = Relational.applyCdc(snapshot, changelog, "k", "op", "seq")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // reference: latest op per key decides; I/U upsert that value, D deletes
      val byKey = log.zipWithIndex.groupBy(_._1._1)
        .map { case (k, ops) => k -> ops.maxBy(_._2)._1 }
      val want = snapKeys.map(k => k -> k * 1000).toMap.filter {
        case (k, _) => !byKey.contains(k)
      } ++ byKey.collect { case (k, (_, op, v)) if op != "D" => k -> v }
      assert(got == want, s"seed=$seed")
    }
  }

  test("snapshotDiff round-trips: applyCdc(before, diff(before, after)) == after") {
    import spark.implicits._
    import graft.ops.Relational
    // random before/after snapshots sharing a key space; values may be
    // null (the U classification must be null-safe)
    val rowGen = for {
      k <- Gen.chooseNum(0L, 29L)
      v <- Gen.option(Gen.chooseNum(0L, 9L))
      s <- Gen.oneOf("x", "y", "z")
    } yield (k, v, s)
    val gen = for {
      nb <- Gen.chooseNum(0, 25); na <- Gen.chooseNum(0, 25)
      before <- Gen.listOfN(nb, rowGen).map(_.distinctBy(_._1))
      after <- Gen.listOfN(na, rowGen).map(_.distinctBy(_._1))
    } yield (before, after)
    for (seed <- 1 to 20) {
      val (beforeRows, afterRows) = sample(gen, seed.toLong)
      val before = beforeRows.toDF("k", "v", "s")
      val after = afterRows.toDF("k", "v", "s")
      val diff = Relational.snapshotDiff(before, after, "k")
      val roundTrip = Relational.applyCdc(before, diff, "k", "op", "seq")
        .collect().map(r => (r.getLong(0), Option(r.get(1)), r.getString(2)))
        .toSet
      val want = afterRows.map { case (k, v, s) => (k, v.map(_.asInstanceOf[Any]), s) }.toSet
      assert(roundTrip == want, s"seed=$seed")
      // no-op rows emit nothing: diff size == |I| + |D| + |changed U|
      val bm = beforeRows.map(r => r._1 -> r).toMap
      val am = afterRows.map(r => r._1 -> r).toMap
      val expectOps = am.count { case (k, r) => bm.get(k).forall(_ != r) } +
        bm.count { case (k, _) => !am.contains(k) }
      assert(diff.count() === expectOps, s"seed=$seed diff-size")
    }
  }

  test("refreshAffectedGroups equals full recompute on random CDC deltas") {
    import spark.implicits._
    import graft.ops.Relational
    import org.apache.spark.sql.DataFrame
    // rows (id, grp, v); deltas may delete a group's LAST row, insert into
    // brand-new groups, and update values — all three must land.
    val gen = for {
      n <- Gen.chooseNum(1, 40)
      base <- Gen.listOfN(n, for {
        id <- Gen.chooseNum(0L, 59L); g <- Gen.chooseNum(0L, 7L)
        v <- Gen.chooseNum(0L, 99L)
      } yield (id, g, v)).map(_.distinctBy(_._1))
      m <- Gen.chooseNum(1, 15)
      log <- Gen.listOfN(m, for {
        id <- Gen.chooseNum(0L, 79L) // ids 60-79: inserts into new groups
        op <- Gen.oneOf("I", "U", "D")
        g <- Gen.chooseNum(0L, 9L)   // groups 8-9 only reachable via delta
        v <- Gen.chooseNum(0L, 99L)
      } yield (id, g, v, op))
    } yield (base, log)
    val agg: DataFrame => DataFrame =
      df => df.groupBy("grp").agg(
        count(lit(1)).as("n"), sum(col("v")).as("sv"), max(col("v")).as("mx"))
    for (seed <- 1 to 20) {
      val (base, log) = sample(gen, seed.toLong)
      val snapshot = base.toDF("id", "grp", "v")
      val changelog = log.zipWithIndex
        .map { case ((id, g, v, op), i) => (id, g, v, op, i.toLong) }
        .toDF("id", "grp", "v", "op", "seq")
      val updated = Relational.applyCdc(snapshot, changelog, "id", "op", "seq")
      // touched keys: every group a delta row names PLUS the base group of
      // every delta'd id (an update can move a row between groups)
      val touched = changelog.select("grp").unionByName(
        snapshot.join(changelog.select("id"), Seq("id"), "left_semi")
          .select("grp"))
      val got = Relational
        .refreshAffectedGroups(agg(snapshot), updated, touched, "grp")(agg)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      val want = agg(updated)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      assert(got == want, s"seed=$seed")
    }
  }

  test("exactPercentiles equals the interpolated order statistic on random data") {
    import spark.implicits._
    import graft.ops.Quantiles
    val gen = for {
      n <- Gen.chooseNum(1, 300)
      vs <- Gen.listOfN(n, Gen.chooseNum(0L, 50L)) // heavy duplication
    } yield vs
    for (seed <- 1 to 10) {
      val vs = sample(gen, seed.toLong)
      val probs = Seq(0.1, 0.5, 0.9)
      val got = Quantiles.exactPercentiles(vs.toDF("k"), "k", probs).head
      val sorted = vs.sorted.toIndexedSeq
      probs.zipWithIndex.foreach { case (p, i) =>
        // the SQL spells p as a DECIMAL literal, so p·(n−1) and g are EXACT
        // decimal arithmetic (g only becomes a double when multiplied by
        // the bracket span) — the reference must mirror that
        val idxBD = BigDecimal(p.toString) * BigDecimal(sorted.size - 1)
        val kLo = idxBD.setScale(0, BigDecimal.RoundingMode.FLOOR).toInt
        val kHi = idxBD.setScale(0, BigDecimal.RoundingMode.CEILING).toInt
        val (lo, hi) = (sorted(kLo), sorted(kHi))
        val g = (idxBD - BigDecimal(kLo)).toDouble
        val want = lo + g * (hi - lo)
        assert(got.getDouble(i) === want, s"seed=$seed p=$p")
      }
    }
  }

  test("funnel equals the per-user sequential reference on random events") {
    import spark.implicits._
    import graft.ops.Pipeline
    val typeGen = Gen.oneOf("view", "click", "purchase", "error")
    val gen = Gen.listOfN(120, for {
      u <- Gen.chooseNum(1L, 8L)
      us <- Gen.chooseNum(1L, 500L)
      t <- typeGen
    } yield (u, us, t))
    for (seed <- 1 to 10) {
      // unique (user, us) so strict-after semantics have no engine-order tie
      val evs = sample(gen, seed.toLong)
        .groupBy(e => (e._1, e._2)).map(_._2.head).toSeq
      val df = evs.toDF("u", "us", "t")
        .select(col("u"), timestamp_micros(col("us")).as("ts"), col("t"))
      val got = Pipeline.funnel(df, "u", "ts", "t",
          Seq("view", "click", "purchase"))
        .collect().map(r => r.getLong(0) ->
          (Seq(1, 2, 3).map(i => if (r.isNullAt(i)) -1L else r.getLong(i)),
            r.getInt(4))).toMap
      evs.groupBy(_._1).foreach { case (u, es) =>
        def firstAfter(t: String, after: Long): Long =
          es.filter(e => e._3 == t && e._2 > after)
            .map(_._2).minOption.getOrElse(-1L)
        val tv = firstAfter("view", Long.MinValue)
        val tc = if (tv < 0) -1L else firstAfter("click", tv)
        val tp = if (tc < 0) -1L else firstAfter("purchase", tc)
        val stage = Seq(tv, tc, tp).count(_ >= 0)
        assert(got(u) === ((Seq(tv, tc, tp), stage)), s"seed=$seed user=$u")
      }
    }
  }

  test("canonicalizeUrl is idempotent on adversarial URL-ish strings") {
    import spark.implicits._
    import graft.ops.Pipeline
    val seg = Gen.oneOf("a", "B", "utm_x=1", "p=2", "#f", "/", "?", "&")
    val gen = for {
      host <- Gen.oneOf("Ex.COM", "h.io", "WWW.A.ORG")
      n <- Gen.chooseNum(0, 8)
      parts <- Gen.listOfN(n, seg)
    } yield s"https://$host/" + parts.mkString
    val urls = (1 to 40).map(s => sample(gen, s.toLong)).distinct
    val df = urls.toDF("url")
      .withColumn("c1", Pipeline.canonicalizeUrl(col("url")))
      .withColumn("c2", Pipeline.canonicalizeUrl(col("c1")))
      .collect()
    df.foreach { r =>
      assert(r.getString(2) === r.getString(1), s"not idempotent: ${r.getString(0)}")
    }
  }

  test("bfsDistance equals brute-force multi-source BFS on random graphs") {
    import spark.implicits._
    val n = 30
    val gen = for {
      nEdges <- Gen.chooseNum(10, 60)
      edges <- Gen.listOfN(nEdges, Gen.zip(
        Gen.chooseNum(0L, n - 1L), Gen.chooseNum(0L, n - 1L)))
      seeds <- Gen.nonEmptyListOf(Gen.chooseNum(0L, n - 1L))
    } yield (edges.filter(e => e._1 != e._2), seeds.distinct)
    for (seed <- 1 to 3) {
      val (edges, sources) = sample(gen, seed.toLong)
      val maxHops = 3
      // Reference: plain BFS over the adjacency list.
      val adj = (edges.map(e => e._1 -> e._2) ++ edges.map(e => e._2 -> e._1))
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
      val expect = scala.collection.mutable.Map[Long, Long]()
      sources.foreach(s => expect(s) = 0L)
      var frontier = sources.toSet
      for (h <- 1 to maxHops) {
        frontier = frontier.flatMap(v => adj.getOrElse(v, Set.empty[Long]))
          .filterNot(expect.contains)
        frontier.foreach(v => expect(v) = h.toLong)
      }
      val got = graft.ops.Dedup.bfsDistance(
          (0L until n.toLong).toDF("id"), edges.toDF("d1", "d2"), "id",
          sources.toDF("id"), maxHops)
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
      for (v <- 0L until n.toLong)
        assert(got(v) === expect.get(v), s"seed=$seed node=$v")
    }
  }

  test("JaroWinkler.compute equals the textbook reference on random strings") {
    import org.apache.spark.unsafe.types.UTF8String
    // Independent reference: direct Winkler-1990 definition over chars
    // (ASCII inputs keep bytes == chars, matching the byte-based native).
    def refJaro(s: String, t: String): Double = {
      if (s.isEmpty || t.isEmpty) return 0.0
      val w = math.max(math.max(s.length, t.length) / 2 - 1, 0)
      val ms = Array.fill(s.length)(false)
      val mt = Array.fill(t.length)(false)
      var m = 0
      for (i <- s.indices) {
        val js = (math.max(0, i - w) until math.min(t.length, i + w + 1))
          .find(j => !mt(j) && s(i) == t(j))
        js.foreach { j => ms(i) = true; mt(j) = true; m += 1 }
      }
      if (m == 0) return 0.0
      val sm = s.indices.filter(ms).map(s(_))
      val tm = t.indices.filter(mt).map(t(_))
      val trans = sm.zip(tm).count { case (a, b) => a != b } / 2
      (m.toDouble / s.length + m.toDouble / t.length +
        (m - trans).toDouble / m) / 3.0
    }
    def refJw(s: String, t: String): Double = {
      val j = refJaro(s, t)
      if (j > 0.7) {
        val p = s.zip(t).take(4).takeWhile { case (a, b) => a == b }.size
        j + p * 0.1 * (1.0 - j)
      } else j
    }
    val gen = for {
      l1 <- Gen.chooseNum(0, 20)
      l2 <- Gen.chooseNum(0, 20)
      a <- Gen.listOfN(l1, Gen.alphaLowerChar).map(_.mkString)
      b <- Gen.listOfN(l2, Gen.alphaLowerChar).map(_.mkString)
    } yield (a, b)
    for (seed <- 1 to 500) {
      val (a, b) = sample(gen, seed.toLong)
      val got = graft.expressions.JaroWinkler.compute(
        UTF8String.fromString(a), UTF8String.fromString(b))
      assert(got === refJw(a, b), s"a=$a b=$b")
      // symmetry + range
      assert(got === graft.expressions.JaroWinkler.compute(
        UTF8String.fromString(b), UTF8String.fromString(a)), s"sym a=$a b=$b")
      assert(got >= 0.0 && got <= 1.0)
      if (a.nonEmpty)
        assert(graft.expressions.JaroWinkler.compute(
          UTF8String.fromString(a), UTF8String.fromString(a)) === 1.0)
    }
  }
}
