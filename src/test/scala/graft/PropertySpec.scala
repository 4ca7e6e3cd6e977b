package graft

import graft.ops.CoreOps
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based checks promised by SURVEY.md §5.3: flatten totality and
  * collision-freedom on struct-only schemas, dedup idempotence,
  * union→distinct ≡ set union, ms→date roundtrip.
  * (Raw ScalaCheck generators; the scalatest bridge artifact is not in
  * the offline cache, so sampling is driven by a deterministic helper.)
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic n-sample driver over a generator. */
  private def forSamples[A](gen: Gen[A], n: Int)(f: A => Unit): Unit = {
    var seed = Seed(42L)
    var i = 0
    var misses = 0
    while (i < n) {
      gen.apply(Gen.Parameters.default, seed) match {
        case Some(a) => f(a); i += 1
        case None =>
          misses += 1
          assert(misses < 1000, "generator kept failing")
      }
      seed = seed.next
    }
  }

  private val fieldName: Gen[String] =
    Gen.choose(1, 8).flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar)).map(_.mkString)

  private def genSchema(depth: Int): Gen[StructType] =
    Gen.choose(1, 3).flatMap { nFields =>
      Gen.listOfN(nFields, fieldName).flatMap { rawNames =>
        val names = rawNames.distinct
        Gen.sequence[Seq[StructField], StructField](names.map { nm =>
          if (depth > 0)
            Gen.oneOf(
              Gen.const(StructField(nm, LongType)),
              genSchema(depth - 1).map(s => StructField(nm, s)))
          else Gen.const(StructField(nm, LongType))
        }).map(fs => StructType(fs))
      }
    }

  test("flattenStruct is total and collision-free for random struct schemas") {
    forSamples(genSchema(3), 25) { schema =>
      val df = spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
      val flat = CoreOps.flattenStruct(df)
      val leaves = {
        def count(s: StructType): Int = s.fields.map {
          case StructField(_, t: StructType, _, _) => count(t)
          case _ => 1
        }.sum
        count(schema)
      }
      assert(flat.columns.length == leaves)
      // collision-free: every flattened name unique (distinct field names
      // per level guarantee unique paths; "_" joins could collide only if
      // a field name itself embeds a parent path, which genSchema avoids)
      assert(flat.columns.distinct.length == flat.columns.length)
      assert(flat.schema.fields.forall(_.dataType == LongType))
    }
  }

  test("dedup is idempotent and equals set-distinct") {
    forSamples(Gen.listOf(Gen.choose(0, 20)), 10) { xs =>
      val df = xs.toDF("v")
      val once = CoreOps.dedup(df)
      assert(once.count() == xs.toSet.size)
      assert(CoreOps.dedup(once).count() == xs.toSet.size)
    }
  }

  test("unionAll then distinct equals set union") {
    forSamples(Gen.zip(Gen.listOf(Gen.choose(0, 50)), Gen.listOf(Gen.choose(0, 50))), 10) { case (a, b) =>
      val got = a.toDF("v").unionAll(b.toDF("v")).distinct()
        .as[Int].collect().toSet
      assert(got == (a.toSet union b.toSet))
    }
  }

  test("msToDate agrees with java.time UTC for arbitrary epochs") {
    forSamples(Gen.choose(0L, 4102444800000L), 20) { ms =>
      val got = Seq(ms).toDF("ms").select(CoreOps.msToDate(col("ms"))).as[String].head()
      val expected = java.time.Instant.ofEpochMilli(ms)
        .atZone(java.time.ZoneOffset.UTC).toLocalDate.toString
      assert(got == expected)
    }
  }

  test("chunks reassemble to the original string for any width (lossless packing)") {
    val gen = for {
      s <- Gen.listOf(Gen.alphaNumChar).map(_.mkString)
      w <- Gen.choose(1, 16)
    } yield (s, w)
    forSamples(gen, 30) { case (s, w) =>
      val back = Seq(s).toDF("t")
        .select(concat_ws("", graft.functions.TextOps.chunks(col("t"), w)).as("r"))
        .as[String].head()
      assert(back == s, s"w=$w len=${s.length}")
      // every chunk except the last is exactly w wide
      val cs = Seq(s).toDF("t")
        .select(graft.functions.TextOps.chunks(col("t"), w)).as[Seq[String]].head()
      assert(cs.dropRight(1).forall(_.length == w))
      assert(cs.forall(_.nonEmpty))
    }
  }

  test("LangIdNgram / StringChunks byte-walks match code-point references " +
      "on multi-byte text") {
    // the r15 O(len)-per-doc rewrites walk UTF-8 lead bytes directly —
    // pin them against straightforward Java code-point windowing on
    // strings mixing 1-, 2-, 3-, and 4-byte (astral) characters
    import org.apache.spark.unsafe.types.UTF8String
    val cps = Seq("a", "b", "é", "ß", "中", "文", "😀", "🚀")
    val genS = Gen.choose(0, 40).flatMap(k => Gen.listOfN(k, Gen.oneOf(cps)))
      .map(_.mkString)
    val n = 3
    // BMP-only grams (the profile require() validates UTF-16 length)
    val profiles = Seq(
      "l1" -> Seq("abé", "中文a", "aab"),
      "l2" -> Seq("abé", "ßßß", "baa"))
    val expr = graft.functions.LangIdNgram(
      org.apache.spark.sql.catalyst.expressions.Literal("x"), profiles, n)
    def refLang(s: String): String = {
      val cp = s.codePoints().toArray
      val sets = profiles.map(_._2.toSet)
      val counts = Array.fill(profiles.size)(0L)
      for (i <- 0 to cp.length - n; j <- sets.indices)
        if (sets(j).contains(new String(cp, i, n))) counts(j) += 1
      val best = counts.zipWithIndex.foldLeft((-1, 0L)) {
        case ((bi, bs), (c, i)) => if (c > bs) (i, c) else (bi, bs)
      }._1
      if (best < 0) "und" else profiles(best)._1
    }
    def refChunks(s: String, w: Int): Seq[String] = {
      val cp = s.codePoints().toArray
      cp.grouped(w).map(g => new String(g, 0, g.length)).toSeq
    }
    forSamples(Gen.zip(genS, Gen.choose(1, 5)), 60) { case (s, w) =>
      assert(expr.compute(UTF8String.fromString(s)).toString == refLang(s),
        s"lang s='$s'")
      val got = graft.functions.StringChunks
        .compute(UTF8String.fromString(s), w)
      val gotSeq = (0 until got.numElements())
        .map(i => got.get(i, StringType).toString)
      assert(gotSeq == refChunks(s, w), s"chunks s='$s' w=$w")
    }
  }

  test("mergeIntervals: any batch split equals one-shot; covered matches brute force") {
    import graft.streaming.StreamingOps.mergeIntervals
    val genIvs = Gen.listOf(for {
      s <- Gen.choose(0L, 60L); len <- Gen.choose(0L, 12L)
    } yield (s, s + len))
    forSamples(Gen.zip(genIvs, Gen.choose(1, 5), Gen.choose(0L, 999L)), 15) {
      case (ivs, nBatches, splitSeed) =>
        val oneShot = mergeIntervals(Array.empty, ivs)
        // deterministic pseudo-random batch assignment
        val batches = ivs.zipWithIndex
          .groupBy { case (_, i) => (i * 2654435761L + splitSeed) % nBatches }
          .toSeq.sortBy(_._1).map(_._2.map(_._1))
        val folded = batches.foldLeft(Array.empty[Long])(mergeIntervals(_, _))
        assert(folded.toSeq == oneShot.toSeq,
          s"split of $ivs into $batches diverged: ${folded.toSeq} vs ${oneShot.toSeq}")
        // islands are gapless, strictly ordered/disjoint, and their
        // sizes sum to the brute-force covered-day count. (Adjacent
        // islands — [1,5],[6,9] — stay SEPARATE: the merge rule is
        // overlap-or-same-day-touch, exactly the batch query's
        // st > prevMax island flag, not day-adjacency.)
        val days = ivs.flatMap { case (s, e) => s to e }.toSet
        val covered = oneShot.grouped(2).map(a => a(1) - a(0) + 1).sum
        assert(covered == days.size)
        assert(oneShot.grouped(2).forall(a => (a(0) to a(1)).forall(days.contains)),
          s"islands ${oneShot.toSeq} have uncovered gaps vs $days")
        assert(oneShot.grouped(2).map(_(0)).toSeq.zip(
          oneShot.grouped(2).map(_(1)).toSeq.dropRight(1).prepended(Long.MinValue))
          .forall { case (s, prevE) => s > prevE },
          s"islands ${oneShot.toSeq} overlap or are unsorted")
    }
  }

  test("hashSample selection is deterministic and partitioning-invariant") {
    forSamples(Gen.choose(1, 9999), 5) { salt =>
      val base = spark.range(2000).toDF("id")
      def picked(parts: Int): Seq[Long] = base.repartition(parts)
        .filter(CoreOps.hashSample(col("id"), lit(salt.toString)))
        .as[Long].collect().sorted.toSeq
      val p1 = picked(1)
      assert(p1 == picked(7) && p1 == picked(32))
      assert(p1.nonEmpty && p1.size < 2000)
    }
  }

  // r11 kernel parity as PROPERTIES: the sample-based spec files pin the
  // known edge cases; these drive the native kernels against the column
  // spellings they replaced over random unicode-bearing inputs.

  private val tokenGen: Gen[String] = Gen.frequency(
    8 -> Gen.choose(1, 10).flatMap(n => Gen.listOfN(n, Gen.alphaNumChar)).map(_.mkString),
    1 -> Gen.const(""), // split on double spaces produces empty tokens
    1 -> Gen.oneOf("ünïcode", "日本語", "emoji😀x", "a-b_c"))
  private val textGen: Gen[String] =
    Gen.choose(0, 25).flatMap(n => Gen.listOfN(n, tokenGen)).map(_.mkString(" "))

  test("graft_md5_top32 / graft_weight_sum match their column spellings for random text") {
    import graft.functions.TextOps
    forSamples(Gen.listOfN(40, textGen), 4) { texts =>
      val df = texts.toDF("t")
      def hexTop32(h: org.apache.spark.sql.Column) = (1 to 8).map { i =>
        val a = ascii(substring(h, i, 1))
        (a - when(a >= 97, 87).otherwise(48)).cast(LongType) * lit(1L << (4 * (8 - i)))
      }.reduce(_ + _)
      def weight(tk: org.apache.spark.sql.Column) =
        hexTop32(md5(concat(lit("w:"), tk))) % lit(2001L) - lit(1000L)
      val toks = split(col("t"), " ")
      val r = df.select(
        call_function("graft_md5_top32", col("t")).as("m"),
        hexTop32(md5(col("t"))).as("mh"),
        call_function("graft_weight_sum", toks).as("w"),
        aggregate(toks, lit(0L), (acc, tk) => acc + weight(tk)).as("wh")).collect()
      r.foreach { row =>
        assert(row.getLong(0) == row.getLong(1), row)
        assert(row.getLong(2) == row.getLong(3), row)
      }
    }
  }

  test("audioFingerprint: gain invariance and whole-frame-extension stability") {
    import graft.multimodal.MultimodalOps
    // deviations stay in [-31, 31] so a x4 gain never clips u8 range
    val devGen = Gen.listOfN(200, Gen.choose(-31, 31))
    forSamples(devGen, 30) { devs =>
      val samples = devs.map(d => (128 + d).toByte).toArray
      val (nBits, sig) = MultimodalOps.audioFingerprint(samples)
      // frame count math
      assert(nBits == math.min(31, math.max(samples.length / 32 - 1, 0)))
      // uniform positive gain scales every frame energy equally ->
      // every strict comparison (and so the signature) is preserved
      for (g <- Seq(2, 4)) {
        val scaled = samples.map(b => (128 + g * ((b & 0xff) - 128)).toByte)
        assert(MultimodalOps.audioFingerprint(scaled) == ((nBits, sig)),
          s"gain x$g changed the signature")
      }
      // appending WHOLE frames only appends bits: the existing prefix
      // of the signature is untouched (earlier frame energies are
      // position-local)
      val extended = samples ++ Array.fill(64)(140.toByte)
      val (nBits2, sig2) = MultimodalOps.audioFingerprint(extended)
      assert(nBits2 >= nBits)
      if (nBits > 0)
        assert((sig2 & ((1L << nBits) - 1)) == sig,
          s"extension rewrote existing bits: $sig -> $sig2")
    }
  }

  test("labelPropagation: every label stays inside its connected component") {
    import graft.operators.GraphOps
    val edgeGen = for {
      n <- Gen.choose(5, 14)
      m <- Gen.choose(3, 20)
      es <- Gen.listOfN(m, for {
        a <- Gen.choose(0L, n.toLong - 1)
        b <- Gen.choose(0L, n.toLong - 1) if a != b
      } yield (a, b))
    } yield (n, es)
    forSamples(edgeGen, 6) { case (n, es) =>
      val und = es.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      val nodes = (0L until n.toLong).toDF("id")
      val labels = GraphOps.labelPropagation(nodes, und.toDF("src", "dst"),
        iters = 3).as[(Long, Long)].collect().toMap
      assert(labels.keySet == (0L until n.toLong).toSet, "node set changed")
      // component map from the independently-implemented CC operator;
      // isolated nodes (absent from edges) are their own component
      val comp = GraphOps.connectedComponents(und.toDF("src", "dst"))
        .as[(Long, Long)].collect().toMap
      labels.foreach { case (node, label) =>
        val cn = comp.getOrElse(node, node)
        val cl = comp.getOrElse(label, label)
        assert(cl == cn,
          s"node $node (component $cn) took label $label from component $cl")
      }
    }
  }

  test("incrementalCCStep over any batch split equals one-shot batch CC") {
    import graft.streaming.StreamingOps
    // random multigraphs over a small vertex domain (forces merges,
    // self-loops, replays and singleton registrations), split into 1-4
    // batches: folding the batches through the incremental step must
    // land on EXACTLY the assignment batch CC computes on all edges
    val edgeGen = for {
      n <- Gen.choose(1, 25)
      edges <- Gen.listOfN(n, for {
        u <- Gen.choose(0L, 14L)
        v <- Gen.choose(0L, 14L) // u == v allowed: vertex registration
      } yield (u, v))
      cuts <- Gen.choose(1, 4)
    } yield (edges, cuts)
    forSamples(edgeGen, 5) { case (edges, cuts) =>
      val dir = java.nio.file.Files.createTempDirectory("graft_icc_prop").toString
      val statePath = s"$dir/state"
      val per = math.max(1, edges.length / cuts)
      edges.grouped(per).foreach { batch =>
        StreamingOps.incrementalCCStep(batch.toDF("u", "v"), statePath)
      }
      val incremental = graft.sources.StagedSink
        .readCommitted(spark, statePath).as[(Long, Long)].collect().toMap
      val nonSelf = edges.filter { case (u, v) => u != v }
      val batchCC =
        if (nonSelf.isEmpty) Map.empty[Long, Long]
        else graft.operators.GraphOps
          .connectedComponents(nonSelf.toDF("u", "v"))
          .as[(Long, Long)].collect().toMap
      // batch CC never emits self-loop-only vertices; the incremental
      // step registers them as singletons — fold them into the expected
      val selfOnly = edges.collect { case (u, v) if u == v => u }
        .filterNot(batchCC.contains)
      val expected = batchCC ++ selfOnly.map(v => v -> v).toMap
      assert(incremental == expected,
        s"edges=$edges cuts=$cuts\nincremental=$incremental\nexpected=$expected")
    }
  }

  test("connectivity-mode dedup edges give the same clusters as all-pairs on random clone corpora") {
    import graft.operators.{DedupOps, GraphOps}
    // random corpora with planted duplication: a pool of random texts,
    // each doc drawing one (so clone groups of arbitrary size arise),
    // at a random threshold — CC over connectivity edges must equal CC
    // over the full pair set on every draw (the r18 star-rewrite
    // contract, beyond DedupSpec's hand-built fixture)
    val word = Gen.choose(1, 4).flatMap(n =>
      Gen.listOfN(n, Gen.alphaLowerChar)).map(_.mkString)
    val text = Gen.choose(0, 7).flatMap(n =>
      Gen.listOfN(n, word)).map(_.mkString(" "))
    val corpus = for {
      nTexts <- Gen.choose(1, 6)
      pool <- Gen.listOfN(nTexts, text)
      nDocs <- Gen.choose(1, 25)
      picks <- Gen.listOfN(nDocs, Gen.choose(0, nTexts - 1))
      t <- Gen.oneOf(0.05, 0.3, 0.7, 1.0)
    } yield (picks.zipWithIndex.map { case (p, i) => (i.toLong, pool(p)) }, t)
    forSamples(corpus, 8) { case (docs, t) =>
      val d = docs.toDF("doc_id", "text")
      def clusters(pairs: org.apache.spark.sql.DataFrame) =
        GraphOps.dupClusters(pairs).collect()
          .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      val conn = clusters(DedupOps.ngramJaccardConnectivityEdges(
        d, "doc_id", "text", t, collapseBelow = 1.1)) // force collapse
      val plain = clusters(DedupOps.ngramJaccardPairs(d, "doc_id", "text", t))
      assert(conn == plain, s"t=$t docs=$docs\nconn=$conn\nplain=$plain")
    }
  }

  test("graft_shingles / graft_lang_ngram match their HOF spellings for random text") {
    import graft.functions.TextOps
    forSamples(Gen.listOfN(40, textGen), 4) { texts =>
      val df = texts.toDF("t")
      val r = df.select(
        TextOps.shingles(col("t"), 3).as("s"),
        TextOps.shinglesHof(col("t"), 3).as("sh"),
        TextOps.shingles(col("t"), 2).as("b"),
        TextOps.shinglesHof(col("t"), 2).as("bh"),
        TextOps.langIdNgram(col("t")).as("l"),
        TextOps.langIdNgramHof(col("t")).as("lh")).collect()
      r.foreach { row =>
        assert(row.getSeq[String](0) == row.getSeq[String](1), row)
        assert(row.getSeq[String](2) == row.getSeq[String](3), row)
        assert(row.getString(4) == row.getString(5), row)
      }
    }
  }
}
