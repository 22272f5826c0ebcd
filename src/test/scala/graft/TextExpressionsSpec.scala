package graft

import org.apache.spark.sql.functions._
import graft.functions.{Functions, RollingFingerprint}

class TextExpressionsSpec extends SparkTestBase {

  test("rolling_fingerprint: deterministic, content-sensitive") {
    import spark.implicits._
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "the quick brown fox jumps over the lazy cat")
    ).toDF("id", "t")
    val fps = df
      .select($"id", Functions.rollingFingerprint($"t", lit(0)).as("fp"))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(fps(1L) === fps(2L)) // identical content, identical fingerprint
    assert(fps(1L) !== fps(3L)) // one byte changed, fingerprint changed
  }

  test("MinHashSignature.compute: property-equal to the reference fold on random arrays") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val seeds = graft.functions.MinHashSignature.seeds(64)
    val gen = Gen.nonEmptyListOf(Gen.long)
    (0 until 200).foreach { i =>
      val hashes = gen(Gen.Parameters.default, Seed(i.toLong)).get
      val arr = new org.apache.spark.sql.catalyst.util.GenericArrayData(hashes.toArray)
      val fast = graft.functions.MinHashSignature.compute(arr, seeds)
      // reference: family-major min over hashLong(h, hashInt(j, 42)) — the
      // exact chain Spark's xxhash64(lit(j), h) computes
      val slow = (0 until 64).map { j =>
        hashes.map(h =>
          org.apache.spark.sql.catalyst.expressions.XXH64
            .hashLong(h, seeds(j))).min
      }
      assert(fast.toSeq === slow, s"mismatch at seed $i")
    }
    // empty array -> null (array_min-of-empty parity)
    val empty = new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Long])
    assert(graft.functions.MinHashSignature.compute(empty, seeds) == null)

    // a NULL element contributes seeds(j) — what the composed
    // xxhash64(lit(j), null) yields (null children skipped, hash = j-mix)
    val withNull = new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Array[Any](7L, null, 99L))
    val got = graft.functions.MinHashSignature.compute(withNull, seeds).toSeq
    val want = (0 until 64).map { j =>
      Seq(
        org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(7L, seeds(j)),
        seeds(j),
        org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(99L, seeds(j))
      ).min
    }
    assert(got === want)
  }

  test("windowed mode: shared windows survive a prefix insertion") {
    // winnowing property: appending a prefix adds windows but every window
    // of the original text still exists, so the min can only go down
    val base = "abcdefghijklmnopqrstuvwxyz0123456789abcdefghijklmnop"
    val shifted = "PREFIX-" + base
    val w = 16
    val fpBase = RollingFingerprint.compute(base.getBytes("UTF-8"), w)
    val fpShifted = RollingFingerprint.compute(shifted.getBytes("UTF-8"), w)
    assert(fpShifted <= fpBase)
    // and the eval agrees with the SQL surface
    import spark.implicits._
    val viaSql = Seq(base).toDF("t")
      .select(Functions.rollingFingerprint($"t", lit(w)))
      .head().getLong(0)
    assert(viaSql === fpBase)
  }

  test("null-preserving; whole-string mode matches direct eval") {
    import spark.implicits._
    val df = Seq(Option("abc"), None).toDF("t")
    val rows = df.select(Functions.rollingFingerprint($"t", lit(0))).collect()
    assert(rows(0).getLong(0) === RollingFingerprint.compute("abc".getBytes("UTF-8"), 0))
    assert(rows(1).isNullAt(0))
  }

  test("SQL registration") {
    import spark.implicits._
    session.registerTable("fp_t", Seq("hello world").toDF("t"))
    val r = session.execute("SELECT rolling_fingerprint(t, 0) FROM fp_t").head()
    assert(r.getLong(0) === RollingFingerprint.compute("hello world".getBytes("UTF-8"), 0))
  }

  test("max_token_freq: equals the composed HOF form on random arrays; edge semantics") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (0 until 200).map { i =>
      val n = rnd.nextInt(60)
      (i.toLong, (0 until n).map(_ => s"t${rnd.nextInt(12)}").mkString(" "))
    }
    val df = rows.toDF("id", "text")
      .select($"id", split($"text", " ").as("ws"))
    val both = df.select(
      $"id",
      graft.functions.Functions.maxTokenFreq($"ws").as("native"),
      expr("array_max(transform(array_distinct(ws), " +
        "t -> size(filter(ws, x -> x = t))))").cast("bigint").as("composed"))
      .collect()
    both.foreach { r =>
      // composed form yields null on empty arrays; native yields 0
      val composed = if (r.isNullAt(2)) 0L else r.getLong(2)
      // split("") = [""] so "empty text" still has one token both ways
      assert(r.getLong(1) === composed, s"row ${r.getLong(0)}")
    }
    // null input -> null; null elements skipped; SQL registration works
    val edge = session.execute(
      "SELECT max_token_freq(CAST(NULL AS ARRAY<STRING>)), " +
        "max_token_freq(array('a', CAST(NULL AS STRING), 'a')), " +
        "max_token_freq(CAST(array() AS ARRAY<STRING>))").head()
    assert(edge.isNullAt(0))
    assert(edge.getLong(1) === 2L)
    assert(edge.getLong(2) === 0L)
  }

  test("word_shingles: bit-equal to the composed HOF form, incl. repeats and short docs") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // small vocab forces REPEATED shingles (the dedup-relevant case) and
    // lengths straddle every n: 0,1,2 tokens for n=3 = empty both ways
    val rows = (0 until 300).map { i =>
      val nTok = rnd.nextInt(12)
      (i.toLong, (0 until nTok).map(_ => s"w${rnd.nextInt(4)}").mkString(" "))
    }
    for (n <- Seq(3, 8)) {
      val df = rows.toDF("id", "text")
        .select($"id", graft.operators.TextOps.tokens($"text").as("ws"))
        .filter(size($"ws") >= n)
        .select(
          $"id",
          graft.operators.TextOps.shingles($"ws", n).as("native"),
          graft.operators.TextOps.shinglesComposed($"ws", n).as("composed"))
        .collect()
      assert(df.nonEmpty)
      df.foreach { r =>
        assert(r.getSeq[String](1) === r.getSeq[String](2),
          s"n=$n id=${r.getLong(0)}")
      }
    }
    // short doc -> empty; null -> null
    val e = Seq((1L, Seq("a", "b"))).toDF("id", "ws")
      .select(graft.operators.TextOps.shingles($"ws", 3)).head()
    assert(e.getSeq[String](0) === Seq.empty)

    // non-ASCII tokens (multi-byte UTF-8, incl. astral plane): the native
    // byte-level concat must equal the composed string concat exactly
    val uni = Seq((1L, Seq("héllo", "wörld", "日本語", "𝕩", "é", "ß", "ю"))).toDF("id", "ws")
      .select(
        graft.operators.TextOps.shingles($"ws", 3).as("native"),
        graft.operators.TextOps.shinglesComposed($"ws", 3).as("composed"))
      .head()
    assert(uni.getSeq[String](0) === uni.getSeq[String](1))
    assert(uni.getSeq[String](0).head === "héllo wörld 日本語")
  }

  test("count_tokens_in: equals the composed filter+size form (occurrences, not distinct)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val stop = graft.operators.TextOps.stopwords("en")
    val vocab = stop ++ Seq("alpha", "beta", "gamma")
    val rows = (0 until 200).map { i =>
      (i.toLong, (0 until rnd.nextInt(40)).map(_ => vocab(rnd.nextInt(vocab.size))))
    }
    val both = rows.toDF("id", "ws")
      .select(
        $"id",
        graft.operators.TextOps.stopwordHits($"ws", stop).as("native"),
        graft.operators.TextOps.stopwordHitsComposed($"ws", stop).as("composed"))
      .collect()
    both.foreach(r => assert(r.getLong(1) === r.getLong(2), s"id=${r.getLong(0)}"))
    assert(both.exists(_.getLong(1) > 0L))
  }

  test("array_xxhash64: bit-equal to transform(xxhash64) element by element") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val rows = (0 until 200).map { i =>
      (i.toLong, (0 until rnd.nextInt(20)).map(_ => s"sh-${rnd.nextInt(1000)}"))
    }
    val both = rows.toDF("id", "sh")
      .select(
        $"id",
        graft.operators.TextOps.shingleHashes($"sh").as("native"),
        transform($"sh", x => xxhash64(x)).as("composed"))
      .collect()
    both.foreach { r =>
      assert(r.getSeq[Long](1) === r.getSeq[Long](2), s"id=${r.getLong(0)}")
    }
  }

  test("bpe_encode: merge-loop semantics, chains, edges; codegen path == direct encode") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import graft.functions.BpeTable
    import graft.operators.BpeTokenizer

    // hand-computed merge algebra: rules apply in rank order, leftmost
    // first, one greedy pass per rule is the fixpoint
    val t1 = new BpeTable(Array(("a", "b"), ("ab", "c")))
    def enc(t: BpeTable, w: String): Seq[String] = t.encodeWord(w).map(_.toString).toSeq
    assert(enc(t1, "abc") === Seq("abc")) // (a,b)->ab then (ab,c)->abc
    assert(enc(t1, "aab") === Seq("a", "ab")) // only one (a,b) site
    assert(enc(t1, "cab") === Seq("c", "ab")) // (ab,c) is ORDERED: no c+ab merge
    assert(enc(t1, "") === Seq.empty)
    val t2 = new BpeTable(Array(("a", "a")))
    assert(enc(t2, "aaaa") === Seq("aa", "aa")) // leftmost chain breaking
    assert(enc(t2, "aaa") === Seq("aa", "a"))
    assert(enc(t2, "aaaaa") === Seq("aa", "aa", "a"))

    // the DataFrame/codegen path produces the same tokens as the direct
    // driver-side encode — and null words inside the array are skipped
    val df = Seq(
      (1L, Seq("abc", "aab")),
      (2L, Seq("", "aaaa")),
      (3L, Seq[String]())
    ).toDF("id", "ws")
    val t3 = new BpeTable(Array(("a", "b"), ("ab", "c"), ("a", "a")))
    val out = df.select($"id", BpeTokenizer.encode($"ws", t3).as("toks"))
      .orderBy($"id").collect()
    assert(out(0).getSeq[String](1) === Seq("abc", "a", "ab"))
    assert(out(1).getSeq[String](1) === Seq("aa", "aa"))
    assert(out(2).getSeq[String](1) === Seq.empty)

    // codepoint symbols: a supplementary character (surrogate pair in
    // UTF-16) is ONE symbol, never two lone surrogates
    val thumb = new String(Character.toChars(0x1F44D))
    val tU = new BpeTable(Array.empty)
    assert(enc(tU, s"a${thumb}b") === Seq("a", thumb, "b"))
    val tM = new BpeTable(Array(("a", thumb)))
    assert(enc(tM, s"a${thumb}b") === Seq(s"a$thumb", "b"))

    // fit: deterministic, frequency-ordered, count>=2 cutoff
    val words = Seq("aba", "aba", "aba", "ab", "xy").toDF("w")
    val fitted = BpeTokenizer.fitMerges(words, "w", nMerges = 8)
    // pair counts: (a,b)=4 occurrences (3x in aba + 1x in ab), (b,a)=3;
    // round 2: (ab,a)=3; (x,y)=1 never clears the cutoff
    assert(fitted.rules.toSeq === Seq(("a", "b"), ("ab", "a")))
    val again = BpeTokenizer.fitMerges(words, "w", nMerges = 8)
    assert(again.rules.toSeq === fitted.rules.toSeq)
  }
}
