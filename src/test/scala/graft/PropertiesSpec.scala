package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.ingest.Ingest
import graft.model.Model
import graft.streaming.CheckoutStream

/** Property-based invariants (SURVEY.md §5.2.3): key idempotency,
  * conservation, all-or-nothing. Drives ScalaCheck generators directly
  * with fixed seeds (the scalatest-scalacheck bridge isn't on the
  * offline classpath) — deterministic, bounded Spark-job count. */
class PropertiesSpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(42L + i)))

  test("segment codec property: arbitrary rows round-trip bit-exactly, pruned or full") {
    import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.types._
    import org.apache.spark.unsafe.types.UTF8String
    import graft.sources.segment.SegmentCodec

    val schema = StructType(Seq(
      StructField("l", LongType), StructField("i", IntegerType),
      StructField("d", DoubleType), StructField("s", StringType),
      StructField("b", BooleanType), StructField("ts", TimestampType),
      StructField("v", ArrayType(FloatType)),
      StructField("bin", BinaryType),
      StructField("dec", DecimalType(12, 2)),
      StructField("big", DecimalType(30, 4)),
      StructField("toks", ArrayType(StringType)),
      StructField("y", ByteType),
      StructField("w", ShortType),
      StructField("st", StructType(Seq(
        StructField("a", IntegerType), StructField("b", StringType)))),
      StructField("mp", MapType(StringType, LongType))))
    val genVal: Gen[Seq[Any]] = for {
      l <- Gen.oneOf(Gen.const(null), Gen.choose(Long.MinValue, Long.MaxValue).map(x => x: Any))
      i <- Gen.oneOf(Gen.const(null), Gen.choose(Int.MinValue, Int.MaxValue).map(x => x: Any))
      d <- Gen.oneOf(Gen.const(null), Gen.oneOf[Any](0.0, -0.0, Double.NaN,
        Double.PositiveInfinity, Double.MinPositiveValue, 3.14))
      s <- Gen.oneOf(Gen.const(null), Gen.oneOf("", "plain", "uniçodé ❤",
        "tabs\tand\nnewlines", "x" * 200).map(x => UTF8String.fromString(x): Any))
      b <- Gen.oneOf(Gen.const(null), Gen.oneOf(true, false).map(x => x: Any))
      ts <- Gen.oneOf(Gen.const(null), Gen.choose(-62135596800000000L, 253402300799000000L).map(x => x: Any))
      v <- Gen.oneOf(Gen.const(null), Gen.listOf(Gen.choose(-1e10f, 1e10f))
        .map(fs => new org.apache.spark.sql.catalyst.util.GenericArrayData(
          fs.map(x => x: Any).toArray): Any))
      bin <- Gen.oneOf(Gen.const(null), Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue))
        .map(bs => bs.toArray: Any))
      dec <- Gen.oneOf(Gen.const(null), Gen.choose(-9999999999L, 9999999999L)
        .map(u => Decimal(u, 12, 2): Any))
      big <- Gen.oneOf(Gen.const(null), Gen.choose(Long.MinValue, Long.MaxValue)
        .map(u => Decimal(new java.math.BigDecimal(
          new java.math.BigInteger(u.toString).multiply(new java.math.BigInteger("1000000")), 4),
          30, 4): Any))
      toks <- Gen.oneOf(Gen.const(null), Gen.listOf(Gen.oneOf("", "a", "uniçodé", "x" * 99))
        .map(ss => new org.apache.spark.sql.catalyst.util.GenericArrayData(
          ss.map(x => UTF8String.fromString(x): Any).toArray): Any))
      y <- Gen.oneOf(Gen.const(null), Gen.choose(Byte.MinValue, Byte.MaxValue).map(x => x: Any))
      w <- Gen.oneOf(Gen.const(null), Gen.choose(Short.MinValue, Short.MaxValue).map(x => x: Any))
      st <- Gen.oneOf(Gen.const(null), for {
        a <- Gen.oneOf(Gen.const(null), Gen.choose(Int.MinValue, Int.MaxValue).map(x => x: Any))
        bb <- Gen.oneOf(Gen.const(null), Gen.oneOf("", "f", "üñí").map(x => UTF8String.fromString(x): Any))
      } yield new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](a, bb)): Any)
      mp <- Gen.oneOf(Gen.const(null), Gen.listOf(
        Gen.zip(Gen.oneOf("k1", "k2", "κ"), Gen.oneOf(Gen.const(null),
          Gen.choose(Long.MinValue, Long.MaxValue).map(x => x: Any))))
        .map { kvs =>
          val dedup = kvs.toMap.toSeq // map keys unique by contract
          new org.apache.spark.sql.catalyst.util.ArrayBasedMapData(
            new org.apache.spark.sql.catalyst.util.GenericArrayData(
              dedup.map(kv => UTF8String.fromString(kv._1): Any).toArray),
            new org.apache.spark.sql.catalyst.util.GenericArrayData(
              dedup.map(_._2).toArray)): Any
        })
    } yield Seq(l, i, d, s, b, ts, v, bin, dec, big, toks, y, w, st, mp)

    val rows = samples(Gen.listOfN(20, genVal), 10).flatten
    assert(rows.size >= 150)

    def writeAll(rs: Seq[Seq[Any]]): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      val out = new DataOutputStream(bos)
      SegmentCodec.writeHeader(out, schema.length)
      rs.foreach { vals =>
        val row = InternalRow.fromSeq(vals)
        schema.fields.zipWithIndex.foreach { case (f, c) =>
          if (row.isNullAt(c)) out.writeBoolean(false)
          else { out.writeBoolean(true); SegmentCodec.writeValue(out, f.dataType, row, c) }
        }
      }
      out.flush(); bos.toByteArray
    }

    def readAll(bytes: Array[Byte], required: StructType): Seq[Seq[Any]] = {
      val it = new SegmentCodec.RowIterator(
        new DataInputStream(new ByteArrayInputStream(bytes)), schema, required)
      val out = Seq.newBuilder[Seq[Any]]
      while (it.hasNext) {
        val r = it.next()
        out += required.fields.indices.map(i =>
          if (r.isNullAt(i)) null else r.get(i, required.fields(i).dataType))
      }
      out.result()
    }

    def cmp(a: Any, b: Any): Boolean = (a, b) match {
      case (null, null) => true
      case (x: Double, y: Double) =>
        java.lang.Double.doubleToLongBits(x) == java.lang.Double.doubleToLongBits(y)
      case (x: Array[Byte], y: Array[Byte]) => java.util.Arrays.equals(x, y)
      case (x: org.apache.spark.sql.catalyst.util.GenericArrayData,
            y: org.apache.spark.sql.catalyst.util.GenericArrayData) =>
        x.array.toSeq == y.array.toSeq
      case (x: org.apache.spark.sql.catalyst.expressions.GenericInternalRow,
            y: org.apache.spark.sql.catalyst.expressions.GenericInternalRow) =>
        x.numFields == y.numFields &&
          x.values.zip(y.values).forall { case (a2, b2) => cmp(a2, b2) }
      case (x: org.apache.spark.sql.catalyst.util.ArrayBasedMapData,
            y: org.apache.spark.sql.catalyst.util.ArrayBasedMapData) =>
        cmp(x.keyArray, y.keyArray) && cmp(x.valueArray, y.valueArray)
      case (x, y) => x == y
    }

    val bytes = writeAll(rows)
    val full = readAll(bytes, schema)
    assert(full.size == rows.size)
    full.zip(rows).foreach { case (got, want) =>
      got.zip(want).foreach { case (g, w) => assert(cmp(g, w), s"$g != $w") }
    }
    // pruned read: only (s, l), in swapped order — byte-skip path for
    // every other column
    val pruned = StructType(Seq(schema("s"), schema("l")))
    val narrow = readAll(bytes, pruned)
    narrow.zip(rows).foreach { case (got, want) =>
      assert(cmp(got(0), want(3)) && cmp(got(1), want(0)))
    }
  }

  test("K1 idempotency: duplicated payload stream yields exactly one key per payload") {
    samples(Gen.listOfN(8, Gen.choose(1, 4)), 5).foreach { custIds =>
      val df = (custIds ++ custIds).map(c => (s"cust-$c", s"payload-$c"))
        .toDF("cust", "payload")
        .select(Ingest.idempotencyKey(col("cust"), col("payload")).as("k"))
      assert(df.distinct().count() === custIds.distinct.size)
    }
  }

  test("ST2 property: delivered/DLQ partition the queue; poison depth sets the pass count") {
    import graft.streaming.RetryLoop
    val gen = for {
      n <- Gen.choose(3, 6)
      mask <- Gen.listOfN(n, Gen.prob(0.4))
      maxA <- Gen.choose(1, 3)
    } yield (mask, maxA)
    samples(gen, 3).zipWithIndex.foreach { case ((mask, maxA), i) =>
      val base = java.nio.file.Files.createTempDirectory(s"graft-retry-prop$i").toString
      val queue = mask.zipWithIndex.map { case (p, k) => (s"k$k", p, 0) }
        .toDF("key", "poison", "attempts")
      queue.write.parquet(s"$base/in/seed")
      val passes = RetryLoop.run(spark, queue.schema, s"$base/in",
        s"$base/delivered", s"$base/dlq", s"$base/ckpt", $"poison", maxA)
      val anyPoison = mask.contains(true)
      // a poison record burns exactly maxAttempts passes; a clean queue drains in one
      assert(passes === (if (anyPoison) maxA else 1))
      val delivered = spark.read.schema(queue.schema).option("recursiveFileLookup", "true")
        .parquet(s"$base/delivered")
        .select($"key", $"attempts").collect().map(r => r.getString(0) -> r.getInt(1)).toMap
      val dead = spark.read.schema(queue.schema).option("recursiveFileLookup", "true")
        .parquet(s"$base/dlq")
        .select($"key", $"attempts").collect().map(r => r.getString(0) -> r.getInt(1)).toMap
      // the two sinks PARTITION the queue: nothing lost, nothing duplicated
      val expectDelivered = mask.zipWithIndex.collect { case (false, k) => s"k$k" -> 1 }.toMap
      val expectDead = mask.zipWithIndex.collect { case (true, k) => s"k$k" -> maxA }.toMap
      assert(delivered === expectDelivered)
      assert(dead === expectDead)
    }
  }

  test("conservation + all-or-nothing: admitted orders never oversell") {
    val orderGen = for {
      n <- Gen.choose(1, 6)
      rows <- Gen.listOfN(n, for {
        o <- Gen.choose(1, 4)
        p <- Gen.oneOf("prod-101", "prod-105")
        q <- Gen.choose(1, 6)
      } yield (s"o-$o", p, q))
    } yield rows

    samples(orderGen, 5).foreach { rows =>
      val stock = Map("prod-101" -> 10, "prod-105" -> 4)
      val lines = rows.toDF("order_id", "product_id", "quantity")
        .groupBy($"order_id", $"product_id").agg(sum($"quantity").as("quantity"))
      val inv = stock.toSeq.toDF("product_id", "stock")
      val verdicts = CheckoutStream.admitOrders(lines, inv)
      val admitted = verdicts.filter($"status" === Model.StatusProcessed).select($"order_id")
      val demand = lines.join(admitted, Seq("order_id"))
        .groupBy($"product_id").agg(sum($"quantity").as("d"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      // conservation: total admitted demand never exceeds stock per product
      demand.foreach { case (p, d) => assert(d <= stock(p), s"oversold $p") }
      // all-or-nothing: every order has exactly one verdict
      assert(verdicts.count() === lines.select($"order_id").distinct().count())
    }
  }

  test("SQ8 property: reconstruction error bounded by half a quantization step per dimension") {
    import graft.ops.Sq
    val vecGen = Gen.listOfN(8, Gen.choose(-100.0f, 100.0f))
    samples(Gen.listOfN(12, vecGen), 3).foreach { vecs =>
      val corpus = vecs.zipWithIndex
        .map { case (v, i) => (i.toLong, v.toArray) }.toDF("vec_id", "embedding")
      val st = Sq.stats(corpus)
      val codes = Sq.encode(corpus, st)
      // |reconstruction - original| <= (mx - mn)/255/2 per dimension:
      // the defining guarantee of affine int8 quantization (floor(x+.5)
      // rounds to the NEAREST code, so error is half a step + ulps)
      val maxErr = corpus.join(codes, Seq("vec_id"))
        .crossJoin(st)
        .select(max(expr(
          """aggregate(
            |  zip_with(embedding, sequence(1, size(codes)), (v, i) ->
            |    abs(cast(v as double) -
            |        (mins[i-1] + cast(codes[i-1] as double) / 255.0 * (maxs[i-1] - mins[i-1]))) -
            |    (maxs[i-1] - mins[i-1]) / 255.0 / 2.0 - 1e-9),
            |  cast(0.0 as double), (acc, x) -> greatest(acc, x))""".stripMargin)))
        .head().getDouble(0)
      assert(maxErr <= 0.0, s"some dimension exceeded half a quantization step by $maxErr")
    }
  }

  test("as-of property: native physical operator ≡ composed window on random keyed frames") {
    // random key/time frames with heavy collision rates (few keys, few
    // distinct times) so equal-timestamp bounds, missing keys and
    // multi-match carries all occur; right side deduped to one row per
    // (key, time) as both formulations require
    val frameGen = for {
      nl <- Gen.choose(0, 40)
      nr <- Gen.choose(0, 40)
      lrows <- Gen.listOfN(nl, for {
        k <- Gen.choose(1, 6); t <- Gen.choose(1L, 20L)
      } yield (s"k$k", t))
      rrows <- Gen.listOfN(nr, for {
        k <- Gen.choose(1, 6); t <- Gen.choose(1L, 20L)
      } yield (s"k$k", t))
    } yield (lrows, rrows)
    samples(frameGen, 8).foreach { case (lrows, rrows) =>
      val left = lrows.zipWithIndex
        .map { case ((k, t), i) => (k, t, s"l$i") }.toDF("k", "t", "lv")
      // deterministic dedup (max rv), NOT dropDuplicates — that keeps
      // an arbitrary row per key and could differ between the two
      // evaluations under comparison
      val right = rrows.zipWithIndex
        .map { case ((k, t), i) => (k, t, s"r$i") }
        .toDF("k", "t", "rv")
        .groupBy(col("k"), col("t")).agg(max(col("rv")).as("rv"))
      val native = graft.plans.AsOfJoinNative
        .asofJoinBackward(left, right, "k", "t", Seq("rv"))
        .orderBy(col("k"), col("t"), col("lv")).collect().toSeq
      val composed = graft.ops.AsOf
        .asofJoinBackward(left, right, "k", "t", Seq("rv"))
        .orderBy(col("k"), col("t"), col("lv")).collect().toSeq
      assert(native == composed,
        s"diverged on |L|=${lrows.size} |R|=${rrows.size}")
    }
  }

  test("bloom property: no false negatives for arbitrary values, across every bloomable type") {
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    import org.apache.spark.sql.types._
    import org.apache.spark.unsafe.types.UTF8String
    import graft.sources.segment.SegmentBloom

    // longs, ints, and adversarial strings (empty, unicode, long)
    val longs = samples(Gen.chooseNum(Long.MinValue, Long.MaxValue), 300)
    val ints = samples(Gen.chooseNum(Int.MinValue, Int.MaxValue), 300)
    val strs = samples(Gen.oneOf(
      Gen.alphaNumStr, Gen.const(""), Gen.const("héllo✓𐐷"),
      Gen.listOfN(200, Gen.alphaChar).map(_.mkString)), 300)

    def check[A](dt: DataType, values: Seq[A], toRow: A => Any, toLit: A => Any): Unit = {
      val bits = new Array[Long](SegmentBloom.DefaultBits / 64)
      values.foreach(v =>
        SegmentBloom.put(bits, SegmentBloom.hashRow(dt, new GenericInternalRow(Array(toRow(v))), 0)))
      val b64 = {
        val bb = java.nio.ByteBuffer.allocate(bits.length * 8)
        bits.foreach(bb.putLong)
        java.util.Base64.getEncoder.encodeToString(bb.array())
      }
      // the bloom contract half that must be EXACT: every written value
      // answers "maybe present" through the literal-side hash
      values.foreach { v =>
        val h = SegmentBloom.hashValue(dt, toLit(v))
        assert(h.isDefined && SegmentBloom.mightContain(b64, h.get),
          s"false negative for $dt value $v")
      }
    }
    check[Long](LongType, longs, identity, identity)
    check[Int](IntegerType, ints, identity, identity)
    check[String](StringType, strs.distinct, UTF8String.fromString, identity)

    // and the probabilistic half stays useful: mostly-absent values are
    // mostly excluded (fpp ~1% at 300 entries / 8192 bits; allow 5%)
    val bits = new Array[Long](SegmentBloom.DefaultBits / 64)
    longs.foreach(v =>
      SegmentBloom.put(bits, SegmentBloom.hashRow(LongType, new GenericInternalRow(Array(v: Any)), 0)))
    val b64 = {
      val bb = java.nio.ByteBuffer.allocate(bits.length * 8)
      bits.foreach(bb.putLong)
      java.util.Base64.getEncoder.encodeToString(bb.array())
    }
    val present = longs.toSet
    val probes = samples(Gen.chooseNum(Long.MinValue, Long.MaxValue), 2000)
      .filterNot(present)
    val fp = probes.count(v =>
      SegmentBloom.mightContain(b64, SegmentBloom.hashValue(LongType, v).get))
    assert(fp.toDouble / probes.size < 0.05,
      s"false-positive rate ${fp.toDouble / probes.size} too high to prune anything")
  }

  test("deletion-vector property: bitmap ops match a Set reference; files round-trip") {
    import graft.sources.segment.DeletionVector
    val posSets: Seq[Seq[Long]] = samples(
      Gen.listOf(Gen.chooseNum(0L, 5000L)), 50).filter(_.nonEmpty)
    posSets.sliding(2).foreach { case Seq(a, b) =>
      val (sa, sb) = (a.toSet, b.toSet)
      val (ba, bb) = (DeletionVector.fromPositions(a), DeletionVector.fromPositions(b))
      assert(DeletionVector.cardinality(ba) == sa.size)
      (0L to 5100L).foreach(p =>
        assert(DeletionVector.contains(ba, p) == sa.contains(p), s"contains($p)"))
      val u = DeletionVector.union(ba, bb)
      assert(DeletionVector.cardinality(u) == (sa ++ sb).size)
      (0L to 5100L).foreach(p =>
        assert(DeletionVector.contains(u, p) == (sa ++ sb).contains(p), s"union($p)"))
      case _ => ()
    }
    // file round-trip through the Hadoop FS face (what tasks do)
    val dir = java.nio.file.Files.createTempDirectory("graft-dv-prop").toString
    val fs = graft.sources.segment.SegmentLog.fs(dir,
      spark.sessionState.newHadoopConf())
    val bits = DeletionVector.fromPositions(posSets.head)
    val p = new org.apache.hadoop.fs.Path(s"$dir/t.dv")
    DeletionVector.write(fs, p, bits)
    assert(DeletionVector.read(fs, p).toSeq == bits.toSeq)
  }

  test("deletion-vector property: filtered columnar decode ≡ reference filter, positions exact") {
    import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.types._
    import org.apache.spark.unsafe.types.UTF8String
    import graft.sources.segment.{DeletionVector, SegmentCodec}

    val schema = StructType(Seq(
      StructField("l", LongType), StructField("i", IntegerType),
      StructField("s", StringType)))
    val genVal: Gen[Seq[Any]] = for {
      l <- Gen.oneOf(Gen.const(null), Gen.chooseNum(Long.MinValue, Long.MaxValue).map(x => x: Any))
      i <- Gen.oneOf(Gen.const(null), Gen.chooseNum(Int.MinValue, Int.MaxValue).map(x => x: Any))
      s <- Gen.oneOf(Gen.const(null), Gen.oneOf("", "plain", "uniçodé ❤", "x" * 50)
        .map(x => UTF8String.fromString(x): Any))
    } yield Seq(l, i, s)
    val rows: Seq[Seq[Any]] = samples(Gen.listOfN(40, genVal), 5).flatten
    val n = rows.size

    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    SegmentCodec.writeHeader(out, schema.length)
    rows.foreach { vals =>
      val row = InternalRow.fromSeq(vals)
      schema.fields.zipWithIndex.foreach { case (f, c) =>
        if (row.isNullAt(c)) out.writeBoolean(false)
        else { out.writeBoolean(true); SegmentCodec.writeValue(out, f.dataType, row, c) }
      }
    }
    out.close()
    val bytes = bos.toByteArray

    val deleted = samples(Gen.chooseNum(0, n - 1), 120).map(_.toLong).distinct
    val onlySet = samples(Gen.chooseNum(0, n - 1), 150).map(_.toLong).distinct
    val required = StructType(schema.fields :+ StructField("_pos", LongType))

    def decode(skip: Seq[Long], only: Option[Seq[Long]]): Seq[(Any, Any, Any, Long)] = {
      val in = new DataInputStream(new ByteArrayInputStream(bytes))
      SegmentCodec.readHeader(in, schema.length)
      val skipBits = if (skip.isEmpty) null else DeletionVector.fromPositions(skip)
      val onlyBits = only.map(DeletionVector.fromPositions).orNull
      val acc = Seq.newBuilder[(Any, Any, Any, Long)]
      var pos = 0L
      var r = -1
      // deliberately tiny batches: batch boundaries and position
      // threading are exactly what this certifies
      while (r != 0) {
        val vectors = org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
          .allocateColumns(7, required)
          .map(v => v: org.apache.spark.sql.execution.vectorized.WritableColumnVector)
        val (r0, p0) = SegmentCodec.readBatchLive(in, schema, required, vectors, 7,
          pos, skipBits, onlyBits, 3)
        r = r0; pos = p0
        (0 until r).foreach { k =>
          acc += ((
            if (vectors(0).isNullAt(k)) null else vectors(0).getLong(k),
            if (vectors(1).isNullAt(k)) null else vectors(1).getInt(k),
            if (vectors(2).isNullAt(k)) null else vectors(2).getUTF8String(k).toString,
            vectors(3).getLong(k)))
        }
        vectors.foreach(_.close())
      }
      in.close()
      acc.result()
    }

    def reference(skip: Seq[Long], only: Option[Seq[Long]]): Seq[(Any, Any, Any, Long)] =
      rows.zipWithIndex.collect {
        case (vals, idx)
            if !skip.contains(idx.toLong) && only.forall(_.contains(idx.toLong)) =>
          (vals(0), vals(1),
            Option(vals(2)).map(_.asInstanceOf[UTF8String].toString).orNull,
            idx.toLong)
      }

    assert(decode(Nil, None) == reference(Nil, None), "unfiltered decode drifted")
    assert(decode(deleted, None) == reference(deleted, None), "skip-filtered decode drifted")
    assert(decode(deleted, Some(onlySet)) == reference(deleted, Some(onlySet)),
      "skip+emitOnly decode drifted (the change feed's delta face)")
    assert(decode(deleted, None).size == n - deleted.size)
  }

  test("salted-aggregation property: two-phase merge ≡ plain groupBy on random frames") {
    import graft.ops.Skew
    // random skew profiles, null rates, and fan-outs: the partial/
    // merge algebra must be EXACT for every supported function on
    // every draw — the generative form of the rel_agg_autosalt pin
    val genCase = for {
      nRows <- Gen.choose(50, 400)
      nKeys <- Gen.choose(1, 8)
      hotShare <- Gen.choose(0, 90) // percent of rows on key 0
      nullPct <- Gen.choose(0, 30)
      salts <- Gen.choose(1, 23)
    } yield (nRows, nKeys, hotShare, nullPct, salts)
    samples(genCase, 6).foreach { case (nRows, nKeys, hotShare, nullPct, salts) =>
      val df = spark.range(0, nRows).select(
        when(col("id") % 100 < hotShare, lit(0L))
          .otherwise(col("id") % nKeys).as("k"),
        when(col("id") % 100 < nullPct, lit(null))
          .otherwise(col("id") * 7 - nRows).as("v"),
        (col("id") % 13).as("u"))
      val plain = df.groupBy(col("k")).agg(
        sum(col("v")).as("s"), count(col("v")).as("c"), count(lit(1)).as("n"),
        min(col("v")).as("mn"), max(col("v")).as("mx"),
        (sum(col("v")).cast("double") / count(col("v"))).as("a"))
      val salted = Skew.saltedAgg(df, "k", salts, Seq(
        ("sum", "v", "s"), ("count", "v", "c"), ("count", "*", "n"),
        ("min", "v", "mn"), ("max", "v", "mx"), ("avg", "v", "a")))
      assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty,
        s"saltedAgg drifted at rows=$nRows keys=$nKeys hot=$hotShare% " +
          s"nulls=$nullPct% salts=$salts")
      val plainD = df.groupBy(col("k")).agg(count_distinct(col("u")).as("nd"))
      val saltedD = Skew.saltedCountDistinct(df, "k", "u", salts, "nd")
      assert(saltedD.exceptAll(plainD).isEmpty && plainD.exceptAll(saltedD).isEmpty,
        s"saltedCountDistinct drifted at salts=$salts")
    }
  }

  test("salted-join property: derived-fanout join ≡ plain join row multiset on random frames") {
    import graft.ops.Skew
    val genCase = for {
      nFact <- Gen.choose(100, 500)
      nKeys <- Gen.choose(2, 12)
      hotShare <- Gen.choose(10, 95)
      salts <- Gen.choose(1, 17)
      dupDim <- Gen.oneOf(1, 2) // dim key multiplicity must be preserved
    } yield (nFact, nKeys, hotShare, salts, dupDim)
    samples(genCase, 6).foreach { case (nFact, nKeys, hotShare, salts, dupDim) =>
      val fact = spark.range(0, nFact).select(
        when(col("id") % 100 < hotShare, lit(1L))
          .otherwise(col("id") % nKeys).as("k"),
        col("id").as("v"))
      val dim = spark.range(0, nKeys.toLong * dupDim)
        .select((col("id") % nKeys).as("k"), (col("id") * 11).as("w"))
      val plain = fact.join(dim, Seq("k"))
      val salted = Skew.saltedJoin(fact, dim, "k", salts)
        .select(plain.columns.map(col): _*)
      assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty,
        s"saltedJoin drifted at fact=$nFact keys=$nKeys hot=$hotShare% " +
          s"salts=$salts dupDim=$dupDim")
      // r18 forms under the same random draws: COMPOSITE key (second
      // key k2 = v % 3 on both sides — each qualifying pair must
      // still meet exactly once) and FACT-PRESERVING LEFT (dim
      // truncated so some keys miss — every unmatched fact row must
      // null-extend exactly once, whatever the fan-out)
      val factC = fact.withColumn("k2", col("v") % 3)
      val dimC = dim.crossJoin(spark.range(0, 3).select(col("id").as("k2")))
      val plainC = factC.join(dimC, Seq("k", "k2"))
      val saltedC = Skew.saltedJoin(factC, dimC, Seq("k", "k2"), salts)
        .select(plainC.columns.map(col): _*)
      assert(saltedC.exceptAll(plainC).isEmpty && plainC.exceptAll(saltedC).isEmpty,
        s"composite saltedJoin drifted at fact=$nFact keys=$nKeys " +
          s"hot=$hotShare% salts=$salts dupDim=$dupDim")
      val dimMiss = dim.filter(col("k") % 2 === 0)
      val plainL = fact.join(dimMiss, Seq("k"), "left")
      val saltedL = Skew.saltedJoin(fact, dimMiss, Seq("k"), salts, "left")
        .select(plainL.columns.map(col): _*)
      assert(saltedL.exceptAll(plainL).isEmpty && plainL.exceptAll(saltedL).isEmpty,
        s"left saltedJoin drifted at fact=$nFact keys=$nKeys " +
          s"hot=$hotShare% salts=$salts dupDim=$dupDim")
    }
  }
}
