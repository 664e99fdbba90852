package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** How many of the table's buckets a pruned read actually opened —
  * the observable the pruning specs and the stress tool assert on
  * (files skipped is the quantity that matters at 100 TB; "it was
  * fast locally" is not evidence). */
final case class PruneReport(bucketsTotal: Int, bucketsKept: Int) {
  def skipped: Int = bucketsTotal - bucketsKept
}

/** Per-column zone-map entry for one bucket: min/max in a canonical
  * encoding, plus a tag that pins the comparison domain.
  *
  *  - `num` — numeric domain (ints/decimals/floats, timestamps as
  *    epoch micros, dates as epoch days, booleans as 0/1); min/max
  *    are `BigDecimal.toPlainString` canonical strings.
  *  - `str` — string domain; min/max compared as unsigned UTF-8
  *    bytes, which is EXACTLY Spark's `UTF8String` ordering (a Java
  *    `String.compareTo` would disagree on supplementary characters
  *    and silently mis-prune).
  *  - `nul` — the bucket's column is entirely NULL. Provably
  *    prunable for any range predicate: `BETWEEN` never matches NULL.
  *  - `any` — stats could not bound the bucket (e.g. a NaN/Infinity
  *    landed in a float column, whose ordering the canonical decimal
  *    encoding can't carry). Never pruned — the safe direction.
  *
  * `bloom` (when present) is a base64 per-bucket bloom filter over the
  * column's EXACT canonical strings — the membership half of the zone
  * map. On a hash-bucketed layout min/max can't prune point predicates
  * (every bucket spans the domain); the bloom can, with one-sided
  * error in the safe direction. Built only for domains whose canonical
  * string is exact on both sides (integrals, projected dates and
  * timestamps, booleans, strings — NOT float/double/decimal, whose
  * engine-side string casts don't normalize).
  */
final case class ColStats(tag: String, min: Option[String],
    max: Option[String], bloom: Option[String] = None)

/** Zone maps for the bucketed table store ([[ParquetTableStore]]):
  * computation (one touched-bucket-sized aggregation per merge),
  * serialization (tab-separated lines, values base64 so no content
  * byte can collide with the format), and the overlap test behind
  * `readRange` pruning.
  *
  * Scale stance (SCALING.md §Store): per-bucket min/max over a
  * HASH-bucketed layout prunes only columns whose values correlate
  * with the bucket — low-cardinality columns (≲ nBuckets distinct
  * values hash to few buckets) and leading-PK-derived columns do;
  * uniform high-cardinality columns don't (every bucket spans the
  * domain), and the honest fallback there is the `_p_` layout dirs
  * (`readPartitionEq`) or the key-hash point lookup (`readKeys`).
  */
object BucketStats {

  private val B64e = java.util.Base64.getEncoder
  private val B64d = java.util.Base64.getDecoder
  private def enc(s: String): String =
    B64e.encodeToString(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  private def dec(s: String): String =
    new String(B64d.decode(s), java.nio.charset.StandardCharsets.UTF_8)

  /** (projected column, tag) tracking `dt`, or None when the type has
    * no sound canonical ordering here (binary, nested, intervals —
    * those columns are simply not tracked). */
  def statExpr(dt: DataType, c: Column): Option[(Column, String)] = dt match {
    case TimestampType => Some((unix_micros(c), "num"))
    case DateType => Some((datediff(c, lit("1970-01-01")), "num"))
    case BooleanType => Some((c.cast("int"), "num"))
    case _: NumericType => Some((c, "num"))
    case StringType => Some((c, "str"))
    case _ => None
  }

  private def nonFinite(v: Any): Boolean = v match {
    case d: java.lang.Double => d.isNaN || d.isInfinite
    case f: java.lang.Float => f.isNaN || f.isInfinite
    case _ => false
  }

  private def canonical(v: Any): Option[String] = v match {
    case null => None
    case d: java.math.BigDecimal => Some(d.toPlainString)
    case d: scala.math.BigDecimal => Some(d.bigDecimal.toPlainString)
    case n: Number => Some(new java.math.BigDecimal(n.toString).toPlainString)
    case s: String => Some(s)
    case other => Some(other.toString)
  }

  /** Exact-canonical domains: the engine-side `cast(x AS STRING)` of
    * the PROJECTED value equals the driver-side [[encodeEq]] of any
    * matching bound, so bloom membership never mis-prunes. Floats and
    * decimals are excluded (their string casts don't normalize
    * `10` / `10.0` / `10.00`). */
  private def bloomable(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case DateType | TimestampType | BooleanType | StringType => true
    case _ => false
  }

  /** Default per-bucket bloom capacity — ~0.9 KB of sidecar per
    * (bucket, column) per 1k items; saturation past this only raises
    * the false-positive rate (keeps extra buckets), never mis-prunes.
    * SIZE THIS TO THE EXPECTED ROWS-PER-BUCKET (a store ctor knob):
    * a saturated bloom keeps every bucket and the sidecar cost was
    * wasted. At very large per-bucket cardinalities the honest move
    * is more buckets (the store supports any nBuckets) and tracking
    * only the columns actually probed — a 1B-distinct bucket would
    * need ~0.9 GB of bloom, which is no longer metadata. */
  val BloomItems = 8192L

  /** Per-bucket min/max (+ bloom where the domain allows) of `cols`
    * over `df` (which carries the bucket id in `bucketCol`). One hash
    * aggregation + one driver collect of ≤ touched-buckets rows — the
    * only cost a merge pays for stats; the bloom buffers are
    * fixed-size per (group × partition) regardless of cardinality. */
  def compute(df: DataFrame, bucketCol: String, cols: Seq[String],
      bloomItems: Long = BloomItems): Map[Int, Map[String, ColStats]] = {
    val tracked: Seq[(String, Column, String, Boolean)] = cols.flatMap { c =>
      val dt = df.schema(c).dataType
      statExpr(dt, col(c)).map { case (e, tag) => (c, e, tag, bloomable(dt)) }
    }
    if (tracked.isEmpty) return Map.empty
    graft.functions.BloomAgg.register(df.sparkSession)
    val aggs = tracked.flatMap { case (_, e, _, bl) =>
      Seq(min(e), max(e)) ++ (if (bl) Seq(call_function("zone_bloom",
        e.cast("string"), lit(bloomItems))) else Nil)
    }
    df.groupBy(col(bucketCol)).agg(aggs.head, aggs.tail: _*)
      .collect().map { row =>
        val b = row.getInt(0)
        var i = 1
        b -> tracked.map { case (c, _, tag, bl) =>
          val (mn, mx) = (row.get(i), row.get(i + 1)); i += 2
          val bloom = if (bl) {
            val bytes = row.get(i).asInstanceOf[Array[Byte]]; i += 1
            Some(B64e.encodeToString(bytes))
          } else None
          c -> toColStats(tag, mn, mx, bloom)
        }.toMap
      }.toMap
  }

  private def toColStats(tag: String, mn: Any, mx: Any,
      bloom: Option[String]): ColStats =
    if (mn == null && mx == null) ColStats("nul", None, None)
    else if (nonFinite(mn) || nonFinite(mx)) ColStats("any", None, None)
    else ColStats(tag, canonical(mn), canonical(mx), bloom)

  /** Canonical encoding of a caller-supplied range bound, matching
    * what [[statExpr]] projected at write time. */
  def encodeBound(v: Any): (String, String) = v match {
    case t: java.sql.Timestamp =>
      ("num", (Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L).toString)
    case i: java.time.Instant =>
      ("num", (i.getEpochSecond * 1000000L + i.getNano / 1000L).toString)
    case d: java.sql.Date => ("num", d.toLocalDate.toEpochDay.toString)
    case d: java.time.LocalDate => ("num", d.toEpochDay.toString)
    case b: java.lang.Boolean => ("num", if (b) "1" else "0")
    case d: java.math.BigDecimal => ("num", d.toPlainString)
    case d: scala.math.BigDecimal => ("num", d.bigDecimal.toPlainString)
    case n: Number => ("num", new java.math.BigDecimal(n.toString).toPlainString)
    case s: String => ("str", s)
    case other => throw new IllegalArgumentException(
      s"unsupported range bound ${other.getClass.getName}")
  }

  /** Canonical EXACT-match encoding of an equality bound — must
    * reproduce the engine-side `cast(projected AS STRING)` byte-for-
    * byte, so only domains where that's guaranteed are encodable;
    * None → the bloom can't be consulted (range check still applies). */
  def encodeEq(v: Any): Option[String] = v match {
    case t: java.sql.Timestamp =>
      Some((Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L).toString)
    case i: java.time.Instant =>
      Some((i.getEpochSecond * 1000000L + i.getNano / 1000L).toString)
    case d: java.sql.Date => Some(d.toLocalDate.toEpochDay.toString)
    case d: java.time.LocalDate => Some(d.toEpochDay.toString)
    case b: java.lang.Boolean => Some(if (b) "1" else "0")
    case n @ (_: java.lang.Byte | _: java.lang.Short | _: java.lang.Integer |
        _: java.lang.Long) => Some(n.toString)
    case b: java.math.BigInteger => Some(b.toString)
    case s: String => Some(s)
    case _ => None
  }

  /** Can any row of a bucket with stats `cs` satisfy `column = value`?
    * Range check first (shared with BETWEEN), then the bloom when both
    * sides have an exact canonical form. */
  def mayContainEq(cs: ColStats, value: Any): Boolean = {
    val range = encodeBound(value)
    if (!mayOverlap(cs, Some(range), Some(range))) false
    else (cs.bloom, encodeEq(value)) match {
      case (Some(b64), Some(canon)) =>
        graft.functions.BloomAgg.mightContain(B64d.decode(b64), canon)
      case _ => true
    }
  }

  private def cmp(tag: String, a: String, b: String): Int = tag match {
    case "num" => new java.math.BigDecimal(a).compareTo(new java.math.BigDecimal(b))
    case _ =>
      java.util.Arrays.compareUnsigned(
        a.getBytes(java.nio.charset.StandardCharsets.UTF_8),
        b.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  /** Can any row of a bucket with stats `cs` satisfy
    * `column BETWEEN lo AND hi` (each bound optional)? False only
    * when provably not — mismatched domains fail loudly rather than
    * mis-prune. */
  def mayOverlap(cs: ColStats, lo: Option[(String, String)],
      hi: Option[(String, String)]): Boolean = cs.tag match {
    case "nul" => false // BETWEEN never matches NULL
    case "any" => true
    case tag =>
      def check(bound: Option[(String, String)], stat: Option[String],
          keepIf: Int => Boolean): Boolean = bound match {
        case None => true
        case Some((btag, bv)) =>
          require(btag == tag,
            s"range bound domain '$btag' does not match column stats domain '$tag'")
          stat.forall(s => keepIf(cmp(tag, s, bv)))
      }
      check(lo, cs.max, _ >= 0) && check(hi, cs.min, _ <= 0)
  }

  /** One line per (bucket, column):
    * `b<TAB>col<TAB>tag<TAB>min<TAB>max<TAB>bloom`, min/max/col base64
    * and bloom already-base64 (`-` for absent). Sorted for
    * deterministic files. */
  def serialize(stats: Map[Int, Map[String, ColStats]]): String =
    stats.toSeq.sortBy(_._1).flatMap { case (b, byCol) =>
      byCol.toSeq.sortBy(_._1).map { case (c, cs) =>
        s"$b\t${enc(c)}\t${cs.tag}\t${cs.min.map(enc).getOrElse("-")}" +
          s"\t${cs.max.map(enc).getOrElse("-")}\t${cs.bloom.getOrElse("-")}"
      }
    }.mkString("\n")

  def parse(body: String): Map[Int, Map[String, ColStats]] =
    body.split("\n").toSeq.filter(_.nonEmpty).map { line =>
      val Array(b, c, tag, mn, mx, bloom) = line.split("\t", 6)
      (b.toInt, dec(c), ColStats(tag,
        if (mn == "-") None else Some(dec(mn)),
        if (mx == "-") None else Some(dec(mx)),
        if (bloom == "-") None else Some(bloom)))
    }.groupBy(_._1).map { case (b, rows) =>
      b -> rows.map(r => r._2 -> r._3).toMap
    }
}
