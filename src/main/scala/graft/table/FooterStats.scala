package graft.table

import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.io.LocalInputFile
import org.apache.parquet.io.api.Binary
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName

import org.apache.spark.sql.types._

/**
 * Per-file column stats straight from Parquet footers — no data scan, no
 * extra Spark job. This is how writer-side stats reach the manifests in real
 * table formats (the writer already computed them); the previous
 * implementation ran a groupBy(input_file_name) aggregation job per write,
 * which doubled the per-bin job count during compaction and dominated small
 * rewrites (measured: ~2x fewer Spark jobs after the switch).
 *
 * String maxima that hit the footer truncation length are DROPPED (the file
 * becomes unbounded above on that column), so pruning stays sound even on
 * truncated statistics. All string extrema comparisons here and downstream
 * ([[Utf8Ord]]) use unsigned UTF-8 byte order — Parquet's and Spark's own.
 */
object FooterStats {

  private val TruncationGuard = 4000 // bytes; parquet-mr may truncate beyond this

  def read(absPath: String, schema: StructType): Option[DataFileMeta] = {
    // Pure-NIO input file: a fresh Hadoop Configuration per footer costs
    // ~200ms (measured); LocalInputFile reads the footer in ~1ms.
    val p = java.nio.file.Paths.get(absPath)
    val in = new LocalInputFile(p)
    val reader = ParquetFileReader.open(in)
    try {
      val footer = reader.getFooter
      val blocks = footer.getBlocks
      var rows = 0L
      val mins = scala.collection.mutable.Map[String, Any]()
      val maxs = scala.collection.mutable.Map[String, Any]()
      val nulls = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
      // Once ANY row group lacks stats for a column, the column is unbounded
      // for this whole file: a later row group's stats must not re-populate
      // min/max (they would not cover the statless group's rows, and pruning
      // on such bounds silently drops matching rows).
      val unbounded = scala.collection.mutable.Set[String]()
      val statCols = schema.fields.filterNot(_.dataType == BinaryType).map(_.name).toSet
      val it = blocks.iterator()
      while (it.hasNext) {
        val b = it.next()
        rows += b.getRowCount
        val cit = b.getColumns.iterator()
        while (cit.hasNext) {
          val c = cit.next()
          val name = c.getPath.toDotString
          if (statCols.contains(name) && !unbounded.contains(name)) {
            val st: org.apache.parquet.column.statistics.Statistics[_] =
              c.getStatistics
            if (st != null && !st.isEmpty) {
              nulls(name) = nulls(name) + st.getNumNulls
              if (st.hasNonNullValue) {
                val tpe = c.getPrimitiveType.getPrimitiveTypeName
                val mn: Any = st.genericGetMin
                val mx: Any = st.genericGetMax
                mins(name) = mins.get(name).map(combine(_, mn, tpe, min = true)).getOrElse(mn)
                maxs(name) = maxs.get(name).map(combine(_, mx, tpe, min = false)).getOrElse(mx)
              }
            } else {
              unbounded += name
              mins.remove(name); maxs.remove(name); nulls.remove(name)
            }
          }
        }
      }
      if (rows == 0) return None
      val stats = statCols.map { c =>
        if (unbounded.contains(c)) c -> ColStats(None, None, 0L)
        else {
          val mn = mins.get(c).map(render)
          val mx = maxs.get(c).map(render).flatMap(dropIfTruncated)
          c -> ColStats(mn, mx, nulls.getOrElse(c, 0L))
        }
      }.toMap
      Some(DataFileMeta(path = absPath,
        fileSizeBytes = java.nio.file.Files.size(p),
        rowCount = rows, stats = stats))
    } finally reader.close()
  }

  private def combine(a: Any, b: Any, t: PrimitiveTypeName, min: Boolean): Any = {
    def pick[T](x: T, y: T)(implicit o: Ordering[T]): T =
      if (min) o.min(x, y) else o.max(x, y)
    (a, b) match {
      case (x: java.lang.Integer, y: java.lang.Integer) => pick(x.intValue, y.intValue)
      case (x: java.lang.Long, y: java.lang.Long) => pick(x.longValue, y.longValue)
      case (x: java.lang.Double, y: java.lang.Double) => pick(x.doubleValue, y.doubleValue)
      case (x: java.lang.Float, y: java.lang.Float) => pick(x.floatValue, y.floatValue)
      case (x: Binary, y: Binary) =>
        // Pick in unsigned UTF-8 byte order — the SAME ordering Parquet used
        // for its per-block extrema and PruneFilter.mayMatch (via Utf8Ord)
        // now uses for manifest comparisons, so the stack is sound for ALL
        // of Unicode. (The earlier rendered-UTF-16 pick agreed only on BMP
        // strings; supplementary-plane keys could be unsoundly pruned.)
        if ((Utf8Ord.cmpBytes(x.getBytes, y.getBytes) <= 0) == min) x else y
      case (x, _) => x
    }
  }

  private def render(v: Any): String = v match {
    case b: Binary => b.toStringUsingUTF8
    case other => other.toString
  }

  /** A max that hit the footer truncation length is a PREFIX of the real
    * maximum and therefore not an upper bound — drop it (unbounded above;
    * PruneFilter treats one-sided stats as open on the missing side). The
    * earlier widen-by-appending-U+FFFF was unsound in byte order, where
    * supplementary-plane code points sort ABOVE U+FFFF. */
  private def dropIfTruncated(s: String): Option[String] =
    if (s.getBytes("UTF-8").length >= TruncationGuard) None else Some(s)
}
