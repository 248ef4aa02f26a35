package graft.table

import org.apache.spark.sql.types._

/**
 * Schema-evolution gate: classify a proposed schema change as additive
 * (commit metadata-only, old files read under the new schema) or breaking
 * (refuse — a full rewrite/migration would be required).
 *
 * Re-grounds the reference's config-compatibility check that decides between
 * reusing an index and forcing a full reindex
 * (packages/mcp/src/metadata.ts:72-113): there, embedder/chunking changes are
 * "breaking" while name/description edits are "minor"; here, column drops and
 * type changes outside the Parquet-upcast whitelist are breaking while
 * appended nullable columns and int->long / float->double widenings are
 * additive (Spark 4's vectorized Parquet reader upcasts those in place, and
 * columns absent from old files read as NULL because every scan passes the
 * table schema explicitly — GraftTable.readFiles).
 *
 * Scale note: additive evolution is O(1) — one metadata CAS, zero data IO —
 * which is the only acceptable cost at 10^12 rows.
 */
object SchemaEvolution {

  sealed trait Change { def breaking: Boolean; def describe: String }
  case class AddColumn(name: String, dt: DataType) extends Change {
    val breaking = false
    def describe = s"add column $name ${dt.sql}"
  }
  case class WidenType(name: String, from: DataType, to: DataType) extends Change {
    val breaking = false
    def describe = s"widen $name ${from.sql} -> ${to.sql}"
  }
  case class DropColumn(name: String, dt: DataType) extends Change {
    val breaking = true
    def describe = s"drop column $name ${dt.sql} (breaking)"
  }
  case class IncompatibleType(name: String, from: DataType, to: DataType) extends Change {
    val breaking = true
    def describe = s"retype $name ${from.sql} -> ${to.sql} (breaking: not a Parquet upcast)"
  }

  /** Upcasts the vectorized Parquet reader performs in place (verified by
    * SchemaEvolutionSpec against written files). Narrowing is never safe. */
  def widens(from: DataType, to: DataType): Boolean = (from, to) match {
    case (ByteType, ShortType | IntegerType | LongType) => true
    case (ShortType, IntegerType | LongType)            => true
    case (IntegerType, LongType)                        => true
    case (FloatType, DoubleType)                        => true
    case _                                              => false
  }

  /** All differences current -> proposed, matched by column name (Parquet
    * resolves columns by name, so pure reordering is a no-op, not a change). */
  def classify(current: StructType, proposed: StructType): Seq[Change] = {
    val cur = current.fields.map(f => f.name -> f.dataType).toMap
    val next = proposed.fields.map(f => f.name -> f.dataType).toMap
    val added = proposed.fields.toSeq.collect {
      case f if !cur.contains(f.name) => AddColumn(f.name, f.dataType)
    }
    val dropped = current.fields.toSeq.collect {
      case f if !next.contains(f.name) => DropColumn(f.name, f.dataType)
    }
    val retyped = proposed.fields.toSeq.flatMap { f =>
      cur.get(f.name) match {
        case Some(old) if old == f.dataType => None
        case Some(old) if widens(old, f.dataType) => Some(WidenType(f.name, old, f.dataType))
        case Some(old) => Some(IncompatibleType(f.name, old, f.dataType))
        case None => None
      }
    }
    added ++ dropped ++ retyped
  }
}
