package graft.sql

import graft.catalog.Catalog
import graft.core.{CellCodec, CellKind}
import graft.read.SecondaryIndex
import org.apache.spark.sql.functions.{col, lit, when}
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType, IntegerType, LongType, StringType}

/** Online schema migrations for declared wide columns — the
  * `HBaseAdmin.modifyColumn:618` analog (there: swap the
  * HColumnDescriptor on a DISABLED table; here: one compaction-machinery
  * rewrite + an atomic descriptor swap in the SAME manifest commit). */
object GraftMigrate {

  // the legal codec migrations: plain <-> order-preserving, same JVM
  // type and cell width (anything else is a retype, not a re-encode)
  private val flips = Map(
    "long" -> "olong", "olong" -> "long",
    "int" -> "oint", "oint" -> "int",
    "double" -> "odouble", "odouble" -> "double")

  private def token(dt: DataType, ordered: Boolean): String = (dt, ordered) match {
    case (LongType, false) => "long"
    case (LongType, true) => "olong"
    case (IntegerType, false) => "int"
    case (IntegerType, true) => "oint"
    case (DoubleType, false) => "double"
    case (DoubleType, true) => "odouble"
    case (StringType, _) => "string"
    case (BinaryType, _) => "binary"
    case (other, _) => other.simpleString
  }

  /** ALTER the VALUE codec of one declared wide column between the plain
    * and ORDER-PRESERVING encodings (`long<->olong`, `int<->oint`,
    * `double<->odouble`) — the migration that makes signed/IEEE ranges
    * index-servable on EXISTING data (`Bytes.toBytesOrdered`; a freshly
    * declared `odouble` column only helps new tables).
    *
    * One distributed pass rewrites the column's Put values under the new
    * codec through the compaction machinery and flips the declared type
    * IN THE SAME manifest commit — a reader sees old-bytes+old-codec or
    * new-bytes+new-codec, never a torn pair. Indexes whose keys or
    * content embed the encoding (directly indexed, covered, or a
    * composite member) are DROPPED from the descriptor in that commit,
    * rebuilt under the new codec, then re-registered: between commits
    * the column simply stops routing (full scan + residual — correct,
    * just unrouted). Like the reference's modifyColumn (disabled-table
    * contract), the job assumes no concurrent writers to this table.
    *
    * Key parts are refused: re-keying rewrites row identity (sort order,
    * salt, splits) — that is a CopyTable into a new declaration, not a
    * column migration. */
  def alterColumnCodec(catalog: Catalog, table: String, family: String,
      qualifier: Array[Byte], newType: String, nowMs: Long): Unit = {
    val cur = catalog.currentManifest(table)
    val d = cur.descriptor
    val spec = WideSpec.parse(d.wideKey, d.wideSchema)
    val name = new String(qualifier, java.nio.charset.StandardCharsets.UTF_8)
    require(!spec.key.exists(_._1 == name),
      s"'$name' is a key part of $table: re-keying rewrites row " +
        "identity — CopyTable into a new declaration instead")
    val c = spec.cols.find(w => w.family == family && w.name == name)
      .getOrElse(throw new IllegalArgumentException(
        s"no declared wide column $family:$name on table $table"))
    val oldType = token(c.dt, c.ordered)
    require(flips.get(oldType).contains(newType),
      s"unsupported codec migration $oldType -> $newType (legal: " +
        flips.map { case (a, b) => s"$a->$b" }.mkString(", ") + ")")
    val newOrdered = newType.startsWith("o")

    // indexes whose key bytes or covered content embed this column's
    // encoding — every one must be rebuilt under the new codec
    val affected = d.indexes.filter { ix =>
      def hits(f: String, q: Array[Byte]) =
        f == family && java.util.Arrays.equals(q, qualifier)
      hits(ix.family, ix.qualifier) ||
        ix.covered.exists((hits _).tupled) ||
        ix.moreColumns.exists((hits _).tupled)
    }

    // the rewritten declaration (canonical form, one type token flipped)
    val newSchema = spec.cols.map { w =>
      val t = if (w.family == c.family && w.name == c.name) newType
        else token(w.dt, w.ordered)
      s"${w.family}:${w.name}:$t"
    }.mkString(";")

    // one distributed re-encode pass over RAW storage cells (row keys —
    // salt included — untouched; tombstones carry no value and pass
    // through): decode under the old codec, encode under the new, all
    // codegen'd builtins
    val isTarget = col("family") === family &&
      col("qualifier") === lit(qualifier) &&
      col("kind") === CellKind.Put && col("value").isNotNull
    val recoded = catalog.readManifest(cur).withColumn("value",
      when(isTarget, CellCodec.encodeValue(
        CellCodec.decodeValue(col("value"), c.dt, c.ordered),
        c.dt, newOrdered))
        .otherwise(col("value")))

    // commit 1 (atomic): new bytes + new declaration + affected indexes
    // deregistered
    catalog.replaceData(table, recoded, nowMs, Some(d.copy(
      wideSchema = Some(newSchema),
      indexes = d.indexes.filterNot(affected.contains))))

    // rebuild each affected index under the new codec, then re-register
    affected.foreach { ix =>
      SecondaryIndex.rebuild(catalog, table, ix, nowMs)
      val now = catalog.currentManifest(table).descriptor
      catalog.alterTable(table, now.copy(indexes = now.indexes :+ ix), nowMs)
    }
  }
}
