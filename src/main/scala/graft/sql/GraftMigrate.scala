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
    * composite member) are moved to the descriptor's PENDING list in
    * that commit, rebuilt under the new codec, then re-registered one by
    * one: between commits the column simply stops routing (full scan +
    * residual — correct, just unrouted), and a crash mid-rebuild leaves
    * a persisted pending marker a restart can detect and finish
    * ([[resumePendingIndexRebuilds]]) instead of a silently-unrouted
    * column.
    *
    * The no-concurrent-writers contract is ENFORCED, not assumed: the
    * data flip commits through the [[Catalog.replaceData]] write fence
    * pinned to the version the rewrite read — a concurrent append
    * landing mid-migration fails the migration loudly (nothing is lost;
    * re-run it), the manifest-CAS analog of the reference's
    * disabled-table requirement (`HBaseAdmin.java:618`).
    *
    * Key parts are refused: re-keying rewrites row identity (sort order,
    * salt, splits) — that is a CopyTable into a new declaration, not a
    * column migration.
    *
    * `beforeCommit` is a test seam: runs after the rewrite frame is
    * built, before the fenced commit (crash/interleave injection). */
  def alterColumnCodec(catalog: Catalog, table: String, family: String,
      qualifier: Array[Byte], newType: String, nowMs: Long,
      beforeCommit: () => Unit = () => ()): Unit = {
    migrateColumnData(catalog, table, family, qualifier, newType, nowMs,
      beforeCommit)
    resumePendingIndexRebuilds(catalog, table, nowMs): Unit
  }

  /** Commit 1 of [[alterColumnCodec]] alone — the fenced data flip that
    * moves affected indexes to the pending list. Package-visible so the
    * crash-recovery spec can stop exactly here. */
  private[graft] def migrateColumnData(catalog: Catalog, table: String,
      family: String, qualifier: Array[Byte], newType: String, nowMs: Long,
      beforeCommit: () => Unit = () => ()): Unit = {
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

    // commit 1 (atomic, FENCED to the version the rewrite read): new
    // bytes + new declaration + affected indexes moved to the PENDING
    // list — deregistered from routing, but persistently marked for
    // rebuild so a crash here is resumable
    beforeCommit()
    catalog.replaceData(table, recoded, nowMs, Some(d.copy(
      wideSchema = Some(newSchema),
      indexes = d.indexes.filterNot(affected.contains),
      pendingIndexes = d.pendingIndexes ++ affected)),
      expectVersion = Some(cur.version)): Unit
  }

  /** Finish any PENDING index rebuilds on `table` — each rebuilds under
    * the current (post-migration) codecs and moves back to the routing
    * list in its own commit. Called by [[alterColumnCodec]] after its
    * data flip, and by recovery after a crash that left pending markers
    * behind. Returns the rebuilt index table names. */
  def resumePendingIndexRebuilds(catalog: Catalog, table: String,
      nowMs: Long): Seq[String] =
    catalog.currentManifest(table).descriptor.pendingIndexes.map { ix =>
      // rebuild + FENCED re-registration, retried: the registration
      // must commit against the exact main-table version the rebuild
      // read — a concurrent put landing in between is maintained for
      // ROUTING indexes only (Catalog.append walks descriptor.indexes;
      // pending ones get no synchronous maintenance), so an unfenced
      // re-register would ship an index permanently missing that row.
      // The fence turns the race into a rebuild retry; persistent
      // contention fails loudly, like the data flip's fence. ONLY the
      // dedicated fence type retries — and a commit race throws exactly
      // that type (Catalog.commitCurrent): it is deliberately the same
      // retryable someone-else-won condition. Any OTHER failure (a
      // corrupted manifest, a missing dir, ...) propagates immediately
      // instead of masking the real error under up to five rebuilds.
      var attempts = 0
      var done = false
      while (!done) {
        attempts += 1
        val readV = SecondaryIndex.rebuild(catalog, table, ix, nowMs)
        val now = catalog.currentManifest(table).descriptor
        try {
          catalog.alterTable(table, now.copy(
            indexes = now.indexes :+ ix,
            pendingIndexes =
              now.pendingIndexes.filterNot(_.indexTable == ix.indexTable)),
            nowMs, expectVersion = Some(readV))
          done = true
        } catch {
          case e: graft.catalog.FenceTrippedException =>
            if (attempts >= 5) throw new IllegalStateException(
              s"index ${ix.indexTable} re-registration lost the fence " +
                s"$attempts times (sustained concurrent writes on " +
                s"$table) — still pending, re-run " +
                "resumePendingIndexRebuilds", e)
        }
      }
      ix.indexTable
    }
}
