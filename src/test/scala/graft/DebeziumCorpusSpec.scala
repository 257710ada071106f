package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import graft.functions.{DebeziumFull, Decoders}
import graft.model.MySqlDdl
import graft.model.MySqlDdl.MySqlTable
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import scala.collection.mutable
import scala.jdk.CollectionConverters._

/** Behavior-corpus replay of the reference's Debezium comparison
  * suites (tests/integration_tests/debezium01..03): those tests run
  * SQL workloads through both TiCDC and a real Debezium and diff the
  * message streams; offline, this spec replays the same statement
  * corpora through [[DebeziumFull]] and the full-envelope consumer
  * decode, then diffs CONVERGED WIRE STATE — fold the decoded
  * insert/update/delete stream per key (an update that moves the key
  * must move the row) and require it to equal the direct encoding of
  * the workload's final table state. That is the sync-diff model in
  * wire space: op sequencing, key routing, image fidelity and decode
  * symmetry all have to hold for the two sides to meet.
  *
  * Divergences are EXPLICIT, not silent: every statement the replay
  * cannot express is tallied by kind and pinned below, and the known
  * value-level divergences carry justifications:
  *  - session SETs (sql_mode / time_zone) are inert — the engine's
  *    renderings are fsp-faithful without session state; the corpora
  *    use them to probe zero-date handling (next item)
  *  - zero/invalid dates ('0000-00-00', '2009-11-31') render null on
  *    BOTH sides of the diff (try_to_date), where a real Debezium
  *    emits epoch 0 — documented in DebeziumFull's Scaladoc
  *  - DEFAULT CURRENT_TIMESTAMP fills resolve at replay time on both
  *    sides (the reference fills the DDL execution time)
  *  - pk-less tables are skipped from the fold (no handle key — the
  *    engine's eligibility rule; Debezium keys such tables by full
  *    row, a mode this sink does not replicate)
  */
class DebeziumCorpusSpec extends SparkFunSuite {

  private val d01 = "/root/reference/tests/integration_tests/debezium01/sql/debezium"
  private val d02 = "/root/reference/tests/integration_tests/debezium02/sql"
  private val d03 = "/root/reference/tests/integration_tests/debezium03/sql"
  private def available: Boolean =
    Files.isDirectory(Paths.get(d02)) && Files.isDirectory(Paths.get(d03))

  private def readFile(p: java.nio.file.Path): String =
    new String(Files.readAllBytes(p), StandardCharsets.UTF_8)

  private def sqlFiles(dir: String, ext: String): Seq[java.nio.file.Path] =
    Files.list(Paths.get(dir)).iterator().asScala.toSeq
      .filter(_.getFileName.toString.endsWith(ext)).sortBy(_.getFileName.toString)

  /** One replayed event: raw-literal images aligned to table cols. */
  private case class Ev(op: String, before: IndexedSeq[Option[String]],
                        after: IndexedSeq[Option[String]], ts: Long)

  private case class Replay(
      tables: mutable.Map[String, MySqlTable] = mutable.Map.empty,
      state: mutable.Map[String, mutable.ArrayBuffer[IndexedSeq[Option[String]]]] =
        mutable.Map.empty,
      events: mutable.Map[String, mutable.ArrayBuffer[Ev]] = mutable.Map.empty,
      counters: mutable.Map[String, Long] = mutable.Map.empty,
      skipped: mutable.Map[String, Int] = mutable.Map.empty) {
    var ts = 0L
    def skip(kind: String): Unit =
      skipped(kind) = skipped.getOrElse(kind, 0) + 1
  }

  private val autoIncRe =
    """(?is)^\s*ALTER\s+TABLE\s+([`\w.]+)\s+AUTO_INCREMENT\s*=\s*(\d+)\s*$""".r

  /** Literal-space equality for WHERE matching: string equal, or both
    * numeric and numerically equal. */
  private def litEq(a: Option[String], b: Option[String]): Boolean =
    (a, b) match {
      case (None, None) => true
      case (Some(x), Some(y)) =>
        x == y || (try BigDecimal(x) == BigDecimal(y) catch { case _: Throwable => false })
      case _ => false
    }

  private def applyStatement(r: Replay, stmt: String): Unit = {
    val lower = stmt.toLowerCase.dropWhile(_.isWhitespace)
    if (lower.startsWith("create table")) {
      MySqlDdl.parseCreateLike(stmt) match {
        case Some((nw, src)) =>
          r.tables.get(src) match {
            case Some(t) =>
              r.tables(nw) = t.copy(table = nw)
              r.state(nw) = mutable.ArrayBuffer.empty
              r.events.getOrElseUpdate(nw, mutable.ArrayBuffer.empty)
            case None => r.skip("create table like (unknown source)")
          }
        case None => MySqlDdl.parseCreateTable(stmt, "test") match {
          case Some(t) =>
            r.tables(t.table) = t
            r.state(t.table) = mutable.ArrayBuffer.empty
            r.events.getOrElseUpdate(t.table, mutable.ArrayBuffer.empty)
          case None => r.skip("create table (unparsed)")
        }
      }
    } else if (lower.startsWith("insert")) {
      val rows = MySqlDdl.parseInsert(stmt)
      rows.headOption.map(_.table).filter(r.tables.contains) match {
        case Some(tn) =>
          val t = r.tables(tn)
          rows.foreach { row =>
            val positional = row.values.keys.forall(_.startsWith("_"))
            val vals: IndexedSeq[Option[String]] =
              t.cols.zipWithIndex.map { case (c, i) =>
                val given =
                  (if (positional && row.values.nonEmpty) row.values.get(s"_$i").flatten
                   else row.values.getOrElse(c.name, None))
                    // the DEFAULT keyword defers to the column default
                    .filterNot(_.equalsIgnoreCase("default"))
                given.orElse {
                  if (c.autoInc) {
                    val n = r.counters.getOrElse(tn, 0L) + 1
                    r.counters(tn) = n
                    Some(n.toString)
                  } else c.default
                }
              }.toIndexedSeq
            r.state(tn) += vals
            r.ts += 1
            r.events(tn) += Ev("I", null, vals, r.ts)
          }
        case None => r.skip("insert into unknown table")
      }
    } else if (lower.startsWith("update")) {
      MySqlDdl.parseUpdate(stmt).filter(u => r.tables.contains(u.table)) match {
        case Some(u) =>
          val t = r.tables(u.table)
          val idx = t.cols.map(_.name).zipWithIndex.toMap
          def colIdx(n: String): Option[Int] =
            idx.get(n).orElse(idx.find(_._1.equalsIgnoreCase(n)).map(_._2))
          val rows = r.state(u.table)
          rows.indices.foreach { ri =>
            val row = rows(ri)
            val hit = u.where.forall { case (cn, v) =>
              colIdx(cn).exists(ci => litEq(row(ci), v)) }
            if (hit) {
              val after = u.sets.foldLeft(row) { case (acc, (cn, v)) =>
                colIdx(cn).map(ci => acc.updated(ci, v)).getOrElse(acc) }
              rows(ri) = after
              r.ts += 1
              r.events(u.table) += Ev("U", row, after, r.ts)
            }
          }
        case _ => r.skip("update (unparsed or unknown table)")
      }
    } else if (lower.startsWith("delete")) {
      MySqlDdl.parseDelete(stmt).filter(d => r.tables.contains(d.table)) match {
        case Some(d) =>
          val t = r.tables(d.table)
          val idx = t.cols.map(_.name).zipWithIndex.toMap
          def colIdx(n: String): Option[Int] =
            idx.get(n).orElse(idx.find(_._1.equalsIgnoreCase(n)).map(_._2))
          val rows = r.state(d.table)
          val (hit, keep) = rows.partition { row =>
            d.where.forall { case (cn, v) =>
              colIdx(cn).exists(ci => litEq(row(ci), v)) } }
          r.state(d.table) = keep
          hit.foreach { row =>
            r.ts += 1
            r.events(d.table) += Ev("D", row, null, r.ts)
          }
        case _ => r.skip("delete (unparsed or unknown table)")
      }
    } else stmt match {
      case autoIncRe(rawName, n) =>
        val tn = rawName.replace("`", "").split('.').last
        if (r.tables.contains(tn)) r.counters(tn) = n.toLong - 1
        else r.skip("alter auto_increment (unknown table)")
      case _ if lower.startsWith("set ") => r.skip("session SET")
      case _ if lower.startsWith("rename table") =>
        // RENAME TABLE a TO b[, ...]: the table keeps its rows and its
        // event history under the new name
        MySqlDdl.parseRenameTable(stmt).foreach { case (from, to) =>
          r.tables.remove(from).foreach(t => r.tables(to) = t.copy(table = to))
          r.state.remove(from).foreach(s => r.state(to) = s)
          r.events.remove(from).foreach(e => r.events(to) = e)
          r.counters.remove(from).foreach(c => r.counters(to) = c)
        }
      case _ if lower.startsWith("select") => r.skip("inert query (SELECT)")
      case _ if lower.startsWith("drop view") || lower.startsWith("drop index") =>
        r.skip("non-replicated class")
      case _ if lower.startsWith("drop table") =>
        // a dropped table leaves the replay (no row events in Debezium)
        val tn = stmt.split("\\s+").last.replace("`", "").replace(";", "")
          .split('.').last
        r.tables.remove(tn); r.state.remove(tn); r.events.remove(tn)
        r.skip("drop table")
      case _ if lower.startsWith("create database") ||
          lower.startsWith("drop database") || lower.startsWith("use ") =>
        r.skip("database-level statement")
      case _ if lower.startsWith("alter table") =>
        // row-shape ALTERs apply for real (ADD/DROP/MODIFY/CHANGE
        // COLUMN + SET/DROP DEFAULT); past events conform to the new
        // shape so the wire fold stays aligned with the final schema
        import graft.model.MySqlDdl.TableAlter
        def conformRows(tn: String, f: IndexedSeq[Option[String]] => IndexedSeq[Option[String]]): Unit = {
          val rows = r.state(tn)
          rows.indices.foreach(i => rows(i) = f(rows(i)))
          val evs = r.events(tn)
          evs.indices.foreach { i =>
            val e = evs(i)
            evs(i) = e.copy(
              before = if (e.before == null) null else f(e.before),
              after = if (e.after == null) null else f(e.after))
          }
        }
        MySqlDdl.parseAlterTable(stmt, n => r.tables.get(n)) match {
          case Some(TableAlter.AddCol(nt, idx, col)) =>
            r.tables(nt.table) = nt
            conformRows(nt.table,
              row => (row.take(idx) :+ col.default) ++ row.drop(idx))
          case Some(TableAlter.DropCol(nt, idx)) =>
            r.tables(nt.table) = nt
            conformRows(nt.table, row => row.take(idx) ++ row.drop(idx + 1))
          case Some(TableAlter.Retype(nt)) => r.tables(nt.table) = nt
          case Some(TableAlter.NewDefault(nt)) => r.tables(nt.table) = nt
          case None => r.skip("other alter")
        }
      case _ if lower.startsWith("create index") ||
          lower.startsWith("grant") || lower.startsWith("analyze") =>
        r.skip("non-replicated class")
      case _ => r.skip("other statement")
    }
  }

  private def replayScript(script: String): Replay = {
    val r = Replay()
    MySqlDdl.splitStatements(script).foreach(stmt => applyStatement(r, stmt))
    r
  }

  /** Encode events → decode → fold by pk in wire space. Returns
    * key → after-image values (wire strings). */
  private def foldWireState(t: MySqlTable, evs: Seq[Ev]): Map[Seq[String], Seq[String]] = {
    if (evs.isEmpty) return Map.empty
    val decoded = decodeEvents(t, evs)
    val pkIdx = t.pkCols.map(c => t.cols.indexWhere(_.name == c.name))
    val acc = mutable.LinkedHashMap.empty[Seq[String], Seq[String]]
    decoded.foreach { case (op, before, after) =>
      def key(img: Seq[String]): Seq[String] = pkIdx.map(img(_))
      op match {
        case "I" => acc(key(after)) = after
        case "U" => acc.remove(key(before)); acc(key(after)) = after
        case "D" => acc.remove(key(before))
      }
    }
    acc.toMap
  }

  /** Encode the events with DebeziumFull and decode with the
    * full-envelope consumer; returns (op, before, after) wire rows in
    * event order. */
  private def decodeEvents(t: MySqlTable, evs: Seq[Ev]): Seq[(String, Seq[String], Seq[String])] = {
    val img = StructType(t.cols.map(c => StructField(c.name, StringType, nullable = true)))
    val schema = StructType(Seq(
      StructField("before", img, nullable = true),
      StructField("after", img, nullable = true),
      StructField("_op", StringType), StructField("_schema", StringType),
      StructField("_table", StringType), StructField("_commit_ts", LongType)))
    val rows = evs.map { e =>
      def mk(v: IndexedSeq[Option[String]]): Row =
        if (v == null) null else Row(v.map(_.orNull): _*)
      Row(mk(e.before), mk(e.after), e.op, t.schema, t.table, e.ts * 1000000L)
    }
    val df = spark.createDataFrame(rows.asJava, schema)
    val wire = DebeziumFull.encode(df, t, "dbserver1")
      .select(col("_commit_ts"), col("_value"))
    val decoded = Decoders.decodeDebeziumFull(wire, img)
      .withColumn("_o", monotonically_increasing_id())
    decoded.orderBy(col("_commit_ts_ms"), col("_o"))
      .select(col("_op"), col("before"), col("after"))
      .collect().toSeq
      .map { r =>
        def img2(o: Any): Seq[String] = o match {
          case null => null
          case row: Row => row.toSeq.map(v => if (v == null) null else v.toString)
        }
        (r.getString(0), img2(r.get(1)), img2(r.get(2)))
      }
  }

  /** The direct wire encoding of a final upstream state: one INSERT
    * event per surviving row, keyed identically. */
  private def directWireState(t: MySqlTable,
                              rows: Seq[IndexedSeq[Option[String]]]): Map[Seq[String], Seq[String]] = {
    val evs = rows.zipWithIndex.map { case (v, i) => Ev("I", null, v, 1000000L + i) }
    foldWireState(t, evs)
  }

  private def replayAndDiff(script: String): (Replay, Seq[String]) = {
    val r = replayScript(script)
    val failures = mutable.ArrayBuffer.empty[String]
    r.tables.values.toSeq.sortBy(_.table).foreach { t =>
      if (t.pkCols.isEmpty) r.skip("pk-less table (no handle key)")
      else {
        val folded = foldWireState(t, r.events.getOrElse(t.table, Nil).toSeq)
        val direct = directWireState(t, r.state.getOrElse(t.table, Nil).toSeq)
        if (folded != direct)
          failures += s"${t.table}: folded=${folded.size} rows, direct=${direct.size} " +
            s"(first diff: ${(direct.toSet -- folded.toSet).take(1)} vs ${(folded.toSet -- direct.toSet).take(1)})"
      }
    }
    (r, failures.toSeq)
  }

  test("debezium02 corpus: every replayed workload converges in wire space") {
    assume(available)
    val results = sqlFiles(d02, ".sql").map { p =>
      val (r, failures) = replayAndDiff(readFile(p))
      assert(failures.isEmpty,
        s"${p.getFileName}: non-converged tables:\n  ${failures.mkString("\n  ")}")
      p.getFileName.toString -> r
    }
    // coverage floor: the corpus must actually exercise the engine
    val tablesReplayed = results.map(_._2.tables.size).sum
    val eventsReplayed = results.map(_._2.events.values.map(_.size).sum).sum
    assert(tablesReplayed >= 25, s"only $tablesReplayed tables parsed")
    assert(eventsReplayed >= 80, s"only $eventsReplayed events replayed")
  }

  test("debezium03 corpus: every replayed workload converges in wire space") {
    assume(available)
    val results = sqlFiles(d03, ".sql").map { p =>
      val (r, failures) = replayAndDiff(readFile(p))
      assert(failures.isEmpty,
        s"${p.getFileName}: non-converged tables:\n  ${failures.mkString("\n  ")}")
      p.getFileName.toString -> r
    }
    val tablesReplayed = results.map(_._2.tables.size).sum
    val eventsReplayed = results.map(_._2.events.values.map(_.size).sum).sum
    assert(tablesReplayed >= 25, s"only $tablesReplayed tables parsed")
    // the corpus carries ~88 row statements (incl. the multi-row and
    // UPDATE/DELETE forms); a drop below 80 means parsing regressed
    assert(eventsReplayed >= 80, s"only $eventsReplayed events replayed")
  }

  test("explicit divergence ledger: what the replay skips, by kind") {
    assume(available)
    val tally = mutable.Map.empty[String, Int]
    (sqlFiles(d02, ".sql") ++ sqlFiles(d03, ".sql")).foreach { p =>
      val (r, _) = replayAndDiff(readFile(p))
      r.skipped.foreach { case (k, n) => tally(k) = tally.getOrElse(k, 0) + n }
    }
    // the skip ledger is pinned BY KIND: a new kind appearing (or a
    // justified kind vanishing) is a corpus-coverage regression that
    // must be re-adjudicated here
    info(s"skip tally: ${tally.toSeq.sortBy(-_._2).mkString(", ")}")
    val kinds = tally.keySet
    val justified = Set(
      "session SET",            // inert: engine renderings are session-free
      "drop table",             // no row events; table leaves the replay
      "database-level statement",
      "other alter",            // index/partition/comment/charset: no row shape
                                // (ADD/DROP/MODIFY/CHANGE/SET DEFAULT apply for
                                // real since r10)
      "inert query (SELECT)",   // reads replicate nothing
      "alter auto_increment (unknown table)",
      "non-replicated class",   // ddlWhiteListMap never replicates these
      "pk-less table (no handle key)", // ineligible without force-replicate
      "insert into unknown table",     // follows an unparsed/dropped create
      "create table (unparsed)",
      "create table like (unknown source)",
      "update (unparsed or unknown table)",
      "delete (unparsed or unknown table)",
      "other statement")
    assert(kinds.subsetOf(justified),
      s"unjustified divergence kinds: ${kinds -- justified} (tally: $tally)")
    // r10 coverage floor, pinned so it can only improve: every CREATE
    // TABLE in the corpus now parses (exotic backticked names, LIKE
    // form), so create-driven skips are extinct, and row-shape ALTERs
    // replay for real (r8/r9 ledger: other alter 23, create unparsed
    // 4, insert unknown 2)
    assert(!kinds.contains("create table (unparsed)"),
      s"a corpus CREATE TABLE stopped parsing: $tally")
    assert(!kinds.contains("insert into unknown table"),
      s"an INSERT lost its table: $tally")
    assert(tally.getOrElse("other alter", 0) <= 18,
      s"row-shape ALTERs regressed to skipped: $tally")
  }

  test("debezium01 DDL corpus: the type-matrix CREATE TABLEs parse with pk intact") {
    assume(Files.isDirectory(Paths.get(d01)))
    val stats = sqlFiles(d01, ".ddl").map { p =>
      val stmts = MySqlDdl.splitStatements(readFile(p))
      val creates = stmts.filter(_.toLowerCase.startsWith("create table"))
      val parsed = creates.flatMap(s => MySqlDdl.parseCreateTable(s, "test"))
      (p.getFileName.toString, creates.size, parsed.size)
    }
    val totalCreates = stats.map(_._2).sum
    val totalParsed = stats.map(_._3).sum
    assert(totalCreates > 0)
    // parse floor over the Debezium-project DDL zoo — pinned at 100%
    // (r11 audit: all 74 corpus CREATE TABLEs parse); any future
    // regression surfaces here with its per-file stats
    assert(totalParsed == totalCreates,
      s"parse rate ${totalParsed}/$totalCreates; per-file: $stats")
  }
}
