package graft.cdc

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.propBoolean

/** Property-based coverage of the pure CDC building blocks. */
object CdcProps extends Properties("cdc") {

  private val ident: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString).suchThat(_.nonEmpty)

  property("catalog: db.table always beats table") = Prop.forAll(
    ident, ident, Gen.nonEmptyListOf(ident), Gen.nonEmptyListOf(ident)) {
    (db, tbl, pkSpecific, pkGeneric) =>
      val cat = CdcCatalog(
        pk = Map(s"$db.$tbl" -> pkSpecific, tbl -> pkGeneric),
        rename = Map.empty)
      cat.pkFor(db, tbl) == pkSpecific &&
        cat.pkFor(db + "x", tbl) == pkGeneric
  }

  property("catalog: unknown tables default to id / lowercase name") =
    Prop.forAll(ident, ident) { (db, tbl) =>
      val cat = CdcCatalog.empty
      cat.pkFor(db, tbl) == Seq("id") &&
        cat.targetFor(db, tbl.toUpperCase) == tbl.toLowerCase
    }

  property("properties round-trip: every pk./map. entry is parsed") =
    Prop.forAll(Gen.mapOf(Gen.zip(ident, ident))) { entries =>
      val content = entries.map { case (k, v) => s"pk.$k=$v\nmap.$k=$v" }
        .mkString("\n")
      val cat = CdcCatalog.fromPropertiesString(content)
      entries.forall { case (k, v) =>
        cat.pkFor("anydb", k) == Seq(v) && cat.targetFor("anydb", k) == v
      }
    }

  property("upsert SQL: placeholder count equals column count, " +
    "every non-PK column gets an EXCLUDED assignment") = Prop.forAll(
    Gen.nonEmptyListOf(ident).map(_.distinct), Gen.choose(1, 3)) {
    (cols, nPk) =>
      (cols.size >= 1) ==> {
        val pks = cols.take(math.min(nPk, cols.size))
        val sql = JdbcUpsertSink.upsertSql("t", cols, pks)
        val placeholders = sql.count(_ == '?')
        val nonPk = cols.map(_.toLowerCase).filterNot(pks.map(_.toLowerCase).contains)
        placeholders == cols.size &&
          sql.startsWith("INSERT INTO t (") &&
          sql.contains(s"ON CONFLICT (${pks.map(_.toLowerCase).mkString(", ")})") &&
          nonPk.forall(c => sql.contains(s"$c = EXCLUDED.$c"))
      }
  }
}
