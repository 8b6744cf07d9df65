package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document-store access layer (SURVEY.md §2.1 S6; reference: the Mongo
  * where-DSL `finds/database/mongodb.py:11-48` + collection ops
  * `finds/unstructured/unstructured.py:59-154`).
  *
  * Documents live as a plain DataFrame (parquet/JSON-lines); the
  * reference's dict-based where clauses compile to Column predicates, so
  * selection pushes down to the scan like any other filter.
  */
object DocStore {

  /** Compile the reference's where-DSL to a Column predicate. Spec shape:
    * `Map(field -> value)` for equality, or
    * `Map(field -> Map("_op" -> operand))` with ops
    * `_eq _ne _lt _le _gt _ge _in _notin _exists` (mongodb.py:11-48).
    * Multiple fields/ops AND together.
    */
  def parseWhere(spec: Map[String, Any]): Column =
    spec.map { case (field, cond) =>
      cond match {
        case ops: Map[_, _] =>
          ops.asInstanceOf[Map[String, Any]].map {
            case ("_eq", v)          => col(field) === lit(v)
            case ("_ne", v)          => col(field) =!= lit(v)
            case ("_lt", v)          => col(field) < lit(v)
            case ("_le", v)          => col(field) <= lit(v)
            case ("_gt", v)          => col(field) > lit(v)
            case ("_ge", v)          => col(field) >= lit(v)
            case ("_in", v: Seq[_])  => col(field).isInCollection(v)
            case ("_notin", v: Seq[_]) => !col(field).isInCollection(v)
            case ("_exists", b: Boolean) => if (b) col(field).isNotNull else col(field).isNull
            case (op, _) => throw new IllegalArgumentException(s"unknown where op: $op")
          }.reduce(_ && _)
        case v => col(field) === lit(v)
      }
    }.reduce(_ && _)

  /** select: docs matching the where-DSL (unstructured.py:119-131). */
  def select(docs: DataFrame, where: Map[String, Any]): DataFrame =
    if (where.isEmpty) docs else docs.where(parseWhere(where))

  /** Upsert by key: new docs replace existing ones with the same key —
    * the INSERT IGNORE / replace pattern (sql.py:251-266) as
    * anti-join + union.
    */
  def upsert(existing: DataFrame, incoming: DataFrame, key: String): DataFrame =
    existing.join(incoming.select(key).distinct(), Seq(key), "left_anti")
      .unionByName(incoming)

  /** delete: docs NOT matching the where-DSL survive (unstructured.py:133-143).
    * NULL predicate results (e.g. `field > 5` on a null field) mean
    * "did not match" — those docs must SURVIVE, so the negation is
    * null-coalesced rather than three-valued.
    */
  def delete(docs: DataFrame, where: Map[String, Any]): DataFrame =
    docs.where(!coalesce(parseWhere(where), lit(false)))
}
