package graft.schema

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import scala.collection.immutable.ListMap

/** Schema utilities reproducing the reference's schema dynamics
  * (SURVEY.md §1.4):
  *
  *  - `conformToSchema` = permissive `unify_schemas` + cast
  *    (`crystpqdb/loaders/base.py:210-216`): missing fields become typed
  *    nulls — recursively, including inside arrays of structs — and present
  *    fields are cast to the target type.
  *  - `flatten` / `unflatten` = ParquetDB's internal dotted-column layout and
  *    `rebuild_nested_struct=True` read path
  *    (`crystpqdb/loaders/base.py:188-193`), exposed as operators (Q-FL1).
  *
  * All three are pure `DataFrame => DataFrame` column programs — no shuffle,
  * no driver-side data movement, so they hold at any scale.
  */
object SchemaOps {

  /** Cast/null-fill `e` (of type `src`) into shape `tgt`, recursing through
    * structs and arrays. Null structs stay null (not structs-of-nulls).
    */
  private def conformExpr(e: Column, src: DataType, tgt: DataType): Column = (src, tgt) match {
    case (s: StructType, t: StructType) =>
      val fields = t.fields.map { tf =>
        s.fields.find(_.name == tf.name) match {
          case Some(sf) => conformExpr(e.getField(tf.name), sf.dataType, tf.dataType).as(tf.name)
          case None     => lit(null).cast(tf.dataType).as(tf.name)
        }
      }
      when(e.isNull, lit(null).cast(t)).otherwise(struct(fields.toIndexedSeq: _*))
    case (ArrayType(se, _), ArrayType(te, _)) =>
      transform(e, x => conformExpr(x, se, te))
    case (s, t) if s == t => e
    case (_, t)           => e.cast(t)
  }

  /** Conform `df` to `target`: union-of-schemas semantics with the target
    * winning — every target field present (null-filled if missing), every
    * field cast to the target type, in target field order. Extra source
    * columns are dropped (the reference casts to the canonical schema).
    */
  def conformToSchema(df: DataFrame, target: StructType): DataFrame = {
    val src = df.schema
    val cols = target.fields.map { tf =>
      src.fields.find(_.name == tf.name) match {
        case Some(sf) => conformExpr(df(s"`${tf.name}`"), sf.dataType, tf.dataType).as(tf.name)
        case None     => lit(null).cast(tf.dataType).as(tf.name)
      }
    }
    df.select(cols.toIndexedSeq: _*)
  }

  /** Flatten nested struct columns into dotted top-level columns
    * (`a: struct<b,c>` → columns `a.b`, `a.c`). Arrays are left intact —
    * flattening applies to struct nesting only, matching ParquetDB's layout.
    */
  def flatten(df: DataFrame): DataFrame = {
    def expand(e: Column, name: String, dt: DataType): Seq[(String, Column)] = dt match {
      case st: StructType =>
        st.fields.toIndexedSeq.flatMap(f => expand(e.getField(f.name), s"$name.${f.name}", f.dataType))
      case _ => Seq(name -> e)
    }
    val cols = df.schema.fields.toIndexedSeq.flatMap { f =>
      expand(df(s"`${f.name}`"), f.name, f.dataType)
    }
    df.select(cols.map { case (n, c) => c.as(n) }: _*)
  }

  /** Inverse of [[flatten]]: reassemble dotted column names into nested
    * structs. `unflatten(flatten(df))` preserves schema and data for any
    * df whose original column names contain no dots.
    */
  def unflatten(df: DataFrame): DataFrame = {
    // (path segments, column) in original order
    val leaves: Seq[(List[String], Column)] =
      df.schema.fieldNames.toIndexedSeq.map(n => n.split("\\.").toList -> df(s"`$n`"))

    def build(items: Seq[(List[String], Column)]): Seq[(String, Column)] = {
      // group by head segment, preserving first-appearance order
      val order = items.map(_._1.head).distinct
      val grouped = ListMap(order.map(h => h -> items.filter(_._1.head == h)): _*)
      grouped.toSeq.map { case (head, group) =>
        group match {
          case Seq((List(_), c)) => head -> c
          case children =>
            val nested = build(children.map { case (path, c) => path.tail -> c })
            head -> struct(nested.map { case (n, c) => c.as(n) }: _*)
        }
      }
    }
    df.select(build(leaves).map { case (n, c) => c.as(n) }: _*)
  }
}
