package graft.format

import org.apache.spark.sql.types._

/** Dotted-path navigation and logical↔physical type mapping for NESTED
  * schema evolution (reference `rust/lance/src/dataset/schema_evolution.rs`
  * — `ColumnAlteration::new("b.c")` renames and `drop_columns(["b.c"])`
  * address nested fields via field ids; data files stay valid because the
  * on-file layout never changes).
  *
  * Graft's equivalent of field-id indirection is the `graft.physical`
  * StructField-metadata key: a renamed field keeps its on-file name in
  * metadata, at ANY nesting depth. Fragment parquet always stores physical
  * names. Reads restore logical nested names with ONE struct cast per
  * affected top-level column (struct→struct casts rename fields
  * positionally, null-safely, and recurse through arrays/maps); writes apply
  * the inverse cast. Nested drops need no expression at all: the requested
  * (physical) scan schema simply omits the subfield and parquet schema
  * clipping prunes it file-side.
  *
  * Trade-off, verified against the physical plan: on a table with nested
  * renames, filters on OTHER (un-renamed) columns still push to the scan
  * (`PushedFilters: [GreaterThan(id,500)]` with the restoring cast in the
  * plan), but a filter on the renamed nested field itself evaluates above
  * the cast (not pushed), and projecting one subfield reads the whole
  * struct (Catalyst does not prune nested schema through a struct Cast).
  * Top-level renames keep full pushdown — they restore via plain aliases.
  * A cast rewrite (`alterColumns(casts = ...)`) materializes logical names
  * and restores full pushdown if a renamed nested field becomes hot.
  */
private[format] object SchemaPaths {
  import GraftManifest.PhysicalKey

  def split(path: String): Seq[String] = path.split("\\.").toSeq

  /** On-file name of one field (identity unless rename indirection). */
  def physName(f: StructField): String =
    if (f.metadata.contains(PhysicalKey)) f.metadata.getString(PhysicalKey)
    else f.name

  /** Field at a dotted path; None if any segment is missing or a non-struct
    * is addressed through. Array-of-struct elements are traversed
    * transparently (a path into a list addresses every element's field). */
  def fieldAt(schema: StructType, path: Seq[String]): Option[StructField] =
    path match {
      case Seq()  => None
      case Seq(h) => schema.fields.find(_.name == h)
      case h +: t =>
        schema.fields.find(_.name == h).flatMap(_.dataType match {
          case st: StructType               => fieldAt(st, t)
          case ArrayType(st: StructType, _) => fieldAt(st, t)
          case _                            => None
        })
    }

  /** Rewrite the field at `path`; `fn` returning None drops it. Throws if
    * the path does not resolve or a drop would leave an empty struct. */
  def rewriteAt(schema: StructType, path: Seq[String])
               (fn: StructField => Option[StructField]): StructType = {
    require(path.nonEmpty, "empty column path")
    val h = path.head
    require(schema.fieldNames.contains(h), s"no column ${path.mkString(".")}")
    StructType(schema.fields.flatMap { f =>
      if (f.name != h) Some(f)
      else if (path.length == 1) fn(f)
      else f.dataType match {
        case st: StructType =>
          val inner = rewriteAt(st, path.tail)(fn)
          require(inner.fields.nonEmpty,
            s"cannot drop the last field of struct ${f.name}")
          Some(f.copy(dataType = inner))
        case ArrayType(st: StructType, n) =>
          val inner = rewriteAt(st, path.tail)(fn)
          require(inner.fields.nonEmpty,
            s"cannot drop the last field of struct ${f.name}")
          Some(f.copy(dataType = ArrayType(inner, n)))
        case other => throw new IllegalArgumentException(
          s"$h is ${other.simpleString}, not a struct — cannot address ${path.mkString(".")}")
      }
    })
  }

  /** Physical (on-file) type: every nested field renamed to its on-file
    * name, metadata stripped — what fragment parquet actually stores. */
  def physicalType(dt: DataType): DataType = dt match {
    case st: StructType => StructType(st.fields.map(f =>
      StructField(physName(f), physicalType(f.dataType), f.nullable)))
    case ArrayType(e, n)  => ArrayType(physicalType(e), n)
    case MapType(k, v, n) => MapType(physicalType(k), physicalType(v), n)
    case other            => other
  }

  /** Logical type with graft-internal metadata stripped at every depth
    * (other field metadata — comments etc. — is preserved). */
  def cleanType(dt: DataType): DataType = dt match {
    case st: StructType => StructType(st.fields.map { f =>
      val mb = new MetadataBuilder().withMetadata(f.metadata)
      mb.remove(PhysicalKey)
      StructField(f.name, cleanType(f.dataType), f.nullable, mb.build())
    })
    case ArrayType(e, n)  => ArrayType(cleanType(e), n)
    case MapType(k, v, n) => MapType(cleanType(k), cleanType(v), n)
    case other            => other
  }

  /** All-nullable view of a type: struct↔struct Cast requires the target
    * field nullable wherever the source may be null, and parquet scans
    * surface everything nullable. */
  def nullableAll(dt: DataType): DataType = dt match {
    case st: StructType => StructType(st.fields.map(f =>
      StructField(f.name, nullableAll(f.dataType), nullable = true, f.metadata)))
    case ArrayType(e, _)  => ArrayType(nullableAll(e), containsNull = true)
    case MapType(k, v, _) => MapType(nullableAll(k), nullableAll(v), valueContainsNull = true)
    case other            => other
  }

  /** Does this type carry rename indirection anywhere below the top level? */
  def hasNestedIndirection(dt: DataType): Boolean = dt match {
    case st: StructType => st.fields.exists(f =>
      f.metadata.contains(PhysicalKey) || hasNestedIndirection(f.dataType))
    case ArrayType(e, _)  => hasNestedIndirection(e)
    case MapType(k, v, _) => hasNestedIndirection(k) || hasNestedIndirection(v)
    case _                => false
  }

  /** Project a LOGICAL-named value to the PHYSICAL nested names fragment
    * files store — BY NAME, not by position (a caller may build a struct
    * with the right field names in a different order; a positional cast
    * would silently bind values to the wrong columns). Null structs are
    * preserved explicitly. Write-path only; reads restore with a positional
    * cast, which is safe there because the scan schema is generated from
    * the same manifest field order. */
  def toPhysicalExpr(e: org.apache.spark.sql.Column, dt: DataType,
                     nullable: Boolean): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{lit, struct, transform, when}
    dt match {
      case st: StructType if hasNestedIndirection(st) =>
        val rebuilt = struct(st.fields.toSeq.map(f =>
          toPhysicalExpr(e.getField(f.name), f.dataType, f.nullable)
            .as(physName(f))): _*)
        if (nullable)
          when(e.isNull, lit(null).cast(nullableAll(physicalType(st))))
            .otherwise(rebuilt)
        else rebuilt
      case ArrayType(elem, _) if hasNestedIndirection(elem) =>
        transform(e, x => toPhysicalExpr(x, elem, nullable = true))
      case _ => e
    }
  }

  /** (logical dotted path → physical name) for every renamed field at any
    * depth — the indirection fingerprint concurrent writers compare before
    * committing staged physical files. */
  def indirectionPairs(schema: StructType, prefix: String = ""): Seq[(String, String)] =
    schema.fields.toSeq.flatMap { f =>
      val p = if (prefix.isEmpty) f.name else s"$prefix.${f.name}"
      val here = if (physName(f) != f.name) Seq(p -> physName(f)) else Nil
      here ++ (f.dataType match {
        case st: StructType               => indirectionPairs(st, p)
        case ArrayType(st: StructType, _) => indirectionPairs(st, p)
        case _                            => Nil
      })
    }
}
