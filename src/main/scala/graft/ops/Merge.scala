package graft.ops

import org.apache.spark.sql.DataFrame

/** U1 — multi-file merge with strict schema check (ref file_merge.py:9-54):
  * ≥2 inputs, identical column names *in order* and identical types, then
  * concatenation. Spark's `union` is positional like the reference's
  * `vstack`; the name check happens up front, so `union` and `unionByName`
  * coincide once validation passes.
  */
object Merge {

  /** Strict schema equality: names in order + types (nullability is not part
    * of the reference's dtype check). Throws with the 1-based file index on
    * mismatch, mirroring file_merge.py:36-43.
    */
  def validateSchemas(dfs: Seq[DataFrame]): Unit = {
    val ref = dfs.head.schema
    dfs.zipWithIndex.drop(1).foreach { case (df, i) =>
      val s = df.schema
      if (s.map(_.name) != ref.map(_.name))
        throw new IllegalArgumentException(s"Column mismatch in file $i.")
      s.zip(ref).foreach { case (a, b) =>
        if (a.dataType != b.dataType)
          throw new IllegalArgumentException(s"Dtype mismatch in column '${a.name}' (file $i).")
      }
    }
  }

  /** Merge after validation (ref file_merge.py:45-54). No shuffle: union is
    * a pure plan composition; downstream partitioning decisions apply to the
    * combined scan.
    */
  def merge(dfs: Seq[DataFrame]): DataFrame = {
    require(dfs.length >= 2, "At least two files are required.")
    validateSchemas(dfs)
    dfs.reduce(_.union(_))
  }
}
