package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** Native codegen'd MODEL-APPLICATION kernels: per-row scoring of a corpus
  * against a small driver-resident model (centroid tables, PQ codebooks, an
  * LSA basis). These are the INGEST hot paths — each runs exactly once per
  * corpus row — and they were Scala UDFs until r13: the r12 ADC rewrite
  * (Pq.adcScoreCol) measured the per-row boxing tax of that shape at 4+ s
  * of wall and ~20 s of GC per 500k vectors, and these carried the same
  * defect on the paths that touch EVERY row at index-build time.
  *
  * Each expression reproduces its former UDF's arithmetic EXACTLY — same
  * ascending-index left folds, same 0.0 inits, same strict-< tie-breaks —
  * so the pinned-model DuckDB gates (q_ann_ivf / q_ann_pq / q_ann_ivfpq /
  * q_lsa_project) stay hash-identical; the win is evaluation inside
  * whole-stage codegen over unsafe array data instead of boxed
  * Seq[Double] round-trips. Model data rides `ctx.addReferenceObj` — it is
  * part of the serialized task binary, which Spark torrent-broadcasts to
  * executors exactly like an explicit Broadcast variable.
  */

/** argmin over a pinned centroid table of ||v||² + ||c||² − 2·v·c, ties to
  * the FIRST (= smallest centroid_id: callers pass an id-sorted table).
  * Replaces Ivf.fromCentroids' per-row UDF; the three sums accumulate
  * interleaved in one ascending-j loop exactly as the UDF did (and as the
  * oracle's three list_reduce folds — each sum's operand order is identical
  * whether interleaved or not). A corpus vector whose length differs from
  * the centroid width fails LOUD (the UDF silently scored a prefix —
  * ADVICE r12). */
case class CentroidArgmin(child: Expression, ids: Array[Int],
                          cents: Array[Array[Double]])
    extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_centroid_argmin"

  private val dim = cents(0).length

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() != dim)
      throw new IllegalArgumentException(
        s"graft_centroid_argmin: vector length ${v.numElements()} != centroid width $dim")
    var best = 0
    var bestD = Double.PositiveInfinity
    var i = 0
    while (i < cents.length) {
      val c = cents(i)
      var nv = 0.0; var nc = 0.0; var dp = 0.0
      var j = 0
      while (j < dim) {
        val x = v.getDouble(j); val y = c(j)
        nv += x * x; nc += y * y; dp += x * y; j += 1
      }
      val d = nv + nc - 2.0 * dp
      if (d < bestD) { bestD = d; best = ids(i) }
      i += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("cents", cents, "double[][]")
    val idsRef = ctx.addReferenceObj("ids", ids, "int[]")
    nullSafeCodeGen(ctx, ev, a => {
      val best = ctx.freshName("best"); val bestD = ctx.freshName("bestD")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c"); val d = ctx.freshName("d")
      val nv = ctx.freshName("nv"); val nc = ctx.freshName("nc")
      val dp = ctx.freshName("dp"); val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
      if ($a.numElements() != $dim)
        throw new IllegalArgumentException(
          "graft_centroid_argmin: vector length " + $a.numElements() +
          " != centroid width $dim");
      int $best = 0;
      double $bestD = Double.POSITIVE_INFINITY;
      for (int $i = 0; $i < $centsRef.length; $i++) {
        double[] $c = $centsRef[$i];
        double $nv = 0.0, $nc = 0.0, $dp = 0.0;
        for (int $j = 0; $j < $dim; $j++) {
          double $x = $a.getDouble($j); double $y = $c[$j];
          $nv += $x * $x; $nc += $y * $y; $dp += $x * $y;
        }
        double $d = $nv + $nc - 2.0 * $dp;
        if ($d < $bestD) { $bestD = $d; $best = $idsRef[$i]; }
      }
      ${ev.value} = $best;"""
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-subspace PQ encoding: code(j) = argmin over codebook j of
  * Σᵢ (v[j·dsub+i] − cent[i])², ascending-i folds from 0.0, strict-< ties
  * to the smaller code. Replaces Pq.fromCodebooks' per-row UDF arithmetic
  * term-for-term (the oracle's `(t.v[..]-cb.cv[i])*(..)` list_reduce).
  * A vector whose length differs from m·dsub fails LOUD. */
case class PqEncode(child: Expression, codebooks: Array[Array[Array[Double]]],
                    dsub: Int)
    extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_pq_encode"

  private val m = codebooks.length

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() != m * dsub)
      throw new IllegalArgumentException(
        s"graft_pq_encode: vector length ${v.numElements()} != m*dsub = ${m * dsub}")
    val codes = new Array[Int](m)
    var j = 0
    while (j < m) {
      val bj = codebooks(j)
      var best = 0
      var bestD = Double.PositiveInfinity
      var c = 0
      while (c < bj.length) {
        val cent = bj(c)
        var s = 0.0
        var i = 0
        while (i < dsub) {
          val diff = v.getDouble(j * dsub + i) - cent(i); s += diff * diff; i += 1
        }
        if (s < bestD) { bestD = s; best = c }
        c += 1
      }
      codes(j) = best
      j += 1
    }
    new GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val booksRef = ctx.addReferenceObj("codebooks", codebooks, "double[][][]")
    nullSafeCodeGen(ctx, ev, a => {
      val codes = ctx.freshName("codes"); val j = ctx.freshName("j")
      val bj = ctx.freshName("bj"); val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD"); val c = ctx.freshName("c")
      val cent = ctx.freshName("cent"); val s = ctx.freshName("s")
      val i = ctx.freshName("i"); val diff = ctx.freshName("diff")
      s"""
      if ($a.numElements() != ${m * dsub})
        throw new IllegalArgumentException(
          "graft_pq_encode: vector length " + $a.numElements() +
          " != m*dsub = ${m * dsub}");
      int[] $codes = new int[$m];
      for (int $j = 0; $j < $m; $j++) {
        double[][] $bj = $booksRef[$j];
        int $best = 0;
        double $bestD = Double.POSITIVE_INFINITY;
        for (int $c = 0; $c < $bj.length; $c++) {
          double[] $cent = $bj[$c];
          double $s = 0.0;
          for (int $i = 0; $i < $dsub; $i++) {
            double $diff = $a.getDouble($j * $dsub + $i) - $cent[$i];
            $s += $diff * $diff;
          }
          if ($s < $bestD) { $bestD = $s; $best = $c; }
        }
        $codes[$j] = $best;
      }
      ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);"""
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Nonzero indices of an ml VectorUDT column as array<long>, ascending —
  * `v.toSparse.indices` / `numNonzeros` semantics (explicit zeros dropped)
  * without deserializing the Vector object. Replaces the per-row
  * `udf((v: Vector) => v.toSparse.indices.map(_.toLong))` on the LSH join
  * ingest path: the UDT's serialized struct is (type byte, size, indices,
  * values) — dense rows emit every index with a nonzero value, sparse rows
  * emit the stored indices with nonzero values; both orders are ascending
  * exactly as `foreachActive` visits them. */
case class VectorNzIndices(child: Expression) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = "graft_vector_nz_indices"

  override def nullSafeEval(input: Any): Any = {
    val row = input.asInstanceOf[InternalRow]
    val values = row.getArray(3)
    val n = values.numElements()
    val buf = new Array[Long](n)
    var out = 0
    if (row.getByte(0) == 1) { // dense
      var i = 0
      while (i < n) {
        if (values.getDouble(i) != 0.0) { buf(out) = i.toLong; out += 1 }
        i += 1
      }
    } else { // sparse
      val indices = row.getArray(2)
      var p = 0
      while (p < n) {
        if (values.getDouble(p) != 0.0) { buf(out) = indices.getInt(p).toLong; out += 1 }
        p += 1
      }
    }
    new GenericArrayData(if (out == n) buf else java.util.Arrays.copyOf(buf, out))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val values = ctx.freshName("values"); val indices = ctx.freshName("indices")
      val n = ctx.freshName("n"); val buf = ctx.freshName("buf")
      val out = ctx.freshName("out"); val i = ctx.freshName("i")
      val p = ctx.freshName("p"); val res = ctx.freshName("res")
      s"""
      org.apache.spark.sql.catalyst.util.ArrayData $values = $a.getArray(3);
      int $n = $values.numElements();
      long[] $buf = new long[$n];
      int $out = 0;
      if ($a.getByte(0) == (byte) 1) {
        for (int $i = 0; $i < $n; $i++)
          if ($values.getDouble($i) != 0.0) $buf[$out++] = (long) $i;
      } else {
        org.apache.spark.sql.catalyst.util.ArrayData $indices = $a.getArray(2);
        for (int $p = 0; $p < $n; $p++)
          if ($values.getDouble($p) != 0.0) $buf[$out++] = (long) $indices.getInt($p);
      }
      long[] $res = ($out == $n) ? $buf : java.util.Arrays.copyOf($buf, $out);
      ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($res);"""
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Basis projection x → Vᵗx over an ml VectorUDT column, V column-major and
  * plan-resident. Replaces Clustering.projectRows' per-row UDF: the UDF
  * deserialized every row to an ml.Vector object (plus a boxed closure over
  * a Broadcast) where this expression reads the UDT's serialized struct
  * (type, size, indices, values) directly — dense rows iterate every index
  * ascending, sparse rows iterate the active indices ascending, exactly
  * `foreachActive`'s order, with out(j) accumulating from 0.0 as before.
  * Output is a dense vector in serialized form (type=1). A DENSE row whose
  * length differs from numFeatures fails LOUD (the UDF silently projected a
  * prefix); a sparse index past numFeatures throws the same
  * ArrayIndexOutOfBounds the UDF threw. */
case class VectorProject(child: Expression, vColMajor: Array[Double],
                         numFeatures: Int, numConcepts: Int)
    extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = org.apache.spark.ml.linalg.SQLDataTypes.VectorType
  override def prettyName: String = "graft_vector_project"

  override def nullSafeEval(input: Any): Any = {
    val row = input.asInstanceOf[InternalRow]
    val vm = vColMajor
    val out = new Array[Double](numConcepts)
    val values = row.getArray(3)
    if (row.getByte(0) == 1) { // dense: every index, ascending
      val n = values.numElements()
      if (n != numFeatures)
        throw new IllegalArgumentException(
          s"graft_vector_project: dense vector length $n != basis rows $numFeatures")
      var i = 0
      while (i < n) {
        val x = values.getDouble(i)
        var j = 0
        while (j < numConcepts) { out(j) += vm(j * numFeatures + i) * x; j += 1 }
        i += 1
      }
    } else { // sparse: active indices, ascending
      val indices = row.getArray(2)
      val n = indices.numElements()
      var p = 0
      while (p < n) {
        val i = indices.getInt(p); val x = values.getDouble(p)
        var j = 0
        while (j < numConcepts) { out(j) += vm(j * numFeatures + i) * x; j += 1 }
        p += 1
      }
    }
    new GenericInternalRow(Array[Any](1.toByte, null, null, new GenericArrayData(out)))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vmRef = ctx.addReferenceObj("vColMajor", vColMajor, "double[]")
    nullSafeCodeGen(ctx, ev, a => {
      val out = ctx.freshName("out"); val values = ctx.freshName("values")
      val indices = ctx.freshName("indices"); val n = ctx.freshName("n")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val p = ctx.freshName("p"); val x = ctx.freshName("x")
      s"""
      double[] $out = new double[$numConcepts];
      org.apache.spark.sql.catalyst.util.ArrayData $values = $a.getArray(3);
      if ($a.getByte(0) == (byte) 1) {
        int $n = $values.numElements();
        if ($n != $numFeatures)
          throw new IllegalArgumentException(
            "graft_vector_project: dense vector length " + $n +
            " != basis rows $numFeatures");
        for (int $i = 0; $i < $n; $i++) {
          double $x = $values.getDouble($i);
          for (int $j = 0; $j < $numConcepts; $j++)
            $out[$j] += $vmRef[$j * $numFeatures + $i] * $x;
        }
      } else {
        org.apache.spark.sql.catalyst.util.ArrayData $indices = $a.getArray(2);
        int $n = $indices.numElements();
        for (int $p = 0; $p < $n; $p++) {
          int $i = $indices.getInt($p);
          double $x = $values.getDouble($p);
          for (int $j = 0; $j < $numConcepts; $j++)
            $out[$j] += $vmRef[$j * $numFeatures + $i] * $x;
        }
      }
      ${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        new Object[] {(byte) 1, null, null,
          new org.apache.spark.sql.catalyst.util.GenericArrayData($out)});"""
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
