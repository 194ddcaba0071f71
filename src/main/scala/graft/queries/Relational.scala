package graft.queries

import graft.QueryDef
import graft.io.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Relational operator inventory (SURVEY §2.1–§2.8) re-expressed Spark-first
  * over the TPC-H-ish testdata. Every query here has a DuckDB oracle.
  *
  * Determinism rules used throughout (driver hashes values after sorting
  * columns by name):
  *  - sums of doubles go through a per-row DECIMAL cast so partial-aggregation
  *    order cannot change the result (exact decimal addition on both engines);
  *  - averages are written as exact-decimal-sum / count with ONE final double
  *    division, identical IEEE op on both sides;
  *  - every output is totally ordered (unique tie-break keys).
  */
object Relational {

  /** Exact, order-insensitive sum of a double column: per-row decimal cast →
    * decimal sum → double. Mirrored in oracle SQL as
    * CAST(SUM(CAST(x AS DECIMAL(p,s))) AS DOUBLE). */
  /** DuckDB replay of BillsGen's splitmix64 state derivation
    * (sources/BillsGen.scala `row`/`mix`): every generated row's state is
    * mix(i ^ mix(seed)) mod 50, recomputed INDEPENDENTLY in SQL. Unsigned
    * 64-bit arithmetic is emulated stage by stage — values live in HUGEINT
    * mod 2⁶⁴, xor happens in the signed-BIGINT bit-pattern domain (DuckDB's
    * xor is 64-bit), and each 64×64 multiply is split hi/lo so the 128-bit
    * intermediate fits HUGEINT. mix(seed) is embedded as a literal from the
    * SAME engine function the source runs — the q_minhash_sig
    * constant-embedding pattern; the per-row mixing is all SQL. */
  private lazy val billsStateOracleSql: String = {
    val mix42 = graft.sources.BillsGen.mix(42L) // signed bit pattern literal
    def tos(c: String) =
      s"CAST(CASE WHEN $c >= 9223372036854775808 THEN $c - 18446744073709551616 ELSE $c END AS BIGINT)"
    def tou(c: String) =
      s"(CASE WHEN $c < 0 THEN CAST($c AS HUGEINT) + 18446744073709551616 ELSE CAST($c AS HUGEINT) END)"
    def xoru(a: String, b: String) = tou(s"xor(${tos(a)}, ${tos(b)})")
    def mulmod(a: String, c: String) =
      s"((($a % 4294967296) * $c + ((($a // 4294967296) * $c) % 4294967296) * 4294967296) % 18446744073709551616)"
    s"""
    WITH t AS (SELECT i FROM range(0, 5000) r(i)),
    u0 AS (SELECT i, ${tou(s"xor(CAST(i AS BIGINT), CAST($mix42 AS BIGINT))")} AS x FROM t),
    a1 AS (SELECT i, (x + 11400714819323198485) % 18446744073709551616 AS z FROM u0),
    b1 AS (SELECT i, ${xoru("z", "(z // 1073741824)")} AS z FROM a1),
    c1 AS (SELECT i, ${mulmod("z", "13787848793156543929")} AS z FROM b1),
    b2 AS (SELECT i, ${xoru("z", "(z // 134217728)")} AS z FROM c1),
    c2 AS (SELECT i, ${mulmod("z", "10723151780598845931")} AS z FROM b2),
    h AS (SELECT i, ${xoru("z", "(z // 2147483648)")} AS h FROM c2)
    SELECT CAST(h % 50 AS BIGINT) AS state, COUNT(*) AS n FROM h
    GROUP BY 1 ORDER BY state"""
  }

  private def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(30, scale))).cast("double")

  val defs: Map[String, QueryDef] = Map(

    // ----- A1/A11: hash aggregate with partial/final plumbing (reference
    // WordCount.scala:60-61 pattern applied to lineitem)
    "q1_agg" -> QueryDef.sql("""
      SELECT l_returnflag, l_linestatus,
             CAST(SUM(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE) AS sum_qty,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,2))) AS DOUBLE) AS sum_base_price,
             CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(30,6))) AS DOUBLE) AS sum_disc_price,
             CAST(SUM(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE)/COUNT(*) AS avg_qty,
             COUNT(*) AS count_order
      FROM lineitem GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus""") { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 6).as("sum_disc_price"),
          (dsum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // ----- TPC-H Q3 shape (shipping priority): selective dim filter →
    // broadcast customer side → two equi-joins → revenue agg → top-10.
    // The classic "find the valuable unshipped orders" plan: both date
    // filters push to the parquet scans, the segment-filtered customer
    // table broadcasts, and the top-10 is TakeOrderedAndProject.
    "q_tpch_q3" -> QueryDef.sql("""
      SELECT l.l_orderkey, o.o_orderdate,
             CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(30,6))) AS DOUBLE) AS revenue
      FROM customer c
      JOIN orders o ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      WHERE c.c_mktsegment = 'BUILDING'
        AND o.o_orderdate < TIMESTAMP '1996-03-15 00:00:00'
        AND l.l_shipdate > TIMESTAMP '1996-03-15 00:00:00'
      GROUP BY l.l_orderkey, o.o_orderdate
      ORDER BY revenue DESC, l_orderkey LIMIT 10""") { (s, d) =>
      val c = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate") < lit("1996-03-15").cast("timestamp"))
      val l = Tables.lineitem(s, d)
        .filter(col("l_shipdate") > lit("1996-03-15").cast("timestamp"))
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 6).as("revenue"))
        .orderBy(desc("revenue"), asc("l_orderkey"))
        .limit(10)
    },

    // ----- TPC-H Q5 shape (local supplier volume): six-table star join with
    // the customer-nation = supplier-nation co-location predicate. region →
    // nation → supplier all broadcast (dim-sized); the only real exchanges
    // are the orders⋈lineitem join and the final per-nation aggregation.
    "q_tpch_q5" -> QueryDef.sql("""
      SELECT n.n_name,
             CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(30,6))) AS DOUBLE) AS revenue
      FROM customer c, orders o, lineitem l, supplier s, nation n, region r
      WHERE c.c_custkey = o.o_custkey AND l.l_orderkey = o.o_orderkey
        AND l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
        AND s.s_nationkey = n.n_nationkey AND n.n_regionkey = r.r_regionkey
        AND r.r_name = 'ASIA'
        AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY n.n_name ORDER BY revenue DESC, n_name""") { (s, d) =>
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      val l = Tables.lineitem(s, d)
      val sup = Tables.supplier(s, d)
      val n = Tables.nation(s, d)
      val r = Tables.region(s, d).filter(col("r_name") === "ASIA")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(sup),
          l("l_suppkey") === sup("s_suppkey") &&
          c("c_nationkey") === sup("s_nationkey"))
        .join(broadcast(n), sup("s_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 6).as("revenue"))
        .orderBy(desc("revenue"), asc("n_name"))
    },

    // ----- TPC-H Q10 shape (returned-item reporting): quarter of orders ⋈
    // returned lineitems → per-customer lost revenue, top 20. Same revenue
    // discipline; the customer attributes ride a broadcast join AFTER the
    // aggregation, so the exchange carries (custkey, revenue) only.
    "q_tpch_q10" -> QueryDef.sql("""
      WITH rev AS (
        SELECT o.o_custkey,
               CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(30,6))) AS DOUBLE) AS revenue
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE l.l_returnflag = 'R'
          AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o.o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY o.o_custkey)
      SELECT c.c_custkey, c.c_name, c.c_acctbal, rev.revenue
      FROM rev JOIN customer c ON c.c_custkey = rev.o_custkey
      ORDER BY revenue DESC, c_custkey LIMIT 20""") { (s, d) =>
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
      val l = Tables.lineitem(s, d).filter(col("l_returnflag") === "R")
      val rev = l.join(o, l("l_orderkey") === o("o_orderkey"))
        .groupBy(col("o_custkey"))
        .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 6).as("revenue"))
      rev.join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"), col("revenue"))
        .orderBy(desc("revenue"), asc("c_custkey"))
        .limit(20)
    },

    // ----- TPC-H Q18 shape (large-volume orders): semi-join against a
    // HAVING-filtered aggregate. The big-order key set is tiny by
    // construction (46 orders at sf0.01), so Spark's AQE turns the IN into
    // a broadcast semi-join; the only large exchanges are the two
    // per-orderkey aggregations, both with map-side partial combine.
    "q_tpch_q18" -> QueryDef.sql("""
      SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
             CAST(SUM(CAST(l.l_quantity AS DECIMAL(30,2))) AS DOUBLE) AS total_qty
      FROM customer c
      JOIN orders o ON o.o_custkey = c.c_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      WHERE o.o_orderkey IN (
        SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
        HAVING SUM(l_quantity) > 300)
      GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
      ORDER BY o.o_totalprice DESC, o.o_orderdate, o.o_orderkey LIMIT 100""") { (s, d) =>
      val l = Tables.lineitem(s, d)
      val big = l.groupBy("l_orderkey")
        .agg(sum("l_quantity").as("q")).filter(col("q") > 300)
        .select(col("l_orderkey").as("big_okey"))
      val o = Tables.orders(s, d)
        .join(broadcast(big), col("o_orderkey") === col("big_okey"), "left_semi")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(Tables.customer(s, d), o("o_custkey") === col("c_custkey"))
        .groupBy(col("c_name"), col("c_custkey"), col("o_orderkey"),
          col("o_orderdate"), col("o_totalprice"))
        .agg(dsum(col("l_quantity"), 2).as("total_qty"))
        .orderBy(desc("o_totalprice"), asc("o_orderdate"), asc("o_orderkey"))
        .limit(100)
    },

    // ----- TPC-H Q16 shape (supplier diversity per part attribute):
    // distinct-count aggregation after an attribute-filtered join. Spark
    // plans COUNT(DISTINCT) as the two-phase expand/partial-dedup — the
    // dedup happens map-side before the per-group exchange; the part dim
    // is broadcast.
    // ----- TPC-H Q12 shape (shipping-priority classification): lineitems in
    // a shipdate band ⋈ orders → per-linestatus counts of high- vs low-
    // priority orders. (The synthetic lineitem carries no
    // shipmode/commit/receipt columns, so linestatus stands in for shipmode;
    // the operator shape — join + conditional aggregation — is Q12's.)
    // Integer counts: no float discipline needed.
    "q_tpch_q12" -> QueryDef.sql("""
      SELECT l.l_linestatus,
             CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                           THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
             CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                           THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l.l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY l.l_linestatus ORDER BY l.l_linestatus""") { (s, d) =>
      val o = Tables.orders(s, d).select("o_orderkey", "o_orderpriority")
      val l = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
        .select("l_orderkey", "l_linestatus")
      val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .groupBy(col("l_linestatus"))
        .agg(sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
          sum(when(!high, 1L).otherwise(0L)).as("low_line_count"))
        .orderBy("l_linestatus")
    },

    // ----- TPC-H Q14 shape (promotion effect): one-month lineitem ⋈ part →
    // promo revenue share. Ratio of two decimal-exact sums with ONE final
    // double division (identical IEEE op on both engines); the part side
    // rides a broadcast.
    "q_tpch_q14" -> QueryDef.sql("""
      SELECT ROUND(100.00 *
               CAST(SUM(CASE WHEN p.p_type LIKE 'PROMO%'
                 THEN CAST(l_extendedprice*(1-l_discount) AS DECIMAL(30,6))
                 ELSE CAST(0 AS DECIMAL(30,6)) END) AS DOUBLE) /
               CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(30,6))) AS DOUBLE),
               6) AS promo_revenue
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      WHERE l.l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
        AND l.l_shipdate < TIMESTAMP '1996-04-01 00:00:00'""") { (s, d) =>
      val p = Tables.part(s, d).select("p_partkey", "p_type")
      val l = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-03-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
        .select("l_partkey", "l_extendedprice", "l_discount")
      val rev = (col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast(DecimalType(30, 6))
      l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
        .agg(round(lit(100.0) *
          sum(when(col("p_type").like("PROMO%"), rev)
            .otherwise(lit(0).cast(DecimalType(30, 6)))).cast("double") /
          sum(rev).cast("double"), 6).as("promo_revenue"))
    },

    "q_tpch_q16" -> QueryDef.sql("""
      SELECT p.p_brand, p.p_type, p.p_size,
             COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
      FROM part p JOIN lineitem l ON l.l_partkey = p.p_partkey
      WHERE p.p_brand <> 'Brand#3' AND p.p_type NOT LIKE 'ECONOMY%'
        AND p.p_size IN (1, 4, 9, 16, 25, 36, 49)
      GROUP BY p.p_brand, p.p_type, p.p_size
      ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""") { (s, d) =>
      val p = Tables.part(s, d)
        .filter(col("p_brand") =!= "Brand#3" &&
          !col("p_type").startsWith("ECONOMY") &&
          col("p_size").isin(1, 4, 9, 16, 25, 36, 49))
      Tables.lineitem(s, d)
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(countDistinct("l_suppkey").as("supplier_cnt"))
        .orderBy(desc("supplier_cnt"), asc("p_brand"), asc("p_type"), asc("p_size"))
    },

    // ----- TPC-H Q17 shape (small-quantity-order revenue): correlated
    // scalar subquery (20% of per-part average quantity) DE-correlated into
    // a per-partkey aggregate + equi-join — the rewrite every optimizer
    // performs, written explicitly so the plan is the 100 TB plan: the part
    // dim filters first and broadcasts, the avg aggregates only the
    // semi-joined lineitems. Determinism: l_quantity is integer-valued, so
    // AVG's partial sums are exact in doubles regardless of order; one
    // multiply + one compare, identical IEEE ops both engines.
    "q_tpch_q17" -> QueryDef.sql("""
      SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(30,2))) AS DOUBLE) / 7.0
               AS avg_yearly
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      WHERE p.p_brand = 'Brand#12' AND l.l_quantity < (
        SELECT 0.2 * AVG(l2.l_quantity) FROM lineitem l2
        WHERE l2.l_partkey = l.l_partkey)""") { (s, d) =>
      val p = Tables.part(s, d).filter(col("p_brand") === "Brand#12")
        .select("p_partkey")
      val li = Tables.lineitem(s, d)
        .join(broadcast(p), col("l_partkey") === col("p_partkey"), "left_semi")
      val avgs = li.groupBy(col("l_partkey").as("a_partkey"))
        .agg((sum("l_quantity") / count("l_quantity")).as("avg_qty"))
      li.join(avgs, col("l_partkey") === col("a_partkey"))
        .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
        .agg((dsum(col("l_extendedprice"), 2) / 7.0).as("avg_yearly"))
    },

    // ----- TPC-H Q21 shape (suppliers who kept orders waiting): the
    // EXISTS / NOT-EXISTS pair over other suppliers of the same order,
    // DE-correlated into one per-(order, supplier) aggregate + one
    // per-order rollup — no correlated self-joins, which is how the plan
    // must run at 100 TB (two keyed aggregations + two broadcast dims).
    // Testdata has no commit/receipt dates, so "late" = l_returnflag='R';
    // numwait counts qualifying orders per supplier (the order is counted
    // once per supplier, the decorrelated form's natural unit).
    "q_tpch_q21" -> QueryDef.sql("""
      WITH os AS (SELECT l_orderkey, l_suppkey,
                         MAX(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS ret
                  FROM lineitem GROUP BY l_orderkey, l_suppkey),
      stats AS (SELECT l_orderkey, COUNT(*) AS n_supps,
                       CAST(SUM(ret) AS BIGINT) AS n_ret
                FROM os GROUP BY l_orderkey),
      w AS (SELECT os.l_orderkey, os.l_suppkey
            FROM os JOIN stats USING (l_orderkey)
            WHERE os.ret = 1 AND stats.n_supps >= 2 AND stats.n_ret = 1),
      j AS (SELECT s.s_name
            FROM w JOIN supplier s ON s.s_suppkey = w.l_suppkey
                   JOIN orders o ON o.o_orderkey = w.l_orderkey
            WHERE o.o_orderstatus = 'F')
      SELECT s_name, COUNT(*) AS numwait FROM j
      GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100""") { (s, d) =>
      val os = Tables.lineitem(s, d)
        .groupBy("l_orderkey", "l_suppkey")
        .agg(max(when(col("l_returnflag") === "R", 1).otherwise(0)).as("ret"))
      val stats = os.groupBy("l_orderkey")
        .agg(count(lit(1)).as("n_supps"), sum("ret").as("n_ret"))
      val w = os.join(stats, "l_orderkey")
        .filter(col("ret") === 1 && col("n_supps") >= 2 && col("n_ret") === 1)
      w.join(broadcast(Tables.supplier(s, d)),
          col("l_suppkey") === col("s_suppkey"))
        .join(Tables.orders(s, d).filter(col("o_orderstatus") === "F")
            .select("o_orderkey"),
          col("l_orderkey") === col("o_orderkey"), "left_semi")
        .groupBy("s_name").agg(count(lit(1)).as("numwait"))
        .orderBy(desc("numwait"), asc("s_name"))
        .limit(100)
    },

    // ----- P1/P3/P5/P6: predicates + projection/rename (reference
    // ExtractCandidates.scala:98 filter-after-read; Utils.scala:276-281)
    "q_filter_project" -> QueryDef.sql("""
      SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority AS priority
      FROM orders WHERE o_orderstatus = 'F' AND o_totalprice > 1000.0
      ORDER BY o_orderkey""") { (s, d) =>
      Tables.orders(s, d)
        .filter(col("o_orderstatus") === "F" && col("o_totalprice") > 1000.0)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          col("o_orderpriority").as("priority"))
        .orderBy("o_orderkey")
    },

    // ----- O1: global top-K with total order (reference AnalysisUtils.scala:49-51)
    "q_topk" -> QueryDef.sql("""
      SELECT l_orderkey, l_linenumber, l_extendedprice
      FROM lineitem
      ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 25""") { (s, d) =>
      Tables.lineitem(s, d)
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(desc("l_extendedprice"), asc("l_orderkey"), asc("l_linenumber"))
        .limit(25)
    },

    // ----- J1/J7: multi-way equi-join + aggregate; small dims broadcast
    // (reference twoSidedJoin Utils.scala:251-260 → plain joins per SURVEY J1)
    "q_join_agg" -> QueryDef.sql("""
      SELECT n_name, CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(30,6))) AS DOUBLE) AS revenue,
             COUNT(*) AS n_items
      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
                    JOIN nation ON s_nationkey = n_nationkey
      GROUP BY n_name ORDER BY n_name""") { (s, d) =>
      Tables.lineitem(s, d)
        .join(broadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 6).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("n_name")
    },

    // ----- J2: blocked candidate-pair self-join. The reference builds pairs via
    // driver collect+broadcast+flatMap (ExtractCandidates.scala:150-169,
    // Utils.scala:46-105 `pairup`); here it is ONE declarative self-join with the
    // blocking key (c_mktsegment ~ cluster label) as equi-condition so Catalyst
    // plans a hash join, not a cartesian. Predicates mirror pk1<pk2, state1!=state2
    // and the length-ratio band (Utils.scala:79).
    "q_pairs_blocked" -> QueryDef.sql("""
      SELECT a.c_custkey AS custkey1, b.c_custkey AS custkey2, a.c_mktsegment AS segment
      FROM customer a JOIN customer b
        ON a.c_mktsegment = b.c_mktsegment
       AND a.c_custkey < b.c_custkey
       AND a.c_nationkey <> b.c_nationkey
       AND abs(a.c_acctbal - b.c_acctbal) < 100.0
      ORDER BY custkey1, custkey2""") { (s, d) =>
      // r13 (guide §2.5/§3.3): the segment-only equi-join had FIVE distinct
      // keys — a 5-partition skewed shuffle whose per-block work is
      // quadratic in the block size. The band predicate |Δacctbal| < 100
      // admits the standard band-bucket join (the CosineJoin ring-grid
      // trick in 1-D): bucket = ⌊acctbal/100⌋, one side joins on its own
      // (segment, bucket), the other explodes its 3-neighbor buckets —
      // |a−b| < 100 forces |Δbucket| ≤ 1, so every qualifying pair meets
      // exactly once (on a's own bucket) — and ALL original predicates are
      // re-applied in the join condition, so the output is row-identical.
      // Join-key cardinality goes 5 → 5×O(bal range/100), killing the skew;
      // per-cell work replaces per-segment quadratic work.
      val c = Tables.customer(s, d)
      val bucket = floor(col("c_acctbal") / 100.0).cast("long")
      val a = c.withColumn("__bk", bucket).alias("a")
      val b = c.withColumn("__bk0", bucket)
        .withColumn("__bk", explode(array(col("__bk0") - 1, col("__bk0"),
          col("__bk0") + 1)))
        .alias("b")
      a.join(b,
          col("a.c_mktsegment") === col("b.c_mktsegment") &&
          col("a.__bk") === col("b.__bk") &&
          col("a.c_custkey") < col("b.c_custkey") &&
          col("a.c_nationkey") =!= col("b.c_nationkey") &&
          abs(col("a.c_acctbal") - col("b.c_acctbal")) < 100.0)
        .select(col("a.c_custkey").as("custkey1"), col("b.c_custkey").as("custkey2"),
          col("a.c_mktsegment").as("segment"))
        .orderBy("custkey1", "custkey2")
    },

    // ----- A6 + §2.5: latest-version-per-key as a window query (replaces the
    // reference's groupByKey+sortWith+dropDuplicates, LatestVersionExtracter.scala:88,94)
    "q_latest_per_key" -> QueryDef.sql("""
      SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS latest_date
      FROM (SELECT o_custkey, o_orderkey, o_orderdate,
                   ROW_NUMBER() OVER (PARTITION BY o_custkey
                                      ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
            FROM orders) WHERE rn = 1
      ORDER BY o_custkey""") { (s, d) =>
      val w = Window.partitionBy("o_custkey")
        .orderBy(desc("o_orderdate"), desc("o_orderkey"))
      Tables.orders(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("o_custkey"), col("o_orderkey"),
          to_date(col("o_orderdate")).as("latest_date"))
        .orderBy("o_custkey")
    },

    // ----- A9: histogram with explicit under/overflow buckets (reference
    // Histogrammar Bin(n,lo,hi,col), utils/Plot.scala:31, README.md:133-155)
    "q_histogram" -> QueryDef.sql("""
      SELECT CASE WHEN l_quantity < 0 THEN -1
                  WHEN l_quantity >= 50 THEN 10
                  ELSE CAST(FLOOR(l_quantity/5.0) AS BIGINT) END AS bucket,
             COUNT(*) AS n
      FROM lineitem GROUP BY 1 ORDER BY bucket""") { (s, d) =>
      Tables.lineitem(s, d)
        .withColumn("bucket",
          when(col("l_quantity") < 0, lit(-1L))
            .when(col("l_quantity") >= 50, lit(10L))
            .otherwise(floor(col("l_quantity") / 5.0)))
        .groupBy("bucket").agg(count(lit(1)).as("n"))
        .orderBy("bucket")
    },

    // ----- semi/anti join semantics (SURVEY §2.3 note: reference only has the
    // include/exclude predicate pair P4 — expressed here as real semi/anti joins)
    "q_semi_join" -> QueryDef.sql("""
      SELECT c_custkey, c_name FROM customer
      WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 480000.0)
      ORDER BY c_custkey""") { (s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d).filter(col("o_totalprice") > 480000.0),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },

    "q_anti_join" -> QueryDef.sql("""
      SELECT c_custkey, c_name FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
      ORDER BY c_custkey""") { (s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d).filter(col("o_totalprice") > 400000.0),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },

    // ----- U1: UNION ALL (reference glob-union HarvestOutput.scala:25-26)
    "q_union_all" -> QueryDef.sql("""
      SELECT o_orderstatus, COUNT(*) AS n FROM (
        SELECT o_orderstatus FROM orders WHERE o_totalprice > 100000.0
        UNION ALL
        SELECT o_orderstatus FROM orders WHERE o_orderpriority = '1-URGENT')
      GROUP BY o_orderstatus ORDER BY o_orderstatus""") { (s, d) =>
      val o = Tables.orders(s, d)
      o.filter(col("o_totalprice") > 100000.0).select("o_orderstatus")
        .unionByName(o.filter(col("o_orderpriority") === "1-URGENT").select("o_orderstatus"))
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
        .orderBy("o_orderstatus")
    },

    // ----- S1-as-connector, STREAMED: the BillsGen DSv2 source read through
    // readStream (MICRO_BATCH_READ) — 5 admission-controlled micro-batches of
    // 1000 rows drain under AvailableNow into a per-state count. Offsets are
    // row indices, every batch regenerates from (seed, index), so replay from
    // any checkpoint is exact. ORACLE-CHECKED since round 6: DuckDB replays
    // the splitmix64 state derivation itself (see [[billsStateOracleSql]]) —
    // unsigned-64 arithmetic emulated in HUGEINT, xor in the signed-BIGINT
    // bit-pattern domain — so a drifted generator, dropped micro-batch or
    // double-counted offset now reddens the hash, not just a row count.
    // The streamed-equals-batch invariant stays BillsGenSourceSpec's.
    // Ignores sfDir by design (the source IS the data); serial because
    // replayToTable scopes session confs.
    "q_stream_bills_source" -> QueryDef.sql(billsStateOracleSql) { (s, _) =>
      graft.streaming.Streaming.replayToTable(
        s.readStream.format("graft.sources.BillsGen")
          .option("rows", "5000").option("rowsPerBatch", "1000").load()
          .groupBy("state").agg(count(lit(1)).as("n")),
        s"bills_source_${System.nanoTime()}")
        .orderBy("state")
    }.serial,

    // ----- S7: Avro source+sink round-trip through the AvroLite DSv2
    // connector (the spark-avro jar is absent offline; sources.AvroLite
    // reads/writes Avro container files over the Apache Avro core library
    // that IS on the classpath). The documents table is written to Avro
    // executor-side (one container file per partition), read back through
    // the connector, and aggregated — matching the oracle's direct parquet
    // aggregation proves both directions byte-faithful. The temp copy is
    // per-run (nanoTime dir) so concurrent Verify workers never collide.
    "q_avro_roundtrip" -> QueryDef.sql("""
      SELECT lang, COUNT(*) AS n_docs,
             CAST(SUM(n_chars) AS BIGINT) AS sum_chars
      FROM documents GROUP BY lang ORDER BY lang""") { (s, d) =>
      val dir = s"/tmp/graft_avro_${System.nanoTime()}"
      // the DSv2 write path (two-phase commit: temp files renamed into
      // place at driver job-commit, _SUCCESS marker)
      Tables.documents(s, d).write.format("graft.sources.AvroLite")
        .mode("overwrite").save(dir)
      s.read.format("graft.sources.AvroLite").load(dir)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_chars").cast("long").as("sum_chars"))
        .orderBy("lang")
    },

    // ----- S5/S8 widening (r11): ORC source+sink round-trip through Spark's
    // built-in columnar ORC connector (orc-core is on the offline classpath)
    // — the second columnar format next to Parquet, same pushdown/pruning
    // contract, the format a reader migrating an existing ORC lake would
    // use. Write → read → aggregate equal to the oracle's direct parquet
    // aggregation proves both directions value-faithful. Per-run temp dir,
    // same as q_avro_roundtrip.
    "q_orc_roundtrip" -> QueryDef.sql("""
      SELECT lang, COUNT(*) AS n_docs,
             CAST(SUM(n_chars) AS BIGINT) AS sum_chars
      FROM documents GROUP BY lang ORDER BY lang""") { (s, d) =>
      val dir = s"/tmp/graft_orc_${System.nanoTime()}"
      Tables.documents(s, d).write.mode("overwrite").orc(dir)
      s.read.orc(dir)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_chars").cast("long").as("sum_chars"))
        .orderBy("lang")
    },

    // ----- S5/S8 widening (r11): CSV source+sink round-trip (header +
    // explicit schema on read — never inferSchema at scale: inference is a
    // full extra pass). CSV is the interchange/ingest format; the gate
    // hashes a checksum that covers EVERY column including the text body
    // (order-independent sum of per-row 60-bit md5 prefixes mod 2³¹−1, the
    // q_minhash_sig replay pattern — a quoting/escaping fault on ANY row
    // shifts it), not just the numeric columns.
    "q_csv_roundtrip" -> QueryDef.sql("""
      SELECT lang, COUNT(*) AS n_docs,
             CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
             CAST(SUM(CAST('0x' || substr(md5(text), 1, 15) AS BIGINT)
                      % 2147483647) AS BIGINT) AS text_sum
      FROM documents GROUP BY lang ORDER BY lang""") { (s, d) =>
      val dir = s"/tmp/graft_csv_${System.nanoTime()}"
      val docs = Tables.documents(s, d)
      // lossless options (r11 self-review): the writer's whitespace-trim
      // defaults would silently drop leading/trailing spaces in text, and
      // the reader needs multiLine for quoted embedded newlines. multiLine
      // costs input splittability (whole-file records) — acceptable for an
      // interchange gate; a splittable high-volume ingest should guarantee
      // single-line records upstream instead.
      docs.write.mode("overwrite").option("header", "true")
        .option("ignoreLeadingWhiteSpace", "false")
        .option("ignoreTrailingWhiteSpace", "false")
        .csv(dir)
      val rowHash = pmod(
        conv(substring(md5(col("text").cast("binary")), 1, 15), 16, 10)
          .cast("long"), lit(2147483647L))
      s.read.schema(docs.schema).option("header", "true")
        .option("multiLine", "true")
        .option("ignoreLeadingWhiteSpace", "false")
        .option("ignoreTrailingWhiteSpace", "false")
        .csv(dir)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_chars").cast("long").as("sum_chars"),
          sum(rowHash).cast("long").as("text_sum"))
        .orderBy("lang")
    },

    // ----- S7 + §2.13: the SAME Avro directory consumed as a MICRO-BATCH
    // STREAM — AvroLite's file-arrival stream (offset = consumed-file count
    // over the name-sorted listing; admission-controlled 2 files/trigger;
    // AvailableNow drain pins the listing so the drain terminates). The
    // streamed aggregation must equal the oracle's batch aggregation over
    // the same rows — the streamed≡batch invariant, through Avro. Serial:
    // replayToTable scopes session confs.
    "q_stream_avro" -> QueryDef.sql("""
      SELECT lang, COUNT(*) AS n_docs FROM documents
      GROUP BY lang ORDER BY lang""") { (s, d) =>
      val dir = s"/tmp/graft_avro_stream_${System.nanoTime()}"
      Tables.documents(s, d).write.format("graft.sources.AvroLite")
        .mode("overwrite").save(dir)
      graft.streaming.Streaming.replayToTable(
          s.readStream.format("graft.sources.AvroLite")
            .option("maxFilesPerTrigger", "2").load(dir)
            .groupBy("lang").agg(count(lit(1)).as("n_docs")),
          s"stream_avro_${System.nanoTime()}")
        .orderBy("lang")
    }.serial,

    // ----- S6: whole-file text scan, one row per file (reference
    // utils/MetadataConverter.scala:37: sc.wholeTextFiles over a harvest dir
    // → per-file metadata). The harvest dir is materialized from the
    // documents table (one UTF-8 .txt per doc_id < 20 — a bounded driver
    // write, the shape of a real file-drop inbox), wholeText-read back, and
    // reduced to per-file metadata: id from the file name, char count, line
    // count, content md5. Matching the oracle's direct computation over the
    // documents table proves the scan is byte-faithful end to end.
    "q_wholetext_scan" -> QueryDef.sql("""
      SELECT doc_id,
             CAST(LENGTH(text) AS BIGINT) AS n_chars_scanned,
             CAST(LENGTH(text) - LENGTH(REPLACE(text, CHR(10), '')) + 1 AS BIGINT) AS n_lines,
             MD5(text) AS content_md5
      FROM documents WHERE doc_id < 20 ORDER BY doc_id""") { (s, d) =>
      val dir = java.nio.file.Files.createTempDirectory("graft_wholetext_")
      Tables.documents(s, d).filter(col("doc_id") < 20)
        .select("doc_id", "text").collect()  // bounded: 20 rows
        .foreach { r =>
          java.nio.file.Files.writeString(
            dir.resolve(s"doc_${r.getLong(0)}.txt"), r.getString(1))
        }
      Tables.wholeText(s, dir.toString)
        .select(col("value"),
          element_at(split(input_file_name(), "/"), -1).as("fname"))
        .select(
          regexp_extract(col("fname"), "doc_(\\d+)\\.txt", 1)
            .cast("long").as("doc_id"),
          length(col("value")).cast("long").as("n_chars_scanned"),
          (length(col("value")) -
            length(regexp_replace(col("value"), "\n", "")) + 1)
            .cast("long").as("n_lines"),
          md5(col("value").cast("binary")).as("content_md5"))
        .orderBy("doc_id")
    },

    // ----- S9: JSON-lines sink + source round-trip (reference
    // utils/Postprocessor.scala:38: results written with df.write.json). A
    // documents slice goes out through the stock JSON sink and back in
    // through the schema-declared JSON-lines reader (Tables.jsonLines, the
    // S1 surface); matching the oracle's direct parquet read proves sink
    // escaping and source parsing are lossless, text column included.
    "q_json_sink" -> QueryDef.sql("""
      SELECT doc_id, lang, source, n_chars, MD5(text) AS content_md5
      FROM documents WHERE doc_id < 100 ORDER BY doc_id""") { (s, d) =>
      val dir = s"/tmp/graft_json_sink_${System.nanoTime()}"
      Tables.documents(s, d).filter(col("doc_id") < 100)
        .write.mode("overwrite").json(dir)
      Tables.jsonLines(s, dir, Tables.schemas("documents"))
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
          md5(col("text").cast("binary")).as("content_md5"))
        .orderBy("doc_id")
    },

    // ----- extension: CUBE over two independent dims (ROLLUP: q_rollup)
    "q_cube" -> QueryDef.sql("""
      SELECT COALESCE(o_orderstatus, '(all)') AS o_orderstatus,
             COALESCE(o_orderpriority, '(all)') AS o_orderpriority,
             COUNT(*) AS n,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE) AS total
      FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
      ORDER BY o_orderstatus, o_orderpriority""") { (s, d) =>
      Tables.orders(s, d)
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
        .select(coalesce(col("o_orderstatus"), lit("(all)")).as("o_orderstatus"),
          coalesce(col("o_orderpriority"), lit("(all)")).as("o_orderpriority"),
          col("n"), col("total"))
        .orderBy("o_orderstatus", "o_orderpriority")
    },

    // ----- extension: the real RelationalGroupedDataset.pivot() operator —
    // event counts per user across a FIXED pivot-column domain (explicit
    // value list keeps the plan single-pass and the schema static; the
    // conditional-aggregation encoding of the same shape is q_pivot)
    "q_pivot_wide" -> QueryDef.sql("""
      SELECT user_id,
             CAST(COALESCE(SUM(CASE WHEN event_type='click' THEN 1 END), 0) AS BIGINT) AS click,
             CAST(COALESCE(SUM(CASE WHEN event_type='purchase' THEN 1 END), 0) AS BIGINT) AS purchase,
             CAST(COALESCE(SUM(CASE WHEN event_type='view' THEN 1 END), 0) AS BIGINT) AS view
      FROM events GROUP BY user_id ORDER BY user_id""") { (s, d) =>
      Tables.events(s, d)
        .groupBy("user_id")
        .pivot("event_type", Seq("click", "purchase", "view"))
        .agg(count(lit(1)))
        .na.fill(0L, Seq("click", "purchase", "view"))
        .orderBy("user_id")
    },

    // ----- extension: TRANSPOSE (Spark 4 Dataset.transpose) — flip a small
    // per-type stats frame to metric-rows × type-columns. Only sane on
    // aggregate-sized frames (the column count IS the row count), which is
    // exactly its report-shaping use; the oracle hand-builds the flip with
    // one conditional-max row per metric.
    "q_transpose" -> QueryDef.sql("""
      WITH g AS (SELECT event_type, CAST(COUNT(*) AS DOUBLE) AS n,
                        CAST(SUM(CAST(value AS DECIMAL(30,2))) AS DOUBLE) AS total
                 FROM events GROUP BY event_type)
      SELECT 'n' AS key,
             MAX(CASE WHEN event_type='click' THEN n END) AS click,
             MAX(CASE WHEN event_type='error' THEN n END) AS error,
             MAX(CASE WHEN event_type='purchase' THEN n END) AS purchase,
             MAX(CASE WHEN event_type='signup' THEN n END) AS signup,
             MAX(CASE WHEN event_type='view' THEN n END) AS view
      FROM g
      UNION ALL
      SELECT 'total',
             MAX(CASE WHEN event_type='click' THEN total END),
             MAX(CASE WHEN event_type='error' THEN total END),
             MAX(CASE WHEN event_type='purchase' THEN total END),
             MAX(CASE WHEN event_type='signup' THEN total END),
             MAX(CASE WHEN event_type='view' THEN total END)
      FROM g
      ORDER BY key""") { (s, d) =>
      Tables.events(s, d)
        .groupBy("event_type")
        .agg(count(lit(1)).cast("double").as("n"),
          sum(col("value").cast(DecimalType(30, 2))).cast("double").as("total"))
        .transpose(col("event_type"))
        .orderBy("key")
    },

    // ----- extension: UNPIVOT/melt — wide metrics back to long form
    "q_unpivot" -> QueryDef.sql("""
      SELECT o_orderkey, metric, CAST(val AS DOUBLE) AS val FROM (
        SELECT o_orderkey, 'totalprice' AS metric, o_totalprice AS val FROM orders
        UNION ALL
        SELECT o_orderkey, 'custkey', CAST(o_custkey AS DOUBLE) FROM orders)
      WHERE o_orderkey <= 1000 ORDER BY o_orderkey, metric""") { (s, d) =>
      Tables.orders(s, d)
        .filter(col("o_orderkey") <= 1000)
        .select(col("o_orderkey"), col("o_totalprice").as("totalprice"),
          col("o_custkey").cast("double").as("custkey"))
        .unpivot(Array(col("o_orderkey")), Array(col("totalprice"), col("custkey")),
          "metric", "val")
        .orderBy("o_orderkey", "metric")
    },

    // ----- extension: INTERSECT / EXCEPT (reference has neither, SURVEY
    // §2.7 — completeness): customers appearing in both halves / only the
    // first half of an order split
    "q_set_ops" -> QueryDef.sql("""
      WITH hi AS (SELECT DISTINCT o_custkey FROM orders WHERE o_totalprice > 150000.0),
           ur AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
      SELECT 'both' AS side, o_custkey FROM (SELECT o_custkey FROM hi INTERSECT SELECT o_custkey FROM ur)
      UNION ALL
      SELECT 'hi_only', o_custkey FROM (SELECT o_custkey FROM hi EXCEPT SELECT o_custkey FROM ur)
      ORDER BY side, o_custkey""") { (s, d) =>
      val o = Tables.orders(s, d)
      val hi = o.filter(col("o_totalprice") > 150000.0).select("o_custkey").distinct()
      val ur = o.filter(col("o_orderpriority") === "1-URGENT").select("o_custkey").distinct()
      hi.intersect(ur).select(lit("both").as("side"), col("o_custkey"))
        .unionByName(hi.except(ur).select(lit("hi_only").as("side"), col("o_custkey")))
        .orderBy("side", "o_custkey")
    },

    // ----- A2: countDistinct (reference docs/tuning_kmeans.md:21,117)
    // ----- extension: bloom-prefiltered selective join — big-side rows that
    // cannot match are dropped before the shuffle (operators.BloomPrefilter);
    // false positives only waste a row in the exact join, so the result is
    // exactly the plain join and the plain join IS the oracle
    "q_bloom_join" -> QueryDef.sql("""
      SELECT o_orderpriority, COUNT(*) AS n_items,
             CAST(SUM(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE) AS total_qty
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderpriority = '1-URGENT'
      GROUP BY o_orderpriority ORDER BY o_orderpriority""") { (s, d) =>
      import graft.operators.BloomPrefilter
      BloomPrefilter.join(
          Tables.lineitem(s, d).select("l_orderkey", "l_quantity"),
          Tables.orders(s, d).filter(col("o_orderpriority") === "1-URGENT")
            .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority")),
          "l_orderkey", expected = 1000000L, fpp = 0.01)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_items"), dsum(col("l_quantity")).as("total_qty"))
        .orderBy("o_orderpriority")
    },

    // ----- extension: sketch cardinality — HLL++ approx distinct per key.
    // DuckDB's HLL is a different sketch, so the estimate itself cannot be
    // oracle-matched — instead the gate is ERROR-CERTIFIED: Spark computes
    // both the HLL++ estimate and the exact count and emits a within_bound
    // flag (|approx−exact| ≤ 3·rsd·exact); the oracle emits the exact counts
    // with a literal TRUE. A sketch drifting outside its advertised error
    // band flips the flag and the hash goes red — a strictly stronger check
    // than the old rows-only pin. (The estimate-vs-rsd distribution is
    // additionally spec-covered in SketchesSpec.)
    "q_approx_distinct" -> QueryDef.sql("""
      SELECT event_type,
             COUNT(DISTINCT user_id) AS n_users_exact,
             COUNT(*) AS n_events,
             TRUE AS within_bound
      FROM events GROUP BY event_type ORDER BY event_type""") { (s, d) =>
      Tables.events(s, d)
        .groupBy("event_type")
        .agg(approx_count_distinct(col("user_id"), 0.02).as("approx"),
          count_distinct(col("user_id")).as("n_users_exact"),
          count(lit(1)).as("n_events"))
        .select(col("event_type"), col("n_users_exact"), col("n_events"),
          (abs(col("approx") - col("n_users_exact")) <=
            lit(3 * 0.02) * col("n_users_exact")).as("within_bound"))
        .orderBy("event_type")
    },

    // ----- extension: HLL SKETCH MAINTENANCE — the mergeable-state form of
    // distinct counting: per-slice Datasketches HLL sketches (8 slices
    // standing in for daily partitions) merged with hll_union_agg, vs the
    // single-pass sketch over the raw rows. HLL registers are per-bucket
    // maxima, and union takes the elementwise max, so merged ≡ direct
    // EXACTLY — which is what makes sketches the 100 TB pattern: month =
    // union of 30 daily sketches, no raw re-scan. ERROR-CERTIFIED like
    // q_approx_distinct (DuckDB's HLL is a different sketch, so the estimate
    // itself is not oracle-matchable): Spark emits `merge_exact`
    // (merged == direct, the lossless-merge law) and `within_bound`
    // (|direct − exact| ≤ 3·rsd·exact at lgK = 14, rsd ≈ 1.04/√2¹⁴ ≈ 0.81%)
    // against the oracle's literal TRUEs plus exact distinct counts — a
    // drifted merge or an out-of-band sketch flips a flag and the hash goes
    // red. Estimate-value pins live on in SketchesSpec.
    "q_hll_merge" -> QueryDef.sql("""
      SELECT event_type,
             COUNT(DISTINCT user_id) AS n_users_exact,
             TRUE AS merge_exact,
             TRUE AS within_bound
      FROM events GROUP BY event_type ORDER BY event_type""") { (s, d) =>
      val e = Tables.events(s, d)
      val slices = e.withColumn("slice", col("event_id") % 8)
        .groupBy("event_type", "slice")
        .agg(hll_sketch_agg(col("user_id"), lit(14)).as("sk"))
      val merged = slices.groupBy("event_type")
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"), lit(false)))
          .as("n_users_merged"))
      val direct = e.groupBy("event_type")
        .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"), lit(14)))
          .as("n_users_direct"),
          count_distinct(col("user_id")).as("n_users_exact"))
      merged.join(direct, "event_type")
        .select(col("event_type"), col("n_users_exact"),
          (col("n_users_merged") === col("n_users_direct")).as("merge_exact"),
          (abs(col("n_users_direct") - col("n_users_exact")) <=
            lit(3 * 0.0082) * col("n_users_exact")).as("within_bound"))
        .orderBy("event_type")
    },

    // ----- extension: sketch point frequency — Count-Min (Cormode &
    // Muthukrishnan 2005), the frequency analogue of the HLL cardinality
    // gate. ERROR-CERTIFIED like q_approx_distinct: DuckDB cannot replay the
    // sketch, so Spark emits, for the top-20 users by exact event count, the
    // CMS guarantee's two sides — over_ok (the estimate never undercounts)
    // and band_ok (overcount ≤ (e/width)·N) — probed from ONE broadcast
    // 64 KB sketch with pure builtin Columns (functions.CountMin.estimate:
    // bit-mix / element_at / least, no UDF on the probe path); the oracle
    // emits the exact counts with literal TRUEs. The top-20 pick is
    // TakeOrderedAndProject (orderBy+limit), not a global-window
    // row_number — no single-partition sort at scale.
    //
    // Band slack note: (e/w)·N is a PROBABILISTIC bound (per-probe failure
    // ≈ e⁻⁴ at Depth 4) — deterministic for a fixed fixture, but a
    // regenerated fixture could legitimately land a key outside it with no
    // code defect (a-priori ≈ 30% for at least one of 20 keys). The GATE
    // therefore certifies 2·(e/w)·N (failure ≈ e⁻⁸ per probe, < 0.7% for
    // all 20 — fixture-robust); the tight 1× band stays asserted in
    // CountMinSpec where a local re-pin is cheap.
    "q_cms_topk" -> QueryDef.sql("""
      SELECT user_id, n_exact, TRUE AS over_ok, TRUE AS band_ok FROM (
        SELECT user_id, COUNT(*) AS n_exact FROM events GROUP BY user_id
        ORDER BY n_exact DESC, user_id LIMIT 20)
      ORDER BY user_id""") { (s, d) =>
      import graft.functions.CountMin
      val e = Tables.events(s, d)
      val sk = e.agg(CountMin.countMin()(col("user_id")).as("sk"),
        count(lit(1)).as("n_total"))
      val est = CountMin.estimate(col("sk"), col("user_id"))
      e.groupBy("user_id").agg(count(lit(1)).as("n_exact"))
        .orderBy(col("n_exact").desc, col("user_id")).limit(20)
        .crossJoin(broadcast(sk))
        .select(col("user_id"), col("n_exact"),
          (est >= col("n_exact")).as("over_ok"),
          (est <= col("n_exact") +
            lit(2L) * CountMin.errorBound(col("n_total")))
            .as("band_ok"))
        .orderBy("user_id")
    },

    // ----- extension: SKEW — salted shuffle join (operators.SkewOps). Same
    // result as the plain lineitem⋈orders join; the salt spreads any hot
    // orderkey over 8 shuffle partitions. merge hint keeps it shuffle-based
    // (salting a broadcast join would be pointless).
    "q_salted_join" -> QueryDef.sql("""
      SELECT o_orderpriority, COUNT(*) AS n_items,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,2))) AS DOUBLE) AS total_price
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY o_orderpriority ORDER BY o_orderpriority""") { (s, d) =>
      import graft.operators.SkewOps
      SkewOps.saltedJoin(
          Tables.lineitem(s, d).select("l_orderkey", "l_extendedprice"),
          Tables.orders(s, d).select("o_orderkey", "o_orderpriority")
            .withColumnRenamed("o_orderkey", "l_orderkey").hint("merge"),
          Seq("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_items"),
          dsum(col("l_extendedprice")).as("total_price"))
        .orderBy("o_orderpriority")
    },

    // ----- extension: SKEW — two-shuffle exact distinct (dedup on
    // (key,value) first, count second) so one hot key's duplicate values
    // can't pin a single reducer
    "q_distinct_rewrite" -> QueryDef.sql("""
      SELECT event_type, COUNT(DISTINCT user_id) AS n_distinct_user_id
      FROM events GROUP BY event_type ORDER BY event_type""") { (s, d) =>
      graft.operators.SkewOps.exactCountDistinct(
          Tables.events(s, d), Seq("event_type"), "user_id")
        .orderBy("event_type")
    },

    "q_count_distinct" -> QueryDef.sql("""
      SELECT c_mktsegment, COUNT(DISTINCT c_nationkey) AS n_nations, COUNT(*) AS n_cust
      FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""") { (s, d) =>
      Tables.customer(s, d)
        .groupBy("c_mktsegment")
        .agg(countDistinct(col("c_nationkey")).as("n_nations"), count(lit(1)).as("n_cust"))
        .orderBy("c_mktsegment")
    },

    // ----- P8: deterministic duplicate elimination by key (reference
    // dropDuplicates LatestVersionExtracter.scala:94, made deterministic)
    "q_dedup_by_key" -> QueryDef.sql("""
      SELECT o_custkey, MIN(o_orderkey) AS first_orderkey
      FROM orders GROUP BY o_custkey ORDER BY o_custkey""") { (s, d) =>
      Tables.orders(s, d)
        .groupBy("o_custkey").agg(min(col("o_orderkey")).as("first_orderkey"))
        .orderBy("o_custkey")
    },

    // ----- A7: descriptive stats (reference data.describe(), README.md:106-116)
    "q_describe" -> QueryDef.sql("""
      SELECT COUNT(o_totalprice) AS cnt,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE)/COUNT(o_totalprice) AS mean,
             MIN(o_totalprice) AS min_v, MAX(o_totalprice) AS max_v
      FROM orders""") { (s, d) =>
      Tables.orders(s, d).agg(
        count(col("o_totalprice")).as("cnt"),
        (dsum(col("o_totalprice")) / count(col("o_totalprice"))).as("mean"),
        min(col("o_totalprice")).as("min_v"),
        max(col("o_totalprice")).as("max_v"))
    },

    // ----- A7 extension: ANALYZE-style catalog statistics — per-column
    // n_rows / n_null / exact NDV / min / max, the stats a cost-based
    // optimizer (and a 100 TB layout audit) feeds on. ONE scan: all the
    // aggregates run in a single agg (Spark plans the multi-distinct via one
    // Expand), then stack() unpivots the row to per-column records. min/max
    // serialize through integer-exact channels only (bigint/string/epoch-ms),
    // so the oracle compare never touches float formatting. At 100 TB the
    // same query swaps countDistinct for approx_count_distinct — the shape
    // (one pass, no joins) is the point.
    "q_table_stats" -> QueryDef.sql("""
      SELECT * FROM (
        SELECT 'l_orderkey' AS column_name, COUNT(*) AS n_rows,
               COUNT(*) - COUNT(l_orderkey) AS n_null,
               COUNT(DISTINCT l_orderkey) AS n_distinct,
               CAST(MIN(l_orderkey) AS VARCHAR) AS min_s,
               CAST(MAX(l_orderkey) AS VARCHAR) AS max_s
        FROM lineitem
        UNION ALL
        SELECT 'l_linenumber', COUNT(*), COUNT(*) - COUNT(l_linenumber),
               COUNT(DISTINCT l_linenumber),
               CAST(MIN(l_linenumber) AS VARCHAR), CAST(MAX(l_linenumber) AS VARCHAR)
        FROM lineitem
        UNION ALL
        SELECT 'l_returnflag', COUNT(*), COUNT(*) - COUNT(l_returnflag),
               COUNT(DISTINCT l_returnflag),
               MIN(l_returnflag), MAX(l_returnflag)
        FROM lineitem
        UNION ALL
        SELECT 'l_shipdate', COUNT(*), COUNT(*) - COUNT(l_shipdate),
               COUNT(DISTINCT l_shipdate),
               CAST(epoch_ms(MIN(l_shipdate)) AS VARCHAR),
               CAST(epoch_ms(MAX(l_shipdate)) AS VARCHAR)
        FROM lineitem)
      ORDER BY column_name""") { (s, d) =>
      // spread (r13): the four COUNT(DISTINCT)s plan through a ×5 Expand —
      // the one agg whose MAP side is ~5× the scan's row count in CPU — and
      // the 3-row-group fixture pinned that to 3 tasks (profiled 6.2 s CPU
      // on 3 tasks of a 6.5 s stage); no-op on well-split tables
      Tables.spread(Tables.lineitem(s, d)).agg(
          count(lit(1)).as("n"),
          count(col("l_orderkey")).as("nn_ok"),
          countDistinct(col("l_orderkey")).as("nd_ok"),
          min(col("l_orderkey")).cast("string").as("mn_ok"),
          max(col("l_orderkey")).cast("string").as("mx_ok"),
          count(col("l_linenumber")).as("nn_ln"),
          countDistinct(col("l_linenumber")).as("nd_ln"),
          min(col("l_linenumber")).cast("string").as("mn_ln"),
          max(col("l_linenumber")).cast("string").as("mx_ln"),
          count(col("l_returnflag")).as("nn_rf"),
          countDistinct(col("l_returnflag")).as("nd_rf"),
          min(col("l_returnflag")).as("mn_rf"),
          max(col("l_returnflag")).as("mx_rf"),
          count(col("l_shipdate")).as("nn_sd"),
          countDistinct(col("l_shipdate")).as("nd_sd"),
          // l_shipdate parquet-reads as TIMESTAMP_NTZ; the session tz is
          // pinned UTC, so the NTZ→instant cast is the same epoch DuckDB's
          // epoch_ms computes on the naive value
          unix_millis(min(col("l_shipdate")).cast("timestamp")).cast("string").as("mn_sd"),
          unix_millis(max(col("l_shipdate")).cast("timestamp")).cast("string").as("mx_sd"))
        .selectExpr("""stack(4,
          'l_orderkey',  n, n - nn_ok, nd_ok, mn_ok, mx_ok,
          'l_linenumber', n, n - nn_ln, nd_ln, mn_ln, mx_ln,
          'l_returnflag', n, n - nn_rf, nd_rf, mn_rf, mx_rf,
          'l_shipdate',  n, n - nn_sd, nd_sd, mn_sd, mx_sd)
          AS (column_name, n_rows, n_null, n_distinct, min_s, max_s)""")
        .orderBy("column_name")
    },

    // ----- A7 extension: higher-moment statistics (stddev / skewness /
    // kurtosis). Spark's builtin skewness/kurtosis stream central moments in
    // partition order (non-deterministic doubles), so both engines derive the
    // moments from EXACT power sums instead: l_quantity is integer-valued
    // ≤ 50, so Σx..Σx⁴ stay below 2^53 and every partial sum is exact in a
    // double regardless of aggregation order; the derived formulas then run
    // the identical IEEE expression tree on both sides (population moments).
    "q_stats_moments" -> QueryDef.sql("""
      WITH s AS (SELECT COUNT(*) AS n,
                        CAST(SUM(l_quantity) AS BIGINT) AS s1,
                        CAST(SUM(l_quantity*l_quantity) AS BIGINT) AS s2,
                        CAST(SUM(l_quantity*l_quantity*l_quantity) AS BIGINT) AS s3,
                        CAST(SUM(l_quantity*l_quantity*l_quantity*l_quantity) AS BIGINT) AS s4
                 FROM lineitem),
      m AS (SELECT n, s1, s2, s3, s4,
                   CAST(s1 AS DOUBLE)/n AS mean,
                   CAST(s2 AS DOUBLE)/n - (CAST(s1 AS DOUBLE)/n)*(CAST(s1 AS DOUBLE)/n) AS m2
            FROM s)
      SELECT n, s1, s2, s3, s4,
             ROUND(mean, 6) AS mean,
             ROUND(SQRT(m2), 6) AS stddev_pop,
             ROUND((CAST(s3 AS DOUBLE)/n - 3*mean*CAST(s2 AS DOUBLE)/n
                    + 2*mean*mean*mean) / POW(m2, 1.5), 6) AS skewness,
             ROUND((CAST(s4 AS DOUBLE)/n - 4*mean*CAST(s3 AS DOUBLE)/n
                    + 6*mean*mean*CAST(s2 AS DOUBLE)/n - 3*mean*mean*mean*mean)
                   / (m2*m2) - 3, 6) AS kurtosis
      FROM m""") { (s, d) =>
      val q = col("l_quantity")
      val sums = Tables.lineitem(s, d).agg(
        count(lit(1)).as("n"),
        sum(q).cast("long").as("s1"),
        sum(q * q).cast("long").as("s2"),
        sum(q * q * q).cast("long").as("s3"),
        sum(q * q * q * q).cast("long").as("s4"))
      val mean = col("s1").cast("double") / col("n")
      val m2 = col("s2").cast("double") / col("n") - mean * mean
      sums.select(col("n"), col("s1"), col("s2"), col("s3"), col("s4"),
        round(mean, 6).as("mean"),
        round(sqrt(m2), 6).as("stddev_pop"),
        round((col("s3").cast("double") / col("n") - lit(3) * mean * col("s2").cast("double") / col("n")
          + lit(2) * mean * mean * mean) / pow(m2, 1.5), 6).as("skewness"),
        round((col("s4").cast("double") / col("n") - lit(4) * mean * col("s3").cast("double") / col("n")
          + lit(6) * mean * mean * col("s2").cast("double") / col("n")
          - lit(3) * mean * mean * mean * mean) / (m2 * m2) - 3, 6).as("kurtosis"))
    },

    // ----- A8: Pearson correlation (reference Statistics.corr,
    // docs/correlations.md:94-97); rounded once on both sides
    "q_corr" -> QueryDef.sql("""
      SELECT ROUND(CORR(l_quantity, l_extendedprice), 4) AS corr_qty_price
      FROM lineitem""") { (s, d) =>
      Tables.lineitem(s, d)
        .agg(round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("corr_qty_price"))
    },

    // ----- A7 extension: exact interpolated quantiles (both engines use the
    // same linear-interpolation definition; single rounding on both sides)
    "q_quantiles" -> QueryDef.sql("""
      SELECT p, ROUND(v, 6) AS v FROM (
        SELECT unnest([0.25, 0.5, 0.75]) AS p,
               unnest(quantile_cont(l_extendedprice, [0.25, 0.5, 0.75])) AS v
        FROM lineitem)
      ORDER BY p""") { (s, d) =>
      val ps = Seq(0.25, 0.5, 0.75)
      Tables.lineitem(s, d)
        .agg(percentile(col("l_extendedprice"), typedLit(ps)).as("vs"))
        .select(posexplode(col("vs")).as(Seq("i", "v")))
        .select(element_at(typedLit(ps), col("i").cast("int") + 1).as("p"),
          round(col("v"), 6).as("v"))
        .orderBy("p")
    },

    // ----- A7 extension: exact median WITHOUT a global sort — the 100 TB
    // path for q_quantiles' semantics. Spark's exact percentile() collects
    // every group value into one aggregation buffer; operators.Quantile2Pass
    // instead takes a histogram pass + a one-bin TakeOrdered (recursing on
    // value-skewed bins), touching the driver with only nBins counters. The
    // answer is the identical data element, so the double compares bit-equal.
    "q_median_2pass" -> QueryDef.sql("""
      WITH c AS (SELECT COUNT(*) AS n FROM lineitem)
      SELECT n, (n+1)//2 AS k,
             (SELECT l_extendedprice FROM lineitem
              ORDER BY l_extendedprice
              LIMIT 1 OFFSET (SELECT (n+1)//2 - 1 FROM c)) AS v
      FROM c""") { (s, d) =>
      import s.implicits._
      val li = Tables.lineitem(s, d)
      val n = li.count()
      val k = (n + 1) / 2
      val v = graft.operators.Quantile2Pass.kthSmallest(li, "l_extendedprice", k)
      Seq((n, k, v)).toDF("n", "k", "v")
    },

    // ----- O5: deterministic systematic sample (reference Bernoulli sample
    // AnalysisUtils.scala:98-104 is seed-dependent; modulo sampling is the
    // oracle-checkable equivalent)
    "q_sample_mod" -> QueryDef.sql("""
      SELECT o_orderkey, o_totalprice FROM orders
      WHERE o_orderkey % 17 = 0 ORDER BY o_orderkey""") { (s, d) =>
      Tables.orders(s, d)
        .filter(col("o_orderkey") % 17 === 0)
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
    },

    // ----- extension: ROLLUP multi-level aggregation (no grouping sets in the
    // reference; a training-data pipeline reports at multiple granularities)
    "q_rollup" -> QueryDef.sql("""
      SELECT COALESCE(o_orderstatus, 'ALL') AS status,
             COALESCE(o_orderpriority, 'ALL') AS priority,
             COUNT(*) AS n,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE) AS total
      FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
      ORDER BY status, priority""") { (s, d) =>
      Tables.orders(s, d)
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
        .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("n"), col("total"))
        .orderBy("status", "priority")
    },

    // ----- A7 extension: per-group percentile bands — the p50/p95/p99
    // latency-style report, exact interpolated quantiles per event type
    // (same quantile_cont/percentile definition as the global q_quantiles;
    // single rounding on both sides). At 100 TB, groups partition the data
    // so each group's buffer is bounded by its own cardinality; for a group
    // too big for that, q_median_2pass's bracketing is the fallback shape.
    "q_percentile_groups" -> QueryDef.sql("""
      SELECT event_type,
             ROUND(quantile_cont(value, 0.50), 6) AS p50,
             ROUND(quantile_cont(value, 0.95), 6) AS p95,
             ROUND(quantile_cont(value, 0.99), 6) AS p99
      FROM events GROUP BY event_type ORDER BY event_type""") { (s, d) =>
      Tables.events(s, d)
        .groupBy("event_type")
        .agg(
          round(percentile(col("value"), lit(0.50)), 6).as("p50"),
          round(percentile(col("value"), lit(0.95)), 6).as("p95"),
          round(percentile(col("value"), lit(0.99)), 6).as("p99"))
        .orderBy("event_type")
    },

    // ----- extension: PIVOT as conditional aggregation (oracle = FILTER aggs)
    "q_pivot" -> QueryDef.sql("""
      SELECT o_orderstatus,
             COUNT(*) FILTER (o_orderpriority = '1-URGENT') AS urgent,
             COUNT(*) FILTER (o_orderpriority = '5-LOW') AS low,
             COUNT(*) FILTER (o_orderpriority NOT IN ('1-URGENT','5-LOW')) AS mid
      FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""") { (s, d) =>
      Tables.orders(s, d)
        .groupBy("o_orderstatus")
        .agg(
          count(when(col("o_orderpriority") === "1-URGENT", 1)).as("urgent"),
          count(when(col("o_orderpriority") === "5-LOW", 1)).as("low"),
          count(when(!col("o_orderpriority").isin("1-URGENT", "5-LOW"), 1)).as("mid"))
        .orderBy("o_orderstatus")
    },

    // ----- F9/F10: date parsing/truncation (reference getTimestampString_udf +
    // to_timestamp, LatestVersionExtracter.scala:10-48)
    "q_date_trunc" -> QueryDef.sql("""
      SELECT CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS month,
             COUNT(*) AS n,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE) AS total
      FROM orders GROUP BY 1 ORDER BY month""") { (s, d) =>
      Tables.orders(s, d)
        .groupBy(date_trunc("month", col("o_orderdate")).cast(DateType).as("month"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
        .orderBy("month")
    },

    // ----- F9 faithful form: parse a '"January 5, 1994"'-style date string
    // with a custom format, defaulting unparseable input to 1900-12-31 — the
    // reference's getTimestampString_udf contract
    // (LatestVersionExtracter.scala:10-44) as try_to_date + coalesce, no UDF.
    // The string column is synthesized from o_orderdate (with every 7th row
    // corrupted) so BOTH the format round-trip and the fallback are checked.
    "q_date_parse" -> QueryDef.sql("""
      SELECT COALESCE(TRY_STRPTIME(raw, '%B %-d, %Y')::DATE, DATE '1900-12-31') AS d,
             COUNT(*) AS n
      FROM (SELECT CASE WHEN o_orderkey % 7 = 0 THEN 'not a date'
                        ELSE strftime(o_orderdate, '%B %-d, %Y') END AS raw
            FROM orders)
      GROUP BY d ORDER BY d""") { (s, d) =>
      Tables.orders(s, d)
        .select(when(col("o_orderkey") % 7 === 0, lit("not a date"))
          .otherwise(date_format(col("o_orderdate"), "MMMM d, yyyy")).as("raw"))
        .select(coalesce(try_to_timestamp(col("raw"), lit("MMMM d, yyyy")).cast(DateType),
          to_date(lit("1900-12-31"))).as("d"))
        .groupBy("d").agg(count(lit(1)).as("n"))
        .orderBy("d")
    },

    // ----- F8: CASE WHEN routing (reference takeSmaller/LargerContent_udf,
    // AnalysisUtils.scala:142-156 → when/otherwise)
    "q_case_when" -> QueryDef.sql("""
      SELECT CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 'high' ELSE 'low' END AS prio_class,
             COUNT(*) AS n,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE) AS total
      FROM orders GROUP BY 1 ORDER BY prio_class""") { (s, d) =>
      Tables.orders(s, d)
        .withColumn("prio_class",
          when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "high").otherwise("low"))
        .groupBy("prio_class")
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
        .orderBy("prio_class")
    },

    // ----- P4: dynamic include-list predicate (reference appendFeature_udf OR-list
    // from file, Utils.scala:284-305 → isin)
    "q_isin" -> QueryDef.sql("""
      SELECT n_name, r_name FROM nation JOIN region ON n_regionkey = r_regionkey
      WHERE n_nationkey IN (0, 3, 7, 11, 19, 23) ORDER BY n_name""") { (s, d) =>
      Tables.nation(s, d)
        .filter(col("n_nationkey").isin(0, 3, 7, 11, 19, 23))
        .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .select("n_name", "r_name")
        .orderBy("n_name")
    },

    // ----- A6 full form: latest-version pick by PRECEDENCE LIST then date —
    // the reference's getLatest (LatestVersionExtracter.scala:50-59) ranks
    // docversions by a fixed precedence before falling back to timestamps;
    // array_position turns the list into a sortable rank on both engines
    "q_latest_precedence" -> QueryDef.sql("""
      SELECT o_custkey, o_orderkey, o_orderpriority
      FROM (SELECT o_custkey, o_orderkey, o_orderpriority,
                   ROW_NUMBER() OVER (
                     PARTITION BY o_custkey
                     ORDER BY list_position(['1-URGENT','2-HIGH','3-MEDIUM',
                                             '4-NOT SPECIFIED','5-LOW'],
                                            o_orderpriority),
                              o_orderdate DESC, o_orderkey DESC) AS rn
            FROM orders) WHERE rn = 1
      ORDER BY o_custkey""") { (s, d) =>
      val precedence = Seq("1-URGENT", "2-HIGH", "3-MEDIUM",
        "4-NOT SPECIFIED", "5-LOW")
      val w = Window.partitionBy("o_custkey")
        .orderBy(array_position(typedLit(precedence), col("o_orderpriority")),
          desc("o_orderdate"), desc("o_orderkey"))
      Tables.orders(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("o_custkey", "o_orderkey", "o_orderpriority")
        .orderBy("o_custkey")
    },

    // ----- P9/P2: substring & regex predicates (reference contains probe
    // docs/example1.md:13; compactSelector regex Utils.scala:262-273 → rlike)
    "q_contains" -> QueryDef.sql("""
      SELECT p_brand, COUNT(*) AS n FROM part
      WHERE p_type LIKE '%ARG%' GROUP BY p_brand ORDER BY p_brand""") { (s, d) =>
      Tables.part(s, d)
        .filter(col("p_type").contains("ARG"))
        .groupBy("p_brand").agg(count(lit(1)).as("n"))
        .orderBy("p_brand")
    },

    "q_regex_filter" -> QueryDef.sql("""
      SELECT doc_id, n_chars FROM documents
      WHERE NOT regexp_matches(text, 'compact|uniform') AND n_chars > 300
      ORDER BY doc_id""") { (s, d) =>
      Tables.documents(s, d)
        .filter(!col("text").rlike("compact|uniform") && col("n_chars") > 300)
        .select("doc_id", "n_chars")
        .orderBy("doc_id")
    },

    // ----- extension: correlated EXISTS / NOT EXISTS subqueries through the
    // SQL entry point — Catalyst rewrites them to left-semi/left-anti joins
    // (the DataFrame-API twins are q_semi_join/q_anti_join; this pins the
    // SQL-surface path). Customers split by whether any urgent order exists.
    "q_exists_subquery" -> QueryDef.sql("""
      SELECT c_mktsegment,
             CAST(SUM(CASE WHEN has_urgent THEN 1 ELSE 0 END) AS BIGINT) AS n_with,
             CAST(SUM(CASE WHEN has_urgent THEN 0 ELSE 1 END) AS BIGINT) AS n_without
      FROM (SELECT c_custkey, c_mktsegment,
                   EXISTS (SELECT 1 FROM orders o
                           WHERE o.o_custkey = c.c_custkey
                             AND o.o_orderpriority = '1-URGENT') AS has_urgent
            FROM customer c)
      GROUP BY c_mktsegment ORDER BY c_mktsegment""") { (s, d) =>
      Tables.customer(s, d).createOrReplaceTempView("customer_ex")
      Tables.orders(s, d).createOrReplaceTempView("orders_ex")
      s.sql("""
        SELECT c_mktsegment,
               CAST(SUM(CASE WHEN has_urgent THEN 1 ELSE 0 END) AS BIGINT) AS n_with,
               CAST(SUM(CASE WHEN has_urgent THEN 0 ELSE 1 END) AS BIGINT) AS n_without
        FROM (SELECT c_custkey, c_mktsegment,
                     EXISTS (SELECT 1 FROM orders_ex o
                             WHERE o.o_custkey = c.c_custkey
                               AND o.o_orderpriority = '1-URGENT') AS has_urgent
              FROM customer_ex c)
        GROUP BY c_mktsegment ORDER BY c_mktsegment""")
    },

    // ----- extension: scalar subqueries — uncorrelated (global latest order
    // date, a broadcast scalar) AND correlated (each customer's max-price
    // order; Catalyst plans the correlated one as an aggregated self-join).
    // Equality/date comparisons only, so float summation order cannot bite.
    "q_scalar_subquery" -> QueryDef.sql("""
      SELECT o_orderkey, o_custkey, o_totalprice
      FROM orders o
      WHERE o.o_totalprice = (SELECT MAX(o2.o_totalprice) FROM orders o2
                              WHERE o2.o_custkey = o.o_custkey)
        AND o.o_orderdate > (SELECT MAX(o_orderdate) FROM orders) - INTERVAL 5 YEAR
      ORDER BY o_orderkey""") { (s, d) =>
      Tables.orders(s, d).createOrReplaceTempView("orders_sc")
      s.sql("""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders_sc o
        WHERE o.o_totalprice = (SELECT MAX(o2.o_totalprice) FROM orders_sc o2
                                WHERE o2.o_custkey = o.o_custkey)
          AND o.o_orderdate > (SELECT MAX(o_orderdate) FROM orders_sc) - INTERVAL 5 YEAR
        ORDER BY o_orderkey""")
    },

    // ----- extension: LATERAL correlated subquery in FROM — per-nation top-2
    // customers by balance, the "top-N per group as a join" SQL surface
    // (Catalyst rewrites the correlated limit via DomainJoin; the DataFrame
    // twin is the row_number() form used by q_latest_per_key)
    "q_lateral_join" -> QueryDef.sql("""
      SELECT n.n_name, t.c_name, t.c_acctbal
      FROM nation n,
      LATERAL (SELECT c_name, c_acctbal FROM customer c
               WHERE c.c_nationkey = n.n_nationkey
               ORDER BY c_acctbal DESC, c_name LIMIT 2) t
      ORDER BY n.n_name, t.c_acctbal DESC, t.c_name""") { (s, d) =>
      Tables.nation(s, d).createOrReplaceTempView("nation_lat")
      Tables.customer(s, d).createOrReplaceTempView("customer_lat")
      s.sql("""
        SELECT n.n_name, t.c_name, t.c_acctbal
        FROM nation_lat n,
        LATERAL (SELECT c_name, c_acctbal FROM customer_lat c
                 WHERE c.c_nationkey = n.n_nationkey
                 ORDER BY c_acctbal DESC, c_name LIMIT 2) t
        ORDER BY n.n_name, t.c_acctbal DESC, t.c_name""")
    },

    // ----- O5 extension: STRATIFIED sampling with per-stratum rates — the
    // deterministic (hash-free, partition-independent) form: a modulo on the
    // row key plays the uniform draw, rates differ per event_type. The seeded
    // RNG form (df.stat.sampleBy) is spec-checked for rate accuracy instead
    // (SamplingSpec) — its draws depend on row order, not a property to gate.
    "q_sample_stratified" -> QueryDef.sql("""
      SELECT event_type, COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(30,2))) AS DOUBLE) AS total
      FROM events
      WHERE event_id % 100 < CASE event_type
              WHEN 'click' THEN 5 WHEN 'view' THEN 10 ELSE 50 END
      GROUP BY event_type ORDER BY event_type""") { (s, d) =>
      Tables.events(s, d)
        .filter(col("event_id") % 100 <
          when(col("event_type") === "click", 5)
            .when(col("event_type") === "view", 10).otherwise(50))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("total"))
        .orderBy("event_type")
    },

    // ----- extension: CDC MERGE / upsert (operators.MergeInto) — apply a
    // change batch (insert / update / delete) to a base snapshot, the
    // Delta-style MERGE INTO on plain DataFrames. Fixture-derived feed:
    // keys %4==0 are absent from base and arrive as inserts, %4==1 get a
    // +10.00 price update, %4==2 are deleted, %4==3 pass through untouched.
    // This gate exercises the UNION+REDUCE strategy (change feed too large
    // to broadcast: one key shuffle, no join); q_stream_upsert exercises the
    // default BROADCAST strategy per micro-batch. The oracle states the set
    // algebra directly. Exact-decimal prices; one final double cast.
    "q_merge_upsert" -> QueryDef.sql("""
      WITH base AS (
        SELECT o_orderkey, o_orderstatus,
               CAST(o_totalprice AS DECIMAL(30,2)) AS price
        FROM orders WHERE o_orderkey % 4 <> 0),
      chg AS (
        SELECT o_orderkey, 'I' AS op, o_orderstatus,
               CAST(o_totalprice AS DECIMAL(30,2)) AS price
        FROM orders WHERE o_orderkey % 4 = 0
        UNION ALL
        SELECT o_orderkey, 'U', o_orderstatus,
               CAST(o_totalprice AS DECIMAL(30,2)) + 10
        FROM orders WHERE o_orderkey % 4 = 1
        UNION ALL
        SELECT o_orderkey, 'D', o_orderstatus, NULL
        FROM orders WHERE o_orderkey % 4 = 2)
      SELECT o_orderkey, o_orderstatus, CAST(price AS DOUBLE) AS price
      FROM (
        SELECT b.* FROM base b
        LEFT JOIN chg c ON c.o_orderkey = b.o_orderkey WHERE c.o_orderkey IS NULL
        UNION ALL
        SELECT o_orderkey, o_orderstatus, price FROM chg WHERE op <> 'D')
      ORDER BY o_orderkey""") { (s, d) =>
      val o = Tables.orders(s, d)
      val base = o.filter(col("o_orderkey") % 4 =!= 0)
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("o_totalprice").cast("decimal(30,2)").as("price"))
      val price = col("o_totalprice").cast("decimal(30,2)")
      val changes = o.filter(col("o_orderkey") % 4 === 0)
        .select(col("o_orderkey"), lit("I").as("op"), col("o_orderstatus"),
          price.as("price"))
        .unionByName(o.filter(col("o_orderkey") % 4 === 1)
          .select(col("o_orderkey"), lit("U").as("op"), col("o_orderstatus"),
            (price + 10).cast("decimal(30,2)").as("price")))
        .unionByName(o.filter(col("o_orderkey") % 4 === 2)
          .select(col("o_orderkey"), lit("D").as("op"), col("o_orderstatus"),
            lit(null).cast("decimal(30,2)").as("price")))
      graft.operators.MergeInto(base, changes, "o_orderkey",
          broadcastChanges = false)
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("price").cast("double").as("price"))
        .orderBy("o_orderkey")
    },

    // ----- extension: STREAMING upsert sink — the same change feed consumed
    // as a file stream (1 file per micro-batch) and applied incrementally to
    // a persisted snapshot via foreachBatch + MergeInto: the Delta-style
    // "streaming MERGE INTO" recipe with plain parquet standing in for the
    // transactional table (tmp-then-promote write; a real deployment swaps
    // in a format with atomic commit). foreachBatch applies batches in
    // order, so per-key change sequences replay correctly. The final
    // snapshot must equal the one-shot batch MERGE — same oracle as
    // q_merge_upsert. Serial: runs a streaming query.
    "q_stream_upsert" -> QueryDef.sql("""
      WITH base AS (
        SELECT o_orderkey, o_orderstatus,
               CAST(o_totalprice AS DECIMAL(30,2)) AS price
        FROM orders WHERE o_orderkey % 4 <> 0),
      chg AS (
        SELECT o_orderkey, 'I' AS op, o_orderstatus,
               CAST(o_totalprice AS DECIMAL(30,2)) AS price
        FROM orders WHERE o_orderkey % 4 = 0
        UNION ALL
        SELECT o_orderkey, 'U', o_orderstatus,
               CAST(o_totalprice AS DECIMAL(30,2)) + 10
        FROM orders WHERE o_orderkey % 4 = 1
        UNION ALL
        SELECT o_orderkey, 'D', o_orderstatus, NULL
        FROM orders WHERE o_orderkey % 4 = 2)
      SELECT o_orderkey, o_orderstatus, CAST(price AS DOUBLE) AS price
      FROM (
        SELECT b.* FROM base b
        LEFT JOIN chg c ON c.o_orderkey = b.o_orderkey WHERE c.o_orderkey IS NULL
        UNION ALL
        SELECT o_orderkey, o_orderstatus, price FROM chg WHERE op <> 'D')
      ORDER BY o_orderkey""") { (s, d) =>
      val o = Tables.orders(s, d)
      val base = o.filter(col("o_orderkey") % 4 =!= 0)
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("o_totalprice").cast("decimal(30,2)").as("price"))
      val price = col("o_totalprice").cast("decimal(30,2)")
      val changes = o.filter(col("o_orderkey") % 4 === 0)
        .select(col("o_orderkey"), lit("I").as("op"), col("o_orderstatus"),
          price.as("price"))
        .unionByName(o.filter(col("o_orderkey") % 4 === 1)
          .select(col("o_orderkey"), lit("U").as("op"), col("o_orderstatus"),
            (price + 10).cast("decimal(30,2)").as("price")))
        .unionByName(o.filter(col("o_orderkey") % 4 === 2)
          .select(col("o_orderkey"), lit("D").as("op"), col("o_orderstatus"),
            lit(null).cast("decimal(30,2)").as("price")))
      val tag = System.nanoTime()
      val chgDir = s"/tmp/graft_upsert_chg_$tag"
      val snapDir = s"/tmp/graft_upsert_snap_$tag"
      changes.repartition(3, col("op")).write.mode("overwrite").parquet(chgDir)
      // Ping-pong snapshot sides keyed on batchId PARITY (r10): the previous
      // tmp-then-promote shape wrote every post-merge snapshot TWICE (tmp
      // write + promote copy) because a parquet dir can't be overwritten
      // while a plan still reads it lazily; reading side id%2 and writing
      // side (id+1)%2 needs one write per batch. Replay-safe: batch id's
      // read side was last written by committed batch id−1, and its own
      // partial previous write sat on the side it overwrites cleanly.
      val sides = Array(s"${snapDir}_a", s"${snapDir}_b")
      base.write.mode("overwrite").parquet(sides(0))
      @volatile var lastWritten = 0
      val schema = s.read.parquet(chgDir).schema
      val applyBatch: (DataFrame, Long) => Unit = (batch, id) => {
        val read = (id % 2).toInt
        val write = 1 - read
        graft.operators.MergeInto(
            s.read.parquet(sides(read)), batch, "o_orderkey")
          .write.mode("overwrite").parquet(sides(write))
        lastWritten = write
      }
      val q = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(chgDir)
        .writeStream.foreachBatch(applyBatch)
        .option("checkpointLocation", s"${snapDir}_ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.read.parquet(sides(lastWritten))
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("price").cast("double").as("price"))
        .orderBy("o_orderkey")
    }.serial
  )
}
