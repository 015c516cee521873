"""Decision-support shape STAGED for round 9 (same window-budgeting
protocol as llm/staged_r9.py; promoted by moving the STAGED entry into a
@register decorator next round).

q_copurchase_pairs — market-basket co-purchase mining: the top part pairs
that appear together in the same order (the retail affinity query behind
"frequently bought together").  Reference parity note: the reference
(DatabaseManager.java:280-381) fetches one table at a time; a pair census
exists there only as an application-side nested loop.

100-TB design: the self-join is an equi-join on l_orderkey, so both sides
shuffle-partition by order id ONCE and the pair explosion happens
partition-locally; its size is bounded by Σ_orders (items_per_order
choose 2) — items per order is corpus-bounded (≤7 lineitem rows per order
in TPC-H-shaped data), NOT scale-bounded, so the blow-up factor is a
constant ~21× on row count, never quadratic in the table.  The per-pair
census is a map-side-combinable groupBy on a compact (int, int) key, and
the final top-20 is a TakeOrdered (total order: count desc, then both
part ids), never a global sort.  No broadcast: both sides grow with SF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table

_TOPN = 20


def q_copurchase_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    items = (load_table(spark, sf_dir, "lineitem")
             .select("l_orderkey", "l_partkey").distinct())
    pairs = (items.alias("a")
             .join(items.select(F.col("l_orderkey"),
                                F.col("l_partkey").alias("b_partkey"))
                   .alias("b"),
                   ["l_orderkey"])
             .filter(F.col("a.l_partkey") < F.col("b_partkey")))
    return (pairs.groupBy(F.col("a.l_partkey").alias("part_a"),
                          F.col("b_partkey").alias("part_b"))
            .agg(F.count("*").alias("n_orders"))
            .orderBy(F.col("n_orders").desc(), "part_a", "part_b")
            .limit(_TOPN))


_COPURCHASE_SQL = f"""
WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
       count(*) AS n_orders
FROM items a JOIN items b USING (l_orderkey)
WHERE a.l_partkey < b.l_partkey
GROUP BY 1, 2
ORDER BY n_orders DESC, part_a, part_b
LIMIT {_TOPN}
"""

STAGED: dict = {
    "q_copurchase_pairs": (q_copurchase_pairs, _COPURCHASE_SQL),
}
