"""Explicit schemas for every table the engine reads.

The reference encodes schemas positionally in parser code
(``D/Program.cs:411-427,437-452``) — schema-on-code, no declaration. Here
every table gets a declared ``StructType``: parquet scans validate against
it, streaming reads require it, and CSV reads never infer.

Test-table shapes come from FIXTURES.md §B (driver-generated parquet);
the reference's own donor/donation CSV shapes (FIXTURES.md §A) are kept
for the reference-dialect CSV source.
"""

from __future__ import annotations

from pyspark.sql import types as T

REGION = T.StructType(
    [
        T.StructField("r_regionkey", T.IntegerType()),
        T.StructField("r_name", T.StringType()),
    ]
)

NATION = T.StructType(
    [
        T.StructField("n_nationkey", T.IntegerType()),
        T.StructField("n_name", T.StringType()),
        T.StructField("n_regionkey", T.IntegerType()),
    ]
)

CUSTOMER = T.StructType(
    [
        T.StructField("c_custkey", T.LongType()),
        T.StructField("c_name", T.StringType()),
        T.StructField("c_nationkey", T.IntegerType()),
        T.StructField("c_acctbal", T.DoubleType()),
        T.StructField("c_mktsegment", T.StringType()),
    ]
)

SUPPLIER = T.StructType(
    [
        T.StructField("s_suppkey", T.LongType()),
        T.StructField("s_name", T.StringType()),
        T.StructField("s_nationkey", T.IntegerType()),
        T.StructField("s_acctbal", T.DoubleType()),
    ]
)

PART = T.StructType(
    [
        T.StructField("p_partkey", T.LongType()),
        T.StructField("p_name", T.StringType()),
        T.StructField("p_brand", T.StringType()),
        T.StructField("p_type", T.StringType()),
        T.StructField("p_size", T.IntegerType()),
        T.StructField("p_retailprice", T.DoubleType()),
    ]
)

ORDERS = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType()),
        T.StructField("o_custkey", T.LongType()),
        T.StructField("o_orderstatus", T.StringType()),
        T.StructField("o_totalprice", T.DoubleType()),
        # tz-naive in the current corpus generation (parquet µs, no
        # tz); left native so date predicates still push into the
        # scan — all literals compare under the pinned UTC session
        T.StructField("o_orderdate", T.TimestampNTZType()),
        T.StructField("o_orderpriority", T.StringType()),
    ]
)

LINEITEM = T.StructType(
    [
        T.StructField("l_orderkey", T.LongType()),
        T.StructField("l_partkey", T.LongType()),
        T.StructField("l_suppkey", T.LongType()),
        T.StructField("l_linenumber", T.IntegerType()),
        T.StructField("l_quantity", T.DoubleType()),
        T.StructField("l_extendedprice", T.DoubleType()),
        T.StructField("l_discount", T.DoubleType()),
        T.StructField("l_tax", T.DoubleType()),
        T.StructField("l_returnflag", T.StringType()),
        T.StructField("l_linestatus", T.StringType()),
        T.StructField("l_shipdate", T.TimestampNTZType()),  # see o_orderdate
    ]
)

EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

EMBEDDINGS = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
    ]
)

TABLE_SCHEMAS: dict[str, T.StructType] = {
    "region": REGION,
    "nation": NATION,
    "customer": CUSTOMER,
    "supplier": SUPPLIER,
    "part": PART,
    "orders": ORDERS,
    "lineitem": LINEITEM,
    "events": EVENTS,
    "documents": DOCUMENTS,
    "embeddings": EMBEDDINGS,
}

TABLE_NAMES = list(TABLE_SCHEMAS)

# Reference CSV shapes (FIXTURES.md §A; ``D/Program.cs:490,500``) for the
# reference-dialect CSV source — only the starred columns are consumed by
# the flagship pipeline, the rest exist so positional parity holds.
DONORS_CSV = T.StructType(
    [
        T.StructField("Donor ID", T.StringType()),  # * join key
        T.StructField("Donor City", T.StringType()),
        T.StructField("Donor State", T.StringType()),  # * group key
        T.StructField("Donor Is Teacher", T.StringType()),
        T.StructField("Donor Zip", T.StringType()),
    ]
)

DONATIONS_CSV = T.StructType(
    [
        T.StructField("Project ID", T.StringType()),
        T.StructField("Donation ID", T.StringType()),
        T.StructField("Donor ID", T.StringType()),  # * join key
        T.StructField("Donation Included Optional Donation", T.StringType()),
        T.StructField("Donation Amount", T.DoubleType()),  # * measure
        T.StructField("Donor Cart Sequence", T.StringType()),
    ]
)
