"""Record schemas.

``CLICK_EVENT`` mirrors the reference's Avro source schema
(src/main/resources/avro/ClickEvent.avsc:4-13): nullable unions become
``nullable=True``; epoch-millis longs stay longs (the engine derives a real
``TimestampType`` column only where windows need one).

Output schemas mirror the reference POJOs
(UserIdSessionEvent.java:5-12, UserIdAggEvent.java:3-8,
DepartmentsAggEvent.java:3-7); the Flink ``HashSet<String>`` department set
becomes ``array<string>`` (kept sorted for deterministic comparison).
"""

from __future__ import annotations

from pyspark.sql import types as T

# Source record — ClickEvent.avsc:4-13.
CLICK_EVENT = T.StructType(
    [
        T.StructField("ip", T.StringType(), False),
        T.StructField("eventtimestamp", T.LongType(), False),  # epoch millis
        T.StructField("devicetype", T.StringType(), False),
        T.StructField("event_type", T.StringType(), True),  # union[string,null]
        T.StructField("product_type", T.StringType(), True),  # union[string,null]
        T.StructField("userid", T.IntegerType(), False),  # avsc "int"
        T.StructField("globalseq", T.LongType(), False),
        T.StructField("prevglobalseq", T.LongType(), False),
    ]
)

# Q1 output — UserIdSessionEvent.java:5-12.
USER_SESSION = T.StructType(
    [
        T.StructField("userId", T.LongType(), False),
        T.StructField("eventCount", T.IntegerType(), False),
        T.StructField("orderCheckoutEventCount", T.IntegerType(), False),
        T.StructField("deptList", T.ArrayType(T.StringType()), False),
        T.StructField("eventKey", T.IntegerType(), False),
        T.StructField("windowBeginTime", T.LongType(), False),  # epoch millis
        T.StructField("windowEndTime", T.LongType(), False),  # epoch millis
    ]
)

# Q2 output — UserIdAggEvent.java:3-8.
USER_SESSION_STATS = T.StructType(
    [
        T.StructField("userSessionCount", T.IntegerType(), False),
        T.StructField("userSessionCountWithOrderCheckout", T.IntegerType(), False),
        # double carrying an integer-truncated percentage — see SURVEY.md §2.3.1
        T.StructField("percentSessionswithBuy", T.DoubleType(), False),
        T.StructField("windowBeginTime", T.LongType(), False),
        T.StructField("windowEndTime", T.LongType(), False),
    ]
)

# Q3 output — DepartmentsAggEvent.java:3-7.
DEPARTMENTS_AGG = T.StructType(
    [
        T.StructField("departmentName", T.StringType(), False),
        T.StructField("departmentCount", T.IntegerType(), False),
        T.StructField("windowBeginTime", T.LongType(), False),
        T.StructField("windowEndTime", T.LongType(), False),
    ]
)
