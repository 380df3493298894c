"""Event predicates shared by every query.

The reference checks ``product_type`` against ""/"N/A" in two places
(UserAggregate.java:19, UserAggregate.java:30 for event_type) and would NPE
on the nullable Avro unions; this engine centralizes the predicate and
defines null == "no department" (SURVEY.md §2.3.4) so Q1's call sites can't
drift.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: sentinel values meaning "event has no department"
NO_DEPARTMENT = ("", "N/A")

ORDER_CHECKOUT = "order_checkout"


def is_real_product(product_type: Column | str = "product_type") -> Column:
    """True when the event carries a real department (UserAggregate.java:19).

    Null-safe: Avro declares product_type nullable (ClickEvent.avsc:9); null
    is treated like the ""/"N/A" sentinels.
    """
    col = F.col(product_type) if isinstance(product_type, str) else product_type
    return col.isNotNull() & ~col.isin(*NO_DEPARTMENT)


def is_checkout(event_type: Column | str = "event_type") -> Column:
    """True for order_checkout events (UserAggregate.java:30), null-safe."""
    col = F.col(event_type) if isinstance(event_type, str) else event_type
    return col.isNotNull() & (col == ORDER_CHECKOUT)
