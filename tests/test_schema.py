"""CLICK_EVENT must stay in lockstep with the reference Avro contract —
the CLICK_EVENT_AVSC literal (src/main/resources/avro/ClickEvent.avsc) is
the declared source of truth, and `from_avro` on the streaming path yields
exactly these Spark types."""

from __future__ import annotations

import json

from flink_clickstream_processor_msk_spark.schema import CLICK_EVENT
from flink_clickstream_processor_msk_spark.sources.clickevents import CLICK_EVENT_AVSC

_AVRO_TO_SPARK = {"string": "string", "long": "bigint", "int": "int"}


def test_click_event_matches_avsc_literal():
    avro_fields = json.loads(CLICK_EVENT_AVSC)["fields"]
    assert [f["name"] for f in avro_fields] == [f.name for f in CLICK_EVENT.fields]
    for af, sf in zip(avro_fields, CLICK_EVENT.fields):
        t = af["type"]
        if isinstance(t, list):  # union[..., null] -> nullable
            assert sf.nullable, af["name"]
            base = next(x for x in t if x != "null")
        else:
            assert not sf.nullable, af["name"]
            base = t
        assert sf.dataType.simpleString() == _AVRO_TO_SPARK[base], af["name"]
