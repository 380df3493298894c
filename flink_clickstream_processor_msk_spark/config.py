"""Application configuration.

Mirrors the reference's KDA property-group handling
(ClickstreamProcessor.java:64-98): a flat property map with
mandatory-parameter validation (CP:36 declares ``BootstrapServers``
mandatory; CP:92-98 fails fast when absent) and inline defaults for topic
names (CP:117, KDAApplicationProperties.json:11-13).
"""

from __future__ import annotations

from dataclasses import dataclass, field


class MissingConfigError(ValueError):
    """A mandatory parameter is absent (reference parity: CP:92-98)."""


MANDATORY = ("BootstrapServers",)

DEFAULTS = {
    "Region": "us-east-1",
    "InputTopic": "ExampleTopic",  # CP:117
    "DepartmentsAggTopic": "Departments_Agg",  # KDAApplicationProperties.json:11
    "SessionStatsTopic": "ClickEvents_UserId_Agg_Result",  # :12
    "BuySessionsTopic": "User_Sessions_Aggregates_With_Order_Checkout",  # :13
    "SessionGap": "1 second",  # CP:129
    "TumblingWindow": "10 seconds",  # CP:143,152
    "Watermark": "0 seconds",  # zero-slack watermark parity
    "CheckpointDir": "/tmp/flink-clickstream-spark-checkpoints",
}


@dataclass
class AppConfig:
    properties: dict[str, str] = field(default_factory=dict)

    def __post_init__(self) -> None:
        merged = dict(DEFAULTS)
        merged.update(self.properties)
        self.properties = merged

    def validate(self, mandatory: tuple[str, ...] = MANDATORY) -> "AppConfig":
        missing = [k for k in mandatory if not self.properties.get(k)]
        if missing:
            raise MissingConfigError(
                f"Mandatory parameter(s) missing: {', '.join(missing)}"
            )
        return self

    def __getitem__(self, key: str) -> str:
        return self.properties[key]

    def get(self, key: str, default: str | None = None) -> str | None:
        return self.properties.get(key, default)
