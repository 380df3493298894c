"""Config validation parity (ClickstreamProcessor.java:36, 64-98)."""

from __future__ import annotations

import pytest

from flink_clickstream_processor_msk_spark.config import (
    DEFAULTS,
    AppConfig,
    MissingConfigError,
)


def test_defaults_applied_and_overridable():
    cfg = AppConfig({"BootstrapServers": "b:9092", "InputTopic": "Custom"})
    assert cfg["InputTopic"] == "Custom"
    assert cfg["DepartmentsAggTopic"] == DEFAULTS["DepartmentsAggTopic"]
    assert cfg["SessionGap"] == "1 second"


def test_missing_mandatory_fails_fast():
    with pytest.raises(MissingConfigError, match="BootstrapServers"):
        AppConfig({}).validate()


def test_empty_mandatory_counts_as_missing():
    with pytest.raises(MissingConfigError):
        AppConfig({"BootstrapServers": ""}).validate()


def test_validate_returns_self_for_chaining():
    cfg = AppConfig({"BootstrapServers": "b:9092"})
    assert cfg.validate() is cfg
