"""A2 config validation: same shape, enum, defaults, and
throw-on-mismatch as the reference's TypeBox Environment
(/root/reference/task.ts:26-45, validated at task.ts:68)."""

from __future__ import annotations

import pytest

from etl_wildweb_spark.config import (
    INCIDENT_RANGE_ENUM,
    Environment,
    validate_environment,
)


def test_defaults_match_reference():
    env = validate_environment({})
    assert env == Environment(dispatch_centers=(), incident_range=None, debug=False)


def test_full_config_roundtrip():
    env = validate_environment(
        {
            "IncidentRange": "72 Hours",
            "DispatchCenters": [{"CenterCode": "CAMECC"}, {}, "ORCOC"],
            "DEBUG": True,
        }
    )
    assert env.incident_range == "72 Hours"
    # optional CenterCode (task.ts:38) → None entry preserved
    assert env.dispatch_centers == ("CAMECC", None, "ORCOC")
    assert env.debug is True


@pytest.mark.parametrize(
    "bad",
    [
        {"IncidentRange": "96 Hours"},
        {"IncidentRange": 24},
        {"DispatchCenters": "CAMECC"},
        {"DispatchCenters": [42]},
        {"DispatchCenters": [{"CenterCode": 7}]},
        {"DEBUG": "yes"},
    ],
)
def test_shape_violations_throw(bad):
    with pytest.raises(ValueError):
        validate_environment(bad)


def test_absent_range_stays_none():
    # JS truthiness downstream: absent IncidentRange must DISABLE the
    # time filter (task.ts:109), so validation must not default it
    assert validate_environment({}).incident_range is None
    assert "24 Hours" in INCIDENT_RANGE_ENUM


def test_cli_list_and_query(capsys):
    from etl_wildweb_spark.__main__ import main

    assert main(["--list"]) == 0
    out = capsys.readouterr().out
    assert "flagship_revenue_by_nation\toracle" in out


def test_cluster_conf_profile_scales_with_fleet():
    from etl_wildweb_spark.session import RUNTIME_CONFS, cluster_confs

    c = cluster_confs(executors=1000, cores_per_executor=4)
    assert c["spark.sql.shuffle.partitions"] == str(2 * 1000 * 4)
    assert int(c["spark.sql.files.maxPartitionBytes"]) == 128 * 1024 * 1024
    assert "RocksDBStateStoreProvider" in c[
        "spark.sql.streaming.stateStore.providerClass"
    ]
    # the runtime (correctness-bearing) confs ride along unchanged
    for k, v in RUNTIME_CONFS.items():
        assert c[k] == v
    # a small fleet gets proportionally narrower shuffles
    assert cluster_confs(executors=10)["spark.sql.shuffle.partitions"] == "80"
