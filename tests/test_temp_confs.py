"""session.temp_confs restore discipline (ADVICE r5 + r6).

The contract: confs set for the block are restored to TRUE prior state
on exit — previously-set confs by re-set, previously-unresolvable confs
by unset — and a failure while APPLYING the confs rolls back the keys
already applied instead of leaking them (ADVICE r6: the try/finally
used to wrap only the yield).
"""

from __future__ import annotations

import pytest

from movies_etl_spark.session import temp_confs


def test_restores_user_set_value(spark):
    key = "spark.sql.shuffle.partitions"
    before = spark.conf.get(key)
    with temp_confs(spark, {key: "7"}):
        assert spark.conf.get(key) == "7"
    assert spark.conf.get(key) == before


def test_restores_unset_conf_to_unset(spark):
    key = "spark.movies_etl.test.ephemeral"
    with pytest.raises(Exception):
        spark.conf.get(key)  # genuinely unresolvable before
    with temp_confs(spark, {key: "on"}):
        assert spark.conf.get(key) == "on"
    with pytest.raises(Exception):
        spark.conf.get(key)  # unset again after


def test_restores_on_body_exception(spark):
    key = "spark.sql.autoBroadcastJoinThreshold"
    before = spark.conf.get(key)
    with pytest.raises(RuntimeError):
        with temp_confs(spark, {key: "-1"}):
            assert spark.conf.get(key) == "-1"
            raise RuntimeError("body failure")
    assert spark.conf.get(key) == before


def test_apply_failure_rolls_back_already_applied(spark):
    """A set failing mid-loop (here: a static conf, which the runtime
    conf API refuses to modify) must restore the keys applied before
    it — the ADVICE r6 gap where they leaked."""
    good = "spark.sql.shuffle.partitions"
    static = "spark.sql.warehouse.dir"  # static: conf.set raises
    before = spark.conf.get(good)
    confs = {good: "9", static: "/tmp/never-applied"}
    with pytest.raises(Exception):
        with temp_confs(spark, confs):
            pytest.fail("body must not run when apply fails")
    assert spark.conf.get(good) == before, "applied key leaked"
