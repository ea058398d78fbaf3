"""Metrics registry + config ladder structure tests."""
import json

from phasm_tpu import metrics


def test_counters_and_stages():
    metrics.reset()
    metrics.incr("x", 2)
    metrics.incr("x")
    with metrics.stage("work", items=10):
        pass
    rep = metrics.report()
    assert rep["counters"]["x"] == 3
    assert rep["counters"]["work.items"] == 10
    assert rep["calls"]["work"] == 1
    assert rep["seconds"]["work"] >= 0
    assert "work.items_per_sec" in rep["counters"]
    json.loads(metrics.report_json())
    metrics.reset()
    assert metrics.report()["counters"] == {}


def test_ladder_definitions():
    from phasm_tpu.configs import ladder

    rungs = ladder()
    assert len(rungs) == 7
    names = [r.name for r in rungs]
    assert names == sorted(names)  # c1..c7 ordering
    ploidies = [r.pipeline.phase.ploidy for r in rungs]
    assert ploidies == [2, 2, 2, 2, 3, 2, 2]
    assert rungs[2].sim["genome_len"] == 1_000_000
    assert rungs[5].sim["genome_len"] == 10_000_000  # scale rung (r3)
    assert rungs[5].sim["ploidy"] == 1
    assert rungs[6].sim["genome_len"] == 2_000_000  # Mb diploid rung (r5)
    assert rungs[6].sim["ploidy"] == 2
