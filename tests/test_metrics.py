"""Structured metrics layer (utils/metrics.py) + its SLAM wiring.

The reference's only observability is the demo's final cout of
milliseconds + feature count (demo.cpp:113-114); the framework replaces it
with a JSON-line metrics registry the drivers flush per frame. These tests
cover the registry semantics (reset rules, timer accumulation, sink
capture) and that a KeyframeSLAM run populates the expected series.
"""

import json

from pislam_tpu.models.slam import KeyframeSLAM
from pislam_tpu.utils.metrics import Metrics, NullMetrics

from test_models import (CX, CY, FX, FY, make_trajectory, make_world,
                         projector, tiny_cfg)


def test_counters_gauges_timers_and_reset():
    lines = []
    m = Metrics(sink=lines.append)
    m.count("frames")
    m.count("frames")
    m.count("inliers", 42)
    m.gauge("map_size", 7)
    with m.timer("stage"):
        pass
    with m.timer("stage"):
        pass
    snap = m.snapshot()
    assert snap["count.frames"] == 2
    assert snap["count.inliers"] == 42
    assert snap["gauge.map_size"] == 7
    assert snap["calls.stage"] == 2
    assert snap["time_ms.stage"] >= 0.0

    rec = m.emit(frame=5)
    assert rec["frame"] == 5
    assert len(lines) == 1
    parsed = json.loads(lines[0])
    assert parsed["count.frames"] == 2

    # counters/timers reset after emit; gauges persist (describe state)
    snap2 = m.snapshot()
    assert "count.frames" not in snap2
    assert "calls.stage" not in snap2
    assert snap2["gauge.map_size"] == 7


def test_null_metrics_is_inert():
    m = NullMetrics()
    m.count("x")
    m.gauge("y", 1)
    with m.timer("z"):
        pass
    assert m.snapshot() == {}
    assert m.emit() == {}


def test_slam_populates_metrics():
    xyz, desc = make_world(seed=11)
    Rs, ts = make_trajectory(12)
    lines = []
    m = Metrics(sink=lines.append)
    slam = KeyframeSLAM(tiny_cfg(), FX, FY, CX, CY,
                        features_fn=projector(xyz, desc, Rs, ts),
                        keyframe_min_inliers=220, keyframe_max_gap=3,
                        metrics=m)
    for i in range(12):
        slam.process(i)
        m.emit(frame=i)
    assert len(lines) == 12
    recs = [json.loads(l) for l in lines]
    # every frame counts itself and times extraction
    assert all(r["count.frames"] == 1 for r in recs)
    assert all("time_ms.extract" in r for r in recs)
    # tracking starts at frame 1
    assert "time_ms.track" in recs[1]
    assert recs[-1]["count.track_inliers"] > 0
    # keyframe insertions show up as counter + growing gauges
    total_kf = sum(r.get("count.keyframes_inserted", 0) for r in recs)
    assert total_kf == len(slam.keyframes)
    assert recs[-1]["gauge.num_keyframes"] == len(slam.keyframes)
    assert recs[-1]["gauge.num_landmarks"] >= 0
