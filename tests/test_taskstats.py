"""Unit tests for the opt-in per-task rusage tracer (cutwed_ray._taskstats)
and the store-shard sizing helper — no Ray session needed."""

import json
import os

from cutwed_ray import _taskstats
from cutwed_ray.stages.scorer_broadcast import _store_shards


def test_record_passthrough_when_disabled():
    assert _taskstats._DIR is None or isinstance(_taskstats._DIR, str)
    old = _taskstats._DIR
    _taskstats._DIR = None
    try:
        assert _taskstats.record("x", lambda a, b: a + b, 2, b=3) == 5
        assert not _taskstats.task_stats_enabled()
    finally:
        _taskstats._DIR = old


def test_record_logs_one_line_per_call(tmp_path):
    old = _taskstats._DIR
    _taskstats._DIR = str(tmp_path)
    try:
        assert _taskstats.record("stage1", lambda: 42) == 42
        assert _taskstats.record("stage1", lambda: 43) == 43
        path = tmp_path / f"stage1_{os.getpid()}.jsonl"
        lines = [json.loads(x) for x in path.read_text().splitlines()]
        assert len(lines) == 2
        for r in lines:
            assert r["stage"] == "stage1"
            assert r["wall"] >= 0 and r["minflt"] >= 0
    finally:
        _taskstats._DIR = old


def test_store_shards_bounds():
    # capped by blocks, cpus and the 16 ceiling; floored at 1
    assert _store_shards(100, cpus=8) == 8
    assert _store_shards(3, cpus=8) == 3
    assert _store_shards(100, cpus=64) == 16
    assert _store_shards(0, cpus=8) == 1
