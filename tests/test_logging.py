"""MetricWriter / NullWriter unit coverage (SURVEY §2.15): the JSONL
scalar stream (TensorBoard is optional) and the non-leader no-op writer's
interface parity."""

import json
import os

from dvdgan_tpu.utils.logging import MetricWriter, NullWriter, step_line


def test_metric_writer_jsonl(tmp_path):
    w = MetricWriter(str(tmp_path / "logs"), use_tensorboard=False)
    w.scalar("g_loss", 1.5, 10)
    w.scalars({"a": 2.0, "b": 3.0}, 20)
    w.close()
    rows = [json.loads(l) for l in
            open(tmp_path / "logs" / "scalars.jsonl")]
    assert [(r["tag"], r["value"], r["step"]) for r in rows] == [
        ("g_loss", 1.5, 10), ("a", 2.0, 20), ("b", 3.0, 20)]
    assert all("ts" in r for r in rows)


def test_null_writer_interface_parity(tmp_path):
    """Every public method of MetricWriter must exist on NullWriter —
    a new writer method without a no-op twin would crash non-leader
    processes in multi-host runs."""
    real = {m for m in dir(MetricWriter) if not m.startswith("_")}
    null = {m for m in dir(NullWriter) if not m.startswith("_")}
    assert real <= null, real - null
    n = NullWriter()
    n.scalar("x", 1.0, 0)
    n.scalars({"y": 2.0}, 1)
    n.close()
    assert list(tmp_path.iterdir()) == []


def test_step_line_format():
    s = step_line(5, {"g_loss": 1.25, "d_loss": 0.5}, 12.3)
    assert "step 5" in s and "g_loss" in s and "12.3" in s
