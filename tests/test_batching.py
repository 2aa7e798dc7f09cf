"""Continuous batcher tests."""

import threading
import time

from msc_tpu.serving.batching import ContinuousBatcher, run_scenes_concurrent
from msc_tpu.serving.client import Backend


class RecordingBackend(Backend):
    def __init__(self, delay=0.0):
        self.batches = []
        self.delay = delay

    def complete(self, messages, temperature, response_format=None,
                 task=None, images=()):
        return self.complete_batch([dict(messages=messages)])[0]

    def complete_batch(self, calls):
        if self.delay:
            time.sleep(self.delay)
        self.batches.append(len(calls))
        return [f"r{i}:{c['messages'][0]['content']}"
                for i, c in enumerate(calls)]


def test_concurrent_calls_coalesce():
    inner = RecordingBackend()
    b = ContinuousBatcher(inner, max_batch=8, window_ms=50)
    results = {}

    def call(i):
        results[i] = b.complete([{"role": "user", "content": f"m{i}"}], 0.0)

    threads = [threading.Thread(target=call, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    b.close()
    assert len(results) == 6
    for i in range(6):
        assert results[i].endswith(f"m{i}")
    # the 6 concurrent calls must have coalesced into few batches
    assert len(inner.batches) <= 3
    assert max(inner.batches) >= 2


def test_batch_passthrough_order():
    inner = RecordingBackend()
    b = ContinuousBatcher(inner, max_batch=4, window_ms=5)
    calls = [dict(messages=[{"role": "user", "content": f"c{i}"}],
                  temperature=0.0) for i in range(5)]
    out = b.complete_batch(calls)
    b.close()
    assert [o.split(":")[1] for o in out] == [f"c{i}" for i in range(5)]


def test_error_propagation():
    class Boom(Backend):
        def complete_batch(self, calls):
            raise RuntimeError("device on fire")

    b = ContinuousBatcher(Boom(), window_ms=1)
    try:
        b.complete([{"role": "user", "content": "x"}], 0.0)
        raised = False
    except RuntimeError:
        raised = True
    b.close()
    assert raised


def test_run_scenes_concurrent_error_isolated(mock_sample):
    from msc_tpu.config import ModelConfig
    from msc_tpu.pipeline import SemanticCaptioningPipeline
    from msc_tpu.serving.analytic import AnalyticBackend

    pipe = SemanticCaptioningPipeline(ModelConfig(),
                                      backend=AnalyticBackend(),
                                      verbose=False)
    good = dict(images=mock_sample["images"][:1],
                camera_names=mock_sample["camera_names"][:1])
    bad = dict(images=None, camera_names=None, point_cloud="garbage")
    results = run_scenes_concurrent(pipe, [good, bad, good], max_workers=3)
    assert "structured_caption" in results[0]
    assert isinstance(results[1], Exception)
    assert "structured_caption" in results[2]
