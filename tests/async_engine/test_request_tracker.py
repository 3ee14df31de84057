"""RequestTracker queue semantics (reference:
tests/async_engine/test_request_tracker.py)."""
import asyncio

import pytest

from vllm_quick_tpu.engine.async_llm_engine import RequestTracker
from vllm_quick_tpu.outputs import RequestOutput


def _run(coro):
    return asyncio.run(coro)


def test_request_tracker():
    async def body():
        tracker = RequestTracker()
        tracker.init_event()
        stream_1 = tracker.add_request("1")
        assert tracker.new_requests_event.is_set()
        new, finished = tracker.get_new_and_finished_requests()
        assert not tracker.new_requests_event.is_set()
        assert len(new) == 1
        assert new[0]["request_id"] == "1"
        assert not finished
        assert not stream_1.finished

        stream_2 = tracker.add_request("2")
        stream_3 = tracker.add_request("3")
        assert len(tracker.get_new_and_finished_requests()[0]) == 2

        # Duplicate request id rejected.
        with pytest.raises(KeyError):
            tracker.add_request("1")

        tracker.abort_request("1")
        new, finished = tracker.get_new_and_finished_requests()
        assert "1" in finished
        assert not new
        assert stream_1.finished

        # Abort before the engine ever saw it: never surfaced as new.
        stream_4 = tracker.add_request("4")
        tracker.abort_request("4")
        new, finished = tracker.get_new_and_finished_requests()
        assert "4" in finished
        assert not new
        assert stream_4.finished

        # Finished-by-engine output finishes the stream.
        stream_5 = tracker.add_request("5")
        assert tracker.new_requests_event.is_set()
        tracker.get_new_and_finished_requests()
        tracker.process_request_output(
            RequestOutput("2", "", [], None, [], finished=True))
        new, finished = tracker.get_new_and_finished_requests()
        assert "2" in finished
        assert not new
        assert not stream_5.finished

    _run(body())
