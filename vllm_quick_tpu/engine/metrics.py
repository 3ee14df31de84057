"""Prometheus metrics + periodic stdout stats.

Reference parity: vllm/engine/metrics.py:22-173 (same metric names so
the reference's Grafana dashboard works unchanged), built on
prometheus_client (aioprometheus is absent from the TPU image).
"""
import dataclasses
import time
from typing import Dict, List

from vllm_quick_tpu.logger import init_logger

logger = init_logger(__name__)

try:
    from prometheus_client import Counter, Gauge, Histogram, REGISTRY
    _PROM = True
except ImportError:  # pragma: no cover
    _PROM = False


@dataclasses.dataclass
class Stats:
    """Snapshot of engine state for one iteration
    (reference: metrics.py:67)."""
    now: float
    num_running: int
    num_swapped: int
    num_waiting: int
    gpu_cache_usage: float
    cpu_cache_usage: float
    num_prompt_tokens: int
    num_generation_tokens: int
    time_to_first_tokens: List[float]
    time_per_output_tokens: List[float]
    time_e2e_requests: List[float]


class _Metrics:
    _instance = None

    def __init__(self, labelnames: List[str]) -> None:
        self.counter_prompt_tokens = Counter(
            "vllm_prompt_tokens_total",
            "Number of prefill tokens processed.", labelnames)
        self.counter_generation_tokens = Counter(
            "vllm_generation_tokens_total",
            "Number of generation tokens processed.", labelnames)
        self.gauge_scheduler_running = Gauge(
            "vllm_num_requests_running",
            "Number of requests currently running on TPU.", labelnames)
        self.gauge_scheduler_swapped = Gauge(
            "vllm_num_requests_swapped",
            "Number of requests swapped to CPU.", labelnames)
        self.gauge_scheduler_waiting = Gauge(
            "vllm_num_requests_waiting",
            "Number of requests waiting to be processed.", labelnames)
        self.gauge_gpu_cache_usage = Gauge(
            "vllm_gpu_cache_usage_perc",
            "TPU HBM KV-cache usage. 1 means 100 percent usage.",
            labelnames)
        self.gauge_cpu_cache_usage = Gauge(
            "vllm_cpu_cache_usage_perc",
            "CPU KV-cache usage. 1 means 100 percent usage.", labelnames)
        self.histogram_time_to_first_token = Histogram(
            "vllm_time_to_first_token_seconds",
            "Histogram of time to first token in seconds.", labelnames,
            buckets=[
                0.001, 0.005, 0.01, 0.02, 0.04, 0.06, 0.08, 0.1, 0.25, 0.5,
                0.75, 1.0, 2.5, 5.0, 7.5, 10.0
            ])
        self.histogram_time_per_output_token = Histogram(
            "vllm_time_per_output_token_seconds",
            "Histogram of time per output token in seconds.", labelnames,
            buckets=[
                0.01, 0.025, 0.05, 0.075, 0.1, 0.15, 0.2, 0.3, 0.4, 0.5,
                0.75, 1.0, 2.5
            ])
        self.histogram_e2e_request_latency = Histogram(
            "vllm_e2e_request_latency_seconds",
            "Histogram of end to end request latency in seconds.",
            labelnames,
            buckets=[1.0, 2.5, 5.0, 10.0, 15.0, 20.0, 30.0, 40.0, 50.0,
                     60.0])

    @classmethod
    def get(cls, labelnames: List[str]) -> "_Metrics":
        # prometheus_client forbids re-registering the same metric names;
        # keep a process-wide singleton (multiple engines share metrics).
        if cls._instance is None:
            cls._instance = cls(labelnames)
        return cls._instance


class StatLogger:
    """Aggregates per-iteration Stats; logs locally and to Prometheus
    (reference: metrics.py:136)."""

    def __init__(self, local_interval: float,
                 labels: Dict[str, str]) -> None:
        self.local_interval = local_interval
        self.labels = labels
        self.last_local_log = time.monotonic()
        self.num_prompt_tokens: List[int] = []
        self.num_generation_tokens: List[int] = []
        self.metrics = _Metrics.get(list(labels.keys())) if _PROM else None

    def _local_interval_elapsed(self, now: float) -> bool:
        return now - self.last_local_log >= self.local_interval

    def log(self, stats: Stats) -> None:
        if self.metrics is not None:
            m = self.metrics
            lv = list(self.labels.values())
            m.counter_prompt_tokens.labels(*lv).inc(stats.num_prompt_tokens)
            m.counter_generation_tokens.labels(*lv).inc(
                stats.num_generation_tokens)
            m.gauge_scheduler_running.labels(*lv).set(stats.num_running)
            m.gauge_scheduler_swapped.labels(*lv).set(stats.num_swapped)
            m.gauge_scheduler_waiting.labels(*lv).set(stats.num_waiting)
            m.gauge_gpu_cache_usage.labels(*lv).set(stats.gpu_cache_usage)
            m.gauge_cpu_cache_usage.labels(*lv).set(stats.cpu_cache_usage)
            for v in stats.time_to_first_tokens:
                m.histogram_time_to_first_token.labels(*lv).observe(v)
            for v in stats.time_per_output_tokens:
                m.histogram_time_per_output_token.labels(*lv).observe(v)
            for v in stats.time_e2e_requests:
                m.histogram_e2e_request_latency.labels(*lv).observe(v)

        self.num_prompt_tokens.append(stats.num_prompt_tokens)
        self.num_generation_tokens.append(stats.num_generation_tokens)

        now = time.monotonic()
        if self._local_interval_elapsed(now):
            elapsed = now - self.last_local_log
            prompt_tps = sum(self.num_prompt_tokens) / elapsed
            gen_tps = sum(self.num_generation_tokens) / elapsed
            logger.info(
                "Avg prompt throughput: %.1f tokens/s, "
                "Avg generation throughput: %.1f tokens/s, "
                "Running: %d reqs, Swapped: %d reqs, Pending: %d reqs, "
                "TPU KV cache usage: %.1f%%, CPU KV cache usage: %.1f%%",
                prompt_tps, gen_tps, stats.num_running, stats.num_swapped,
                stats.num_waiting, stats.gpu_cache_usage * 100,
                stats.cpu_cache_usage * 100)
            self.num_prompt_tokens = []
            self.num_generation_tokens = []
            self.last_local_log = now
