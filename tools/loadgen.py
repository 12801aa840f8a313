"""OTLP load generator (S9) — the reference's ``test/otlp_generator.go``
re-expressed against this engine's ingest surfaces, dependency-free.

Behavior parity with the reference generator (otlp_generator.go:97-210):

- N counters (``test_counter_i``): each tick has a 70% chance to add
  1..10, attributes {counter_type: type_(i%3), status: one of
  200/201/400/404/500}; counter 0 RESETS to zero every ``--reset-every``
  ticks (the reference logs "Simulating reset" every 1000 events — here
  the reset actually happens so the temporality kernel has something to
  detect).
- N gauges (``test_gauge_i``): 50 + 30*sin(t/10 + i), attributes
  {gauge_type: type_(i%3), index: i}.
- N histograms (``http_request_duration_i``): the reference's latency
  mixture (50% 5-50ms, 35% 50-200ms, 10% 200-1000ms, 5% 1-5s) bucketed
  into fixed explicit bounds, attributes {endpoint, method, status}.
- One exponential-latency histogram (``response_time_exponential``,
  lambda=0.01) — the shape the reference's simulateExponentialHistogram
  emits (otlp_generator.go:219-254).

Differences, deliberate: deterministic (--seed feeds one random.Random,
so two runs with the same flags INCLUDING an explicit --start-ns emit
byte-identical payloads — without --start-ns the timestamp base comes
from the wall clock, so values repeat but timeUnixNano differs; the
reference seeds everything from wall clock), and the transport is
OTLP/HTTP JSON or the file-drop dir (the container has no grpcio; the
gRPC *binding* is the documented S1 residual).

Usage:
  python tools/loadgen.py --drop-dir /tmp/otlp-drop --ticks 50
  python tools/loadgen.py --endpoint http://localhost:4318/v1/metrics \
      --ticks 50 --interval-ms 100
"""

from __future__ import annotations

import argparse
import json
import math
import os
import random
import time
import urllib.request

ENDPOINTS = ["/api/users", "/api/products", "/api/orders", "/api/metrics",
             "/api/health"]
METHODS = ["GET", "POST", "PUT", "DELETE"]
STATUS = ["200", "201", "400", "404", "500"]
BOUNDS_MS = [5.0, 10.0, 25.0, 50.0, 100.0, 250.0, 500.0, 1000.0, 2500.0]


def _kv(k: str, s: str | None = None, i: int | None = None):
    return {"key": k, "value": {"stringValue": s, "intValue": i,
                                "doubleValue": None, "boolValue": None}}


def _latency_ms(rng: random.Random) -> float:
    """The reference's 4-segment latency mixture."""
    r = rng.random()
    if r < 0.5:
        return 5 + rng.random() * 45
    if r < 0.85:
        return 50 + rng.random() * 150
    if r < 0.95:
        return 200 + rng.random() * 800
    return 1000 + rng.random() * 4000


def _bucket_counts(samples: list[float]) -> list[int]:
    counts = [0] * (len(BOUNDS_MS) + 1)
    for v in samples:
        for j, b in enumerate(BOUNDS_MS):
            if v <= b:
                counts[j] += 1
                break
        else:
            counts[-1] += 1
    return counts


class Generator:
    """Deterministic tick-wise OTLP/JSON export-request generator."""

    def __init__(self, counters: int, gauges: int, histograms: int,
                 seed: int, start_ns: int, interval_ms: int,
                 reset_every: int):
        self.rng = random.Random(seed)
        self.nc, self.ng, self.nh = counters, gauges, histograms
        self.start_ns = start_ns
        self.step_ns = interval_ms * 1_000_000
        self.reset_every = reset_every
        self.counter_totals = [0] * counters
        self.tick = 0

    def next_request(self) -> dict:
        self.tick += 1
        ts = self.start_ns + self.tick * self.step_ns
        t_s = ts / 1e9
        metrics = []
        if self.reset_every and self.tick % self.reset_every == 0 and self.nc:
            self.counter_totals[0] = 0  # the simulated counter reset
        for i in range(self.nc):
            if self.rng.random() < 0.7:
                self.counter_totals[i] += self.rng.randint(1, 10)
            metrics.append({
                "name": f"test_counter_{i}",
                "sum": {
                    "aggregationTemporality": 2,  # cumulative
                    "isMonotonic": True,
                    "dataPoints": [{
                        "timeUnixNano": ts,
                        "asInt": self.counter_totals[i], "asDouble": None,
                        "attributes": [
                            _kv("counter_type", s=f"type_{i % 3}"),
                            _kv("status", s=self.rng.choice(STATUS)),
                        ],
                        "exemplars": [],
                    }],
                },
            })
        for i in range(self.ng):
            metrics.append({
                "name": f"test_gauge_{i}",
                "gauge": {"dataPoints": [{
                    "timeUnixNano": ts,
                    "asDouble": 50 + 30 * math.sin(t_s / 10 + i),
                    "asInt": None,
                    "attributes": [
                        _kv("gauge_type", s=f"type_{i % 3}"),
                        _kv("index", i=i),
                    ],
                    "exemplars": [],
                }]},
            })
        for i in range(self.nh):
            if self.rng.random() >= 0.8:
                continue
            samples = [_latency_ms(self.rng)
                       for _ in range(self.rng.randint(1, 20))]
            metrics.append({
                "name": f"http_request_duration_{i}",
                "histogram": {
                    "aggregationTemporality": 1,  # delta
                    "dataPoints": [{
                        "timeUnixNano": ts,
                        "count": len(samples),
                        "sum": round(sum(samples), 6),
                        "bucketCounts": _bucket_counts(samples),
                        "explicitBounds": BOUNDS_MS,
                        "attributes": [
                            _kv("endpoint", s=self.rng.choice(ENDPOINTS)),
                            _kv("method", s=self.rng.choice(METHODS)),
                            _kv("status", s=self.rng.choice(STATUS)),
                        ],
                        "exemplars": [],
                    }],
                },
            })
        # exponential-latency histogram (lambda = 0.01/ms)
        lam = 0.01
        exp_samples = [-math.log(1 - self.rng.random()) / lam
                       for _ in range(self.rng.randint(1, 5))]
        metrics.append({
            "name": "response_time_exponential",
            "histogram": {
                "aggregationTemporality": 1,
                "dataPoints": [{
                    "timeUnixNano": ts,
                    "count": len(exp_samples),
                    "sum": round(sum(exp_samples), 6),
                    "bucketCounts": _bucket_counts(exp_samples),
                    "explicitBounds": BOUNDS_MS,
                    "attributes": [_kv("service", s="api"),
                                   _kv("operation", s="query")],
                    "exemplars": [],
                }],
            },
        })
        return {"resourceMetrics": [{
            "resource": {"attributes": [
                _kv("service.name", s="test-service"),
                _kv("service.version", s="1.0.0"),
                _kv("environment", s="testing"),
                _kv("region", s="us-east-1"),
            ]},
            "scopeMetrics": [{"metrics": metrics}],
        }]}


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--drop-dir", help="write export-NNNN.json files here")
    ap.add_argument("--endpoint",
                    help="POST OTLP/JSON here (e.g. "
                         "http://localhost:4318/v1/metrics)")
    ap.add_argument("--ticks", type=int, default=100)
    ap.add_argument("--interval-ms", type=int, default=100)
    ap.add_argument("--counters", type=int, default=5)
    ap.add_argument("--gauges", type=int, default=5)
    ap.add_argument("--histograms", type=int, default=5)
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--reset-every", type=int, default=1000)
    ap.add_argument("--start-ns", type=int, default=None,
                    help="first tick timestamp (default: 2 min ago, "
                         "inside the validation window)")
    ap.add_argument("--paced", action="store_true",
                    help="sleep interval-ms between ticks (live-rate "
                         "mode; default emits as fast as possible)")
    args = ap.parse_args()
    if not args.drop_dir and not args.endpoint:
        ap.error("need --drop-dir or --endpoint")

    start_ns = args.start_ns
    if start_ns is None:
        start_ns = (int(time.time()) - 120) * 1_000_000_000

    gen = Generator(args.counters, args.gauges, args.histograms,
                    args.seed, start_ns, args.interval_ms,
                    args.reset_every)
    if args.drop_dir:
        os.makedirs(args.drop_dir, exist_ok=True)
    sent = 0
    for n in range(args.ticks):
        req = gen.next_request()
        body = json.dumps(req) + "\n"
        if args.drop_dir:
            # write-then-rename so the file stream never reads a partial
            tmp = os.path.join(args.drop_dir, f".export-{n:05d}.json.tmp")
            dst = os.path.join(args.drop_dir, f"export-{n:05d}.json")
            with open(tmp, "w") as fh:
                fh.write(body)
            os.rename(tmp, dst)
        if args.endpoint:
            r = urllib.request.Request(
                args.endpoint, data=body.encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(r) as resp:
                resp.read()
        sent += 1
        if args.paced:
            time.sleep(args.interval_ms / 1000)
        if sent % 100 == 0:
            print(f"generated {sent} export requests")
    print(f"done: {sent} export requests "
          f"({'drop-dir ' + args.drop_dir if args.drop_dir else ''}"
          f"{' endpoint ' + args.endpoint if args.endpoint else ''})")


if __name__ == "__main__":
    main()
